package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Curation

/** Structured Streaming twin of the incremental score maintenance
  * (operators/Curation.incrementalScores): arriving snapshot files are
  * digest-diffed against the STATIC stored v1 artifact in a
  * stream-static left join, the inference kernel runs only over the
  * changed/new rows of each micro-batch, unchanged rows serve from the
  * stored integers — the continuous form of IVM, where "the new
  * snapshot" is a landing stream rather than a table. The diff body is
  * [[Curation.incrementalScoresBody]] VERBATIM (streamed ≡ batch is
  * structural); the snapshot mutation ([[Curation.corpusV2Frame]]) is
  * filters + a self-union, so the whole query is stateless — no
  * watermark, no state store, and `Trigger.AvailableNow` turns it into
  * a catch-up batch. EventStreamSpec pins streamed ≡ the batch
  * q_score_incremental row-for-row. */
object ScoreStream {

  def incrementalStream(s: SparkSession, dir: String): DataFrame = {
    val stored = Curation.ensureScoreArtifact(s, dir)
    val schema = s.read.parquet(s"$dir/documents.parquet").schema
    // file-stream sources need an explicit schema; the glob sidesteps
    // FileStreamSource's basePath rule (same trick as LmStream).
    val arriving = s.readStream.schema(schema)
      .parquet(s"$dir/[d]ocuments.parquet")
    Curation.incrementalScoresBody(Curation.corpusV2Frame(arriving), stored)
  }
}
