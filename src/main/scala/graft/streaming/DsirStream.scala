package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Structured Streaming twin of the DSIR importance-weight selection
  * (operators/TextAnalysis.dsirWeights): both frozen LM models AND the
  * frozen corpus-mean threshold (N, Σw) ship into the stream, and every
  * micro-batch scores its documents with the same dual-kernel
  * zero-shuffle projection as the batch path, flagging selection
  * against the FROZEN mean — the admission-control shape (an arriving
  * document must not shift the reference corpus's mean, so the
  * threshold is a model artifact, not a stream aggregate). No
  * watermark, no state store; `Trigger.AvailableNow` turns the same
  * query into a catch-up batch. EventStreamSpec pins streaming ≡ the
  * batch q_dsir_weights row-for-row. */
object DsirStream {

  def dsirStream(s: SparkSession, dir: String): DataFrame = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
    val (rawU, rawB, tgtU, tgtB) =
      TextAnalysis.lmTablesDual(docs, col("lang") === "en")
    // the frozen threshold: the reference corpus's (N, Σw)
    val t = TextAnalysis.dsirScore(docs, rawU, rawB, tgtU, tgtB)
      .agg(count(lit(1)).as("n"), sum("w_micro").as("w")).head()
    // an empty reference corpus means there is no threshold to freeze —
    // fail with the contract, not a null-sum NPE from Row.getLong
    require(t.getLong(0) > 0,
      s"DSIR admission stream needs a non-empty reference corpus at $dir")
    val (nTotal, wTotal) = (t.getLong(0), t.getLong(1))
    // file-stream sources need an explicit schema; the glob sidesteps
    // FileStreamSource's basePath rule (same trick as LmStream).
    TextAnalysis.dsirScore(
      s.readStream.schema(docs.schema).parquet(s"$dir/[d]ocuments.parquet"),
      rawU, rawB, tgtU, tgtB)
      .withColumn("selected", col("w_micro") * lit(nTotal) > lit(wTotal))
  }
}
