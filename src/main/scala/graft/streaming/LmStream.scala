package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.TextAnalysis

/** Structured Streaming twin of the stateless LM quality filter
  * (operators/TextAnalysis.lmScoreStateless): the model — two capped
  * count tables trained once by lmTables — ships into the stream as map
  * literals, and every micro-batch scores its documents with the same
  * narrow zero-shuffle expression as the batch path. No watermark, no
  * state store: perplexity filtering is per-document, so this is the
  * shape a 100 TB/day ingest uses to score text as it lands, and
  * `Trigger.AvailableNow` turns the identical query into a catch-up
  * batch. EventStreamSpec pins streaming ≡ batch row-for-row. */
object LmStream {

  def lmScoreStream(s: SparkSession, dir: String): DataFrame = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
    val (uni, bi) = TextAnalysis.lmTables(docs)
    // file-stream sources need an explicit schema (one footer read); the
    // glob sidesteps FileStreamSource's basePath-must-be-a-directory rule
    // for the testdata's single-file table (same trick as EventStream).
    TextAnalysis.lmScoreStateless(
      s.readStream.schema(docs.schema).parquet(s"$dir/[d]ocuments.parquet"),
      uni, bi)
  }
}
