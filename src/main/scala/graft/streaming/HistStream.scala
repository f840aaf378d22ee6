package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Structured Streaming twin of the quantile-histogram artifact build
  * (operators/CorpusStats.histBuild): documents arrive as files and the
  * SAME per-shard fixed-width bucketing aggregates continuously — the
  * running state is exactly the stored artifact's ≤ shards·buckets
  * cells (bounded regardless of stream length, since bucket ids are
  * value-derived, not row-derived), so Complete mode re-emits the
  * artifact after every micro-batch and any reader can cut quantiles
  * from the latest emission. The bucketing is SHARED with the batch
  * path, so streaming ≡ batch is structural; EventStreamSpec asserts it
  * cell-for-cell and re-derives the quantile cut from the streamed
  * cells anyway. */
object HistStream {

  def histStream(s: SparkSession, dir: String): DataFrame = {
    // file-stream sources need an explicit schema (one footer read); the
    // glob sidesteps FileStreamSource's basePath-must-be-a-directory
    // rule for the testdata's single-file table (EventStream's trick).
    val schema = s.read.parquet(s"$dir/documents.parquet").schema
    graft.operators.CorpusStats.histBuild(
      s.readStream.schema(schema).parquet(s"$dir/[d]ocuments.parquet"))
  }
}
