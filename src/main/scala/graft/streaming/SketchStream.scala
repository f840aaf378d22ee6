package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Structured Streaming twin of the stored-sketch ingest pass
  * (operators/Ingest.sketchProjection): documents arrive as files, the
  * same narrow codegen sketch pass runs per micro-batch, and the sink
  * accumulates the fixed-width sketch table — CONTINUOUS index
  * maintenance, the way a 100 TB/day corpus actually lands. Stateless
  * (no watermark, no shuffle: sketches are per-document), so throughput
  * is bounded by scan + codegen exactly like the batch pass, and
  * `Trigger.AvailableNow` turns the same query into a catch-up batch.
  * The projection is SHARED with the batch path, so streaming ≡ batch is
  * structural, and EventStreamSpec asserts it row-for-row anyway. */
object SketchStream {

  def sketchStream(s: SparkSession, dir: String): DataFrame = {
    // file-stream sources need an explicit schema: one footer read.
    // The glob path sidesteps FileStreamSource's basePath-must-be-a-
    // directory rule for the testdata's single-file table (same trick
    // as EventStream.readEvents); production streams point at dirs.
    val schema = s.read.parquet(s"$dir/documents.parquet").schema
    graft.operators.Ingest.sketchProjection(
      s.readStream.schema(schema).parquet(s"$dir/[d]ocuments.parquet"))
  }
}
