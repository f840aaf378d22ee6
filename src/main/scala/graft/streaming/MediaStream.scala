package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Structured Streaming twin of the media hash-index DELTA ingest
  * (operators/Multimodal.deltaHashKernel): arriving media land as
  * files, each micro-batch decodes and perceptually hashes ONLY the
  * arriving bytes (image dHash / sampled video frame dHashes / audio
  * aHash), and the sink accumulates modality-partitioned index rows —
  * continuous perceptual-index maintenance, the way a 100 TB/day
  * multimodal corpus actually lands. Stateless (no watermark, no
  * shuffle: hashes are per-media-item), so throughput is bounded by
  * decode + hash exactly like the batch delta build, and
  * `Trigger.AvailableNow` turns the same query into a catch-up batch.
  * The kernel is SHARED with the batch path, so streaming ≡ batch is
  * structural, and EventStreamSpec asserts it row-for-row anyway —
  * including that the streamed rows serve the append dedup gates
  * identically to the stored delta generation. */
object MediaStream {

  def mediaHashStream(s: SparkSession, dir: String): DataFrame = {
    // file-stream sources need an explicit schema: one footer read.
    // The glob path sidesteps FileStreamSource's basePath-must-be-a-
    // directory rule for the testdata's single-file table (the
    // SketchStream trick); production streams point at landing dirs.
    val schema = s.read.parquet(s"$dir/documents.parquet").schema
    graft.operators.Multimodal.deltaHashKernel(
      s.readStream.schema(schema).parquet(s"$dir/[d]ocuments.parquet"))
  }
}
