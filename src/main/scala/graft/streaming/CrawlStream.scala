package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.Crawl

/** Streamed URL-admission twin: new crawl batches (doc_id, url) land in
  * a directory; each `Trigger.AvailableNow` micro-batch is
  * canonicalized, keep-first-deduplicated within the batch, and
  * anti-joined against the STORED canonical-URL index — the first gate
  * a production crawl runs, before any byte of page text is fetched
  * or parsed. The per-batch body is [[Crawl.urlAdmit]] verbatim
  * (foreachBatch), so streamed ≡ batch is structural; the stored index
  * side is a stream-static join — no state store, no watermark.
  * Cross-batch novel URLs fold back into the index between triggers
  * (the IvfStream LSM posture). Idempotent `batch=<id>` overwrite sink
  * (foreachBatch is at-least-once). */
object CrawlStream {

  def admitUrlStream(s: SparkSession, landingGlob: String,
      schema: StructType, outDir: String, ckptDir: String,
      storedCanon: DataFrame): StreamingQuery =
    s.readStream.schema(schema).parquet(landingGlob)
      .writeStream
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        Crawl.urlAdmit(b, storedCanon)
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        ()
      }
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
