package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streamed TAKEDOWN front door — the deletion verb's streaming
  * posture: retraction batches (doc_id rows — a legal hold, a user
  * erasure request, a licensing retraction) land as files, and each
  * micro-batch folds into the tombstone table. The table is an
  * APPEND-ONLY directory of id files: tombstones only ever accumulate,
  * and the serve-side mask is an anti-join, for which duplicate ids
  * are semantically free — so there is no read-modify-write, no state
  * store, no distinct, just one idempotent `batch=<id>` overwrite per
  * trigger (foreachBatch is at-least-once; the CrawlStream sink rule).
  * Every serve AFTER a trigger masks the grown set:
  * `Ingest.bm25TopKForgottenWith` (and the `dead` hook of the kNN
  * scaffold) take the accumulated directory as their tombstone frame,
  * deriving the negative stats from the ids at serve time — bounded by
  * the retraction size, never a corpus re-scan. */
object ForgetStream {

  def tombstoneStream(s: SparkSession, landingGlob: String,
      schema: StructType, tombDir: String, ckptDir: String): StreamingQuery =
    s.readStream.schema(schema).parquet(landingGlob)
      .writeStream
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        b.select("doc_id")
          .write.mode("overwrite").parquet(s"$tombDir/batch=$batchId")
        ()
      }
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
