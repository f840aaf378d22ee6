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

  /** Compact the accumulated tombstone directory — the LSM small-files
    * rule applied to the deletion front door: thousands of per-trigger
    * `batch=<id>` files (one takedown each) rewrite as ONE distinct id
    * set under the next generation path, committed by its `_SUCCESS`
    * marker before any old file is touched, then the old batch dirs are
    * dropped. Duplicate retraction requests collapse here (the
    * anti-join never needed them distinct, but the accumulated bytes
    * and file-listing cost grow forever without this). Readers are
    * never wrong mid-compaction: the batch dirs stay intact until the
    * compacted generation is committed, and every consumer takes the
    * UNION of both layouts ([[tombstoneIds]]). */
  def compactTombstones(s: SparkSession, tombDir: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(tombDir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val gen = s"$tombDir/compacted"
    // nothing accumulated since the last compaction → the generation is
    // already exactly the set; a no-op, not a read of a missing glob
    if (Option(fs.globStatus(new org.apache.hadoop.fs.Path(s"$tombDir/batch=*")))
        .forall(_.isEmpty)) return
    s.read.parquet(s"$tombDir/batch=*").select("doc_id").distinct()
      .unionByName(
        if (fs.exists(new org.apache.hadoop.fs.Path(s"$gen/_SUCCESS")))
          s.read.parquet(gen).select("doc_id")
        else s.emptyDataFrame.selectExpr("CAST(0 AS BIGINT) AS doc_id").limit(0))
      .distinct()
      .write.mode("overwrite").parquet(s"$gen.next")
    // commit order: the new generation is fully written before the old
    // layout is removed; the final rename is the atomic flip — a failed
    // flip must abort loudly with both layouts intact, never half-apply
    if (fs.exists(new org.apache.hadoop.fs.Path(gen)))
      fs.delete(new org.apache.hadoop.fs.Path(gen), true)
    require(fs.rename(new org.apache.hadoop.fs.Path(s"$gen.next"),
      new org.apache.hadoop.fs.Path(gen)),
      s"tombstone compaction: rename $gen.next -> $gen failed")
    Option(fs.globStatus(new org.apache.hadoop.fs.Path(s"$tombDir/batch=*")))
      .getOrElse(Array.empty)
      .foreach(st => fs.delete(st.getPath, true))
  }

  /** Every tombstone id the directory holds, whatever its layout state:
    * live batch files ∪ the compacted generation (either may be absent;
    * mid-compaction both exist and the union is still exactly the set). */
  def tombstoneIds(s: SparkSession, tombDir: String): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(tombDir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val parts = Seq(
      (s"$tombDir/batch=*",
        Option(fs.globStatus(new org.apache.hadoop.fs.Path(s"$tombDir/batch=*")))
          .exists(_.nonEmpty)),
      (s"$tombDir/compacted",
        fs.exists(new org.apache.hadoop.fs.Path(s"$tombDir/compacted/_SUCCESS"))))
      .collect { case (p, true) => s.read.parquet(p).select("doc_id") }
    parts.reduceOption(_ unionByName _)
      .getOrElse(s.emptyDataFrame.selectExpr("CAST(0 AS BIGINT) AS doc_id").limit(0))
  }
}
