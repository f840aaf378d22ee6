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

  /** The same admission gate fed by ARRIVING `.warc.gz` ARCHIVES — the
    * true crawl front door: raw container files land in a directory
    * (the CommonCrawl delivery shape), each micro-batch decodes its
    * members in a narrow pass (gzip member walk + WARC framing — the
    * one place a codec walk beats an expression) and runs the identical
    * [[Crawl.urlAdmit]] body over the extracted (doc_id, url) rows.
    * The `binaryFile` source streams whole files, so a half-written
    * archive is never split mid-member; decode failures are LOUD
    * (WarcFile's contract), poisoning the batch rather than
    * undercounting the crawl. Admission reads ONLY the URL column of
    * the decode — no page text ever leaves the batch. */
  /** The `binaryFile` source's fixed schema, spelled out because a file
    * STREAM source requires one explicitly (the [d]ocuments-glob rule:
    * file streams never infer). */
  private val BinaryFileSchema: StructType = StructType(Seq(
    org.apache.spark.sql.types.StructField("path",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("modificationTime",
      org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("length",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("content",
      org.apache.spark.sql.types.BinaryType)))

  def admitWarcStream(s: SparkSession, warcGlob: String, outDir: String,
      ckptDir: String, storedCanon: DataFrame): StreamingQuery =
    s.readStream.format("binaryFile")
      .schema(BinaryFileSchema)
      .option("pathGlobFilter", "*.warc.gz")
      .load(warcGlob)
      .select("content")
      .writeStream
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        val sp = b.sparkSession
        import sp.implicits._
        val urls = b.select("content").as[Array[Byte]]
          .flatMap(bytes => graft.sources.WarcFile.decodeWarcGz(bytes).map(r =>
            (r.recordId.stripPrefix("urn:graft:doc-").toLong, r.targetUri)))
          .toDF("doc_id", "url")
        Crawl.urlAdmit(urls, storedCanon)
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        ()
      }
      .option("checkpointLocation", ckptDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
