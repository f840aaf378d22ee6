package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.Tables.documents

/** Multimodal-column plumbing (SURVEY.md §2.11): image/audio/video
  * treated as opaque `binary` payloads with a typed metadata struct,
  * processed in partition-sized batches through typed `mapPartitions`
  * (the Scala analog of a Pandas-UDF `mapInPandas` stage: one iterator
  * per partition, vectorizable batch shape, no per-row driver work).
  *
  * The actual media decode is STUBBED — this container has no
  * image/audio codecs — behind [[MediaCodec]], which produces a
  * deterministic fake feature vector from the payload bytes. Everything
  * Spark-side is real and tested: the schema, the binary payload
  * handling, the partition-batch UDF signature, frame sampling, and the
  * size-capped payload + path-reference pattern.
  *
  * 100 TB design notes:
  *  - Payloads stay columnar in parquet (BinaryType); metadata columns
  *    (mime, n_bytes, checksum) are scalar and prunable, so metadata-only
  *    queries never read payload bytes (ReadSchema shows the pruning).
  *  - Oversized payloads (> [[Multimodal.InlineCap]]) are not inlined:
  *    the payload column is NULL and `ref` carries an object-store path —
  *    the standard pattern for >1 MB media at scale.
  *  - Feature extraction is a narrow mapPartitions batch — no shuffle;
  *    downstream similarity reuses the embedding operators (Similarity).
  */
object Multimodal {

  /** Inline-payload cap (bytes); larger objects go by reference. */
  val InlineCap: Int = 1 << 20

  /** Typed record for the partition-batch stages. */
  case class MediaRecord(
      media_id: Long,
      mime: String,
      n_bytes: Long,
      checksum: Long,
      payload: Array[Byte],
      ref: String)

  case class MediaFeatures(
      media_id: Long,
      mime: String,
      n_frames: Int,
      features: Array[Float])

  /** STUB media codec — deterministic fake standing in for the real
    * image/audio decode (libs not present in this container). Replace
    * `decodeFeatures`/`frameOffsets` with real codec calls in production;
    * the Spark plumbing around them is unchanged. */
  object MediaCodec {
    val FeatureDim = 16

    /** Fake "decoded features": a per-dimension byte histogram moment,
      * deterministic in the payload bytes. */
    def decodeFeatures(payload: Array[Byte]): Array[Float] = {
      val acc = new Array[Float](FeatureDim)
      var i = 0
      while (i < payload.length) {
        acc(java.lang.Byte.toUnsignedInt(payload(i)) % FeatureDim) += 1f
        i += 1
      }
      val n = math.max(payload.length, 1).toFloat
      acc.map(_ / n)
    }

    /** Fake "frame" boundaries: fixed-stride byte windows standing in
      * for video frame sampling / audio windowing. */
    def frameOffsets(nBytes: Long, stride: Int = 4096): Seq[Long] =
      0L until nBytes by stride.toLong
  }

  /** Build a multimodal frame from `documents` — payload = UTF-8 bytes of
    * the text (the deterministic stand-in for media bytes), metadata
    * derived from it. Demonstrates the inline-vs-reference split. */
  def mediaFrame(docs: DataFrame): DataFrame = {
    val payload = encode(col("text"), "UTF-8")
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, lit("image/png"))
        .when(col("doc_id") % 3 === 1, lit("audio/wav"))
        .otherwise(lit("video/mp4")).as("mime"),
      length(payload).cast(LongType).as("n_bytes"),
      xxhash64(payload).as("checksum"),
      when(length(payload) <= InlineCap, payload).as("payload"),
      when(length(payload) > InlineCap,
        concat(lit("ref://media/"), col("doc_id"))).as("ref"))
  }

  /** Partition-batch feature extraction (the mapInPandas-shaped stage):
    * one iterator per partition, codec invoked per record, typed output. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { batch =>
      batch.map { r =>
        val bytes = Option(r.payload).getOrElse(Array.emptyByteArray)
        MediaFeatures(
          r.media_id,
          r.mime,
          MediaCodec.frameOffsets(r.n_bytes).size,
          MediaCodec.decodeFeatures(bytes))
      }
    }
  }

  // --- query surface ---------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // metadata-only aggregation — payload column pruned at the scan.
    "q_multimodal_meta" -> ((s, dir) =>
      mediaFrame(documents(s, dir))
        .groupBy("mime")
        .agg(count(lit(1)).as("n_media"),
          sum("n_bytes").as("total_bytes"))
        .orderBy("mime")),

    // partition-batch decode stub: per-mime feature/frame stats
    // (rows-only: the fake codec is not SQL-expressible).
    "q_multimodal_features" -> ((s, dir) => {
      val f = extractFeatures(mediaFrame(documents(s, dir))).toDF()
      f.groupBy("mime")
        .agg(count(lit(1)).as("n_media"),
          sum("n_frames").cast(LongType).as("total_frames"),
          sum(size(col("features"))).cast(LongType).as("total_feature_dims"))
        .orderBy("mime")
    })
  )

  val oracles: Map[String, String] = Map(
    // strlen = UTF-8 byte length in DuckDB (length() counts characters).
    "q_multimodal_meta" ->
      """SELECT CASE WHEN doc_id % 3 = 0 THEN 'image/png'
        |            WHEN doc_id % 3 = 1 THEN 'audio/wav'
        |            ELSE 'video/mp4' END AS mime,
        |       count(*) AS n_media,
        |       CAST(sum(strlen(text)) AS BIGINT) AS total_bytes
        |FROM documents GROUP BY 1 ORDER BY mime""".stripMargin
  )
}
