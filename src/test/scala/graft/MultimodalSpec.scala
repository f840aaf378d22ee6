package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal plumbing tests: schema, inline-vs-reference payloads, and
  * the partition-batch feature extraction stub. */
class MultimodalSpec extends SparkSpecBase {

  import testImplicits._

  private def docFrame(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

  test("mediaFrame: schema + checksum + byte length") {
    val m = Multimodal.mediaFrame(docFrame(0L -> "abc", 1L -> "åäö")).collect()
    val r0 = m.find(_.getLong(0) == 0).get
    assert(r0.getAs[String]("mime") == "image/png")
    assert(r0.getAs[Long]("n_bytes") == 3)
    assert(r0.getAs[Array[Byte]]("payload").toSeq == "abc".getBytes("UTF-8").toSeq)
    // non-ASCII: n_bytes counts UTF-8 bytes, not characters
    val r1 = m.find(_.getLong(0) == 1).get
    assert(r1.getAs[Long]("n_bytes") == 6)
  }

  test("oversized payloads go by reference, small ones inline") {
    val big = "x" * (Multimodal.InlineCap + 1)
    val m = Multimodal.mediaFrame(docFrame(0L -> "small", 1L -> big))
      .select("media_id", "payload", "ref").collect()
    val small = m.find(_.getLong(0) == 0).get
    val large = m.find(_.getLong(0) == 1).get
    assert(small.getAs[Array[Byte]]("payload") != null && small.isNullAt(2))
    assert(large.isNullAt(1) && large.getAs[String]("ref") == "ref://media/1")
  }

  test("extractFeatures: partition-batch decode stub yields normalized features") {
    val f = Multimodal.extractFeatures(
      Multimodal.mediaFrame(docFrame(0L -> "hello world", 1L -> ""))).collect()
    val r0 = f.find(_.media_id == 0).get
    assert(r0.features.length == Multimodal.MediaCodec.FeatureDim)
    assert(math.abs(r0.features.sum - 1.0f) < 1e-5) // histogram normalized
    assert(r0.n_frames == 1) // 11 bytes → one 4096-byte frame window
    // decode is deterministic
    val f2 = Multimodal.extractFeatures(
      Multimodal.mediaFrame(docFrame(0L -> "hello world"))).collect()
    assert(f2.head.features.toSeq == r0.features.toSeq)
  }

  test("metadata-only query prunes the payload column at the scan") {
    val plan = Multimodal.queries("q_multimodal_meta")(spark, TestSpark.Sf0001)
      .queryExecution.executedPlan.toString
    // the scan must not read `text` beyond what metadata needs — the
    // payload bytes are derived from text, so ReadSchema includes text,
    // but the aggregation itself only carries mime/n_bytes (no binary
    // column in any exchange).
    assert(!plan.contains("payload"))
  }
}
