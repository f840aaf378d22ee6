package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation

/** Curation operator tests: connected-component edge cases the corpus
  * gate can't isolate (chains, singleton edges, convergence), split
  * stability, and redaction behavior beyond the planted patterns. */
class CurationSpec extends SparkSpecBase {

  import testImplicits._

  test("connectedComponents: chain collapses to one min-labeled cluster") {
    // path graph 5-4, 4-3, 3-2, 2-1: diameter forces multiple iterations
    val edges = Seq((4L, 5L), (3L, 4L), (2L, 3L), (1L, 2L)).toDF("doc1", "doc2")
    val cc = Curation.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("connectedComponents: separate components keep separate min labels") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)).toDF("doc1", "doc2")
    val cc = Curation.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents: empty edge list yields empty result") {
    val edges = Seq.empty[(Long, Long)].toDF("doc1", "doc2")
    assert(Curation.connectedComponents(edges).count() == 0)
  }

  test("splitColumn is deterministic and roughly proportioned") {
    val df = (0L until 1000L).toDF("doc_id")
      .select(col("doc_id"), Curation.splitColumn(col("doc_id")).as("split"))
    val counts = df.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // expectation 750/125/125; a 16-nibble binomial stays well inside ±40%
    assert(counts("train") > 600 && counts("valid") > 75 && counts("test") > 75,
      counts.toString)
    assert(counts.values.sum == 1000)
    // determinism: rerun produces the identical assignment
    val again = (0L until 1000L).toDF("doc_id")
      .select(Curation.splitColumn(col("doc_id")).as("s2")).collect().map(_.getString(0))
    assert(df.orderBy("doc_id").collect().map(_.getString(1)).toSeq == again.toSeq)
  }

  test("redactPii scrubs every occurrence and leaves clean text alone") {
    val got = Seq(
      "mail a.b-c_d%e@sub.domain.org and x@y.io twice",
      "call +46-123-4567 or +1-555-0100",
      "no pii here, just 12-34 and a@b (not an email)"
    ).toDF("text").select(Curation.redactPii(col("text")).as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq(
      "mail <EMAIL> and <EMAIL> twice",
      "call <PHONE> or <PHONE>",
      "no pii here, just 12-34 and a@b (not an email)"))
  }

  test("stratifiedSample keeps ceil(n/10) per stratum, deterministically") {
    val docs = (0L until 95L).map(i => (i, if (i < 7) "sv" else "en"))
      .toDF("doc_id", "lang")
    val s1 = Curation.stratifiedSample(docs, "lang").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val bySt = s1.groupBy(_._2).view.mapValues(_.size).toMap
    assert(bySt == Map("sv" -> 1, "en" -> 9)) // ceil(7/10)=1, ceil(88/10)=9
    val s2 = Curation.stratifiedSample(docs, "lang").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(s1 == s2)
  }
}
