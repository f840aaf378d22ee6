package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** The exact prefix-filter set-similarity join (Dedup.jaccardPairsExact):
  * boundary behavior in integer arithmetic and unconditional brute-force
  * equality on a corpus with engineered near-dups. (The oracle gate
  * q_near_dup_jaccard re-proves the same equality against DuckDB on the
  * planted testdata corpus.)
  */
class DedupSpec extends SparkSpecBase {
  import testImplicits._

  /** Ground truth: every doc1<doc2 pair verified exactly — no prefix
    * filter anywhere, so any filtering bug diverges from this. */
  private def bruteForce(docs: org.apache.spark.sql.DataFrame,
      tauP: Int, tauQ: Int): Set[(Long, Long)] = {
    val ids = docs.select("doc_id").as[Long].collect().sorted
    val allPairs = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
    } yield (ids(i), ids(j))).toDF("doc1", "doc2")
    Dedup.verifiedOverlap(docs, allPairs)
      .filter(col("n_common") * tauQ >= col("n_union") * tauP)
      .select("doc1", "doc2").as[(Long, Long)].collect().toSet
  }

  test("jaccardPairsExact: exact-0.8 boundary pair included, below excluded") {
    // x: 11 distinct tokens → 9 distinct grams. y: last token changed →
    // shares 8 of 9 grams, |∩|=8, |∪|=10, J = 0.8 EXACTLY (5·8 = 4·10):
    // the ≥ cut must include it. z: one MIDDLE token changed → 3 grams
    // differ, J = 6/12 = 0.5: excluded. u: disjoint.
    val base = (0 until 11).map(i => s"w$i")
    val docs = Seq(
      (1L, base.mkString(" ")),
      (2L, (base.dropRight(1) :+ "zz").mkString(" ")),
      (3L, base.updated(5, "qq").mkString(" ")),
      (4L, (0 until 11).map(i => s"v$i").mkString(" "))
    ).toDF("doc_id", "text")
    val got = Dedup.jaccardPairsExact(docs, 4, 5)
      .select("doc1", "doc2", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    assert(got == Set((1L, 2L, 0.8)), s"got $got")
  }

  test("jaccardPairsExact ≡ brute force on a corpus with planted near-dups") {
    // 40 base docs of 20 distinct-ish tokens; every 4th doc gets a copy
    // with k ∈ {1,2,3} trailing tokens rewritten — J spans both sides of
    // 0.8 — plus verbatim copies (J = 1.0) and cross-doc boilerplate
    // (a shared 8-token prefix in HALF the corpus: a hot gram that the
    // df-ascending order must keep out of prefixes without losing pairs).
    val boiler = (0 until 8).map(i => s"b$i")
    val rows = (0 until 40).flatMap { d =>
      val toks = boiler ++ (0 until 12).map(i => s"d${d}t$i")
      val doc = (d.toLong, toks.mkString(" "))
      val variants =
        if (d % 4 == 0) {
          val k = d % 3 + 1
          val mut = toks.dropRight(k) ++ (0 until k).map(i => s"m${d}x$i")
          Seq((100L + d, mut.mkString(" ")))
        } else if (d % 7 == 0) Seq((200L + d, toks.mkString(" ")))
        else Nil
      doc +: variants
    }
    val docs = rows.toDF("doc_id", "text")
    val expected = bruteForce(docs, 4, 5)
    val got = Dedup.jaccardPairsExact(docs, 4, 5)
      .select("doc1", "doc2").as[(Long, Long)].collect().toSet
    assert(expected.nonEmpty, "corpus must contain pairs above tau")
    assert(got == expected,
      s"missed=${expected -- got} extra=${got -- expected}")
  }

  test("jaccardPairsExact plan: equi-joins only, no cartesian") {
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d f")).toDF("doc_id", "text")
    val p = Dedup.jaccardPairsExact(docs, 4, 5)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("paragraphDedup: first occurrence wins, tail blocks, reconstruction") {
    // blockLen=3 for readability. doc 10: two blocks, the second short
    // (tail). doc 11: exact copy of doc 10 → loses everything. doc 12:
    // repeats doc 10's FIRST block then adds a novel block → keeps only
    // the novel one. doc 13: repeats its own first block within-doc →
    // the in-doc second copy is dropped too (C4 removes global repeats,
    // within-doc included).
    val docs = Seq(
      (10L, "a b c d e"),
      (11L, "a b c d e"),
      (12L, "a b c x y z"),
      (13L, "p q r p q r")).toDF("doc_id", "text")
    val got = Dedup.paragraphDedup(docs, blockLen = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (10L, 2L, 2L, "a b c d e"),
      (11L, 2L, 0L, ""),
      (12L, 2L, 1L, "x y z"),
      (13L, 2L, 1L, "p q r")), got.toString)
  }

  test("paragraphDedup: rebuilt blocks stay in position order across many blocks") {
    // one long doc, all blocks distinct — reconstruction must be the
    // identity, which fails if the collect_list sort or the slice
    // arithmetic is off by one anywhere over 40 blocks
    val text = (0 until 120).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val got = Dedup.paragraphDedup(docs, blockLen = 3)
      .as[(Long, Long, Long, String)].collect().head
    assert(got == ((1L, 40L, 40L, text)), got.toString)
  }

  test("boilerplateStrip: over-cut blocks vanish everywhere, rare blocks all kept") {
    // blockLen=3, maxDf=2. "a b c" occurs 3× (> cut) → removed from
    // EVERY doc, including the first (keep-first would keep one). "d e
    // f" occurs 2× (= cut) → both occurrences survive. doc 23 is pure
    // boilerplate → empty. Contrast with paragraphDedup, where doc 20
    // would keep "a b c".
    val docs = Seq(
      (20L, "a b c d e f"),
      (21L, "a b c x y z"),
      (22L, "d e f a b c"),
      (23L, "a b c")).toDF("doc_id", "text")
    val got = Dedup.boilerplateStrip(docs, blockLen = 3, maxDf = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (20L, 2L, 1L, "d e f"),
      (21L, 2L, 1L, "x y z"),
      (22L, 2L, 1L, "d e f"),
      (23L, 1L, 0L, "")), got.toString)
  }

  test("boilerplateStrip plan: df verdict via aggregate+join, no window over blk") {
    val docs = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val p = Dedup.boilerplateStrip(docs, blockLen = 3)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), "block-keyed window is the straggler shape")
  }

  test("paragraphAdmit: stored blocks drop, novel blocks survive, batch keep-first") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.queries.Tables.documents(spark, dir)
    val src = docs.orderBy("doc_id").limit(1)
      .select("text").as[String].collect().head
    // probe A = exact stored copy (everything drops); probe B = novel
    // 20-token doc; probe C = same novel text (intra-batch keep-first
    // loses to B); probe D = one stored block + one novel block
    val novel = (0 until 20).map(i => s"qq${i}z").mkString(" ")
    val srcToks = src.split(" ")
    val mixed = (srcToks.take(10) ++ (0 until 10).map(i => s"ww${i}z")).mkString(" ")
    val batch = Seq(
      (800001L, src), (800002L, novel), (800003L, novel), (800004L, mixed)
    ).toDF("doc_id", "text")
    val got = graft.operators.Ingest.paragraphAdmit(spark, dir, batch)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(800001L)._3 == 0 && byId(800001L)._4 == "",
      s"stored copy must lose every block: ${byId(800001L)}")
    assert(byId(800002L)._3 == 2 && byId(800002L)._4 == novel,
      s"novel doc survives whole: ${byId(800002L)}")
    assert(byId(800003L)._3 == 0 && byId(800003L)._4 == "",
      s"intra-batch duplicate loses keep-first: ${byId(800003L)}")
    assert(byId(800004L)._3 == 1 &&
      byId(800004L)._4 == (0 until 10).map(i => s"ww${i}z").mkString(" "),
      s"mixed doc keeps only the novel block: ${byId(800004L)}")
  }

  test("paragraphDedup plan: keep-first is an aggregate, not a window over blk") {
    // the r5/r6 straggler rule: a mass-duplicate block must partial-
    // aggregate map-side, so the keep decision may not be a Window
    // partitioned by the block text
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d f")).toDF("doc_id", "text")
    val p = Dedup.paragraphDedup(docs, blockLen = 3)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p)
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"), p)
  }
}
