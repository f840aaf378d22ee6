package graft

import org.apache.spark.sql.functions._

import graft.operators.ScalePatterns
import graft.queries.Tables

/** Salted-join equivalence: the skew pattern must be invisible in the
  * result set. */
class ScalePatternsSpec extends SparkSpecBase {

  test("length batching: full batches, and less padding than arrival order") {
    val out = graft.SparkEntry.queries("q_length_batching")(spark, TestSpark.Sf0001)
      .collect()
    val b = ScalePatterns.LengthBatchSize.toLong
    assert(out.init.forall(_.getLong(1) == b), "only the LAST batch may be partial")
    assert(out.last.getLong(1) <= b && out.last.getLong(1) > 0)
    val sortedWaste = out.map(_.getLong(4)).sum
    // arrival-order (doc_id) batching — the baseline the operator beats
    val lens = Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"),
        graft.operators.TextAnalysis.wsTokens(col("text")).cast("long").as("t"))
      .collect().sortBy(_.getLong(0)).map(_.getLong(1))
    val arrivalWaste = lens.grouped(ScalePatterns.LengthBatchSize)
      .map(g => g.length * g.max - g.sum).sum
    assert(sortedWaste < arrivalWaste,
      s"sorted $sortedWaste must beat arrival $arrivalWaste")
    // waste arithmetic is internally consistent
    out.foreach { r =>
      assert(r.getLong(4) == r.getLong(1) * r.getLong(2) - r.getLong(3))
    }
  }

  test("saltedJoin == plain join, row for row") {
    val li = Tables.lineitem(spark, TestSpark.Sf0001)
      .select("l_orderkey", "l_linenumber", "l_suppkey")
    val sup = Tables.supplier(spark, TestSpark.Sf0001)
      .select("s_suppkey", "s_nationkey")
    val plain = li.join(sup, col("l_suppkey") === col("s_suppkey"))
      .orderBy("l_orderkey", "l_linenumber").collect().map(_.toSeq).toSeq
    val salted = ScalePatterns.saltedJoin(li, sup,
        col("l_suppkey"), col("s_suppkey"), nSalts = 5)
      .orderBy("l_orderkey", "l_linenumber").collect().map(_.toSeq).toSeq
    assert(salted == plain)
  }

  test("saltedJoin spreads a hot key over multiple salts") {
    import testImplicits._
    // one key carries 1000 rows — the classic power-law hot key
    val fact = (1 to 1000).map(i => (1L, i)).toDF("k", "v")
    val dim = Seq((1L, "hot")).toDF("dk", "name")
    val salts = fact.withColumn("__salt",
        pmod(xxhash64(struct(col("k"), col("v"))), lit(8)))
      .select(countDistinct("__salt")).collect().head.getLong(0)
    assert(salts > 4, s"hot key only spread over $salts salts")
    val joined = ScalePatterns.saltedJoin(fact, dim, col("k"), col("dk"), 8)
    assert(joined.count() == 1000)
  }

  /** Deterministic burst fixture: `n` events in one 10-minute bucket
    * (plus a few spread-out events around it), as (ts, event_type). */
  private def burstEvents(n: Int) = {
    import testImplicits._
    val burst = (0 until n).map(i =>
      (new java.sql.Timestamp(1704067200000L + i % 571 * 997L), s"t${i % 5}"))
    val spread = (0 until 20).map(i =>
      (new java.sql.Timestamp(1704067200000L + 3600000L * (i + 1)), s"t${i % 5}"))
    (burst ++ spread).toDF("ts", "event_type")
  }

  test("bucketedRangePairs sub-splits a hot bucket without changing the pairs") {
    // 5000 rows in one bucket with sliceRows=512 forces ~10 slices; the
    // result must still equal the brute-force range join exactly.
    val ev = burstEvents(5000)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("a_type", "b_type").agg(count(lit(1)).as("n"))
        .orderBy("a_type", "b_type").collect().map(_.toSeq).toSeq
    val guarded = canon(ScalePatterns.bucketedRangePairs(
      ev, windowUs = 600000000L, sliceRows = 512, maxBucketPairs = 100000000L))
    val a = ev.select(unix_micros(col("ts")).as("a_us"), col("event_type").as("a_type"))
    val b = ev.select(unix_micros(col("ts")).as("b_us"), col("event_type").as("b_type"))
    val brute = canon(a.crossJoin(b)
      .filter(col("b_us") > col("a_us") && col("b_us") <= col("a_us") + 600000000L))
    assert(guarded == brute && guarded.nonEmpty)
  }

  test("bucketedRangePairs fails loudly past the per-bucket pair cap") {
    val ev = burstEvents(2000) // ~4e6 candidate pairs in the hot bucket
    val e = intercept[IllegalStateException] {
      ScalePatterns.bucketedRangePairs(
        ev, windowUs = 600000000L, sliceRows = 512, maxBucketPairs = 1000000L).count()
    }
    assert(e.getMessage.contains("cartesian"),
      s"expected the degenerate-occupancy message, got: ${e.getMessage}")
  }

  test("rangeSlices derives from est_pairs: small bucket beside a huge neighbor splits (ADVICE r7)") {
    import testImplicits._
    // a task's work is n·(n+n_next): 100 own rows against a 10^7-row
    // neighbor is ~10^9 comparisons — one unsliced task under an
    // occupancy-only criterion, the straggler shape the guard documents
    val s = ScalePatterns.rangeSlices(100L, 10000000L, sliceRows = 65536, pairsPerTask = 1L << 26)
    assert(s >= 14, s"expected ~15 slices for ~1e9 est pairs, got $s")
    // a genuinely cold bucket stays unsliced
    assert(ScalePatterns.rangeSlices(1000L, 1000L, 65536, 1L << 26) == 1)
    // the occupancy term still applies on its own
    assert(ScalePatterns.rangeSlices(200000L, 0L, 65536, Long.MaxValue) == 4)
    // and the asymmetric case produces the SAME pairs as brute force:
    // 40 rows in bucket 0, 4000 in bucket 1, tiny pairsPerTask forces
    // the est_pairs path to engage and split
    val t0 = 1704067200000L
    val ev = ((0 until 40).map(i => (new java.sql.Timestamp(t0 + i), "a")) ++
      (0 until 4000).map(i => (new java.sql.Timestamp(t0 + 600000L + (i % 500)), s"b${i % 7}")))
      .toDF("ts", "event_type")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("a_type", "b_type").agg(count(lit(1)).as("n"))
        .orderBy("a_type", "b_type").collect().map(_.toSeq).toSeq
    val guarded = canon(ScalePatterns.bucketedRangePairs(
      ev, windowUs = 600000000L, sliceRows = 65536,
      maxBucketPairs = 100000000L, pairsPerTask = 100000L))
    val a = ev.select(unix_micros(col("ts")).as("a_us"), col("event_type").as("a_type"))
    val b = ev.select(unix_micros(col("ts")).as("b_us"), col("event_type").as("b_type"))
    val brute = canon(a.crossJoin(b)
      .filter(col("b_us") > col("a_us") && col("b_us") <= col("a_us") + 600000000L))
    assert(guarded == brute && guarded.nonEmpty)
  }

  test("bucketedRangePairs on sane data is unchanged by the guard (cold path)") {
    val ev = Tables.events(spark, TestSpark.Sf0001)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("a_type", "b_type").agg(count(lit(1)).as("n"))
        .orderBy("a_type", "b_type").collect().map(_.toSeq).toSeq
    val guarded = canon(ScalePatterns.bucketedRangePairs(ev, 600000000L))
    val a = ev.select(unix_micros(col("ts")).as("a_us"), col("event_type").as("a_type"))
    val b = ev.select(unix_micros(col("ts")).as("b_us"), col("event_type").as("b_type"))
    val brute = canon(a.crossJoin(b)
      .filter(col("b_us") > col("a_us") && col("b_us") <= col("a_us") + 600000000L))
    assert(guarded == brute && guarded.nonEmpty)
  }

  test("contiguousIds == global row_number, on more rows than fit one range bin") {
    import testImplicits._
    // keys deliberately shuffled; dup sort keys need the tiebreaker
    val docs = scala.util.Random.shuffle((0L until 3000L).toList)
      .map(i => (i, i % 17))
      .toDF("doc_id", "k")
    val got = ScalePatterns.contiguousIds(docs,
        Seq(col("k").desc, col("doc_id").asc))
      .select("doc_id", "row_id").as[(Long, Long)].collect().toMap
    val expected = (0L until 3000L).toSeq
      .sortBy(i => (-(i % 17), i)).zipWithIndex
      .map { case (id, rid) => id -> rid.toLong }.toMap
    assert(got == expected)
  }

  test("contiguousIds survives more partitions than rows (empty partitions)") {
    import testImplicits._
    val docs = Seq((5L, 1L), (3L, 2L), (9L, 0L)).toDF("doc_id", "k")
    val got = ScalePatterns.contiguousIds(docs, Seq(col("k").asc))
      .select("doc_id", "row_id").as[(Long, Long)].collect().toSet
    assert(got == Set((9L, 0L), (5L, 1L), (3L, 2L)))
  }

  test("prefixSums == exclusive running-sum window, shuffled input, dup keys") {
    import testImplicits._
    val docs = scala.util.Random.shuffle((0L until 3000L).toList)
      .map(i => (i, 1L + i % 23))
      .toDF("doc_id", "w")
    val got = ScalePatterns.prefixSums(docs, Seq(col("doc_id").asc), col("w"))
      .select("doc_id", "cum_before").as[(Long, Long)].collect().toMap
    var acc = 0L
    val expected = (0L until 3000L).map { i =>
      val r = i -> acc; acc += 1L + i % 23; r
    }.toMap
    assert(got == expected)
  }

  test("prefixSums survives more partitions than rows") {
    import testImplicits._
    val docs = Seq((5L, 10L), (3L, 20L), (9L, 30L)).toDF("doc_id", "w")
    val got = ScalePatterns.prefixSums(docs, Seq(col("doc_id").asc), col("w"))
      .select("doc_id", "cum_before").as[(Long, Long)].collect().toSet
    assert(got == Set((3L, 0L), (5L, 20L), (9L, 30L)))
  }

  test("bucketed pair joins WITHOUT a shuffle and matches the plain join") {
    import testImplicits._
    val dir = "/root/testdata/sf0.001"
    val (o, l) = ScalePatterns.ensureBucketedPair(spark, dir)
    val joined = o.hint("merge").join(l, col("o_orderkey") === col("l_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    // semantics: identical to the plain parquet join
    val plain = Tables.orders(spark, dir).select("o_orderkey")
      .join(Tables.lineitem(spark, dir).select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"))
      .count()
    assert(joined.count() == plain)
  }

  test("contiguousIds plan: no global window anywhere") {
    import testImplicits._
    val docs = (0L until 100L).map(i => (i, i % 3)).toDF("doc_id", "k")
    val out = ScalePatterns.contiguousIds(docs, Seq(col("k").asc, col("doc_id").asc))
    assert(!out.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("zValue matches a bit-by-bit driver reference") {
    import testImplicits._
    def ref(x: Long, y: Long): Long = {
      var z = 0L
      var i = 0
      while (i < 32) {
        z |= ((x >> i) & 1L) << (2 * i)
        z |= ((y >> i) & 1L) << (2 * i + 1)
        i += 1
      }
      z
    }
    val rnd = new scala.util.Random(42)
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (0xFFFFFFFFL, 0xFFFFFFFFL)) ++
      Seq.fill(200)((rnd.nextInt(Int.MaxValue).toLong,
        rnd.nextInt(Int.MaxValue).toLong))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        ScalePatterns.zValue(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == ref(x, y), s"z($x, $y)")
    }
  }

  test("skipRead skips files and still returns exactly the filter rows") {
    val path = ScalePatterns.ensureZorderedLineitem(spark, TestSpark.Sf0001)
    val (res, read, total) = ScalePatterns.skipRead(spark, path,
      "l_orderkey", "l_partkey", 100L, 400L, 50L, 300L)
    assert(total == 16L, s"16 z-range files expected, got $total")
    assert(read < total,
      s"manifest must prune some files: read $read of $total")
    val expected = Tables.lineitem(spark, TestSpark.Sf0001)
      .filter(col("l_orderkey").between(100, 400) &&
        col("l_partkey").between(50, 300))
      .select("l_orderkey", "l_partkey", "l_linenumber")
      .collect().map(_.toSeq).sortBy(_.toString)
    val got = res.collect().map(_.toSeq).sortBy(_.toString)
    assert(got.length == expected.length && got.sameElements(expected))
    // a rectangle touching nothing: zero files read, empty result
    val (none, nread, _) = ScalePatterns.skipRead(spark, path,
      "l_orderkey", "l_partkey", 100000L, 100001L, 0L, 10L)
    assert(nread == 0L && none.count() == 0L)
  }
}
