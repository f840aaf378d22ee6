package graft

import org.apache.spark.sql.functions._

import graft.functions.{Sketch, VectorOps}

/** The SQL-text surface: every custom expression must be reachable from
  * `spark.sql(...)` — the path a cluster deployment takes via
  * `--conf spark.sql.extensions=graft.GraftExtensions` — and agree with
  * the Column-API route. The injector's own builder list is applied to
  * the session registry, so a drifted builder signature fails here. */
class SqlSurfaceSpec extends SparkSpecBase {

  private def inject(): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    GraftExtensions.functions.foreach { case (id, info, builder) =>
      reg.registerFunction(id, info, builder)
    }
  }

  test("every GraftExtensions function is invocable from SQL text") {
    inject()
    val r = spark.sql(
      """SELECT graft_simhash(array('a','b','c')) AS sh,
        |       graft_minhash_shingles(array('a','b','c','d')).sig[0] AS mh,
        |       graft_winnow('hello winnowing world') AS wf,
        |       graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                    array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cos,
        |       graft_srp64(array(CAST(0.5 AS FLOAT), CAST(-0.5 AS FLOAT))) AS srp,
        |       graft_cp1252_decode(graft_cp1252_encode('€ räksmörgås')) AS rt,
        |       graft_repetition(array('a','b','a')).top_count AS top,
        |       size(graft_word_gram_hashes(array('a','b','c','d'), 3)) AS ng,
        |       size(graft_id_pairs(array(3L, 1L, 2L))) AS np,
        |       graft_lm_nll(array('the','cat'), array('the'), array(10L),
        |                    array(concat('the', chr(0), 'cat')),
        |                    array(5L)).n_bigrams AS lm,
        |       graft_pq_adc(graft_pq_encode(
        |           array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |           array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT),
        |                 CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT)),
        |           2, 2),
        |         array(CAST(0.9 AS DOUBLE), CAST(0.1 AS DOUBLE),
        |               CAST(0.2 AS DOUBLE), CAST(0.8 AS DOUBLE)),
        |         array(CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE),
        |               CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE)),
        |         2, 2) AS pq,
        |       graft_l2sq(array(CAST(3.0 AS FLOAT)),
        |                  array(CAST(1.0 AS FLOAT))) AS l2,
        |       size(graft_hamming_pairs(
        |         array(named_struct('doc_id', 1L, 'simhash', 5L),
        |               named_struct('doc_id', 2L, 'simhash', 4L),
        |               named_struct('doc_id', 3L, 'simhash', -1L)), 1)) AS hp,
        |       graft_canonical_url(
        |         'HTTPS://WWW.Ex.COM:443/a/?utm_source=x&b=2&a=1#f') AS cu
        |""".stripMargin).collect().head
    assert(r.getAs[Double]("cos") == 1.0)
    assert(r.getAs[String]("rt") == "€ räksmörgås")
    assert(r.getSeq[Long](r.fieldIndex("wf")).nonEmpty)
    assert(r.getAs[Int]("top") == 2)
    assert(r.getAs[Int]("ng") == 2)
    assert(r.getAs[Int]("np") == 3)
    assert(r.getAs[Long]("lm") == 1L)
    assert(r.getAs[Double]("l2") == 4.0)
    // only (1,2) is within hamming 1 (5^4=1); pairs with the -1 sketch
    // are 62-63 bits apart
    assert(r.getAs[Int]("hp") == 1)
    assert(r.getAs[String]("cu") == "https://ex.com/a?a=1&b=2")
    // dim-2 vector (1,0) split into 2 sub-spaces of 1 dim; codebook per
    // sub-space is {1.0, 0.0} / {0.0, 1.0} -> codes (0, 0); ADC =
    // (0.9 + 0.2) / sqrt(1 + 1)
    assert(math.abs(r.getAs[Double]("pq") - 1.1 / math.sqrt(2.0)) < 1e-12)
  }

  test("Bloom shims: build in SQL, probe via scalar subquery") {
    inject()
    val r = spark.sql(
      """SELECT graft_might_contain(
        |         (SELECT graft_bloom_agg(CAST(id AS BIGINT), 100L, 800L)
        |          FROM range(5)), 3L) AS hit,
        |       graft_might_contain(
        |         (SELECT graft_bloom_agg(CAST(id AS BIGINT), 100L, 800L)
        |          FROM range(5)), 99L) AS miss
        |""".stripMargin).collect().head
    assert(r.getBoolean(0))   // inserted key: always found
    assert(!r.getBoolean(1))  // absent key at this sizing: not found
  }

  test("SQL-authored row_number()<=k rewrites to the bounded-heap operator") {
    graft.plans.TopKRewrite.register(spark)
    import testImplicits._
    (0L until 2000L).map(i => (s"g${i % 11}", i, (i % 17).toInt))
      .toDF("grp", "id", "v").createOrReplaceTempView("sql_topk_docs")
    // the textbook SQL idiom — subquery + rank predicate, rank dropped
    val df = spark.sql(
      """SELECT grp, id, v FROM (
        |  SELECT grp, id, v,
        |         row_number() OVER (PARTITION BY grp
        |                            ORDER BY v DESC, id) AS rn
        |  FROM sql_topk_docs)
        |WHERE rn <= 3""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString
    assert("TopKPerKey".r.findAllIn(plan).size >= 2 && !plan.contains("Window"),
      s"the SQL route must reach the same rewrite as the DataFrame route:\n$plan")
    val a = df.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(a.nonEmpty && a.count(_._1 == "g0") == 3,
      "rewritten SQL plan must still return exactly k rows per group")
  }

  test("SQL route ≡ Column-API route (same kernels, same results)") {
    inject()
    Sketch.register(spark)
    VectorOps.register(spark)
    import testImplicits._
    val df = Seq("the quick brown fox", "completely different text")
      .toDF("text").select(split(col("text"), " ").as("toks"))
    df.createOrReplaceTempView("sql_surface_docs")
    val viaSql = spark.sql(
      "SELECT graft_simhash(toks) AS sh FROM sql_surface_docs")
      .collect().map(_.getLong(0)).toSeq
    val viaCol = df.select(Sketch.simhashTokens(col("toks")).as("sh"))
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql == viaCol)
  }
}
