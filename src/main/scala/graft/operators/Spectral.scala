package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.Tables.embeddings

/** Spectral embedding preprocessing (SURVEY.md §2.11): the top principal
  * direction of the embedding cloud via power iteration over a one-pass
  * gramian — the reduction an ANN / whitening / drift-monitoring stage
  * runs before touching 100 TB of vectors.
  *
  * Everything is INTEGER-exact (the q_link_rank convention): embeddings
  * are quantized to milli-units once, the D×D gramian is a sum of
  * BIGINT products (order-independent — bit-identical on any executor
  * count), and each power-iteration step renormalizes to sup-norm
  * [[VecScale]] with truncating integer division — semantics shared by
  * Scala's BigInt `/`, Spark's `div`, and DuckDB's `//`, so the oracle
  * replays all five iterations exactly. The quantization trades ~1e-3
  * per-coordinate precision for cross-engine bit-equality; the
  * OPERATOR pattern (gramian → tiny eigensolve) is unchanged.
  *
  * 100 TB design notes:
  *  - The gramian is the only corpus-wide pass: posexplode to (i, x)
  *    pairs is narrow, and the (i, j) hash aggregate combines map-side
  *    to ≤ D² rows per task before the one shuffle — the classic
  *    distributed X^T X.
  *  - G is D×D = 4096 longs — a bounded driver artifact (the k-means
  *    centroid precedent); the 5-iteration eigensolve is microseconds
  *    and never touches the cluster again.
  *  - Uncentered second moment by design: centering at scale is one
  *    broadcast mean subtraction folded into the same pass; omitting it
  *    keeps every intermediate within BIGINT range without rescaling.
  */
object Spectral {

  /** Embedding coordinate quantization (units of 1/[[MilliScale]]). */
  val MilliScale: Int = 1000

  /** Iteration-vector sup-norm scale. */
  val VecScale: Long = 1000000L

  /** Fixed power-iteration count — part of the operator's identity. */
  val PowerIters: Int = 5

  /** Embedding dimensionality of the corpus (TESTDATA.md). */
  val EmbDim: Int = 64

  /** Milli-quantized (vec_id, i, xm) coordinates. */
  def milliCoords(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), col("pos").as("i"),
        round(col("col").cast(DoubleType) * MilliScale)
          .cast(LongType).as("xm"))

  /** The D×D gramian Σ x xᵀ as (gi, gj, gv) rows — one shuffle, map-side
    * combined to ≤ D² keys per task. */
  def gramian(emb: DataFrame): DataFrame = {
    val xs = milliCoords(emb).localCheckpoint() // both sides of the self-join
    xs.as("a").join(xs.as("b"), col("a.vec_id") === col("b.vec_id"))
      .groupBy(col("a.i").as("gi"), col("b.i").as("gj"))
      .agg(sum(col("a.xm") * col("b.xm")).as("gv"))
  }

  /** Driver-side eigensolve over the collected gramian: [[PowerIters]]
    * rounds of w = G·v; v ← w·[[VecScale]] / sup|w| (BigInt, truncating
    * division). Returns (component, v_micro, final sup|w|). */
  def powerIterate(g: Map[(Int, Int), Long], dim: Int): (Array[Long], Long) = {
    var v = Array.fill(dim)(BigInt(VecScale))
    var sup = BigInt(0)
    for (_ <- 1 to PowerIters) {
      val w = Array.tabulate(dim) { i =>
        var acc = BigInt(0)
        var j = 0
        while (j < dim) {
          acc += BigInt(g.getOrElse((i, j), 0L)) * v(j)
          j += 1
        }
        acc
      }
      sup = w.map(_.abs).max
      require(sup > 0, "power iteration on a zero gramian")
      v = w.map(x => x * VecScale / sup)
    }
    (v.map(_.toLong), sup.toLong)
  }

  // --- query surface ----------------------------------------------------

  /** This module's share of the driver-visible gate surface —
    * bump WITH any gate added here (RegistrySpec sums the
    * module-local declarations; no global count exists). */
  val declaredGates: Int = 1

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // top principal direction: 64 components of the dominant
    // eigenvector (sup-normalized micro-units) plus the final
    // pre-normalization sup-norm (the eigenvalue proxy). The oracle
    // replays the gramian AND all five integer iterations, so a single
    // wrong product anywhere in D²·N terms flips some component.
    "q_power_iteration" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val g = gramian(embeddings(s, dir)).collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      val (v, sup) = powerIterate(g, EmbDim)
      v.toSeq.zipWithIndex
        .map { case (x, i) => (i, x, sup) }
        .toDF("i", "v_micro", "gv_sup")
        .orderBy("i")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_power_iteration" -> {
      def iter(k: Int): String = {
        val pv = if (k == 1) "v0" else s"v${k - 1}"
        s"""gw$k AS (SELECT g.gi AS i, sum(CAST(g.gv AS HUGEINT) * v.v) AS w
           |        FROM g JOIN $pv v ON g.gj = v.i GROUP BY 1),
           |s$k AS (SELECT max(abs(w)) AS sup FROM gw$k),
           |v$k AS (SELECT i, (w * $VecScale) // sup AS v FROM gw$k, s$k)""".stripMargin
      }
      val iters = (1 to PowerIters).map(iter).mkString(",\n")
      s"""WITH mil AS (
         |  SELECT vec_id, r.i,
         |         CAST(round(CAST(list_extract(embedding, CAST(r.i + 1 AS INT))
         |                         AS DOUBLE) * $MilliScale) AS BIGINT) AS xm
         |  FROM embeddings
         |  CROSS JOIN (SELECT unnest(range(0, $EmbDim)) AS i) r),
         |g AS (SELECT a.i AS gi, b.i AS gj,
         |             CAST(sum(a.xm * b.xm) AS BIGINT) AS gv
         |      FROM mil a JOIN mil b ON a.vec_id = b.vec_id GROUP BY 1, 2),
         |v0 AS (SELECT unnest(range(0, $EmbDim)) AS i,
         |              CAST($VecScale AS HUGEINT) AS v),
         |$iters
         |SELECT v$PowerIters.i, CAST(v$PowerIters.v AS BIGINT) AS v_micro,
         |       (SELECT CAST(sup AS BIGINT) FROM s$PowerIters) AS gv_sup
         |FROM v$PowerIters ORDER BY i""".stripMargin
    }
  )
}
