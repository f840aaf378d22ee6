package graft

import org.apache.spark.sql.functions._

import graft.operators.Spectral

/** Spectral tests: the integer power iteration actually finds the
  * dominant eigendirection, and the distributed gramian is symmetric
  * and exact. */
class SpectralSpec extends SparkSpecBase {

  import testImplicits._

  test("powerIterate finds the dominant eigenvector of a known matrix") {
    // diag-dominant 3x3 with eigenvector ~ (1, 0.5, 0.25) direction
    val g = Map[(Int, Int), Long](
      (0, 0) -> 4000L, (0, 1) -> 2000L, (0, 2) -> 1000L,
      (1, 0) -> 2000L, (1, 1) -> 3000L, (1, 2) -> 500L,
      (2, 0) -> 1000L, (2, 1) -> 500L, (2, 2) -> 2000L)
    val (v, sup) = Spectral.powerIterate(g, 3)
    assert(sup > 0)
    assert(v.map(math.abs).max == Spectral.VecScale, "sup-normalized")
    // double-precision reference: 50 iterations from the same seed
    var ref = Array(1.0, 1.0, 1.0)
    for (_ <- 1 to 50) {
      val w = Array.tabulate(3)(i =>
        (0 until 3).map(j => g((i, j)).toDouble * ref(j)).sum)
      val n = w.map(math.abs).max
      ref = w.map(_ / n)
    }
    val vn = v.map(_.toDouble / Spectral.VecScale)
    val cos = (0 until 3).map(i => vn(i) * ref(i)).sum /
      (math.sqrt(vn.map(x => x * x).sum) * math.sqrt(ref.map(x => x * x).sum))
    assert(cos > 0.9999, s"integer iterate diverged from reference: cos=$cos")
  }

  test("gramian is symmetric and matches a local computation") {
    val emb = Seq(
      (1L, Array(0.25f, -0.5f, 0.125f)),
      (2L, Array(-0.125f, 0.25f, 0.5f)),
      (3L, Array(0.5f, 0.5f, -0.25f))).toDF("vec_id", "embedding")
    val g = Spectral.gramian(emb).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val mil = Array(Array(250L, -500L, 125L), Array(-125L, 250L, 500L),
      Array(500L, 500L, -250L))
    for (i <- 0 until 3; j <- 0 until 3) {
      val expect = mil.map(v => v(i) * v(j)).sum
      assert(g((i, j)) == expect, s"G($i,$j)")
      assert(g((i, j)) == g((j, i)), s"symmetry ($i,$j)")
    }
  }

  test("q_power_iteration output is sup-normalized with a positive lead") {
    val out = graft.SparkEntry.queries("q_power_iteration")(spark, TestSpark.Sf0001)
      .collect()
    assert(out.length == Spectral.EmbDim)
    val vs = out.map(_.getAs[Long]("v_micro"))
    assert(vs.map(math.abs).max == Spectral.VecScale)
    assert(out.map(_.getAs[Long]("gv_sup")).distinct.length == 1)
    assert(out.head.getAs[Long]("gv_sup") > 0)
  }
}
