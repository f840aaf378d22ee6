package graft

import graft.functions.{SqKernels, SqOps}
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** SQ8 scalar-quantization kernels + the stored-index serving plan. */
class SqOpsSpec extends SparkSpecBase {

  private def rng(seed: Long) = new scala.util.Random(seed)

  private def model(vecs: Seq[Array[Float]]): (Array[Float], Array[Float]) = {
    val dim = vecs.head.length
    val mins = Array.tabulate(dim)(d => vecs.map(_(d)).min)
    val maxs = Array.tabulate(dim)(d => vecs.map(_(d)).max)
    (mins, Array.tabulate(dim)(d => (maxs(d) - mins(d)) / 255f))
  }

  test("encode: per-dim reconstruction error bounded by step/2") {
    val r = rng(7)
    val vecs = Seq.fill(50)(Array.fill(16)(r.nextFloat() * 4f - 2f))
    val (mins, steps) = model(vecs)
    for (v <- vecs) {
      val code = SqKernels.encode(new GenericArrayData(v.map(x => x: Any)), mins, steps)
      var d = 0
      while (d < v.length) {
        val deq = mins(d) + (code(d) & 0xff) * steps(d)
        assert(math.abs(deq - v(d)) <= steps(d) / 2f + 1e-6f,
          s"dim $d: v=${v(d)} deq=$deq step=${steps(d)}")
        d += 1
      }
    }
  }

  test("encode: out-of-model values clamp to 0/255, zero-range dim to 0") {
    val mins = Array(0f, 1f, 5f)
    val steps = Array(0.1f, 0.1f, 0f) // dim 2 is constant in the corpus
    val code = SqKernels.encode(
      new GenericArrayData(Array[Any](-10f, 100f, 5f)), mins, steps)
    assert((code(0) & 0xff) == 0 && (code(1) & 0xff) == 255 &&
      (code(2) & 0xff) == 0)
  }

  test("score(encode(v)) tracks exact cosine within quantization error") {
    val r = rng(11)
    val dim = 32
    val vecs = Seq.fill(80)(Array.fill(dim)(r.nextFloat() * 2f - 1f))
    val q = Array.fill(dim)(r.nextFloat() * 2f - 1f)
    val (mins, steps) = model(vecs)
    val (alpha, lin, quad, beta, gamma0) = SqOps.probeTables(q, mins, steps)
    val qn = math.sqrt(q.map(x => x.toDouble * x).sum)
    for (v <- vecs) {
      val code = SqKernels.encode(new GenericArrayData(v.map(x => x: Any)), mins, steps)
      val got = SqKernels.score(code, alpha, lin, quad, beta, gamma0) / qn
      val dot = v.zip(q).map { case (a, b) => a.toDouble * b.toDouble }.sum
      val vn = math.sqrt(v.map(x => x.toDouble * x).sum)
      val exact = dot / (vn * qn)
      // per-dim error ≤ step/2 ⇒ |Δdot| ≤ Σ|q_d|·step_d/2 and the norm
      // shifts by the same order; 8-bit steps on a ±1 corpus keep the
      // cosine within ~1e-2 — assert an order-of-magnitude-safe bound
      assert(math.abs(got - exact) < 0.02, s"got=$got exact=$exact")
    }
  }

  test("scoreCols kernel == literal-table score (split model/query halves)") {
    val r = rng(23)
    val dim = 16
    val vecs = Seq.fill(30)(Array.fill(dim)(r.nextFloat() * 2f - 1f))
    val q = Array.fill(dim)(r.nextFloat() * 2f - 1f)
    val (mins, steps) = model(vecs)
    val (alpha, lin, quad, beta, gamma0) = SqOps.probeTables(q, mins, steps)
    val (alpha2, beta2) = SqOps.queryTables(q, mins, steps)
    val (lin2, quad2, gamma02) = SqOps.modelTables(mins, steps)
    assert(alpha.sameElements(alpha2) && beta == beta2 &&
      lin.sameElements(lin2) && quad.sameElements(quad2) && gamma0 == gamma02)
    for (v <- vecs) {
      val code = SqKernels.encode(new GenericArrayData(v.map(x => x: Any)), mins, steps)
      val a = SqKernels.score(code, alpha, lin, quad, beta, gamma0)
      val b = SqKernels.scoreData(code,
        new GenericArrayData(alpha2.map(x => x: Any)), beta2, lin2, quad2, gamma02)
      assert(a == b, s"literal=$a cols=$b")
    }
  }

  test("batched IVF-SQ8 kNN plan: DPP-pruned byte-code scan, no cell literal") {
    val s = spark
    import org.apache.spark.sql.functions.col
    val emb = graft.queries.Tables.embeddings(s, TestSpark.Sf0001)
    val qs = emb.orderBy("vec_id").limit(4)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val p = graft.operators.Ingest.knnJoinIvfSqStored(s, TestSpark.Sf0001, qs, 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"),
      s"probe must prune cell directories dynamically:\n$p")
    assert(p.contains("ReadSchema: struct<vec_id:bigint,code:binary>"),
      s"the ranking scan must read only (vec_id, code):\n$p")
    assert(!p.contains("cell IN ("), s"no driver-collected cell literal:\n$p")
    assert(!p.toLowerCase.contains("sq_encode"),
      s"warm path must not re-encode:\n$p")
  }

  test("sqTopKStored plan: byte-code scan only, no re-encode, top-k pushed") {
    val p = graft.operators.Ingest.sqTopKStored(spark, TestSpark.Sf0001, 10)
      .queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema: struct<vec_id:bigint,code:binary>"),
      s"SQ rank must scan only (vec_id, code):\n$p")
    assert(!p.toLowerCase.contains("sq_encode"),
      s"warm path must not re-encode:\n$p")
    assert(p.contains("TakeOrderedAndProject"), p)
  }
}
