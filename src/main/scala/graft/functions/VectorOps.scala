package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native Catalyst vector expressions for the similarity-search operators
  * (SURVEY.md §2.11): exact cosine similarity and a 64-bit
  * sign-random-projection (SRP) sketch over `array<float>` embeddings.
  *
  * Same design as [[Sketch]]: single-pass JIT-friendly kernels invoked
  * from both interpreted eval and one-line generated code, so the whole
  * scan stage stays inside whole-stage codegen. A higher-order-function
  * formulation (`aggregate`/`zip_with`) would break codegen and pay
  * per-element interpreted dispatch — the exact pathology removed from
  * the dedup operators.
  *
  * SRP: bit j of the sketch is the sign of Σ_d s(j,d)·x_d with
  * Rademacher ±1 entries s(j,d) derived from SplitMix64(j,d) — fully
  * deterministic across executors/runs, no stored projection matrix.
  * P[bit differs] = angle/π, so hamming distance estimates cosine
  * (cos θ ≈ cos(π·hamming/64)) and the SimHash banding machinery applies
  * unchanged to embeddings.
  */
object VectorOps {

  def register(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "graft_cosine", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_srp64", exprs => Srp64(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_l2sq", exprs => L2Sq(exprs(0), exprs(1)), "built-in")
  }

  /** Exact cosine similarity of two `array<float>` vectors, accumulated
    * in double (deterministic left-to-right). Call [[register]] first. */
  def cosine(x: Column, y: Column): Column = call_function("graft_cosine", x, y)

  /** 64-bit SRP sketch of an `array<float>` vector. Call [[register]] first. */
  def srp64(x: Column): Column = call_function("graft_srp64", x)

  /** Squared L2 distance of two `array<float>` vectors (PQ training
    * metric). Call [[register]] first. */
  def l2sq(x: Column, y: Column): Column = call_function("graft_l2sq", x, y)
}

/** Kernels shared by interpreted eval and generated code. */
object VectorSketchOps {

  def l2sq(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"l2sq: dimension mismatch ($n vs ${b.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    // fail fast like the DuckDB oracle (list_cosine_similarity errors on
    // mismatched lengths) — silent truncation would return a plausible
    // but wrong score for corrupt embeddings
    require(n == b.numElements(),
      s"cosine: dimension mismatch ($n vs ${b.numElements()})")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  private def splitmix64(seed: Long): Long = Hashing.splitmix64(seed)

  /** Per-dimension packed signs: bit j of signs(d) is the Rademacher
    * entry s(j,d). Cached per dimensionality (deterministic contents). */
  private val signCache = new java.util.concurrent.ConcurrentHashMap[Integer, Array[Long]]()

  private def signs(dim: Int): Array[Long] =
    signCache.computeIfAbsent(dim, _ => {
      val out = new Array[Long](dim)
      var d = 0
      while (d < dim) {
        var bits = 0L
        var j = 0
        while (j < 64) {
          if ((splitmix64(j.toLong * 1000003L + d) & 1L) == 1L) bits |= (1L << j)
          j += 1
        }
        out(d) = bits
        d += 1
      }
      out
    })

  def srp64(a: ArrayData): Long = {
    val dim = a.numElements()
    val s = signs(dim)
    val acc = new Array[Double](64)
    var d = 0
    while (d < dim) {
      val x = a.getFloat(d).toDouble
      val bits = s(d)
      var j = 0
      while (j < 64) {
        acc(j) += (if (((bits >>> j) & 1L) == 1L) x else -x)
        j += 1
      }
      d += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (acc(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}

/** `graft_cosine(array<float>, array<float>) -> double`. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorSketchOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      (a, b) => s"${ev.value} = graft.functions.VectorSketchOps.cosine($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** `graft_srp64(array<float>) -> bigint`. */
case class Srp64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_srp64"

  override protected def nullSafeEval(input: Any): Any =
    VectorSketchOps.srp64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.VectorSketchOps.srp64($c);")

  override protected def withNewChildInternal(newChild: Expression): Srp64 =
    copy(child = newChild)
}

/** `graft_l2sq(array<float>, array<float>) -> double`. */
case class L2Sq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_l2sq"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorSketchOps.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      (a, b) => s"${ev.value} = graft.functions.VectorSketchOps.l2sq($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Sq =
    copy(left = newLeft, right = newRight)
}
