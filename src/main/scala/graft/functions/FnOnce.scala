package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Once-per-session guard for the lazy `register(spark)` path (sessions
  * built without `spark.sql.extensions=graft.GraftExtensions`).
  *
  * Registration is idempotent, but the operators call `register` at
  * query-construction time — hundreds of times per bench/verify session
  * — and `createOrReplaceTempFunction` takes the registry write lock and
  * logs a "replaced a previously registered function" WARN on every
  * repeat (the r13 bench stderr carries thousands). The sentinel check
  * is a lock-free read of the session's own registry, so the guard is
  * per-session-correct with no static state to leak across sessions. */
private[functions] object FnOnce {

  /** Run `body` against the session's function registry unless
    * `sentinel` (the module's first function name) is already bound.
    *
    * Also ensures the session carries the full PLAN surface (the
    * bounded-heap top-k strategy + its `row_number()<=k` rewrite rule),
    * not just the function surface: every graft operator's lazy
    * `register(spark)` lands here at query-construction time, so this
    * is the one choke point every session posture shares. Without it
    * the rewrite was installed only by the q_topk_rewrite gate
    * mid-suite, which made PLAN SHAPE depend on session history: a
    * bench pass 1 / single-query isolation JVM served the un-rewritten
    * full window sort (~3x slower for the window-top-k family at sf3 —
    * the q_hard_negatives posture-adjudication red, SURVEY §10.20)
    * while pass 2 of the same session served the intended plan. The
    * Bridge registrars are `contains`-guarded, so the per-call cost is
    * two Seq reads. */
  def apply(spark: SparkSession, sentinel: String)(
      body: FunctionRegistry => Unit): Unit = {
    graft.plans.TopKRewrite.register(spark)
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(sentinel))) body(reg)
  }
}
