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
    * `sentinel` (the module's first function name) is already bound. */
  def apply(spark: SparkSession, sentinel: String)(
      body: FunctionRegistry => Unit): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(sentinel))) body(reg)
  }
}
