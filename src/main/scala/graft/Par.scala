package graft

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.DataFrame

/** Concurrent materialization of INDEPENDENT DataFrames sharing one
  * SparkSession (spark_optimization_guide §2.6 "Overlap independent
  * jobs"): Spark's scheduler happily runs several jobs at once inside
  * one application; composed queries that union independent sub-serves
  * (the nine takedown axes, the exact-vs-approx envelope arms) are only
  * sequential because the driver materializes them sequentially. Each
  * frame is `localCheckpoint()`ed from a pool thread, so the next
  * branch's tasks back-fill executor cores freed by the current
  * branch's tail; the checkpointed frames are then safe to union into
  * one cheap final plan (which also keeps the OPTIMIZER off the
  * concatenated mega-plan — the composed takedown's single-plan form
  * was 2155 operators).
  *
  * Contract notes:
  *  - Frames must be fully CONSTRUCTED on the caller thread before
  *    entering the pool: stored-artifact builders (`ensure*`) run at
  *    construction time and meter through [[BuildTimer]], whose
  *    outermost-frame-per-thread accounting must not see two builds
  *    running concurrently (their wall times would double-accrue and
  *    deflate the bench's serve numbers). Materialization executes the
  *    finished plans only — no builder code runs on pool threads.
  *  - `localCheckpoint` keeps every row on the executors (block
  *    manager), so this is NOT a driver collect; result rows and schema
  *    are unchanged, only the evaluation order is.
  */
object Par {

  /** Materialize each frame concurrently (bounded pool), returning the
    * checkpointed frames in order. Exceptions from any branch propagate
    * to the caller after the pool drains. */
  def materialize(frames: Seq[DataFrame], parallelism: Int = 8): Seq[DataFrame] = {
    if (frames.size <= 1) return frames.map(_.localCheckpoint())
    val pool = Executors.newFixedThreadPool(math.min(parallelism, frames.size))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val debug = sys.env.get("SPARK_GRAFT_PAR_DEBUG").contains("1")
    val t0 = System.nanoTime()
    try {
      val fs = frames.zipWithIndex.map { case (f, i) => Future {
        val s0 = System.nanoTime()
        val r = f.localCheckpoint()
        if (debug) System.err.println(
          f"[par] branch $i ${(System.nanoTime() - s0) / 1e9}%.2fs " +
            f"(at ${(System.nanoTime() - t0) / 1e9}%.2fs)")
        r
      } }
      val r = Await.result(Future.sequence(fs), Duration.Inf)
      if (debug) System.err.println(
        f"[par] all ${frames.size} branches ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    } finally pool.shutdown()
  }
}
