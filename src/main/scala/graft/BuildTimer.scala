package graft

/** Driver-side meter separating INDEX-BUILD / MODEL-TRAIN cost from
  * serve cost in the bench artifact (VERDICT r10 #3: q_pq_topk's
  * headline number was 5× its stored twin's purely because the one-time
  * codebook training ran inside the timed serve path, which confounds
  * round-over-round comparison).
  *
  * Every `ensure*` / `compact*` stored-artifact builder and every
  * train-on-serve model fit (`pqTrain`, `kmeansCentroids`) wraps its
  * body in [[time]]; [[Bench]] drains the accumulator around each query
  * and reports `build` and serve (= wall − build) separately. The
  * depth guard keeps nested builders (ensureSketchedDelta →
  * ensureSketchedDocs, ensureIvfPqIndex → ensurePqCodebook) from
  * double-counting: only the OUTERMOST frame on a thread accrues.
  *
  * Driver-side only — the wrapped bodies run their Spark actions
  * synchronously on the calling thread, so wall time here is exactly
  * the build's end-to-end cost; nothing is measured on executors.
  */
object BuildTimer {

  private val acc = new java.util.concurrent.atomic.AtomicLong

  private val depth = new ThreadLocal[Integer] {
    override def initialValue(): Integer = 0
  }

  /** Run `body`, accruing its wall time to the build meter unless an
    * enclosing [[time]] frame on this thread is already counting it. */
  def time[T](body: => T): T = {
    val d: Int = depth.get()
    depth.set(d + 1)
    val t0 = System.nanoTime()
    try body
    finally {
      depth.set(d)
      if (d == 0) acc.addAndGet(System.nanoTime() - t0)
    }
  }

  /** Seconds accrued since the last drain; resets the meter. */
  def drainSeconds(): Double = acc.getAndSet(0L) / 1e9
}
