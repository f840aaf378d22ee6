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
  * region) to keep all registered queries + index builds in one JVM
  * from billing one family's garbage to the next.
  *
  * Fresh-JVM serve isolation (VERDICT r13 #1/#7): the r13 driver run
  * was uniformly ~27% slower per query than both r12 and the builder's
  * same-tree run, with settle GC alone at 72.6 s on a 91 GiB heap whose
  * live set was 322 MB — the serve passes shared a JVM with 118 s of
  * index/model builds plus hundreds of forced full collections. Two
  * fixes: (a) the settle now runs only when the heap actually carries
  * weight (forcing a full GC over a near-empty huge heap costs commit/
  * uncommit page churn inside the NEXT timed query); (b) after its own
  * two passes, the parent forks a FRESH bounded-heap JVM that re-runs
  * the serve passes against the same marker-committed scratch artifacts
  * (zero rebuild — the LSM commit protocol pays off here) and, when the
  * fork succeeds, the headline per-query numbers are the fresh JVM's,
  * with the same-JVM totals recorded alongside ("same_jvm_*") so the
  * A/B rides in the artifact itself. Fork failure (or
  * SPARK_GRAFT_FORK_SERVE=0) falls back to exactly the r13 behavior,
  * disclosed as "serve_jvm":"same".
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

  /** The settle only fires when the heap genuinely carries garbage:
    * below this, a forced full collection is pure overhead — and on a
    * huge -Xmx it additionally uncommits regions the next timed query
    * pays to page back in (the r13 uniform-inflation mechanism). */
  private val SettleMinHeapMb = 2048L

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // a process pointed at another process's scratch IS the serve child
    val isServeChild = sys.env.contains(LocalScratch.SharedRootEnv)
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
          // settle between families, OUTSIDE the timed region — and only
          // when the heap carries enough garbage to be worth a full GC
          if (lastFamily.nonEmpty && heapUsedMb() > SettleMinHeapMb) {
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
    // ---- fresh-JVM serve isolation (r13 verdict #7) -------------------
    // The parent's marker-committed scratch is handed to a fresh child
    // JVM that re-runs ONLY the serve passes (both of them — the
    // headline min-of-2 is the child's, minutes apart as before). The
    // fork decision sits BEFORE the parent's own second pass so the
    // success path doesn't pay for a pass it won't headline — the
    // parent's pass 2 runs only as the FALLBACK, keeping the degraded
    // path exactly the r13 two-pass behavior. Fork conditions: not
    // already the child, not opted out, the scratch exists to share,
    // and pass 1 is clean (a failing surface must surface through the
    // plain path, not a fork).
    // Distinct skip reasons (ADVICE r14): an env opt-out, a missing
    // scratch root, and a poisoned pass 1 are different provenance —
    // the artifact's fork_serve field must say which one happened.
    val skipReason: Option[String] =
      if (isServeChild) Some("child")
      else if (sys.env.getOrElse("SPARK_GRAFT_FORK_SERVE", "1") == "0")
        Some("env-disabled")
      else if (LocalScratch.ownedRoot.isEmpty) Some("no-scratch")
      else if (p1.exists(_.err.nonEmpty)) Some("pass1-errors")
      else None
    val fresh: Either[String, Map[String, String]] =
      skipReason.toLeft(()).flatMap(_ => forkServe())
    val (p2Opt, gc2) = fresh match {
      case Right(_) => (None, 0L)
      case Left(_) => val (p2, g) = pass(); (Some(p2), g)
    }
    val results = p2Opt match {
      case Some(p2) => p1.zip(p2).map { case (a, b) =>
        Sample(a.name, math.min(a.serve, b.serve),
          math.max(a.build, b.build), a.err.orElse(b.err))
      }
      case None => p1
    }
    // 3-decimal seconds (ms resolution — below run-to-run noise): full
    // 17-digit doubles made the 102-query line overflow the driver's
    // output-tail capture, so the recorded artifact held only 63 queries
    // and failed to parse (VERDICT r7 #5). The rounded line is
    // self-contained.
    def sec3(v: Double): String = // Locale.ROOT: a comma decimal point is not JSON
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def qmap(rs: Seq[Sample], f: Sample => Double): String =
      rs.map(r => s"\"" + r.name + "\":" + sec3(f(r)))
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
    // With a successful fork the headline serve numbers are the fresh
    // JVM's and the same-JVM run rides alongside; either way both
    // postures are in the artifact and the provenance is explicit.
    val (headTotal, headQueries, headJvm, headFailed, extra) = fresh match {
      case Right(c) =>
        val childJvm = Seq("gc_ms", "gc_ms_pass1", "gc_ms_pass2",
          "settle_gc_ms", "heap_used_mb", "heap_max_mb")
          .flatMap(k => c.get(k).map(v => s""""$k":$v""")).mkString(",")
        (c("total"), c("queries"), childJvm, c.getOrElse("failed", "0"),
          s""","serve_jvm":"fresh","same_jvm_total":${sec3(total)},""" +
          s""""same_jvm_passes":1,"same_jvm_gc_ms":${gc1 + gc2},""" +
          s""""same_jvm_settle_gc_ms":$settleGcMs""")
      case Left(why) =>
        (sec3(total), qmap(results, _.serve), jvm, errors.size.toString,
          if (isServeChild) ""
          else s""","serve_jvm":"same","fork_serve":"${jsonEscape(why)}"""")
    }
    val head = s""""metric":"total","value":$headTotal,"unit":"sec",""" +
      s""""schema":2,"semantics":"serve=wall-build","agg":"min_of_2_passes",""" +
      s""""build_total":${sec3(buildTotal)}"""
    val detailPath = new java.io.File(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", "BENCH_DETAIL.json"))
      .getAbsoluteFile
    val sameJvmQs = fresh match {
      case Right(_) => s""","same_jvm_queries":${qmap(results, _.serve)}"""
      case Left(_) => ""
    }
    val detail = s"""{$head,"queries":$headQueries,"build":$builds,""" +
      s""""failed":$headFailed,"errors":$errJson,$headJvm$extra$sameJvmQs,""" +
      s""""sf":"$sfDir"}"""
    java.nio.file.Files.write(detailPath.toPath,
      (detail + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val summary = s"""{$head,"n_queries":${results.size},""" +
      s""""failed":$headFailed,$headJvm$extra,"sf":"$sfDir",""" +
      s""""detail":"${jsonEscape(detailPath.getPath)}"}"""
    // summary first (head captures), and again AFTER spark.stop() as
    // the true last stdout line (tail captures) — nothing else prints
    // to stdout, so any capture window that sees the end of the stream
    // parses.
    println(summary)
    spark.stop()
    println(summary)
    System.out.flush()
    val childFailed = fresh.toOption.exists(_.getOrElse("failed", "0") != "0")
    if (errors.nonEmpty || childFailed) {
      errors.foreach { case (k, m) => System.err.println(s"BENCH FAIL $k: $m") }
      if (childFailed) System.err.println("BENCH FAIL fresh-JVM serve pass")
      sys.exit(1)
    }
  }

  /** Fork the fresh-JVM serve child and harvest its artifact. Returns
    * Right(fields) — "total", "queries" (raw JSON object string), GC/
    * heap numbers, "failed" — or Left(reason) to fall back. Never
    * throws: a fork problem must degrade to the same-JVM numbers, not
    * kill the bench. */
  private def forkServe(): Either[String, Map[String, String]] = {
    var detail: java.nio.file.Path = null
    var out: java.nio.file.Path = null
    try {
      import scala.jdk.CollectionConverters._
      val root = LocalScratch.ownedRoot.get
      detail = java.nio.file.Files.createTempFile("graft_child_bench", ".json")
      val java17 = java.nio.file.Paths.get(
        System.getProperty("java.home"), "bin", "java").toString
      val rt = java.lang.management.ManagementFactory.getRuntimeMXBean
      // inherit module opens and -D config; pin the child heap to the
      // parent's (already bounded by the launcher)
      val inherited = rt.getInputArguments.asScala.filter(a =>
        a.startsWith("--add-opens") || a.startsWith("--add-exports") ||
          a.startsWith("-D"))
      val cmd = (Seq(java17, s"-Xmx${Runtime.getRuntime.maxMemory >> 20}m") ++
        inherited ++
        Seq("-cp", System.getProperty("java.class.path"), "graft.Bench")).asJava
      val pb = new ProcessBuilder(cmd)
      pb.environment().put(LocalScratch.SharedRootEnv, root.toString)
      pb.environment().put("SPARK_GRAFT_BENCH_DETAIL", detail.toString)
      // child stdout is ours to harvest — it must NOT reach the driver's
      // capture of the parent's stdout
      out = java.nio.file.Files.createTempFile("graft_child_bench", ".out")
      pb.redirectOutput(out.toFile)
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      val proc = pb.start()
      if (!proc.waitFor(45, java.util.concurrent.TimeUnit.MINUTES)) {
        proc.destroyForcibly()
        return Left("timeout after 45m")
      }
      if (proc.exitValue() != 0) return Left(s"exit ${proc.exitValue()}")
      // Real JSON parse of the child artifact (ADVICE r14) — the former
      // regex harvest silently fell back on any nested object or numeric
      // format drift. Jackson ships with Spark itself.
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(detail.toFile)
      def field(key: String): Option[String] =
        Option(node.get(key)).map(_.toString)
      (field("value"), field("queries")) match {
        case (Some(total), Some(qs)) =>
          Right(Map("total" -> total, "queries" -> qs) ++
            Seq("failed", "gc_ms", "gc_ms_pass1", "gc_ms_pass2",
              "settle_gc_ms", "heap_used_mb", "heap_max_mb")
              .flatMap(k => field(k).map(k -> _)).toMap)
        case _ => Left("child artifact unparseable")
      }
    } catch {
      case e: Throwable =>
        Left(e.getClass.getSimpleName + ": " +
          String.valueOf(e.getMessage).take(120))
    } finally {
      // the artifacts are harvested (or useless) by now — don't let
      // repeated bench runs accumulate temp files (ADVICE r14)
      Seq(detail, out).filter(_ != null).foreach { p =>
        try java.nio.file.Files.deleteIfExists(p) catch { case _: Throwable => () }
      }
    }
  }
}
