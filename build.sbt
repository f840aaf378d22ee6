ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hhek2sqlitespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Bench/Verify emit machine-parsed JSON on stdout: the forked JVM must
// inherit stdout directly, or sbt's logger prefixes every line with
// "[info] " and the driver's JSON tail capture fails to parse.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// UTF-8 locale for forked JVMs: sun.jnu.encoding (filesystem path
// encoding) follows the OS locale and ignores -D overrides, and the
// Hogia tables have non-ASCII names (Överföringar, LÅN).
Test / envVars ++= Map("LC_ALL" -> "C.UTF-8", "LANG" -> "C.UTF-8")
run / envVars ++= Map("LC_ALL" -> "C.UTF-8", "LANG" -> "C.UTF-8")
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Heap clamp (round-13 verdict #1): the driver exports a huge
// SPARK_DRIVER_MEM (the r13 bench JVM ran a 91 GiB heap over a 322 MB
// live set) and paid 72.6 s of forced full collections plus region
// commit/uncommit churn billed to whichever query ran next — a uniform
// ~27% serve inflation vs the builder's bounded-heap run of the same
// tree. The sf0.1/sf1 working set is <1 GiB; past ~16 GiB a bigger heap
// only makes each collection more expensive. Values at or under the cap
// pass through untouched.
// Escape hatch (ADVICE r14): SPARK_GRAFT_HEAP_CAP overrides the cap in
// MiB; 0 disables clamping entirely. The clamp prints a notice when it
// fires so a silently-rewritten SPARK_DRIVER_MEM is visible in the log.
def clampHeap(req: String): String = {
  val capMb = sys.env.get("SPARK_GRAFT_HEAP_CAP")
    .flatMap(s => scala.util.Try(s.trim.toLong).toOption)
    .getOrElse(16384L)
  if (capMb <= 0L) req
  else "^(\\d+)([gGmM])$".r.findFirstMatchIn(req.trim) match {
    case Some(m) =>
      val mb = m.group(1).toLong *
        (if (m.group(2).toLowerCase == "g") 1024L else 1L)
      if (mb > capMb) {
        println(s"[graft] clamping requested heap $req to ${capMb}m " +
          "(override: SPARK_GRAFT_HEAP_CAP=<MiB>, 0 disables)")
        s"${capMb}m"
      } else req
    case None => req // unrecognized spec: leave the caller's value alone
  }
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // Non-ASCII table names (Överföringar, LÅN) must survive filesystem
  // paths regardless of the host locale (SURVEY.md §1.3 invariant 4).
  "-Dfile.encoding=UTF-8",
  "-Dsun.jnu.encoding=UTF-8",
  s"-Xmx${clampHeap(sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))}",
)
