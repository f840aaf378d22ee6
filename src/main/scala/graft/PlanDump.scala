package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Builder tooling (optimization rounds): dump `explain("formatted")` for
  * every registered query (or a named subset) to one file per query, plus
  * a one-line-per-query summary of plan-shape stats (Exchange count, join
  * strategies, scan pushdown) on stdout.
  *
  * Usage: graft.PlanDump <sfDir> <outDir> [queryName...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.drop(1).headOption.getOrElse("plans/r15")
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = LocalScratch.configure(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false"), "plandump")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "_before")
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only.contains(n))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          ExplainMode.fromString("formatted"))
        Files.write(Paths.get(outDir, s"$name$suffix.txt"),
          plan.getBytes(StandardCharsets.UTF_8))
        val nEx = "(?m)^..?.?Exchange".r.findAllIn(plan).size
        val joins = Seq("BroadcastHashJoin", "SortMergeJoin",
          "ShuffledHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct")
          .map(j => j -> j.r.findAllIn(plan).size).filter(_._2 > 0)
          .map { case (j, n) => s"$j:$n" }.mkString(",")
        println(s"PLAN $name exchanges=$nEx joins=[$joins] " +
          s"rows=${plan.linesIterator.size}")
      } catch {
        case e: Throwable =>
          println(s"PLAN $name ERROR ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).take(120))
      }
    }
    spark.stop()
  }
}
