package graft

import org.apache.spark.sql.SparkSession

/** Builder tooling: time a single named query (or ad-hoc stage probes)
  * at a given SF dir. Usage: graft.Profile <sfDir> <queryName>... */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = LocalScratch.configure(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false"), "profile")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    names.foreach {
      // phase breakdown of the stateless LM pipeline (train/plan/score)
      case "lm_phases" =>
        val docs = graft.queries.Tables.documents(spark, sfDir)
        val (u, b) = time("lm:train")(graft.operators.TextAnalysis.lmTables(docs))
        val df = time("lm:plan")(
          graft.operators.TextAnalysis.lmScoreStateless(docs, u, b))
        time("lm:score")(df.count())
      // phase breakdown of the PQ pipeline (train/encode+rank)
      case "pq_phases" =>
        val emb = graft.queries.Tables.embeddings(spark, sfDir)
        val (cb, dim, _) = time("pq:train")(
          graft.operators.Similarity.pqTrain(emb, 8, 256, iters = 1))
        graft.functions.PqOps.register(spark)
        // serve phase reuses the trained model (pqTopK would retrain)
        time("pq:serve") {
          val (qid, dot, nrm) =
            graft.operators.Similarity.adcTables(emb, cb, dim, 8, 256)
          val coded = emb.select(org.apache.spark.sql.functions.col("vec_id"),
            graft.functions.PqOps.encode(
              org.apache.spark.sql.functions.col("embedding"), cb, 8, 256)
              .as("code"))
          graft.operators.Similarity.pqRescore(emb,
            graft.operators.Similarity.pqRank(coded, qid, dot, nrm, 8, 256, 600),
            10).count()
        }
      case n =>
        val t0 = System.nanoTime()
        val cnt = SparkEntry.queries(n)(spark, sfDir).count()
        println(f"$n%-24s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$cnt")
    }
    spark.stop()
  }
}
