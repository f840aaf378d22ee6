package graft.operators

import org.apache.spark.sql.SparkSession

/** THE stored-artifact path + commit protocol — one implementation for
  * every `ensure*`/`purge*`/`compact*` family (Ingest, Curation,
  * CorpusStats, Formats, Multimodal previously carried private copies;
  * a protocol change replicated across five files is how artifact
  * layouts silently fork between axes).
  *
  *  - Paths are per-application (appId) under an overridable root
  *    (`graft.scratch` conf), so concurrent driver runs over the same
  *    dataset never race on one directory.
  *  - An artifact is LIVE only once its `_SUCCESS` marker exists: a
  *    bare directory can be a torn write from a crashed run, and gated
  *    writes are OVERWRITE so a torn directory is repaired, never
  *    served.
  */
private[operators] object Artifacts {

  def scratch(s: SparkSession, dir: String, name: String): String = {
    val root = s.conf.getOption("graft.scratch").getOrElse("target/tmp")
    s"$root/${s.sparkContext.applicationId}/${name}_" +
      dir.replaceAll("[^0-9a-zA-Z]", "_")
  }

  def committed(s: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
  }
}
