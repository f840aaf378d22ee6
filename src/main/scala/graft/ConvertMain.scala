package graft

import org.apache.spark.sql.SparkSession

import graft.ops.Convert
import graft.schema.HogiaSchema
import graft.sources.{JetScriptTableIO, JetTableIO, ParquetTableIO, SqliteTableIO, TableIO}

/** CLI entry with the reference's flag surface (O1,
  * `hhek2sqlite.go:1205-1228`): `-optin=<path>` source,
  * `-optout=<path>` target, `-backa` reverse direction, `-readonly`
  * accepted for compatibility (mirror reads are always read-only).
  * A path ending in `.mdb` is a REAL Jet 2.0-era Access database,
  * parsed AND created natively (graft.sources.JetFile — the reference's
  * forward INPUT, `hhek2sqlite.go:1253-1279`, and its reverse-mode
  * OUTPUT, `:1177-1202`); a path ending in `.db`
  * is a REAL single-file SQLite database (graft.sources.SqliteFile —
  * the reference's forward output, `hhek2sqlite.go:1148-1165`); any
  * other path is a parquet "jet-dump" mirror (one dir per table,
  * SURVEY.md §7.3). So `-optin=GOTEST1.MDB -optout=out.db` runs the
  * reference's exact forward conversion with genuine artifacts on both
  * ends. Swap [[graft.sources.JdbcTableIO]] in when a real Access/
  * SQLite JDBC driver is on the classpath.
  *
  * Pre-flight guards per the reference (`hhek2sqlite.go:1233-1242`):
  * forward requires the source to exist; reverse refuses to overwrite an
  * existing target. Exit code 1 on argument errors (`:1216`).
  *
  * Invocation note: table directories are non-ASCII (`Överföringar`,
  * `LÅN` — §1.3 invariant 4), so the JVM must run under a UTF-8 locale
  * (`LANG=C.UTF-8`); `sun.jnu.encoding` derives from the locale and a
  * POSIX/C locale mangles the filenames at the syscall layer.
  */
object ConvertMain {
  def main(args: Array[String]): Unit = {
    val opts = args.flatMap {
      case a if a.startsWith("-optin=") => Some("in" -> a.stripPrefix("-optin="))
      case a if a.startsWith("-optout=") => Some("out" -> a.stripPrefix("-optout="))
      case "-backa" => Some("backa" -> "true")
      case "-readonly" => Some("readonly" -> "true")
      case other =>
        // fatal, like the reference's arg errors (hhek2sqlite.go:1216):
        // a typo of -backa must not silently convert the WRONG direction
        System.err.println(s"okänd flagga: $other")
        sys.exit(1)
    }.toMap

    val (in, out) = (opts.get("in"), opts.get("out")) match {
      case (Some(i), Some(o)) => (i, o)
      case _ =>
        System.err.println("användning: ConvertMain -optin=<dir> -optout=<dir> [-backa] [-readonly]")
        sys.exit(1)
    }
    val reverse = opts.contains("backa")

    val spark = SparkSession.builder()
      .appName("graft-konvertera")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      def io(path: String): TableIO = {
        val lower = path.toLowerCase // case-insensitive for ALL extensions:
        // OUT.DB must hit the SQLite codec, not fall through to parquet
        if (lower.endsWith(".mdb")) new JetTableIO(path)
        else if (lower.endsWith(".db")) new SqliteTableIO(path)
        else if (lower.endsWith(".sql")) new JetScriptTableIO(path) // reverse script
        else new ParquetTableIO(path)
      }
      val source = io(in)
      val sink = io(out)
      // pre-flight (reference: source must exist; reverse target must not)
      if (!source.exists(spark, HogiaSchema.byName("DtbVer"))) {
        System.err.println(s"källan saknas: $in")
        sys.exit(1)
      }
      if (reverse && sink.exists(spark, HogiaSchema.byName("DtbVer"))) {
        System.err.println(s"målet finns redan: $out")
        sys.exit(1)
      }
      val counts = Convert.konvertera(spark, source, sink, reverse)
      HogiaSchema.copyOrder.foreach { t =>
        println(s"${t.name}: ${counts(t.name)} rader")
      }
    } finally spark.stop()
  }
}
