package graft

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.SparkSession

/** Fast local scratch for the driver mains (Bench / Verify / Profile).
  *
  * `spark.local.dir` (shuffle files, spills, broadcast scratch) and
  * `graft.scratch` (materialized-table scratch: q_roundtrip, the stored
  * sketch/IVF ingest layouts) default to the persistent disk. On this
  * container that disk sustains ~10 MB/s (quota-throttled VM volume), so
  * accumulated shuffle + scratch writes park in the page cache until the
  * dirty limit trips and then stall WHICHEVER query happens to be writing
  * — measured as random 10-60 s outliers on otherwise sub-second queries
  * while GC total stays <2 s.
  *
  * The box has 128 GiB RAM and the whole sf0.1 working set is <1 GiB, so
  * tmpfs is the correct local-dir medium here — the same deployment
  * decision a production cluster makes by pointing spark.local.dir at
  * local NVMe instead of a network volume (Spark's own tuning guide:
  * local dirs belong on the fastest local device, they hold only
  * recomputable intermediate state). Falls back to Spark defaults when
  * /dev/shm is missing. Everything created here is deleted on JVM exit.
  */
object LocalScratch {

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => { val _ = Files.deleteIfExists(f) })
    }

  /** Env var naming a scratch root OWNED BY ANOTHER PROCESS — the
    * bench's fresh-JVM serve child points here so its `ensure*` calls
    * find the parent's marker-committed artifacts instead of
    * rebuilding. The pointee's owner cleans up; the child must not. */
  val SharedRootEnv = "GRAFT_SCRATCH_ROOT"

  /** The scratch root this process created (None until [[configure]]
    * runs, or when /dev/shm is unavailable / the root is borrowed). */
  @volatile var ownedRoot: Option[Path] = None

  /** Adds tmpfs-backed spark.local.dir + graft.scratch to the builder
    * (no-op on hosts without /dev/shm) and registers exit cleanup.
    * Under [[SharedRootEnv]] the materialized-artifact scratch is the
    * owner's; spark.local.dir (shuffle/spill scratch) stays per-process
    * — block managers must never share live directories. */
  def configure(b: SparkSession.Builder, app: String): SparkSession.Builder =
    sys.env.get(SharedRootEnv) match {
      case Some(owned) =>
        val root = Paths.get(owned)
        val local = root.resolve(s"local-${ProcessHandle.current().pid()}")
        Files.createDirectories(local)
        b.config("spark.local.dir", local.toString)
          .config("graft.scratch", root.resolve("scratch").toString)
      case None =>
        val shm = Paths.get("/dev/shm")
        if (!Files.isDirectory(shm) || !Files.isWritable(shm)) b
        else {
          val root = shm.resolve(s"graft-$app-${ProcessHandle.current().pid()}")
          Files.createDirectories(root.resolve("local"))
          Files.createDirectories(root.resolve("scratch"))
          sys.addShutdownHook(deleteRecursively(root))
          ownedRoot = Some(root)
          b.config("spark.local.dir", root.resolve("local").toString)
            .config("graft.scratch", root.resolve("scratch").toString)
        }
    }
}
