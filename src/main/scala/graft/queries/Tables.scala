package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver testdata (TESTDATA.md). One parquet per table;
  * Catalyst handles column pruning + filter pushdown from the declarative
  * plans built on top (verified via `.explain` — see BenchNotes).
  */
object Tables {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** One-shot per-(path, generation) sample probes — the events-reader
    * r6 lesson generalized (VERDICT r7 #7): each high-traffic table
    * asserts ONE absolute cross-column fact that a silent testdata
    * regeneration drift would break (unit change, column re-meaning,
    * truncation), so the failure is loud AT THE READER instead of a
    * collapsed window or a garbage recall three operators downstream.
    * Each probe reads a few rows of narrow columns, once per JVM per
    * file generation (the fingerprint re-probes a regenerated file). */
  private lazy val sanedPaths =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def assertOnce(s: SparkSession, path: String)(probe: => Unit): Unit = {
    val fp = pathFingerprint(s, path)
    if (!sanedPaths.contains(fp)) { probe; sanedPaths.add(fp) }
  }

  def lineitem(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, year}
    val df = t(s, dir, "lineitem")
    assertOnce(s, s"$dir/lineitem.parquet") {
      // absolute fact: ship dates are civil years (a micro/nano-class
      // unit drift lands millennia away), prices are positive money
      df.select(year(col("l_shipdate")).as("y"), col("l_extendedprice"))
        .head(1).foreach { r =>
          require(r.getInt(0) >= 1990 && r.getInt(0) <= 2010,
            s"lineitem.l_shipdate decoded to year ${r.getInt(0)} in $dir — " +
              "timestamp encoding drifted; fix Tables.lineitem rather than " +
              "letting every date filter silently go empty")
          require(r.getDouble(1) > 0.0,
            s"lineitem.l_extendedprice non-positive in $dir — column drift")
        }
    }
    df
  }
  def orders(s: SparkSession, dir: String): DataFrame = t(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame = t(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = t(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame = t(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame = t(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame = t(s, dir, "region")
  /** `events.ts` physical encoding has drifted across testdata
    * generations: TIMESTAMP(NANOS) (which Spark 4 rejects at schema
    * inference with [PARQUET_TYPE_ILLEGAL]), then TIMESTAMP(MICROS)
    * (reads natively). A reader that hardcodes one encoding silently
    * decodes the other 1000× off (the r6 regression: 30 days of events
    * collapsed into ~43 minutes). So: decode by what the footer actually
    * says, and sample-check one row so any future drift fails LOUDLY.
    *
    *  1. Native `spark.read.parquet` first. TIMESTAMP(MICROS,
    *     adjusted=true) infers TimestampType; adjusted=false infers
    *     TimestampNTZType — cast to TimestampType, an identity on the
    *     stored micros because every entry point pins
    *     spark.sql.session.timeZone=UTC.
    *  2. If inference throws the nanos-specific [PARQUET_TYPE_ILLEGAL],
    *     re-read with an explicit schema (ts as plain LONG nanos — no
    *     session-global legacy flag, ADVICE r2) and integer-DIV to
    *     micros (double division would lose precision above 2^53 ns).
    *  3. If the footer has a bare INT64 with no logical type, the unit
    *     is sniffed from one sampled value (epoch-nanos for any modern
    *     date is ≥ 3 orders of magnitude above epoch-micros).
    *  4. One sampled row must land in [2000, 2100] — a unit mistake is
    *     uniform across rows, so a single sample catches it. Cached per
    *     path; the probe reads one row of one column, negligible even
    *     against a 100 TB table.
    */
  val eventsRawSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
  }

  /** The four `ts` encodings the reader understands. Shared with the
    * streaming reader (EventStream.readEvents must supply an explicit
    * schema, so it needs the SAME probe-then-decode decision — two
    * independent decoders was how the r6 drift corrupted batch and
    * streaming identically without any spec noticing). */
  sealed trait TsEncoding
  object TsEncoding {
    /** TIMESTAMP(MICROS, adjustedToUTC=true) — reads as TimestampType. */
    case object NativeLtz extends TsEncoding
    /** TIMESTAMP(MICROS, adjustedToUTC=false) — TimestampNTZType; cast
      * to LTZ is an identity on the stored micros (session TZ is UTC). */
    case object NativeNtz extends TsEncoding
    /** TIMESTAMP(NANOS) — Spark 4 rejects it at inference, so read raw
      * LONG and integer-DIV to micros. */
    case object LongNanos extends TsEncoding
    /** Bare INT64, value magnitude says micros. */
    case object LongMicros extends TsEncoding
  }

  /** Epoch-nanos vs epoch-micros threshold: 1e17 µs ≈ year 5138, while
    * 1e17 ns ≈ 1973 — any modern instant is unambiguous. */
  private val NanosThreshold = 100000000000000000L

  private val encodingCache =
    new java.util.concurrent.ConcurrentHashMap[String, TsEncoding]()

  /** Cache key carrying the file's identity AND generation (path +
    * modification time + byte length): the motivating failure is the
    * testdata being REGENERATED with a different ts encoding within one
    * JVM session — a path-only key would silently serve the stale
    * encoding and misdecode by 1000× (ADVICE r7), the exact failure
    * class the probe exists to catch. One FS stat per read call. */
  private def pathFingerprint(s: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    try {
      val st = fs.getFileStatus(p)
      val (mt, len) =
        if (st.isDirectory) {
          val kids = fs.listStatus(p)
          (kids.map(_.getModificationTime).foldLeft(st.getModificationTime)(math.max),
            kids.map(_.getLen).sum)
        } else (st.getModificationTime, st.getLen)
      s"$path@$mt:$len"
    } catch {
      // a missing path fails where the read fails, with Spark's message
      case _: java.io.FileNotFoundException => s"$path@missing"
    }
  }

  private def isNanosIllegal(e: Throwable): Boolean = {
    var t = e
    while (t != null) {
      val m = t.getMessage
      if (m != null && (m.contains("PARQUET_TYPE_ILLEGAL") ||
            m.contains("TIMESTAMP(NANOS"))) return true
      t = if (t.getCause eq t) null else t.getCause
    }
    false
  }

  /** Probe the footer (cached per (path, mtime, length); one
    * schema-inference plus at most one single-row scan — negligible
    * against any table size, and a regenerated file re-probes). */
  def eventsTsEncoding(s: SparkSession, path: String): TsEncoding =
    encodingCache.computeIfAbsent(pathFingerprint(s, path), { _ =>
      val p = path
      import org.apache.spark.sql.types._
      try {
        val native = s.read.parquet(p)
        native.schema("ts").dataType match {
          case TimestampType => TsEncoding.NativeLtz
          case TimestampNTZType => TsEncoding.NativeNtz
          case LongType =>
            val sample = native.select(org.apache.spark.sql.functions.col("ts")).head(1)
            if (sample.nonEmpty && math.abs(sample(0).getLong(0)) >= NanosThreshold)
              TsEncoding.LongNanos
            else TsEncoding.LongMicros
          case other =>
            throw new IllegalStateException(
              s"events.ts: unsupported parquet type $other in $p")
        }
      } catch {
        case e: Throwable if isNanosIllegal(e) => TsEncoding.LongNanos
      }
    })

  /** Schema to hand a (streaming) reader for the given encoding. */
  def eventsReadSchema(enc: TsEncoding): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    val tsType: DataType = enc match {
      case TsEncoding.NativeLtz => TimestampType
      case TsEncoding.NativeNtz => TimestampNTZType
      case TsEncoding.LongNanos | TsEncoding.LongMicros => LongType
    }
    StructType(eventsRawSchema.map(f =>
      if (f.name == "ts") f.copy(dataType = tsType) else f))
  }

  /** Normalize the read `ts` column to TimestampType micros. */
  def decodeTs(df: DataFrame, enc: TsEncoding): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.TimestampType
    enc match {
      case TsEncoding.NativeLtz => df
      case TsEncoding.NativeNtz =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TsEncoding.LongNanos =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TsEncoding.LongMicros =>
        df.withColumn("ts", timestamp_micros(col("ts")))
    }
  }

  private val saneEventPaths =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def events(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val path = s"$dir/events.parquet"
    val enc = eventsTsEncoding(s, path)
    val decoded = decodeTs(s.read.schema(eventsReadSchema(enc)).parquet(path), enc)
    val fp = pathFingerprint(s, path)
    if (!saneEventPaths.contains(fp)) {
      // One sampled row must land in a modern year: a unit mistake is
      // uniform across rows, so a single sample catches it, and the
      // probe reads one row of one column — negligible at any scale.
      val sample = decoded
        .select(org.apache.spark.sql.functions.year(col("ts")).as("y"))
        .head(1)
      sample.foreach { r =>
        val y = r.getInt(0)
        require(y >= 2000 && y <= 2100,
          s"events.ts decoded to year $y in $path — physical timestamp " +
            "encoding drifted again; fix Tables.events rather than " +
            "letting every downstream window silently collapse")
      }
      saneEventPaths.add(fp)
    }
    decoded
  }
  def documents(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, length}
    val df = t(s, dir, "documents")
    assertOnce(s, s"$dir/documents.parquet") {
      // absolute cross-column fact: n_chars IS the text length — a
      // truncated or re-encoded text column breaks the equality
      df.select(length(col("text")).as("l"), col("n_chars"), col("doc_id"))
        .head(1).foreach { r =>
          require(r.getInt(0).toLong == r.getLong(1),
            s"documents.n_chars=${r.getLong(1)} != length(text)=${r.getInt(0)} " +
              s"for doc_id=${r.getLong(2)} in $dir — text/metadata drifted; " +
              "fix Tables.documents before any dedup/quality operator runs")
        }
    }
    df
  }

  /** The vector kernels (cosine, SRP, PQ encode, IVF assign) are typed
    * on `array<float>`; if a future testdata generation widens the
    * column to `array<double>` (the pandas/pyarrow default), normalize
    * at the reader — the same drift class as the events `ts` encoding
    * (r6), handled the same way: follow the footer, converge on one
    * logical type. */
  def embeddings(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, size}
    import org.apache.spark.sql.types._
    val df = t(s, dir, "embeddings")
    val typed = df.schema("embedding").dataType match {
      case ArrayType(FloatType, _) => df
      case ArrayType(DoubleType, _) =>
        df.withColumn("embedding", col("embedding").cast(ArrayType(FloatType)))
      case other => throw new IllegalStateException(
        s"embeddings.embedding: unsupported parquet type $other")
    }
    assertOnce(s, s"$dir/embeddings.parquet") {
      // absolute fact: one constant sane dimension across rows — the
      // vector kernels are dim-typed, and a ragged or empty column
      // must fail here, not as a kernel layout error mid-query
      val dims = typed.select(size(col("embedding")).as("d")).head(2).map(_.getInt(0))
      require(dims.nonEmpty && dims.forall(d => d >= 2 && d <= 8192),
        s"embeddings.embedding dimension ${dims.mkString(",")} out of sane " +
          s"range in $dir — column drifted; fix Tables.embeddings")
      require(dims.distinct.size == 1,
        s"embeddings.embedding is RAGGED (${dims.mkString(" vs ")}) in $dir")
    }
    typed
  }
}
