package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.TextAnalysis.fingerprint
import graft.queries.Tables.documents

/** Deduplication operators over `documents` (SURVEY.md §2.11): exact
  * (hash-groupBy), MinHash+LSH near-dup, SimHash near-dup.
  *
  * 100 TB design notes:
  *  - Exact dedup shuffles once on a uniform 128-bit digest — no skew by
  *    construction; group state is O(1) per digest.
  *  - MinHash: the only quadratic step is candidate verification, bounded
  *    per LSH bucket; band-bucket is the shuffle key (uniform), and
  *    signatures are fixed-width (64 longs/doc) regardless of doc size.
  *  - SimHash: constant 64-bit sketch per doc, candidate pairs restricted
  *    to band-equal buckets (pigeonhole: hamming ≤ 3 ⇒ one of 4 16-bit
  *    bands equal) — never an all-pairs comparison.
  *  - All hashes are deterministic seeded permutations of xxhash64/
  *    murmur3 — rerunning a 1000-executor job reproduces identical output.
  */
object Dedup {

  // --- MinHash parameters (16 bands × 4 rows = 64 permutations) -------
  private val NumPerm = 64
  private val BandRows = 4
  private val NumBands = NumPerm / BandRows
  /** Same Mersenne-ish prime Spark MLlib's MinHashLSH uses. */
  private val Prime = 2038074743L
  /** Deterministic affine-permutation coefficients (seeded — never
    * Math.random at plan time). */
  private val perms: Seq[(Long, Long)] = {
    val rng = new scala.util.Random(42)
    Seq.fill(NumPerm)((1L + rng.nextInt((Prime - 1).toInt).toLong,
      rng.nextInt(Prime.toInt).toLong))
  }

  /** Normalized word-token array. */
  private def tokens(text: Column): Column =
    split(lower(regexp_replace(trim(text), "\\s+", " ")), " ")

  /** Word 3-shingles (docs shorter than 3 tokens fall back to the whole
    * normalized text as a single shingle). */
  private def shingles(text: Column): Column = {
    val t = tokens(text)
    val grams = transform(
      sequence(lit(0), size(t) - 3),
      i => concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2), element_at(t, i + 3)))
    array_distinct(when(size(t) < 3, array(concat_ws(" ", t))).otherwise(grams))
  }

  /** (doc_id, shingle_hash) exploded + distinct — the set representation
    * both MinHash signatures and exact-Jaccard verification run on. */
  private def shingleSets(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(shingles(col("text"))).as("shingle"))
      .select(col("doc_id"), xxhash64(col("shingle")).as("sh"))
      .distinct()

  /** MinHash signature: 64 min-aggregations of affine permutations of the
    * shingle hash — one shuffle on doc_id, fixed-width output. */
  private def signatures(sets: DataFrame): DataFrame = {
    val base = pmod(col("sh"), lit(Prime))
    val sigCols = perms.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(lit(a) * base + lit(b), lit(Prime))).as(s"m$i")
    }
    sets.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
  }

  /** Explode signatures into (band_idx, band_hash) bucket keys. */
  private def bands(sig: DataFrame): DataFrame = {
    val bandStructs = (0 until NumBands).map { j =>
      val cols = (j * BandRows until (j + 1) * BandRows).map(i => col(s"m$i"))
      struct(lit(j).as("band_idx"),
        xxhash64(concat_ws("_", cols: _*)).as("band_hash"))
    }
    sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("b"))
      .select(col("doc_id"), col("b.band_idx"), col("b.band_hash"))
  }

  /** Candidate pairs: docs sharing any LSH band bucket (doc1 < doc2),
    * deduped. The bucket self-join shuffles on the uniform band hash. */
  def minhashCandidates(docs: DataFrame): DataFrame = {
    val b = bands(signatures(shingleSets(docs)))
    val x = b.as("x"); val y = b.as("y")
    x.join(y,
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_hash") === col("y.band_hash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc1"), col("y.doc_id").as("doc2"))
      .distinct()
  }

  /** Exact Jaccard verification of candidate pairs against the true
    * shingle sets (the only quadratic step — bounded per bucket). */
  def verifiedJaccard(docs: DataFrame, candidates: DataFrame): DataFrame = {
    val sets = shingleSets(docs).cache()
    val sizes = sets.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val s1 = sets.select(col("doc_id").as("doc1"), col("sh"))
    val s2 = sets.select(col("doc_id").as("d2"), col("sh").as("sh2"))
    candidates
      .join(s1, "doc1")
      .join(s2, col("doc2") === col("d2") && col("sh") === col("sh2"))
      .groupBy("doc1", "doc2").agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("doc1"), col("sz").as("sz1")), "doc1")
      .join(sizes.select(col("doc_id").as("doc2"), col("sz").as("sz2")), "doc2")
      .select(col("doc1"), col("doc2"),
        (col("inter").cast(DoubleType) /
          (col("sz1") + col("sz2") - col("inter")).cast(DoubleType)).as("jaccard"))
  }

  // --- SimHash ---------------------------------------------------------

  /** 64-bit SimHash per doc: per-bit ±1 votes over token hashes, sign →
    * bit. One shuffle (groupBy doc_id), 64 integer aggregations. */
  def simhash(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    val bitSums = (0 until 64).map { k =>
      sum(when(shiftright(col("h"), k).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$k")
    }
    val agg = tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sh = (0 until 64).map { k =>
      when(col(s"b$k") > 0, shiftleft(lit(1L), k)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    agg.select(col("doc_id"), sh.as("simhash"))
  }

  /** Near-dup pairs by SimHash: 4×16-bit band buckets (pigeonhole for
    * hamming ≤ 3), then exact hamming verification via bit_count(xor). */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sh = simhash(docs)
    val banded = sh.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map { j =>
        struct(lit(j).as("band_idx"),
          shiftright(col("simhash"), j * 16).bitwiseAND(0xFFFFL).as("band_val"))
      }: _*)).as("b"))
      .select(col("doc_id"), col("simhash"), col("b.band_idx"), col("b.band_val"))
    val x = banded.as("x"); val y = banded.as("y")
    x.join(y,
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc1"), col("y.doc_id").as("doc2"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // --- query surface ---------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact dedup via canonical-form digest groupBy (uniform shuffle key).
    "q_dedup_exact" -> ((s, dir) =>
      documents(s, dir)
        .groupBy(fingerprint(col("text")).as("fp"))
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("fp")),

    // distinct-rows dedup: deterministic keep-first-by-id survivor per
    // digest (plain dropDuplicates keeps an ARBITRARY row — fine for
    // volume reduction, wrong for a reproducible pipeline).
    "q_dedup_survivors" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("fp").orderBy("doc_id")
      documents(s, dir)
        .withColumn("fp", fingerprint(col("text")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    }),

    // MinHash LSH near-dup: top-100 verified candidate pairs by exact
    // Jaccard (threshold-free so the result is non-empty on corpora
    // without true near-dups). No SQL oracle — hash-permutation specific.
    "q_near_dup_minhash" -> ((s, dir) => {
      val docs = documents(s, dir)
      verifiedJaccard(docs, minhashCandidates(docs))
        .orderBy(desc("jaccard"), asc("doc1"), asc("doc2"))
        .limit(100)
        .select("doc1", "doc2") // drop the double score: deterministic set
        .orderBy("doc1", "doc2")
    }),

    // SimHash sketches per doc (deterministic 64-bit values).
    "q_simhash" -> ((s, dir) =>
      simhash(documents(s, dir)).orderBy("doc_id")),

    // n-gram Jaccard near-dup via SimHash banding + hamming verify.
    "q_near_dup_simhash" -> ((s, dir) =>
      simhashPairs(documents(s, dir), maxHamming = 16)
        .orderBy(desc("hamming"), asc("doc1"), asc("doc2"))
        .limit(100)
        .select("doc1", "doc2", "hamming")
        .orderBy("doc1", "doc2"))
  )

  val oracles: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp,
        |       min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,
    "q_dedup_survivors" ->
      """SELECT doc_id, lang, source FROM (
        |  SELECT doc_id, lang, source,
        |         row_number() OVER (PARTITION BY md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
        |                            ORDER BY doc_id) AS rn
        |  FROM documents) WHERE rn = 1 ORDER BY doc_id""".stripMargin
  )
}
