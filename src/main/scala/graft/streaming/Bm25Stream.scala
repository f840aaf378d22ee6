package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Structured Streaming twin of the BM25 scorer
  * (operators/TextAnalysis.bm25TopK): the model — per-query-term
  * document frequencies plus the (N, Σdl) corpus statistics — is a
  * FROZEN artifact trained once on the reference corpus, and every
  * micro-batch scores its documents with a narrow per-row expression
  * (token counts via array arithmetic, no explode, no join, no state) —
  * the relevance-routing admission shape: tag documents with their
  * query relevance as they land, without the stream shifting the
  * corpus statistics it is scored against. Same tokenization and
  * literal arithmetic as the batch operator; EventStreamSpec pins the
  * streamed scores' top-k ≡ the batch top-k list. */
object Bm25Stream {

  /** Per-document BM25 score as one narrow column expression over the
    * frozen model (term → df, plus n_docs / dl_total). A document with
    * none of the query's terms scores 0. Term order is fixed
    * (sorted) so the ≤|terms| double additions are deterministic. */
  def bm25ScoreCol(text: Column, df: Map[String, Long], nDocs: Long,
      dlTotal: Long, k1: Double = 1.2, b: Double = 0.75): Column = {
    val toks = split(lower(regexp_replace(trim(text), "\\s+", " ")), " ")
    val dl = size(toks).cast(DoubleType)
    val avgdl = lit(dlTotal.toDouble) / lit(nDocs.toDouble)
    val terms = df.toSeq.sortBy(_._1).map { case (term, dfT) =>
      val tf = size(filter(toks, t => t === term)).cast(DoubleType)
      when(tf > 0,
        log((lit(nDocs.toDouble) - dfT + lit(0.5)) /
            (lit(dfT.toDouble) + lit(0.5)) + lit(1.0)) *
          (tf * lit(k1 + 1.0)) /
          (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / avgdl)))
        .otherwise(lit(0.0))
    }
    // reduceOption: an empty df map (no query term occurs in the
    // reference corpus) scores every document 0.0 — the batch operator
    // returns an empty top-k in that situation; a bare reduce would
    // crash the stream with an opaque empty.reduce error (ADVICE r8)
    round(terms.reduceOption(_ + _).getOrElse(lit(0.0)), 6)
  }

  /** Train the frozen model on the reference corpus: (term → df, N,
    * Σdl) — all tiny driver-side artifacts, the same values the batch
    * operator's subtrees derive. Shared by [[bm25Stream]] and the
    * composed ingest gate ([[IngestGateStream]]). */
  def frozenModel(s: SparkSession, dir: String,
      queryTerms: Seq[String]): (Map[String, Long], Long, Long) = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
    def toks = split(lower(regexp_replace(trim(col("text")), "\\s+", " ")), " ")
    val stats = docs.select(toks.as("t"))
      .agg(count(lit(1)).as("n"), sum(size(col("t"))).as("dl")).head()
    require(stats.getLong(0) > 0,
      s"BM25 stream needs a non-empty reference corpus at $dir")
    val dfMap = docs
      .select(explode(array_distinct(toks)).as("term"))
      .filter(col("term").isInCollection(queryTerms))
      .groupBy("term").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (dfMap, stats.getLong(0), stats.getLong(1))
  }

  /** Train the frozen model on the reference corpus, then score the
    * document stream with it. */
  def bm25Stream(s: SparkSession, dir: String,
      queryTerms: Seq[String]): DataFrame = {
    val (dfMap, nDocs, dlTotal) = frozenModel(s, dir, queryTerms)
    val schema = s.read.parquet(s"$dir/documents.parquet").schema
    // file-stream sources need an explicit schema; the glob sidesteps
    // FileStreamSource's basePath rule (same trick as LmStream).
    s.readStream.schema(schema).parquet(s"$dir/[d]ocuments.parquet")
      .select(col("doc_id"),
        bm25ScoreCol(col("text"), dfMap, nDocs, dlTotal).as("score"))
  }
}
