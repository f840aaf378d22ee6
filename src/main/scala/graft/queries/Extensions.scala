package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Aggregator for the large-scale pipeline extension operators
  * (SURVEY.md §2.11): dedup, similarity search, text analysis,
  * multimodal. Filled in per-module; queries without a DuckDB-expressible
  * oracle are registered in `queries` only (driver records a rows-only
  * check).
  */
object Extensions {
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.operators.TextAnalysis.queries ++
      graft.operators.Dedup.queries ++
      graft.operators.Similarity.queries ++
      graft.operators.Events.queries ++
      graft.operators.Multimodal.queries ++
      graft.operators.ScalePatterns.queries ++
      graft.operators.AsOf.queries ++
      graft.operators.Ingest.queries ++
      graft.operators.Curation.queries ++
      graft.operators.Crawl.queries ++
      graft.operators.CorpusStats.queries ++
      graft.operators.Spectral.queries ++
      graft.operators.Bpe.queries ++
      graft.operators.Formats.queries

  def oracles: Map[String, String] =
    graft.operators.TextAnalysis.oracles ++
      graft.operators.Dedup.oracles ++
      graft.operators.Similarity.oracles ++
      graft.operators.Events.oracles ++
      graft.operators.Multimodal.oracles ++
      graft.operators.ScalePatterns.oracles ++
      graft.operators.AsOf.oracles ++
      graft.operators.Ingest.oracles ++
      graft.operators.Curation.oracles ++
      graft.operators.Crawl.oracles ++
      graft.operators.CorpusStats.oracles ++
      graft.operators.Spectral.oracles ++
      graft.operators.Bpe.oracles ++
      graft.operators.Formats.oracles
}
