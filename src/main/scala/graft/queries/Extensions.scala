package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Aggregator for the large-scale pipeline extension operators
  * (SURVEY.md §2.11): dedup, similarity search, text analysis,
  * multimodal. Filled in per-module; queries without a DuckDB-expressible
  * oracle are registered in `queries` only (driver records a rows-only
  * check).
  */
object Extensions {
  // duplicate-refusing union (Registry.unionDistinct): a key collision
  // here silently SHADOWED a gate in round 12 — now it throws at
  // assembly, naming the key and both owning modules
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.unionDistinct(
      "TextAnalysis" -> graft.operators.TextAnalysis.queries,
      "Dedup" -> graft.operators.Dedup.queries,
      "Similarity" -> graft.operators.Similarity.queries,
      "Events" -> graft.operators.Events.queries,
      "Multimodal" -> graft.operators.Multimodal.queries,
      "ScalePatterns" -> graft.operators.ScalePatterns.queries,
      "AsOf" -> graft.operators.AsOf.queries,
      "Ingest" -> graft.operators.Ingest.queries,
      "Curation" -> graft.operators.Curation.queries,
      "Crawl" -> graft.operators.Crawl.queries,
      "CorpusStats" -> graft.operators.CorpusStats.queries,
      "Spectral" -> graft.operators.Spectral.queries,
      "Bpe" -> graft.operators.Bpe.queries,
      "Formats" -> graft.operators.Formats.queries)

  def oracles: Map[String, String] =
    Registry.unionDistinct(
      "TextAnalysis" -> graft.operators.TextAnalysis.oracles,
      "Dedup" -> graft.operators.Dedup.oracles,
      "Similarity" -> graft.operators.Similarity.oracles,
      "Events" -> graft.operators.Events.oracles,
      "Multimodal" -> graft.operators.Multimodal.oracles,
      "ScalePatterns" -> graft.operators.ScalePatterns.oracles,
      "AsOf" -> graft.operators.AsOf.oracles,
      "Ingest" -> graft.operators.Ingest.oracles,
      "Curation" -> graft.operators.Curation.oracles,
      "Crawl" -> graft.operators.Crawl.oracles,
      "CorpusStats" -> graft.operators.CorpusStats.oracles,
      "Spectral" -> graft.operators.Spectral.oracles,
      "Bpe" -> graft.operators.Bpe.oracles,
      "Formats" -> graft.operators.Formats.oracles)
}
