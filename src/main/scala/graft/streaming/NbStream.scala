package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Curation

/** Structured Streaming twin of the TRAINED quality classifier
  * (operators/Curation.nbClassify): the model is trained once on the
  * reference corpus, FROZEN into a ≤ 4096-entry map literal plus two
  * scalar constants (OOV weight, prior bias), and every arriving
  * micro-batch is scored by the same stateless per-token fold the batch
  * path uses — no explode, no join, no state store, no watermark. This
  * is the production admission shape: the classifier gate a crawl
  * pipeline runs on every arriving document, with the model as a
  * broadcast artifact that an offline retrain (or
  * [[graft.operators.Curation.nbModelIncremental]]'s CDC maintenance)
  * refreshes out of band. EventStreamSpec pins streaming ≡ the batch
  * nbClassify row-for-row. */
object NbStream {

  def nbStream(s: SparkSession, dir: String): DataFrame = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
    val (wmap, wOov, bias) =
      Curation.nbFrozenModel(docs, col("lang") === "en")
    // file-stream sources need an explicit schema; the glob sidesteps
    // FileStreamSource's basePath rule (same trick as LmStream).
    Curation.nbScoreStateless(
      s.readStream.schema(docs.schema).parquet(s"$dir/[d]ocuments.parquet"),
      wmap, wOov, bias)
  }
}
