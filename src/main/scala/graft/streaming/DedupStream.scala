package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.operators.Dedup

/** Structured Streaming near-dup ADMISSION gate — the dedup-side twin
  * of the streamed kNN serving path (IvfStream → knnJoinIvfWithDelta):
  * documents arrive as files in a landing zone, the shared minhash
  * feature pass sketches each micro-batch, band keys probe the STORED
  * sketch index (stream-static joins only — stateless, Append mode, no
  * watermark), and exact shingle Jaccard verifies each banded candidate.
  * The emitted (probe_id, stored_id, jaccard) pairs are the keep/drop
  * evidence an ingestion pipeline folds per document (foreachBatch);
  * `Trigger.AvailableNow` turns the same query into a catch-up batch.
  * The body is [[Dedup.admitPairs]], shared verbatim with the batch
  * path, so streaming ≡ batch is structural. */
object DedupStream {

  def admitStream(s: SparkSession, landingGlob: String, schema: StructType,
      stored: DataFrame, tau: Double): DataFrame =
    Dedup.admitPairs(stored,
      Dedup.minhashFeatures(s.readStream.schema(schema).parquet(landingGlob)),
      tau)
}
