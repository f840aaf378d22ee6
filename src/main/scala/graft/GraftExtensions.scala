package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions._

/** Session-extension injector: registers every graft custom expression
  * at session build time, so a cluster deployment enables the whole
  * function surface with
  * `--conf spark.sql.extensions=graft.GraftExtensions` (SQL and
  * Column-API alike). The operators also self-register lazily via
  * `Sketch.register`/`VectorOps.register` for sessions built without the
  * conf (e.g. the driver's own session calling `SparkEntry.entry`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    // declarative row_number()<=k idiom → bounded-heap top-k operator
    ext.injectOptimizerRule(_ => graft.plans.TopKRewrite)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.Expression

  private def info(name: String, clazz: Class[_]): ExpressionInfo =
    new ExpressionInfo(clazz.getCanonicalName, name)

  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_simhash"), info("graft_simhash", classOf[SimHashTokens]),
      (es: Seq[Expression]) => SimHashTokens(es.head)),
    (FunctionIdentifier("graft_minhash_shingles"),
      info("graft_minhash_shingles", classOf[MinHashShingleFeatures]),
      (es: Seq[Expression]) => MinHashShingleFeatures(es.head)),
    (FunctionIdentifier("graft_winnow"), info("graft_winnow", classOf[WinnowFingerprints]),
      (es: Seq[Expression]) => WinnowFingerprints(es.head)),
    (FunctionIdentifier("graft_cosine"), info("graft_cosine", classOf[CosineSimilarity]),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))),
    (FunctionIdentifier("graft_srp64"), info("graft_srp64", classOf[Srp64]),
      (es: Seq[Expression]) => Srp64(es.head)),
    (FunctionIdentifier("graft_cp1252_decode"),
      info("graft_cp1252_decode", classOf[Cp1252Decode]),
      (es: Seq[Expression]) => Cp1252Decode(es.head)),
    (FunctionIdentifier("graft_cp1252_encode"),
      info("graft_cp1252_encode", classOf[Cp1252Encode]),
      (es: Seq[Expression]) => Cp1252Encode(es.head)),
    (FunctionIdentifier("graft_id_pairs"), info("graft_id_pairs", classOf[IdPairs]),
      (es: Seq[Expression]) => IdPairs(es.head)),
    (FunctionIdentifier("graft_hamming_pairs"),
      info("graft_hamming_pairs", classOf[HammingPairs]),
      (es: Seq[Expression]) => HammingPairs(es(0), es(1))),
    (FunctionIdentifier("graft_repetition"),
      info("graft_repetition", classOf[RepetitionStats]),
      (es: Seq[Expression]) => RepetitionStats(es.head)),
    (FunctionIdentifier("graft_word_gram_hashes"),
      info("graft_word_gram_hashes", classOf[WordGramHashes]),
      (es: Seq[Expression]) => WordGramHashes(es(0), es(1))),
    (FunctionIdentifier("graft_lm_nll"), info("graft_lm_nll", classOf[LmNll]),
      (es: Seq[Expression]) => LmNll(es(0), es(1), es(2), es(3), es(4))),
    (FunctionIdentifier("graft_canonical_url"),
      info("graft_canonical_url", classOf[CanonicalUrl]),
      (es: Seq[Expression]) => CanonicalUrl(es.head)),
    (FunctionIdentifier("graft_l2sq"), info("graft_l2sq", classOf[L2Sq]),
      (es: Seq[Expression]) => L2Sq(es(0), es(1))),
    (FunctionIdentifier("graft_cosine_pairs"),
      info("graft_cosine_pairs", classOf[CosinePairs]),
      (es: Seq[Expression]) => CosinePairs(es(0), es(1))),
    (FunctionIdentifier("graft_cosine_pairs_cross"),
      info("graft_cosine_pairs_cross", classOf[CosinePairsCross]),
      (es: Seq[Expression]) => CosinePairsCross(es(0), es(1))),
    (FunctionIdentifier("graft_pq_encode"),
      info("graft_pq_encode", classOf[PqEncode]),
      (es: Seq[Expression]) => PqEncode(es(0), es(1), es(2), es(3))),
    (FunctionIdentifier("graft_pq_adc"), info("graft_pq_adc", classOf[PqAdc]),
      (es: Seq[Expression]) => PqAdc(es(0), es(1), es(2), es(3), es(4))),
    (FunctionIdentifier("graft_pq_adc_cols"),
      info("graft_pq_adc_cols", classOf[PqAdcCols]),
      (es: Seq[Expression]) => PqAdcCols(es(0), es(1), es(2), es(3), es(4))),
    (FunctionIdentifier("graft_bloom_agg"),
      info("graft_bloom_agg",
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate]),
      (es: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          es(0), es(1), es(2))),
    (FunctionIdentifier("graft_might_contain"),
      info("graft_might_contain",
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]),
      (es: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(es(0), es(1))))
}
