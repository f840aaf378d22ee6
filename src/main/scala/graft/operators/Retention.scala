package graft.operators

/** Retraction-fixture constants, dependency-free on purpose: oracle SQL
  * strings in several modules (Ingest, Curation, TextAnalysis) embed
  * the forget-set predicate at OBJECT-INITIALIZATION time, and holding
  * these on [[Ingest]] made those inits cyclic (TextAnalysis → Ingest →
  * Curation → Ingest), which the JVM resolves to a null MODULE$ half
  * way through. A constants-only object has no init edges at all.
  * [[Ingest.ForgetMod]]/[[Ingest.ForgetRem]] remain as aliases — the
  * fixture's semantics are documented there. */
object Retention {
  val ForgetMod: Long = 13L
  val ForgetRem: Long = 7L
}
