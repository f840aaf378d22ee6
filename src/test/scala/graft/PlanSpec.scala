package graft

import org.apache.spark.sql.functions._

import graft.queries.Tables

/** Physical-plan quality gates — the ".explain and iterate" discipline
  * encoded as assertions, so a regression that silently de-optimizes a
  * plan (lost pushdown, lost broadcast, global sort for a top-k) fails
  * the build, not the 100 TB run. */
class PlanSpec extends SparkSpecBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("projection reaches the parquet scan (ReadSchema pruned)") {
    val p = plan(SparkEntry.queries("q_scan_project")(spark, TestSpark.Sf0001))
    // (plan toString truncates long schemas — match the pruned column list)
    assert(p.contains("FileScan parquet [l_orderkey#") &&
      p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double"),
      s"scan must read exactly the projected columns:\n$p")
    assert(!p.contains("l_comment"), "unprojected columns must not be read")
  }

  test("equality predicate pushes down to the parquet scan") {
    val p = plan(Tables.orders(spark, TestSpark.Sf0001).filter(col("o_orderkey") === 42))
    assert(p.contains("PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)]"), p)
  }

  test("fact⋈dim joins broadcast the dimension (no fact shuffle)") {
    val p = plan(SparkEntry.queries("q_fk_join_segment")(spark, TestSpark.Sf0001))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("star join broadcasts every dim level — the fact never shuffles for a join") {
    val p = plan(SparkEntry.queries("q_star_join")(spark, TestSpark.Sf0001))
    assert("BroadcastHashJoin".r.findAllIn(p).size == 3, p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
  }

  test("top-k plans as TakeOrderedAndProject, never a global sort") {
    val p = plan(SparkEntry.queries("q_topk_orders")(spark, TestSpark.Sf0001))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_topk_rewrite: the DECLARATIVE window form plans as the bounded-heap operator") {
    // the gate query is written purely in the window API; the optimizer
    // rule (TopKRewrite) must have replaced the Window+Filter with the
    // two-phase custom operator — no window, no full per-key sort
    val p = plan(SparkEntry.queries("q_topk_rewrite")(spark, TestSpark.Sf0001))
    assert("TopKPerKey".r.findAllIn(p).size >= 2,
      s"declarative row_number()<=k must rewrite to the heap operator:\n$p")
    assert(!p.contains("Window"),
      s"the window must be gone from the rewritten plan:\n$p")
  }

  test("sketch computation stays in the scan stage (no shuffle below the LSH join)") {
    val p = plan(graft.operators.Dedup.minhashFeatures(
      Tables.documents(spark, TestSpark.Sf0001)))
    assert(!p.contains("Exchange"), s"features must be narrow:\n$p")
  }

  test("aggregations are two-phase (partial before the exchange)") {
    val p = plan(SparkEntry.queries("q_saldo_per_konto")(spark, TestSpark.Sf0001))
    assert(p.contains("partial_sum"), s"map-side combine missing:\n$p")
  }

  test("bucketed range join plans as an equi-join, never a nested loop") {
    val p = plan(SparkEntry.queries("q_range_join")(spark, TestSpark.Sf0001))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"interval predicate must ride the bucket equi-join:\n$p")
    assert(p.contains("Join") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("stored-sketch near-dup re-reads no text and re-sketches nothing") {
    val stored = graft.operators.Ingest.ensureSketchedDocs(spark, TestSpark.Sf0001)
    val p = plan(graft.operators.Dedup.verifiedOverlapFromFeatures(stored,
      graft.operators.Dedup.minhashCandidatesFromFeatures(stored)))
    // warm path = stored columns only: no sketch expressions anywhere in
    // the executed plan, no scan of the raw documents table / text column
    assert(!p.toLowerCase.contains("minhashshingle"),
      s"stored path must not re-sketch:\n$p")
    assert(!p.contains("text#"), s"stored path must not read text:\n$p")
    assert(!p.contains("documents.parquet"),
      s"stored path must scan the sketched table, not the corpus:\n$p")
  }

  test("stored-sketch heavy hitters serve from the CMS artifacts alone") {
    graft.operators.CorpusStats.ensureCmsArtifacts(spark, TestSpark.Sf0001)
    val p = plan(graft.operators.CorpusStats.cmsEstimateStored(
      spark, TestSpark.Sf0001))
    // warm path = the two stored D×W sketches cell-merged: no corpus
    // scan, no tokenizer, and the merge side rides a broadcast join
    assert(!p.contains("documents.parquet"),
      s"warm path must not scan the corpus:\n$p")
    assert(!p.contains("text#") && !p.contains("regexp_replace"),
      s"warm path must not re-tokenize:\n$p")
    assert(p.contains("cms_base__") && p.contains("cms_delta__"),
      s"serving must read BOTH stored sketch generations:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the D×W merge must broadcast into the probe cells:\n$p")
  }

  test("sketch-index append serves base ∪ delta without re-sketching or text") {
    graft.operators.Ingest.ensureSketchedDelta(spark, TestSpark.Sf0001)
    val (base, delta) = graft.operators.Ingest.ensureSketchedDelta(spark, TestSpark.Sf0001)
    val all = base.unionByName(delta)
    val p = plan(graft.operators.Dedup.verifiedOverlapFromFeatures(all,
      graft.operators.Dedup.minhashCandidatesFromFeatures(all)))
    assert(!p.toLowerCase.contains("minhashshingle"),
      s"warm grown-index path must not re-sketch:\n$p")
    assert(!p.contains("text#") && !p.contains("documents.parquet"),
      s"warm path must stay on the stored sketches:\n$p")
    assert(p.contains("docs_sketched__") && p.contains("docs_sketched_delta__"),
      s"serving must read BOTH sketch generations:\n$p")
  }

  test("compacted sketch index serves from gen2 alone, still no re-sketch") {
    val gen2 = graft.operators.Ingest.compactSketchIndex(spark, TestSpark.Sf0001)
    val p = plan(graft.operators.Dedup.verifiedOverlapFromFeatures(gen2,
      graft.operators.Dedup.minhashCandidatesFromFeatures(gen2)))
    assert(!p.toLowerCase.contains("minhashshingle") && !p.contains("text#"),
      s"compacted path must not re-sketch or read text:\n$p")
    assert(p.contains("docs_sketched_gen2__"), s"must read gen2:\n$p")
    assert(!p.contains("docs_sketched__") && !p.contains("docs_sketched_delta__"),
      s"compaction must collapse serving onto gen2 only:\n$p")
  }

  test("stored BM25 reads only the query terms' posting buckets — no text scan") {
    graft.operators.Ingest.ensureTermIndex(spark, TestSpark.Sf0001)
    val p = plan(graft.operators.Ingest.bm25TopKStored(
      spark, TestSpark.Sf0001, Seq("table", "scan", "join"), 10))
    // warm path: no corpus text, no tokenize/explode of documents —
    // the postings scan is pruned to the query's bucket directories by
    // the STATIC literal bucket IN-list (the bucket ids are computable
    // driver-side, and DPP declines a bare literal probe — VERDICT r9)
    assert(!p.contains("documents.parquet"),
      s"warm path must not scan the corpus:\n$p")
    assert(!p.contains("text#"), s"warm path must not read text:\n$p")
    assert(bucketInListPruned(p),
      s"postings scan must carry a static bucket IN-list PartitionFilter:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must not global-sort:\n$p")
  }

  test("forgotten BM25: pruned postings + broadcast anti-join, no corpus scan") {
    graft.operators.Ingest.ensureForgetSet(spark, TestSpark.Sf0001)
    val p = plan(graft.operators.Ingest.bm25TopKForgotten(
      spark, TestSpark.Sf0001, Seq("table", "scan", "join"), 10))
    assert(!p.contains("documents.parquet") && !p.contains("text#"),
      s"serve-time mask must not rescan the corpus:\n$p")
    assert(bucketInListPruned(p),
      s"tombstones must not defeat the static bucket prune:\n$p")
    assert(p.contains("LeftAnti") && p.contains("forget_ids"),
      s"the mask is a broadcast anti-join on the tombstone artifact:\n$p")
  }

  test("purged BM25 serves from the purged generation alone — no anti-join left") {
    graft.operators.Ingest.purgeTermIndex(spark, TestSpark.Sf0001)
    val p = plan(graft.operators.Ingest.bm25TopKPurged(
      spark, TestSpark.Sf0001, Seq("table", "scan", "join"), 10))
    assert(p.contains("term_postings_purged"),
      s"must read the purged generation:\n$p")
    assert(!p.contains("LeftAnti") && !p.contains("forget_ids"),
      s"physical purge must leave no serve-time mask:\n$p")
    assert(bucketInListPruned(p),
      s"purged generation keeps the static bucket prune:\n$p")
  }

  /** The postings scan's PartitionFilters must hold a literal bucket
    * IN/INSET — plan-time directory pruning, not a full 64-bucket scan. */
  private def bucketInListPruned(p: String): Boolean =
    p.linesIterator.exists(l => l.contains("PartitionFilters:") &&
      (l.contains("bucket#") || l.contains("bucket:")) &&
      (l.contains(" IN (") || l.contains(" INSET ")))

  /** Every postings FileScan line in the plan, asserted bucket-pruned;
    * returns the lines so callers can pin WHICH index directories the
    * plan touches (the node count is an implementation detail — bm25Rank
    * derives df from the tf frame, so each postings source plans twice,
    * the second time column-pruned to `term` only). */
  private def prunedPostingsScans(p: String): Seq[String] = {
    val pf = p.linesIterator.filter(l => l.contains("PartitionFilters:") &&
      (l.contains("bucket#") || l.contains("bucket:"))).toSeq
    assert(pf.nonEmpty, s"expected bucket-partitioned postings scans:\n$p")
    assert(pf.forall(l => l.contains(" IN (") || l.contains(" INSET ")),
      s"EVERY postings scan must carry the static bucket IN-list:\n$p")
    pf
  }

  test("appended BM25 prunes base AND delta buckets; touches no other generation") {
    graft.operators.Ingest.ensureTermIndexDelta(spark, TestSpark.Sf0001)
    val p = plan(graft.operators.Ingest.bm25TopKAppended(
      spark, TestSpark.Sf0001, Seq("table", "scan", "join"), 10))
    assert(!p.contains("documents.parquet") && !p.contains("text#"),
      s"warm append path must stay on the postings:\n$p")
    val pf = prunedPostingsScans(p)
    // scratch paths: base = term_postings__<sf>, delta = term_postings_delta__
    assert(pf.exists(_.contains("term_postings__")) &&
      pf.exists(_.contains("term_postings_delta__")),
      s"serving must read BOTH generations:\n$p")
    assert(!p.contains("term_postings_gen2__"),
      s"append serving must not depend on compaction:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k must not global-sort:\n$p")
  }

  test("compacted BM25 serves from the gen2 directories alone, pruned") {
    graft.operators.Ingest.compactTermIndex(spark, TestSpark.Sf0001)
    val p = plan(graft.operators.Ingest.bm25TopKCompacted(
      spark, TestSpark.Sf0001, Seq("table", "scan", "join"), 10))
    assert(!p.contains("documents.parquet") && !p.contains("text#"),
      s"warm compacted path must stay on the postings:\n$p")
    val pf = prunedPostingsScans(p)
    assert(pf.forall(_.contains("term_postings_gen2__")),
      s"compaction must collapse serving onto gen2 only:\n$p")
  }

  test("batched BM25 serves the whole query frame without a corpus scan") {
    import spark.implicits._
    graft.operators.Ingest.ensureTermIndex(spark, TestSpark.Sf0001)
    val q = graft.operators.Ingest.BatchQueryTerms.toDF("q_id", "term")
    val p = plan(graft.operators.Ingest.bm25TopKBatch(spark, TestSpark.Sf0001, q, 5))
    assert(!p.contains("documents.parquet") && !p.contains("text#"),
      s"batched warm path must stay on the postings:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"every join side is broadcast-small:\n$p")
    // the (checkpointed) probe frame's postings scan carries the same
    // static bucket IN-list pruning as the single-query stored path
    val tfPlan = plan(graft.operators.Ingest.bm25BatchTf(spark, TestSpark.Sf0001, q))
    assert(bucketInListPruned(tfPlan),
      s"batched postings scan must carry the static bucket IN-list:\n$tfPlan")
  }

  test("batched phrase search stays on the pruned positional postings") {
    graft.operators.Ingest.ensurePhraseIndex(spark, TestSpark.Sf0001)
    val p = plan(graft.operators.Ingest.phraseMatchBatch(
      spark, TestSpark.Sf0001, graft.operators.Ingest.PhraseBatch))
    // warm path: positional postings only — no corpus text, no
    // tokenize; the scan is pruned to the phrases' bucket directories
    // by the same static literal IN-list as the stored BM25 path
    assert(!p.contains("documents.parquet") && !p.contains("text#"),
      s"phrase warm path must not scan the corpus:\n$p")
    assert(bucketInListPruned(p),
      s"positional scan must carry the static bucket IN-list:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"spec and per-phrase lengths are broadcast-small:\n$p")
  }

  test("minhash candidates run the bucket-local pair kernel, not a band self-join") {
    val p = plan(graft.operators.Dedup.minhashCandidates(
      Tables.documents(spark, TestSpark.Sf0001)))
    // one aggregation builds each band bucket, graft_id_pairs enumerates
    // its pairs in-memory — the self-join form paid per-candidate
    // sort-merge row machinery on saturated zipf buckets (VERDICT r8)
    assert(p.contains("graft_id_pairs"),
      s"candidate step must use the bucket-local id-pair kernel:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin") &&
      !p.contains("BroadcastHashJoin"),
      s"no join may remain in the candidate step:\n$p")
  }

  test("stored IVF probe prunes cell partitions via DPP, zero data-path exchanges") {
    val df = graft.operators.Ingest.ivfTopKStored(spark, TestSpark.Sf0001, 10)
    val p = plan(df)
    // the probe plan must reach the assignment scan as a DYNAMIC
    // partition filter (runtime directory pruning) — not a
    // driver-collected `cell IN (...)` literal, which bloats the plan at
    // production nCells (VERDICT r3)
    assert(p.contains("dynamicpruning"),
      s"probe must prune cell directories via dynamic partition pruning:\n$p")
    assert(!p.contains("cell IN ("),
      s"no driver-collected cell literal may remain:\n$p")
    // the probe-plan window legitimately reduces to a single partition
    // inside its broadcast subtree; what must NOT appear is a wide
    // repartitioning of the data path (the assignment shuffle the fresh
    // path pays)
    assert(!p.contains("Exchange hashpartitioning"),
      s"warm IVF probe must not shuffle the data path:\n$p")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("purged near-dup serves from the purged sketch generation, no mask left") {
    val purged = graft.operators.Ingest.purgeSketchIndex(spark, TestSpark.Sf0001)
    val p = plan(graft.operators.Ingest.nearDupPurged(spark, TestSpark.Sf0001))
    assert(p.contains("docs_sketched_purged"),
      s"must read the purged generation:\n$p")
    assert(!p.contains("LeftAnti") && !p.contains("forget_ids"),
      s"physical purge must leave no serve-time mask:\n$p")
    assert(!p.toLowerCase.contains("minhashshingle") && !p.contains("text#"),
      s"purged path must not re-sketch or read text:\n$p")
  }

  test("stats-axis deletion: forgotten serve subtracts stored cells; purged serve reads gen2 alone") {
    val fp = plan(graft.operators.CorpusStats.cmsEstimateForgotten(spark, TestSpark.Sf0001))
    assert(fp.contains("cms_base") && fp.contains("cms_retract"),
      s"forgotten serve must read base + retraction sketches (and nothing wider):\n$fp")
    assert(!fp.contains("text#"),
      s"stats deletion must never re-tokenize the corpus at serve time:\n$fp")
    graft.operators.CorpusStats.ensureCmsPurged(spark, TestSpark.Sf0001)
    val pp = plan(graft.operators.CorpusStats.cmsEstimatePurged(spark, TestSpark.Sf0001))
    assert(pp.contains("cms_gen2") && !pp.contains("cms_base") && !pp.contains("cms_retract"),
      s"purged serve must read the rewritten generation only:\n$pp")
    graft.operators.CorpusStats.ensureHistPurged(spark, TestSpark.Sf0001)
    val qp = plan(graft.operators.CorpusStats.histQuantilesPurged(spark, TestSpark.Sf0001))
    assert(qp.contains("hist_gen2") && !qp.contains("hist_base") && !qp.contains("hist_retract"),
      s"purged quantile serve must read the rewritten generation only:\n$qp")
  }

  test("forgotten IVF kNN: tombstone anti-join does not defeat the cell DPP") {
    val emb = Tables.embeddings(spark, TestSpark.Sf0001)
    val qs = emb.orderBy("vec_id").limit(2)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    graft.operators.Ingest.ensureVecForgetSet(spark, TestSpark.Sf0001)
    val p = plan(graft.operators.Ingest.knnJoinIvfForgotten(
      spark, TestSpark.Sf0001, qs, 5))
    assert(p.contains("dynamicpruning"),
      s"the mask must sit ABOVE the DPP cell join, not between scan and probe:\n$p")
    assert(p.contains("LeftAnti") && p.contains("vec_forget_ids"),
      s"the mask is a broadcast anti-join on the stored tombstones:\n$p")
  }

  test("forgotten IVF-PQ/SQ kNN: code-scan mask keeps DPP, stays out of the rescore") {
    val emb = Tables.embeddings(spark, TestSpark.Sf0001)
    val qs = emb.orderBy("vec_id").limit(2)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    graft.operators.Ingest.ensureVecForgetSet(spark, TestSpark.Sf0001)
    for (df <- Seq(
        graft.operators.Ingest.knnJoinIvfPqForgotten(spark, TestSpark.Sf0001, qs, 5),
        graft.operators.Ingest.knnJoinIvfSqForgotten(spark, TestSpark.Sf0001, qs, 5))) {
      val p = plan(df)
      assert(p.contains("dynamicpruning"),
        s"the mask must sit ABOVE the DPP cell join on the code scan:\n$p")
      assert(p.contains("LeftAnti") && p.contains("vec_forget_ids"),
        s"the mask is a broadcast anti-join on the stored tombstones:\n$p")
    }
  }

  test("purged IVF/PQ/SQ kNN serves the purged generation: DPP intact, no mask left") {
    val emb = Tables.embeddings(spark, TestSpark.Sf0001)
    val qs = emb.orderBy("vec_id").limit(2)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    graft.operators.Ingest.purgeIvfIndex(spark, TestSpark.Sf0001)
    graft.operators.Ingest.purgeIvfPqIndex(spark, TestSpark.Sf0001)
    graft.operators.Ingest.purgeIvfSqIndex(spark, TestSpark.Sf0001)
    val plans = Seq(
      "ivf_assign_purged" -> plan(graft.operators.Ingest.knnJoinIvfPurged(
        spark, TestSpark.Sf0001, qs, 5)),
      "ivfpq_codes_purged" -> plan(graft.operators.Ingest.knnJoinIvfPqPurged(
        spark, TestSpark.Sf0001, qs, 5)),
      "ivfsq_codes_purged" -> plan(graft.operators.Ingest.knnJoinIvfSqPurged(
        spark, TestSpark.Sf0001, qs, 5)))
    for ((gen, p) <- plans) {
      assert(p.contains(gen), s"must read the purged generation $gen:\n$p")
      assert(p.contains("dynamicpruning"),
        s"the purged generation is still cell-partitioned — DPP must hold:\n$p")
      assert(!p.contains("LeftAnti") && !p.contains("forget_ids"),
        s"physical purge must leave no serve-time mask:\n$p")
    }
  }

  test("phrase forget keeps the bucket prune + mask; phrase purge leaves no mask") {
    val phrases = graft.operators.Ingest.PhraseBatch
    val pF = plan(graft.operators.Ingest.phraseMatchForgotten(
      spark, TestSpark.Sf0001, phrases))
    assert(bucketInListPruned(pF),
      s"the mask must not defeat the static bucket IN-list prune:\n$pF")
    assert(pF.contains("LeftAnti") && pF.contains("forget_ids"),
      s"masked phrase serve anti-joins the stored tombstones:\n$pF")
    assert(!pF.contains("text#"), s"no corpus scan on the warm path:\n$pF")
    graft.operators.Ingest.purgePhraseIndex(spark, TestSpark.Sf0001)
    val pP = plan(graft.operators.Ingest.phraseMatchPurged(
      spark, TestSpark.Sf0001, phrases))
    assert(pP.contains("term_positions_purged"),
      s"must read the purged generation:\n$pP")
    assert(bucketInListPruned(pP), s"bucket prune must hold:\n$pP")
    assert(!pP.contains("LeftAnti") && !pP.contains("forget_ids"),
      s"physical purge must leave no serve-time mask:\n$pP")
  }

  test("stored-index SemDeDup re-clusters nothing: no assignment kernel, no Lloyd pass") {
    val df = graft.operators.Ingest.semDedupPairsStored(spark, TestSpark.Sf0001, 0.99)
    val p = plan(df)
    // warm path = the stored (vec_id, cell, embedding) table only: the
    // clustering was paid at ingest, so neither the assignment kernel
    // nor any centroid machinery may appear — just the groupBy(cell)
    // rendezvous and the pair kernel
    assert(!p.contains("graft_ivf_cell"),
      s"stored semdedup must not re-assign cells:\n$p")
    assert(!p.contains("embeddings.parquet"),
      s"stored semdedup must scan the index, not the corpus:\n$p")
    assert(p.contains("graft_cosine_pairs"), p)
  }

  test("kernel IVF assignment is a narrow shuffle-free map over the scan") {
    val emb = Tables.embeddings(spark, TestSpark.Sf0001)
    val centroids = graft.operators.Similarity
      .kmeansCentroids(emb, 16, iters = 1).localCheckpoint()
    val p = plan(graft.operators.Similarity.ivfAssignKernel(emb, centroids))
    assert(p.contains("graft_ivf_cell"), p)
    // the whole assignment is Project-over-scan: no join against a
    // centroid table, no exchange anywhere (the declarative form pays
    // an N×nCells expansion + a full-corpus groupBy shuffle)
    assert(!p.contains("Exchange"), s"kernel assignment must not shuffle:\n$p")
    assert(!p.contains("Join"), s"kernel assignment must not join:\n$p")
  }

  test("appended IVF probe prunes base AND delta scans via their own DPP") {
    val df = graft.operators.Ingest.ivfTopKAppended(spark, TestSpark.Sf0001, 10)
    val p = plan(df)
    // the union must sit ABOVE two independently-pruned scans: one
    // dynamic-pruning partition filter per side (a union under the
    // join would block DPP insertion and read every cell directory)
    assert("dynamicpruning".r.findAllIn(p).size >= 2,
      s"both base and delta scans must carry a DPP filter:\n$p")
    assert(!p.contains("cell IN ("), s"no driver-collected cell literal:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"appended probe must not shuffle the data path:\n$p")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("stateless LM scoring is a single shuffle-free codegen pass") {
    val docs = graft.queries.Tables.documents(spark, TestSpark.Sf0001)
    val (u, b) = graft.operators.TextAnalysis.lmTables(docs)
    val p = plan(graft.operators.TextAnalysis.lmScoreStateless(docs, u, b))
    // the serving-shape claim: no joins, no exchanges, the kernel call
    // sits in a Project directly over the scan
    assert(!p.contains("Exchange"), s"stateless scoring must not shuffle:\n$p")
    assert(!p.contains("Join"), s"stateless scoring must not join:\n$p")
    assert(p.contains("graft_lm_nll"), p)
  }

  test("stored-PQ ADC ranking scans only the 16 B/row code table") {
    val s = spark
    val (cb, dim, codes) = graft.operators.Ingest.ensurePqIndex(s, TestSpark.Sf0001)
    val emb = graft.queries.Tables.embeddings(s, TestSpark.Sf0001)
    val (qid, dot, nrm) = graft.operators.Similarity.adcTables(emb, cb, dim, 8, 256)
    val p = plan(graft.operators.Similarity.pqRank(codes, qid, dot, nrm, 8, 256, 600))
    // the serving pass reads stored codes, never the embedding payload,
    // and never re-encodes
    assert(p.contains("ReadSchema: struct<vec_id:bigint,code:bigint>"),
      s"ADC rank must scan only (vec_id, code):\n$p")
    assert(!p.contains("embeddings.parquet"),
      s"ADC rank must not touch the embedding payload:\n$p")
    assert(!p.toLowerCase.contains("pq_encode"),
      s"warm path must not re-encode:\n$p")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("IVF-PQ: DPP cell pruning AND code-only ReadSchema compose in one scan") {
    val p = plan(graft.operators.Ingest.ivfPqTopKStored(spark, TestSpark.Sf0001, 10))
    assert(p.contains("dynamicpruning"),
      s"probe must prune cell directories dynamically:\n$p")
    assert(p.contains("ReadSchema: struct<vec_id:bigint,code:bigint>"),
      s"the ranking scan must read only (vec_id, code):\n$p")
    assert(!p.contains("cell IN ("), s"no driver-collected cell literal:\n$p")
  }

  test("batched IVF kNN prunes cell partitions via DPP; the window keys the scan pid") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, TestSpark.Sf0001)
    val qs = emb.orderBy("vec_id").limit(3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val p = plan(graft.operators.Ingest.knnJoinIvfStored(
      spark, TestSpark.Sf0001, qs, 5, nProbe = 4))
    assert(p.contains("dynamicpruning"),
      s"probed-cell union must prune at the scan via DPP:\n$p")
    assert(!p.contains("cell IN ("),
      s"no driver-collected cell literal may remain:\n$p")
    assert(p.contains("hashpartitioning(q_id#") && p.contains(", pid#"),
      s"local top-k must spread over (q_id, pid):\n$p")
  }

  test("batched kNN over base∪delta: every side's scan carries its own DPP filter") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, TestSpark.Sf0001)
    val qs = emb.orderBy("vec_id").limit(3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val p = plan(graft.operators.Ingest.knnJoinIvfAppended(
      spark, TestSpark.Sf0001, qs, 5, nProbe = 4))
    assert("dynamicpruning".r.findAllIn(p).size >= 2,
      s"base AND delta scans must each carry a DPP filter:\n$p")
    assert(!p.contains("cell IN ("),
      s"no driver-collected cell literal may remain:\n$p")
    assert(p.contains("hashpartitioning(q_id#") && p.contains(", pid#"),
      s"local top-k must spread over (q_id, pid):\n$p")
  }

  test("streamed-delta kNN serving: caller delta joins the same probe plan, DPP on the base") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, TestSpark.Sf0001)
    val qs = emb.orderBy("vec_id").limit(2)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    // a tiny in-memory delta in the stored layout (vec_id, cell, embedding)
    val (centroids, _) = graft.operators.Ingest.ensureIvfIndex(spark, TestSpark.Sf0001)
    val delta = graft.operators.Similarity.ivfAssignKernel(
      emb.orderBy("vec_id").limit(3), centroids)
    val p = plan(graft.operators.Ingest.knnJoinIvfWithDelta(
      spark, TestSpark.Sf0001, delta, qs, 5, nProbe = 4))
    // the cell-partitioned BASE scan must still be DPP-pruned (the
    // in-memory delta side has no partitioned scan to prune)
    assert(p.contains("dynamicpruning"),
      s"base scan must carry a DPP filter with a caller delta present:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian in the serving plan:\n$p")
    assert(p.contains("hashpartitioning(q_id#") && p.contains(", pid#"),
      s"local top-k must spread over (q_id, pid):\n$p")
  }

  test("near-dup admission: band equi-join + doc_id lookups, no cartesian, no text re-read") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val stored = graft.operators.Ingest.ensureSketchedDocs(spark, TestSpark.Sf0001)
    val probes = graft.operators.Dedup.minhashFeatures(
      docs.orderBy("doc_id").limit(5)
        .withColumn("doc_id", col("doc_id") + lit(10000000L)))
    val p = plan(graft.operators.Dedup.admitPairs(stored, probes, 0.5))
    // the stored side serves from the SKETCH table: exactly one text
    // scan in the whole plan (the probe sketch pass), zero against the
    // stored corpus
    assert("ReadSchema: [^\n]*text".r.findAllIn(p).size <= 1,
      s"stored side must serve from sketches, not re-read document text:\n$p")
    assert(p.contains("band_idx") && p.contains("band_hash"),
      s"candidate step must equi-join on the band keys:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"admission must never degenerate to an all-pairs join:\n$p")
  }

  test("batched IVF-PQ kNN: DPP-pruned code scan, column-table ADC, no cell literal") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, TestSpark.Sf0001)
    val qs = emb.orderBy("vec_id").limit(3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val p = plan(graft.operators.Ingest.knnJoinIvfPqStored(
      spark, TestSpark.Sf0001, qs, 5, nProbe = 4))
    assert(p.contains("dynamicpruning"),
      s"the shared code scan must prune probed cells via DPP:\n$p")
    assert(p.contains("graft_pq_adc_cols"),
      s"candidates must ADC-score against their query's table columns:\n$p")
    assert(!p.contains("cell IN ("),
      s"no driver-collected cell literal may remain:\n$p")
  }

  test("runtime Bloom filter prunes the big side of a selective join") {
    // The petabyte pruning step q_decontaminate's docstring names: when
    // one join side is small-after-filter, Catalyst's InjectRuntimeFilter
    // plants bloom_filter_might_contain on the big side's scan so most
    // rows die before the exchange. Local testdata is below the default
    // 10 GB application-side threshold, so lower it (the cluster profile
    // keeps the default); creation-side threshold stays well above the
    // filtered dim size, exactly as at scale.
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // at 100 TB neither side broadcasts — force the shuffle-join shape
      // the rule targets (it skips joins that would broadcast anyway)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables.lineitem(spark, TestSpark.Sf0001)
      val ord = Tables.orders(spark, TestSpark.Sf0001)
        .filter(col("o_orderstatus") === "F")
      val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(sum("l_quantity"))
      val opt = j.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain") && opt.contains("bloom_filter_agg"),
        s"runtime bloom filter must be injected on the fact side:\n$opt")
      // the filter must land on the FACT scan (lineitem keys probed),
      // built from the filtered dim's keys
      assert(opt.contains("might_contain(scalar-subquery"), opt)
      assert("might_contain".r.findAllIn(opt).size >= 1 &&
        opt.indexOf("xxhash64(l_orderkey") > 0, opt)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("kNN join: broadcast scoring, local top-k keyed by scan partition") {
    val p = plan(SparkEntry.queries("q_knn_join")(spark, TestSpark.Sf0001))
    // scoring is a broadcast nested loop over the tiny query set — the
    // corpus side must never shuffle for the join itself
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    // phase-1 window partitions by (q_id, pid): the first exchange key
    // includes the scan partition id, so no |Q|-partition skew collapse
    assert(p.contains("hashpartitioning(q_id#") && p.contains(", pid#"),
      s"local top-k must partition by (q_id, pid):\n$p")
  }

  test("hard-negative mining: broadcast anchors, label filter inside the scan pass") {
    val p = plan(SparkEntry.queries("q_hard_negatives")(spark, TestSpark.Sf0001))
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("hashpartitioning(q_id#") && p.contains(", pid#"),
      s"local top-k must partition by (q_id, pid):\n$p")
    // the cross-label condition must sit in the join/scan pass, before
    // any exchange — same-label pairs never reach the rank windows
    val joinIdx = p.linesIterator.indexWhere(_.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("NOT (label#") || p.contains("!= q_label") ||
      p.linesIterator.exists(l => l.contains("label#") && l.contains("NOT")),
      s"label-mismatch filter missing from the scoring pass:\n$p")
    assert(joinIdx >= 0 && !p.contains("SortMergeJoin"), p)
  }

  test("kNN classify: broadcast scoring + broadcast label joins, no sort-merge") {
    val p = plan(SparkEntry.queries("q_knn_classify")(spark, TestSpark.Sf0001))
    // same two-phase shape as knnJoin; the label/true-label joins ride
    // on tiny frames and must broadcast — the labeled corpus is never
    // shuffled for a join
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("hashpartitioning(q_id#") && p.contains(", pid#"),
      s"local top-k must partition by (q_id, pid):\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"all label joins must broadcast:\n$p")
  }

  test("DSIR scoring: both LM kernels in one narrow pass, scored exactly once") {
    val docs = graft.queries.Tables.documents(spark, TestSpark.Sf0001)
    val (ru, rb) = graft.operators.TextAnalysis.lmTables(docs)
    val (tu, tb) = graft.operators.TextAnalysis.lmTables(docs.filter(col("lang") === "en"))
    // the scoring projection: two kernel invocations, zero shuffles,
    // zero joins
    val ps = plan(graft.operators.TextAnalysis.dsirScore(docs, ru, rb, tu, tb))
    assert(ps.sliding("graft_lm_nll".length).count(_ == "graft_lm_nll") >= 2, ps)
    assert(!ps.contains("Exchange") && !ps.contains("Join"),
      s"scoring must be one narrow pass:\n$ps")
    // the full operator: the checkpointed scored frame feeds both the
    // (N, Σw) aggregate and the output, so the final plan holds NO
    // kernel call (scoring ran exactly once) and the mean-cut broadcasts
    val p = plan(graft.operators.TextAnalysis.dsirWeights(docs, ru, rb, tu, tb))
    assert(!p.contains("graft_lm_nll"),
      s"scored frame must be materialized once, not re-scored per consumer:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the (N, Σw) mean-cut must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("quality-classifier inference is one narrow kernel pass: no joins, no shuffle") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val p = plan(graft.operators.Curation.qualityClassify(docs,
      graft.operators.Curation.QualityWeights,
      graft.operators.Curation.QualityBiasMicro))
    assert(p.contains("graft_quality_score"),
      s"scoring must run through the compiled kernel:\n$p")
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"inference must be one narrow projection over the scan:\n$p")
  }

  test("incremental scoring reads the stored artifact; the kernel runs post-diff only") {
    graft.operators.Curation.ensureScoreArtifact(spark, TestSpark.Sf0001)
    val p = plan(graft.operators.Curation.incrementalScores(spark, TestSpark.Sf0001))
    // the diff join (v2 snapshot × stored artifact) is paid ONCE into a
    // checkpoint; the serving plan re-reads neither parquet side
    assert(!p.contains("FileScan"),
      s"serving must reuse the one checkpointed diff pass, no re-scan:\n$p")
    assert(p.contains("graft_quality_score"),
      s"the fresh branch must score through the compiled kernel:\n$p")
    assert(p.contains("Union"), p)
    // the kernel's branch is gated by the digest-diff predicate — the
    // model never runs over unchanged documents
    assert(p.linesIterator.exists(l => l.contains("Filter") &&
      l.contains("old_digest") &&
      (l.contains("NOT ") || l.contains("isnull"))),
      s"fresh branch must filter to changed/new docs before the kernel:\n$p")
  }

  test("BM25 top-k: term filter precedes the tf aggregation; top-k never global-sorts") {
    val p = plan(SparkEntry.queries("q_bm25_topk")(spark, TestSpark.Sf0001))
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must not global-sort:\n$p")
    // the only corpus-wide aggregation is the tf groupBy over rows
    // already filtered to the query's terms — partial agg before its
    // exchange, and no sort-merge join anywhere (df/stats broadcast)
    assert(p.contains("partial_count") || p.contains("Partial"), p)
    assert(!p.contains("SortMergeJoin"), s"df/stats joins must broadcast:\n$p")
  }

  test("mixBudget: per-source aggregation is two-phase; windows sort only sources") {
    val p = plan(SparkEntry.queries("q_mix_budget")(spark, TestSpark.Sf0001))
    // the corpus-sized work is the one partial-aggregated groupBy; every
    // window runs on the #sources-row frame after it
    assert(p.contains("partial_sum") || p.contains("Partial"),
      s"token counting must partially aggregate before the exchange:\n$p")
    assert(p.contains("Window"), p)
  }

  test("URL canonicalization is pure codegen'd expressions — no UDF, no typed map") {
    val p = plan(SparkEntry.queries("q_url_canonical")(spark, TestSpark.Sf0001))
    assert(!p.contains("SerializeFromObject") && !p.contains("MapPartitions") &&
      !p.contains("BatchEvalPython"),
      s"canonicalization must stay in expression land:\n$p")
    // one shuffle total: the dedup groupBy over the canonical string
    assert("Exchange".r.findAllIn(p).size <= 2, // partial/final agg pair shares one exchange
      s"canonicalize+dedup needs exactly the groupBy exchange:\n$p")
    assert(p.contains("partial_count") || p.contains("Partial"),
      s"dedup counts must map-side combine:\n$p")
  }

  test("crawl e2e pipeline: 4 exchanges, custom top-k, one WARC scan, no window") {
    val df = graft.operators.Crawl.crawlPipelineDocs(spark, TestSpark.Sf0001)
    val p = plan(df)
    // exactly the four stage boundaries shuffle: URL dedup (canon_url),
    // domain cap (domain), block keep-first (blk), doc rebuild (doc_id);
    // extraction/classify/BPE pipeline inside scan stages
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 4,
      s"the composed pipeline must not add shuffles beyond its four stage keys:\n$p")
    assert(!p.contains("Window"),
      s"neither the cap nor the batching rank may plan a window:\n$p")
    assert("TopKPerKey".r.findAllIn(p).size >= 2,
      s"the domain cap must be served by the custom bounded-heap operator:\n$p")
    // ONE WARC container scan feeds the whole chain — no stage re-reads
    // the archive or the documents table
    assert("FileScan parquet".r.findAllIn(p).size == 1,
      s"no re-derivation between stages — one source scan only:\n$p")
  }

  test("per-lang percentile ranks never window on the language key") {
    val p = plan(graft.operators.Curation.scorePercentile(
      Tables.documents(spark, TestSpark.Sf0001), col("lang") === "en"))
    assert(!p.contains("Window"),
      s"grouped rank must be prefix-sum + bounded offsets, not a per-lang window:\n$p".take(4000))
    assert(p.contains("BroadcastHashJoin"),
      s"the offset table must broadcast:\n$p".take(4000))
    // the gate's stored-model form keeps the same rank shape AND drops
    // the in-query training explode (the fold scores inside the scan)
    val ps = plan(graft.operators.Curation.scorePercentileStored(
      spark, TestSpark.Sf0001))
    assert(!ps.contains("Window") && !ps.contains("Generate"),
      s"stored-model percentile must neither window nor explode:\n$ps".take(4000))
  }

  test("stored multimodal hash index: serving decodes nothing; purge leaves no mask") {
    graft.operators.Multimodal.ensureMediaHashIndex(spark, TestSpark.Sf0001)
    val p = plan(SparkEntry.queries("q_image_dedup_stored")(spark, TestSpark.Sf0001))
    assert(p.contains("media_phash_v1"),
      s"stored dedup must read the hash index generation:\n$p".take(4000))
    assert(!p.contains("MapPartitions") && !p.contains("media_"
      + "payload") && !p.contains("payload#"),
      s"no decode, no payload bytes at serve time:\n$p".take(4000))
    val fp = plan(SparkEntry.queries("q_multimodal_forget")(spark, TestSpark.Sf0001))
    assert(fp.contains("LeftAnti") && fp.contains("media_forget"),
      s"the takedown mask is a broadcast anti-join on the stored set:\n$fp".take(4000))
    graft.operators.Multimodal.purgeMediaHashIndex(spark, TestSpark.Sf0001)
    val pp = plan(SparkEntry.queries("q_multimodal_purge")(spark, TestSpark.Sf0001))
    assert(pp.contains("media_phash_gen2") && !pp.contains("media_phash_v1"),
      s"purged serve must read the rewritten generation only:\n$pp".take(4000))
    assert(!pp.contains("LeftAnti"),
      s"physical purge must leave no serve-time mask:\n$pp".take(4000))
  }

  test("media LSM append serve across modalities: both hash generations, zero decode") {
    // r13 verdict #3: a video re-encode / tagged audio copy arriving in
    // the delta generation must cluster against the STORED base with no
    // base re-decode — the serve is 16 B/row hash reads of BOTH
    // marker-committed generations. (The video serve's pair join rides
    // a localCheckpoint, so the pin reads the pre-checkpoint input.)
    graft.operators.Multimodal.ensureMediaHashIndex(spark, TestSpark.Sf0001)
    graft.operators.Multimodal.ensureMediaHashDelta(spark, TestSpark.Sf0001)
    val pv = plan(graft.operators.Multimodal.videoRows(
      graft.operators.Multimodal.ensureMediaHashIndex(spark, TestSpark.Sf0001)
        .unionByName(graft.operators.Multimodal.ensureMediaHashDelta(
          spark, TestSpark.Sf0001))))
    assert(pv.contains("media_phash_v1") && pv.contains("media_phash_delta"),
      s"video append serve must read base AND delta generations:\n$pv".take(4000))
    assert(!pv.contains("MapPartitions") && !pv.contains("payload#"),
      s"no decode, no payload bytes on the video append serve:\n$pv".take(4000))
    val pa = plan(SparkEntry.queries("q_audio_dedup_append")(
      spark, TestSpark.Sf0001))
    assert(pa.contains("media_phash_v1") && pa.contains("media_phash_delta"),
      s"audio append serve must read base AND delta generations:\n$pa".take(4000))
    assert(!pa.contains("MapPartitions") && !pa.contains("payload#"),
      s"no decode, no payload bytes on the audio append serve:\n$pa".take(4000))
  }

  test("stored-model classifier serving: stateless fold, training never re-runs at serve time") {
    graft.operators.Curation.ensureNbModel(spark, TestSpark.Sf0001)
    val p = plan(graft.operators.Curation.nbClassifyStored(
      spark, TestSpark.Sf0001))
    assert(!p.contains("Generate"),
      s"serving is the per-row fold — no token explode:\n$p".take(4000))
    assert(!p.contains("HashAggregate"),
      s"no aggregation in the serve plan — the bucket-count training groupBy must not re-run:\n$p".take(4000))
    assert("FileScan parquet".r.findAllIn(p).size == 1,
      s"one corpus scan only — the model rides as a collected literal:\n$p".take(4000))
    // and the freeze itself reads the stored artifact, not the corpus
    val fp = plan(graft.operators.Curation.ensureNbModel(
      spark, TestSpark.Sf0001)._1)
    assert(fp.contains("nb_model_v1") && !fp.contains("documents.parquet"),
      s"the frozen model must come from the marker-committed artifact:\n$fp".take(4000))
  }

  test("index-backed MMR: the candidate pool scans the stored assignment, not raw embeddings") {
    val p = plan(graft.operators.Ingest.mmrStoredPool(
      spark, TestSpark.Sf0001, graft.operators.Similarity.MmrPoolN))
    assert(p.contains("ivf_assign"),
      s"diversified serving must read the stored cell-partitioned index:\n$p".take(4000))
    assert(p.contains("TakeOrderedAndProject"),
      s"pool selection must be a bounded top-n, not a global sort:\n$p".take(4000))
  }

  test("curation e2e pipeline: scoring is stateless, packing never windows") {
    val df = SparkEntry.queries("q_curation_pipeline_e2e")(spark, TestSpark.Sf0001)
    val p = plan(df)
    // scoring must be the frozen-model fold inside the scan stage: the
    // ONLY explode in the composed plan is the gram stage's (one per
    // admitted doc side) — a token explode for scoring would add more
    val explodes = "Generate explode".r.findAllIn(p).size
    assert(explodes <= 2,
      s"only the gram stage may explode (got $explodes):\n$p".take(4000))
    assert(!p.contains("Window"),
      s"the batch rank must be the two-phase prefix sum, not a window:\n$p".take(4000))
    // the gram decontamination joins hash FINGERPRINTS (fixed-width),
    // never gram strings
    assert(!p.contains("array_join"),
      s"gram join must ride the 64-bit hash kernel, not strings:\n$p".take(4000))
  }

  test("PMI pair expansion never plans a window; pair counts combine map-side") {
    val p = plan(SparkEntry.queries("q_pmi_pairs")(spark, TestSpark.Sf0001))
    assert(!p.contains("Window"), s"per-doc cap must be slice, not window:\n$p")
    assert(p.contains("partial_count") || p.contains("Partial"),
      s"pair counts must partially aggregate before the exchange:\n$p")
  }

  test("CMS sketch build is one exchange over D x W cells") {
    val cnt = Tables.documents(spark, TestSpark.Sf0001)
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
      .localCheckpoint() // isolate the sketch build's own plan
    val p = plan(graft.operators.CorpusStats.cmsBuild(cnt))
    assert("Exchange".r.findAllIn(p).size == 1,
      s"sketch build is one (r,b) aggregation:\n$p")
    assert(p.contains("partial_sum"), s"cells must combine map-side:\n$p")
  }

  test("gramian is one shuffle after the coordinate self-join") {
    val emb = Tables.embeddings(spark, TestSpark.Sf0001)
    val p = plan(graft.operators.Spectral.gramian(emb))
    // checkpointed coords join in-partition (same partitioning both
    // sides); the (i,j) aggregation is the single exchange
    assert(p.contains("partial_sum"), s"gramian must combine map-side:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"coordinate pairing must be an equi-join on vec_id:\n$p")
  }
}
