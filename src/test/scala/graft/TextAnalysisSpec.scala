package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** lmScore edge cases the corpus gate can't isolate: degenerate docs,
  * OOV behavior, partitioning-independence of the integer sums, and the
  * semantic point of a perplexity filter (fluent text scores better
  * than gibberish under a model trained on the fluent corpus). */
class TextAnalysisSpec extends SparkSpecBase {

  import testImplicits._

  private def score(rows: Seq[(Long, String)]) =
    TextAnalysis.lmScore(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  test("query expansion recovers vocabulary-mismatch docs plain BM25 cannot see") {
    // "beta" co-occurs with the query term "alpha" in docs 0-2, so it
    // becomes an expansion term; doc 9 uses ONLY "beta" — invisible to
    // plain BM25, recovered (at half weight) by the expanded query.
    val docs = Seq(
      (0L, "alpha beta x"), (1L, "alpha beta y"), (2L, "alpha beta z"),
      (3L, "alpha q"), (9L, "beta beta w"), (10L, "unrelated text"))
      .toDF("doc_id", "text")
    val plain = graft.operators.TextAnalysis
      .bm25TopK(docs, Seq("alpha"), 10)
      .collect().map(_.getLong(0)).toSet
    val expanded = graft.operators.TextAnalysis
      .bm25TopKExpanded(docs, Seq("alpha"), 10, m = 1)
      .collect().map(_.getLong(0)).toSet
    assert(!plain.contains(9L), "fixture: plain BM25 must miss the beta-only doc")
    assert(expanded.contains(9L), "expansion must recover the vocabulary-mismatch doc")
    assert(!expanded.contains(10L), "unrelated docs stay unranked")
    assert(plain.subsetOf(expanded), "expansion may only ADD recall")
  }

  test("docs below two tokens get zero bigrams and zero score") {
    val s = score(Seq((1L, "hello"), (2L, ""), (3L, "a b")))
    assert(s(1L) == ((0L, 0L, 0L)))
    assert(s(2L) == ((0L, 0L, 0L)))
    assert(s(3L)._1 == 1L) // one bigram
    assert(s(3L)._2 > 0L) // nonzero nll
  }

  test("repeated in-vocab bigrams score strictly better than pure OOV") {
    // train+score on the same tiny corpus: "the cat" dominates counts,
    // so the common-bigram doc must have lower mean nll than the doc of
    // hapax tokens (whose bigrams all back off to the OOV floor)
    val corpus = (1L to 20L).map(i => (i, "the cat sat on the mat")) ++
      Seq((100L, "zq1 zq2 zq3 zq4 zq5 zq6"))
    val s = score(corpus)
    val common = s(1L)._3 // mean_nll_micro
    val gibberish = s(100L)._3
    assert(common < gibberish,
      s"fluent=$common must beat gibberish=$gibberish")
  }

  test("stateless scoring against trained tables == self-trained lmScore") {
    // real corpus: same docs scored both ways must match row-for-row —
    // this certifies the train-once/score-anywhere split (and the
    // NUL-keyed map lookups reproducing the join+cap tie semantics).
    val docs = graft.queries.Tables.documents(spark, TestSpark.Sf0001)
    val (uni, bi) = TextAnalysis.lmTables(docs)
    assert(uni.nonEmpty && bi.nonEmpty)
    val joined = TextAnalysis.lmScore(docs)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val stateless = TextAnalysis.lmScoreStateless(docs, uni, bi)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(joined.nonEmpty && joined == stateless)
  }

  test("stateless scorer matches lmScore on degenerate and pure-OOV docs") {
    val corpus = Seq((1L, "the cat sat on the mat"), (2L, ""), (3L, "one"),
      (4L, "zq1 zq2 zq3"), (5L, "the cat"))
    val df = corpus.toDF("doc_id", "text")
    val (uni, bi) = TextAnalysis.lmTables(df)
    val joined = TextAnalysis.lmScore(df)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val stateless = TextAnalysis.lmScoreStateless(df, uni, bi)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(joined == stateless)
    // scoring NEW docs against the shipped model (the serving case —
    // lmScore can't express this at all): known bigram beats pure OOV
    val fresh = Seq((10L, "the cat"), (11L, "zz9 zz8")).toDF("doc_id", "text")
    val s = TextAnalysis.lmScoreStateless(fresh, uni, bi)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(s(10L) < s(11L))
  }

  test("NUL bytes in text cannot mis-split stateless bigram keys (ADVICE r4)") {
    // NUL is the stateless model's key separator; lmToks treats it as
    // whitespace, so a NUL-carrying corpus tokenizes identically for the
    // fresh and stateless scorers instead of silently diverging
    val nul = 0.toChar.toString
    val corpus = Seq((1L, "the cat sat"), (2L, s"the${nul}cat sat the cat"),
      (3L, s"a${nul} b${nul}${nul}c a b"))
    val df = corpus.toDF("doc_id", "text")
    val (uni, bi) = TextAnalysis.lmTables(df)
    assert(uni.keys.forall(!_.contains(nul)))
    assert(bi.keys.forall(k => k.count(_ == 0.toChar) == 1))
    val joined = TextAnalysis.lmScore(df)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val stateless = TextAnalysis.lmScoreStateless(df, uni, bi)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(joined == stateless)
    // a hand-built model with a NUL inside a token fails LOUDLY at
    // model-compile time (first score), not by silent mis-split
    val bad = intercept[IllegalArgumentException] {
      new graft.functions.LmModel(Array.empty, Array.empty,
        Array(s"x${nul}y${nul}z"), Array(1L))
        .score(new org.apache.spark.sql.catalyst.util.GenericArrayData(
          Array[Any](
            org.apache.spark.unsafe.types.UTF8String.fromString("a"),
            org.apache.spark.unsafe.types.UTF8String.fromString("b"))))
    }
    assert(bad.getMessage.contains("NUL"))
  }

  test("integer micro-nat sums are partitioning-independent") {
    val rows = (1L to 50L).map(i => (i, s"tok${i % 7} tok${i % 5} tok${i % 3} tok${i % 2}"))
    val df = rows.toDF("doc_id", "text")
    val a = TextAnalysis.lmScore(df.repartition(1))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = TextAnalysis.lmScore(df.repartition(13))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("perplexity buckets: per-lang tertiles, fluent text lands in the head") {
    val out = graft.SparkEntry.queries("q_ppl_buckets")(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
    assert(out.nonEmpty)
    // tertiles per lang: sizes differ by at most 1, every bucket in 1..3
    out.groupBy(_._2).foreach { case (lang, rows) =>
      val sizes = rows.groupBy(_._4).view.mapValues(_.size).toMap
      assert(sizes.keySet.subsetOf(Set(1, 2, 3)), s"$lang: $sizes")
      assert(sizes.values.max - sizes.values.min <= 1, s"$lang: $sizes")
      // bucket order tracks the score order: max(head) <= min(tail)
      val head = rows.filter(_._4 == 1).map(_._3)
      val tail = rows.filter(_._4 == 3).map(_._3)
      if (head.nonEmpty && tail.nonEmpty)
        assert(head.max <= tail.min, s"$lang: head ${head.max} > tail ${tail.min}")
    }
  }

  test("BM25 ranks by term frequency, rarity and length normalization") {
    // d1: both query terms, short → top. d2: same tf but padded long →
    // below d1 (length normalization). d3: only the COMMON term.
    // d4: only the RARE term — idf must put d4 above d3. d5: no terms.
    val docs = Seq(
      (1L, "apple banana"),
      (2L, "apple banana pad pad pad pad pad pad pad pad pad pad"),
      (3L, "apple pad"),
      (4L, "banana pad"),
      (5L, "pad pad")
    ) ++ (10L to 29L).map(i => (i, "apple filler filler")) // apple common
    val out = TextAnalysis.bm25TopK(docs.toDF("doc_id", "text"),
      Seq("apple", "banana"), 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!out.contains(5L), "doc with no query terms must not score")
    assert(out(1L) > out(2L), "shorter doc with same tf must rank higher")
    assert(out(4L) > out(3L), "rare term must out-score common term (idf)")
    assert(out(1L) > out(3L) && out(1L) > out(4L))
  }

  test("BM25 scores are partitioning-independent") {
    val docs = graft.queries.Tables.documents(spark, TestSpark.Sf0001)
    val a = TextAnalysis.bm25TopK(docs.repartition(1), Seq("table", "scan", "join"), 10)
      .collect().map(_.toSeq).toSeq
    val b = TextAnalysis.bm25TopK(docs.repartition(13), Seq("table", "scan", "join"), 10)
      .collect().map(_.toSeq).toSeq
    assert(a.nonEmpty && a == b)
  }

  test("DSIR weights rank target-domain docs above off-domain docs") {
    // two disjoint vocabularies: the target model is trained on the
    // "legal" half only, the raw model on everything. Every legal doc
    // must out-weight every spam doc, and the above-mean selection cut
    // must fall exactly between the two clusters.
    val legal = (1L to 20L).map(i =>
      (i, "the court finds the claim valid and the motion granted", "en"))
    val spam = (101L to 120L).map(i =>
      (i, "buy cheap pills now click here win big money fast", "xx"))
    val docs = (legal ++ spam).toDF("doc_id", "text", "lang")
    val (rawU, rawB) = TextAnalysis.lmTables(docs)
    val (tgtU, tgtB) = TextAnalysis.lmTables(docs.filter(col("lang") === "en"))
    val w = TextAnalysis.dsirWeights(docs, rawU, rawB, tgtU, tgtB)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(5), r.getBoolean(6)))).toMap
    val legalW = legal.map(d => w(d._1))
    val spamW = spam.map(d => w(d._1))
    assert(legalW.map(_._1).min > spamW.map(_._1).max,
      "every target-domain doc must out-weight every off-domain doc")
    assert(legalW.forall(_._2) && spamW.forall(!_._2),
      "the above-mean cut must select exactly the target-domain cluster")
  }

  test("lmTablesDual == two separate lmTables trainings, table for table") {
    val docs = graft.queries.Tables.documents(spark, TestSpark.Sf0001)
    val (rawU, rawB, tgtU, tgtB) =
      TextAnalysis.lmTablesDual(docs, col("lang") === "en")
    val (ru, rb) = TextAnalysis.lmTables(docs)
    val (tu, tb) = TextAnalysis.lmTables(docs.filter(col("lang") === "en"))
    assert(rawU == ru && rawB == rb, "raw tables must match separate training")
    assert(tgtU == tu && tgtB == tb, "target tables must match separate training")
    assert(tgtU.nonEmpty && tgtB.nonEmpty)
  }

  test("DSIR weights are partitioning-independent") {
    val docs = graft.queries.Tables.documents(spark, TestSpark.Sf0001)
    val (rawU, rawB) = TextAnalysis.lmTables(docs)
    val (tgtU, tgtB) = TextAnalysis.lmTables(docs.filter(col("lang") === "en"))
    val a = TextAnalysis.dsirWeights(docs.repartition(1), rawU, rawB, tgtU, tgtB)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = TextAnalysis.dsirWeights(docs.repartition(13), rawU, rawB, tgtU, tgtB)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a.nonEmpty && a == b)
  }

  test("phrase search == brute-force sliding window, incl. overlaps") {
    // driver-side replay of the exact algorithm over the raw corpus:
    // tokenize like bm25Toks, slide a |phrase| window, count every
    // start — overlapping starts of a repeated-term phrase included
    val docs = graft.queries.Tables.documents(spark, TestSpark.Sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def brute(phrase: Seq[String]): Map[Long, Long] =
      docs.map { case (id, text) =>
        val t = text.trim.toLowerCase.split("\\s+").toSeq
        id -> (0 to t.length - phrase.length)
          .count(i => t.slice(i, i + phrase.length) == phrase).toLong
      }.filter(_._2 > 0).toMap
    val expected = graft.operators.Ingest.PhraseBatch
      .flatMap { case (pid, p) =>
        brute(p).map { case (id, n) => (pid, id) -> n } }.toMap
    // the corpus must actually exercise the overlap edge ("batch batch
    // batch" ⇒ two starts) and the OOV edge (phrase 3 ⇒ zero rows)
    assert(expected.exists { case ((pid, _), n) => pid == 1L && n == 2L })
    assert(!expected.exists { case ((pid, _), _) => pid == 3L })
    val got = graft.operators.Ingest.phraseMatchBatch(
      spark, TestSpark.Sf0001, graft.operators.Ingest.PhraseBatch)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected)
  }
}
