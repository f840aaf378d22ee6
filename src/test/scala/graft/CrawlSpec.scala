package graft

import org.apache.spark.sql.functions._

import graft.operators.Crawl

/** Crawl-curation tests: canonicalization rules on literal URLs the
  * synthetic corpus never renders (non-default ports, case-heavy paths,
  * bare hosts, fragment-with-query), registrable-domain suffix logic,
  * and PageRank on a hand-computed graph. */
class CrawlSpec extends SparkSpecBase {

  import testImplicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url")
      .select(Crawl.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq

  test("canonicalizeUrl: scheme/host lowered, path case preserved") {
    assert(canon("HTTPS://ExAmPle.COM/Some/Path") ==
      Seq("https://example.com/Some/Path"))
  }

  test("canonicalizeUrl: default port stripped only for its own scheme") {
    assert(canon(
      "http://a.com:80/x", "https://a.com:443/x",
      "http://a.com:443/x", "https://a.com:80/x",
      "http://a.com:8080/x") ==
      Seq("http://a.com/x", "https://a.com/x",
        "http://a.com:443/x", "https://a.com:80/x",
        "http://a.com:8080/x"))
  }

  test("canonicalizeUrl: www stripped, but only as a full first label") {
    assert(canon("http://www.site.org/p", "http://wwwsite.org/p",
      "http://www.www.site.org/p") ==
      Seq("http://site.org/p", "http://wwwsite.org/p",
        "http://www.site.org/p"))
  }

  test("canonicalizeUrl: trailing slashes collapse; root and bare host → /") {
    assert(canon("http://a.com/x/", "http://a.com/x///",
      "http://a.com/", "http://a.com") ==
      Seq("http://a.com/x", "http://a.com/x", "http://a.com/", "http://a.com/"))
  }

  test("canonicalizeUrl: tracking params dropped, survivors sorted, fragment gone") {
    assert(canon(
      "http://a.com/p?utm_source=x&b=2&a=1&ref=rss#frag",
      "http://a.com/p?ref=abc&utm_campaign=z",
      "http://a.com/p?z=1&&a=2") ==
      Seq("http://a.com/p?a=1&b=2", "http://a.com/p",
        "http://a.com/p?a=2&z=1"))
  }

  test("canonicalizeUrl: planted mod-200 classes collide, neighbors do not") {
    val df = Seq(7L, 207L, 407L, 8L).toDF("doc_id")
      .select(Crawl.canonicalizeUrl(Crawl.syntheticUrl(col("doc_id"))).as("c"))
    val cs = df.collect().map(_.getString(0))
    assert(cs(0) == cs(1) && cs(1) == cs(2), s"mod-200 twins differ: ${cs.toSeq}")
    assert(cs(0) != cs(3), "distinct classes must not collide")
  }

  test("canonicalizeUrl kernel == declarative regexp chain (property)") {
    // messy-URL generator: valid-ish and degenerate shapes alike —
    // missing scheme, bare ://, repeated ?, odd ports, empty params
    import org.scalacheck.Gen
    val scheme = Gen.oneOf("http", "HTTP", "https", "HtTpS", "ftp", "", "1bad")
    val host = Gen.oneOf("A.b.C", "www.Site7.co.uk", "WWW.x.IO", "host",
      "www.", "x:80", "y:443", "z:8080", "")
    val path = Gen.oneOf("", "/", "/A/B", "/a/", "/a//", "///", "/p?x")
    val params = Gen.listOfN(3, Gen.oneOf("id=1", "utm_source=x", "ref=rss",
      "", "b=2", "a=10", "a=2", "sort=asc")).map(_.mkString("&"))
    val frag = Gen.oneOf("", "#f", "#a#b", "#?q=1")
    val gen = for {
      s <- scheme; h <- host; p <- path; q <- params; f <- frag
      sep <- Gen.oneOf("://", ":/", "", "//")
    } yield s"$s$sep$h$p?$q$f"
    val urls = samples(gen, 400).distinct
    val df = urls.toDF("url")
      .select(col("url"),
        Crawl.canonicalizeUrl(col("url")).as("k"),
        Crawl.canonicalizeUrlRef(col("url")).as("r"))
    val bad = df.filter(col("k") =!= col("r")).collect()
    assert(bad.isEmpty, "kernel/chain divergence: " +
      bad.take(5).map(b => s"'${b.getString(0)}' -> '${b.getString(1)}' vs '${b.getString(2)}'")
        .mkString("; "))
  }

  test("registrableDomain: multi-level public suffixes keep three labels") {
    val df = Seq(
      "http://a.b.site9.co.uk/p", "http://site9.co.uk/p",
      "http://deep.sub.site1.com/p", "http://site1.com/p")
      .toDF("url")
      .select(Crawl.registrableDomain(col("url")).as("d"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("site9.co.uk", "site9.co.uk", "site1.com", "site1.com"))
  }

  test("labelPropagate: seeds clamp, inflow splits by real out-degree, ties stay none") {
    // doc 1 is the trusted seed (1 % 23 = 1), doc 2 the spam seed;
    // edges 1→{0,3} (trust splits in half) and 2→0 (full spam mass).
    // Node 0 gets t=500000 vs s=1000000 → spam; node 3 trust-only.
    val docs = Seq(0L, 1L, 2L, 3L).toDF("doc_id")
    val edges = Seq((1L, 0L), (1L, 3L), (2L, 0L)).toDF("src", "dst")
    val out = Crawl.labelPropagate(docs, edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(1L) == ((1000000L, 0L, "trusted")), "trusted seed must stay clamped")
    assert(out(2L) == ((0L, 1000000L, "spam")), "spam seed must stay clamped")
    assert(out(0L) == ((500000L, 1000000L, "spam")),
      "mixed inflow must split by the REAL out-degree and argmax to spam")
    assert(out(3L) == ((500000L, 0L, "trusted")), "trust-only inflow labels trusted")
    // equal inflow is a tie and must stay 'none': one trust edge from a
    // degree-2 seed vs one spam edge from a degree-2 seed
    val tie = Crawl.labelPropagate(
      Seq(0L, 1L, 2L).toDF("doc_id"),
      Seq((1L, 0L), (1L, 0L), (2L, 0L), (2L, 0L)).toDF("src", "dst"))
      .filter(col("doc_id") === 0L).head()
    assert(tie.getString(3) == "none",
      s"equal label masses must read out conservative 'none', got ${tie.getString(3)}")
  }

  test("pageRank: hand-computed heterogeneous-degree graph with dangling node") {
    // nodes 0..3 with REAL out-degrees {1, 2, 3, 0}:
    //   0→1; 1→{0,2}; 2→{0,1,3}; 3 dangling.
    // A constant-out-degree implementation CANNOT reproduce this: node
    // 0's full rank flows to 1 undivided, node 2's splits three ways,
    // and node 3's mass only re-enters through the dangling share.
    val docs = Seq(0L, 1L, 2L, 3L).toDF("doc_id")
    val edges = Seq((0L, 1L), (1L, 0L), (1L, 2L),
      (2L, 0L), (2L, 1L), (2L, 3L)).toDF("src", "dst")
    val r = Crawl.pageRank(docs, edges).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    // replay the integer arithmetic precisely (floors everywhere):
    def it(prev: Map[Long, Long]): Map[Long, Long] = {
      val share = prev(3L) / 4 // dangling mass ÷ N, integer floor
      val inflow = Map(
        0L -> (prev(1L) / 2 + prev(2L) / 3),
        1L -> (prev(0L) / 1 + prev(2L) / 3),
        2L -> (prev(1L) / 2),
        3L -> (prev(2L) / 3))
      inflow.map { case (k, v) => k -> (150000L + (v + share) * 85 / 100) }
    }
    val init = Map(0L -> 1000000L, 1L -> 1000000L, 2L -> 1000000L,
      3L -> 1000000L)
    val expect = it(it(it(init)))
    assert(r == expect, s"got $r, want $expect")
    // sanity: the heterogeneous degrees actually produce distinct ranks
    assert(r.values.toSet.size >= 3, s"degenerate rank spread: $r")
  }

  test("pageRank: synthetic graph conserves bounded total mass") {
    val docs = (0L until 50L).toDF("doc_id")
    val edges = Crawl.outlinks(docs)
    // degree-varying fixture: d%7==0 dangles, else 1 + d%5 outlinks
    val expectEdges = (0L until 50L)
      .map(d => if (d % 7 == 0) 0L else 1L + d % 5).sum
    assert(edges.count() == expectEdges,
      s"expected $expectEdges heterogeneous-degree edges")
    val degrees = edges.groupBy("src").count()
      .select("count").distinct().collect().map(_.getLong(0)).toSet
    assert(degrees == Set(1L, 2L, 3L, 4L, 5L),
      s"out-degrees must vary 1..5, got $degrees")
    val total = Crawl.pageRank(docs, edges)
      .agg(sum("rank_micro")).head().getLong(0)
    // total ∈ (N·scale·(1-d) , N·scale]: damping + dangling redistribution
    // leak only integer-floor dust
    assert(total > 50L * 150000 && total <= 50L * 1000000,
      s"total mass $total out of range")
  }

  test("robots filter: rule domains block exactly their prefix, others pass") {
    val out = graft.SparkEntry.queries("q_robots_filter")(spark, TestSpark.Sf0001)
      .collect()
    val byUrl = out.map(r => r.getAs[String]("canon_url") ->
      (r.getAs[String]("domain"), r.getAs[Boolean]("blocked"))).toMap
    // every blocked URL must belong to a rule domain AND match its prefix
    val rules = graft.operators.Crawl.robotsRules(spark).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    byUrl.foreach { case (url, (dom, blocked)) =>
      val path = url.replaceAll("^[^:/?#]+://[^/?#]*", "").takeWhile(_ != '?')
      val expect = rules.get(dom).exists(path.startsWith)
      assert(blocked == expect, s"$url (domain $dom, path $path)")
    }
    assert(out.exists(_.getAs[Boolean]("blocked")), "some URLs must be blocked")
    assert(out.exists(!_.getAs[Boolean]("blocked")), "some URLs must pass")
  }

  test("frontier schedule: per-domain ticks contiguous, priority non-increasing") {
    val rows = graft.SparkEntry.queries("q_frontier_schedule")(spark, TestSpark.Sf0001)
      .collect()
      .map(r => (r.getAs[String]("domain"), r.getAs[Long]("fetch_tick"),
        r.getAs[Long]("rank_micro")))
    rows.groupBy(_._1).foreach { case (dom, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to rs.length).toSeq,
        s"$dom: ticks must be the contiguous politeness schedule")
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sortBy(-_).toSeq,
        s"$dom: higher-rank URLs must fetch first")
      assert(rs.length <= graft.operators.Crawl.FrontierDepth,
        s"$dom: wave must be capped at FrontierDepth")
    }
    // 40 domains × depth-8 waves on the 500-doc corpus
    assert(rows.length ==
      40 * graft.operators.Crawl.FrontierDepth,
      s"expected a full depth-8 wave per domain, got ${rows.length}")
  }

  test("recrawl priority: class policy applied, waves capped and ordered") {
    val rows = graft.SparkEntry.queries("q_recrawl_priority")(spark, TestSpark.Sf0001)
      .collect()
      .map(r => (r.getAs[String]("domain"), r.getAs[Long]("fetch_tick"),
        r.getAs[Long]("doc_id"), r.getAs[String]("change_class"),
        r.getAs[Long]("priority_micro")))
    val off = graft.operators.Ingest.DocAppendOffset
    rows.foreach { case (_, _, id, cls, pri) =>
      val expect =
        if (id >= off) "added"
        else if (id % graft.operators.Curation.V2EditEvery == 0) "changed"
        else "unchanged"
      assert(cls == expect, s"doc $id classed $cls, expected $expect")
      if (cls == "added")
        assert(pri == Crawl.RankScale, s"added doc $id must get the fresh-page default")
    }
    rows.groupBy(_._1).foreach { case (dom, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to rs.length).toSeq,
        s"$dom: ticks must be the contiguous politeness schedule")
      assert(sorted.map(_._5).toSeq == sorted.map(_._5).sortBy(-_).toSeq,
        s"$dom: higher-priority docs must recrawl first")
      assert(rs.length <= Crawl.FrontierDepth, s"$dom: wave must be capped")
    }
    // unchanged docs carry decayed rank: strictly below any changed doc's
    // full rank of the same magnitude — spot the decay actually applied
    val unchanged = rows.filter(_._4 == "unchanged").map(_._5)
    assert(unchanged.nonEmpty && unchanged.forall(_ < Crawl.RankScale),
      "decayed unchanged priorities must sit below the fresh-page default")
  }

  test("q_anchor_text aggregates sorted distinct anchors per target") {
    val out = graft.SparkEntry.queries("q_anchor_text")(spark, TestSpark.Sf0001)
    val rows = out.collect()
    assert(rows.length == 40, s"expected 40 target domains, got ${rows.length}")
    val anchors = rows.map(_.getAs[String]("anchors"))
    assert(anchors.forall(a => a.split('|').toSeq == a.split('|').toSeq.sorted))
    val deg = rows.map(_.getAs[Long]("in_degree")).sum
    assert(deg == 1500, s"3 outlinks x 500 docs must land 1500 edges, got $deg")
  }
}
