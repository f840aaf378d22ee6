package graft.queries

/** Registry-integrity combinators for the query/oracle surface.
  *
  * The driver's correctness sweep trusts `SparkEntry.queries.keySet` as
  * THE gate surface, and a plain `Map ++` union silently keeps the
  * right-most binding on a key collision — round 12's per-lang data
  * card shadowed round 7's per-source one exactly this way, and the
  * sweep would have reported a green surface with one gate quietly
  * replaced (caught only by hand-counting the dump, SURVEY §10.16.23).
  * Assembly therefore fails LOUDLY here: Σ module sizes must equal the
  * union size, naming every colliding key and the modules that own it.
  */
object Registry {

  /** Union the named module maps, refusing duplicate keys. */
  def unionDistinct[V](parts: (String, Map[String, V])*): Map[String, V] = {
    val union = parts.map(_._2).reduceLeft(_ ++ _)
    if (union.size != parts.map(_._2.size).sum) {
      val dups = parts.flatMap { case (mod, m) => m.keys.map(_ -> mod) }
        .groupBy(_._1).collect { case (k, owners) if owners.size > 1 =>
          s"$k <- [${owners.map(_._2).mkString(", ")}]" }
      throw new IllegalStateException(
        s"query registry: duplicate keys across modules: ${dups.mkString("; ")}")
    }
    union
  }

  /** Queries and oracles must cover EXACTLY the same key set — an
    * oracle without a query never runs (a dead gate), a query without
    * an oracle silently downgrades to the driver's weaker rows-only
    * check. Both are holes the sweep cannot see. */
  def requireAligned(queryKeys: Set[String], oracleKeys: Set[String]): Unit = {
    val noOracle = queryKeys -- oracleKeys
    val noQuery = oracleKeys -- queryKeys
    if (noOracle.nonEmpty || noQuery.nonEmpty)
      throw new IllegalStateException(
        "query registry: queries without an oracle: " +
          s"${noOracle.toSeq.sorted.mkString(", ")}; " +
          s"oracles without a query: ${noQuery.toSeq.sorted.mkString(", ")}")
  }
}
