package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Registry

/** Registry-integrity guard (round-13 verdict #2): the query surface
  * is a 16-way map union and a plain `++` silently keeps the
  * right-most binding on a key collision — round 12's per-lang card
  * shadowed round 7's per-source one exactly this way. These tests
  * plant deliberate collisions/holes to prove assembly fails LOUDLY,
  * and pin the real surface's size so the gate count is asserted, not
  * hand-counted. */
class RegistrySpec extends AnyFunSuite {

  test("unionDistinct refuses a planted duplicate key, naming key and owners") {
    val e = intercept[IllegalStateException] {
      Registry.unionDistinct(
        "modA" -> Map("q_x" -> 1, "q_dup" -> 2),
        "modB" -> Map("q_y" -> 3),
        "modC" -> Map("q_dup" -> 4))
    }
    assert(e.getMessage.contains("q_dup"), e.getMessage)
    assert(e.getMessage.contains("modA") && e.getMessage.contains("modC"),
      s"both owning modules must be named: ${e.getMessage}")
  }

  test("unionDistinct passes disjoint modules through unchanged") {
    val m = Registry.unionDistinct(
      "modA" -> Map("q_x" -> 1), "modB" -> Map("q_y" -> 2))
    assert(m == Map("q_x" -> 1, "q_y" -> 2))
  }

  test("requireAligned refuses a query without an oracle and vice versa") {
    val e1 = intercept[IllegalStateException] {
      Registry.requireAligned(Set("q_a", "q_orphan"), Set("q_a"))
    }
    assert(e1.getMessage.contains("q_orphan"), e1.getMessage)
    val e2 = intercept[IllegalStateException] {
      Registry.requireAligned(Set("q_a"), Set("q_a", "q_dead_oracle"))
    }
    assert(e2.getMessage.contains("q_dead_oracle"), e2.getMessage)
    Registry.requireAligned(Set("q_a"), Set("q_a")) // aligned = silent
  }

  test("the real registry assembles: aligned keys, asserted gate count") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(qs == os, s"queries/oracles diverge: ${(qs diff os) ++ (os diff qs)}")
    // the driver-visible gate surface — update WITH the gates, so a
    // silent registry change (not a planned addition) goes red here
    assert(qs.size == GateCount,
      s"gate surface changed: expected $GateCount, got ${qs.size} — " +
        "if gates were deliberately added, update GateCount")
  }

  /** The asserted size of the driver-visible gate surface. */
  private val GateCount = 216
}
