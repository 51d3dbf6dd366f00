package graft.operators

import graft.SparkTestBase

/** Blocked entity resolution: verify semantics (best match, threshold,
  * unresolved probes) and the blocking contract (an edit inside the
  * prefix escapes the block — documented recall trade). */
class FuzzyJoinSpec extends SparkTestBase {

  import spark.implicits._

  private val catalog = Seq(
    (1L, "small ring"), (2L, "small king"), (3L, "red widget"))
    .toDF("cand_id", "name")

  test("typo'd probe resolves to the min-distance catalog entry") {
    val probes = Seq((10L, "smal ring")).toDF("probe_id", "name")
    val out = FuzzyJoin.resolve(probes, catalog, maxDist = 2).collect()
    assert(out.length == 1)
    assert(out(0).getLong(1) == 1L) // "small ring" at dist 1 beats "small king" at 2
    assert(out(0).getLong(2) == 1L)
  }

  test("distance ties break on min cand_id") {
    val probes = Seq((10L, "small xing")).toDF("probe_id", "name")
    // dist 1 to both "small ring" and "small king" -> cand_id 1 wins
    val out = FuzzyJoin.resolve(probes, catalog, maxDist = 2).collect()
    assert(out(0).getLong(1) == 1L && out(0).getLong(2) == 1L)
  }

  test("probes beyond maxDist are absent, case is ignored") {
    val probes = Seq((10L, "smxxx yyyy"), (11L, "RED WIDGET"))
      .toDF("probe_id", "name")
    val out = FuzzyJoin.resolve(probes, catalog, maxDist = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(!out.contains(10L)) // 5 edits away: unresolved
    assert(out(11L) == (3L, 0L)) // exact match after lowercasing
  }

  test("an edit inside the blocking prefix escapes the block (documented)") {
    val probes = Seq((10L, "srall ring")).toDF("probe_id", "name")
    // 2nd char edited: the 2-char block key "sr" misses "sm…" entries
    assert(FuzzyJoin.resolve(probes, catalog, maxDist = 2).count() == 0)
    // a shorter prefix (or a second blocking key) recovers the pair
    val out = FuzzyJoin.resolve(probes, catalog, maxDist = 2, prefixLen = 1)
      .collect()
    assert(out.length == 1 && out(0).getLong(1) == 1L && out(0).getLong(2) == 1L)
  }
}
