package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** PageRank invariants on a hand-built star graph: probability mass is
  * conserved, every rank is positive, and the hub outranks the leaves. */
class PageRankSpec extends SparkTestBase {

  test("star graph: mass conserved, hub wins, leaves symmetric") {
    import spark.implicits._
    val undirected = Seq((1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 1L))
      .toDF("src", "dst", "weight")
    val pr = PageRank.run(CoPurchaseGraph.symmetrize(undirected))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    assert(math.abs(pr.values.sum - 4.0) < 1e-4) // scaled ranks sum to N
    assert(pr.values.forall(_ > 0))
    assert(pr(1L) > pr(2L))
    assert(pr(2L) == pr(3L) && pr(3L) == pr(4L)) // leaf symmetry
  }

  test("weights matter: heavier edge pulls rank") {
    import spark.implicits._
    // triangle with one heavy edge 1-2; node 3 is lighter-connected
    val undirected = Seq((1L, 2L, 10L), (1L, 3L, 1L), (2L, 3L, 1L))
      .toDF("src", "dst", "weight")
    val pr = PageRank.run(CoPurchaseGraph.symmetrize(undirected))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr(1L) > pr(3L) && pr(2L) > pr(3L))
  }

  test("runDirected: dangling mass redistributed, total rank conserved") {
    import spark.implicits._
    // chain 1→2→3 plus sink 4 (1→4): nodes 3 and 4 dangle
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (1L, 4L, 1L))
      .toDF("src", "dst", "weight")
    val pr = PageRank.runDirected(edges)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr.size == 4)
    // scaled ranks sum to n (mass 1 before scaling)
    assert(math.abs(pr.values.sum - 4.0) < 1e-4, s"mass not conserved: $pr")
    // the chain's middle/sink nodes receive mass; source 1 only gets
    // base + dangling share, so it ranks below its successors
    assert(pr(2L) > pr(1L) && pr(3L) > pr(1L))
  }

  test("personalized: mass conserved, concentrated near the seed") {
    import spark.implicits._
    // two symmetric lobes joined at 3; seed in the left lobe
    val edges = Seq((1L, 2L, 1L), (2L, 1L, 1L), (2L, 3L, 1L), (3L, 2L, 1L),
      (3L, 4L, 1L), (4L, 3L, 1L), (4L, 5L, 1L), (5L, 4L, 1L))
      .toDF("src", "dst", "weight")
    val ppr = PageRank.personalized(edges, Seq(1L).toDF("node"), 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(ppr.values.sum - 5.0) < 1e-3, s"mass not conserved: $ppr")
    // decay with distance from the seed (pairwise at +2 hops: a chain
    // endpoint hands ALL its mass to its neighbor, so strict adjacent
    // monotonicity doesn't hold at the seed itself)
    assert(ppr(1L) > ppr(3L) && ppr(2L) > ppr(4L) && ppr(3L) > ppr(5L),
      s"no decay: $ppr")
  }

  test("directed loop plan: dangling mass is a literal, not a join") {
    import spark.implicits._
    // the per-round dangling mass rides the roll's observed metric and
    // lands in the next plan as a literal — a regression to the
    // aggregate-subquery shape reintroduces a per-round broadcast
    // nested-loop join (one extra job + exchange every iteration)
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L)).toDF("src", "dst", "weight")
    val plan = PageRank.runDirected(edges, iterations = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "dangling mass re-entered the plan as a join")
  }

  test("personalized: dangling mass teleports back to seeds only") {
    import spark.implicits._
    // 2 is a dead end; without dangling handling mass drains every round
    val edges = Seq((1L, 2L, 1L)).toDF("src", "dst", "weight")
    val ppr = PageRank.personalized(edges, Seq(1L).toDF("node"), 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(ppr.values.sum - 2.0) < 1e-3, s"mass drained: $ppr")
    assert(ppr(1L) > ppr(2L)) // seed keeps the restart mass
  }

  test("broadcast and shuffle contrib-join paths agree at 6 dp") {
    import spark.implicits._
    // the adaptive strategy (rank frame broadcast under
    // BroadcastMaxNodes, shuffle-hash above) is a pure plan choice:
    // the output contract rounds to 6 dp inside the operator, so both
    // forced modes must return the SAME rows. Mirrors the sf0.1 gate
    // in graft.PrBcProbe (0 of 20000 mismatches).
    val edges = ((0L to 30L).map(i => (i, (i * 5 + 2) % 31, 1L + i % 4)) ++
      (0L to 30L).map(i => (i, (i + 1) % 31, 1L)))
      .filter(e => e._1 != e._2).toDF("src", "dst", "weight")
    val seeds = Seq(0L, 9L).toDF("node")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(PageRank.run(edges, 8, broadcastMaxNodes = 0L)) ==
      rows(PageRank.run(edges, 8, broadcastMaxNodes = Long.MaxValue)))
    assert(rows(PageRank.runDirected(edges, 8, broadcastMaxNodes = 0L)) ==
      rows(PageRank.runDirected(edges, 8, broadcastMaxNodes = Long.MaxValue)))
    assert(rows(PageRank.personalized(edges, seeds, 8,
        broadcastMaxNodes = 0L)) ==
      rows(PageRank.personalized(edges, seeds, 8,
        broadcastMaxNodes = Long.MaxValue)))
  }

  test("BroadcastMaxNodes boundary: the mode flips exactly at |V| == bound " +
    "and both sides of the boundary return identical output") {
    import spark.implicits._
    // ring + chords over exactly 31 nodes → |V| = 31 is known, so
    // bound = 31 must broadcast (n <= bound) and bound = 30 must
    // shuffle — the deploy-time knob binds at the documented boundary,
    // not one off it. Plan is string-matched: AQE's adaptive root does
    // not expose the inner plan via collect.
    val edges = ((0L to 30L).map(i => (i, (i * 7 + 3) % 31, 1L + i % 3)) ++
      (0L to 30L).map(i => (i, (i + 1) % 31, 1L)))
      .filter(e => e._1 != e._2).toDF("src", "dst", "weight")
    def hasBroadcastJoin(bound: Long): Boolean =
      PageRank.run(edges, 2, broadcastMaxNodes = bound)
        .queryExecution.executedPlan.toString.contains("BroadcastHashJoin")
    assert(hasBroadcastJoin(31L), "|V| == bound must take the broadcast path")
    assert(!hasBroadcastJoin(30L), "|V| == bound+1 must take shuffle-hash")
    // and the choice is invisible in the output (6-dp contract)
    def rows(bound: Long) =
      PageRank.run(edges, 8, broadcastMaxNodes = bound)
        .collect().map(_.toSeq).toSet
    assert(rows(31L) == rows(30L))
  }
}
