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
}
