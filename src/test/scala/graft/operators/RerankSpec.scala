package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Greedy-MMR semantics on planted pools. */
class RerankSpec extends SparkTestBase {

  import spark.implicits._

  // pool: i1 best rel; i2 a near-duplicate of i1 with high rel;
  // i3 orthogonal with modest rel. MMR must demote the duplicate.
  private def pool = Seq(
    (7L, 1L, 0.95, Array(1.0, 0.0, 0.0)),
    (7L, 2L, 0.80, Array(0.999, 0.01, 0.0)), // 0.7·0.8−0.3·~1 ≈ 0.26 < 0.35
    (7L, 3L, 0.50, Array(0.0, 1.0, 0.0))
  ).toDF("query_id", "item", "rel", "embedding")

  test("mmr demotes near-duplicates below a diverse lower-rel candidate") {
    val out = Rerank.mmr(pool, 3, 0.7).orderBy("rnk").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 3L, 2L))
    // pick 1 is pure relevance: lambda * rel
    assert(math.abs(out(0).getDouble(3) - 0.7 * 0.95) < 1e-9)
    // pick 2 chose i3 (orthogonal, maxsim 0) over i2 (sim ~1)
    assert(math.abs(out(1).getDouble(3) - 0.7 * 0.5) < 1e-9)
  }

  test("mmr stops at pool size and ties break on the lower item id") {
    val tied = Seq(
      (1L, 10L, 0.8, Array(1.0, 0.0)),
      (1L, 5L, 0.8, Array(0.0, 1.0))
    ).toDF("query_id", "item", "rel", "embedding")
    val out = Rerank.mmr(tied, 9, 0.7).orderBy("rnk").collect()
    assert(out.length == 2)          // k=9 > pool of 2
    assert(out(0).getLong(1) == 5L)  // equal rel: lowest id first
  }

  test("maxPool caps each query's pool ahead of the quadratic sim stage") {
    // 50 candidates, rel increasing with item id: only the 10 highest-rel
    // items (41..50) may appear once the defensive cap bites
    val wide = (1 to 50).map(i =>
      (1L, i.toLong, i / 100.0, Array(1.0, 0.0))).toDF(
      "query_id", "item", "rel", "embedding")
    val out = Rerank.mmr(wide, 10, 0.7, maxPool = 10).collect()
    assert(out.length == 10)
    assert(out.map(_.getLong(1)).forall(_ >= 41L))
    // and the default cap leaves a contracted-size pool untouched
    assert(Rerank.mmr(pool, 3, 0.7).count() == 3)
  }

  test("teamDraft: balanced credit, no duplicates, exhausted pool falls back") {
    import spark.implicits._
    val a = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("query_id", "item", "rnk")
    val b = Seq((1L, 10L, 1), (1L, 20L, 2)) // overlaps A on item 10
      .toDF("query_id", "item", "rnk")
    val out = Rerank.teamDraft(a, b, 5).orderBy("pos").collect()
    val items = out.map(_.getLong(2))
    assert(items.distinct.length == items.length, "no duplicate items")
    assert(items.toSet == Set(10L, 11L, 12L, 20L)) // union exhausts at 4
    // team credits can differ by at most 1 until a pool exhausts
    val credits = out.map(_.getString(3))
    val (caa, cbb) = (credits.count(_ == "A"), credits.count(_ == "B"))
    assert(caa + cbb == 4)
    // B's pool is only {10, 20}: at most 2 picks credited to B
    assert(cbb <= 2)
  }

  test("teamDraft is deterministic: same coins, same list, any layout") {
    import spark.implicits._
    val a = (1 to 10).map(i => (7L, i.toLong, i)).toDF("query_id", "item", "rnk")
    val b = (1 to 10).map(i => (7L, (100 + i).toLong, i)).toDF("query_id", "item", "rnk")
    val x = Rerank.teamDraft(a.repartition(1), b.repartition(1), 8)
      .collect().map(_.toString).sorted
    val y = Rerank.teamDraft(a.repartition(5), b.repartition(3), 8)
      .collect().map(_.toString).sorted
    assert(x.sameElements(y))
    // disjoint pools + balanced draft: exactly 4 picks per team
    val teams = Rerank.teamDraft(a, b, 8).collect().map(_.getString(3))
    assert(teams.count(_ == "A") == 4 && teams.count(_ == "B") == 4)
  }

  test("mmr is partition-invariant and per-query independent") {
    val two = pool.union(Seq(
      (8L, 4L, 0.9, Array(0.5, 0.5, 0.0)),
      (8L, 6L, 0.3, Array(0.5, 0.5, 0.001))
    ).toDF("query_id", "item", "rel", "embedding"))
    val a = Rerank.mmr(two.repartition(1), 2, 0.7)
      .collect().map(_.toString).sorted
    val b = Rerank.mmr(two.repartition(5), 2, 0.7)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
    assert(a.length == 4) // 2 picks per query
  }
}
