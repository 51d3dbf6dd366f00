package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** merge ≡ recompute — the materialized-view correctness law. */
class IncrementalSpec extends SparkTestBase {

  import spark.implicits._

  private def fact = Seq(
    (1L, 5.0), (1L, 7.0), (2L, 3.0), (2L, 9.0), (3L, 4.0)
  ).toDF("g", "v")

  test("merge of disjoint splits equals a full recompute") {
    val a = Incremental.stats(fact.where(col("v") < 6), "g", "v")
    val b = Incremental.stats(fact.where(col("v") >= 6), "g", "v")
    val merged = Incremental.merge(a, b, "g").collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val full = Incremental.stats(fact, "g", "v").collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(merged == full)
  }

  test("one-sided groups pass through unchanged (null-safe merge)") {
    val a = Incremental.stats(Seq((1L, 2.0)).toDF("g", "v"), "g", "v")
    val b = Incremental.stats(Seq((2L, 8.0)).toDF("g", "v"), "g", "v")
    val m = Incremental.merge(a, b, "g").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(m(1L) == ((1L, 2.0, 2.0, 2.0)))
    assert(m(2L) == ((1L, 8.0, 8.0, 8.0)))
  }

  test("merge is associative over a 3-way split") {
    val s = Seq(
      fact.where(col("v") < 4), fact.where(col("v") >= 4 && col("v") < 7),
      fact.where(col("v") >= 7)).map(Incremental.stats(_, "g", "v"))
    val lr = Incremental.merge(Incremental.merge(s(0), s(1), "g"), s(2), "g")
    val rl = Incremental.merge(s(0), Incremental.merge(s(1), s(2), "g"), "g")
    assert(lr.collect().map(_.toString).sorted
      .sameElements(rl.collect().map(_.toString).sorted))
  }

  test("retract: signed CDC contributions ≡ recompute, incl. group move") {
    import spark.implicits._
    // old state: a={10,20}, b={5}, c={7}
    val agg = Seq(("a", 2L, 30L), ("b", 1L, 5L), ("c", 1L, 7L))
      .toDF("g", "n", "sum_v")
    // delta: insert a+=40; delete b's 5 (group vanishes); update moves
    // c's 7 into group d as 9 (retract old group, apply new group)
    val contrib = Seq(
      ("a", 1L, 40L),           // insert
      ("b", -1L, -5L),          // delete
      ("c", -1L, -7L), ("d", 1L, 9L) // group-moving update
    ).toDF("g", "dn", "dv")
    val got = Incremental.retract(agg, contrib, "g")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == Map("a" -> ((3L, 70L)), "d" -> ((1L, 9L))), s"$got")
  }

  test("retract: empty delta is the identity; brand-new group appears") {
    import spark.implicits._
    val agg = Seq(("a", 2L, 30L)).toDF("g", "n", "sum_v")
    val empty = Seq.empty[(String, Long, Long)].toDF("g", "dn", "dv")
    assert(Incremental.retract(agg, empty, "g").collect().map(_.toSeq).toSeq ==
      Seq(Seq("a", 2L, 30L)))
    val neu = Seq(("z", 1L, 4L)).toDF("g", "dn", "dv")
    val got = Incremental.retract(agg, neu, "g").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map("a" -> ((2L, 30L)), "z" -> ((1L, 4L))))
  }
}
