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
}
