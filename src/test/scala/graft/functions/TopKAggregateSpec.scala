package graft.functions

import graft.SparkTestBase
import graft.functions.expressions.TopKAggregate.collectTopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the `collect_top_k` convention [[graft.operators.Ivf.knnJoin]]
  * stands on: reverse = false keeps the k LARGEST child values and eval
  * returns them sorted DESCENDING, so `struct(sim, -id)` reproduces the
  * (sim DESC, id ASC) order of the `row_number() <= k` window it
  * replaces — including duplicate-sim tie groups and groups smaller
  * than k. */
class TopKAggregateSpec extends SparkTestBase {
  import spark.implicits._

  private val rows = Seq(
    // (group, id, sim) — group 1 has a 3-way sim tie; group 2 has < k rows
    (1L, 10L, 0.9), (1L, 11L, 0.7), (1L, 12L, 0.7), (1L, 13L, 0.7),
    (1L, 14L, 0.5), (1L, 15L, 0.95),
    (2L, 20L, 0.1), (2L, 21L, 0.3)
  ).toDF("g", "id", "sim")

  private def viaTopK(k: Int) = rows
    .groupBy("g")
    .agg(collectTopK(struct(col("sim"), (-col("id")).as("nid")), k,
      reverse = false).as("tk"))
    .select(col("g"), posexplode(col("tk")).as(Seq("p", "e")))
    .select(col("g"), (-col("e.nid")).as("id"), col("e.sim"),
      (col("p") + 1).cast("int").as("rnk"))

  private def viaWindow(k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("sim").desc, col("id").asc)
    rows.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select("g", "id", "sim", "rnk")
  }

  test("reverse=false == (sim DESC, id ASC) row_number window, ties and " +
    "short groups included") {
    for (k <- Seq(1, 3, 4, 10)) {
      val a = viaTopK(k).orderBy("g", "rnk").collect().toSeq
      val b = viaWindow(k).orderBy("g", "rnk").collect().toSeq
      assert(a == b, s"k=$k: collect_top_k disagrees with the window\n" +
        s"topk:   $a\nwindow: $b")
    }
  }

  test("plan aggregates with ObjectHashAggregate — no sort of the input") {
    val df = viaTopK(3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"expected ObjectHashAggregate:\n$plan")
    assert(!plan.contains("WindowGroupLimit"), s"window crept back:\n$plan")
  }

  test("perGroupTopK rejects a non-numeric id column with a clear error " +
    "(negation of a string would silently NULL every output id)") {
    val df = Seq((1L, "a", 0.9), (1L, "b", 0.8)).toDF("g", "id", "sim")
    val e = intercept[IllegalArgumentException] {
      expressions.TopKAggregate.perGroupTopK(df, "g", "id", "sim", 1)
    }
    assert(e.getMessage.contains("must be numeric"))
  }

  test("ord column literally named 'nid' does not collide with the tie " +
    "field (both struct fields use reserved names)") {
    val df = Seq((1L, 10L, 0.9), (1L, 11L, 0.7), (2L, 20L, 0.1))
      .toDF("g", "id", "nid")
    val got = expressions.TopKAggregate.perGroupTopK(df, "g", "id", "nid", 1)
      .orderBy("g").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(got == Seq((1L, 10L, 0.9, 1), (2L, 20L, 0.1, 1)))
  }

  test("session fallback floor: perGroupTopK raises the conf to at least " +
    "FallbackThresholdFloor, and an unbounded collect_set aggregate with " +
    "more groups than the OLD default (128) stays correct under it") {
    // trigger the documented side effect; the contract is "never lowers,
    // raises to AT LEAST the floor" (ADVICE r12: an exact-equality
    // assert was order-dependent on any earlier test/bench raising the
    // shared session's conf above the floor)
    expressions.TopKAggregate.perGroupTopK(rows, "g", "id", "sim", 2).collect()
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    assert(spark.conf.get(key).toLong >=
      expressions.TopKAggregate.FallbackThresholdFloor)
    // blast-radius check: collect_set over 1000 groups (≫ the 128-key
    // valve the floor displaces) in the SAME session — results exact
    val many = spark.range(5000)
      .select((col("id") % 1000).as("g"),
        floor(col("id") / 1000).cast("long").as("v"))
    val sets = many.groupBy("g").agg(collect_set(col("v")).as("s"))
      .select(col("g"), size(col("s")).as("n"),
        aggregate(col("s"), lit(0L), _ + _).as("sum"))
      .collect()
    assert(sets.length == 1000)
    assert(sets.forall(r => r.getInt(1) == 5 && r.getLong(2) == 10L))
  }
}
