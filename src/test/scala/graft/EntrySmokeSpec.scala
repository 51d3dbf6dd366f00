package graft

import org.apache.spark.sql.functions._

/** The driver's t1 smoke: flagship hybrid query on sf0.001 returns rows
  * with valid, descending, correctly-blended scores. */
class EntrySmokeSpec extends SparkTestBase {

  test("entry returns >0 rows with scores in [0,1], rnk 1..10 per query") {
    val out = SparkEntry.entry(spark).cache()
    val n = out.count()
    assert(n > 0)
    val bad = out.where(
      col("final") < 0 || col("final") > 1 ||
        col("cs") < 0 || col("cs") > 1 || col("fs") < 0 || col("fs") > 1 ||
        col("rnk") < 1 || col("rnk") > 10)
    assert(bad.count() == 0)
    // rnk order must agree with score order within each query
    val inv = out.as("a").join(out.as("b"),
      col("a.query_id") === col("b.query_id") &&
        col("a.rnk") < col("b.rnk") && col("a.final") < col("b.final"))
    assert(inv.count() == 0)
  }

  test("queries and oracles are in 1:1 correspondence; every plan analyzes") {
    val qs = SparkEntry.queries
    // round-1 verdict: a query without an oracle is untested surface —
    // the sets must be EQUAL, not merely consistent.
    assert(SparkEntry.oracleSql.keySet == qs.keySet,
      s"asymmetric: ${SparkEntry.oracleSql.keySet.diff(qs.keySet)} / ${qs.keySet.diff(SparkEntry.oracleSql.keySet)}")
    qs.foreach { case (_, fn) => fn(spark, sf()).schema } // analyzes the plan
  }
}
