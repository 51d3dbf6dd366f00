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

  test("no declared query surfaces a DECIMAL output column") {
    // Round-6 q124/q152/q157 class: DuckDB's pandas bridge returns
    // DECIMAL(38,0) as float64, so any value beyond 2⁵³ hash-mismatches
    // at the driver while float-tolerant local compares collapse both
    // sides to the same lossy double and pass. Decimals are fine as
    // internal accumulators; the SURFACED column must be BIGINT (fold
    // digests mod 2⁶²) or DOUBLE (snap first).
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      fn(spark, sf()).schema.fields.collect {
        case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType] =>
          s"$name.${f.name}"
      }
    }
    assert(offenders.isEmpty, s"DECIMAL in output: ${offenders.mkString(", ")}")
  }
}
