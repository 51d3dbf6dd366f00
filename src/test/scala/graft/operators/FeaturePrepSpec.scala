package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The window-rank percentile must be BIT-EQUAL to Spark's own exact
  * `percentile()` aggregate (which is itself oracle-proven against
  * DuckDB quantile_cont in q49), plus clamp semantics. */
class FeaturePrepSpec extends SparkTestBase {

  import spark.implicits._

  test("percentileBounds == percentile() aggregate, bit-exact, all group sizes") {
    // group sizes 1..40 incl. frac=0 positions (n where p*(n-1) is whole)
    val rows = for (g <- 1 to 40; i <- 1 to g)
      yield (g.toLong, math.sin(g * 31 + i * 7) * 100.0)
    val df = rows.toDF("g", "v")
    val ours = FeaturePrep.percentileBounds(df, "g", "v", 0.25, 0.9)
    val ref = df.groupBy("g").agg(
      expr("percentile(v, 0.25)").as("rlo"), expr("percentile(v, 0.9)").as("rhi"))
    val bad = ours.join(ref, Seq("g"))
      .where(col("__lo") =!= col("rlo") || col("__hi") =!= col("rhi"))
    assert(bad.count() == 0)
  }

  test("winsorize clamps outliers and flags exactly the out-of-range rows") {
    val df = ((1 to 99).map(i => (1L, i.toLong, i.toDouble)) :+ ((1L, 100L, 1e9)))
      .toDF("g", "id", "v")
    val out = FeaturePrep.winsorize(df, "g", "v", 0.01, 0.9, Seq("id"))
    val clipped = out.where(col("clipped")).select("id").collect().map(_.getLong(0)).toSet
    // p90 of 1..99,1e9 is ~90.1; p01 ~1.99: ids 1, 91..100 fall outside
    assert(clipped.contains(100L) && clipped.contains(1L))
    val vw = out.where(col("id") === 100L).select("value_w").collect()(0).getDouble(0)
    assert(vw < 1000.0, s"outlier must be capped, got $vw")
    val mid = out.where(col("id") === 50L).collect()(0)
    assert(!mid.getBoolean(mid.fieldIndex("clipped")))
    assert(mid.getDouble(mid.fieldIndex("value_w")) == 50.0)
  }
}
