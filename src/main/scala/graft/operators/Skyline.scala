package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): the points not dominated on
  * (minimize x, maximize y) — "cheapest for its capability" product
  * shortlists, cost/recall frontier extraction from a tuning sweep
  * (the q120 nprobe curve is exactly this shape).
  *
  * Point (x,y) is dominated iff some other point has x' ≤ x ∧ y' ≥ y
  * with at least one strict. For distinct (x,y) pairs that reduces to:
  * dominated iff max{y' : x' < x} ≥ y, or a same-x point has y' > y.
  *
  * Spark shape (scale review): snap x to its integer grid, ONE
  * map-side-combinable groupBy(x) keeping max(y) — same-x dominance
  * falls out here, and the frontier candidate set shrinks to |distinct
  * x| — then the strictly-cheaper prefix max runs TWO-PHASE like a
  * distributed prefix sum: a ROWS-frame running max within each
  * fixed-width x-bucket plus a bucket-level prefix max over the (tiny)
  * distinct-bucket frame, broadcast back. No global single-partition
  * window; any value column with a bounded range yields a bounded
  * bucket count at any row count.
  */
object Skyline {

  /** @param xScale snap grid for x (100 = cents)
    * @param bucketWidth prefix-max bucket width in SNAPPED x units
    * @return frontier rows (x, y), x in original units, ascending —
    *         y strictly decreasing along the frontier. */
  def frontier2d(df: DataFrame, xCol: String, yCol: String,
                 xScale: Double = 100.0, bucketWidth: Long = 1000L)
      : DataFrame = {
    val cand = df
      .select(floor(col(xCol) * lit(xScale) + lit(0.5)).cast("long").as("__x"),
        col(yCol).as("__y"))
      .groupBy("__x").agg(max(col("__y")).as("__y"))
      .withColumn("__b", floor(col("__x") / lit(bucketWidth)).cast("long"))
    // phase 1: running max over strictly-cheaper x WITHIN the bucket
    val wLocal = Window.partitionBy("__b").orderBy("__x")
      .rowsBetween(Window.unboundedPreceding, -1)
    // phase 2: prefix max over strictly-earlier BUCKETS (distinct-bucket
    // frame is bounded by x's range / bucketWidth — broadcast-sized)
    val wBucket = Window.orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketMax = cand.groupBy("__b").agg(max(col("__y")).as("__bmax"))
      .select(col("__b"), max(col("__bmax")).over(wBucket).as("__pmax"))
    // greatest() skips NULLs (first row of first bucket has neither a
    // local nor a bucket prefix): NULL prefix = nothing cheaper exists
    val prefixMax = greatest(col("__lmax"), col("__pmax"))
    cand
      .withColumn("__lmax", max(col("__y")).over(wLocal))
      .join(broadcast(bucketMax), Seq("__b"))
      .where(prefixMax.isNull || prefixMax < col("__y"))
      .select((col("__x").cast("double") / lit(xScale)).as("x"),
        col("__y").as("y"))
  }
}
