package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group ordinary least squares — the segmented trend fit an
  * analytics pipeline runs per region/segment/cohort (price elasticity
  * per segment, growth slope per cohort): y = slope·x + intercept
  * minimizing squared error within each group.
  *
  * Exactness: inputs snap to integers (`xScale`/`yScale`) BEFORE
  * aggregation, so all five sufficient statistics (n, Σx, Σy, Σxy, Σx²)
  * accumulate as DECIMAL(38,0) — exact at any row count, any partition
  * order — and the closed forms
  *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
  *   intercept = (Σy − slope·Σx) / n
  * are a fixed handful of double ops both engines replay bit-identically
  * (the corrMatrix/CUPED discipline; Spark's `regr_slope` accumulates
  * doubles and is partition-order-dependent — unusable for an oracle-
  * gated audit). Products widen to decimal BEFORE multiplying.
  *
  * Scale: one map-side-combinable groupBy — the same shape at 60k rows
  * and 100 TB. Degenerate groups (n < 2 or zero x-variance) emit NULL
  * slope/intercept rather than a division artifact.
  */
object Regression {

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  /** @return (groupCol, n, slope, intercept), slope/intercept rounded
    *         to 6 dp in y-units-per-x-unit / y-units. */
  def groupedOls(df: DataFrame, groupCol: String, xCol: String, yCol: String,
                 xScale: Double = 1.0, yScale: Double = 100.0): DataFrame = {
    val xi = floor(col(xCol) * lit(xScale) + lit(0.5)).cast("long")
    val yi = floor(col(yCol) * lit(yScale) + lit(0.5)).cast("long")
    val g = df.select(col(groupCol), xi.as("__x"), yi.as("__y"))
      .groupBy(groupCol)
      .agg(dec(count(lit(1))).as("__n"),
        sum(dec(col("__x"))).as("__sx"), sum(dec(col("__y"))).as("__sy"),
        sum((dec(col("__x")) * dec(col("__y"))).cast("decimal(38,0)"))
          .as("__sxy"),
        sum((dec(col("__x")) * dec(col("__x"))).cast("decimal(38,0)"))
          .as("__sxx"))
    val denom = (col("__n") * col("__sxx") - col("__sx") * col("__sx"))
      .cast("double")
    val slope = when(col("__n") >= 2 && denom =!= 0.0,
      (col("__n") * col("__sxy") - col("__sx") * col("__sy")).cast("double")
        / denom * lit(xScale / yScale))
    val intercept = when(slope.isNotNull,
      (col("__sy").cast("double") / col("__n").cast("double") / lit(yScale))
        - slope * (col("__sx").cast("double") / col("__n").cast("double")
          / lit(xScale)))
    g.select(col(groupCol), col("__n").cast("long").as("n"),
      round(slope, 6).as("slope"), round(intercept, 6).as("intercept"))
  }
}
