package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A/B experiment readout with CUPED variance reduction (Deng et al.,
  * WSDM'13): adjust each unit's post-period metric y by its pre-period
  * covariate x — y' = y − θ·(x − x̄), θ = cov(x,y)/var(x) — removing the
  * between-user variance both arms share, which is what lets an
  * experiment platform call smaller lifts at the same traffic.
  *
  * Exactness: inputs arrive as pre-snapped integer units (cents), so
  * all sufficient statistics (n, Σx, Σy, Σx², Σxy, per-arm sums) are
  * DECIMAL(38,0)-exact and partition-invariant; θ, x̄ and the per-arm
  * means are a fixed handful of double ops both engines replay
  * bit-identically.
  *
  * Scale: one groupBy(unit) over the event stream (the only big-data
  * step, map-side combinable), then everything runs on |units| rows and
  * two tiny aggregates broadcast into the two-row readout.
  */
object Experiment {

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  /** @param perUnit (arm, xs, ys) — integer-unit pre/post metrics
    * @param displayScale divide-out for the final means (100 = cents)
    * @return one row per arm: (arm, n_units, mean_y, adj_mean, theta) */
  def cuped(perUnit: DataFrame, displayScale: Double = 100.0): DataFrame = {
    // Widen to DECIMAL(38,0) BEFORE multiplying: a LONG product of
    // unbounded per-unit cent sums would wrap silently past ~3e9 units
    // while the oracle's HUGEINT product stays exact (round-5 advice).
    val g = perUnit.agg(dec(count(lit(1))).as("n"),
      sum(dec(col("xs"))).as("sx"), sum(dec(col("ys"))).as("sy"),
      sum((dec(col("xs")) * dec(col("xs"))).cast("decimal(38,0)")).as("sxx"),
      sum((dec(col("xs")) * dec(col("ys"))).cast("decimal(38,0)")).as("sxy"))
    val th = g.select(
      ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
        .as("theta"),
      (col("sx").cast("double") / col("n").cast("double")).as("xbar"))
    val arms = perUnit.groupBy("arm")
      .agg(count(lit(1)).as("n_units"),
        sum(col("xs")).as("sax"), sum(col("ys")).as("say"))
    arms.crossJoin(broadcast(th))
      .select(col("arm"), col("n_units"),
        ((col("say").cast("double") / col("n_units").cast("double")) /
          lit(displayScale)).as("mean_y"),
        (((col("say").cast("double") / col("n_units").cast("double")) -
          col("theta") *
            ((col("sax").cast("double") / col("n_units").cast("double")) -
              col("xbar"))) / lit(displayScale)).as("adj_mean"),
        col("theta"))
  }
}
