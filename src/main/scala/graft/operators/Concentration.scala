package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inequality / market-concentration measures over grouped value frames —
  * the "how skewed is this revenue / token / traffic distribution"
  * questions a curation or monetization pipeline asks of a lake.
  *
  * Both statistics are EXACT-integer folds with one final double
  * division, so the DuckDB oracle replays them bit-for-bit (the repo's
  * cross-engine contract): every sum runs in DECIMAL(38,0) (HUGEINT on
  * the oracle side), and the only floating-point op is the last
  * `exact::DOUBLE / exact::DOUBLE` both engines evaluate identically.
  *
  * Reference anchor: the reference's popularity analysis is a pandas
  * `value_counts` bar chart (Hybrid_Recom_vecdb.py:137-146) — these are
  * the quantified, engine-side replacements.
  *
  * Scale: Gini needs a per-group rank, so the sort is WITHIN each group
  * partition (|units|/|groups| rows per frame — Window.partitionBy, the
  * same grouped-window shape q106/q151 use; a single global Gini at
  * lake scale should route through the grouped form with a coarse
  * group, or a two-phase range-partitioned rank). HHI has no rank at
  * all: two hash aggregations, both with map-side partial combine.
  */
object Concentration {

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  /** Per-group Gini coefficient of `valueCol` (non-negative integer
    * units, e.g. cents) across the units keyed by `keyCol`.
    *
    * Rank form: G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) with x_(i)
    * ascending. Σ i·x_i is invariant under permutations of tied values,
    * so the `keyCol` tiebreak is for plan determinism only, not the
    * result. Σ i·x_i ≤ n²·max(x) stays inside DECIMAL(38,0) for any
    * realistic lake (10^11 units × 10^9 cents → 10^31).
    *
    * @return (group, n_units, sum_value, gini) — gini at 6 dp. */
  def giniBy(df: DataFrame, groupCol: String, keyCol: String,
             valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol), col(keyCol))
    giniFromRanked(df.withColumn("__i", row_number().over(w)),
      Seq(groupCol), valueCol)
  }

  /** THE rank-form moment fold both Gini forms share — one definition
    * so a precision or formula change can never desynchronize the
    * grouped and global paths (ConcentrationSpec asserts them
    * bit-equal). Expects a `__i` ascending-rank column. */
  private def giniFromRanked(ranked: DataFrame, groupCols: Seq[String],
                             valueCol: String): DataFrame = {
    val g = (if (groupCols.isEmpty) ranked.groupBy()
             else ranked.groupBy(groupCols.map(col): _*))
      .agg(count(lit(1)).as("n_units"),
        sum(dec(col(valueCol))).as("__s"),
        sum(dec(col("__i")) * dec(col(valueCol))).as("__t"))
    g.select(groupCols.map(col) ++ Seq(col("n_units"),
      col("__s").cast("long").as("sum_value"),
      round(
        (lit(2) * col("__t") - dec(col("n_units") + 1) * col("__s"))
          .cast("double")
          / (col("n_units").cast("double") * col("__s").cast("double")),
        6).as("gini")): _*)
  }

  /** GLOBAL Gini without the single-partition window [[giniBy]] would
    * need for one worldwide group: the two-phase distributed exact
    * rank. Values range-partition on (value, key) and sort within
    * partitions — a spillable distributed sort — and `zipWithIndex`
    * assigns the global ordinal with one extra (cheap) count job; no
    * task ever holds more than its own range slice. The moments then
    * fold exactly as in [[giniBy]].
    *
    * The RDD hop is deliberate: Spark has no global-ordinal SQL
    * primitive that avoids funneling all rows through one window
    * partition, and `zipWithIndex` over a range-sorted frame IS the
    * canonical two-phase rank (per-partition counts → offsets →
    * local index + offset).
    *
    * @return one row: (n_units, sum_value, gini) — gini at 6 dp. */
  def giniGlobal(df: DataFrame, keyCol: String, valueCol: String)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = df
      .select(col(valueCol).cast("long").as("v"),
        col(keyCol).cast("long").as("k"))
      .repartitionByRange(col("v"), col("k"))
      .sortWithinPartitions(col("v"), col("k"))
    val ranked = sorted.as[(Long, Long)].rdd.zipWithIndex
      .map { case ((v, _), i) => (v, i + 1L) } // ascending rank, 1-based
      .toDF("v", "__i")
    giniFromRanked(ranked, Seq.empty, "v")
  }

  /** Per-group Herfindahl–Hirschman index: Σ sᵢ² over the value shares
    * sᵢ of the units in the group, computed as Σxᵢ² / (Σx)² so the
    * numerator folds exactly (xᵢ² ≤ 10^26 per unit; the sum stays in
    * DECIMAL(38,0) up to 10^12 units). 1/n = perfect competition,
    * 1.0 = monopoly.
    *
    * @return (group, n_units, sum_value, hhi) — hhi at 6 dp. */
  def hhiBy(df: DataFrame, groupCol: String, unitCol: String,
            valueCol: String): DataFrame =
    df.groupBy(col(groupCol), col(unitCol))
      .agg(sum(dec(col(valueCol))).as("__x"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_units"),
        sum(col("__x")).as("__s"),
        sum(col("__x") * col("__x")).as("__q"))
      .select(col(groupCol), col("n_units"),
        col("__s").cast("long").as("sum_value"),
        round(col("__q").cast("double")
          / (col("__s").cast("double") * col("__s").cast("double")), 6)
          .as("hhi"))
}
