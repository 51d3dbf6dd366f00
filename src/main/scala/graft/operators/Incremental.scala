package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view discipline
  * that makes 100 TB pipelines affordable: keep per-group MERGEABLE
  * statistics, fold each new partition/day of data into them, and never
  * recompute the world. Correct exactly when merge(stats(A), stats(B))
  * == stats(A ∪ B) — which holds for the algebraic aggregates here
  * (count/sum add; min/max combine) and is what q128's oracle proves:
  * Spark serves the MERGE path, DuckDB recomputes from scratch, and the
  * results must hash-match.
  *
  * Exactness note: sums are order-independent here because the measures
  * are integer-valued doubles (exact at any association); for fractional
  * measures switch the sum to DECIMAL(38,x) as in
  * [[DataQuality.corrMatrix]].
  */
object Incremental {

  /** Mergeable per-group stats: (group, n, sum_v, min_v, max_v). */
  def stats(df: DataFrame, groupCol: String, valCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col(valCol)).as("sum_v"),
        min(col(valCol)).as("min_v"), max(col(valCol)).as("max_v"))

  /** Merge two stats frames over the same group key: one full-outer
    * equi-join on the (already aggregated, small) summaries — the fact
    * data is never touched again. Spark's least/greatest skip nulls, so
    * one-sided groups pass through unchanged. */
  def merge(a: DataFrame, b: DataFrame, groupCol: String): DataFrame = {
    val aa = a.select(col(groupCol), col("n").as("__na"),
      col("sum_v").as("__sa"), col("min_v").as("__mna"),
      col("max_v").as("__mxa"))
    val bb = b.select(col(groupCol), col("n").as("__nb"),
      col("sum_v").as("__sb"), col("min_v").as("__mnb"),
      col("max_v").as("__mxb"))
    aa.join(bb, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col("__na"), lit(0L)) + coalesce(col("__nb"), lit(0L)))
          .as("n"),
        (coalesce(col("__sa"), lit(0.0)) + coalesce(col("__sb"), lit(0.0)))
          .as("sum_v"),
        least(col("__mna"), col("__mnb")).as("min_v"),
        greatest(col("__mxa"), col("__mxb")).as("max_v"))
  }
}
