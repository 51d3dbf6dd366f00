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

  /** RETRACTABLE maintenance of the additive pair (n, sum) under a CDC
    * change feed — the incremental-view-maintenance step past [[merge]]:
    * merge only ever ADDS partitions; a delta that deletes or updates
    * rows needs signed contributions. min/max are deliberately absent —
    * they are not retractable (deleting the current min forces a
    * rescan), which is exactly the classic retract-stream rule.
    *
    * `contributions` carries one signed row per delta effect:
    * insert → (+1, +v); delete → (−1, −v_old); update → two rows
    * (−1, −v_old) on the OLD group and (+1, +v_new) on the NEW group,
    * so group-moving updates maintain both sides correctly.
    *
    * Scale: the delta folds to per-group sums first (delta-sized), then
    * ONE full-outer join against the maintained summary — fact data is
    * never rescanned. Groups whose count reaches zero drop out, matching
    * a from-scratch recompute exactly (the q169 law oracle).
    *
    * @param agg maintained (groupCol, n, sum_v)
    * @param contributions (groupCol, dn, dv) signed rows */
  def retract(agg: DataFrame, contributions: DataFrame,
              groupCol: String): DataFrame = {
    val d = contributions.groupBy(col(groupCol))
      .agg(sum(col("dn")).as("__dn"), sum(col("dv")).as("__dv"))
    agg.join(d, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col("n"), lit(0L)) + coalesce(col("__dn"), lit(0L)))
          .as("n"),
        (coalesce(col("sum_v"), lit(0L)) + coalesce(col("__dv"), lit(0L)))
          .as("sum_v"))
      .where(col("n") > 0)
  }
}
