package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid fusion — the load-bearing operator of the reference.
  *
  * Reference: `recommend_hybrid` (`Hybrid_Recom_vecdb.py:213-231`):
  * candidate union of the content and CF arms, score
  * α·content + (1−α)·cf with a missing arm contributing 0.0, sort desc,
  * take k (SURVEY J4 + P8 + A4).
  *
  * Spark shape: FULL OUTER equi-join on (query_id, item) + coalesce — the
  * exact relational rendering of "union of keys with dict.get(default 0)".
  * Both inputs arrive already partitioned by query_id from their windows,
  * so AQE usually turns this into a shuffle-free sort-merge or, for small
  * candidate sets, a broadcast join.
  */
object HybridScorer {

  /** @param content (query_id, item, cs)   content-arm scores in [0,1]
    * @param cf      (query_id, item, fs)   CF-arm normalized scores (0,1]
    * @param alpha   content weight α ∈ [0,1] (reference default 0.6,
    *                `Hybrid_Recom_vecdb.py:25`)
    * @param k       final cutoff (reference default 10)
    * @return (query_id, item, cs, fs, final, rnk) — cs/fs zero-filled,
    *         final = α·cs + (1−α)·fs, rnk 1..k per query with the
    *         deterministic (final DESC, item ASC) tie order.
    */
  def blend(content: DataFrame, cf: DataFrame, alpha: Double, k: Int): DataFrame = {
    val fused = content
      .join(cf, Seq("query_id", "item"), "full_outer")
      .select(
        col("query_id"), col("item"),
        coalesce(col("cs"), lit(0.0)).as("cs"),
        coalesce(col("fs"), lit(0.0)).as("fs"))
      .withColumn("final",
        lit(alpha) * col("cs") + lit(1.0 - alpha) * col("fs"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("final").desc, col("item").asc)
    fused.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
  }
}
