package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Set-oriented Precision@K evaluation.
  *
  * Reference: `evaluate_hybrid_vs_content` + `precision_at_k`
  * (`Hybrid_Recom_vecdb.py:232-292`) runs a sequential per-query Python
  * loop; here ALL queries × ALL K values are evaluated in one plan
  * (SURVEY §3 E3): ranked recommendations ⋈ ground-truth edges, then
  * hits(K) = count of ranked hits with rnk ≤ K, precision = hits/K.
  *
  * The join on (query_id, item) is a shuffle co-partitioned equi-join;
  * ground truth never needs to be collect()'d into arrays, so the operator
  * scales with |recs| + |gt| regardless of per-query fanout.
  */
object Evaluation {

  /** @param ranked (query_id, item, rnk) — rnk 1-based per query
    * @param truth  (query_id, item)      — ground-truth positives
    * @param ks     K cutoffs, e.g. Seq(10, 20, 30, 40, 50)
    * @return (query_id, k, hits, precision) one row per query per K,
    *         including zero rows for queries with no hits at all.
    */
  def precisionAtK(ranked: DataFrame, truth: DataFrame, ks: Seq[Int]): DataFrame = {
    val kdf = ranked.sparkSession.createDataFrame(
      ks.map(Tuple1(_))).toDF("k")
    val hits = ranked
      .join(truth.select(col("query_id"), col("item")), Seq("query_id", "item"),
        "left_semi")
    ranked.select("query_id").distinct()
      .crossJoin(kdf.hint("broadcast"))
      .join(hits, Seq("query_id"), "left_outer")
      .groupBy(col("query_id"), col("k"))
      .agg(count(when(col("rnk") <= col("k"), 1)).as("hits"))
      .withColumn("precision", col("hits").cast("double") / col("k").cast("double"))
  }

  /** Mean precision per K across queries (reference `np.mean(prec[k])`,
    * SURVEY A9). */
  def meanPrecision(perQuery: DataFrame): DataFrame =
    perQuery.groupBy("k").agg(avg("precision").as("mean_precision"),
      count(lit(1)).as("n_queries"))
}
