package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Collaborative-filtering candidate generation.
  *
  * Reference: `cf_candidates` (`Hybrid_Recom_vecdb.py:189-198`) — the
  * query item's neighbors, max-normalized, top-n by weight (SURVEY A2/A3).
  * The reference loops per query; here ALL queries are answered in one
  * set-oriented plan (SURVEY §3 E3 note): a single window over the
  * (already src-partitioned) normalized edge list.
  *
  * Tie-break: the reference inherits Python's insertion-order-stable
  * `Counter.most_common`; we impose the explicit total order
  * (weight DESC, dst ASC) so results are deterministic (SURVEY §7.4).
  */
object CfRetriever {

  /** Top-n neighbors per source with normalized scores.
    * Output: (src, dst, weight, norm, rnk), rnk in 1..n.
    *
    * Rank FIRST (WindowGroupLimit prunes to n rows per source inside the
    * sort), normalize after: the rank-1 row's weight IS the per-source
    * max, so the normalize window runs over n·|sources| surviving rows
    * instead of the full adjacency — same values, one full-size window
    * pass less. */
  def topN(edges: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy("src")
      .orderBy(col("weight").desc, col("dst").asc)
    edges
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= n)
      .withColumn("norm", col("weight").cast("double") /
        max(col("weight")).over(Window.partitionBy("src")).cast("double"))
      .select("src", "dst", "weight", "norm", "rnk")
  }

  /** Candidates for a restricted query set only. The filter is applied
    * BEFORE the window so Catalyst pushes it into the scan and the window
    * only sorts the surviving groups — at 100 TB this is the difference
    * between windowing the whole graph and windowing q rows × fanout. */
  def topNFor(edges: DataFrame, queries: DataFrame, n: Int): DataFrame =
    topN(edges.join(queries.hint("broadcast").select(col("query_id").as("src")),
      Seq("src"), "left_semi"), n)

  /** Skew-safe [[topN]]: a hot source (10^8 neighbors on one key) makes
    * the single window partition the straggler. Two-phase salted top-n
    * is EXACTLY equal to the plain top-n — any row in the global top-n
    * ranks ≤ n inside its salt group too, so phase 1 (top-n within
    * (src, salt), `salts`-way parallel) never discards a winner, and
    * phase 2 ranks the ≤ salts·n survivors per src. Normalization then
    * runs on survivors exactly as in [[topN]] (rank-1 weight = group
    * max, preserved because phase 1 keeps every group's best rows). */
  def topNSalted(edges: DataFrame, n: Int, salts: Int): DataFrame = {
    val salted = edges.withColumn("__salt", pmod(crc32(col("dst").cast("string")), lit(salts)))
    val w1 = Window.partitionBy("src", "__salt")
      .orderBy(col("weight").desc, col("dst").asc)
    val survivors = salted
      .withColumn("__r1", row_number().over(w1))
      .where(col("__r1") <= n)
      .drop("__salt", "__r1")
    topN(survivors, n)
  }
}
