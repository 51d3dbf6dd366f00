package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Content-based (vector) retrieval — the ANN arm.
  *
  * Reference: ChromaDB HNSW cosine top-n (`content_candidates`,
  * `Hybrid_Recom_vecdb.py:172-187`, SURVEY V2/V3). Spark-first mapping:
  * the "index" is a parquet table of (id, embedding[, metadata]); a k-NN
  * query batch is a similarity join + per-query top-k window.
  *
  * Three physical strategies, chosen by scale:
  *  - [[topK]]        exact brute force — O(|Q|·|I|); right answer, and the
  *                    right *plan* when |Q| is small (broadcast the queries,
  *                    no shuffle of the index at all).
  *  - [[topKByLabel]] IVF-style partition pruning — search only the
  *                    query's cell(s); turns O(|Q|·|I|) into
  *                    O(|Q|·|I|/cells·probes).
  *  - [[LshIndex]]    sign-random-projection bucketing (see Lsh.scala) for
  *                    cosine at 100 TB: candidates share a bucket key, so
  *                    the "join" is an equi-join Spark can hash-partition.
  */
object ContentRetriever {

  /** Exact top-k cosine neighbors for each query vector.
    *
    * `queries`: (query_id, q_emb) — assumed small enough to broadcast
    * (the interactive / eval case: 1..10^5 rows). The index side streams:
    * each index partition scans once against the broadcast queries, then a
    * single shuffle on query_id ranks per query. Self-matches are dropped
    * (reference P5, `Hybrid_Recom_vecdb.py:218`).
    */
  def topK(index: DataFrame, queries: DataFrame, k: Int,
           excludeSelf: Boolean = true): DataFrame = {
    val joined = index
      .join(queries.hint("broadcast"))
      .where(if (excludeSelf) col("query_id") =!= col("vec_id") else lit(true))
      .withColumn("sim", cosine(col("q_emb"), col("embedding")))
    rank(joined, k)
  }

  /** IVF-style pruned top-k: only index rows whose `cell` matches the
    * query's `cell` are scored. With C cells this reads |I|/C of the index
    * per query — and when the index is *written partitioned by cell*,
    * partition pruning means the untouched cells are never read at all. */
  def topKByLabel(index: DataFrame, queries: DataFrame, k: Int,
                  cellCol: String = "label"): DataFrame = {
    val joined = index
      .join(queries.hint("broadcast"), Seq(cellCol))
      .where(col("query_id") =!= col("vec_id"))
      .withColumn("sim", cosine(col("q_emb"), col("embedding")))
    rank(joined, k)
  }

  /** Per-query top-k with the deterministic (sim DESC, vec_id ASC) order
    * (SURVEY §7.4 tie rule). */
  private def rank(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
  }
}
