package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** DCG rank discounts 1/log2(r+1) for r = 1..10, in exact nano-units
    * (round(1e9/log2(r+1))): the discount enters both engines as the
    * SAME integer literal, so DCG/IDCG accumulate as exact longs and
    * NDCG is a single identical double division — no float-summation
    * order anywhere. */
  val DcgNanoWeights: Seq[(Int, Long)] = Seq(
    1 -> 1000000000L, 2 -> 630929754L, 3 -> 500000000L, 4 -> 430676558L,
    5 -> 386852807L, 6 -> 356207187L, 7 -> 333333333L, 8 -> 315464877L,
    9 -> 301029996L, 10 -> 289064826L)

  /** Graded ranking metrics at K=10 with binary relevance — the
    * evaluation triple Precision@K (above) doesn't cover:
    * NDCG@10 (rank-position-weighted), MRR (first-hit reciprocal rank)
    * and Recall@10 (coverage of the truth set).
    *
    * @param ranked (query_id, item, rnk) — rnk 1-based, rnk <= 10
    * @param truth  (query_id, item)      — ground-truth positives
    * @return (query_id, n_rel, ndcg10, mrr, recall10), one row per
    *         query that appears in `ranked`; metrics are 0 when the
    *         query has no ground truth.
    */
  def rankMetrics(ranked: DataFrame, truth: DataFrame): DataFrame = {
    val spark = ranked.sparkSession
    val wtab = spark.createDataFrame(DcgNanoWeights).toDF("rnk", "w_n")
    val nrel = truth.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    // ideal DCG for a truth set of size n: prefix sum of the first
    // min(n, 10) discounts — a 10-row broadcast against n_rel
    val ideal = spark.createDataFrame(
      DcgNanoWeights.scanLeft(0 -> 0L) { case ((_, acc), (r, w)) => r -> (acc + w) }
        .tail).toDF("n_cap", "idcg_n")
    val rel = ranked
      .join(wtab.hint("broadcast"), Seq("rnk"))
      .join(truth.select(col("query_id"), col("item"), lit(1).as("__hit")),
        Seq("query_id", "item"), "left")
    val perQuery = rel.groupBy("query_id")
      .agg(sum(when(col("__hit") === 1, col("w_n")).otherwise(0L)).as("dcg_n"),
        min(when(col("__hit") === 1, col("rnk"))).as("first_hit"),
        count(when(col("__hit") === 1, 1)).as("n_hits"))
    perQuery
      .join(nrel, Seq("query_id"), "left")
      .withColumn("n_rel", coalesce(col("n_rel"), lit(0L)))
      .withColumn("n_cap", least(col("n_rel"), lit(10L)).cast("int"))
      .join(ideal.hint("broadcast"), Seq("n_cap"), "left")
      .select(col("query_id"), col("n_rel"),
        when(col("n_rel") === 0, lit(0.0))
          .otherwise(round(col("dcg_n").cast("double") / col("idcg_n"), 6))
          .as("ndcg10"),
        coalesce(round(lit(1.0) / col("first_hit"), 6), lit(0.0)).as("mrr"),
        when(col("n_rel") === 0, lit(0.0))
          .otherwise(round(col("n_hits").cast("double") / col("n_rel"), 6))
          .as("recall10"))
  }

  /** ROC AUC per query via the Mann-Whitney rank-sum — the
    * threshold-free discrimination metric the Precision@K / NDCG family
    * doesn't cover: does the scorer rank ANY positive above ANY negative?
    *
    * AUC = (Σ_pos avgrank − n_pos(n_pos+1)/2) / (n_pos · n_neg), with the
    * tie-corrected average rank. All rank arithmetic stays integral
    * (2·avgrank = 2·minrank + ties − 1), so the metric is one exact
    * integer expression divided once at the end — no float accumulation
    * anywhere, hence bit-reproducible across engines and partitionings.
    *
    * Shape: one exchange on query_id, two windows (rank + tie count) over
    * it, one aggregate. A query's candidate list sorts within its
    * partition and spills if huge; nothing buffers per-query state.
    * Queries with no positives or no negatives report NULL (AUC is
    * undefined there), never a fake 0.5.
    *
    * @param scored (query_id, item, score) — every scored candidate,
    *               positives and negatives together
    * @param truth  (query_id, item) ground-truth positives
    */
  def auc(scored: DataFrame, truth: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy(col("score").asc)
    val tiew = Window.partitionBy("query_id", "score")
    val lab = scored
      .join(truth.select(col("query_id"), col("item"), lit(1L).as("__pos")),
        Seq("query_id", "item"), "left")
      .withColumn("__pos", coalesce(col("__pos"), lit(0L)))
      .withColumn("__two_avg",
        lit(2L) * rank().over(w) + count(lit(1)).over(tiew) - lit(1L))
    lab.groupBy("query_id")
      .agg(sum(col("__pos")).as("n_pos"),
        (count(lit(1)) - sum(col("__pos"))).as("n_neg"),
        sum(when(col("__pos") === 1L, col("__two_avg"))).as("__s2"))
      .select(col("query_id"), col("n_pos"), col("n_neg"),
        when(col("n_pos") === 0L || col("n_neg") === 0L, lit(null))
          .otherwise(round(
            (col("__s2") - col("n_pos") * (col("n_pos") + lit(1L)))
              .cast("double") /
              (lit(2.0) * col("n_pos") * col("n_neg")), 6))
          .cast("double").as("auc"))
  }

  /** Calibration / reliability table: does a score of ~0.8 mean an ~80%
    * hit rate? Scores bin into `nBins` equal-frequency buckets (exact
    * ntile over the (score, query_id, item) total order — deterministic
    * on any engine), and each bin reports its exact positive rate next
    * to its mean predicted score. A well-calibrated scorer tracks the
    * diagonal; the hybrid blend (a heuristic mix) typically does not —
    * which is precisely what this audit exposes before anyone treats
    * `final` as a probability.
    *
    * Exactness: positives are integer counts; the mean score fixed-point
    * sums 1e-6-snapped micro-units (exact longs) with ONE double
    * division per bin. Global ntile = single-partition sort: fine for
    * eval-sized pools (|Q|·depth rows); shard by query block for more.
    *
    * @param scored (query_id, item, score)
    * @param truth  (query_id, item) positives
    * @return (bin, n, n_pos, avg_score, pos_rate) — one row per bin.
    */
  /** Catalog coverage and Gini concentration of a recommendation
    * surface — the health metrics that catch a recommender collapsed
    * onto its head items (high precision, three products): coverage =
    * fraction of the catalog recommended at all; Gini over per-item
    * recommendation counts (0 = every recommended item shown equally,
    * →1 = all traffic on one item).
    *
    * Exactness: counts are longs; the Gini rank-weighted sum
    * Σ rank·cnt accumulates as DECIMAL(38,0) over the per-item frame
    * (rank by (cnt, item) — a total order both engines replay), and
    * G = (2·Σ rank·cnt)/(m·Σcnt) − (m+1)/m is a fixed handful of double
    * ops rounded to 6 dp. The ranked window runs over the per-ITEM
    * count frame — dimension-sized, not traffic-sized.
    *
    * @param recs one row per recommendation impression
    * @param catalog the full item dimension (for the coverage base)
    * @return one row: (catalog_n, rec_items, total_recs, coverage, gini). */
  def coverageGini(recs: DataFrame, itemCol: String,
                   catalog: DataFrame, catalogItemCol: String): DataFrame = {
    val counts = recs.groupBy(col(itemCol).as("item"))
      .agg(count(lit(1)).as("cnt"))
    val ranked = counts.withColumn("rnk",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("cnt"), col("item"))))
    val g = ranked.agg(count(lit(1)).as("rec_items"),
      sum(col("cnt")).as("total_recs"),
      sum((col("rnk").cast("decimal(38,0)") * col("cnt").cast("decimal(38,0)"))
        .cast("decimal(38,0)")).as("__rw"))
    g.crossJoin(broadcast(
        catalog.agg(count(lit(1)).as("catalog_n"))))
      .select(col("catalog_n"), col("rec_items"), col("total_recs"),
        round(col("rec_items").cast("double") / col("catalog_n").cast("double"),
          6).as("coverage"),
        round(lit(2.0) * col("__rw").cast("double")
          / (col("rec_items").cast("double") * col("total_recs").cast("double"))
          - (col("rec_items").cast("double") + 1.0)
            / col("rec_items").cast("double"), 6).as("gini"))
  }

  /** Intra-list diversity (ILD) of a recommendation surface — the
    * beyond-accuracy metric that catches a precise-but-monotone
    * recommender (ten near-identical items score high on Precision@K
    * and are still a bad page): per query, the mean pairwise cosine
    * DISTANCE among the items actually shown.
    *
    * Shape: the pairwise expansion is per-LIST — k(k−1)/2 rows per
    * query at list length k (45 at k=10), never a corpus-level pair
    * join — then two shuffle equi-joins decorate both pair ends with
    * their embeddings and one per-query aggregate folds the mean.
    * Work is O(|Q|·k²) with dimension-sized joins: this survives any
    * corpus size because nothing touches item×item.
    *
    * Determinism: each pair's cosine rounds to 6 dp before the mean
    * (identical doubles enter the fold in both engines), mean rounds
    * at 6 dp on output.
    *
    * @param ranked (query_id, item, rnk) — the served top-k lists
    * @param emb    frame with the item id and embedding array
    * @return (query_id, n_pairs, ild) — ild = mean 1−cos at 6 dp */
  def intraListDiversity(ranked: DataFrame, emb: DataFrame, idCol: String,
                         embCol: String): DataFrame = {
    val v = emb.select(col(idCol).as("item"),
      graft.functions.VectorFunctions.asDouble(col(embCol)).as("v"))
    val a = ranked.select(col("query_id"), col("item").as("ia"),
      col("rnk").as("ra"))
    val b = ranked.select(col("query_id"), col("item").as("ib"),
      col("rnk").as("rb"))
    a.join(b, Seq("query_id")).where(col("ra") < col("rb"))
      .join(v.select(col("item").as("ia"), col("v").as("va")), Seq("ia"))
      .join(v.select(col("item").as("ib"), col("v").as("vb")), Seq("ib"))
      .withColumn("d", lit(1.0) - round(
        graft.functions.VectorFunctions.cosine(col("va"), col("vb")), 6))
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_pairs"), round(avg(col("d")), 6).as("ild"))
  }

  def reliabilityBins(scored: DataFrame, truth: DataFrame,
                      nBins: Int = 10): DataFrame = {
    val flagged = scored.join(
      truth.select(col("query_id"), col("item"))
        .dropDuplicates("query_id", "item").withColumn("__pos", lit(1)),
      Seq("query_id", "item"), "left_outer")
    val w = Window.partitionBy()
      .orderBy(col("score").asc, col("query_id").asc, col("item").asc)
    flagged.withColumn("bin", ntile(nBins).over(w))
      .withColumn("__s", floor(col("score") * lit(1e6) + lit(0.5)).cast("long"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(coalesce(col("__pos"), lit(0))).as("n_pos"),
        sum(col("__s")).as("__ss"))
      .select(col("bin"), col("n"), col("n_pos"),
        (col("__ss").cast("double") / (lit(1e6) * col("n").cast("double")))
          .as("avg_score"),
        (col("n_pos").cast("double") / col("n").cast("double")).as("pos_rate"))
  }
}
