package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Isotonic score calibration — pool-adjacent-violators (PAV) with EXACT
  * integer arithmetic.
  *
  * q122's reliability audit shows the hybrid blend's scores are not
  * probabilities; isotonic regression is the standard non-parametric fix
  * (Zadrozny & Elkan, KDD'02): fit the monotone step function minimizing
  * squared error to the (score, label) pairs, then read calibrated
  * probabilities off the steps.
  *
  * Determinism: with binary labels every pool mean is a RATIONAL
  * n_pos/n, so PAV's merge comparisons run in exact long cross-products
  * (p₁·c₂ ≥ p₂·c₁) — no float enters until the single output division.
  * The fitted function is the unique L2 projection onto the monotone
  * cone, so it equals the closed-form max-min characterization
  *   fitted(k) = max_{i≤k} min_{j≥k} avg(y[i..j])
  * — which is what the DuckDB oracle computes pairwise; correctly-rounded
  * double division is monotone in the rationals, so both renderings emit
  * identical doubles.
  *
  * Scale (the q184 two-phase pattern applied to PAV): ties pre-pool by
  * score (one shuffle), then
  *   phase 1 — range-partition the distinct-score blocks so each task
  *     holds a CONTIGUOUS score range, sort within partitions
  *     (distributed sort — no single-task sort of all scores), and run
  *     PAV locally: each task's stack sees O(distinct/partitions)
  *     blocks and emits its surviving pools;
  *   phase 2 — one small task stack-merges the per-partition POOL
  *     summaries in score order. PAV is confluent (repeatedly merging
  *     any adjacent violating pair reaches the same unique fixpoint),
  *     so local-PAV-then-merge ≡ global PAV, and pools after local PAV
  *     are typically ≪ distinct scores;
  *   phase 3 — the merged fitted value equi-joins back to the phase-1
  *     per-score rows on (partition, local pool id).
  * The sequential stage therefore processes pool summaries, never the
  * raw score list; calibration sets remain eval-sized by contract, but
  * the shape now survives a cardinality blow-up.
  *
  * @return one row per distinct score: (score, n, n_pos, fitted),
  *         fitted non-decreasing in score.
  */
object Calibrate {

  final case class IsoBlock(score: Double, n: Long, n_pos: Long,
                            fitted: Double)

  /** Phase-1 row: a distinct score tagged with its local pool.
    * (Public: Spark's codegen instantiates it from generated Java.) */
  final case class LocalPooled(pid: Int, pool: Int, score: Double,
                               n: Long, n_pos: Long)

  /** Phase-1 pool summary (one per surviving local pool). */
  final case class PoolSum(pid: Int, pool: Int, c: Long, p: Long)

  /** Exact PAV over score-ordered (c, p) blocks: returns the pool index
    * assigned to each input block plus the surviving pools' (c, p).
    * Merge test is the exact cross-product p₁·c₂ ≥ p₂·c₁. */
  private def pav(arr: Array[(Long, Long)]): (Array[Int], Array[(Long, Long)]) = {
    // stack entries: (c, p, nBlocks)
    val st = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    arr.foreach { case (c, p) =>
      var cur = (c, p, 1)
      while (st.nonEmpty &&
        st.last._2 * cur._1 >= cur._2 * st.last._1) {
        val t = st.remove(st.length - 1)
        cur = (t._1 + cur._1, t._2 + cur._2, t._3 + cur._3)
      }
      st += cur
    }
    val poolOf = new Array[Int](arr.length)
    var idx = 0
    st.zipWithIndex.foreach { case ((_, _, nb), k) =>
      (0 until nb).foreach { _ => poolOf(idx) = k; idx += 1 }
    }
    (poolOf, st.map(t => (t._1, t._2)).toArray)
  }

  def isotonic(scored: DataFrame, scoreCol: String,
               labelCol: String): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val blocks = scored.groupBy(col(scoreCol).cast("double").as("score"))
      .agg(count(lit(1)).as("n"), sum(col(labelCol).cast("long")).as("n_pos"))

    // Phase 1 — contiguous ranges, local sort, local PAV. The range
    // boundaries are sampled (non-deterministic across runs) but PAV's
    // confluence makes the FINAL fitted values split-invariant.
    val parts = math.max(2, spark.sessionState.conf.numShufflePartitions)
    val local = blocks.repartitionByRange(parts, col("score"))
      .sortWithinPartitions("score")
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        val arr = it.map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
          .toArray // already score-sorted by sortWithinPartitions
        val (poolOf, _) = pav(arr.map(t => (t._2, t._3)))
        arr.iterator.zipWithIndex.map { case ((s, c, p), i) =>
          LocalPooled(pid, poolOf(i), s, c, p)
        }
      }.persist(StorageLevel.MEMORY_AND_DISK)

    // Phase 2 — stack-merge the pool summaries in (pid, pool) order in
    // ONE small task: input is pools-after-local-PAV, not raw scores.
    val pools = local.groupByKey(b => (b.pid, b.pool))
      .mapGroups { (key: (Int, Int), rows: Iterator[LocalPooled]) =>
        var c = 0L; var p = 0L
        rows.foreach { b => c += b.n; p += b.n_pos }
        PoolSum(key._1, key._2, c, p)
      }
    val fittedByPool = pools.groupByKey(_ => 0).flatMapGroups { (_, it) =>
      val arr = it.toArray.sortBy(s => (s.pid, s.pool))
      // stack entries: (c, p, member pools)
      val st = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, List[(Int, Int)])]
      arr.foreach { s =>
        var cur = (s.c, s.p, List((s.pid, s.pool)))
        while (st.nonEmpty &&
          st.last._2 * cur._1 >= cur._2 * st.last._1) {
          val t = st.remove(st.length - 1)
          cur = (t._1 + cur._1, t._2 + cur._2, t._3 ::: cur._3)
        }
        st += cur
      }
      st.iterator.flatMap { case (c, p, members) =>
        val f = p.toDouble / c.toDouble
        members.map { case (pid, pool) => (pid, pool, f) }
      }
    }.toDF("pid", "pool", "fitted")

    // Phase 3 — fitted joins back to the per-score rows; the pool table
    // is small (pools ≤ distinct scores, usually far fewer).
    local.toDF()
      .join(fittedByPool, Seq("pid", "pool"))
      .select(col("score"), col("n"), col("n_pos"), col("fitted"))
  }

  /** Split-conformal prediction intervals (Vovk; Lei et al., JASA'18) —
    * the distribution-free guarantee layer over ANY point predictor:
    * fit on the train folds, take the ⌈(n+1)(1−α)⌉-th smallest
    * absolute residual on a held-out CALIBRATION fold as the interval
    * half-width q̂, and ŷ ± q̂ then covers a fresh point with
    * probability ≥ 1−α regardless of the model or the distribution.
    * The test-fold coverage table is the audit that the guarantee
    * actually landed.
    *
    * Predictor here: the per-group mean of the train folds (the
    * simplest exact-replayable model — the conformal machinery is
    * identical for any predictor emitting ŷ per row).
    *
    * Exactness: values are cents (long); ŷ = Σcents/n is ONE double
    * division of exact longs; residuals snap to 1e-2-cent units
    * (floor(|y−ŷ|·100+0.5) — exact longs), so the order statistic is
    * an INTEGER k-th smallest: deterministic on any engine, no float
    * quantile interpolation anywhere.
    *
    * Scale: the rank runs over the DISTINCT-residual frame (one
    * groupBy shuffle, then a cumulative count over value cardinality,
    * not row cardinality — the coverageGini discipline). Folds come
    * from the caller's key hash, so the split replays on any engine.
    *
    * @param df       input rows
    * @param groupCol per-group model key (also the coverage breakdown)
    * @param centsCol exact integer value column (cents)
    * @param foldCol  fold in 0..3: {0,1}=train, 2=calibration, 3=test
    * @param alphaPct target coverage in percent (90 → α = 0.1)
    * @return per group: (group, n_test, n_covered, coverage, qhat) —
    *         qhat constant across rows (global interval half-width in
    *         cents at 2 dp); coverage at 6 dp. */
  def conformalSplit(df: DataFrame, groupCol: String, centsCol: String,
                     foldCol: String, alphaPct: Int = 90): DataFrame = {
    val base = df.select(col(groupCol).as("g"),
      col(centsCol).cast("long").as("cents"), col(foldCol).as("fold"))
    val model = base.where(col("fold") <= 1)
      .groupBy("g").agg(sum(col("cents")).as("s"), count(lit(1)).as("n"))
      .select(col("g"),
        (col("s").cast("double") / col("n").cast("double")).as("yhat"))
    def resid(part: DataFrame): DataFrame =
      part.join(broadcast(model), Seq("g"))
        .withColumn("ru",
          floor(abs(col("cents").cast("double") - col("yhat")) * 100 + 0.5)
            .cast("long"))
    val cal = resid(base.where(col("fold") === 2))
    // k = ⌈(n_cal+1)·(1−α)⌉ in pure integer arithmetic — `div`, not
    // `/`: double division would hold exactly only below 2^53, and the
    // DuckDB oracle's `// 100` is integer floor division at any size
    val kRow = cal.agg(count(lit(1)).as("n_cal"))
      .selectExpr(s"((n_cal + 1) * $alphaPct + 99) div 100 AS k")
    val byVal = cal.groupBy("ru").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(Window.orderBy(col("ru"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val qhat = byVal.crossJoin(broadcast(kRow))
      .where(col("cum") >= col("k"))
      .agg(min(col("ru")).as("qhat_u"))
    resid(base.where(col("fold") === 3))
      .crossJoin(broadcast(qhat))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_test"),
        count(when(col("ru") <= col("qhat_u"), 1)).as("n_covered"),
        max(col("qhat_u")).as("__q"))
      .select(col("g").as(groupCol), col("n_test"), col("n_covered"),
        round(col("n_covered").cast("double") / col("n_test").cast("double"),
          6).as("coverage"),
        (col("__q").cast("double") / 100.0).as("qhat"))
  }
}
