package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
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
}
