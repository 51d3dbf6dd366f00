package graft.functions.expressions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-state per-group top-k — the aggregation that replaces a
  * sort-based `row_number() <= k` window on a corpus-scale frame.
  *
  * Why this exists (round 11, measured): the cell-cogrouped kNN join's
  * per-query top-k compiled to `Sort → WindowGroupLimit(Partial) →
  * Exchange → …`. The group-limit prune is map-side, but it is
  * SORT-BASED — the local Sort materializes the ENTIRE scored-pair
  * volume per task before the prune can drop anything. At 60× the sf0.1
  * corpus the gate-mode kNN join scores ~10.8G pairs, and the
  * UnsafeExternalSorter spill for that sort filled 79 GB of local disk
  * and killed the job (`SPILL_OUT_OF_MEMORY … No space left on device`,
  * BENCH_SCALE round-11 note). The same shape at 100 TB is a
  * cluster-wide disk stampede: the shuffle-spill footprint equals the
  * full candidate volume instead of the O(|groups|·k) answer.
  *
  * Catalyst's `CollectTopK` is Spark's own fix for this exact pattern (it is what
  * `ALSModel.recommendForAll` uses instead of a ranking window): a
  * `BoundedPriorityQueue(k)` per group key inside ObjectHashAggregate —
  * partial map-side heaps, a shuffle of at most `tasks × k` rows per
  * group, and ZERO materialization of the candidate volume. State per
  * task is bounded by (groups present in task) × k.
  *
  * Ordering contract: `child`'s type ordering, lexicographic for
  * structs. `reverse = false` keeps the k LARGEST and `eval` returns
  * them sorted DESCENDING (pinned empirically by TopKAggregateSpec
  * against the window formulation — ties and short groups included).
  * Mixed-direction tie-breaks are encoded by negating the tie column:
  * `struct(sim, -vec_id)` descending == (sim DESC, vec_id ASC), the
  * exact (rank, tie) order of the window it replaces.
  */
object TopKAggregate {

  /** `collect_top_k(child, k, reverse)` as a Column aggregate.
    * `reverse = false` → the k largest, returned sorted descending. */
  def collectTopK(child: Column, k: Int, reverse: Boolean): Column =
    ColumnBridge.column(
      ColumnBridge.collectTopK(ColumnBridge.expression(child), k, reverse))

  /** Per-`group` top-k rows under (`ord` DESC, `id` ASC) — the drop-in,
    * disk-bounded replacement for
    * `row_number().over(Window.partitionBy(group).orderBy(ord.desc,
    * id.asc)) <= k` on frames whose row count is candidate-sized.
    * Output columns keep the input names plus `rnk` (1-based, same rank
    * the window assigned). `id` must be a numeric column (the mixed
    * sort direction is encoded by negation); every column other than
    * (group, id, ord) is pruned — re-attach small per-group payloads by
    * joining the k-sized output, not by carrying them through the heap. */
  def perGroupTopK(df: DataFrame, group: String, id: String, ord: String,
                   k: Int): DataFrame = {
    // ObjectHashAggregate's sort-based fallback would reintroduce the
    // exact full-volume sort this aggregation exists to avoid. The
    // default threshold (128 distinct keys per task) predates bounded
    // buffers like collect_top_k's k-heap (~1 KB per group); raise the
    // session floor so a task can hold millions of per-group heaps in
    // the hash map before any fallback (2^21 × ~1 KB ≈ 2 GB worst case,
    // and real tasks hold far fewer groups).
    val fallbackKey = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    if (df.sparkSession.conf.get(fallbackKey, "128").toLong < (1L << 21))
      df.sparkSession.conf.set(fallbackKey, (1L << 21).toString)
    df.groupBy(group)
      .agg(collectTopK(struct(col(ord), (-col(id)).as("nid")), k,
        reverse = false).as("__tk"))
      .select(col(group), posexplode(col("__tk")).as(Seq("__p", "__e")))
      .select(col(group), (-col(s"__e.nid")).as(id),
        col(s"__e.${ord}").as(ord), (col("__p") + 1).cast("int").as("rnk"))
  }
}
