package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.hash60

/** Mergeable one-pass sketches — the cardinality / frequency answers a
  * 100 TB pipeline wants WITHOUT shuffling the full key set: a
  * HyperLogLog distinct-count whose state is 4096 small integers, and a
  * count-min frequency sketch whose state is a 4×1024 counter grid.
  * Both states merge associatively (register max / counter sum), so a
  * lake can sketch per partition / per day and fold the states — the
  * partial-aggregate shape Spark's hash aggregate already gives these
  * plans for free (the groupBy key space IS the fixed register space,
  * never the data's key space).
  *
  * Determinism (the driver's cross-engine oracle contract): the hash is
  * the repo-standard md5-derived 60-bit integer ([[hash60]]), register
  * arithmetic is pure BIGINT (no doubles accumulate across rows), and
  * the few final double ops are a fixed expression over exact integers
  * that any engine replays bit-identically.
  *
  * Reference anchor: the reference counts distinct products/customers
  * with exact `nunique` over pandas frames (Hybrid_Recom_vecdb.py:60-75)
  * — viable at 60 k rows, not at 10^11; these sketches are the
  * scale-path replacement with a quantified error bar (HLL p=12:
  * ±1.04/√4096 ≈ 1.6 % rse; CMS ε = e/1024, δ = e^-4).
  */
object Sketch {

  /** HLL precision: p=12 → m=4096 registers; 48-bit rank domain. */
  private val P = 12
  private val M = 1 << P // 4096
  /** rho of a zero 48-bit remainder (all bits "zero") — the register cap. */
  private val RhoMax = 61 - P // 49

  /** THE register encoding — every register builder derives (hash,
    * bucket, rho) through these three expressions, so a change to the
    * precision P, the null sentinel, or the hash prefix can never apply
    * to one builder and not another (the telescoping-merge law q173 and
    * SketchSpec assert requires all builders to agree bit-for-bit).
    * NULL values hash as the NUL sentinel (a distinct countable). */
  private def hllHash(v: Column): Column =
    hash60(concat(lit("hll:"), coalesce(v.cast("string"), lit("\u0000"))))
  private def hllBucket(h: Column): Column = h.bitwiseAND(M - 1)
  /** rho = 1 + trailing zeros of the 48-bit remainder (a geometric
    * variable — the trailing-zero form replays in any engine as
    * `bit_count((r & -r) - 1) + 1`, no leading-zero builtin needed). */
  private def hllRho(h: Column): Column = {
    val r = shiftright(h, P)
    when(r === 0, lit(RhoMax))
      .otherwise(bit_count((r.bitwiseAND(-r)) - 1) + 1)
  }

  /** Per-value HLL register contributions: one row per (tag, bucket) with
    * the max rank. `tag` names the sketched column so several columns
    * sketch in ONE pass over the data (one partial-agg shuffle of ≤
    * tags×4096 rows, whatever the input size). */
  def hllRegisters(df: DataFrame, cols: Seq[String]): DataFrame = {
    val tagged = df.select(explode(array(cols.map(c =>
      struct(lit(c).as("tag"), col(c).cast("string").as("v"))): _*))
      .as("s"))
      .select(col("s.tag").as("tag"), hllHash(col("s.v")).as("__h"))
    tagged
      .select(col("tag"), hllBucket(col("__h")).as("bucket"),
        hllRho(col("__h")).as("rho"))
      .groupBy("tag", "bucket").agg(max("rho").as("reg"))
  }

  /** Merge two register states — union + max, the HLL merge law. */
  def hllMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("tag", "bucket").agg(max("reg").as("reg"))

  /** Distinct-count estimate from a register state. All register mass
    * folds as EXACT integers: Z·2^49 = Σ 2^(49−reg) + zeroRegs·2^49 (≤
    * 2^61, no overflow), so the only double math is the final fixed
    * expression — and the linear-counting branch for sparse registers,
    * whose m·ln(m/V) is one libm call on two exact integers (≤1 ulp
    * cross-engine, invisible under the 4 dp output grid).
    *
    * @return (tag, n_buckets, z_scaled, est_distinct) — est at 4 dp. */
  def hllEstimate(registers: DataFrame): DataFrame =
    hllEstimateKeyed(registers, Seq("tag"))

  /** [[hllEstimate]] generalized to arbitrary key columns. */
  def hllEstimateKeyed(registers: DataFrame,
                       keyCols: Seq[String]): DataFrame = {
    val alpha = 0.7213 / (1.0 + 1.079 / M) // standard bias correction
    val two49 = 1L << RhoMax
    val est = registers
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_buckets"),
        // exact by construction: ≤ m·2^49 = 2^61 < 2^63, so LongType
        (sum(expr(s"shiftleft(CAST(1 AS BIGINT), $RhoMax - reg)")) +
          (lit(M.toLong) - count(lit(1))) * lit(two49))
          .cast("long").as("z_scaled"))
    // raw = alpha·m²·2^49 / Z_scaled; fixed left-to-right double chain
    val raw = lit(alpha) * lit(M.toDouble * M.toDouble) * lit(two49.toDouble) /
      col("z_scaled").cast("double")
    val vZero = lit(M.toLong) - col("n_buckets")
    est.select(keyCols.map(col) ++ Seq(col("n_buckets"), col("z_scaled"),
      round(when(raw <= lit(2.5 * M) && vZero > 0,
        lit(M.toDouble) * log(lit(M.toDouble) / vZero.cast("double")))
        .otherwise(raw), 4).as("est_distinct")): _*)
  }

  /** GROUPED distinct sketch with a rollup demonstration — the form a
    * lake actually materializes: registers at (group, subdivision)
    * granularity (e.g. per event-type per DAY), merged up to the group
    * by register max, then estimated. Because merge is max and max
    * telescopes, the rolled-up state is IDENTICAL to sketching the
    * group directly — which is exactly what lets per-day register
    * tables answer any-period distinct questions without touching raw
    * data again.
    *
    * @return (groupCols..., n_buckets, z_scaled, est_distinct) */
  def hllDistinctBy(df: DataFrame, groupCols: Seq[String], subCol: String,
                    valueCol: String): DataFrame = {
    val subRegs = df
      .select(groupCols.map(col) ++ Seq(col(subCol),
        hllHash(col(valueCol)).as("__h")): _*)
      .select(groupCols.map(col) ++ Seq(col(subCol),
        hllBucket(col("__h")).as("bucket"), hllRho(col("__h")).as("rho")): _*)
      .groupBy((groupCols :+ subCol :+ "bucket").map(col): _*)
      .agg(max("rho").as("reg"))
    // rollup: merge subdivisions by register max
    val merged = subRegs
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max("reg").as("reg"))
    hllEstimateKeyed(merged, groupCols)
  }

  /** One-shot: sketch several columns of `df` and estimate each. */
  def hllDistinct(df: DataFrame, cols: Seq[String]): DataFrame =
    hllEstimate(hllRegisters(df, cols))

  /** Count-min depth (independent hash rows) and width (slots). */
  private val Depth = 4
  private val Width = 1024

  private def cmSlot(j: Int, v: Column): Column =
    hash60(concat(lit(s"cms$j:"), v)).bitwiseAND(Width - 1)

  /** Build the count-min grid: Depth×Width counters, each the exact sum
    * of the weights hashing there. One pass, ≤ 4096 result rows — the
    * per-partition partial aggregate does all the work map-side. */
  def cmsBuild(df: DataFrame, keyCol: String, weight: Column): DataFrame = {
    val v = coalesce(col(keyCol).cast("string"), lit("\u0000"))
    df.select(explode(array((0 until Depth).map(j =>
        struct(lit(j).as("j"), cmSlot(j, v).as("slot"))): _*)).as("c"),
        weight.as("__w"))
      .groupBy(col("c.j").as("j"), col("c.slot").as("slot"))
      .agg(sum(col("__w")).as("cnt"))
  }

  /** Point-query the grid for each candidate key: est = min over the
    * Depth rows (the CMS upper-bound estimate — ≥ the true count always,
    * ≤ true + εN with probability 1−δ). Candidates fan ×Depth then
    * equi-join the ≤4096-row grid (broadcast-sized by construction). */
  def cmsEstimate(sketch: DataFrame, candidates: DataFrame,
                  keyCol: String): DataFrame = {
    val v = coalesce(col(keyCol).cast("string"), lit("\u0000"))
    candidates
      .select(col(keyCol), explode(array((0 until Depth).map(j =>
        struct(lit(j).as("j"), cmSlot(j, v).as("slot"))): _*)).as("c"))
      .select(col(keyCol), col("c.j").as("j"), col("c.slot").as("slot"))
      .join(broadcast(sketch), Seq("j", "slot"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
  }

  /** Bloom filter bits: 2^20 positions, 4 hashes, packed into 32-bit
    * words (bit index ≤ 31 — a 63-bit shift overflows DuckDB's checked
    * `<<`, so words stay half-full by design). ~32 K result rows max. */
  private val BloomBits = 1 << 20
  private val BloomHashes = 4

  private def bloomPos(j: Int, v: Column): Column =
    hash60(concat(lit(s"bloom$j:"), v)).bitwiseAND(BloomBits - 1)

  /** Build the membership filter: one map-side pass, groupBy word,
    * bit_or the masks. State merges across shards by the same bit_or —
    * the "have we already ingested this key?" primitive that needs no
    * join against the full history. FPR ≈ (1 − e^(−kn/m))^k: 3·10^-5 at
    * n = 20 k keys; size BloomBits up for bigger key sets. */
  def bloomBuild(df: DataFrame, keyCol: String): DataFrame = {
    val v = coalesce(col(keyCol).cast("string"), lit("\u0000"))
    df.select(explode(array((0 until BloomHashes).map(j =>
        bloomPos(j, v)): _*)).as("pos"))
      .select(shiftright(col("pos"), 5).as("word"),
        col("pos").bitwiseAND(31).as("bit"))
      .groupBy("word")
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT)))")
        .as("bits"))
  }

  /** Probe: a key "may be present" iff ALL k bits are set. No false
    * negatives ever (SketchSpec); false positives at the documented
    * rate. The filter is ≤32 K rows — broadcast by construction. */
  def bloomProbe(filter: DataFrame, candidates: DataFrame,
                 keyCol: String): DataFrame = {
    val v = coalesce(col(keyCol).cast("string"), lit("\u0000"))
    candidates
      .select(col(keyCol), explode(array((0 until BloomHashes).map(j =>
        bloomPos(j, v)): _*)).as("pos"))
      .select(col(keyCol), shiftright(col("pos"), 5).as("word"),
        col("pos").bitwiseAND(31).as("bit"))
      .join(broadcast(filter), Seq("word"), "left")
      .groupBy(keyCol)
      .agg((count(when(
        coalesce(col("bits"), lit(0L)).bitwiseAND(
          expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))")) =!= 0, 1))
        === BloomHashes).as("may_contain"))
  }

  /** Mergeable fixed-grid histogram quantiles — approximate p50/p95/p99
    * per group from $1-wide bins over the cents axis: bin counts are
    * EXACT integers that sum across shards/days, the quantile readout is
    * the upper edge of the first bin whose cumulative count clears
    * ⌈q·n⌉ — pure integer comparisons (100·cum ≥ pct·n), error bounded
    * by the bin width, zero floating point anywhere.
    *
    * The exact-percentile path ([[FeaturePrep.percentileBounds]]) sorts
    * inside each group; this sketch never sorts data — only the ≤
    * `maxBins` bins — so it is the 100 TB latency-percentile rollup.
    *
    * @return (group, n, p50_cents, p95_cents, p99_cents) */
  def histQuantiles(df: DataFrame, groupCol: String, valCol: String,
                    binCents: Int = 100, maxBins: Int = 1024): DataFrame = {
    val cents = floor(col(valCol) * lit(100) + lit(0.5)).cast("long")
    // floor-division (not truncation) so a negative value bins like the
    // oracle's integer `//`
    val bin = least(floor(cents / lit(binCents)).cast("long"),
      lit(maxBins.toLong - 1))
    val binned = df.select(col(groupCol), bin.as("bin"))
      .groupBy(groupCol, "bin").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(groupCol).orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(groupCol)
    def pick(pct: Int) =
      min(when(col("cum") * 100 >= lit(pct) * col("n"),
        (col("bin") + 1) * binCents)).as(s"p${pct}_cents")
    binned
      .withColumn("cum", sum("c").over(w))
      .withColumn("n", sum("c").over(wAll))
      .groupBy(groupCol)
      .agg(max("n").as("n"), pick(50), pick(95), pick(99))
  }

  /** KMV (k-minimum-values) distinct sketch — the set-OPERATION sketch
    * the HLL cannot be: because the state is the k smallest hash values
    * themselves (a uniform sample of the distinct-value hash space),
    * two sketches support an INTERSECTION estimate via the union
    * sketch's Jaccard, not just a union. "How many users did both X
    * and Y" over arbitrary key pairs, from per-key states alone.
    *
    * State per key: the k smallest distinct [[hash60]] values (one
    * distinct-aggregate shuffle, then a per-key bottom-k that compiles
    * to WindowGroupLimit — rank pushes below the sort, so no key ever
    * materializes more than k rows past the aggregate).
    * Estimate: (k−1)·2^60 / h_(k) (the classic KMV estimator).
    * Merge: union the value lists, keep the k smallest — associative.
    * Intersection of A, B: J ≈ |union-minima present in BOTH| / k,
    * |A∩B| ≈ J · |A∪B|-estimate. Everything until the final division
    * is exact BIGINT, so any engine replays it bit-for-bit.
    *
    * k sizing: the Jaccard numerator is a k-sample of J, rel std
    * ≈ √((1−J)/(kJ)) — at J ≈ 0.2, k = 256 gives a 12% std (too loose
    * to gate), k = 1024 gives ~6%, so the q185 error contract (25%)
    * sits at ≈3.5σ. State is still ≤ 1024 longs per key. */
  val KmvK = 1024

  /** THE per-group bottom-k-hashes idiom every KMV path shares — the
    * row_number-over-(partition, ORDER BY h) ≤ k form that compiles to
    * WindowGroupLimit (rank pushes below the sort), which the scale
    * claim depends on. One definition so a tie-break or rank-function
    * change cannot reach one site and miss another. */
  private def bottomK(df: DataFrame, partCols: Seq[String],
                      k: Int): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*).orderBy("h")
    df.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k).drop("__rk")
  }

  /** Per-key KMV state: one row per (key, rank ≤ k) with the hash. */
  def kmvSketch(df: DataFrame, keyCol: String, valueCol: String,
                k: Int = KmvK): DataFrame = {
    val h = hash60(concat(lit("kmv:"),
      coalesce(col(valueCol).cast("string"), lit("\u0000"))))
    bottomK(df.select(col(keyCol).as("key"), h.as("h")).distinct(),
      Seq("key"), k)
  }

  /** Merge two KMV states (shard → lake fold): distinct union of the
    * minima, keep the k smallest per key — associative, and equal to
    * sketching the concatenated data (SketchSpec merge law). */
  def kmvMerge(a: DataFrame, b: DataFrame, k: Int = KmvK): DataFrame =
    bottomK(a.unionByName(b).distinct(), Seq("key"), k)

  /** Distinct-count estimate from a KMV state: exact n when the key
    * holds fewer than k values, else (k−1)·2^60/h_(k). */
  def kmvEstimate(state: DataFrame, k: Int = KmvK): DataFrame =
    state.groupBy("key")
      .agg(count(lit(1)).as("n_minima"), max(col("h")).as("h_k"))
      .select(col("key"), col("n_minima"),
        when(col("n_minima") < k, col("n_minima").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) * lit(Two60)
            / col("h_k").cast("double"), 4)).as("est_distinct"))

  private val Two60 = math.pow(2.0, 60)

  /** Intersection-cardinality estimate for every key pair (a < b) from
    * the per-key states alone: dedup the two sides' minima into the
    * pair's UNION minima (same value → same hash, so set-union is a
    * groupBy on h), keep the k smallest, count how many sit in BOTH
    * sides (the Jaccard numerator), and scale the union estimate.
    * Everything runs over STATES (≤ k rows per key) — the pair fan-out
    * is |keys|²·k state rows, never the data.
    *
    * @return (ka, kb, n_union_minima, n_both, est_union, est_intersect) */
  def kmvIntersect(state: DataFrame, k: Int = KmvK): DataFrame = {
    val keys = state.select(col("key")).distinct()
    val pairKeys = keys.select(col("key").as("ka"))
      .crossJoin(keys.select(col("key").as("kb")))
      .where(col("ka") < col("kb"))
    val left = state.join(pairKeys, col("key") === col("ka"))
      .select(col("ka"), col("kb"), col("h"),
        lit(1L).as("ia"), lit(0L).as("ib"))
    val right = state.join(pairKeys, col("key") === col("kb"))
      .select(col("ka"), col("kb"), col("h"),
        lit(0L).as("ia"), lit(1L).as("ib"))
    val u = left.unionByName(right)
      .groupBy("ka", "kb", "h")
      .agg(max(col("ia")).as("ia"), max(col("ib")).as("ib"))
    val uk = bottomK(u, Seq("ka", "kb"), k)
    val agg = uk.groupBy("ka", "kb")
      .agg(count(lit(1)).as("n_union_minima"),
        max(col("h")).as("__hk"),
        sum(col("ia") * col("ib")).as("n_both"))
    val estU = when(col("n_union_minima") < k,
        col("n_union_minima").cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(Two60)
        / col("__hk").cast("double"))
    agg.select(col("ka"), col("kb"), col("n_union_minima"), col("n_both"),
      round(estU, 4).as("est_union"),
      round(col("n_both").cast("double")
          / col("n_union_minima").cast("double") * estU, 4)
        .as("est_intersect"))
  }
}
