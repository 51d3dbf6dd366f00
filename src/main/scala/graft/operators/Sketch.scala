package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Per-value HLL register contributions: one row per (tag, bucket) with
    * the max rank. `tag` names the sketched column so several columns
    * sketch in ONE pass over the data (one partial-agg shuffle of ≤
    * tags×4096 rows, whatever the input size).
    *
    * bucket = low 12 hash bits; rho = 1 + trailing zeros of the
    * remaining 48 bits (a geometric variable — the trailing-zero form
    * replays in any engine as `bit_count((r & -r) - 1) + 1`, no
    * leading-zero builtin needed). */
  def hllRegisters(df: DataFrame, cols: Seq[String]): DataFrame = {
    val tagged = df.select(explode(array(cols.map(c =>
      struct(lit(c).as("tag"),
        coalesce(col(c).cast("string"), lit("\u0000")).as("v"))): _*))
      .as("s"))
      .select(col("s.tag").as("tag"),
        hash60(concat(lit("hll:"), col("s.v"))).as("__h"))
    val r = shiftright(col("__h"), P)
    val rho = when(r === 0, lit(RhoMax))
      .otherwise(bit_count((r.bitwiseAND(-r)) - 1) + 1)
    tagged
      .select(col("tag"), col("__h").bitwiseAND(M - 1).as("bucket"), rho.as("rho"))
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
  def hllEstimate(registers: DataFrame): DataFrame = {
    val alpha = 0.7213 / (1.0 + 1.079 / M) // standard bias correction
    val two49 = 1L << RhoMax
    val est = registers
      .groupBy("tag")
      .agg(count(lit(1)).as("n_buckets"),
        // exact by construction: ≤ m·2^49 = 2^61 < 2^63, so LongType
        (sum(expr(s"shiftleft(CAST(1 AS BIGINT), $RhoMax - reg)")) +
          (lit(M.toLong) - count(lit(1))) * lit(two49))
          .cast("long").as("z_scaled"))
    // raw = alpha·m²·2^49 / Z_scaled; fixed left-to-right double chain
    val raw = lit(alpha) * lit(M.toDouble * M.toDouble) * lit(two49.toDouble) /
      col("z_scaled").cast("double")
    val vZero = lit(M.toLong) - col("n_buckets")
    est.select(col("tag"), col("n_buckets"), col("z_scaled"),
      round(when(raw <= lit(2.5 * M) && vZero > 0,
        lit(M.toDouble) * log(lit(M.toDouble) / vZero.cast("double")))
        .otherwise(raw), 4).as("est_distinct"))
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
}
