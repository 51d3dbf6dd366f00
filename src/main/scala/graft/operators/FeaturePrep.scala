package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature preparation: per-group winsorization (percentile clamping) —
  * the outlier-capping step a training pipeline applies to continuous
  * features before normalization (the batch complement of q96's
  * windowed z-score flags).
  *
  * The obvious rendering — `percentile(value, p)` per group — is exact
  * but buffers EVERY group value in the aggregation buffer: a mega
  * group OOMs its task at 100 TB (the q29-sessionize hazard class, and
  * why q64 gates the approx sketch instead). This computes the SAME
  * exact linear-interpolated percentile (the R-7 convention shared by
  * Spark's `percentile` and DuckDB's `quantile_cont`) relationally:
  *
  *  1. rank values per group with a window sort (spillable — no
  *     in-memory group array) and count the group size;
  *  2. keep only the ≤4 rows per group whose ranks bracket the two
  *     target positions h = p·(n−1);
  *  3. one aggregate interpolates v[⌊h⌋+1] + (v[⌊h⌋+2] − v[⌊h⌋+1])·frac
  *     — the same arithmetic Spark's Percentile.getPercentile applies,
  *     proven equal in FeaturePrepSpec;
  *  4. bounds broadcast back and each row clamps map-side.
  *
  * Two exchanges total (the rank sort and the bounds aggregate), both
  * keyed on the group column; the clamp join broadcasts |groups| rows.
  */
object FeaturePrep {

  /** Clamp `valCol` to its per-group [pLo, pHi] exact percentile range.
    * Output: every `keep` column plus `__lo`/`__hi` (the bounds),
    * `value_w` (clamped value) and `clipped`. */
  def winsorize(df: DataFrame, groupCol: String, valCol: String,
                pLo: Double, pHi: Double, keep: Seq[String]): DataFrame = {
    val bounds = percentileBounds(df, groupCol, valCol, pLo, pHi)
    df.join(broadcast(bounds), Seq(groupCol))
      .select((groupCol +: keep).map(col) ++ Seq(
        col("__lo"), col("__hi"),
        greatest(col("__lo"), least(col("__hi"), col(valCol))).as("value_w"),
        (col(valCol) < col("__lo") || col(valCol) > col("__hi")).as("clipped")): _*)
  }

  /** Exact interpolated percentiles per group, window-rank form:
    * (groupCol, __lo, __hi). */
  def percentileBounds(df: DataFrame, groupCol: String, valCol: String,
                       pLo: Double, pHi: Double): DataFrame = {
    val ranked = df.select(col(groupCol), col(valCol))
      .withColumn("__r",
        row_number().over(Window.partitionBy(groupCol).orderBy(col(valCol))))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(groupCol)))
    def pos(p: Double): Column = lit(p) * (col("__n") - 1)
    def at(p: Double, off: Int): Column =
      col("__r") === (floor(pos(p)) + off + 1)
    val needed = ranked.where(
      at(pLo, 0) || at(pLo, 1) || at(pHi, 0) || at(pHi, 1))
    // Spark's Percentile.getPercentile interpolation form, exactly:
    // (ceil−pos)·v[⌊h⌋+1] + (pos−floor)·v[⌈h⌉+1], v[⌊h⌋+1] when whole —
    // FeaturePrepSpec asserts bit-equality with the percentile() agg.
    def interp(p: Double, a: Column, b: Column): Column = {
      val h = pos(p)
      when(ceil(h) === floor(h), a)
        .otherwise((ceil(h) - h) * a + (h - floor(h)) * coalesce(b, a))
    }
    needed
      .groupBy(groupCol)
      .agg(
        max(when(at(pLo, 0), col(valCol))).as("lo1"),
        max(when(at(pLo, 1), col(valCol))).as("lo2"),
        max(when(at(pHi, 0), col(valCol))).as("hi1"),
        max(when(at(pHi, 1), col(valCol))).as("hi2"),
        max(col("__n")).as("__n"))
      .select(col(groupCol),
        interp(pLo, col("lo1"), col("lo2")).as("__lo"),
        interp(pHi, col("hi1"), col("hi2")).as("__hi"))
  }

  /** Out-of-fold target encoding — the leakage-safe categorical encoder
    * for gradient-boosted / linear training sets: each row's category is
    * replaced by the label mean computed WITHOUT the row's own fold, so
    * the encoding never memorizes the row's label.
    *
    * Exactness: fold = hash60(key) mod nFolds (layout-free), per-
    * (category, fold) label sums and counts are exact longs, the
    * out-of-fold mean is ONE double division per row with an m-weighted
    * global-mean prior:  te = (Σy_cat − Σy_fold + m·μ) / (n_cat − n_fold
    * + m). Empty-out-of-fold categories degrade to the prior, never NaN
    * (m > 0 guards the denominator).
    *
    * Scale: two tiny aggregates (|cats|·folds, then |cats|) broadcast
    * back onto the fact table — one map-side pass over the 100 TB side,
    * no fact-table shuffle at all.
    */
  def targetEncode(df: DataFrame, keyCol: String, catCol: String,
                   labelCol: String, nFolds: Int = 5,
                   smoothing: Double = 10.0): DataFrame = {
    require(smoothing > 0.0, "smoothing must be > 0 to guard empty folds")
    val fold = pmod(graft.functions.TextFunctions.hash60(
      concat_ws(":", lit("te"), col(keyCol).cast("string"))), lit(nFolds.toLong))
    val t = df.select(col(keyCol), col(catCol),
      col(labelCol).cast("long").as("__y"), fold.as("fold"))
    val perFold = t.groupBy(col(catCol), col("fold"))
      .agg(sum("__y").as("__fs"), count(lit(1)).as("__fc"))
    val perCat = perFold.groupBy(col(catCol))
      .agg(sum("__fs").as("__ts"), sum("__fc").as("__tc"))
    val prior = t.agg(
      (sum("__y").cast("double") / count(lit(1)).cast("double")).as("__mu"))
    t.join(broadcast(perFold), Seq(catCol, "fold"))
      .join(broadcast(perCat), Seq(catCol))
      .crossJoin(broadcast(prior))
      .select(col(keyCol), col(catCol), col("fold"),
        (((col("__ts") - col("__fs")).cast("double")
          + lit(smoothing) * col("__mu")) /
          ((col("__tc") - col("__fc")).cast("double") + lit(smoothing)))
          .as("te"))
  }

  /** Hashing-trick bag-of-words — fixed-dimension sparse features with no
    * vocabulary pass (Weinberger et al., ICML'09): token t lands in
    * bucket hash60(t) mod dim. Output is COO triplets (doc, idx, cnt) —
    * the layout a distributed trainer consumes directly.
    *
    * One map-side explode + one shuffle on (doc, idx); no global state,
    * so the 100 TB shape is embarrassingly parallel and the feature
    * space never needs a driver-side dictionary (the failure mode of
    * naive one-hot at web scale).
    */
  def featureHash(docs: DataFrame, idCol: String, textCol: String,
                  dim: Int): DataFrame =
    docs.select(col(idCol),
        explode(graft.functions.TextFunctions.tokens(col(textCol))).as("__tok"))
      .withColumn("idx", pmod(graft.functions.TextFunctions.hash60(col("__tok")),
        lit(dim.toLong)))
      .groupBy(col(idCol), col("idx"))
      .agg(count(lit(1)).as("cnt"))

  /** Equal-frequency binning (quantile discretizer) with EXACT edges:
    * ntile(n) over the total order (value, tie id) — deterministic on any
    * engine, unlike approxQuantile-derived edges. Emits the per-bin
    * summary (count, lo, hi) that IS the empirical quantile table a
    * trainer bakes into its feature map.
    *
    * Scale: ntile needs a total order — a single-partition sort at 100 TB
    * is the known limit of the EXACT form (same spill-safe caveat as
    * q106's percentile ranks; the approximate path is q64's GK sketch).
    * Per-GROUP binning (`groupCol != None`) partitions the sort and is
    * the shape to prefer at scale.
    */
  def quantileBins(df: DataFrame, valCol: String, tieCol: String, n: Int,
                   groupCol: Option[String] = None): DataFrame = {
    val part = groupCol.map(g => Window.partitionBy(col(g)))
      .getOrElse(Window.partitionBy())
    val w = part.orderBy(col(valCol).asc, col(tieCol).asc)
    val binned = df.withColumn("bin", ntile(n).over(w))
    val keys = groupCol.toSeq.map(col) :+ col("bin")
    binned.groupBy(keys: _*)
      .agg(count(lit(1)).as("cnt"),
        min(col(valCol)).as("lo"), max(col(valCol)).as("hi"))
  }
}
