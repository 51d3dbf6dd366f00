package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch time-series preparation over the event stream: the feature-prep
  * steps a training pipeline runs between raw clickstream and model input
  * (dense per-hour series, dimension history, next-item examples).
  *
  * Reference grounding: the reference's only temporal surface is the
  * per-user purchase history it feeds the CF arm
  * (`Hybrid_Recom_vecdb.py:150-178` builds user→items from ordered
  * transactions); these operators are the standard generalizations of
  * that history build — same ordered-per-key window shape, richer
  * outputs.
  *
  * All three operators share one physical shape: a single exchange on the
  * key column, then ordered window functions within the key — no
  * self-joins, no collects, no per-row Python. A mega-key (one user with
  * 10⁸ events) sorts within its partition and spills; nothing buffers a
  * whole key in memory (contrast `collect_list`-style history builds,
  * which OOM exactly there).
  */
object Timeseries {

  /** Dense hourly grid per key with forward fill — "resample('1H').ffill()"
    * as one declarative plan. Gaps (hours with no events) materialize as
    * rows with `n_events = 0`, `is_gap = true`, and the last observed
    * hourly value carried forward.
    *
    * Hourly sums are fixed-point (floor(v·1e6 + 0.5) summed as LONG, then
    * scaled back) so the aggregate is exact and independent of partition
    * order — the DuckDB oracle replays it bit-identically.
    *
    * Scale: the grid explode is bounded by each key's own [min, max] hour
    * span (never the global span); the fill window is one exchange on
    * `keyCol` followed by an ordered running `last(ignoreNulls)`. At a
    * multi-year span widen the grid unit (day), not the operator shape.
    */
  def gapFill(events: DataFrame, keyCol: String, tsCol: String,
              valueCol: String): DataFrame = {
    val hour = date_trunc("hour", col(tsCol))
    val fp = floor(col(valueCol) * lit(1e6) + lit(0.5)).cast("long")
    val hourly = events
      .groupBy(col(keyCol), hour.as("hour"))
      .agg((sum(fp) / lit(1e6)).as("__v"), count(lit(1)).as("__n"))
    val grid = hourly
      .groupBy(col(keyCol))
      .agg(min(col("hour")).as("__lo"), max(col("hour")).as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"),
          expr("interval 1 hour"))).as("hour"))
    val w = Window.partitionBy(keyCol).orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq(keyCol, "hour"), "left")
      .select(col(keyCol), col("hour"),
        coalesce(col("__n"), lit(0L)).as("n_events"),
        last(col("__v"), ignoreNulls = true).over(w).as("value_filled"),
        col("__n").isNull.as("is_gap"))
  }

  /** SCD Type-2 dimension build: compress an ordered observation stream
    * into validity intervals — one row per run of consecutive equal
    * attribute values, with `[valid_from, valid_to)` bounds and the open
    * interval closed at `HighDate` (the warehouse convention, so the
    * column never carries NULL and range predicates stay sargable).
    *
    * Classic gaps-and-islands: a change flag (`lag` ≠ current), a running
    * sum numbering the runs, one aggregate per run, and a `lead` to close
    * each interval. Two window passes + one aggregate over a single
    * exchange on the key.
    *
    * The high date is 2100-01-01 rather than the classical 9999-12-31:
    * it must stay representable in nanosecond-epoch int64 (max
    * 2262-04-11) or downstream Arrow/pandas consumers silently wrap it
    * negative.
    */
  val HighDate = "2100-01-01 00:00:00"

  def scd2(obs: DataFrame, keyCol: String, attrCol: String, tsCol: String,
           tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val chg = when(lag(col(attrCol), 1).over(w).isNull ||
      lag(col(attrCol), 1).over(w) =!= col(attrCol), 1L).otherwise(0L)
    val runs = obs
      .withColumn("version", sum(chg).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("version"))
      .agg(max(col(attrCol)).as("attr"), // constant within a run
        min(col(tsCol)).as("valid_from"), count(lit(1)).as("n_obs"))
    val wv = Window.partitionBy(keyCol).orderBy("version")
    runs.select(col(keyCol), col("version"), col("attr"), col("valid_from"),
      coalesce(lead(col("valid_from"), 1).over(wv),
        lit(HighDate).cast("timestamp")).as("valid_to"),
      col("n_obs"),
      lead(col("valid_from"), 1).over(wv).isNull.as("is_current"))
  }

  /** Next-item prediction examples: for each event, the preceding
    * `historyLen` items (oldest→newest, `sep`-joined) as the context and
    * the current item as the target — the training-pair build for a
    * sequential recommender, emitted for every event with at least one
    * predecessor.
    *
    * `concat_ws` drops NULL lags, so short prefixes shrink naturally;
    * a bounded stack of `lag` columns (never `collect_list`) keeps state
    * O(historyLen) per row at any key size.
    */
  def nextItemExamples(events: DataFrame, keyCol: String, itemCol: String,
                       tsCol: String, tieCol: String,
                       historyLen: Int = 3, sep: String = " > "): DataFrame = {
    require(historyLen >= 1, "historyLen must be >= 1")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val lags: Seq[Column] =
      (historyLen to 1 by -1).map(i => lag(col(itemCol), i).over(w))
    events
      .withColumn("position", row_number().over(w))
      .withColumn("context", concat_ws(sep, lags: _*))
      .withColumn("__prev", lag(col(itemCol), 1).over(w))
      .where(col("__prev").isNotNull)
      .select(col(keyCol), col(tieCol), col("position"),
        col("context"), col(itemCol).as("target"))
  }

  /** First-order Markov transition matrix over per-key event sequences:
    * P(next state | state), estimated from every adjacent pair in
    * (tsCol, tieCol) order — the behavioral model behind "users who
    * view then click convert at X%" and the generator for session-level
    * synthetic traffic.
    *
    * Exactness: counts are integers; each probability is ONE double
    * division of two exact longs, rounded to 6 dp — partition-
    * invariant, oracle-replayable. Scale: one window pass keyed by
    * `keyCol` (the sequence order lives inside each key's partition)
    * into one map-side-combinable pair count; the |states|² result is
    * tiny by construction.
    *
    * @return (src_state, dst_state, n, p) — p = n / Σ n over src_state. */
  def transitions(events: DataFrame, keyCol: String, stateCol: String,
                  tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .withColumn("__next", lead(col(stateCol), 1).over(w))
      .where(col("__next").isNotNull)
      .groupBy(col(stateCol).as("src_state"), col("__next").as("dst_state"))
      .agg(count(lit(1)).as("n"))
    val w2 = Window.partitionBy("src_state")
    pairs.select(col("src_state"), col("dst_state"), col("n"),
      round(col("n").cast("double") / sum(col("n")).over(w2).cast("double"),
        6).as("p"))
  }

  /** Strict ordered conversion funnel: per key, step i counts only if it
    * happens AT OR AFTER the key's completion of step i-1 (first
    * qualifying occurrence) — the product-analytics funnel where a
    * purchase before the first view does not count as a conversion.
    *
    * Spark shape: one pass per step — step i is a groupBy(key) min(ts)
    * over events of that type semi-joined to the step-(i-1) frame with
    * `ts >= prev_ts` — all equi-keyed joins on `keyCol`, each
    * broadcast-or-shuffle by size. |steps| is small and fixed; event
    * volume passes through each join once.
    *
    * @return one row per step: (step, step_name, n_keys) with step 1..k
    *         and n_keys monotonically non-increasing. */
  def funnel(events: DataFrame, keyCol: String, typeCol: String,
             tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var reached: DataFrame = null
    val counts = steps.zipWithIndex.map { case (step, i) =>
      val ev = events.where(col(typeCol) === step)
        .select(col(keyCol).as("__k"), col(tsCol).as("__ts"))
      val qualified =
        if (i == 0) ev
        else ev.join(reached.select(col("__k"), col("__ts").as("__prev")),
          Seq("__k")).where(col("__ts") >= col("__prev"))
          .select(col("__k"), col("__ts"))
      // step i's per-key first-completion frame feeds BOTH its own count
      // and step i+1's join — materialize once, not once per consumer
      reached = qualified.groupBy("__k").agg(min(col("__ts")).as("__ts"))
        .localCheckpoint()
      reached.agg(count(lit(1)).as("n_keys"))
        .select(lit(i + 1).as("step"), lit(step).as("step_name"),
          col("n_keys"))
    }
    counts.reduce(_ unionAll _)
  }
}
