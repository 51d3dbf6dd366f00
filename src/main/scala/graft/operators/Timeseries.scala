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

  /** Bounded-lag exponentially-weighted moving average — the smoothed
    * per-key signal a monitoring/feature pipeline reads instead of the
    * raw series. The classic recursive EWMA is a sequential scan
    * (hostile to both distribution and cross-engine replay); truncating
    * at `lags` terms makes it a FIXED linear combination of the last
    * lags+1 observations: weights (1−α)^i renormalized over the lags
    * actually present, so early rows use their shorter history.
    *
    * Determinism: values snap to cents; each row's result is one fixed
    * left-to-right chain of double ops over its own lag stack — no
    * accumulation across rows, bit-identical in any engine with the
    * same lag semantics. Truncation bias vs the infinite EWMA is
    * (1−α)^(lags+1) of the older mass — 0.8% at α=0.5, lags=6.
    *
    * Scale: one window pass keyed by `keyCol` (bounded lag stack, no
    * collect), same mega-key spill behavior as every window here.
    *
    * @return input keys + (cents, ewma) — ewma rounded to 6 dp. */
  def ewma(events: DataFrame, keyCol: String, tsCol: String, tieCol: String,
           valCol: String, alpha: Double = 0.5, lags: Int = 6): DataFrame = {
    require(lags >= 1 && alpha > 0 && alpha <= 1, "need lags >= 1, 0 < alpha <= 1")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val cents = floor(col(valCol) * lit(100) + lit(0.5)).cast("long")
    val withLags = events.select(col(keyCol), col(tsCol), col(tieCol),
      cents.as("cents"))
    val xs = (0 to lags).map {
      case 0 => col("cents")
      case i => lag(col("cents"), i).over(w)
    }
    val ws = (0 to lags).map(i => math.pow(1.0 - alpha, i))
    // explicit left-to-right chains fix the double-addition order the
    // oracle replays term by term. Term 0 (the row's OWN value) is
    // deliberately unconditional: a NULL current value propagates to a
    // NULL ewma on both engines (the oracle's `cents * 1.0` does the
    // same) — only MISSING LAGS renormalize, not missing observations.
    val num = xs.zip(ws).zipWithIndex.map {
      case ((x, _), 0) => x.cast("double") * lit(1.0)
      case ((x, wi), _) =>
        when(x.isNotNull, x.cast("double") * lit(wi)).otherwise(lit(0.0))
    }.reduceLeft(_ + _)
    val den = xs.zip(ws).zipWithIndex.map {
      case ((_, _), 0) => lit(1.0)
      case ((x, wi), _) => when(x.isNotNull, lit(wi)).otherwise(lit(0.0))
    }.reduceLeft(_ + _)
    withLags.select(col(keyCol), col(tieCol), col("cents"),
      round(num / den, 6).as("ewma"))
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

  /** Cohort retention matrix — the product-analytics staple: users are
    * cohorted by the ISO week of their FIRST event; cell (cohort, k)
    * counts how many of them were active k weeks later. Week truncation
    * is ISO-Monday in both Spark (`date_trunc('week')`) and DuckDB —
    * offsets are exact integer day differences / 7.
    *
    * Spark shape: distinct (user, week) pairs (one partial-agg shuffle,
    * output bounded by users×weeks), per-user min week (one groupBy —
    * output |users|), one equi-join back on user, then the final tiny
    * aggregate. No window over a user's full history anywhere.
    *
    * @return (cohort_week DATE, week_offset, n_users) */
  def retentionCohorts(events: DataFrame, keyCol: String,
                       tsCol: String): DataFrame = {
    val pairs = events
      .select(col(keyCol).as("__k"),
        to_date(date_trunc("week", col(tsCol))).as("wk"))
      .distinct()
    val cohort = pairs.groupBy("__k").agg(min("wk").as("cohort_week"))
    pairs.join(cohort, Seq("__k"))
      .groupBy(col("cohort_week"),
        (datediff(col("wk"), col("cohort_week")) / 7).cast("long")
          .as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Rolling active users — DAU / WAU(7d) / MAU(28d) per day, exact
    * distinct counts. The window is materialized by FAN-OUT, not a range
    * join: each distinct (user, day) pair contributes to the 28 target
    * days it can influence, then one aggregate counts distinct users per
    * target day under each window predicate. Fan-out is a fixed ×28 of
    * the DISTINCT pair set (already ≪ raw events), every join is
    * equi-keyed, and no per-user history is ever sorted — the shape
    * survives any user count. Output days are restricted to days with
    * at least one event (no phantom trailing windows).
    *
    * @return (day DATE, dau, wau, mau) */
  def activeUsers(events: DataFrame, keyCol: String,
                  tsCol: String): DataFrame = {
    val pairs = events
      .select(col(keyCol).as("__k"), to_date(col(tsCol)).as("d"))
      .distinct()
    val days = pairs.select(col("d").as("day")).distinct()
    val fanned = pairs
      .select(col("__k"), col("d"),
        explode(sequence(col("d"), date_add(col("d"), 27))).as("day"))
    fanned.join(days, Seq("day"))
      .groupBy("day")
      .agg(
        count_distinct(when(col("day") === col("d"), col("__k"))).as("dau"),
        count_distinct(when(datediff(col("day"), col("d")) < 7, col("__k")))
          .as("wau"),
        count_distinct(col("__k")).as("mau"))
  }

  /** Top-k session paths — the navigation-flow report: sessionize by
    * inactivity gap (the q29 rule), take each session's first `maxSteps`
    * event types in time order, join them into a path string, and count
    * paths corpus-wide. "view>click>purchase vs view>view>view" is the
    * product question; the path string is deterministic because the
    * in-session order is the total (t, tie) order.
    *
    * Spark shape: the relational sessionizer (lag → gap flag → running
    * sum; spillable window, no object state), a row_number cap at
    * maxSteps, one collect_list bounded at maxSteps elements per
    * session, then a path-count aggregate. Top-k is
    * TakeOrderedAndProject.
    *
    * @return (path, n) — top k by count desc, then path */
  def sessionPaths(events: DataFrame, keyCol: String, tsCol: String,
                   tieCol: String, typeCol: String, gapMs: Long,
                   maxSteps: Int, k: Int): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col("__t"), col(tieCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = events.select(col(keyCol), col(tieCol),
        unix_millis(col(tsCol)).as("__t"), col(typeCol).as("__ty"))
      .withColumn("__brk",
        when(lag(col("__t"), 1).over(w).isNull, lit(0))
          .when(col("__t") - lag(col("__t"), 1).over(w) >= gapMs, lit(1))
          .otherwise(lit(0)))
      .withColumn("__sid", sum(col("__brk")).over(run))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(keyCol), col("__sid"))
          .orderBy(col("__t"), col(tieCol))))
      .where(col("__rn") <= maxSteps)
    base
      .groupBy(col(keyCol), col("__sid"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__t"), col(tieCol), col("__ty")))),
        x => x.getField("__ty")), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path")).limit(k)
  }

  /** Cumulative reach curve — per activity day, how many DISTINCT users
    * have ever been seen up to and including that day. Computed from the
    * per-user FIRST day (one groupBy, |users| rows) rolled up to a
    * per-day new-user count and a running sum over the tiny day-level
    * frame — the raw event volume is never windowed.
    *
    * @return (day, n_new, cum_users) for every day with activity */
  def reachCurve(events: DataFrame, keyCol: String,
                 tsCol: String): DataFrame = {
    val days = events.select(to_date(col(tsCol)).as("day")).distinct()
    val newPerDay = events
      .groupBy(col(keyCol)).agg(min(to_date(col(tsCol))).as("day"))
      .groupBy("day").agg(count(lit(1)).as("n_new"))
    // day-level frame only (≤ |days| rows) — single-partition window OK
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    days.join(newPerDay, Seq("day"), "left")
      .select(col("day"), coalesce(col("n_new"), lit(0L)).as("n_new"))
      .withColumn("cum_users", sum("n_new").over(w))
  }

  /** Weekly growth accounting — the standard active-user decomposition:
    * every active user each ISO week is exactly one of NEW (first week
    * ever), RETAINED (active the immediately previous week) or
    * RESURRECTED (returning after a gap); CHURNED for week w counts the
    * users active in w−1 who did not return in w
    * (actives(w−1) − retained(w) — an identity, not a fourth scan).
    *
    * Spark shape: the distinct (user, week) frame, one lag window keyed
    * by user (weeks-per-user sized), then week-level aggregates and one
    * self-join of the tiny weekly frame for the churn identity.
    *
    * @return (week, n_active, n_new, n_retained, n_resurrected,
    *         n_churned) per activity week */
  def growthAccounting(events: DataFrame, keyCol: String,
                       tsCol: String): DataFrame = {
    val uw = events
      .select(col(keyCol).as("__k"),
        to_date(date_trunc("week", col(tsCol))).as("week"))
      .distinct()
    val lagged = uw.withColumn("__prev",
      lag(col("week"), 1).over(Window.partitionBy("__k").orderBy("week")))
    val status = lagged.select(col("week"),
      when(col("__prev").isNull, "new")
        .when(datediff(col("week"), col("__prev")) === 7, "retained")
        .otherwise("resurrected").as("__st"))
    val weekly = status.groupBy("week")
      .agg(count(lit(1)).as("n_active"),
        count(when(col("__st") === "new", 1)).as("n_new"),
        count(when(col("__st") === "retained", 1)).as("n_retained"),
        count(when(col("__st") === "resurrected", 1)).as("n_resurrected"))
    val prevActive = weekly.select(date_add(col("week"), 7).as("week"),
      col("n_active").as("__pa"))
    weekly.join(prevActive, Seq("week"), "left")
      .select(col("week"), col("n_active"), col("n_new"),
        col("n_retained"), col("n_resurrected"),
        (coalesce(col("__pa"), lit(0L)) - col("n_retained"))
          .as("n_churned"))
  }

  /** Hour-of-day seasonal profile — the diurnal baseline a monitoring
    * or capacity pipeline subtracts before calling anything anomalous:
    * per (key, hour 0–23 UTC) the event count and mean value. Mean is
    * ONE division of two exact integers (cents sum / count) — replayed
    * bit-identically by any engine; no per-row double accumulates.
    *
    * Scale: one groupBy over a ≤ |keys|·24 result space — partial
    * aggregation collapses everything map-side.
    *
    * @return (key, hour, n, mean_cents) — mean at 6 dp */
  def seasonalProfile(events: DataFrame, keyCol: String, tsCol: String,
                      valCol: String): DataFrame =
    events
      .groupBy(col(keyCol), hour(col(tsCol)).cast("long").as("hour"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col(valCol) * lit(100) + lit(0.5)).cast("long")).as("__s"))
      .select(col(keyCol), col("hour"), col("n"),
        round(col("__s").cast("double") / col("n").cast("double"), 6)
          .as("mean_cents"))

  /** Window-over-window trending score — "what is rising": per key,
    * activity in the trailing window vs the window before it, scored by
    * the add-one-smoothed ratio (c_recent+1)/(c_prior+1). The anchor is
    * the corpus max day, so the query is reproducible (no wall clock).
    *
    * Spark shape: one scan, two conditional counts in a single groupBy
    * (no self-join of the two windows), the +1 smoothing keeps new keys
    * rankable. The single division of two exact integers is
    * bit-identical cross-engine. Top-k by (lift, key) is
    * TakeOrderedAndProject.
    *
    * @return top-k rising keys: (key, c_prior, c_recent, lift) */
  def trending(df: DataFrame, keyCol: String, dayCol: String,
               windowDays: Int, minRecent: Long, k: Int): DataFrame = {
    val maxDay = df.agg(max(col(dayCol)).as("__maxd"))
    val scored = df
      .crossJoin(broadcast(maxDay))
      .where(datediff(col("__maxd"), col(dayCol)) < 2 * windowDays)
      .groupBy(col(keyCol).as("key"))
      .agg(
        count(when(datediff(col("__maxd"), col(dayCol)) >= windowDays, 1))
          .as("c_prior"),
        count(when(datediff(col("__maxd"), col(dayCol)) < windowDays, 1))
          .as("c_recent"))
      .where(col("c_recent") >= minRecent)
      .withColumn("lift", round((col("c_recent") + 1).cast("double") /
        (col("c_prior") + 1).cast("double"), 6))
    scored.orderBy(col("lift").desc, col("key")).limit(k)
  }

  /** CUSUM changepoint flags — rows where the cumulative deviation of a
    * key's series from its own mean exceeds a threshold (the classic
    * mean-shift chart, cumsum form). All arithmetic is EXACT integer:
    * with per-key count n and total S (cents), the scaled statistic at
    * row i is C_i·n = n·prefix_i − i·S, compared against h·n (h in
    * cents) — no double ever accumulates, so any engine replays it.
    *
    * Spark shape: one window pass keyed by `keyCol` for (prefix, i) and
    * the per-key aggregates over the same partitioning (no second
    * shuffle — same exchange reused). DECIMAL(38,0) widening keeps
    * n·prefix exact for any key size.
    *
    * @return flagged rows: (key, tie, cusum_scaled DECIMAL, n) */
  def cusumFlags(events: DataFrame, keyCol: String, tsCol: String,
                 tieCol: String, valCol: String,
                 thresholdCents: Long): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cents = floor(col(valCol) * lit(100) + lit(0.5)).cast("long")
    val wRun = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keyCol)
    val base = events.select(col(keyCol), col(tsCol), col(tieCol),
        cents.as("__c"))
      .withColumn("__prefix", sum(col("__c")).over(wRun))
      .withColumn("__i", count(lit(1)).over(wRun))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__s", sum(col("__c")).over(wAll))
    base
      .withColumn("__cs",
        dec(col("__n")) * dec(col("__prefix")) - dec(col("__i")) * dec(col("__s")))
      .where(abs(col("__cs")) > dec(lit(thresholdCents)) * dec(col("__n")))
      // the comparison runs in DECIMAL (never wraps); the emitted long is
      // exact while n²·maxCents < 2^63 (≈4·10^5 events per key at $500
      // values) and NULL past it — visible, not silently wrong
      .select(col(keyCol), col(tieCol),
        col("__cs").cast("long").as("cusum_scaled"), col("__n").as("n"))
  }

  /** Cohort LTV triangle — the cumulative-revenue-by-cohort-age matrix a
    * growth team reads payback periods off. Cohort = each key's first
    * activity month; one row per (cohort month, months-since-cohort)
    * with period and cumulative value.
    *
    * Shape: the cohort month comes from a window min over the SAME
    * exchange the per-key grouping would need anyway (one shuffle on
    * key), then one hash aggregation to the (cohort, age) grid —
    * calendar-bounded (months², e.g. 84 months → ≤3.5 k rows), so the
    * cumulative window sorts a dimension-sized frame. All sums are
    * exact integers.
    *
    * @return (cohort_month, age, n_orders, n_active, cents, cum_cents) */
  def ltvTriangle(orders: DataFrame, keyCol: String, dateCol: String,
                  centsCol: String): DataFrame = {
    val o = orders.select(col(keyCol).as("__k"),
      trunc(col(dateCol), "month").as("__m"), col(centsCol).as("__v"))
    val withCohort = o.withColumn("__m0",
      min(col("__m")).over(Window.partitionBy("__k")))
    val tri = withCohort
      .groupBy(col("__m0"),
        ((year(col("__m")) - year(col("__m0"))) * 12 +
          (month(col("__m")) - month(col("__m0")))).as("age"))
      .agg(count(lit(1)).as("n_orders"),
        count_distinct(col("__k")).as("n_active"),
        sum(col("__v")).as("cents"))
    val wc = Window.partitionBy("__m0").orderBy("age")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tri.withColumn("cum_cents", sum(col("cents")).over(wc))
      .select(col("__m0").cast("string").as("cohort_month"), col("age"),
        col("n_orders"), col("n_active"), col("cents"), col("cum_cents"))
  }

  /** Kaplan–Meier survivor curve over right-censored integer durations —
    * one row per subject in `durations` with duration `tCol` and a 0/1
    * `eventCol` (1 = event observed, 0 = censored at t). Output: one row
    * per distinct duration with the at-risk count, event/censor counts,
    * and the product-limit survival estimate.
    *
    * Determinism: Ŝ(t) = Π (1 − dᵢ/nᵢ) is the one order-dependent
    * product in the family, so it folds as the snapped-ln integer sum
    * (the [[graft.operators.TextAnalysis.sliceEntropy]] pattern): each
    * per-row ln((n−d)/n) is floored onto a 1e-6 grid BEFORE the
    * cumulative sum, making the accumulation pure BIGINT; both engines
    * disagree by at most 1 ulp on the per-row ln, which the grid
    * absorbs. A time point where everyone at risk fails (d = n, only
    * possible at the maximum duration) short-circuits to exactly 0.
    *
    * Shape: subjects aggregate to the distinct-duration frame first
    * (one shuffle with map-side combine); every window below sorts that
    * calendar-bounded frame (≤ a few thousand rows at any corpus size),
    * never the subject set. */
  def kmSurvival(durations: DataFrame, tCol: String, eventCol: String)
      : DataFrame = {
    val g = durations.groupBy(col(tCol).as("t"))
      .agg(sum(col(eventCol)).as("d"), count(lit(1)).as("c"))
    val wPrior = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wCum = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risky = g.withColumn("n_risk",
      sum(col("c")).over(wAll) - coalesce(sum(col("c")).over(wPrior), lit(0L)))
    val term = when(col("d") === 0 || col("d") >= col("n_risk"), lit(0L))
      .otherwise(floor(
        log((col("n_risk") - col("d")).cast("double")
          / col("n_risk").cast("double")) * lit(1e6) + lit(0.5)).cast("long"))
    risky.withColumn("__cum", sum(term).over(wCum))
      .select(col("t"), col("n_risk"), col("d").as("n_events"),
        (col("c") - col("d")).as("n_censored"),
        when(col("d") >= col("n_risk"), lit(0.0))
          .otherwise(round(exp(col("__cum").cast("double") / lit(1e6)), 6))
          .as("survival"))
  }

  /** Per-key inter-arrival burstiness — Goh–Barabási
    * B = (σ − μ)/(σ + μ) over the gaps between consecutive events of a
    * key (−1 = metronome, 0 = Poisson, →1 = heavy-tailed bursts), plus
    * the coefficient of variation σ/μ.
    *
    * Exactness: gaps are integer microseconds; with S = Σd and Q = Σd²
    * folded in DECIMAL(38,0), n²σ² = n·Q − S² is EXACT, so
    * B = (√(nQ−S²) − S)/(√(nQ−S²) + S) and cv = √(nQ−S²)/S are fixed
    * expressions over exact integers — IEEE sqrt is correctly rounded,
    * so any engine replays them bit-for-bit.
    *
    * Shape: one exchange on the key, a lag window within it (the cusum
    * shape — a mega-key sorts within its partition and spills, nothing
    * collects), then a per-key aggregate on the same partitioning.
    *
    * @return (key, n_gaps, sum_micros, burstiness, cv) */
  def burstiness(events: DataFrame, keyCol: String, tsCol: String,
                 tieCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val w = Window.partitionBy(keyCol).orderBy(col("__us"), col(tieCol))
    val gaps = events
      .select(col(keyCol), unix_micros(col(tsCol)).as("__us"), col(tieCol))
      .withColumn("__d", col("__us") - lag(col("__us"), 1).over(w))
      .where(col("__d").isNotNull)
    val agg = gaps.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_gaps"),
        sum(dec(col("__d"))).as("__s"),
        sum(dec(col("__d")) * dec(col("__d"))).as("__q"))
    val disc = (dec(col("n_gaps")) * col("__q") - col("__s") * col("__s"))
      .cast("double")
    val root = sqrt(disc)
    val sd = col("__s").cast("double")
    agg.select(col(keyCol), col("n_gaps"),
      col("__s").cast("long").as("sum_micros"),
      round((root - sd) / (root + sd), 6).as("burstiness"),
      round(root / sd, 6).as("cv"))
  }

  /** Lead–lag cross-correlation profile between two daily series —
    * corr(a(t), b(t+lag)) for lag ∈ [−maxLag, maxLag]; the lag that
    * maximizes it is the lead time of a over b ("views lead purchases
    * by k days"). All Pearson moments fold as DECIMAL(38,0)-exact
    * integers per lag; the final expression (one division, two IEEE
    * sqrts) replays identically in any engine.
    *
    * Shape: the input is already the per-day aggregate (calendar-
    * bounded), so the lag fan-out is |days|·(2·maxLag+1) rows meeting
    * on a date equi-join — never a range join, never raw events.
    *
    * @param daily one row per day: (dayCol DATE, aCol, bCol integers)
    * @return (lag, n_days, corr) — corr at 6 dp */
  def lagCorrelation(daily: DataFrame, dayCol: String, aCol: String,
                     bCol: String, maxLag: Int): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val lags = daily.sparkSession.range(-maxLag, maxLag + 1)
      .select(col("id").cast("int").as("lag"))
    val x = daily.select(col(dayCol).as("__xd"), col(aCol).as("__xa"))
    val y = daily.select(col(dayCol).as("__yd"), col(bCol).as("__yb"))
    val j = x.crossJoin(broadcast(lags))
      .join(y, date_add(col("__xd"), col("lag")) === col("__yd"))
    val g = j.groupBy("lag").agg(count(lit(1)).as("n_days"),
      sum(dec(col("__xa"))).as("__sa"), sum(dec(col("__yb"))).as("__sb"),
      sum(dec(col("__xa")) * dec(col("__yb"))).as("__sab"),
      sum(dec(col("__xa")) * dec(col("__xa"))).as("__saa"),
      sum(dec(col("__yb")) * dec(col("__yb"))).as("__sbb"))
    g.select(col("lag"), col("n_days"),
      round((dec(col("n_days")) * col("__sab") - col("__sa") * col("__sb"))
          .cast("double")
        / (sqrt((dec(col("n_days")) * col("__saa")
              - col("__sa") * col("__sa")).cast("double"))
          * sqrt((dec(col("n_days")) * col("__sbb")
              - col("__sb") * col("__sb")).cast("double"))), 6).as("corr"))
  }

  /** RFM segmentation (recency / frequency / monetary) — the classic
    * customer-value partition every CRM/marketing pipeline derives from
    * the order stream: days since last order, order count, lifetime
    * cents, each scored into equal-frequency quintiles (5 = best), and
    * a named segment off the standard (R, F) grid.
    *
    * Determinism: scores are `ntile(5)` over TOTAL orders — value,
    * then customer id — so both engines assign identical buckets; the
    * anchor date is an explicit parameter, never now().
    *
    * Scale: one groupBy(customer) over orders (map-side combinable),
    * then three rank windows over the CUSTOMER-dimension frame — the
    * same dimension-sized single-exchange class as reliabilityBins;
    * shard the ntile by market/region first at lake scale.
    *
    * @return (customer, recency_days, frequency, monetary_cents,
    *         r_score, f_score, m_score, segment) */
  def rfm(orders: DataFrame, custCol: String, dateCol: String,
          centsCol: String, anchorDate: String): DataFrame = {
    val per = orders.groupBy(col(custCol).as("customer"))
      .agg(datediff(lit(anchorDate).cast("date"), max(col(dateCol)))
          .cast("long").as("recency_days"),
        count(lit(1)).as("frequency"),
        sum(col(centsCol)).as("monetary_cents"))
    // 5 = best: most recent / most orders / most spend land in tile 5
    val r = ntile(5).over(Window.orderBy(col("recency_days").desc,
      col("customer")))
    val f = ntile(5).over(Window.orderBy(col("frequency").asc,
      col("customer")))
    val m = ntile(5).over(Window.orderBy(col("monetary_cents").asc,
      col("customer")))
    per.withColumn("r_score", r.cast("long"))
      .withColumn("f_score", f.cast("long"))
      .withColumn("m_score", m.cast("long"))
      .withColumn("segment",
        when(col("r_score") >= 4 && col("f_score") >= 4, "champion")
          .when(col("r_score") >= 4, "recent")
          .when(col("f_score") >= 4, "loyal_lapsing")
          .when(col("r_score") <= 2 && col("f_score") <= 2, "hibernating")
          .otherwise("regular"))
  }
}
