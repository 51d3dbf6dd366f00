package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Hand-computed cases for the three time-series preps: grid coverage +
  * carry-forward semantics of gapFill, run compression and interval
  * chaining of scd2, and context windows of nextItemExamples. */
class TimeseriesSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gapFill: every hour in the span appears once; gaps carry the last value") {
    val df = Seq(
      (1L, ts("2024-01-01 05:10:00"), 10.0),
      (1L, ts("2024-01-01 05:40:00"), 2.0),   // same hour -> sums to 12
      (1L, ts("2024-01-01 08:05:00"), 7.0),   // 06:00 and 07:00 are gaps
      (2L, ts("2024-01-01 00:00:00"), 1.0)    // single-hour user: no gaps
    ).toDF("user_id", "ts", "value")
    val out = Timeseries.gapFill(df, "user_id", "ts", "value")
      .orderBy("user_id", "hour").collect()
    assert(out.length == 5) // user 1: 05,06,07,08; user 2: 00
    val u1 = out.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getTimestamp(1).toString.substring(11, 13)).toSeq ==
      Seq("05", "06", "07", "08"))
    assert(u1.map(_.getLong(2)).toSeq == Seq(2L, 0L, 0L, 1L))          // n_events
    assert(u1.map(_.getDouble(3)).toSeq == Seq(12.0, 12.0, 12.0, 7.0)) // ffill
    assert(u1.map(_.getBoolean(4)).toSeq == Seq(false, true, true, false))
  }

  test("scd2: consecutive equal values compress; intervals chain and close") {
    val df = Seq(
      (1L, "a", ts("2024-01-01 00:00:00"), 1L),
      (1L, "a", ts("2024-01-02 00:00:00"), 2L),
      (1L, "b", ts("2024-01-03 00:00:00"), 3L),
      (1L, "a", ts("2024-01-04 00:00:00"), 4L) // returns to a: NEW version
    ).toDF("user_id", "event_type", "ts", "event_id")
    val out = Timeseries.scd2(df, "user_id", "event_type", "ts", "event_id")
      .orderBy("version").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
    assert(out.map(_.getString(2)).toSeq == Seq("a", "b", "a"))
    assert(out.map(_.getLong(5)).toSeq == Seq(2L, 1L, 1L)) // n_obs
    // each interval closes exactly where the next opens
    assert(out(0).getTimestamp(4) == out(1).getTimestamp(3))
    assert(out(1).getTimestamp(4) == out(2).getTimestamp(3))
    assert(out(2).getTimestamp(4) == ts(Timeseries.HighDate))
    assert(out.map(_.getBoolean(6)).toSeq == Seq(false, false, true))
  }

  test("nextItemExamples: short prefixes shrink; first event emits nothing") {
    val df = Seq(
      (1L, "x", ts("2024-01-01 00:00:00"), 1L),
      (1L, "y", ts("2024-01-02 00:00:00"), 2L),
      (1L, "z", ts("2024-01-03 00:00:00"), 3L),
      (1L, "w", ts("2024-01-04 00:00:00"), 4L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val out = Timeseries.nextItemExamples(
      df, "user_id", "event_type", "ts", "event_id", historyLen = 3)
      .orderBy("position").collect()
    assert(out.map(_.getString(3)).toSeq ==
      Seq("x", "x > y", "x > y > z")) // oldest -> newest, grows to 3
    assert(out.map(_.getString(4)).toSeq == Seq("y", "z", "w"))
    assert(out.map(_.getInt(2)).toSeq == Seq(2, 3, 4))
  }

  test("auc: hand-computed rank-sum with ties and degenerate guards") {
    // scores: pos {4, 2}, neg {3, 2, 1} -> pairs: (4 beats all 3) +
    // (2 beats 1, loses to 3, ties 2 -> 0.5) = 4.5 / 6 = 0.75
    val scored = Seq((1L, 10L, 4L), (1L, 11L, 2L), (1L, 20L, 3L),
      (1L, 21L, 2L), (1L, 22L, 1L),
      (2L, 10L, 5L), (2L, 11L, 6L) // all positive -> undefined
    ).toDF("query_id", "item", "score")
    val truth = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L))
      .toDF("query_id", "item")
    val rows = Evaluation.auc(scored, truth).orderBy("query_id").collect()
    assert(rows(0).getDouble(rows(0).fieldIndex("auc")) == 0.75)
    assert(rows(0).getLong(rows(0).fieldIndex("n_pos")) == 2L)
    assert(rows(0).getLong(rows(0).fieldIndex("n_neg")) == 3L)
    assert(rows(1).isNullAt(rows(1).fieldIndex("auc")))
  }

  test("transitions: adjacent-pair counts and per-source probabilities") {
    // user 1: a b a b; user 2: a b  =>  a->b: 3, b->a: 1
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 00:00:01"), "a"),
      (1L, 2L, ts("2024-01-01 00:00:02"), "b"),
      (1L, 3L, ts("2024-01-01 00:00:03"), "a"),
      (1L, 4L, ts("2024-01-01 00:00:04"), "b"),
      (2L, 5L, ts("2024-01-01 00:00:01"), "a"),
      (2L, 6L, ts("2024-01-01 00:00:02"), "b")
    ).toDF("user_id", "event_id", "t", "state")
    val got = Timeseries.transitions(ev, "user_id", "state", "t", "event_id")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(("a", "b") -> ((3L, 1.0)), ("b", "a") -> ((1L, 1.0))))
  }

  test("funnel: steps only count at-or-after the previous step's first hit") {
    val ev = Seq(
      // u1 completes the funnel in order
      (1L, ts("2024-01-01 00:00:01"), "view"),
      (1L, ts("2024-01-01 00:00:02"), "click"),
      (1L, ts("2024-01-01 00:00:03"), "purchase"),
      // u2 purchases BEFORE clicking: purchase must not count
      (2L, ts("2024-01-01 00:00:01"), "view"),
      (2L, ts("2024-01-01 00:00:02"), "purchase"),
      (2L, ts("2024-01-01 00:00:03"), "click"),
      // u3 clicks before any view: neither click nor purchase counts
      (3L, ts("2024-01-01 00:00:01"), "click"),
      (3L, ts("2024-01-01 00:00:02"), "view")
    ).toDF("user_id", "t", "etype")
    val got = Timeseries.funnel(ev, "user_id", "etype", "t",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got == Map(1 -> 3L, 2 -> 2L, 3 -> 1L))
  }

  test("ewma: renormalized lag weights, exact at alpha = 0.5") {
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 00:00:01"), 1.0),
      (1L, 2L, ts("2024-01-01 00:00:02"), 2.0),
      (1L, 3L, ts("2024-01-01 00:00:03"), 4.0)
    ).toDF("user_id", "event_id", "t", "v")
    val got = Timeseries.ewma(ev, "user_id", "t", "event_id", "v", 0.5, 6)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    // first row: only itself; second: (200 + 0.5*100)/1.5;
    // third: (400 + 0.5*200 + 0.25*100)/1.75
    assert(got(1L) == 100.0)
    assert(got(2L) == 166.666667) // round(250/1.5, 6)
    assert(got(3L) == 300.0)
  }

  test("retentionCohorts: users cohorted by first ISO week, offsets in weeks") {
    val ev = Seq(
      // u1 first active wk of Jan 1 (Mon), returns wk+1 and wk+3
      (1L, ts("2024-01-02 10:00:00")), (1L, ts("2024-01-09 10:00:00")),
      (1L, ts("2024-01-23 10:00:00")),
      // u2 same cohort, only week 0 (two events, counted once)
      (2L, ts("2024-01-03 10:00:00")), (2L, ts("2024-01-04 10:00:00")),
      // u3 cohort wk of Jan 8, returns wk+1
      (3L, ts("2024-01-10 10:00:00")), (3L, ts("2024-01-15 10:00:00"))
    ).toDF("user_id", "t")
    val got = Timeseries.retentionCohorts(ev, "user_id", "t")
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("2024-01-01", 0L) -> 2L, ("2024-01-01", 1L) -> 1L,
      ("2024-01-01", 3L) -> 1L,
      ("2024-01-08", 0L) -> 1L, ("2024-01-08", 1L) -> 1L))
  }

  test("activeUsers: dau/wau/mau windows, distinct within window") {
    val ev = Seq(
      (1L, ts("2024-01-01 01:00:00")), (1L, ts("2024-01-01 02:00:00")),
      (2L, ts("2024-01-01 03:00:00")),
      (1L, ts("2024-01-05 01:00:00")),
      (3L, ts("2024-01-20 01:00:00"))
    ).toDF("user_id", "t")
    val got = Timeseries.activeUsers(ev, "user_id", "t")
      .collect()
      .map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("2024-01-01") == ((2L, 2L, 2L)))
    // Jan 5: only u1 that day; u1+u2 within trailing 7d
    assert(got("2024-01-05") == ((1L, 2L, 2L)))
    // Jan 20: u3 alone in 7d; Jan 1/5 activity within trailing 28d
    assert(got("2024-01-20") == ((1L, 1L, 3L)))
  }

  test("cusumFlags: constant series never flags; a planted shift does") {
    val flat = (1 to 20).map(i =>
      (1L, i.toLong, ts(f"2024-01-01 00:${i}%02d:00"), 50.0))
    assert(Timeseries.cusumFlags(flat.toDF("user_id", "event_id", "t", "v"),
      "user_id", "t", "event_id", "v", 1L).isEmpty)

    // level shift halfway: 10×$10 then 10×$90 (mean $50); |C_i·n| =
    // |20·prefix_i − i·100000| peaks at the boundary — rows 8..12 clear
    // the 600000 bar, early rows stay under it
    val shifted = (1 to 20).map { i =>
      val v = if (i <= 10) 10.0 else 90.0
      (1L, i.toLong, ts(f"2024-01-01 00:${i}%02d:00"), v)
    }
    val got = Timeseries.cusumFlags(shifted.toDF("user_id", "event_id", "t", "v"),
      "user_id", "t", "event_id", "v", 30000L)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // C_i·n at the boundary: n=20, prefix_10=10000 cents, S=100000 →
    // 20·10000 − 10·100000 = −800000; |−800000| > 30000·20=600000 ✓
    assert(got.contains(10L) && got(10L) == -800000L)
    // early rows cannot exceed the threshold
    assert(!got.contains(1L) && !got.contains(2L))
  }

  test("trending: windows split at the anchor; lift ranks risers first") {
    import java.sql.Date
    def day(s: String) = Date.valueOf(s)
    // anchor = max day = Mar 30, windowDays = 14:
    // recent = diff < 14 (after Mar 16); prior = 14 ≤ diff < 28
    // (Mar 2 .. Mar 16); older rows drop out entirely
    val rows =
      // rising: 2 prior (Mar 10), 8 recent (Mar 20) → lift 9/3 = 3.0
      Seq.fill(2)(("rising", day("2024-03-10"))) ++
        Seq.fill(8)(("rising", day("2024-03-20"))) ++
        // flat: 6 prior, 6 recent → lift 7/7 = 1.0
        Seq.fill(6)(("flat", day("2024-03-10"))) ++
        Seq.fill(6)(("flat", day("2024-03-20"))) ++
        // new: nothing prior (2023 rows excluded), 5 recent → lift 6/1 = 6.0
        Seq.fill(9)(("new", day("2023-01-01"))) ++
        Seq.fill(5)(("new", day("2024-03-30")))
    val got = Timeseries.trending(rows.toDF("k", "d"), "k", "d", 14, 5L, 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("new", 0L, 5L, 6.0), ("rising", 2L, 8L, 3.0), ("flat", 6L, 6L, 1.0)))
  }

  test("seasonalProfile: per-hour counts and exact integer-ratio means") {
    val ev = Seq(
      ("a", ts("2024-01-01 09:10:00"), 1.0),
      ("a", ts("2024-01-02 09:50:00"), 2.0), // same hour, next day
      ("a", ts("2024-01-01 17:00:00"), 10.0),
      ("b", ts("2024-01-01 09:30:00"), 7.0)
    ).toDF("k", "t", "v")
    val got = Timeseries.seasonalProfile(ev, "k", "t", "v")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got(("a", 9L)) == ((2L, 150.0)))  // (100+200)/2 cents
    assert(got(("a", 17L)) == ((1L, 1000.0)))
    assert(got(("b", 9L)) == ((1L, 700.0)))
    assert(got.size == 3)
  }

  test("sessionPaths: gap splits sessions, steps capped, paths counted") {
    val ev = Seq(
      // u1 session 1: v>c>p ; session 2 (next day): v>v
      (1L, 1L, ts("2024-01-01 09:00:00"), "view"),
      (1L, 2L, ts("2024-01-01 09:05:00"), "click"),
      (1L, 3L, ts("2024-01-01 09:10:00"), "purchase"),
      (1L, 4L, ts("2024-01-02 09:00:00"), "view"),
      (1L, 5L, ts("2024-01-02 09:01:00"), "view"),
      // u2 one session: v>c>p (same path as u1 s1)
      (2L, 6L, ts("2024-01-01 10:00:00"), "view"),
      (2L, 7L, ts("2024-01-01 10:30:00"), "click"),
      (2L, 8L, ts("2024-01-01 10:40:00"), "purchase"),
      // u3: 7 events in one session — only first 5 enter the path
      (3L, 10L, ts("2024-01-01 01:00:00"), "view"),
      (3L, 11L, ts("2024-01-01 01:01:00"), "view"),
      (3L, 12L, ts("2024-01-01 01:02:00"), "view"),
      (3L, 13L, ts("2024-01-01 01:03:00"), "view"),
      (3L, 14L, ts("2024-01-01 01:04:00"), "view"),
      (3L, 15L, ts("2024-01-01 01:05:00"), "purchase"),
      (3L, 16L, ts("2024-01-01 01:06:00"), "purchase")
    ).toDF("user_id", "event_id", "t", "etype")
    val got = Timeseries.sessionPaths(ev, "user_id", "t", "event_id",
        "etype", 28800000L, 5, 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "view>click>purchase" -> 2L,
      "view>view" -> 1L,
      "view>view>view>view>view" -> 1L))
  }

  test("reachCurve: cumulative distinct users; repeat activity adds nothing") {
    val ev = Seq(
      (1L, ts("2024-01-01 09:00:00")), (2L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-03 09:00:00")),                 // repeat: no new
      (3L, ts("2024-01-05 09:00:00"))
    ).toDF("user_id", "t")
    val got = Timeseries.reachCurve(ev, "user_id", "t")
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      "2024-01-01" -> ((2L, 2L)),
      "2024-01-03" -> ((0L, 2L)),
      "2024-01-05" -> ((1L, 3L))))
  }

  test("growthAccounting: new/retained/resurrected split + churn identity") {
    val ev = Seq(
      // w1 (Jan 1): users 1,2 new
      (1L, ts("2024-01-02 09:00:00")), (2L, ts("2024-01-03 09:00:00")),
      // w2 (Jan 8): 1 retained; 3 new; 2 churns out of w2
      (1L, ts("2024-01-09 09:00:00")), (3L, ts("2024-01-10 09:00:00")),
      // w4 (Jan 22): 2 resurrected (gap), 1 churned in w3... only weeks
      // with activity are emitted — w3 has none
      (2L, ts("2024-01-23 09:00:00"))
    ).toDF("user_id", "t")
    val got = Timeseries.growthAccounting(ev, "user_id", "t")
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // (n_active, n_new, n_retained, n_resurrected, n_churned)
    assert(got("2024-01-01") == ((2L, 2L, 0L, 0L, 0L)))
    assert(got("2024-01-08") == ((2L, 1L, 1L, 0L, 1L))) // user 2 churned
    // w of Jan 22: prev scaffold week (Jan 15) had 0 actives → churned
    // = 0 − 0; user 2 resurrects
    assert(got("2024-01-22") == ((1L, 0L, 0L, 1L, 0L)))
  }

  test("ltvTriangle: cum telescopes to the cohort total; ages are month gaps") {
    import java.sql.Date
    val o = Seq(
      // cohort 2024-01: cust 1 buys in Jan (200), Mar (300); cust 2 Jan (100)
      (1L, Date.valueOf("2024-01-05"), 200L),
      (1L, Date.valueOf("2024-03-20"), 300L),
      (2L, Date.valueOf("2024-01-31"), 100L),
      // cohort 2024-02: cust 3 alone, two orders same month
      (3L, Date.valueOf("2024-02-10"), 50L),
      (3L, Date.valueOf("2024-02-11"), 70L)
    ).toDF("cust", "day", "cents")
    val got = Timeseries.ltvTriangle(o, "cust", "day", "cents")
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // (n_orders, n_active, cents, cum_cents)
    assert(got(("2024-01-01", 0)) == ((2L, 2L, 300L, 300L)))
    assert(got(("2024-01-01", 2)) == ((1L, 1L, 300L, 600L))) // Feb absent
    assert(got(("2024-02-01", 0)) == ((2L, 1L, 120L, 120L)))
    assert(got.size == 3)
  }

  test("kmSurvival: hand-computed product-limit with censoring") {
    // classic small case: events at t=1 (2 of 5) and t=3 (1 of 2),
    // censored at t=2 (1) and t=3 (1)
    val d = Seq((1L, 1L), (1L, 1L), (2L, 0L), (3L, 1L), (3L, 0L))
      .toDF("t", "ev")
    val got = Timeseries.kmSurvival(d, "t", "ev")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // t=1: n=5, d=2 -> S = 3/5 = 0.6
    // t=2: n=3, d=0 (pure censor) -> S unchanged 0.6
    // t=3: n=2, d=1 -> S = 0.6 * 1/2 = 0.3
    assert(got(1L) == ((5L, 2L, 0L, 0.6)))
    assert(got(2L) == ((3L, 0L, 1L, 0.6)))
    assert(got(3L) == ((2L, 1L, 1L, 0.3)))
  }

  test("burstiness: metronome is -1, a heavy-tailed key is positive") {
    // key "m": gaps all 10us -> sigma=0 -> B=-1, cv=0
    // key "b": gaps 1,1,1,97 -> B=0.248902, cv=1.662769 (hand-computed)
    val df = (Seq(0L, 1L, 2L, 3L, 100L).map(u => ("b", u)) ++
      (0 to 4).map(i => ("m", 10L * i)))
      .toDF("k", "us")
      .select(col("k"), timestamp_micros(col("us")).as("t"),
        col("us").as("tie"))
    val got = Timeseries.burstiness(df, "k", "t", "tie")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got("m") == ((4L, 40L, -1.0, 0.0)))
    assert(got("b") == ((4L, 100L, 0.248902, 1.662769)))
  }

  test("lagCorrelation: a shifted copy peaks at exactly its lag") {
    import java.sql.Date
    // b(t) = a(t-2): corr(a(t), b(t+lag)) = 1.0 at lag = 2
    val base = Seq(5L, 9L, 2L, 7L, 4L, 8L, 1L, 6L, 3L, 10L)
    val days = base.indices.map(i => Date.valueOf(f"2024-01-${i + 1}%02d"))
    val shifted = base.indices.map(i =>
      if (i >= 2) base(i - 2) else 0L) // first two days arbitrary
    val daily = days.indices.map(i => (days(i), base(i), shifted(i)))
      .toDF("day", "a", "b")
    val got = Timeseries.lagCorrelation(daily, "day", "a", "b", 3)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got(2)._1 == 8L)    // 8 aligned days at lag 2
    assert(got(2)._2 == 1.0)   // perfect correlation at the true lag
    assert(got.keySet == (-3 to 3).toSet)
    assert((-3 to 3).filter(_ != 2).forall(l => got(l)._2 < 1.0))
  }

  test("kmSurvival: total failure at the last time point pins S to 0") {
    val d = Seq((1L, 1L), (2L, 1L), (2L, 1L)).toDF("t", "ev")
    val got = Timeseries.kmSurvival(d, "t", "ev")
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(math.abs(got(1L) - 2.0 / 3.0) < 1e-6)
    assert(got(2L) == 0.0)
  }

  test("rfm: quintiles rank value-then-customer and segments follow the grid") {
    import spark.implicits._
    // customer i has i orders, last order on 1998-01-0i, 100*i cents
    // each: with 5 customers every ntile(5) bucket holds exactly one
    val orders = (1 to 5).flatMap { i =>
      (1 to i).map(j => (i.toLong, s"1998-01-0$i", 100L * i))
    }.toDF("c", "dt", "cents").withColumn("dt", col("dt").cast("date"))
    val out = Timeseries.rfm(orders, "c", "dt", "cents", "1998-08-02")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getString(7)))).toMap
    // customer 5: most recent, most orders, most spend -> 5/5/5 champion
    assert(out(5L)._4 == 5L && out(5L)._5 == 5L && out(5L)._6 == 5L)
    assert(out(5L)._7 == "champion")
    // customer 1: oldest, fewest, least -> 1/1/1 hibernating
    assert(out(1L)._4 == 1L && out(1L)._5 == 1L && out(1L)._6 == 1L)
    assert(out(1L)._7 == "hibernating")
    // recency/frequency/monetary raw values are exact
    assert(out(3L)._2 == 3L && out(3L)._3 == 3L * 300L)
  }
}
