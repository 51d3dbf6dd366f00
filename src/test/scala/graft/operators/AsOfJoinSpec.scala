package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** As-of semantics on a hand-built timeline: inclusive same-instant
  * match, carry-forward across multiple probes, null before any match,
  * per-user isolation. */
class AsOfJoinSpec extends SparkTestBase {

  private def ev(id: Long, user: Long, tMs: Long, typ: String) =
    (id, user, new java.sql.Timestamp(tMs), typ, id.toDouble)

  test("latest view at or before each purchase, per user") {
    import spark.implicits._
    val events = Seq(
      ev(1, 1, 1000, "purchase"), // before any view -> null match
      ev(2, 1, 2000, "view"),
      ev(3, 1, 3000, "purchase"), // -> view 2
      ev(4, 1, 4000, "view"),
      ev(5, 1, 5000, "view"),
      ev(6, 1, 6000, "purchase"), // -> view 5 (latest, not first)
      ev(7, 2, 5500, "view"),
      ev(8, 2, 5500, "purchase"), // same instant, same user -> view 7
      ev(9, 3, 7000, "purchase"), // user 3 has views only on OTHER users
      ev(10, 1, 8000, "click")    // other types ignored
    ).toDF("event_id", "user_id", "ts", "event_type", "value")

    val got = AsOfJoin.latestBefore(events, "view", "purchase")
      .select("event_id", "asof_event_id", "gap_ms")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet

    assert(got == Set(
      (1L, -1L, -1L),
      (3L, 2L, 1000L),
      (6L, 5L, 1000L),
      (8L, 7L, 0L),
      (9L, -1L, -1L)))
  }

  test("bucketed: boundary carry-over — a view in an earlier bucket still matches") {
    import spark.implicits._
    val events = Seq(
      ev(1, 1, 1000, "view"),
      ev(2, 1, 99000, "purchase"),  // many empty buckets later -> view 1
      ev(3, 1, 99500, "view"),
      ev(4, 1, 99900, "purchase"),  // in-bucket view 3 beats carried view 1
      ev(5, 2, 50000, "purchase")   // no view ever -> null
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    // 5-second buckets: events 1 and 2 are ~20 buckets apart
    val got = AsOfJoin.latestBeforeBucketed(events, "view", "purchase", 5000000L)
      .select("event_id", "asof_event_id", "gap_ms")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(got == Set((2L, 1L, 98000L), (4L, 3L, 400L), (5L, -1L, -1L)))
  }

  test("bucketed: a mega-user's windows partition on (user, bucket), results equal plain") {
    import spark.implicits._
    // one user with 100x everyone else's events, spread over many buckets
    val mega = (0 until 400).map(i =>
      ev(100 + i, 7, 1000L * i, if (i % 4 == 0) "purchase" else "view"))
    val normal = Seq(ev(1, 1, 5000, "view"), ev(2, 1, 9000, "purchase"))
    val events = (mega ++ normal)
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val bucketed = AsOfJoin.latestBeforeBucketed(events, "view", "purchase", 10000000L)
    // every window in the big-data path is keyed by (user_id, bucket):
    // no partition holds the mega-user's whole history
    val windowSpecs = "windowspecdefinition\\([^)]*\\)".r
      .findAllIn(bucketed.queryExecution.optimizedPlan.toString).toSeq
    assert(windowSpecs.nonEmpty)
    val rowWindows = windowSpecs.filterNot(_.contains("unboundedpreceding$(), -1"))
    assert(rowWindows.nonEmpty && rowWindows.forall(_.contains("__bucket")),
      s"in-bucket window not keyed by (user, bucket):\n$windowSpecs")
    // the mega-user spans many bucket partitions
    assert(events.where(col("user_id") === 7)
      .select(floor(unix_micros(col("ts")) / 10000000L)).distinct().count() > 10)
    val plain = AsOfJoin.latestBefore(events, "view", "purchase")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getLong(0), if (r.isNullAt(4)) -1L else r.getLong(4),
        if (r.isNullAt(6)) -1L else r.getLong(6))).toSet
    assert(canon(bucketed) == canon(plain))
  }

  test("one exchange: the plan shuffles on user_id once, no join") {
    import spark.implicits._
    val events = Seq(ev(1, 1, 1000, "view"), ev(2, 1, 2000, "purchase"))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val plan = AsOfJoin.latestBefore(events, "view", "purchase")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"))
    assert("hashpartitioning".r.findAllIn(plan).length == 1)
  }
}
