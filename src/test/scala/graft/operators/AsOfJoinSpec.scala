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
