package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import graft.streaming.EventStream._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming surface: tumbling-window agg actually running as a stream
  * (MemoryStream + watermark) and gap-sessionization semantics. */
class EventStreamSpec extends SparkTestBase {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("tumblingCounts as a real stream: windowed counts, late row dropped") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventStream.tumblingCounts(events, "5 minutes", "10 minutes")
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("append").start()
    try {
      mem.addData((ts(0), "click", 1.0), (ts(1), "click", 2.0), (ts(4), "view", 5.0))
      q.processAllAvailable()
      // advance the watermark far enough to close the first window…
      mem.addData((ts(30), "click", 1.0))
      q.processAllAvailable()
      // …then a too-late row for the closed window: must be dropped
      mem.addData((ts(2), "click", 100.0))
      q.processAllAvailable()
      val out = s.sql("SELECT event_type, cnt, sum_value FROM tumbling WHERE win_start = '2024-01-01 10:00:00'")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(out("click") == (2L, 3.0)) // late 100.0 not counted
      assert(out("view") == (1L, 5.0))
    } finally q.stop()
  }

  test("dedupe as a real stream: in-horizon replay dropped, keep-first wins") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val events = mem.toDF().toDF("event_id", "ts", "value")
    val q = EventStream.dedupe(events, "10 minutes")
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts(0), 1.0), (2L, ts(1), 2.0))
      q.processAllAvailable()
      mem.addData((1L, ts(2), 99.0)) // replay of id 1 within horizon
      q.processAllAvailable()
      val out = s.sql("SELECT event_id, value FROM deduped")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(out == Map(1L -> 1.0, 2L -> 2.0)) // first arrival kept
    } finally q.stop()
  }

  test("intervalJoin as a real two-stream join: in-window pairs only") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val vm = MemoryStream[(Long, Timestamp, Long)]
    val cm = MemoryStream[(Long, Timestamp, Long)]
    val views = vm.toDF().toDF("user_id", "ts", "event_id")
    val clicks = cm.toDF().toDF("user_id", "ts", "event_id")
    val q = EventStream.intervalJoin(views, clicks, "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("ij")
      .outputMode("append").start()
    try {
      vm.addData((7L, ts(0), 100L), (8L, ts(0), 101L))
      cm.addData(
        (7L, ts(5), 200L),  // in window  -> pair
        (7L, ts(11), 201L), // past 10min -> no pair
        (8L, ts(3), 202L),  // in window  -> pair
        (9L, ts(4), 203L))  // other user -> no pair
      q.processAllAvailable()
      val out = s.sql("SELECT view_id, click_id, gap_us FROM ij")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(out == Set((100L, 200L, 300000000L), (101L, 202L, 180000000L)))
    } finally q.stop()
  }

  test("bucketed interval join equals the plain-join form on real events") {
    val events = graft.sources.Tables.events(spark, sf())
    val plain = EventStream.intervalJoin(
      events.where(col("event_type") === "view"),
      events.where(col("event_type") === "click"), "30 minutes")
    val bucketed = EventStream.intervalJoinBucketed(
      events, "view", "click", 1800000000L)
    assert(bucketed.count() > 0)
    assert(bucketed.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(bucketed).count() == 0)
    // odd bucket width: equality must hold for ANY maxGapUs
    val plain2 = EventStream.intervalJoin(
      events.where(col("event_type") === "view"),
      events.where(col("event_type") === "click"), "1723 seconds")
    val bucketed2 = EventStream.intervalJoinBucketed(
      events, "view", "click", 1723000000L)
    assert(bucketed2.exceptAll(plain2).count() == 0)
    assert(plain2.exceptAll(bucketed2).count() == 0)
  }

  test("stream-static enrichment: a static dimension joins into the stream") {
    // The third streaming join class (alongside stream-stream q83 and
    // the windowed aggs): a static dim broadcasts into every micro-batch.
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dim = Seq((7L, "gold"), (8L, "basic")).toDF("user_id", "tier")
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val events = mem.toDF().toDF("user_id", "ts", "value")
    val q = events.join(dim, Seq("user_id"))
      .groupBy("tier").agg(sum("value").as("sv"))
      .writeStream.format("memory").queryName("enriched")
      .outputMode("complete").start()
    try {
      mem.addData((7L, ts(0), 1.0), (7L, ts(1), 2.0), (8L, ts(2), 5.0),
        (9L, ts(3), 100.0)) // user 9 has no dim row -> dropped by inner join
      q.processAllAvailable()
      val out = s.sql("SELECT tier, sv FROM enriched")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(out == Map("gold" -> 3.0, "basic" -> 5.0))
    } finally q.stop()
  }

  test("dedupeReplays keeps the first arrival and counts all of them") {
    val df = spark.createDataFrame(Seq(
      (1L, ts(0), 1.0), (1L, ts(2), 99.0), (1L, ts(1), 50.0),
      (2L, ts(3), 7.0)))
      .toDF("event_id", "ts", "value")
    val out = EventStream.dedupeReplays(df).collect()
      .map(r => r.getLong(0) -> (r.getTimestamp(1), r.getDouble(2), r.getLong(3))).toMap
    assert(out(1L) == (ts(0), 1.0, 3L))
    assert(out(2L) == (ts(3), 7.0, 1L))
  }

  test("tumblingCounts batch mode matches hand counts") {
    val df = spark.createDataFrame(Seq(
      (ts(0), "a", 1.0), (ts(4), "a", 2.0), (ts(5), "a", 4.0)))
      .toDF("ts", "event_type", "value")
    val out = EventStream.tumblingCounts(df).collect()
      .map(r => r.getTimestamp(0).toString -> (r.getLong(3), r.getDouble(4))).toMap
    assert(out("2024-01-01 10:00:00.0") == (2L, 3.0))
    assert(out("2024-01-01 10:05:00.0") == (1L, 4.0))
  }

  test("sessionize: gap splits sessions; final state = last session") {
    val s = spark
    import s.implicits._
    val events = Seq(
      Event(1L, ts(0), 7L, "c", 1.0),
      Event(2L, ts(1), 7L, "c", 1.0),
      Event(3L, ts(30), 7L, "c", 1.0), // 29-min gap > 10-min session gap
      Event(4L, ts(31), 7L, "c", 1.0),
      Event(5L, ts(33), 7L, "c", 1.0),
      Event(6L, ts(0), 8L, "c", 1.0)).toDS()
    val out = EventStream.sessionize(events, 600000L).collect()
      .map(u => u.user_id -> (u.session_id, u.n_events)).toMap
    assert(out(7L) == (1L, 3L)) // second session (id 1) has events 3,4,5
    assert(out(8L) == (0L, 1L))
  }

  test("session_window runs as a real stream: closed session emitted once watermark passes") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val events = mem.toDF().toDF("ts", "user_id")
    val q = events.withWatermark("ts", "1 minute")
      .groupBy(col("user_id"), session_window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("win_start"),
        col("n_events"))
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      mem.addData((ts(0), 7L), (ts(2), 7L), (ts(3), 7L))
      q.processAllAvailable()
      // advance the watermark past the session's close (10:03 + 5 min gap)
      mem.addData((ts(20), 7L))
      q.processAllAvailable()
      mem.addData((ts(40), 7L))
      q.processAllAvailable()
      val out = s.sql("SELECT user_id, win_start, n_events FROM sessions")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2)))
      // the first closed session: 3 events starting 10:00
      assert(out.contains((7L, "2024-01-01 10:00:00.0", 3L)))
    } finally q.stop()
  }

  test("sessionizeBatch: every session sized correctly, ids 0-based in time order") {
    val df = spark.createDataFrame(Seq(
      (1L, ts(0), 7L), (2L, ts(1), 7L), (3L, ts(30), 7L), (4L, ts(31), 7L),
      (5L, ts(33), 7L), (6L, ts(0), 8L)))
      .toDF("event_id", "ts", "user_id")
    val out = EventStream.sessionizeBatch(df, 600000L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((7L, 0L) -> 2L, (7L, 1L) -> 3L, (8L, 0L) -> 1L))
  }

  test("sessionizeBatch final state agrees with mapGroupsWithState on shuffled input") {
    val s = spark
    import s.implicits._
    // 3 users × interleaved sessions, deliberately out of order
    val rows = Seq(
      Event(10L, ts(30), 1L, "c", 0.0), Event(11L, ts(0), 1L, "c", 0.0),
      Event(12L, ts(31), 1L, "c", 0.0), Event(20L, ts(5), 2L, "c", 0.0),
      Event(21L, ts(6), 2L, "c", 0.0), Event(30L, ts(50), 3L, "c", 0.0))
    val stateful = EventStream.sessionize(rows.toDS().repartition(4), 600000L)
      .collect().map(u => u.user_id -> (u.session_id, u.n_events)).toMap
    val batch = EventStream.sessionizeBatch(
      rows.toDF().select(col("event_id"), col("ts"), col("user_id")), 600000L)
    val lastPerUser = batch.collect()
      .groupBy(_.getLong(0))
      .map { case (u, rs) =>
        val last = rs.maxBy(_.getLong(1)); u -> (last.getLong(1), last.getLong(2))
      }
    assert(lastPerUser == stateful)
  }

  test("sessionize processes events in (ts, event_id) order regardless of input order") {
    val s = spark
    import s.implicits._
    val events = Seq(
      Event(2L, ts(30), 7L, "c", 1.0),
      Event(1L, ts(0), 7L, "c", 1.0)).toDS().repartition(4)
    val out = EventStream.sessionize(events, 600000L).collect()
      .map(u => u.user_id -> (u.session_id, u.n_events)).toMap
    assert(out(7L) == (1L, 1L)) // two sessions; last has one event
  }
}
