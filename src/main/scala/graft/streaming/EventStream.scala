package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference is batch-only (SURVEY §2.7); this is the engine's
  * streaming extension (SURVEY §7.2 M6). Each transform takes/returns a
  * streaming Dataset so it composes with `readStream` → `writeStream`;
  * the same code paths also run in batch (tested that way, plus a
  * MemoryStream spec).
  */
object EventStream {

  /** 5-minute tumbling-window counts per event type with a 10-minute
    * watermark: late rows beyond the watermark are dropped, state is
    * bounded — the canonical streaming aggregation. */
  def tumblingCounts(events: DataFrame,
                     windowLen: String = "5 minutes",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** Sliding-window counts: every event lands in size/slide overlapping
    * windows (here 10-minute windows every 5 minutes). Same bounded-state
    * watermark story as [[tumblingCounts]]; the duplication factor is the
    * overlap count, applied map-side by the window generator. */
  def slidingCounts(events: DataFrame,
                    windowLen: String = "10 minutes",
                    slide: String = "5 minutes",
                    watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** Exactly-once ingestion: drop replayed events (same event_id) within
    * the watermark horizon — the streaming half of the dedup family. The
    * id→seen state is bounded by the watermark: an id older than the
    * horizon is evicted, so state is O(events per horizon), not O(all
    * ids ever). Batch backfill uses [[dedupeReplays]] (keep-first), which
    * the replayed-stream spec shows agrees with this on in-horizon
    * replays. */
  def dedupe(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Batch replay collapse: one row per event_id, keeping the FIRST
    * arrival (min (ts, value) — a total order, so deterministic). One
    * shuffle on event_id with map-side partial aggregation; at 100 TB
    * this is the backfill path of [[dedupe]], not a window over the
    * full history. */
  def dedupeReplays(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_id"))
      .agg(min(struct(col("ts"), col("value"))).as("__first"),
        count(lit(1)).as("n_arrivals"))
      .select(col("event_id"), col("__first.ts").as("ts"),
        col("__first.value").as("value"), col("n_arrivals"))

  /** Relational gap sessionization — the BATCH form of [[sessionize]].
    * `lag` over (user_id; ts, event_id) flags a session break when the
    * gap exceeds `gapMs`; a running sum of break flags is the session id;
    * one groupBy sizes each session. Output: (user_id, session_id,
    * n_events), session ids 0-based per user in time order — identical to
    * the per-session state [[sessionize]] walks through.
    *
    * Scale shape: one exchange on user_id, then two window passes over
    * the SAME sort order (Catalyst plans one sort) and a partial-agg
    * groupBy. Spark's window sort is spillable (UnsafeExternalSorter) and
    * the running frame is evaluated incrementally, so a mega-user spills
    * to disk instead of materializing its whole history in memory the way
    * the object-state path's `toSeq` does — the streaming runtime keeps
    * [[sessionize]]; every batch/backfill caller belongs here. */
  def sessionizeBatch(events: DataFrame, gapMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Window.partitionBy("user_id").orderBy(col("__t"), col("event_id"))
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), unix_millis(col("ts")).as("__t"), col("event_id"))
      .withColumn("__brk",
        when(col("__t") - lag(col("__t"), 1).over(ord) > gapMs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("__brk")).over(run))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"))
  }

  /** Stream-stream INTERVAL join: every (view, click) pair of the same
    * user with `click.ts ∈ [view.ts, view.ts + maxGap]` — the
    * all-matching-pairs attribution primitive ([[graft.operators.AsOfJoin]]
    * keeps only the latest match; this keeps them all). Under
    * `readStream` both sides carry watermarks and the time bounds let
    * Spark evict join state (a view older than watermark + maxGap can
    * never match a future click) — the canonical bounded-state
    * stream-stream join. The same plan runs in batch. */
  def intervalJoin(views: DataFrame, clicks: DataFrame,
                   maxGap: String = "30 minutes",
                   watermark: String = "10 minutes"): DataFrame = {
    val v = views.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts").as("v_ts"), col("event_id").as("view_id"))
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id").as("__cu"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    v.join(c, col("user_id") === col("__cu") &&
        col("c_ts") >= col("v_ts") &&
        col("c_ts") <= col("v_ts") + expr(s"INTERVAL $maxGap"))
      .select(col("user_id"), col("view_id"), col("click_id"),
        unix_micros(col("v_ts")).as("v_ts_us"),
        unix_micros(col("c_ts")).as("c_ts_us"),
        (unix_micros(col("c_ts")) - unix_micros(col("v_ts"))).as("gap_us"))
  }

  /** Batch/backfill form of [[intervalJoin]] with the mega-user guard:
    * joining on user_id alone leaves sort-merge-join buffering one
    * user's whole click history per task (the q57 hazard class). Here
    * time is cut into `maxGapUs`-wide buckets — each click lands in ONE
    * bucket, each view explodes into the only TWO buckets its window can
    * reach — and the equi-join key becomes (user_id, bucket), so join
    * buffers are bounded by events-per-gap-window, not events-per-user.
    * Pairs can't duplicate (click buckets partition the timeline); the
    * residual range filter keeps exactly [[intervalJoin]]'s semantics
    * (spec-proven equal). */
  def intervalJoinBucketed(events: DataFrame, viewType: String,
                           clickType: String, maxGapUs: Long): DataFrame = {
    val v = events.where(col("event_type") === viewType)
      .select(col("user_id"), unix_micros(col("ts")).as("v_t"),
        col("event_id").as("view_id"))
      .withColumn("__b0", expr(s"v_t div $maxGapUs"))
      .withColumn("bucket", explode(array(col("__b0"), col("__b0") + 1)))
      .drop("__b0")
    val c = events.where(col("event_type") === clickType)
      .select(col("user_id"), unix_micros(col("ts")).as("c_t"),
        col("event_id").as("click_id"))
      .withColumn("bucket", expr(s"c_t div $maxGapUs"))
    v.join(c, Seq("user_id", "bucket"))
      .where(col("c_t") >= col("v_t") && col("c_t") - col("v_t") <= maxGapUs)
      .select(col("user_id"), col("view_id"), col("click_id"),
        col("v_t").as("v_ts_us"), col("c_t").as("c_ts_us"),
        (col("c_t") - col("v_t")).as("gap_us"))
  }

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class SessionState(sessionId: Long, nEvents: Long, lastTs: Long)
  case class SessionUpdate(user_id: Long, session_id: Long, n_events: Long)

  /** Gap-based sessionization with explicit state: a session closes after
    * `gapMs` of user inactivity. mapGroupsWithState keeps one small state
    * record per user — state size is O(active users), independent of
    * event volume. */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionUpdate](
        GroupStateTimeout.NoTimeout) {
        case (userId, evs, state: GroupState[SessionState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(SessionState(0L, 0L, Long.MinValue))
          sorted.foreach { e =>
            val t = e.ts.getTime
            st =
              if (st.lastTs != Long.MinValue && t - st.lastTs > gapMs)
                SessionState(st.sessionId + 1, 1L, t)
              else SessionState(st.sessionId, st.nEvents + 1, t)
          }
          state.update(st)
          SessionUpdate(userId, st.sessionId, st.nEvents)
      }
  }
}
