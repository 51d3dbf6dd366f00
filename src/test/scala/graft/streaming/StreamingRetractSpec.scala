package graft.streaming

import graft.SparkTestBase
import graft.operators.Incremental
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming incremental-view maintenance: a CDC stream of signed
  * contributions drains through foreachBatch into a maintained
  * per-group summary via [[Incremental.retract]] — the continuously
  * maintained materialized view a 100 TB pipeline keeps instead of
  * recomputing the fact table. The END state must equal a from-scratch
  * batch recompute of the final logical table: inserts, group-moving
  * updates, full deletes, and group disappearance all replayed in
  * motion (the q169 law, proven against a stream rather than a static
  * delta). */
class StreamingRetractSpec extends SparkTestBase {

  test("foreachBatch-retracted summary equals the batch recompute of the final state") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    // live logical table, driver-side, as ground truth only
    var truth = Map.empty[Long, (String, Long)] // key -> (group, value)

    var view: DataFrame = Seq.empty[(String, Long, Long)]
      .toDF("grp", "n", "sum_v")

    // CDC wire format: (op, key, group, value, old_group, old_value)
    val mem = MemoryStream[(String, Long, String, Long, String, Long)]
    val q = mem.toDF()
      .toDF("op", "key", "grp", "v", "old_grp", "old_v")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val plus = batch.where(col("op").isin("I", "U"))
          .select(col("grp"), lit(1L).as("dn"), col("v").as("dv"))
        val minus = batch.where(col("op").isin("D", "U"))
          .select(col("old_grp").as("grp"), lit(-1L).as("dn"),
            (-col("old_v")).as("dv"))
        view = Incremental.retract(view, plus.unionByName(minus), "grp")
          .localCheckpoint()
        ()
      }
      .start()

    def ins(k: Long, g: String, v: Long) = {
      truth += k -> ((g, v)); ("I", k, g, v, "", 0L)
    }
    def upd(k: Long, g: String, v: Long) = {
      val (og, ov) = truth(k); truth += k -> ((g, v)); ("U", k, g, v, og, ov)
    }
    def del(k: Long) = {
      val (og, ov) = truth(k); truth -= k; ("D", k, "", 0L, og, ov)
    }

    try {
      // batch 1: plain inserts across two groups
      mem.addData((1L to 20L).map(k =>
        ins(k, if (k % 2 == 0) "even" else "odd", k * 10)): _*)
      q.processAllAvailable()
      // batch 2: group-moving updates (odd keys 1-9 move to "even"),
      // value changes, and deletes
      mem.addData(
        (1L to 9L by 2).map(k => upd(k, "even", k * 100)) ++
          Seq(upd(10L, "even", 1L), del(2L), del(20L)): _*)
      q.processAllAvailable()
      // batch 3: empty out a whole group — it must VANISH from the view
      mem.addData((1L to 19L by 2).filter(truth.contains)
        .map(del): _*)
      q.processAllAvailable()
    } finally q.stop()

    val got = view.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val expect = truth.toSeq.groupBy(_._2._1).map { case (g, rows) =>
      g -> ((rows.size.toLong, rows.map(_._2._2).sum))
    }
    assert(got == expect, s"view $got vs truth $expect")
    // the odd group was fully drained — zero-count groups must drop
    assert(!got.contains("odd"))
    assert(got.keySet == Set("even"))
  }
}
