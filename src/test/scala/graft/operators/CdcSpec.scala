package graft.operators

import graft.SparkTestBase

/** Snapshot-diff classification on crafted versions. */
class CdcSpec extends SparkTestBase {

  import spark.implicits._

  private def old = Seq(
    (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L)
  ).toDF("k", "s", "v")

  // 1 unchanged, 2 updated, 4 deleted, 5 inserted
  private def neu = Seq(
    (1L, "a", 10L), (2L, "b", 99L), (3L, "c", 30L), (5L, "e", 50L)
  ).toDF("k", "s", "v")

  test("classifies insert/delete/update and drops unchanged") {
    val got = Cdc.snapshotDiff(old, neu, Seq("k"), Seq("s", "v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "update", 4L -> "delete", 5L -> "insert"))
  }

  test("NULL payload is distinct from empty string and from other NULL shifts") {
    val a = Seq((1L, null.asInstanceOf[String], "x"), (2L, "p", "q"))
      .toDF("k", "s", "t")
    val b = Seq((1L, "", "x"), (2L, "pq", ""))
      .toDF("k", "s", "t")
    val got = Cdc.snapshotDiff(a, b, Seq("k"), Seq("s", "t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // k=1: NULL vs "" must differ; k=2: ("p","q") vs ("pq","") must
    // differ — a separator-free concat would digest both identically
    assert(got == Map(1L -> "update", 2L -> "update"))
  }

  test("identical snapshots produce an empty delta") {
    assert(Cdc.snapshotDiff(old, old, Seq("k"), Seq("s", "v")).isEmpty)
  }

  test("applyDelta law: apply(old, diff(old, new) ⋈ new payload) ≡ new") {
    import org.apache.spark.sql.functions._
    val delta = Cdc.snapshotDiff(old, neu, Seq("k"), Seq("s", "v"))
      .join(neu, Seq("k"), "left")
    val applied = Cdc.applyDelta(old, delta, Seq("k"), Seq("s", "v"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = neu.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(applied.toSeq == want.toSeq)
  }

  test("applyDelta with an empty delta is the identity") {
    import org.apache.spark.sql.functions._
    val empty = Cdc.snapshotDiff(old, old, Seq("k"), Seq("s", "v"))
      .join(old, Seq("k"), "left")
    val applied = Cdc.applyDelta(old, empty, Seq("k"), Seq("s", "v"))
      .orderBy("k").collect().map(_.toSeq)
    assert(applied.toSeq == old.orderBy("k").collect().map(_.toSeq).toSeq)
  }
}
