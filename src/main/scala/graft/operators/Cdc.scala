package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Snapshot differencing — the change-data-capture primitive a lake
  * pipeline runs between two versions of a table to emit the delta
  * (what MERGE INTO consumes, what an incremental downstream refresh
  * reads): full-outer join the snapshots on the business key and
  * classify every key as insert / delete / update by payload digest.
  *
  * Scale: ONE equi-join on the key (the payload comparison is a
  * map-side md5 over the named columns, so wide rows never carry their
  * width through the join — only key + 32-char digest shuffle), then a
  * map-side classify. Unchanged keys — the overwhelming majority
  * between adjacent snapshots — are filtered out before anything
  * downstream sees them.
  */
object Cdc {

  /** @param old,neu the two snapshots (same schema)
    * @param keys business-key columns
    * @param payload columns whose change makes a row an `update`
    * @return (keys..., change_type) — change_type in insert|delete|update,
    *         unchanged keys omitted. */
  def snapshotDiff(old: DataFrame, neu: DataFrame, keys: Seq[String],
                   payload: Seq[String]): DataFrame = {
    // digest, not column-wise compare: one fixed-width value survives
    // the join regardless of payload width. chr(1) separates columns
    // and chr(0) marks NULL — neither occurs in real values, so NULL,
    // empty string and column-boundary shifts all digest distinctly
    // (and DuckDB's chr() replays both markers exactly).
    def dig(df: DataFrame) = df.select(
      (keys.map(col) :+
        md5(concat_ws("\u0001",
          payload.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*))
          .as("__dig")): _*)
    val o = dig(old).withColumnRenamed("__dig", "__dig_old")
    val n = dig(neu).withColumnRenamed("__dig", "__dig_new")
    o.join(n, keys, "full_outer")
      .withColumn("change_type",
        when(col("__dig_old").isNull, lit("insert"))
          .when(col("__dig_new").isNull, lit("delete"))
          .when(col("__dig_old") =!= col("__dig_new"), lit("update")))
      .where(col("change_type").isNotNull)
      .select((keys.map(col) :+ F.col("change_type")): _*)
  }

  /** Apply a change feed to a snapshot — the MERGE INTO half of CDC:
    * deletes remove the key, inserts/updates take the delta's payload,
    * untouched keys keep the snapshot row. Law (CdcSpec):
    * `applyDelta(old, diff(old, new) ⋈ new-payload) ≡ new` exactly.
    *
    * Scale: ONE full-outer equi-join on the business key; the delta is
    * typically ≪ the snapshot, so AQE picks a broadcast. No window, no
    * skew hazard beyond the join key itself.
    *
    * @param delta (keys..., change_type, payload...) — payload columns
    *              may be NULL on deletes (they are dropped anyway) */
  def applyDelta(snap: DataFrame, delta: DataFrame, keys: Seq[String],
                 payload: Seq[String]): DataFrame = {
    val d = delta.select(
      (keys.map(col) :+ col("change_type")) ++
        payload.map(c => col(c).as(s"__d_$c")): _*)
    snap.join(d, keys, "full_outer")
      .where(col("change_type").isNull || col("change_type") =!= "delete")
      .select(keys.map(col) ++ payload.map(c =>
        when(col("change_type").isNotNull, col(s"__d_$c"))
          .otherwise(col(c)).as(c)): _*)
  }
}
