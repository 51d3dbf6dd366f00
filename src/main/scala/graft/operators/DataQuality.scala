package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality audits — the checks a 100 TB ingest runs before any
  * operator downstream trusts the tables (the reference implicitly
  * assumes clean inputs: `Hybrid_Recom_vecdb.py:47-69` drops malformed
  * stanzas at parse time and never validates again).
  *
  * Both audits are single-purpose aggregation plans:
  *  - [[profile]] computes per-column null counts, distinct counts and
  *    min/max in ONE scan of the table (one wide aggregate row,
  *    unpivoted to long form driver-free) — multiple `count(distinct)`
  *    in one aggregate use Spark's Expand, which multiplies rows by the
  *    column count but still reads the table once;
  *  - [[fkAudit]] counts referential orphans per relationship with a
  *    left anti join — an equi-keyed shuffle that AQE can convert to a
  *    broadcast when the parent's key projection is small.
  */
object DataQuality {

  /** One row per profiled column: (column, n_rows, n_null, n_distinct,
    * min_val, max_val) with min/max rendered as strings so one schema
    * covers every column type. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("column"), col("__n").as("n_rows"),
        col(s"__null_$c").as("n_null"), col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_val"), col(s"__max_$c").as("max_val"))
    }
    wide.select(explode(array(stacked: _*)).as("p")).select("p.*")
  }

  /** One audited relationship: child rows whose `childKey` has no match
    * in the parent's `parentKey`. */
  final case class FkCheck(relation: String, child: DataFrame,
                           childKey: String, parent: DataFrame,
                           parentKey: String)

  /** Orphan counts per relationship: (relation, n_child, n_orphans).
    * Null child keys count as orphans (a null FK fails the join, which
    * is the audit's point — it can't be resolved). */
  def fkAudit(checks: Seq[FkCheck]): DataFrame =
    checks.map { fk =>
      val orphans = fk.child.select(col(fk.childKey).as("__k"))
        .join(fk.parent.select(col(fk.parentKey).as("__k")).distinct(),
          Seq("__k"), "left_anti")
      val n = fk.child.select(count(lit(1)).as("n_child"))
      n.crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
        .select(lit(fk.relation).as("relation"), col("n_child"),
          col("n_orphans"))
    }.reduce(_ unionAll _)
}
