package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-contract checks — the expectation suite a pipeline
  * runs before promoting a drop of data: each check declares WHAT must
  * hold (not-null, unique key, value range, accepted set, referential
  * integrity), the runner turns it into one aggregate, and the report
  * is one row per check with an exact violation count.
  *
  * Scale: every check is a single scan-shaped aggregate (uniqueness is
  * the only one that shuffles — one groupBy on the declared key); checks
  * over the same frame could share a scan, but independent plans keep
  * each violation count attributable and let the scheduler run them
  * concurrently. The report unions |checks| one-row frames — free.
  */
object Expectations {

  sealed trait Check { def name: String }
  final case class NotNull(name: String, df: DataFrame, col: String)
    extends Check
  final case class UniqueKey(name: String, df: DataFrame, cols: Seq[String])
    extends Check
  final case class InRange(name: String, df: DataFrame, col: String,
                           lo: Double, hi: Double) extends Check
  final case class Accepted(name: String, df: DataFrame, col: String,
                            values: Seq[String]) extends Check
  final case class Ref(name: String, child: DataFrame, childCol: String,
                       parent: DataFrame, parentCol: String) extends Check

  /** @return one row per check: (check, n_rows, n_violations, pass),
    *         in the declared order via a stable union. */
  def run(checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "expectation suite needs at least one check")
    checks.map {
      case NotNull(n, df, c) =>
        report(n, df.agg(count(lit(1)).as("n_rows"),
          count(when(col(c).isNull, 1)).as("n_violations")))
      case UniqueKey(n, df, cs) =>
        // A primary key must not be NULL: every row with a NULL key
        // component is a violation outright; among fully-keyed rows,
        // each row beyond the first per key counts. A plain groupBy
        // would fold all NULL keys into one ordinary group and let a
        // single NULL-keyed row pass (round-5 advice). Matches the
        // oracle's count(*) - count(DISTINCT key) for single columns.
        val anyNull = cs.map(col(_).isNull).reduce(_ || _)
        val dups = df.where(!anyNull)
          .groupBy(cs.map(col): _*).agg(count(lit(1)).as("__c"))
          .agg(coalesce(sum(col("__c") - 1), lit(0L)).as("__dups"))
        report(n, df.agg(count(lit(1)).as("n_rows"),
            count(when(anyNull, 1)).as("__nulls"))
          .crossJoin(dups)
          .select(col("n_rows"),
            (col("__nulls") + col("__dups")).as("n_violations")))
      case InRange(n, df, c, lo, hi) =>
        report(n, df.agg(count(lit(1)).as("n_rows"),
          count(when(col(c).isNull || col(c) < lo || col(c) > hi, 1))
            .as("n_violations")))
      case Accepted(n, df, c, vs) =>
        report(n, df.agg(count(lit(1)).as("n_rows"),
          count(when(col(c).isNull || !col(c).isInCollection(vs), 1))
            .as("n_violations")))
      case Ref(n, child, cc, parent, pc) =>
        report(n, child.select(col(cc))
          .join(parent.select(col(pc).as(cc)).distinct(), Seq(cc), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
          .crossJoin(child.agg(count(lit(1)).as("n_rows")))
          .select(col("n_rows"), col("n_violations")))
    }.reduce(_ unionByName _)
  }

  private def report(name: String, counts: DataFrame): DataFrame =
    counts.select(lit(name).as("check_name"),
      col("n_rows").cast("long").as("n_rows"),
      col("n_violations").cast("long").as("n_violations"),
      (col("n_violations") === 0).as("pass"))
}
