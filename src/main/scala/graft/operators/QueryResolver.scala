package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Free-text → item-id resolution.
  *
  * Reference: `resolve_query_to_asin` (`Hybrid_Recom_vecdb.py:199-210`):
  * exact id hit wins; otherwise case-insensitive substring match over
  * titles, shortest title wins (SURVEY P4/A5/J8). Ties broken by id for
  * determinism (the reference's tie order is dict-iteration accident,
  * SURVEY §7.4).
  *
  * At scale this is a broadcast-friendly scan: `lower(title) CONTAINS q`
  * is a codegen'd predicate pushed at the dimension table; the ORDER BY
  * LIMIT 1 compiles to TakeOrderedAndProject (no global sort).
  */
object QueryResolver {

  /** Resolve one query string against items(idCol, titleCol).
    * Returns 0 or 1 row: (id, title, matched_by). */
  def resolve(items: DataFrame, query: String,
              idCol: String = "asin", titleCol: String = "title"): DataFrame = {
    val exact = items
      .where(col(idCol) === query)
      .select(col(idCol).as("id"), col(titleCol).as("title"),
        lit("exact_id").as("matched_by"), lit(0).as("prec"))
    val substr = items
      .where(col(titleCol).isNotNull &&
        lower(col(titleCol)).contains(query.toLowerCase))
      .select(col(idCol).as("id"), col(titleCol).as("title"),
        lit("substring").as("matched_by"), lit(1).as("prec"))
    // Exact-id precedence (reference :201-202), then shortest title, then
    // id — a total order, so LIMIT 1 is deterministic and compiles to
    // TakeOrderedAndProject (top-1 heap, no global sort).
    exact.unionAll(substr)
      .orderBy(col("prec").asc, length(col("title")).asc, col("id").asc)
      .limit(1)
      .drop("prec")
  }
}
