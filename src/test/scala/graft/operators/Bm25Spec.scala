package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** BM25 semantics on a hand-checkable corpus: tf saturation, idf
  * ordering, length normalization, df capping, self-exclusion. */
class Bm25Spec extends SparkTestBase {

  import spark.implicits._

  private def corpus = Seq(
    (0L, "spark spark spark join"),
    (1L, "spark join"),
    (2L, "join fast fast"),
    (3L, "table scan table scan table scan table scan")
  ).toDF("doc_id", "text")

  test("rarer terms dominate: a doc matching the rare term outranks common-term-only") {
    // "fast" df=1, "join" df=3 -> doc 2 (has fast+join) must beat docs
    // with join alone for the query "join fast".
    val q = Seq(("q", "join fast")).toDF("query_id", "query_text")
    val top = Bm25.topK(corpus, q, 4).orderBy("rnk").collect()
    assert(top.head.getLong(top.head.fieldIndex("doc_id")) == 2L)
  }

  test("scores are positive, ranked desc, ties broken by doc_id") {
    val q = Seq(("q", "spark join")).toDF("query_id", "query_text")
    val rows = Bm25.topK(corpus, q, 10).orderBy("rnk")
      .select("doc_id", "score", "rnk").collect()
    assert(rows.nonEmpty)
    val scores = rows.map(_.getDouble(1))
    assert(scores.forall(_ > 0))
    assert(scores.sameElements(scores.sortBy(-(_: Double))))
  }

  test("tf saturates: 3x term repetitions score below 3x a single occurrence") {
    // doc 0 has tf=3 of "spark", doc 1 tf=1; same query -> ratio < 3
    val q = Seq(("q", "spark")).toDF("query_id", "query_text")
    val m = Bm25.topK(corpus, q, 10).select("doc_id", "score")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(m(0L) > m(1L))
    assert(m(0L) < 3.0 * m(1L))
  }

  test("maxDf drops stop-like terms entirely") {
    // "join" appears in 3 of 4 docs; with maxDf=2 the query has no
    // surviving terms -> empty result.
    val q = Seq(("q", "join")).toDF("query_id", "query_text")
    assert(Bm25.topK(corpus, q, 10, maxDf = 2L).count() == 0)
  }

  test("postings build is fully map-side: zero exchanges before the term consumers") {
    val p = Bm25.postings(corpus).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"postings should not shuffle:\n$p")
  }

  test("postings tf/dl equal the explode-groupBy reference shape") {
    import graft.functions.TextFunctions
    val ref = corpus.select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .withColumn("dl", sum(col("tf")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
    val got = Bm25.postings(corpus)
    assert(got.except(ref).count() == 0 && ref.except(got).count() == 0)
    assert(got.count() == ref.count())
  }

  test("excludeSelf drops the query doc when query ids are doc ids") {
    val q = corpus.where(col("doc_id") === 0)
      .select(col("doc_id").as("query_id"), col("text").as("query_text"))
    val ids = Bm25.topK(corpus, q, 10, excludeSelf = true)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(0L) && ids.nonEmpty)
  }
}
