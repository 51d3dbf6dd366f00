package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 ranked keyword retrieval — the SPARSE arm of hybrid search.
  *
  * The reference retrieves by dense embedding similarity plus
  * co-purchase behavior (`Hybrid_Recom_vecdb.py:172-231`); production
  * hybrid-search stacks pair that dense arm with lexical BM25 (what
  * every vector DB ships as "hybrid search"). This operator supplies it
  * relationally:
  *
  *   score(q, d) = Σ_{t ∈ q} idf(t) · tf(t,d)·(k1+1) /
  *                 (tf(t,d) + k1·(1 − b + b·dl(d)/avgdl))
  *   idf(t)      = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))
  *
  * Plan shape (all equi-keyed, no broadcast-or-bust):
  *  1. postings `(term, doc_id, tf)` + doc lengths — one shuffle on
  *     (doc, term), reusable across every query batch;
  *  2. query terms semi-filter the postings ON TERM (the query side is
  *     tiny and broadcasts; only postings of queried terms survive —
  *     per-query cost ∝ Σ df(term), never corpus size);
  *  3. per-(query, doc) score, bounded-heap top-k per query.
  *
  * At 100 TB the df of stop-like terms makes step 2's survivor set the
  * cost driver — the classic answer is a df cap (stop filtering), same
  * argument as [[Dedup.ngramJaccard]]'s maxDf, exposed as `maxDf`.
  *
  * Cross-engine determinism: the per-term contribution is bit-identical
  * double math given identical (tf, df, dl, avgdl); the SUM across a
  * query's terms is made order-free by summing in fixed-point (each term
  * rounded to 1e-9 and accumulated as a long), so the DuckDB oracle can
  * replay scores and ranks exactly.
  */
object Bm25 {

  val K1 = 1.2
  val B = 0.75

  /** Token postings `(doc_id, term, tf, dl)` — ENTIRELY map-side: the
    * per-doc term frequencies come from the single-pass
    * [[TextFunctions.termCounts]] expression (docs arrive one row per
    * document, so tf needs no cross-row aggregation) and `dl` is the
    * token count of the row. The previous shape paid an
    * `explode → groupBy(doc, term)` exchange of one row per TOKEN plus a
    * second `Window.partitionBy(doc)` exchange for dl; now the first
    * shuffle the postings ever see is the term-keyed consumer join.
    *
    * PRECONDITION: `idCol` must be unique in `docs`. The old
    * explode→groupBy shape silently MERGED rows sharing an id; this
    * map-side shape emits duplicate postings for them instead (df and tf
    * both inflate). Every current caller feeds the `documents` primary
    * key; callers of the public API with non-key ids must
    * `groupBy(id).agg(first(text))` (or concat) first. Same contract
    * applies to [[TextAnalysis.keywords]] / `sliceEntropy` / q65, which
    * share the TermCounts shape (see OPERATORS.md).
    * Precondition: one row per document — rows sharing an id no longer
    * merge (the groupBy shape coincidentally did). */
  def postings(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), size(col("__toks")).cast("long").as("dl"),
        explode(TextFunctions.termCounts(col("__toks"))).as("tc"))
      .select(col("doc_id"), col("tc.term").as("term"),
        col("tc.tf").as("tf"), col("dl"))

  /** Top-k docs per keyword query. `queries` = (query_id, query_text);
    * query terms are the DISTINCT tokens of the query text. Output
    * (query_id, doc_id, score, rnk), tie order (score DESC, doc_id ASC).
    * `maxDf` drops terms whose document frequency exceeds it (0 = no
    * cap) — the stop-term guard for web-scale corpora.
    *
    * CONTRACT: `idCol` must be a NUMERIC document id (enforced by the
    * bounded-heap rank — the tie order is encoded by negation; see
    * [[graft.functions.expressions.TopKAggregate.perGroupTopK]]). A
    * string-keyed corpus (e.g. ASINs) maps ids to a numeric surrogate
    * before calling, exactly as the offline index build does. */
  def topK(docs: DataFrame, queries: DataFrame, k: Int,
           k1: Double = K1, b: Double = B, maxDf: Long = 0L,
           excludeSelf: Boolean = false,
           idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // postings feed THREE consumers (the df aggregate, the scoring join,
    // and the corpus stats) — materialize once, so the corpus tokenize
    // runs ONE pass instead of three (the plan scanned+tokenized docs
    // 3× before this; at web scale the tokenizer is the cost driver)
    val post = postings(docs, idCol, textCol).localCheckpoint()
    val stats = docStats(docs, post, idCol)
    val df = post.groupBy("term").agg(count(lit(1)).as("df"))
    val dfKept = if (maxDf > 0) df.where(col("df") <= maxDf) else df
    val qterms = queries.select(col("query_id"),
        explode(array_distinct(TextFunctions.tokens(col("query_text")))).as("term"))
    val perTerm = post
      .join(dfKept, Seq("term"))
      .join(broadcast(qterms), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("contrib",
        col("idf") * (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + (lit(b) * col("dl")) / col("avgdl"))))
    // fixed-point sum: each term's contribution snaps to 1e-9 via
    // floor(x+0.5) (the cross-engine-stable half convention) and
    // accumulates as a long — order-free, so SQL replays scores exactly
    val scored = perTerm
      .where(if (excludeSelf) col("doc_id") =!= col("query_id") else lit(true))
      .groupBy("query_id", "doc_id")
      .agg((sum(floor(col("contrib") * 1e9 + 0.5).cast("long")) / 1e9).as("__s"))
    // Bounded-heap top-k (round 11, same hazard as Ivf.knnJoin): the
    // (query, doc) score frame is candidate-sized when |Q| rides the
    // corpus, and the old window SORTED it per task before pruning.
    graft.functions.expressions.TopKAggregate
      .perGroupTopK(scored, "query_id", "doc_id", "__s", k)
      .select(col("query_id"), col("doc_id"),
        round(col("__s"), 6).as("score"), col("rnk"))
  }

  /** Corpus stats (N, avgdl) as one broadcastable row. avgdl is an
    * exact-integer ratio (sum of long token counts / long count) so both
    * engines compute the identical double. N comes from a count-only
    * scan (parquet answers it from row-group metadata — no tokenize);
    * Σdl folds from the postings' tf, equal to the Σ size(tokens) it
    * replaces because every token lands in exactly one (doc, term)
    * posting row and zero-token docs add 0 to both sides. */
  private def docStats(docs: DataFrame, post: DataFrame,
                       idCol: String): DataFrame =
    post.agg(coalesce(sum(col("tf")), lit(0L)).as("__t"))
      .crossJoin(docs.select(col(idCol)).agg(count(lit(1)).as("n_docs")))
      .select(col("n_docs"),
        (col("__t").cast("double") / col("n_docs")).as("avgdl"))
}
