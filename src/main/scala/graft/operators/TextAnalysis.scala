package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, document fingerprinting.
  *
  * All pure map-side column expressions (no UDFs, no shuffle): at 100 TB
  * each is a single pipelined pass over the scan, and Catalyst prunes the
  * parquet read down to (id, text).
  */
object TextAnalysis {

  /** Tiny per-language stopword inventories for the n-gram/stopword
    * language-ID heuristic. Deliberately small and fixed — the operator
    * contract is "deterministic lang label from token overlap". */
  val StopwordSets: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "en"))

  private def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Language identification by stopword-hit ratio: the language with the
    * most stopword hits wins; ties and zero-hit docs fall back to "und"
    * (undetermined). Deterministic: ties break by the fixed language order
    * above. */
  def langId(docs: DataFrame, idCol: String = "doc_id",
             textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val withHits = docs.select(
      col(idCol).as("doc_id") +: size(toks).cast("long").as("n_tokens") +:
        StopwordSets.map { case (lang, words) =>
          hitCount(toks, words).cast("long").as(s"hits_$lang")
        }: _*)
    val best = StopwordSets.map(_._1).foldLeft((lit(0), lit("und"))) {
      case ((bestHits, bestLang), lang) =>
        val h = col(s"hits_$lang")
        (when(h > bestHits, h).otherwise(bestHits),
          when(h > bestHits, lit(lang)).otherwise(bestLang))
    }
    withHits.withColumn("pred_lang", best._2)
  }

  /** Heuristic quality score from surface statistics — the standard
    * pretraining-corpus filters (length, mean word length, punctuation
    * density, stopword ratio). All ratios are int/int divisions so the
    * score is bit-reproducible. */
  def qualityScore(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nTok = size(toks)
    val nChar = length(t)
    val alphaChars = length(regexp_replace(t, "[^a-zA-Z]", ""))
    val punctChars = length(regexp_replace(t, "[^.,;:!?]", ""))
    val stopHits = hitCount(toks, StopwordSets.flatMap(_._2))
    val meanTokLen = when(nTok === 0, 0.0)
      .otherwise(aggregate(toks, lit(0L), (a, x) => a + length(x))
        .cast("double") / nTok.cast("double"))
    val punctRatio = when(nChar === 0, 0.0)
      .otherwise(punctChars.cast("double") / nChar.cast("double"))
    val alphaRatio = when(nChar === 0, 0.0)
      .otherwise(alphaChars.cast("double") / nChar.cast("double"))
    val stopRatio = when(nTok === 0, 0.0)
      .otherwise(stopHits.cast("double") / nTok.cast("double"))
    // Filters in the spirit of C4/Gopher rules: enough tokens, sane mean
    // word length, mostly alphabetic, not punctuation-soup.
    val score =
      when(nTok >= 10, 0.25).otherwise(0.0) +
        when(meanTokLen >= 3.0 && meanTokLen <= 10.0, 0.25).otherwise(0.0) +
        when(alphaRatio >= 0.6, 0.25).otherwise(0.0) +
        when(punctRatio <= 0.1, 0.25).otherwise(0.0)
    docs.select(col(idCol).as("doc_id"), nTok.cast("long").as("n_tokens"),
      meanTokLen.as("mean_token_len"), punctRatio.as("punct_ratio"),
      alphaRatio.as("alpha_ratio"), stopRatio.as("stopword_ratio"),
      score.as("quality"))
  }

  /** Token counts: whitespace tokens and a BPE-ish segmentation
    * (alphanumeric runs + each non-space symbol its own token — the usual
    * pre-tokenizer upper bound on BPE token count). */
  def tokenCounts(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      size(filter(split(col(textCol), "\\s+"), t => t =!= ""))
        .cast("long").as("ws_tokens"),
      regexp_count(lower(col(textCol)), lit("[a-z0-9]+|[^a-z0-9\\s]"))
        .cast("long").as("bpe_tokens"))

  /** Order-sensitive rolling-hash fingerprint per document. */
  def fingerprints(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      fingerprint(col(textCol)).as("fingerprint"))

  /** Sliding-window document chunking — the RAG / context-window
    * preparation primitive: token windows of `window` tokens every
    * `stride` tokens (overlap = window - stride), last chunk ragged.
    * Map-side only (sequence + explode + slice); the chunk text never
    * concatenates server-side more than one chunk at a time, so a 10⁶-
    * token document becomes rows, not one giant string.
    * Output: (doc_id, chunk_id, n_tokens, chunk_md5) — the md5 digests
    * chunk CONTENT exactly without shipping it. */
  def chunk(docs: DataFrame, window: Int, stride: Int,
            idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      "need 0 < stride <= window")
    val toks = tokens(col(textCol))
    docs.select(col(idCol).as("doc_id"), toks.as("__tk"))
      .where(size(col("__tk")) > 0)
      .select(col("doc_id"), col("__tk"),
        explode(sequence(lit(0), size(col("__tk")) - 1, lit(stride)))
          .as("__start"))
      .select(col("doc_id"),
        (col("__start") / stride).cast("long").as("chunk_id"),
        least(lit(window), size(col("__tk")) - col("__start"))
          .cast("long").as("n_tokens"),
        md5(array_join(slice(col("__tk"), col("__start") + 1, lit(window)), " "))
          .as("chunk_md5"))
  }

  /** Per-document TF-IDF keywords: top `k` terms by tf·idf with
    * idf = ln((N+1)/(df+1)). One term-key shuffle builds df (the q65
    * vocabulary aggregate); the same exchange feeds the tf⋈df join
    * (both sides partitioned by term), then one doc-key window ranks
    * with WindowGroupLimit. N rides along as a broadcast scalar.
    * Deterministic tie order (score DESC, term ASC). */
  def keywords(docs: DataFrame, k: Int, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    val tf = base.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.select(countDistinct(col(idCol)).as("n_docs"))
    val scored = tf.join(df, Seq("term"))
      .crossJoin(n.hint("broadcast"))
      .withColumn("score", col("tf") *
        log((col("n_docs") + 1.0) / (col("df") + 1.0)))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select(col("doc_id"), col("term"), col("rnk"),
        round(col("score"), 6).as("score"))
  }
}
