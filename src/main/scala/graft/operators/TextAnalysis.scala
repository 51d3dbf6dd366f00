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

  /** The winning language label over precomputed per-language hit-count
    * columns (`hitsCol(lang)`): most stopword hits wins, ties and
    * zero-hit docs fall back to "und", tie order = the fixed language
    * order above. Shared by [[langId]] and the fused [[surfaceGate]] so
    * the two can never diverge. */
  private def predLang(hitsCol: String => Column): Column =
    StopwordSets.map(_._1).foldLeft((lit(0), lit("und"))) {
      case ((bestHits, bestLang), lang) =>
        val h = hitsCol(lang)
        (when(h > bestHits, h).otherwise(bestHits),
          when(h > bestHits, lit(lang)).otherwise(bestLang))
    }._2

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
    withHits.withColumn("pred_lang", predLang(l => col(s"hits_$l")))
  }

  /** Heuristic quality score from surface statistics — the standard
    * pretraining-corpus filters (length, mean word length, punctuation
    * density, stopword ratio). All ratios are int/int divisions so the
    * score is bit-reproducible. */
  def qualityScore(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    docs.select(col(idCol).as("doc_id") +: qualityParts(t, toks): _*)
  }

  /** The [[qualityScore]] output columns as expressions over (text,
    * tokens) — shared with the fused [[surfaceGate]] so the score
    * formula exists exactly once. */
  private def qualityParts(t: Column, toks: Column): Seq[Column] = {
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
    Seq(nTok.cast("long").as("n_tokens"),
      meanTokLen.as("mean_token_len"), punctRatio.as("punct_ratio"),
      alphaRatio.as("alpha_ratio"), stopRatio.as("stopword_ratio"),
      score.as("quality"))
  }

  /** Fused surface gate: language label AND quality score in ONE
    * pipelined pass — both are pure per-row expressions over the same
    * (text, tokens), so running [[langId]] and [[qualityScore]] as
    * separate frames joined on doc_id scans and re-tokenizes the corpus
    * twice for no semantic gain. The columns come from the SAME builders
    * the standalone operators use ([[predLang]], [[qualityParts]]), so
    * outputs are definitionally identical.
    * Output: (doc_id, pred_lang, quality). */
  def surfaceGate(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val hits = StopwordSets.map { case (lang, words) =>
      lang -> hitCount(toks, words).cast("long")
    }.toMap
    docs.select(col(idCol).as("doc_id") +:
        predLang(hits(_)).as("pred_lang") +: qualityParts(t, toks): _*)
      .select("doc_id", "pred_lang", "quality") // Catalyst prunes the rest
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

  /** [[chunk]] with the chunk TEXT materialized (the RAG indexing form —
    * downstream embeds the text; q72's digest form exists for exact
    * hash-gating without hauling strings). Same windows, same ids. */
  def chunkTexts(docs: DataFrame, window: Int, stride: Int,
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
        array_join(slice(col("__tk"), col("__start") + 1, lit(window)), " ")
          .as("chunk_text"))
  }

  /** Within-document repetition ratio — the boilerplate/degenerate-text
    * filter (Gopher's "fraction of duplicate n-grams" rule): documents
    * whose token stream repeats itself (navigation chrome, keyword
    * stuffing, generation loops) score high and get dropped. Pure
    * map-side: the n-gram list and its distinct count are per-row
    * expressions, no shuffle.
    * rep_ratio = 1 − distinct_ngrams/total_ngrams (0 for docs shorter
    * than n tokens). */
  def repetition(docs: DataFrame, n: Int = 3, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val grams = shingles(tokens(col(textCol)), n)
    val total = size(grams).cast("long")
    val distinctN = size(array_distinct(grams)).cast("long")
    docs.select(col(idCol).as("doc_id"), total.as("n_grams"),
      distinctN.as("n_distinct"),
      when(total === 0, 0.0)
        .otherwise(round(lit(1.0) -
          distinctN.cast("double") / total.cast("double"), 6))
        .as("rep_ratio"))
  }

  /** Sequence packing — the concatenate-and-cut context-window packing of
    * GPT-style pretraining: lay every document's tokens on one global
    * tape (ordered by doc id), cut the tape every `capacity` tokens, and
    * report which bins each document lands in. Output one row per
    * (doc, bin) overlap: (doc_id, n_tokens, start, bin_id, tok_in_bin) —
    * every bin except the last is exactly full by construction.
    *
    * Scale shape (the global running sum is the hazard — a naive
    * `Window.orderBy(doc_id)` sorts the corpus on ONE task): two-level
    * cumulative sum instead. Docs bucket by doc_id range; the in-bucket
    * prefix sum is a per-bucket window (parallel across buckets); bucket
    * TOTALS — |corpus|/bucketWidth rows — aggregate tiny and take the
    * single-task window, then broadcast-join back as per-bucket offsets.
    * At 10¹¹ docs pick bucketWidth ~10⁶ so the bucket frame stays ~10⁵
    * rows; the pattern nests for another level if even that is too wide. */
  def packSequences(docs: DataFrame, capacity: Int, bucketWidth: Int = 128,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(capacity > 0 && bucketWidth > 0, "need positive capacity/bucket")
    val base = docs
      .select(col(idCol).as("doc_id"),
        size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .where(col("n_tokens") > 0)
      .withColumn("__bucket", floor(col("doc_id") / bucketWidth))
    val wIn = Window.partitionBy("__bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val inBucket = base
      .withColumn("__local", coalesce(sum(col("n_tokens")).over(wIn), lit(0L)))
    val wB = Window.orderBy("__bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy("__bucket")
      .agg(sum(col("n_tokens")).as("__btot"))
      .withColumn("__boff", coalesce(sum(col("__btot")).over(wB), lit(0L)))
      .select(col("__bucket"), col("__boff"))
    val placed = inBucket
      .join(offsets.hint("broadcast"), Seq("__bucket"))
      .withColumn("start", col("__boff") + col("__local"))
      .withColumn("__end", col("start") + col("n_tokens"))
    placed
      .select(col("doc_id"), col("n_tokens"), col("start"),
        explode(sequence(floor(col("start") / capacity),
          floor((col("__end") - 1) / capacity))).as("bin_id"),
        col("__end"))
      .withColumn("tok_in_bin",
        least(col("__end"), (col("bin_id") + 1) * capacity) -
          greatest(col("start"), col("bin_id") * capacity))
      .select("doc_id", "n_tokens", "start", "bin_id", "tok_in_bin")
  }

  /** PII scrubbing — pattern-redaction before a corpus ships: replace
    * email addresses and phone-shaped numbers with typed placeholder
    * tokens and count what was hit. Map-side regex only (codegen'd
    * RegExpReplace/RegExpCount — no UDF); the patterns are deliberately
    * RE2-compatible character-class regexes so the DuckDB oracle replays
    * them byte-identically.
    * Output: (doc_id, n_emails, n_phones, redacted_md5) — the md5 digests
    * the full redacted text, proving the rewrite without shipping it. */
  def piiScrub(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val redacted = regexp_replace(
      regexp_replace(t, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")
    docs.select(col(idCol).as("doc_id"),
      regexp_count(t, lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(t, lit(PhoneRe)).cast("long").as("n_phones"),
      md5(redacted).as("redacted_md5"))
  }

  /** Shared PII patterns (kept RE2 ∩ Java so Spark and the oracle agree). */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Per-document TF-IDF keywords: top `k` terms by tf·idf with
    * idf = ln((N+1)/(df+1)). Per-doc tf is MAP-SIDE (the single-pass
    * [[graft.functions.TextFunctions.termCounts]] expression — docs are
    * one row each, so no cross-row aggregation; the old
    * `explode → groupBy(doc, term)` exchange moved the corpus token
    * stream). tf feeds TWO consumers (the df aggregate and the scoring
    * join) with no shared exchange left to reuse, so it materializes
    * once — same single-tokenize discipline as [[Bm25.topK]]'s postings.
    * One term-key shuffle builds df and feeds the tf⋈df join, then one
    * doc-key window ranks with WindowGroupLimit. N rides along as a
    * broadcast scalar. Deterministic tie order (score DESC, term ASC).
    * Precondition (same as Bm25.postings): one row per document —
    * duplicate ids no longer merge. */
  def keywords(docs: DataFrame, k: Int, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs.select(col(idCol).as("doc_id"),
        explode(termCounts(tokens(col(textCol)))).as("tc"))
      .select(col("doc_id"), col("tc.term").as("term"), col("tc.tf").as("tf"))
      .localCheckpoint()
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

  /** Character-trigram language-model surprise score — the statistical
    * upgrade of [[qualityScore]]'s surface heuristics (the KenLM-filter
    * idea from pretraining pipelines: score each document's negative log
    * likelihood under an n-gram model of the corpus itself; gibberish,
    * boilerplate and wrong-alphabet text land in the high-NLL tail).
    *
    * Model: add-one-smoothed conditional trigram probabilities
    * `P(c₃|c₁c₂) = (cnt(c₁c₂c₃)+1) / (cnt(c₁c₂·)+V)` over the
    * whitespace-normalized lowercase text, V = distinct continuation
    * characters in the corpus. Score: `nll = −mean ln P` over every
    * trigram occurrence of the doc.
    *
    * Scale shape: the model is bounded by the ALPHABET, not the corpus —
    * ≤ |Σ|³ rows (37³ ≈ 50k for [a-z0-9 ]) no matter how many petabytes
    * trained it — so both model tables broadcast and scoring is one
    * map-side pass over the doc trigram stream: one shuffle to count the
    * model, zero shuffles to score (beyond the per-doc aggregate). */
  def lmScore(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    val tris = docs
      .select(col(idCol).as("doc_id"),
        array_join(tokens(col(textCol)), " ").as("__s"))
      .select(col("doc_id"),
        explode(when(length(col("__s")) < 3, array().cast("array<string>"))
          .otherwise(expr(
            "transform(sequence(1, length(__s) - 2), i -> substring(__s, i, 3))")))
          .as("tri"))
    val model = tris.groupBy("tri").agg(count(lit(1)).as("cnt3"))
    val prefix = model.groupBy(substring(col("tri"), 1, 2).as("pre"))
      .agg(sum(col("cnt3")).as("cnt2"))
    val vocab = model
      .select(countDistinct(substring(col("tri"), 3, 1)).as("v"))
    tris
      .join(model.hint("broadcast"), Seq("tri"))
      .withColumn("pre", substring(col("tri"), 1, 2))
      .join(prefix.hint("broadcast"), Seq("pre"))
      .join(vocab.hint("broadcast"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tris"),
        round(-avg(log((col("cnt3") + 1.0) / (col("cnt2") + col("v")))), 6)
          .as("nll"))
  }

  /** Sketch-guided heavy hitters over the token stream: `freqItems`
    * (Karp et al. frequent-items, one streaming pass, mergeable across
    * partitions) nominates every term that COULD exceed `support` — a
    * strict superset of the truth, ≤ 1/support candidates, driver-safe —
    * and an exact count over just the candidate terms (the `isin`
    * pushes into the scan) keeps exactly the true heavy hitters. Two
    * bounded-output passes instead of a full-vocabulary aggregate: at
    * 100 TB the vocabulary is billions of terms, the candidate set is
    * ≤ 1/support regardless of corpus size.
    *
    * Output: (term, cnt, freq) for terms with cnt > support·N — exact
    * values, so a plain SQL oracle replays it (the sketch only
    * accelerates; it cannot change the answer). */
  def heavyHitters(docs: DataFrame, support: Double,
                   textCol: String = "text"): DataFrame = {
    val terms = docs.select(explode(tokens(col(textCol))).as("term"))
    val cands = terms.stat.freqItems(Array("term"), support)
      .collect()(0).getSeq[String](0)
    terms.where(col("term").isInCollection(cands))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .crossJoin(terms.agg(count(lit(1)).as("__n")).hint("broadcast"))
      .where(col("cnt") > lit(support) * col("__n"))
      .select(col("term"), col("cnt"),
        round(col("cnt").cast("double") / col("__n").cast("double"), 6)
          .as("freq"))
  }

  /** Per-slice token-distribution statistics: Shannon entropy (bits) and
    * type-token ratio — the corpus-diversity audit a data-mixing
    * pipeline reads before weighting slices (low entropy = templated or
    * repetitive text; TTR near 0 = tiny vocabulary for the volume).
    *
    * Determinism: term counts are exact longs; Σ c·ln(c) accumulates as
    * FIXED-POINT longs (1e-6 grid per term, each term's contribution a
    * pure function of its exact count) so the big sum is integer — order-
    * free — and H = (ln(T) − S/(1e6·T)) / ln 2 is a fixed handful of
    * double ops rounded to 6 dp. A per-term grid flip costs ≤ 1e-6/T
    * bits — invisible at the output grid. Long bound: c·ln(c)·1e6
    * overflows past ~5·10¹¹ occurrences of ONE term in ONE slice; raise
    * the grid or widen to decimal beyond that.
    *
    * Scale: per-doc tf map-side ([[graft.functions.TextFunctions.termCounts]]
    * — the token stream never materializes as rows), one (slice, term)
    * sum shuffle, one slice-level fold. The widest frame is the
    * vocabulary, same as [[keywords]].
    *
    * @return (sliceCol, n_tokens, n_types, ttr, entropy_bits). */
  def sliceEntropy(docs: DataFrame, sliceCol: String,
                   textCol: String = "text"): DataFrame =
    docs.select(col(sliceCol),
        explode(termCounts(tokens(col(textCol)))).as("tc"))
      .select(col(sliceCol), col("tc.term").as("term"), col("tc.tf").as("tf"))
      .groupBy(sliceCol, "term").agg(sum(col("tf")).as("c"))
      .groupBy(sliceCol)
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(floor(col("c").cast("double") * log(col("c").cast("double"))
          * lit(1e6) + lit(0.5)).cast("long")).as("__s"))
      .select(col(sliceCol), col("n_tokens"), col("n_types"),
        round(col("n_types").cast("double") / col("n_tokens").cast("double"),
          6).as("ttr"),
        round((log(col("n_tokens").cast("double"))
          - col("__s").cast("double") / lit(1e6)
            / col("n_tokens").cast("double")) / log(lit(2.0)), 6)
          .as("entropy_bits"))
}
