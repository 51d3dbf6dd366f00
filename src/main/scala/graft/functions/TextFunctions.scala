package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column helpers for the training-data-pipeline operators
  * (dedup, language-ID, quality scoring, token counting, fingerprinting).
  *
  * Everything here is built from codegen'd built-ins and is *cross-engine
  * deterministic*: the only "hash" primitive is md5, which is bit-identical
  * in Spark and in the DuckDB oracle, so every derived integer hash agrees
  * exactly between the two engines. At 100 TB these are pure map-side
  * expressions — no shuffle, no UDF, fully pipelined into the parquet scan.
  */
object TextFunctions {

  /** Modulus used for all integer hashing: 2^31 − 1 (Mersenne prime).
    * Keeps every intermediate product < 2^62, so 64-bit arithmetic never
    * overflows in either engine (DuckDB raises on bigint overflow). */
  val HashMod: Long = 2147483647L

  /** Lowercased alphanumeric tokens, empties removed.
    * Same regex split the DuckDB oracle uses (`string_split_regex`). */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** Deterministic 60-bit non-negative hash of a string: first 15 hex chars
    * of md5, parsed base-16. Oracle side:
    * `cast('0x' || substr(md5(s),1,15) as bigint)`. */
  def hash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** hash60 reduced mod 2^31−1: safe to multiply by another 31-bit value. */
  def hash31(s: Column): Column = hash60(s) % HashMod

  /** Sliding n-gram (word) shingles over a token array: element i is the
    * space-joined window tokens[i..i+n). Empty array when fewer than n
    * tokens. The standard MinHash/Jaccard shingling unit. */
  def shingles(toks: Column, n: Int): Column = {
    val windows = transform(
      sequence(lit(1), greatest(size(toks) - (n - 1), lit(0))),
      i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*))
    when(size(toks) < n, array().cast("array<string>")).otherwise(windows)
  }

  /** Distinct shingle set (dedup within document before Jaccard/MinHash).
    * Backed by the single-pass [[expressions.WordShingles]] expression;
    * equals `array_distinct(shingles(tokens(text), n))`. */
  def shingleSet(text: Column, n: Int): Column =
    expressions.TextHashExpressions.wordShingles(tokens(text), n)

  /** Polynomial rolling-hash document fingerprint over the token stream:
    * fold((acc, t) => (acc*31 + hash31(t)) mod (2^31−1), 0).
    * Order-sensitive, so re-ordered documents fingerprint differently
    * (unlike a shingle set). Single-pass expression; tests assert
    * equivalence with [[fingerprintHof]]. */
  def fingerprint(text: Column): Column =
    expressions.TextHashExpressions.rollingFingerprint(tokens(text))

  /** HOF reference implementation of [[fingerprint]]. */
  def fingerprintHof(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => (acc * 31L + hash31(t)) % HashMod)

  /** 60-bit SimHash over the document's tokens: bit b of the result is set
    * iff sum over tokens of (bit b of hash60(token) ? +1 : −1) > 0.
    * Token multiplicity counts (standard Charikar weighting by frequency).
    * 60 bits (not 64) so the value stays a non-negative bigint in both
    * engines. */
  def simhash(text: Column): Column =
    expressions.TextHashExpressions.simhash60(tokens(text))

  /** HOF reference implementation of [[simhash]] (fixed 60 bits). */
  def simhashHof(text: Column, bits: Int = 60): Column = {
    val toks = tokens(text)
    // acc is an array of `bits` counters folded over the token stream in a
    // single pass; codegen subexpression-eliminates the repeated hash60(t).
    val counters = aggregate(
      toks,
      array_repeat(lit(0L), bits),
      (acc, t) => {
        val h = hash60(t)
        array((0 until bits).map(b =>
          element_at(acc, b + 1) +
            when(shiftright(h, b) % 2 === 1, 1L).otherwise(-1L)): _*)
      })
    (0 until bits).map(b =>
      when(element_at(counters, b + 1) > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
  }

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** MinHash signature of a shingle *set*: for permutation j (0-based),
    * sig[j] = min over shingles s of (A(j)·hash31(s) + B(j)) mod (2^31−1),
    * with A/B fixed odd/even linear-congruential-style constants derived
    * from j by pure integer arithmetic (identical in the oracle).
    * Single-pass expression hashing each shingle once (the HOF version
    * below re-hashes per permutation); empty set → empty signature. */
  def minhashSig(shingleSet: Column, perms: Int): Column =
    expressions.TextHashExpressions.minhashSig(shingleSet, perms)

  /** HOF reference implementation of [[minhashSig]] (empty set → array of
    * `perms` nulls rather than an empty array — callers filter empties
    * first). */
  def minhashSigHof(shingleSet: Column, perms: Int): Column =
    transform(sequence(lit(0), lit(perms - 1)), j => {
      val a = (j * 2654435761L) % HashMod + 1L // never 0
      val b = (j * 40503L + 11L) % HashMod
      array_min(transform(shingleSet, s => (a * hash31(s) + b) % HashMod))
    })

  /** Per-document term frequencies `array<struct<term,tf>>` in
    * first-occurrence order, one map-side pass over the token array —
    * the postings unit for BM25-style inverted indexes without an
    * `explode → groupBy(doc, term)` shuffle. Single-pass expression;
    * tests assert equivalence with [[termCountsHof]]. */
  def termCounts(toks: Column): Column =
    expressions.TextHashExpressions.termCounts(toks)

  /** HOF reference implementation of [[termCounts]] (O(distinct·n) per
    * row — reference semantics only; `array_distinct` keeps
    * first-occurrence order, matching the expression). */
  def termCountsHof(toks: Column): Column =
    transform(array_distinct(toks), t =>
      struct(t.as("term"),
        size(filter(toks, x => x === t)).cast("long").as("tf")))

  /** LSH band keys from a MinHash signature: bands of `rowsPerBand`
    * consecutive signature values, rendered "band:v1,v2,..," so equal keys
    * ⇔ equal band. Docs sharing ≥1 band key are near-dup candidates. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      concat_ws(":", b.cast("string"),
        array_join(slice(sig, b * lit(rowsPerBand) + 1, lit(rowsPerBand)), ",")))
}
