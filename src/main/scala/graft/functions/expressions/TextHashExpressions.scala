package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
// ColumnBridge: Java shim over spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass hash expressions for the dedup/text-analysis operators.
  *
  * These replace `transform`/`aggregate` higher-order-function
  * compositions (interpreted, per-element lambda dispatch, and — for
  * minhash — `perms` separate md5 evaluations per shingle) with tight
  * per-row loops that hash each token/shingle exactly once. Values are
  * BIT-IDENTICAL to the HOF versions in [[graft.functions.TextFunctions]]
  * and to the DuckDB oracle SQL: the hash primitive everywhere is
  * "first 15 hex chars of md5, base-16" = the top 60 bits of the digest.
  *
  * CodegenFallback: the cost is dominated by md5 over strings, which
  * codegen cannot improve; the fallback call still runs inside the
  * surrounding WholeStageCodegen projection.
  */
object Md5Hash {
  val Mod: Long = 2147483647L // 2^31 - 1

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 15 hex chars of md5(s), parsed base-16 = top 60 bits. */
  def hash60(s: UTF8String): Long = {
    val d = digest.get()
    d.reset()
    val h = d.digest(s.getBytes)
    // first 8 bytes big-endian, then drop the low nibble (16th hex char)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    v >>> 4
  }

  def hash31(s: UTF8String): Long = hash60(s) % Mod
}

/** Sliding word-n-gram shingle set (distinct, first-occurrence order) over
  * a token array — the MinHash/Jaccard shingling unit. Equals
  * `array_distinct(shingles(toks, n))` from TextFunctions. */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle size must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= m - n) {
      var s = toks.getUTF8String(i)
      var j = 1
      while (j < n) {
        s = UTF8String.concat(s, UTF8String.fromString(" "), toks.getUTF8String(i + j))
        j += 1
      }
      seen.add(s)
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
}

/** MinHash signature over a shingle array: sig[j] = min over shingles s of
  * (A(j)·hash31(s) + B(j)) mod (2^31−1), A/B the same derived constants as
  * TextFunctions.minhashSig. Each shingle is hashed ONCE (the HOF version
  * re-hashed it per permutation). Empty input → empty signature (so
  * `size(sig) > 0` filters unshingleable docs, matching the oracle's
  * `len(s) > 0`). */
case class MinHashSig(child: Expression, perms: Int)
    extends UnaryExpression with CodegenFallback {

  require(perms >= 1, "perms must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val as: Array[Long] =
    Array.tabulate(perms)(j => (j.toLong * 2654435761L) % Md5Hash.Mod + 1L)
  @transient private lazy val bs: Array[Long] =
    Array.tabulate(perms)(j => (j.toLong * 40503L + 11L) % Md5Hash.Mod)

  override def nullSafeEval(input: Any): Any = {
    val sh = input.asInstanceOf[ArrayData]
    val m = sh.numElements()
    if (m == 0) return new GenericArrayData(Array.empty[Long])
    val sig = Array.fill(perms)(Long.MaxValue)
    var i = 0
    while (i < m) {
      val h = Md5Hash.hash31(sh.getUTF8String(i))
      var j = 0
      while (j < perms) {
        val v = (as(j) * h + bs(j)) % Md5Hash.Mod
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/** 60-bit SimHash over a token array (multiplicity counts): bit b set iff
  * sum over tokens of ±1 by bit b of hash60(token) is > 0. Equals
  * TextFunctions.simhash. */
case class SimHash60(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    val counters = new Array[Int](60)
    var i = 0
    while (i < m) {
      val h = Md5Hash.hash60(toks.getUTF8String(i))
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) { if (counters(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def withNewChildInternal(c: Expression): SimHash60 = copy(child = c)
}

/** Order-sensitive polynomial rolling hash over the token stream:
  * fold((acc, t) => (acc·31 + hash31(t)) mod (2^31−1), 0). Equals
  * TextFunctions.fingerprint. */
case class RollingFingerprint(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    var acc = 0L
    var i = 0
    while (i < m) {
      acc = (acc * 31L + Md5Hash.hash31(toks.getUTF8String(i))) % Md5Hash.Mod
      i += 1
    }
    acc
  }

  override protected def withNewChildInternal(c: Expression): RollingFingerprint = copy(child = c)
}

/** Per-document term frequencies in ONE map-side pass:
  * `array<struct<term,tf>>` in first-occurrence order (= the order
  * `array_distinct` preserves, so the HOF reference matches exactly on
  * null-free arrays — `tokens()` never emits null elements; a null
  * element here is SKIPPED, where the HOF would emit a degenerate
  * `(null, 0)` placeholder). Replaces the `explode → groupBy(doc, term)`
  * shuffle of a postings build — at corpus scale that exchange moves one
  * row per TOKEN; this moves nothing, and the downstream term-keyed join
  * is the first shuffle the postings ever see. Callers own the
  * one-row-per-document precondition: rows sharing an id do NOT merge
  * (the groupBy shape did). */
case class TermCounts(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    val counts = new java.util.LinkedHashMap[UTF8String, java.lang.Long]()
    var i = 0
    while (i < m) {
      val t = toks.getUTF8String(i)
      if (t != null) {
        val prev = counts.get(t)
        // copy out of the (possibly reused) unsafe row buffer only on
        // FIRST insert — lookups hash/compare by content, so the
        // borrowed reference is safe within this eval, and updates keep
        // the map's existing (copied) key
        if (prev == null) counts.put(UTF8String.fromBytes(t.getBytes), 1L)
        else counts.put(t, prev + 1L)
      }
      i += 1
    }
    val out = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = org.apache.spark.sql.catalyst.InternalRow(e.getKey, e.getValue)
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): TermCounts = copy(child = c)
}

object TextHashExpressions {
  private def c(e: Expression): Column = ColumnBridge.column(e)
  private def e(col: Column): Expression = ColumnBridge.expression(col)

  def wordShingles(tokens: Column, n: Int): Column = c(WordShingles(e(tokens), n))
  def minhashSig(shingles: Column, perms: Int): Column = c(MinHashSig(e(shingles), perms))
  def simhash60(tokens: Column): Column = c(SimHash60(e(tokens)))
  def rollingFingerprint(tokens: Column): Column = c(RollingFingerprint(e(tokens)))
  def termCounts(tokens: Column): Column = c(TermCounts(e(tokens)))
}
