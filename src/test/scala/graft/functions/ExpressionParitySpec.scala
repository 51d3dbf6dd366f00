package graft.functions

import graft.SparkTestBase
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The custom expressions must be BIT-IDENTICAL to their pure-built-in
  * (higher-order-function) reference implementations — that equivalence is
  * what keeps the DuckDB oracle valid after the performance rewrite. */
class ExpressionParitySpec extends SparkTestBase {

  private lazy val docs = Tables.documents(spark, sf()).limit(200).cache()
  private lazy val emb = Tables.embeddings(spark, sf()).limit(100).cache()

  test("cosine expression == cosine HOF on real embedding pairs") {
    val pairs = emb.select(col("vec_id").as("a"), col("embedding").as("va"))
      .crossJoin(emb.select(col("vec_id").as("b"), col("embedding").as("vb")))
      .where(col("a") < col("b")).limit(500)
    val diff = pairs
      .select(cosine(col("va"), col("vb")).as("x"), cosineHof(col("va"), col("vb")).as("y"))
      .where(col("x") =!= col("y") || col("x").isNull =!= col("y").isNull)
    assert(diff.count() == 0)
  }

  test("cosine basics: self=1, opposite=-1, zero-vector=0, length-mismatch=null") {
    val df = spark.createDataFrame(Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f), "self"),
      (Array(1.0f, 0.0f, 0.0f), Array(-1.0f, 0.0f, 0.0f), "opp"),
      (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 2.0f, 3.0f), "zero")))
      .toDF("a", "b", "tag")
    val got = df.select(col("tag"), round(cosine(col("a"), col("b")), 9).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("self") == 1.0)
    assert(got("opp") == -1.0)
    assert(got("zero") == 0.0)
    val mismatch = df.where(col("tag") === "self")
      .select(cosine(col("a"), slice(col("b"), 1, 2)))
    assert(mismatch.collect().head.isNullAt(0))
  }

  test("hash60 expression-backed fingerprint == conv(md5) HOF fingerprint") {
    val diff = docs.select(fingerprint(col("text")).as("x"), fingerprintHof(col("text")).as("y"))
      .where(col("x") =!= col("y"))
    assert(diff.count() == 0)
  }

  test("simhash expression == simhash HOF") {
    val diff = docs.select(simhash(col("text")).as("x"), simhashHof(col("text")).as("y"))
      .where(col("x") =!= col("y"))
    assert(diff.count() == 0)
  }

  test("shingleSet expression == array_distinct(shingles) HOF") {
    val hof = array_distinct(shingles(tokens(col("text")), 3))
    val diff = docs.select(shingleSet(col("text"), 3).as("x"), hof.as("y"))
      .where(col("x") =!= col("y"))
    assert(diff.count() == 0)
  }

  test("minhashSig expression == minhashSig HOF on non-empty shingle sets") {
    val sh = docs.select(shingleSet(col("text"), 3).as("s")).where(size(col("s")) > 0)
    val diff = sh.select(minhashSig(col("s"), 16).as("x"), minhashSigHof(col("s"), 16).as("y"))
      .where(col("x") =!= col("y"))
    assert(diff.count() == 0)
  }

  test("termCounts expression == array_distinct/filter HOF on real docs") {
    val toks = tokens(col("text"))
    val diff = docs.select(termCounts(toks).as("x"), termCountsHof(toks).as("y"))
      .where(col("x") =!= col("y"))
    assert(diff.count() == 0)
  }

  test("termCounts: empty array, null input, and null elements") {
    // empty token array → empty result; counts fold multiplicity
    val df = spark.createDataFrame(Seq(Tuple1(""), Tuple1("a b a")))
      .toDF("text")
    val sizes = df.select(termCounts(tokens(col("text"))).as("tc"))
      .select(size(col("tc"))).collect().map(_.getInt(0)).sorted
    assert(sizes.toSeq == Seq(0, 2))
    // null input array → null output (null-intolerant, like the HOF)
    val nullIn = spark.sql("SELECT cast(null as array<string>) AS a")
      .select(termCounts(col("a")).as("tc"))
    assert(nullIn.collect().head.isNullAt(0))
    // null ELEMENTS are skipped (tokens() never emits them; the HOF
    // would emit a degenerate (null, 0) placeholder instead)
    val nullElem = spark.sql("SELECT array('a', cast(null as string), 'a') AS a")
      .select(termCounts(col("a")).as("tc")).collect().head
      .getSeq[org.apache.spark.sql.Row](0)
    assert(nullElem.map(r => (r.getString(0), r.getLong(1))) == Seq(("a", 2L)))
  }

  test("minhashSig of empty shingle set is empty (not nulls)") {
    val row = spark.sql("SELECT array()").select(
      minhashSig(col("array()").cast("array<string>"), 8).as("s"))
    assert(row.select(size(col("s"))).collect().head.getInt(0) == 0)
  }

  test("shingle windows: fewer tokens than n gives empty set") {
    val df = spark.createDataFrame(Seq(Tuple1("one two"))).toDF("text")
    assert(df.select(size(shingleSet(col("text"), 3))).collect().head.getInt(0) == 0)
  }
}
