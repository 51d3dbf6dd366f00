package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.expressions.{TextHashExpressions, VectorExpressions}

/** SQL registration of the custom Catalyst expressions: the
  * SparkSessionExtensions injection path and the runtime
  * FunctionRegistry path must both resolve, and SQL results must equal
  * the Column-API results bit-for-bit (same Expression instances). */
class GraftExtensionsSpec extends SparkTestBase {

  test("withExtensions(new GraftExtensions) injects the SQL functions") {
    // A fresh SparkSession on the shared SparkContext: extensions only
    // apply at session construction, so clear the cached sessions, build
    // with the extension, then restore the shared one.
    val prev = SharedSpark.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s2 ne prev)
      val r = s2.sql(
        """SELECT round(cosine_sim(array(3.0d, 4.0d), array(3.0d, 4.0d)), 6) AS c,
          |       simhash60(array('a', 'b', 'a')) AS sh,
          |       rolling_fingerprint(array('x', 'y')) AS fp,
          |       word_shingles(array('a', 'b', 'c', 'b', 'c'), 2) AS ws,
          |       minhash_sig(array('a b', 'c d'), 4) AS sig
          |""".stripMargin).collect().head
      assert(r.getAs[Double]("c") == 1.0)
      assert(r.getSeq[String](r.fieldIndex("ws")) == Seq("a b", "b c", "c b"))
      assert(r.getSeq[Long](r.fieldIndex("sig")).length == 4)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("runtime register(): SQL equals the Column API on real documents") {
    GraftExtensions.register(spark)
    val docs = graft.sources.Tables.documents(spark, sf()).limit(50)
    docs.createOrReplaceTempView("ext_docs")

    val sql = spark.sql(
      """SELECT doc_id,
        |  rolling_fingerprint(tk) AS fp,
        |  simhash60(tk) AS sh,
        |  minhash_sig(word_shingles(tk, 3), 8) AS sig,
        |  round(cosine_sim(array(cast(size(tk) AS DOUBLE), 1.0d),
        |                   array(1.0d, cast(size(tk) AS DOUBLE))), 6) AS cos
        |FROM (SELECT doc_id,
        |        filter(split(lower(text), '[^a-z0-9]+'), t -> t != '') AS tk
        |      FROM ext_docs)""".stripMargin)

    val toks = filter(split(lower(col("text")), "[^a-z0-9]+"), t => t =!= "")
    val api = docs.select(col("doc_id"),
      TextHashExpressions.rollingFingerprint(toks).as("fp"),
      TextHashExpressions.simhash60(toks).as("sh"),
      TextHashExpressions.minhashSig(
        TextHashExpressions.wordShingles(toks, 3), 8).as("sig"),
      round(VectorExpressions.cosineSim(
        array(size(toks).cast("double"), lit(1.0)),
        array(lit(1.0), size(toks).cast("double"))), 6).as("cos"))

    assert(sql.exceptAll(api).count() == 0 && api.exceptAll(sql).count() == 0)
  }

  test("sizing arguments must be integer literals") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT word_shingles(array('a'), cast(rand() * 3 AS INT))").collect()
    }
    assert(e.getMessage.contains("word_shingles") ||
      e.getCause != null && e.getCause.getMessage.contains("word_shingles"))
  }

  test("adc_score is SQL-callable and matches the hand sum") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT adc_score(array(0, 2), array(array(1.0d, 2.0d, 3.0d),
        |                                    array(4.0d, 5.0d, 6.0d))) AS s""".stripMargin)
      .collect()(0).getDouble(0)
    assert(r == 1.0 + 6.0)
  }
}
