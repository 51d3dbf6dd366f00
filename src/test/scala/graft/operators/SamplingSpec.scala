package graft.operators

import graft.SparkTestBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Seeded sampling invariants and the large-corpus equivalence. */
class SamplingSpec extends SparkTestBase {

  private lazy val docs = Tables.documents(spark, sf())

  test("exactSample: exact size, distinct keys, deterministic per seed") {
    val a = Sampling.exactSample(docs, 50, 42L).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    val b = Sampling.exactSample(docs, 50, 42L).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(a.length == 50 && a.distinct.length == 50)
    assert(a == b)
    val other = Sampling.exactSample(docs, 50, 7L).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(other != a) // different seed, different sample (w.h.p.)
  }

  test("exactSampleLarge picks the identical sample (pre-filter is a pure optimization)") {
    val total = docs.count()
    val plain = Sampling.exactSample(docs, 80, 42L).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    val large = Sampling.exactSampleLarge(docs, 80, 42L, total).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(large == plain)
  }

  test("n larger than corpus returns everything") {
    val all = Sampling.exactSample(docs.limit(30), 1000, 42L).count()
    assert(all == 30)
  }

  test("stratifiedSample: min(k, |stratum|) per stratum; salting is invisible") {
    import org.apache.spark.sql.expressions.Window
    val got = Sampling.stratifiedSample(docs, "lang", "doc_id", 10, 42L)
    // per-stratum counts
    val sizes = docs.groupBy(col("lang").as("stratum")).count()
    val bad = got.groupBy("stratum").count().as("g")
      .join(sizes.as("s"), "stratum")
      .where(col("g.count") =!= least(lit(10L), col("s.count")))
    assert(bad.count() == 0)
    // equals the direct single-window reference (salting is pure plumbing)
    val rk = md5(concat_ws(":", lit("42"), col("doc_id").cast("string")))
    val ref = docs
      .select(col("lang").as("stratum"), col("doc_id").as("key"), rk.as("__rk"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("stratum").orderBy(col("__rk"), col("key"))))
      .where(col("rnk") <= 10).drop("__rk")
    assert(got.exceptAll(ref).count() == 0 && ref.exceptAll(got).count() == 0)
  }

  test("negativeSamples: exactly k per query, no self, no positives, deterministic") {
    import spark.implicits._
    val queries = (0L until 10L).toDF("query_id")
    val corpus = (0L until 400L).toDF("cand_id")
    // positives: each query's 20 consecutive ids (some overlap its pool)
    val positives = (0L until 10L).flatMap(q => (q * 3 until q * 3 + 20)
      .map(c => (q, c))).toDF("query_id", "cand_id")
    val got = Sampling.negativeSamples(queries, corpus, positives, 5, 4, "7")
    assert(got.count() == 50)
    assert(got.groupBy("query_id").count().where(col("count") =!= 5).count() == 0)
    assert(got.where(col("neg_id") === col("query_id")).count() == 0)
    assert(got.join(positives,
      got("query_id") === positives("query_id") &&
        got("neg_id") === positives("cand_id")).count() == 0)
    val again = Sampling.negativeSamples(
      queries.repartition(7), corpus.repartition(5), positives, 5, 4, "7")
    assert(got.exceptAll(again).count() == 0 && again.exceptAll(got).count() == 0)
    // pool restriction: every draw comes from the query's hash pool
    val pool = corpus.select(col("cand_id").as("neg_id"),
      pmod(graft.functions.TextFunctions.hash60(
        concat_ws(":", lit("7"), col("cand_id").cast("string"))), lit(4L)).as("p"))
    assert(got.join(pool, "neg_id")
      .where(col("p") =!= pmod(col("query_id"), lit(4L))).count() == 0)
  }

  test("weightedSample: exact size, deterministic, layout-independent") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, (i % 7 + 1).toDouble)).toDF("k", "w")
    val got = Sampling.weightedSample(df, "k", "w", 40, "s1")
    assert(got.count() == 40)
    assert(got.select("key").distinct().count() == 40)
    assert(got.agg(max("rnk")).collect()(0).getInt(0) == 40)
    val again = Sampling.weightedSample(df.repartition(13), "k", "w", 40, "s1")
    assert(got.exceptAll(again).count() == 0 && again.exceptAll(got).count() == 0)
  }

  test("weightedSample: inclusion tracks weight; non-positive weights excluded") {
    import spark.implicits._
    // one overwhelming weight among hundreds of tiny ones: P(miss) is
    // astronomically small (u^(1/1e12) ≈ 1 − 1e-12·(−ln u))
    val df = ((1L to 400L).map(i => (i, 0.001)) :+ ((999L, 1e12)))
      .toDF("k", "w")
    val got = Sampling.weightedSample(df, "k", "w", 5, "s2")
      .select("key").collect().map(_.getLong(0)).toSet
    assert(got.contains(999L))
    val withZero = df.union(Seq((1000L, 0.0), (1001L, -3.0)).toDF("k", "w"))
    val keys = Sampling.weightedSample(withZero, "k", "w", 500, "s2")
      .select("key").collect().map(_.getLong(0)).toSet
    assert(!keys.contains(1000L) && !keys.contains(1001L))
  }
}
