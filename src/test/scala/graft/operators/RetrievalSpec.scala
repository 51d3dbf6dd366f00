package graft.operators

import graft.SparkTestBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Content retrieval (exact + label-pruned + LSH), resolver, sampling,
  * evaluation. */
class RetrievalSpec extends SparkTestBase {

  private def emb = spark.createDataFrame(Seq(
    (1L, Array(1.0f, 0.0f), 0),
    (2L, Array(0.9f, 0.1f), 0),
    (3L, Array(0.0f, 1.0f), 1),
    (4L, Array(0.1f, 0.9f), 1)))
    .toDF("vec_id", "embedding", "label")

  test("topK: nearest first, self excluded, k enforced") {
    val q = emb.where(col("vec_id") === 1)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val out = ContentRetriever.topK(emb, q, 2).orderBy(col("rnk"))
      .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
    assert(out == Seq(2L, 4L)) // 2 is closest; 4 beats 3 (cos>0 vs 0); self dropped
  }

  test("topKByLabel only scores the query's cell") {
    val q = emb.where(col("vec_id") === 1)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("label"))
    val out = ContentRetriever.topKByLabel(emb, q, 5)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(out == Set(2L)) // only label-0 mates considered
  }

  test("LSH bucketing is deterministic and pairs stay within buckets") {
    val b1 = Lsh.withBucket(emb, 8, 2).select(col("vec_id"), col("bucket")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b2 = Lsh.withBucket(emb, 8, 2).select(col("vec_id"), col("bucket")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b1 == b2)
    val pairs = Lsh.cosinePairsInBuckets(emb, 8, 2, -1.0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs.foreach { case (a, b) => assert(b1(a) == b1(b)) }
  }

  test("resolver: exact id beats substring; shortest title wins; id tiebreak") {
    val items = spark.createDataFrame(Seq(
      ("10", "Spark Rocks"), ("11", "rocks"), ("12", "ROCKS"), ("13", "more rocks here")))
      .toDF("asin", "title")
    val sub = QueryResolver.resolve(items, "rocks").collect().head
    assert(sub.getString(0) == "11" && sub.getString(2) == "substring") // shortest, id asc beats "12"? length ties
    val exact = QueryResolver.resolve(items, "12").collect().head
    assert(exact.getString(0) == "12" && exact.getString(2) == "exact_id")
  }

  test("exactSample: exact size, deterministic per seed, rows from the input") {
    val docs = Tables.documents(spark, sf())
    val s1 = Sampling.exactSample(docs, 50, 7L).select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    val s2 = Sampling.exactSample(docs, 50, 7L).select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    assert(s1.size == 50 && s1 == s2 && s1.distinct.size == 50)
    val s3 = Sampling.exactSample(docs, 50, 8L).select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    assert(s1 != s3) // different seed, different sample (overwhelmingly)
  }

  test("salted top-n equals plain top-n over the FULL sf0.01 basket graph") {
    // q52 gates this equality on a 10% source stratum for bench cost
    // (round-2 verdict #2); the full-graph form lives here, where it runs
    // once per build instead of once per bench suite.
    val edges = CoPurchaseGraph.symmetrize(
      CoPurchaseGraph.fromOrders(Tables.lineitem(spark, sf("0.01"))))
      .localCheckpoint()
    val key = Seq("src", "dst", "rnk")
    val plain = CfRetriever.topN(edges, 10)
      .select(col("src"), col("dst"), col("rnk"), round(col("norm"), 9).as("norm"))
    val salted = CfRetriever.topNSalted(edges, 10, 8)
      .select(col("src"), col("dst"), col("rnk"), round(col("norm"), 9).as("norm"))
    val diff = plain.withColumn("p", lit(1))
      .join(salted.withColumn("s", lit(1)), key :+ "norm", "full_outer")
      .where(col("p").isNull || col("s").isNull)
    assert(diff.count() == 0)
  }

  test("precisionAtK: hand-checked counts, queries with zero hits included") {
    val ranked = spark.createDataFrame(Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (2L, 21L, 2)))
      .toDF("query_id", "item", "rnk")
    val truth = spark.createDataFrame(Seq(
      (1L, 10L), (1L, 12L), (1L, 99L)))
      .toDF("query_id", "item")
    val out = Evaluation.precisionAtK(ranked, truth, Seq(2, 3)).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out((1L, 2)) == (1L, 0.5))   // only item 10 within top-2
    assert(out((1L, 3)) == (2L, 2.0 / 3)) // 10 and 12 within top-3
    assert(out((2L, 2)) == (0L, 0.0))   // zero-hit query still reported
    val mean = Evaluation.meanPrecision(
      Evaluation.precisionAtK(ranked, truth, Seq(2))).collect().head
    assert(mean.getDouble(1) == 0.25 && mean.getLong(2) == 2L)
  }
}
