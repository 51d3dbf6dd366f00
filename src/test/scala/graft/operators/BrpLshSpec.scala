package graft.operators

import graft.SparkTestBase
import graft.functions.VectorFunctions._
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The MLlib BRP-LSH path must agree with exact brute force at high
  * thresholds (LSH can only lose candidates, and with enough tables at
  * this scale it should lose none of the near-identical ones). */
class BrpLshSpec extends SparkTestBase {

  test("approx cosine pairs ⊆ exact pairs, and sim values match the exact cosine") {
    val emb = Tables.embeddings(spark, sf()).limit(120).cache()
    val model = BrpLsh.fit(emb, bucketLength = 2.0, numTables = 4)
    val approx = BrpLsh.cosinePairs(model, emb, 0.3)
      .select(col("a"), col("b"), round(col("sim"), 6).as("sim")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = Dedup.cosinePairs(emb, 0.3)
      .select(col("a"), col("b"), round(col("sim"), 6).as("sim")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(approx.nonEmpty)
    assert(approx.keySet.subsetOf(exact.keySet))
    approx.foreach { case (k, s) => assert(math.abs(s - exact(k)) < 1e-6) }
  }

  test("identical vectors always collide (distance 0 survives any bucketing)") {
    val emb = spark.createDataFrame(Seq(
      (1L, Array(0.5f, 0.5f, 0.0f)), (2L, Array(0.5f, 0.5f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f))))
      .toDF("vec_id", "embedding")
    val model = BrpLsh.fit(emb, bucketLength = 1.0, numTables = 2)
    val pairs = BrpLsh.cosinePairs(model, emb, 0.999)
      .select(col("a"), col("b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }
}
