package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** SQ8 quantization: code range, zero-vector guard, reconstruction
  * bound, and the no-shuffle plan contract. */
class QuantizeSpec extends SparkTestBase {

  test("codes in [-127,127], max-magnitude element hits ±127, zero vector safe") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)), // max |v| = 1.0 -> code -127
      (2L, Array(0.0f, 0.0f, 0.0f))    // zero vector
    ).toDF("vec_id", "embedding")
    val rows = Quantize.int8(df).orderBy("vec_id").collect()
    val c1 = rows(0).getSeq[Long](rows(0).fieldIndex("codes"))
    assert(c1.min == -127L && c1.max <= 127L)
    assert(c1 == Seq(64L, -127L, 32L)) // 0.5/ (1/127) = 63.5 -> half-up 64
    val c2 = rows(1).getSeq[Long](rows(1).fieldIndex("codes"))
    assert(rows(1).getDouble(rows(1).fieldIndex("scale")) == 0.0)
    assert(c2 == Seq(0L, 0L, 0L))
  }

  test("reconstruction cosine stays above the SQ8 bound on real embeddings") {
    val emb = graft.sources.Tables.embeddings(spark, sf())
    val dig = Quantize.reconstructionDigest(emb)
    assert(dig.where(col("cos_recon") < 0.999).count() == 0)
  }

  test("digest plan has no exchange (pure map-side pass)") {
    val emb = graft.sources.Tables.embeddingsRaw(spark, sf())
    val plan = Quantize.reconstructionDigest(emb)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
