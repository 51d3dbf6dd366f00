package graft.operators

import graft.SparkTestBase
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** Product quantization: seeded determinism, code range, reconstruction
  * on clusterable data, AdcScore expression parity with its HOF
  * rendering, and refine ≡ exact when the shortlist covers every probed
  * candidate. */
class PqSpec extends SparkTestBase {

  private def emb = graft.sources.Tables.embeddings(spark, sf())
    .select("vec_id", "embedding")

  test("fit is deterministic under the seed; codebook shape m×ksub×dsub") {
    val a = Pq.fit(emb, 64, 8, 4, seed = 7L)
    val b = Pq.fit(emb, 64, 8, 4, seed = 7L)
    assert(a.codebooks.length == 8)
    assert(a.codebooks.forall(book => book.length == 4 && book.forall(_.length == 8)))
    assert(a.codebooks.flatten.flatten.toSeq == b.codebooks.flatten.flatten.toSeq)
  }

  test("encode emits one in-range code per subspace; cell passes through") {
    val pq = Pq.fit(emb, 64, 8, 4)
    val withCell = emb.withColumn("cell", pmod(col("vec_id"), lit(3)).cast("int"))
    val enc = Pq.encode(pq, withCell)
    assert(enc.columns.toSet == Set("vec_id", "cell", "codes"))
    val bad = enc.where(size(col("codes")) =!= 8 ||
      exists(col("codes"), c => c < 0 || c >= 4)).count()
    assert(bad == 0)
  }

  test("decoded reconstruction is near-exact when data IS the codebook points") {
    import spark.implicits._
    // 4 distinct unit-ish vectors repeated 8× each: with ksub=4 every
    // cluster collapses onto its member, so decode must reproduce the
    // normalized input almost exactly.
    val base = Seq(
      Array.tabulate(8)(i => if (i == 0) 1.0f else 0.1f),
      Array.tabulate(8)(i => if (i == 3) 1.0f else -0.2f),
      Array.tabulate(8)(i => if (i == 5) -1.0f else 0.3f),
      Array.tabulate(8)(i => 0.5f * (i + 1)))
    val df = (0 until 32).map(i => (i.toLong, base(i % 4))).toDF("vec_id", "embedding")
    val pq = Pq.fit(df, 8, 2, 4, maxTrain = 32)
    val enc = Pq.encode(pq, df)
    val cos = enc
      .join(df.withColumn("__nv", VectorFunctions.l2Normalize(col("embedding")))
        .select("vec_id", "__nv"), Seq("vec_id"))
      .select(VectorFunctions.cosine(Pq.decoded(pq, col("codes")), col("__nv")).as("c"))
    assert(cos.where(col("c") < 0.9999).count() == 0)
  }

  test("AdcScore expression matches the HOF rendering bit-identically") {
    import spark.implicits._
    val df = Seq(
      (Array(0, 2, 1), Array(Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0), Array(7.0, 8.0, 9.0))),
      (Array(1, 1, 1), Array(Array(-1.5, 2.5, 0.0), Array(0.25, -0.25, 1.0), Array(0.0, 0.125, 2.0)))
    ).toDF("codes", "lut")
    val both = df.select(
      graft.functions.expressions.VectorExpressions.adcScore(col("codes"), col("lut")).as("expr"),
      aggregate(zip_with(col("lut"), col("codes"), (l, c) => element_at(l, c + 1)),
        lit(0.0), (acc, x) => acc + x).as("hof"))
    assert(both.where(col("expr") =!= col("hof")).count() == 0)
    // out-of-range code -> null, not an error
    val oob = Seq((Array(5), Array(Array(1.0)))).toDF("codes", "lut")
      .select(graft.functions.expressions.VectorExpressions.adcScore(col("codes"), col("lut")).as("s"))
    assert(oob.collect()(0).isNullAt(0))
  }

  test("PqLut expression matches the HOF rendering bit-identically") {
    val pq = Pq.fit(emb, 64, 8, 4)
    val nq = emb.select(
      graft.functions.VectorFunctions.l2Normalize(col("embedding")).as("nq"))
    val expr = nq.select(
      graft.functions.expressions.VectorExpressions.pqLut(col("nq"), pq.codebooks).as("lut"))
    val hof = nq.select(Pq.lutOfHof(pq, col("nq")).as("lut"))
    assert(expr.exceptAll(hof).count() == 0 && hof.exceptAll(expr).count() == 0)
  }

  test("PqLut nulls on a query of the wrong dimensionality (no silent garbage)") {
    import spark.implicits._
    val pq = Pq.fit(emb, 64, 8, 4)
    val short = Seq(Array.fill(16)(0.5)).toDF("nq").select(
      graft.functions.expressions.VectorExpressions.pqLut(col("nq"), pq.codebooks).as("lut"))
    assert(short.collect()(0).isNullAt(0))
  }

  test("fit sample membership is layout-independent when corpus > maxTrain") {
    // With maxTrain below the corpus size, a bare limit() would pick a
    // partition-order-dependent subset; the hash-ordered take must make
    // codebooks identical across different partitionings.
    val a = Pq.fit(emb.repartition(3), 64, 8, 4, maxTrain = 500)
    val b = Pq.fit(emb.repartition(17, col("vec_id")), 64, 8, 4, maxTrain = 500)
    assert(a.codebooks.flatten.flatten.toSeq == b.codebooks.flatten.flatten.toSeq)
  }

  test("refined top-k with full-coverage shortlist equals the exact probed serve") {
    val model = Ivf.fit(emb, 4)
    val index = Ivf.assign(model, emb)
    val pq = Pq.fit(emb, 64, 16, 16)
    val enc = Pq.encode(pq, index.select("vec_id", "embedding", "cell"))
    val q = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    // shortlist >= all candidates in probed cells -> refine sees every
    // candidate the exact path sees, so the result must be identical.
    val refined = Pq.topKRefined(enc, emb, pq, model, q, 5, 100000, 2)
      .select("query_id", "vec_id", "rnk")
    val exact = Ivf.topK(index, model, q, 5, 2)
      .select("query_id", "vec_id", "rnk")
    assert(refined.exceptAll(exact).count() == 0)
    assert(exact.exceptAll(refined).count() == 0)
  }
}
