package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Exact-covariance PCA semantics on planted low-rank data. */
class PcaSpec extends SparkTestBase {

  import spark.implicits._

  // 2-d data along the (1,1) direction with tiny orthogonal noise:
  // PC1 must align with (1,1)/√2 and carry almost all variance.
  private def planted = (1 to 100).map { i =>
    val t = (i - 50.5) / 50.0
    val noise = (i % 3 - 1) * 0.001
    (i.toLong, Seq(t + noise, t - noise))
  }.toDF("vec_id", "embedding")

  test("covarianceStats: exact values on a tiny hand-computed frame") {
    val df = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(3.0, 4.0)), (3L, Seq(5.0, 9.0)))
      .toDF("vec_id", "embedding")
    val out = Pca.covarianceStats(df, "embedding", 2, 1.0).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    // snapped at scale=1: x=(1,3,5), y=(2,4,9)
    // cov(x,x) = (3*35 - 81)/(3*2) = 4; cov(x,y) = (3*59-9*15)/6 = 7
    // cov(y,y) = (3*101 - 225)/6 = 13
    assert(out((0, 0)) == ((9L, 9L, 35L, 4.0)))
    assert(out((0, 1)) == ((9L, 15L, 59L, 7.0)))
    assert(out((1, 1)) == ((15L, 15L, 101L, 13.0)))
  }

  test("covarianceStats is partition-invariant (exact BigInt merge)") {
    val a = Pca.covarianceStats(planted.repartition(1), "embedding", 2)
      .collect().map(_.toString).sorted
    val b = Pca.covarianceStats(planted.repartition(7), "embedding", 2)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("fitComponents recovers the planted principal direction") {
    val (comps, evs, trace) = Pca.fitComponents(planted, "embedding", 2, 2)
    assert(evs(0) > evs(1))
    assert(evs(0) / trace > 0.99, "PC1 should carry ~all planted variance")
    // PC1 ∝ (1,1)/√2 up to sign
    val v = comps(0)
    assert(math.abs(math.abs(v(0)) - math.sqrt(0.5)) < 0.01)
    assert(math.abs(v(0) - v(1)) < 0.02 || math.abs(v(0) + v(1)) < 1e-9)
  }

  test("pcaDigest: all contracts hold; projection preserves rows") {
    val r = Pca.pcaDigest(planted, "vec_id", "embedding", 2, 1).collect()(0)
    assert(r.getLong(0) == 100L)
    assert(r.getInt(1) == 2 && r.getInt(2) == 1)
    assert(r.getBoolean(3), "orthonormal_ok")
    assert(r.getBoolean(4), "eigen_ok")
    assert(r.getBoolean(5), "bessel_ok")
  }

  test("jlProject: deterministic signs, distances roughly preserved") {
    val rnd = new scala.util.Random(11)
    val df = (1 to 60).map(i =>
      (i.toLong, Seq.fill(32)(rnd.nextGaussian() * 0.1))).toDF("vec_id", "embedding")
    val out = Pca.jlProject(df, "vec_id", "embedding", 32, 16)
    val a = out.collect().map(_.toString).sorted
    val b = Pca.jlProject(df.repartition(5), "vec_id", "embedding", 32, 16)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b)) // pure function of input, integer arithmetic
    // JL with ±1 signs preserves squared norms in expectation:
    // E‖Rx‖² = dimOut·‖x‖². Check the ratio is within 2x on average.
    val rows = out.collect()
    val src = df.collect().map(r => r.getLong(0) ->
      r.getSeq[Double](1).map(v => math.floor(v * 1e6 + 0.5)).toArray).toMap
    val ratios = rows.map { r =>
      val pn = (1 to 16).map(c => math.pow(r.getLong(c).toDouble, 2)).sum
      val xn = src(r.getLong(0)).map(v => v * v).sum
      pn / (16.0 * xn)
    }
    val meanRatio = ratios.sum / ratios.length
    assert(meanRatio > 0.5 && meanRatio < 2.0,
      s"norm preservation off: $meanRatio")
  }

  test("project: k=dim orthonormal basis preserves norms (rotation)") {
    val (comps, _, _) = Pca.fitComponents(planted, "embedding", 2, 2)
    val proj = Pca.project(planted, "vec_id", "embedding", comps)
    val norms = proj.select(col("vec_id"),
      (col("pc0") * col("pc0") + col("pc1") * col("pc1")).as("pn"))
    val orig = planted.select(col("vec_id"),
      (col("embedding")(0) * col("embedding")(0) +
        col("embedding")(1) * col("embedding")(1)).as("xn"))
    val diff = norms.join(orig, "vec_id")
      .select(max(abs(col("pn") - col("xn")))).collect()(0).getDouble(0)
    assert(diff < 1e-9, s"full-rank projection must be an isometry, got $diff")
  }
}
