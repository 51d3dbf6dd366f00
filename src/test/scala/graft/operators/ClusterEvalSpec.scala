package graft.operators

import graft.SparkTestBase

/** Centroid-silhouette semantics: prototype geometry, sign behavior,
  * and the [-1, 1] range contract. */
class ClusterEvalSpec extends SparkTestBase {

  import spark.implicits._

  private def emb(rows: Seq[(Long, String, Seq[Double])]) =
    rows.toDF("vec_id", "label", "embedding")

  test("well-separated clusters score the symmetric closed form") {
    // A = {(0,0),(0,2)} centroid (0,1); B = {(10,0),(10,2)} centroid
    // (10,1). Every point: a = 1, b = sqrt(101) — one silhouette value
    val df = emb(Seq(
      (1L, "A", Seq(0.0, 0.0)), (2L, "A", Seq(0.0, 2.0)),
      (3L, "B", Seq(10.0, 0.0)), (4L, "B", Seq(10.0, 2.0))))
    val out = ClusterEval.centroidSilhouette(df, "vec_id", "label", "embedding")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    val a = 1.0
    val b = BigDecimal(math.sqrt(101.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = BigDecimal((b - a) / math.max(a, b))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("A") == ((2L, expected)))
    assert(out("B") == ((2L, expected)))
  }

  test("a point on the wrong side of the midline goes negative") {
    // label A holds an outlier sitting ON B's centroid: its a is large,
    // its b is 0 → silhouette −1 for that point
    val df = emb(Seq(
      (1L, "A", Seq(0.0, 0.0)), (2L, "A", Seq(0.0, 2.0)),
      (3L, "A", Seq(10.0, 0.0)),
      (4L, "B", Seq(10.0, -2.0)), (5L, "B", Seq(10.0, 2.0))))
    val per = ClusterEval.centroidSilhouette(df, "vec_id", "label", "embedding")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(per("A") < per("B"), "the contaminated cluster scores lower")
  }

  test("silhouettes stay within [-1, 1] and degenerate overlap scores 0") {
    // both labels share the same centroid: a = b for every point → 0;
    // plus a fuzzed corpus stays in range
    val same = emb(Seq(
      (1L, "A", Seq(1.0, 1.0)), (2L, "A", Seq(-1.0, -1.0)),
      (3L, "B", Seq(1.0, 1.0)), (4L, "B", Seq(-1.0, -1.0))))
    val out = ClusterEval.centroidSilhouette(same, "vec_id", "label", "embedding")
      .collect().map(_.getDouble(2))
    assert(out.forall(_ == 0.0))
    val rnd = new scala.util.Random(3)
    val fuzz = emb((1 to 60).map(i =>
      (i.toLong, if (i % 3 == 0) "x" else if (i % 3 == 1) "y" else "z",
        Seq.fill(4)(rnd.nextGaussian()))))
    val sils = ClusterEval.centroidSilhouette(fuzz, "vec_id", "label", "embedding")
      .collect().map(_.getDouble(2))
    assert(sils.forall(s => s >= -1.0 && s <= 1.0))
  }
}
