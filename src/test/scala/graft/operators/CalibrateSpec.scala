package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Exact-PAV isotonic regression semantics. */
class CalibrateSpec extends SparkTestBase {

  import spark.implicits._

  test("already-monotone labels are returned unchanged per block") {
    val df = Seq((0.1, 0), (0.2, 0), (0.3, 1), (0.4, 1))
      .toDF("score", "y")
    val out = Calibrate.isotonic(df, "score", "y").orderBy("score").collect()
    assert(out.map(_.getDouble(3)).toSeq == Seq(0.0, 0.0, 1.0, 1.0))
  }

  test("a violation pools: the textbook (1,0) inversion averages to 1/2") {
    val df = Seq((0.1, 0), (0.2, 1), (0.3, 0), (0.4, 1))
      .toDF("score", "y")
    val out = Calibrate.isotonic(df, "score", "y").orderBy("score").collect()
    // blocks: 0, 1, 0, 1 -> PAV pools the middle inversion to 1/2
    assert(out.map(_.getDouble(3)).toSeq == Seq(0.0, 0.5, 0.5, 1.0))
  }

  test("fitted values are non-decreasing and pool means are exact ratios") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 500).map { i =>
      val s = i / 500.0
      (s, if (rnd.nextDouble() < s * 0.8) 1 else 0)
    }.toDF("score", "y")
    val out = Calibrate.isotonic(df, "score", "y").orderBy("score").collect()
    val fs = out.map(_.getDouble(3))
    assert(fs.zip(fs.tail).forall { case (a, b) => a <= b }, "monotone")
    // every fitted value is n_pos_pool / n_pool for SOME integer pair:
    // check it reproduces from the pooled counts (blocks sharing fitted)
    out.groupBy(_.getDouble(3)).foreach { case (f, rows) =>
      val c = rows.map(_.getLong(1)).sum
      val p = rows.map(_.getLong(2)).sum
      assert(f == p.toDouble / c.toDouble, s"pool mean mismatch at $f")
    }
  }

  test("equal scores pre-pool into one block") {
    val df = Seq((0.5, 0), (0.5, 1), (0.7, 1)).toDF("score", "y")
    val out = Calibrate.isotonic(df, "score", "y").orderBy("score").collect()
    assert(out.length == 2)
    assert(out(0).getLong(1) == 2L && out(0).getDouble(3) == 0.5)
  }

  test("mean preservation: sum of fitted*n equals total positives") {
    val df = Seq((0.9, 0), (0.8, 1), (0.7, 1), (0.6, 0), (0.5, 1))
      .toDF("score", "y")
    val out = Calibrate.isotonic(df, "score", "y").collect()
    val mass = out.map(r => r.getDouble(3) * r.getLong(1)).sum
    assert(math.abs(mass - 3.0) < 1e-9)
  }
}
