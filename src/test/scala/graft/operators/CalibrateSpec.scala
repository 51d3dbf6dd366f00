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

  test("distributed split-PAV matches a single-pass reference (random)") {
    // brute-force sequential PAV, the pre-round-7 single-task algorithm
    def refPav(blocks: Seq[(Double, Long, Long)]): Map[Double, Double] = {
      val arr = blocks.sortBy(_._1)
      val st = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
      arr.foreach { case (_, c, p) =>
        var cur = (c, p, 1)
        while (st.nonEmpty && st.last._2 * cur._1 >= cur._2 * st.last._1) {
          val t = st.remove(st.length - 1)
          cur = (t._1 + cur._1, t._2 + cur._2, t._3 + cur._3)
        }
        st += cur
      }
      val out = scala.collection.mutable.Map.empty[Double, Double]
      var idx = 0
      st.foreach { case (c, p, nb) =>
        (0 until nb).foreach { _ =>
          out(arr(idx)._1) = p.toDouble / c.toDouble; idx += 1
        }
      }
      out.toMap
    }
    val rnd = new scala.util.Random(42)
    val rows = (1 to 4000).map { _ =>
      (rnd.nextInt(700) / 700.0, if (rnd.nextBoolean()) 1 else 0)
    }
    val byScore = rows.groupBy(_._1).map { case (s, g) =>
      (s, g.size.toLong, g.count(_._2 == 1).toLong)
    }.toSeq
    val expect = refPav(byScore)
    val got = Calibrate.isotonic(rows.toDF("score", "y"), "score", "y")
      .collect().map(r => r.getDouble(0) -> r.getDouble(3)).toMap
    assert(got.size == expect.size)
    expect.foreach { case (s, f) =>
      assert(got(s) == f, s"fitted mismatch at score $s")
    }
  }

  test("scale path: 1e6 distinct scores, no single-task sort of them") {
    // the per-score sort must be the distributed range partition, never
    // one task holding the full score list (round-6 verdict item 5)
    val big = spark.range(1000000L).selectExpr(
      "id / 1e6 AS score", "cast(id % 2 AS int) AS y")
    val out = Calibrate.isotonic(big, "score", "y")
    assert(out.queryExecution.executedPlan.toString
      .toLowerCase.contains("rangepartitioning"),
      "phase-1 sort must be a distributed range partition")
    val agg = out.agg(
      count(lit(1)), sum("n"), sum(col("fitted") * col("n"))).collect()(0)
    assert(agg.getLong(0) == 1000000L, "one row per distinct score")
    assert(agg.getLong(1) == 1000000L)
    // mass preservation: Σ fitted·n = total positives (500000 odd ids)
    assert(math.abs(agg.getDouble(2) - 500000.0) < 1e-4)
    // monotone without a driver-side pass: count adjacent inversions
    val inv = out.select(col("score"), col("fitted"))
      .withColumn("prev", lag("fitted", 1).over(
        org.apache.spark.sql.expressions.Window.orderBy("score")))
      .where(col("prev") > col("fitted")).count()
    assert(inv == 0L, "fitted must be non-decreasing in score")
  }

  test("mean preservation: sum of fitted*n equals total positives") {
    val df = Seq((0.9, 0), (0.8, 1), (0.7, 1), (0.6, 0), (0.5, 1))
      .toDF("score", "y")
    val out = Calibrate.isotonic(df, "score", "y").collect()
    val mass = out.map(r => r.getDouble(3) * r.getLong(1)).sum
    assert(math.abs(mass - 3.0) < 1e-9)
  }

  test("conformalSplit: q-hat is the exact k-th smallest calibration residual") {
    // one group, yhat = 100 exactly; 19 calibration residuals 0..18
    // cents → k = ceil(20·0.9) = 18 → q̂ = the 18th smallest = 17 cents
    val rows =
      Seq((1L, 100L, 0L)) ++                        // train: mean 100
      (0 to 18).map(i => (1L, 100L + i, 2L)) ++     // calibration
      Seq((1L, 100L, 3L), (1L, 117L, 3L), (1L, 118L, 3L)) // test
    val out = Calibrate.conformalSplit(
      rows.toDF("g", "cents", "fold"), "g", "cents", "fold").collect()(0)
    assert(out.getDouble(4) == 17.0, "q-hat")
    // residuals 0 and 17 are covered (≤ q̂), 18 is not
    assert(out.getLong(1) == 3L && out.getLong(2) == 2L)
    assert(out.getDouble(3) == 0.666667)
  }

  test("conformalSplit: calibration coverage hits ≥ 1−α on exchangeable data") {
    // residuals are iid uniform noise around a per-group mean: the
    // finite-sample guarantee says test coverage ≥ 0.9 in expectation;
    // with 2000 test points the realized rate sits well above 0.85
    val rnd = new scala.util.Random(11)
    val rows = (1 to 8000).map { i =>
      val g = (i % 4).toLong
      // fold decoupled from the group so every group spans all folds
      (g, 1000 + g * 100 + rnd.nextInt(61) - 30, (i / 4).toLong % 4)
    }
    val out = Calibrate.conformalSplit(
      rows.map { case (g, c, f) => (g, c.toLong, f) }.toDF("g", "cents", "fold"),
      "g", "cents", "fold").collect()
    val cov = out.map(r => r.getLong(2)).sum.toDouble /
      out.map(r => r.getLong(1)).sum
    assert(cov >= 0.85, s"aggregate coverage $cov")
    // q̂ constant across groups (one global order statistic)
    assert(out.map(_.getDouble(4)).distinct.length == 1)
  }
}
