package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** ALS factorization-CF contract on planted low-rank structure. */
class AlsCfSpec extends SparkTestBase {

  import spark.implicits._

  // rating = u%7 + i%5 + 1: additive (rank-2 + bias) structure ALS must
  // recover far better than the global mean (q114's planted pattern).
  private def planted(users: Int, items: Int) =
    (for { u <- 0 until users; i <- 0 until items }
      yield (u, i, (u % 7 + i % 5 + 1).toDouble))
      .toDF("user", "item", "rating")

  test("fitEval: ALS beats the global-mean baseline on planted structure") {
    val out = AlsCf.fitEval(planted(50, 30), maxIter = 6).collect()
    assert(out.length == 1)
    val r = out(0)
    val (nTrain, nTest, nEval) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nTrain + nTest == 1500L)
    // hash split is ~80/20 but never degenerate
    assert(nTrain > 1000L && nTest > 100L)
    // dense grid: every test user/item is trained, nothing cold-dropped
    assert(nEval == nTest)
    assert(r.getBoolean(3), "ALS RMSE should be < margin * baseline RMSE")
  }

  test("fitEval split is a pure function of (user, item): layout-free") {
    val df = planted(40, 20)
    val a = AlsCf.fitEval(df.repartition(1), maxIter = 1).collect()(0)
    val b = AlsCf.fitEval(df.repartition(7), maxIter = 1).collect()(0)
    // counts replay exactly regardless of partitioning (RMSE may wiggle)
    assert(a.getLong(0) == b.getLong(0) && a.getLong(1) == b.getLong(1)
      && a.getLong(2) == b.getLong(2))
  }

  test("serveTopN: factor dot products rank, seen items excluded") {
    // hand-planted rank-2 factors: user 1 aligned with items 10/11,
    // user 2 with item 20; item 11 already seen by user 1
    val uf = Seq((1, Seq(1.0f, 0.0f)), (2, Seq(0.0f, 1.0f)))
      .toDF("id", "features")
    val itf = Seq((10, Seq(0.9f, 0.0f)), (11, Seq(0.8f, 0.0f)),
      (20, Seq(0.0f, 0.7f)), (21, Seq(0.1f, 0.1f)))
      .toDF("id", "features")
    val users = Seq(1, 2).toDF("user")
    val seen = Seq((1, 11)).toDF("user", "item")
    val out = AlsCf.serveTopN(users, uf, itf, seen, 2).collect()
      .groupBy(_.getInt(0))
    val u1 = out(1).sortBy(_.getInt(3)).map(_.getInt(1)).toSeq
    assert(u1 == Seq(10, 21)) // 11 excluded as seen; 0.9 > 0.1 > 0.0(20)... k=2
    val u2 = out(2).sortBy(_.getInt(3)).map(_.getInt(1)).toSeq
    assert(u2 == Seq(20, 21)) // 0.7 > 0.1 > 0
    // scores are the exact dot products
    val s10 = out(1).find(_.getInt(1) == 10).get.getDouble(2)
    assert(math.abs(s10 - 0.9) < 1e-6)
  }

  test("cold-start pairs are dropped from eval, not scored as NaN") {
    // items 90..99 appear ONLY in rows whose hash bucket lands in test:
    // force it by constructing a train-only item set vs a test-only item.
    // Simpler: a sparse corpus where some test items never occur in train.
    val base = planted(30, 12)
    // one extra item (id 999) with a single interaction: whichever split
    // it lands in, eval never scores an unseen entity
    val extra = Seq((0, 999, 3.0)).toDF("user", "item", "rating")
    val out = AlsCf.fitEval(base.union(extra), maxIter = 2).collect()(0)
    assert(out.getLong(2) <= out.getLong(1)) // n_eval <= n_test
    assert(!out.isNullAt(3))                 // boolean is well-defined
  }
}
