package graft.operators

import graft.SparkTestBase

/** Grouped OLS against hand-computed closed forms. */
class RegressionSpec extends SparkTestBase {

  import spark.implicits._

  test("recovers an exact planted line per group") {
    // group A: y = 2x + 1 exactly; group B: y = -0.5x + 10 exactly
    val a = (1 to 10).map(x => ("A", x.toDouble, 2.0 * x + 1))
    val b = (1 to 10).map(x => ("B", x.toDouble, -0.5 * x + 10))
    val got = Regression.groupedOls((a ++ b).toDF("g", "x", "y"),
        "g", "x", "y", 1.0, 100.0)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got("A") == ((10L, 2.0, 1.0)))
    assert(got("B") == ((10L, -0.5, 10.0)))
  }

  test("degenerate groups emit NULL, not a division artifact") {
    val df = Seq(("one", 3.0, 5.0),               // n = 1
      ("flat", 2.0, 4.0), ("flat", 2.0, 9.0))     // zero x-variance
      .toDF("g", "x", "y")
    val got = Regression.groupedOls(df, "g", "x", "y")
      .collect().map(r => r.getString(0) -> (r.isNullAt(2), r.isNullAt(3)))
      .toMap
    assert(got == Map("one" -> ((true, true)), "flat" -> ((true, true))))
  }

  test("slope is partition-invariant (exact sums)") {
    val df = (1 to 500)
      .map(i => ("g", (i % 37).toDouble, (i % 11).toDouble * 3 + i % 5))
      .toDF("g", "x", "y")
    val one = Regression.groupedOls(df.repartition(1), "g", "x", "y")
      .collect()(0).toSeq
    val many = Regression.groupedOls(df.repartition(7), "g", "x", "y")
      .collect()(0).toSeq
    assert(one == many)
  }
}
