package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The window-rank percentile must be BIT-EQUAL to Spark's own exact
  * `percentile()` aggregate (which is itself oracle-proven against
  * DuckDB quantile_cont in q49), plus clamp semantics. */
class FeaturePrepSpec extends SparkTestBase {

  import spark.implicits._

  test("percentileBounds == percentile() aggregate, bit-exact, all group sizes") {
    // group sizes 1..40 incl. frac=0 positions (n where p*(n-1) is whole)
    val rows = for (g <- 1 to 40; i <- 1 to g)
      yield (g.toLong, math.sin(g * 31 + i * 7) * 100.0)
    val df = rows.toDF("g", "v")
    val ours = FeaturePrep.percentileBounds(df, "g", "v", 0.25, 0.9)
    val ref = df.groupBy("g").agg(
      expr("percentile(v, 0.25)").as("rlo"), expr("percentile(v, 0.9)").as("rhi"))
    val bad = ours.join(ref, Seq("g"))
      .where(col("__lo") =!= col("rlo") || col("__hi") =!= col("rhi"))
    assert(bad.count() == 0)
  }

  test("winsorize clamps outliers and flags exactly the out-of-range rows") {
    val df = ((1 to 99).map(i => (1L, i.toLong, i.toDouble)) :+ ((1L, 100L, 1e9)))
      .toDF("g", "id", "v")
    val out = FeaturePrep.winsorize(df, "g", "v", 0.01, 0.9, Seq("id"))
    val clipped = out.where(col("clipped")).select("id").collect().map(_.getLong(0)).toSet
    // p90 of 1..99,1e9 is ~90.1; p01 ~1.99: ids 1, 91..100 fall outside
    assert(clipped.contains(100L) && clipped.contains(1L))
    val vw = out.where(col("id") === 100L).select("value_w").collect()(0).getDouble(0)
    assert(vw < 1000.0, s"outlier must be capped, got $vw")
    val mid = out.where(col("id") === 50L).collect()(0)
    assert(!mid.getBoolean(mid.fieldIndex("clipped")))
    assert(mid.getDouble(mid.fieldIndex("value_w")) == 50.0)
  }

  test("targetEncode: own fold's labels never enter a row's encoding") {
    // category A: fold-dependent labels; encode of a row must equal the
    // mean over OTHER folds (+ smoothed prior), recomputed by hand
    val df = (1 to 200).map(i => (i.toLong, "A", i % 2)).toDF("k", "cat", "y")
    val out = FeaturePrep.targetEncode(df, "k", "cat", "y", 5, 10.0)
    val rows = out.collect()
    assert(rows.length == 200)
    // recompute expectation for one row from the operator's own fold split
    val folds = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    val ys = (1 to 200).map(i => i.toLong -> (i % 2).toLong).toMap
    val mu = ys.values.sum.toDouble / 200.0
    rows.take(20).foreach { r =>
      val (k, f, te) = (r.getLong(0), r.getLong(2), r.getDouble(3))
      val oof = ys.filter { case (kk, _) => folds(kk) != f }
      val expected = (oof.values.sum.toDouble + 10.0 * mu) / (oof.size + 10.0)
      assert(math.abs(te - expected) < 1e-12, s"row $k")
    }
  }

  test("targetEncode: a single-fold category degrades to the prior") {
    // category B has ONE row: its own fold is excluded -> te = prior mean
    val df = ((1 to 50).map(i => (i.toLong, "A", 1)) :+ ((99L, "B", 0)))
      .toDF("k", "cat", "y")
    val out = FeaturePrep.targetEncode(df, "k", "cat", "y", 5, 10.0)
    val mu = 50.0 / 51.0
    val b = out.where(col("cat") === "B").collect()(0).getDouble(3)
    assert(math.abs(b - (10.0 * mu) / 10.0) < 1e-12) // (0 + m·μ)/(0 + m)
  }

  test("quantileBins: equal-frequency sizes, tight contiguous edges") {
    val df = (1 to 103).map(i => ("g", i.toLong, i.toDouble))
      .toDF("grp", "id", "v")
    val out = FeaturePrep.quantileBins(df, "v", "id", 10, Some("grp"))
      .orderBy("bin").collect()
    assert(out.length == 10)
    // 103 rows into 10 bins: first 3 bins get 11, rest 10 (ntile rule)
    assert(out.map(_.getLong(2)).toSeq == Seq(11L, 11L, 11L, 10L, 10L, 10L, 10L, 10L, 10L, 10L))
    // edges tile the range contiguously: lo(next) = hi(prev) + 1
    val his = out.map(_.getDouble(4)); val los = out.map(_.getDouble(3))
    (1 until 10).foreach(i => assert(los(i) == his(i - 1) + 1.0))
    assert(los(0) == 1.0 && his(9) == 103.0)
  }

  test("featureHash: counts land in stable buckets, dim bounds respected") {
    val docs = Seq((1L, "the cat and the hat"), (2L, "cat cat cat"))
      .toDF("doc_id", "text")
    val out = FeaturePrep.featureHash(docs, "doc_id", "text", 64).collect()
    assert(out.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 64))
    // same token -> same bucket across docs; "cat" count is exact
    val catIdx = spark.range(1)
      .select(pmod(graft.functions.TextFunctions.hash60(lit("cat")), lit(64L)))
      .collect()(0).getLong(0)
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2(0).getLong(1) == catIdx && d2(0).getLong(2) == 3L)
    // doc 1: "the" appears twice -> one bucket carries cnt 2
    assert(out.filter(_.getLong(0) == 1L).map(_.getLong(2)).sum == 5L)
  }
}
