package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Profiling and FK-audit semantics on planted data. */
class DataQualitySpec extends SparkTestBase {

  import spark.implicits._

  test("profile: one row per column with exact null/distinct/min/max") {
    val df = Seq((1L, Some("a")), (2L, Some("b")), (3L, None), (4L, Some("a")))
      .toDF("id", "tag")
    val p = DataQuality.profile(df, Seq("id", "tag")).collect()
      .map(r => r.getString(0) -> r).toMap
    val id = p("id")
    assert(id.getLong(1) == 4L && id.getLong(2) == 0L && id.getLong(3) == 4L)
    assert(id.getString(4) == "1" && id.getString(5) == "4")
    val tag = p("tag")
    assert(tag.getLong(1) == 4L && tag.getLong(2) == 1L && tag.getLong(3) == 2L)
    assert(tag.getString(4) == "a" && tag.getString(5) == "b")
  }

  test("profile is one scan: a single aggregate over the input") {
    val df = graft.sources.Tables.customer(spark, sf())
    val plan = DataQuality.profile(df, Seq("c_custkey", "c_mktsegment"))
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans <= 1, s"profile should read the table once:\n$plan")
  }

  test("profile approxDistinct: the Expand multiplier drops to zero and " +
    "distinct counts stay within the HLL error contract") {
    val df = graft.sources.Tables.orders(spark, sf())
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_orderpriority", "o_totalprice")
    // string-match the plan: AQE's AdaptiveSparkPlanExec does not expose
    // the inner plan via collect (same pattern as the one-scan case)
    def expands(approx: Boolean) =
      "Expand".r.findAllIn(DataQuality.profile(df, cols,
        approxDistinct = Some(approx)).queryExecution.executedPlan.toString).length
    // exact multi-distinct pays Expand (rows x column count); the HLL
    // mode must not — that is the whole point of the switch
    assert(expands(approx = false) > 0)
    assert(expands(approx = true) == 0,
      "approxDistinct profile must not Expand")
    // still one scan, and n_distinct within the rsd=0.05 HLL contract
    // (allow 3x rsd so the spec is not flaky across HLL seeds)
    val approxPlan = DataQuality.profile(df, cols, approxDistinct = Some(true))
    val scans = "Scan parquet".r
      .findAllIn(approxPlan.queryExecution.executedPlan.toString).length
    assert(scans <= 1)
    val exact = DataQuality.profile(df, cols).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    approxPlan.collect().foreach { r =>
      val (c, nd) = (r.getString(0), r.getLong(3))
      val e = exact(c)
      assert(math.abs(nd - e).toDouble <= math.max(1.0, 0.15 * e),
        s"$c: approx $nd vs exact $e outside 3x rsd")
      // exact columns carry over untouched in both modes
      assert(r.getLong(1) == df.count())
    }
  }

  test("profile auto-switches to the HLL path above AutoApproxCols — " +
    "the 100 TB-safe default on wide tables needs no flag") {
    val base = graft.sources.Tables.lineitem(spark, sf()) // 11 columns
    val df = base.withColumn("l_q2", col("l_quantity") * 2)
      .withColumn("l_d2", col("l_discount") * 2)
    val narrow = Seq("l_orderkey", "l_partkey", "l_suppkey") // 3 ≤ 12
    val wide = base.columns.toSeq ++ Seq("l_q2", "l_d2") // 13 > 12
    assert(wide.size > DataQuality.AutoApproxCols &&
      narrow.size <= DataQuality.AutoApproxCols)
    def expands(cs: Seq[String]) =
      "Expand".r.findAllIn(DataQuality.profile(df, cs)
        .queryExecution.executedPlan.toString).length
    assert(expands(narrow) > 0, "narrow default should stay exact (Expand)")
    assert(expands(wide) == 0, "wide default must auto-take the HLL path")
    // and the explicit override still wins in both directions
    assert("Expand".r.findAllIn(DataQuality.profile(df, wide,
      approxDistinct = Some(false)).queryExecution.executedPlan.toString)
      .nonEmpty)
  }

  test("fkAudit counts orphans, including null child keys") {
    val child = Seq(Some(1L), Some(2L), Some(99L), None).toDF("k")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val row = DataQuality.fkAudit(Seq(
      DataQuality.FkCheck("c_p", child, "k", parent, "pk"))).collect()(0)
    assert(row.getString(0) == "c_p")
    assert(row.getLong(1) == 4L)
    assert(row.getLong(2) == 2L) // 99 dangling + null key
  }

  test("fkAudit stacks multiple relations with independent counts") {
    val a = Seq(1L, 2L).toDF("k"); val b = Seq(1L).toDF("pk")
    val out = DataQuality.fkAudit(Seq(
      DataQuality.FkCheck("r1", a, "k", b, "pk"),
      DataQuality.FkCheck("r2", b, "pk", a, "k"))).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("r1") == ((2L, 1L)))
    assert(out("r2") == ((1L, 0L)))
  }

  test("psi: identical distributions score ~0; a hard shift scores large") {
    import spark.implicits._
    val ref = (1 to 1000).map(i => i.toDouble % 100).toDF("v")
    val same = DataQuality.psi(ref, ref, "v").collect()
    assert(same.length == 10)
    assert(same.forall(_.getDouble(4) == same(0).getDouble(4))) // total repeated
    assert(math.abs(same(0).getDouble(4)) < 1e-9)
    // current sample collapsed into the top decile of the reference range
    val cur = (1 to 1000).map(i => 95.0 + (i % 5)).toDF("v")
    val shifted = DataQuality.psi(ref, cur, "v").collect()
    assert(shifted(0).getDouble(4) > 0.25) // "drifted" per the standard scale
    // out-of-range current values clamp into the edge bins, never vanish
    val oob = Seq(-50.0, 500.0).toDF("v")
    val withOob = DataQuality.psi(ref, oob, "v").collect()
    assert(withOob.map(_.getLong(2)).sum == 2L)
  }

  test("psi: empty bins are Laplace-smoothed, never NaN/Inf") {
    import spark.implicits._
    val ref = Seq(0.0, 100.0).toDF("v") // only bins 0 and 9 populated
    val cur = Seq(50.0).toDF("v")       // only bin 5
    val rows = DataQuality.psi(ref, cur, "v").collect()
    assert(rows.length == 10)
    assert(rows.forall(r => !r.getDouble(3).isNaN && !r.getDouble(3).isInfinite))
  }

  test("chi2: known 2x2 value; independence scores ~0") {
    import spark.implicits._
    // o = [[10,20],[20,10]]: all e = 15, chi2 = 4 * 25/15 = 6.666...
    val dep = (Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(20)(("b", "x")) ++ Seq.fill(10)(("b", "y"))).toDF("c", "l")
    val rows = DataQuality.chi2(dep, "c", "l").collect()
    assert(rows.length == 4)
    assert(rows.forall(_.getDouble(3) == 15.0))
    val expected = math.floor(25.0 / 15.0 * 1e9 + 0.5) * 4 / 1e9
    assert(rows.forall(_.getDouble(5) == expected))
    // perfectly proportional table -> chi2 exactly 0
    val ind = (Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(20)(("b", "x")) ++ Seq.fill(40)(("b", "y"))).toDF("c", "l")
    val t0 = DataQuality.chi2(ind, "c", "l").collect()(0).getDouble(5)
    assert(t0 == 0.0)
  }

  test("corrMatrix: exact ±1 on linear columns, known value on planted data") {
    import spark.implicits._
    val df = Seq((1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0),
      (4.0, 8.0, -4.0)).toDF("x", "y", "z")
    val out = DataQuality.corrMatrix(df, Seq("x", "y", "z")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(out.size == 3) // 3 columns -> 3 unordered pairs
    assert(out(("x", "y")) == 1.0)   // y = 2x
    assert(out(("x", "z")) == -1.0)  // z = -x
    assert(out(("y", "z")) == -1.0)
    // non-degenerate case against a hand-computed Pearson r
    val df2 = Seq((1.0, 1.0), (2.0, 3.0), (3.0, 2.0), (4.0, 5.0))
      .toDF("a", "b")
    val r = DataQuality.corrMatrix(df2, Seq("a", "b")).collect()(0).getDouble(3)
    // r = (4*33 - 10*11) / (sqrt(4*30-100) * sqrt(4*39-121)) = 22/sqrt(700)
    assert(r == math.floor(22.0 / math.sqrt(700.0) * 1e6 + 0.5) / 1e6)
  }

  test("corrMatrix is partition-invariant: decimal sums, not float corr()") {
    import spark.implicits._
    val rows = (1 to 5000).map(i =>
      (i * 0.01, math.sin(i) * 100 + i * 0.003, (i % 97) * 1.0))
    val df = rows.toDF("x", "y", "z")
    val a = DataQuality.corrMatrix(df.repartition(1), Seq("x", "y", "z"))
      .collect().map(_.toString).sorted
    val b = DataQuality.corrMatrix(df.repartition(13), Seq("x", "y", "z"))
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("corrMatrix is one scan: a single aggregate over the input") {
    val df = graft.sources.Tables.lineitem(spark, sf())
    val plan = DataQuality.corrMatrix(df,
      Seq("l_quantity", "l_extendedprice", "l_discount"), 100.0)
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans <= 1, s"corrMatrix should read the table once:\n$plan")
  }

  test("madOutliers: hand-computed median/MAD flags only the spike") {
    import spark.implicits._
    // values 1..9 (dollars) + one spike: med of cents = 500 with the
    // spike pushing the list to 10 values -> med 550, MAD over devs
    val vals = (1 to 9).map(v => ("g", v.toLong, v.toDouble)) :+
      (("g", 10L, 100.0))
    val df = vals.toDF("g", "id", "v")
    val out = DataQuality.madOutliers(df, "g", "v", 3.0, Seq("id")).collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(10L), "only the spike flags")
    // med of (100..900,10000) = (500+600)/2 = 550 in cents units
    assert(out(0).getDouble(3) == 550.0)
  }

  test("madOutliers: constant group (MAD 0) flags nothing") {
    import spark.implicits._
    val df = (1 to 5).map(i => ("g", i.toLong, 7.0)).toDF("g", "id", "v")
    assert(DataQuality.madOutliers(df, "g", "v", 3.0, Seq("id")).isEmpty)
  }

  test("tableDigest: order/partitioning-free, any cell change detected") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s")
    val d1 = DataQuality.tableDigest(df.repartition(1), Seq("k", "s"))
      .collect()(0)
    val d2 = DataQuality.tableDigest(df.orderBy(desc("k")).repartition(3),
      Seq("k", "s")).collect()(0)
    assert(d1.getLong(0) == 3L && d1.toString == d2.toString)
    val changed = DataQuality.tableDigest(
      Seq((1L, "a"), (2L, "X"), (3L, "c")).toDF("k", "s"), Seq("k", "s"))
      .collect()(0)
    assert(changed.toString != d1.toString)
  }

  test("benfordAudit: digit extraction, shares, and a perfect-fit chi2 of 0") {
    // 301 ones, 176 twos: shares 0.631027/0.368973; not Benford-perfect,
    // but digit counts and share arithmetic are exactly checkable
    val vals = Seq.fill(301)(1.5) ++ Seq.fill(176)(25.0)
    val got = DataQuality.benfordAudit(vals.toDF("v"), "v")
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    // ALL nine digits are rows — absent ones as explicit zeros
    assert(got.keySet == (1 to 9).toSet)
    assert(got(1)._1 == 301L && got(2)._1 == 176L)
    assert((3 to 9).forall(d => got(d)._1 == 0L && got(d)._2 == 0.0))
    assert(got(1)._2 == 0.631027 && got(2)._2 == 0.368973)
    // snapped expectations match the Benford constants at 6 dp
    assert(got(1)._3 == 0.30103 && got(2)._3 == 0.176091)
  }

  test("benfordAudit: a zero-count digit contributes its full N*p to chi2") {
    // 477 rows, none starting with 9: chi2_term(9) = N*p9 exactly
    val vals = Seq.fill(301)(1.5) ++ Seq.fill(176)(25.0)
    val row9 = DataQuality.benfordAudit(vals.toDF("v"), "v")
      .collect().find(_.getInt(0) == 9).get
    val p9 = math.floor(math.log(1 + 1.0 / 9) / math.log(10) * 1e9 + 0.5) / 1e9
    assert(row9.getLong(1) == 0L)
    assert(math.abs(row9.getDouble(4) - 477.0 * p9) < 1e-6)
  }

  test("benfordAudit: sub-1 and multi-magnitude values route by leading digit") {
    // 0.7 is excluded (< 1); 9234.0 counts as digit 9; 1e6 as digit 1
    val got = DataQuality.benfordAudit(
      Seq(0.7, 9234.0, 1000000.0, 3.2).toDF("v"), "v")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got.size == 9)
    assert(got(9) == 1L && got(1) == 1L && got(3) == 1L)
    assert(Seq(2, 4, 5, 6, 7, 8).forall(got(_) == 0L))
  }
}
