package graft.operators

import graft.SparkTestBase

/** CUPED adjustment semantics on hand-computed sufficient statistics. */
class ExperimentSpec extends SparkTestBase {

  import spark.implicits._

  test("cuped: hand-computed theta and adjusted means") {
    // y = 2x + arm: theta = 2.2, xbar = 2.5 (see the sums below)
    val pu = Seq((0L, 1L, 2L), (0L, 3L, 6L), (1L, 2L, 5L), (1L, 4L, 9L))
      .toDF("arm", "xs", "ys")
    val out = Experiment.cuped(pu, 1.0).collect()
      .map(r => r.getLong(0) -> r).toMap
    // n=4, sx=10, sy=22, sxx=30, sxy=66 -> theta = 44/20, xbar = 2.5
    val theta = 44.0 / 20.0
    assert(out(0L).getDouble(4) == theta)
    assert(out(0L).getDouble(2) == 4.0)                     // mean_y arm 0
    assert(out(0L).getDouble(3) == 4.0 - theta * (2.0 - 2.5)) // 5.1
    assert(out(1L).getDouble(2) == 7.0)
    assert(out(1L).getDouble(3) == 7.0 - theta * (3.0 - 2.5)) // 5.9
  }

  test("cuped shrinks the covariate-driven gap between arms") {
    // both arms share y ≈ 3x (pure covariate effect, NO real treatment):
    // raw means differ because arm 1 happens to get high-x users; the
    // adjusted means must land (exactly) on top of each other
    val pu = Seq((0L, 1L, 3L), (0L, 2L, 6L), (1L, 3L, 9L), (1L, 4L, 12L))
      .toDF("arm", "xs", "ys")
    val out = Experiment.cuped(pu, 1.0).collect()
      .map(r => r.getLong(0) -> r).toMap
    val rawGap = out(1L).getDouble(2) - out(0L).getDouble(2)
    val adjGap = out(1L).getDouble(3) - out(0L).getDouble(3)
    assert(rawGap == 6.0)
    assert(math.abs(adjGap) < 1e-12, s"pure-covariate gap must vanish, got $adjGap")
  }

  test("cuped is partition-invariant (decimal statistics)") {
    val pu = (1 to 400).map(i =>
      ((i % 2).toLong, (i % 37).toLong, (2 * (i % 37) + i % 3).toLong))
      .toDF("arm", "xs", "ys")
    val a = Experiment.cuped(pu.repartition(1)).collect().map(_.toString).sorted
    val b = Experiment.cuped(pu.repartition(11)).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("ipsReplay: closed-form IPS of the greedy policy, ties break to larger action") {
    // segment 0: action "x" mean 10 (2 rows), "y" mean 20 (1 row) -> target y
    //   v_ips = 3 * 20 / 3 = 20.0; v_logged = 40/3 = 13.333333
    // segment 1: "x" and "y" both mean 5 -> tie -> larger action "y"
    val log = Seq(
      (0L, "x", 10L), (0L, "x", 10L), (0L, "y", 20L),
      (1L, "x", 5L), (1L, "y", 5L)
    ).toDF("seg", "act", "r")
    val got = Experiment.ipsReplay(log, "seg", "act", "r", 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(got(0L) == ((3L, "y", 1L, 13.333333, 20.0)))
    // tie: both arms mean 5; "y" wins; v_ips = 3 * 5 / 2 = 7.5
    assert(got(1L) == ((2L, "y", 1L, 5.0, 7.5)))
  }

  test("sprt: all-wins crosses the H1 boundary at the exact integer step") {
    // p0=0.25, p1=0.75, α=β=0.05: w1 = ln(3)·1e9, hi = ln(19)·1e9 →
    // first crossing at step ceil(ln19/ln3) = 3; all-losses mirrors to
    // H0 at the same step (w0 = −ln 3)
    val wins = (1 to 10).map(i => (1L, 1, i.toLong, i.toLong)) ++
      (1 to 10).map(i => (2L, 0, i.toLong, i.toLong))
    val out = Experiment.sprt(wins.toDF("seg", "x", "t", "id"),
      "seg", "x", "t", "id", 0.25, 0.75).collect()
      .map(r => r.getLong(0) -> ((r.getString(3), r.getLong(4)))).toMap
    assert(out(1L) == (("accept_h1", 3L)))
    assert(out(2L) == (("accept_h0", 3L)))
  }

  test("sprt: a balanced stream never crosses and reports continue") {
    // alternating win/loss under a symmetric test hovers near 0
    val obs = (1 to 40).map(i => (1L, i % 2, i.toLong, i.toLong))
    val out = Experiment.sprt(obs.toDF("seg", "x", "t", "id"),
      "seg", "x", "t", "id", 0.4, 0.6).collect()(0)
    assert(out.getString(3) == "continue")
    assert(out.isNullAt(4), "no crossing step")
    // 20 wins and 20 losses under symmetric weights → LLR returns to ~0
    assert(math.abs(out.getDouble(5)) < 1e-6)
  }

  test("sprt: the verdict reads the FIRST crossing, not a later one") {
    // 3 wins (cross hi at step 3) then 20 losses (would cross lo):
    // decision must stay accept_h1 with first_cross_step 3
    val obs = (1 to 3).map(i => (1L, 1, i.toLong, i.toLong)) ++
      (4 to 23).map(i => (1L, 0, i.toLong, i.toLong))
    val out = Experiment.sprt(obs.toDF("seg", "x", "t", "id"),
      "seg", "x", "t", "id", 0.25, 0.75).collect()(0)
    assert(out.getString(3) == "accept_h1" && out.getLong(4) == 3L)
  }

  test("diffInDiff: the control trend is differenced out exactly") {
    // control rises 100→150 (trend +50); treated rises 200→300
    // (trend +100) → DiD = +50
    val rows = Seq(
      (false, false, 100L), (false, false, 100L),
      (false, true, 150L),
      (true, false, 200L),
      (true, true, 300L), (true, true, 300L))
    val out = Experiment.diffInDiff(rows.toDF("tr", "po", "cents"),
      "tr", "po", "cents").collect()
    assert(out.length == 4)
    assert(out.forall(_.getDouble(4) == 50.0))
    val cells = out.map(r => (r.getBoolean(0), r.getBoolean(1)) ->
      ((r.getLong(2), r.getDouble(3)))).toMap
    assert(cells((false, false)) == ((2L, 100.0)))
    assert(cells((true, true)) == ((2L, 300.0)))
  }
}
