package graft.operators

import graft.SparkTestBase

/** Gini / HHI against closed-form values on constructed distributions. */
class ConcentrationSpec extends SparkTestBase {

  import spark.implicits._

  private def giniOf(rows: Seq[(String, Long, Long)]): Map[String, Double] =
    Concentration.giniBy(rows.toDF("g", "k", "v"), "g", "k", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap

  test("gini: perfect equality is 0; single-holder is (n-1)/n") {
    val equal = (1L to 10L).map(i => ("eq", i, 500L))
    // one unit holds everything, nine hold nothing
    val mono = (1L to 10L).map(i => ("mono", i, if (i == 10L) 900L else 0L))
    val g = giniOf(equal ++ mono)
    assert(g("eq") == 0.0)
    assert(g("mono") == 0.9) // (n-1)/n with n=10
  }

  test("gini: 80/20-style split matches the hand-computed rank form") {
    // 4 units of 50 + 1 unit of 800: sorted x = (50,50,50,50,800)
    // T = 1*50+2*50+3*50+4*50+5*800 = 4500; S = 1000; n = 5
    // G = (2*4500 - 6*1000) / (5*1000) = 0.6
    val g = giniOf((1L to 4L).map(i => ("p", i, 50L)) :+ (("p", 5L, 800L)))
    assert(g("p") == 0.6)
  }

  test("gini: result is invariant to the order ties are ranked in") {
    // many tied values with shuffled keys — Σ i·x over a run of equal x
    // does not depend on the within-run permutation
    val a = (1L to 30L).map(i => ("t", i, (i % 3) * 100L))
    val b = a.map { case (g, k, v) => (g, 31L - k, v) } // reversed keys
    assert(giniOf(a)("t") == giniOf(b)("t"))
  }

  private def hhiOf(rows: Seq[(String, Long, Long)]): Map[String, Double] =
    Concentration.hhiBy(rows.toDF("g", "u", "v"), "g", "u", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap

  test("hhi: monopoly is 1.0; n equal shares is 1/n") {
    val mono = Seq(("m", 1L, 700L))
    val equal = (1L to 8L).map(i => ("e", i, 250L))
    val h = hhiOf(mono ++ equal)
    assert(h("m") == 1.0)
    assert(h("e") == 0.125)
  }

  test("giniGlobal: the two-phase rank equals the windowed form exactly") {
    // an arbitrary skewed multiset — both forms must agree bit-for-bit
    val rows = (1L to 500L).map(k => (k, (k * k * 7) % 9973 + 1))
    val grouped = Concentration.giniBy(
      rows.map { case (k, v) => ("all", k, v) }.toDF("g", "k", "v"),
      "g", "k", "v").collect().head
    val global = Concentration.giniGlobal(
      rows.toDF("k", "v"), "k", "v").collect().head
    assert(global.getLong(0) == grouped.getLong(1))   // n_units
    assert(global.getLong(1) == grouped.getLong(2))   // sum_value
    assert(global.getDouble(2) == grouped.getDouble(3)) // gini
  }

  test("hhi: pre-aggregates multiple rows per unit before squaring") {
    // unit 1 appears twice (300+200=500), unit 2 once (500): duopoly 0.5
    val h = hhiOf(Seq(("d", 1L, 300L), ("d", 1L, 200L), ("d", 2L, 500L)))
    assert(h("d") == 0.5)
  }
}
