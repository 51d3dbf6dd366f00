package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** HLL / count-min sketch contracts: estimation accuracy, the merge
  * laws that make them 100 TB-shardable, and CMS one-sided error. */
class SketchSpec extends SparkTestBase {

  import spark.implicits._

  test("hll: estimate within 5% of exact on 10k distinct keys") {
    val df = (1 to 10000).map(i => s"key$i").toDF("k")
    val est = Sketch.hllDistinct(df, Seq("k")).collect()(0)
    val e = est.getAs[Double]("est_distinct")
    assert(math.abs(e - 10000) / 10000 < 0.05, s"estimate $e")
  }

  test("hll: sparse linear-counting branch is near-exact at 100 keys") {
    val df = (1 to 100).map(i => s"v$i").toDF("k")
    val e = Sketch.hllDistinct(df, Seq("k")).collect()(0)
      .getAs[Double]("est_distinct")
    assert(math.abs(e - 100) < 5, s"estimate $e")
  }

  test("hll: duplicates do not move the estimate (set semantics)") {
    val once = (1 to 500).map(i => s"d$i").toDF("k")
    val tripled = (1 to 3).flatMap(_ => (1 to 500).map(i => s"d$i")).toDF("k")
    val a = Sketch.hllDistinct(once, Seq("k")).collect()(0).getAs[Double]("est_distinct")
    val b = Sketch.hllDistinct(tripled, Seq("k")).collect()(0).getAs[Double]("est_distinct")
    assert(a == b)
  }

  test("hll merge law: merge(regs(A), regs(B)) ≡ regs(A ∪ B)") {
    val a = (1 to 3000).map(i => s"m$i").toDF("k")
    val b = (2000 to 5000).map(i => s"m$i").toDF("k") // overlap 2000..3000
    val merged = Sketch.hllEstimate(
      Sketch.hllMerge(Sketch.hllRegisters(a, Seq("k")),
        Sketch.hllRegisters(b, Seq("k"))))
      .collect()(0)
    val direct = Sketch.hllDistinct(a.unionByName(b), Seq("k")).collect()(0)
    assert(merged.getAs[Double]("est_distinct") ==
      direct.getAs[Double]("est_distinct"))
    assert(merged.getAs[Long]("z_scaled") == direct.getAs[Long]("z_scaled"))
  }

  test("cms: estimate ≥ exact for every key; exact for a dominant key") {
    // 26 light keys + one heavy key with known weight
    val rows = ('a' to 'z').flatMap(c => Seq.fill(5)(c.toString)) ++
      Seq.fill(1000)("HEAVY")
    val df = rows.toDF("k")
    val sketch = Sketch.cmsBuild(df, "k", lit(1L))
    val cand = (('a' to 'z').map(_.toString) :+ "HEAVY").toDF("k")
    val est = Sketch.cmsEstimate(sketch, cand, "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    ('a' to 'z').foreach(c => assert(est(c.toString) >= 5))
    assert(est("HEAVY") >= 1000 && est("HEAVY") <= 1000 + 26 * 5,
      s"heavy ${est("HEAVY")}")
  }

  test("cms merge law: counter grids sum across shards") {
    val a = Seq.fill(10)("x").toDF("k")
    val b = Seq.fill(7)("x").toDF("k")
    val merged = Sketch.cmsBuild(a, "k", lit(1L))
      .unionByName(Sketch.cmsBuild(b, "k", lit(1L)))
      .groupBy("j", "slot").agg(sum("cnt").as("cnt"))
    val est = Sketch.cmsEstimate(merged, Seq("x").toDF("k"), "k")
      .collect()(0).getLong(1)
    assert(est == 17L)
  }

  test("cms: absent key with clean slots estimates zero") {
    val df = Seq("only").toDF("k")
    val sketch = Sketch.cmsBuild(df, "k", lit(1L))
    val est = Sketch.cmsEstimate(sketch, Seq("never-seen-key-zzz").toDF("k"), "k")
      .collect()(0).getLong(1)
    // 4 independent slots vs a 1-entry grid: collision on ALL 4 rows is
    // the only way this is nonzero — deterministic hash, verified ≤ 1
    assert(est <= 1L)
  }

  test("hllDistinctBy: per-sub rollup ≡ sketching the group directly") {
    // two groups sharing keys, split across 3 "days"; register max
    // telescopes, so the rolled-up state must match a direct sketch
    val rows = for {
      g <- Seq("g1", "g2"); day <- 1 to 3; i <- 1 to 300
    } yield (g, day, s"$g-user${(i * day) % 500}")
    val df = rows.toDF("g", "day", "u")
    val rolled = Sketch.hllDistinctBy(df, Seq("g"), "day", "u")
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getDouble(3))).toMap
    for (g <- Seq("g1", "g2")) {
      val direct = Sketch.hllDistinct(
        df.where(col("g") === g).select("u"), Seq("u")).collect()(0)
      assert(rolled(g)._1 == direct.getAs[Long]("z_scaled"), g)
      assert(rolled(g)._2 == direct.getAs[Double]("est_distinct"), g)
    }
  }

  test("bloom: zero false negatives; absent keys nearly all miss") {
    val present = (1 to 2000).map(i => s"key$i").toDF("k")
    val filter = Sketch.bloomBuild(present, "k")
    val probes = ((1 to 2000).map(i => s"key$i") ++
      (1 to 2000).map(i => s"absent$i")).toDF("k")
    val got = Sketch.bloomProbe(filter, probes, "k")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    (1 to 2000).foreach(i => assert(got(s"key$i"), s"false negative key$i"))
    val fp = (1 to 2000).count(i => got(s"absent$i"))
    assert(fp <= 2, s"$fp false positives at n=2000, m=2^20") // expect ~0
  }

  test("bloom: filter state merges by bit_or") {
    val a = Seq("x", "y").toDF("k")
    val b = Seq("z").toDF("k")
    val merged = Sketch.bloomBuild(a, "k")
      .unionByName(Sketch.bloomBuild(b, "k"))
      .groupBy("word").agg(expr("bit_or(bits)").as("bits"))
    val got = Sketch.bloomProbe(merged, Seq("x", "y", "z", "w").toDF("k"), "k")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got("x") && got("y") && got("z") && !got("w"))
  }

  test("histQuantiles: readout within one bin of the exact percentile") {
    // values 1..1000 dollars, one group: exact p50 = $500; $1 bins →
    // estimate is the upper edge of the bin holding the 500th value
    val df = (1 to 1000).map(v => ("g", v.toDouble)).toDF("g", "v")
    val r = Sketch.histQuantiles(df, "g", "v").collect()(0)
    assert(r.getAs[Long]("n") == 1000L)
    assert(math.abs(r.getAs[Long]("p50_cents") - 50000L) <= 100)
    assert(math.abs(r.getAs[Long]("p95_cents") - 95000L) <= 100)
    assert(math.abs(r.getAs[Long]("p99_cents") - 99000L) <= 100)
  }

  test("histQuantiles: bin counts merge across shards (sum law)") {
    val a = (1 to 500).map(v => ("g", v.toDouble))
    val b = (501 to 1000).map(v => ("g", v.toDouble))
    val whole = Sketch.histQuantiles((a ++ b).toDF("g", "v"), "g", "v")
      .collect()(0).toSeq
    // union of shard inputs ≡ one input — the operator only ever sees
    // bin counts, and counts sum; verified end-to-end
    val merged = Sketch.histQuantiles(a.toDF("g", "v")
      .unionByName(b.toDF("g", "v")), "g", "v").collect()(0).toSeq
    assert(whole == merged)
  }

  test("kmv: below k the sketch is EXACT — estimate, union, intersection") {
    // keys A = {1..300}, B = {200..450}: |A|=300, |B|=251, |A∩B|=101,
    // |A∪B|=450 — all under k=1024, so every estimate must be exact
    val rows = (1 to 300).map(v => ("A", s"v$v")) ++
      (200 to 450).map(v => ("B", s"v$v"))
    val st = Sketch.kmvSketch(rows.toDF("k", "v"), "k", "v")
    val est = Sketch.kmvEstimate(st).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(est == Map("A" -> 300.0, "B" -> 251.0))
    val ix = Sketch.kmvIntersect(st).collect()(0)
    assert(ix.getString(0) == "A" && ix.getString(1) == "B")
    assert(ix.getLong(2) == 450L)          // union minima = full union
    assert(ix.getLong(3) == 101L)          // both-sides count is exact
    assert(ix.getDouble(4) == 450.0)       // est_union exact
    assert(ix.getDouble(5) == 101.0)       // est_intersect exact
  }

  test("kmv: estimation branch lands within 3 rel-std of the truth") {
    // 8000 distinct values per key, 50% overlap — well past k=1024
    val rows = (1 to 8000).map(v => ("A", s"x$v")) ++
      (4001 to 12000).map(v => ("B", s"x$v"))
    val st = Sketch.kmvSketch(rows.toDF("k", "v"), "k", "v")
    val ix = Sketch.kmvIntersect(st).collect()(0)
    // union = 12000, intersection = 4000, J = 1/3
    assert(math.abs(ix.getDouble(4) - 12000.0) < 0.15 * 12000)
    assert(math.abs(ix.getDouble(5) - 4000.0) < 0.2 * 4000)
  }

  test("kmv: sharded sketch states merge to the whole-corpus state") {
    // bottom-k of (bottom-k(shard1) ∪ bottom-k(shard2)) == bottom-k(all):
    // re-sketching the union of two shard STATES must equal sketching
    // the concatenated data — the property that lets a lake keep
    // per-partition KMV states and fold them
    val s1 = (1 to 3000).map(v => ("A", s"m$v"))
    val s2 = (2000 to 6000).map(v => ("A", s"m$v"))
    val st1 = Sketch.kmvSketch(s1.toDF("k", "v"), "k", "v")
    val st2 = Sketch.kmvSketch(s2.toDF("k", "v"), "k", "v")
    val mergedDirect = Sketch.kmvMerge(st1, st2)
    val whole = Sketch.kmvSketch((s1 ++ s2).distinct.toDF("k", "v"),
      "k", "v")
    assert(mergedDirect.orderBy("key", "h").collect().toSeq ==
      whole.orderBy("key", "h").collect().toSeq)
  }
}
