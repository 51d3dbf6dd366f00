package graft.operators

import graft.SparkTestBase
import graft.functions.expressions.BloomFunctions
import org.apache.spark.sql.functions._

/** Bloom-prefiltered decontamination: the sketch must lose nothing
  * (bloom ≡ exact output), literally admit every true member (no false
  * negatives), and actually filter (selectivity on disjoint inputs). */
class BloomDecontaminateSpec extends SparkTestBase {

  private def docs = graft.sources.Tables.documents(spark, sf())
    .select(col("doc_id"), col("text"))

  test("bloom-prefiltered sweep is bit-identical to the exact sweep") {
    val bench = docs.where(col("doc_id") % 17 === 0)
    val corpus = docs.where(col("doc_id") % 17 =!= 0)
      .unionByName(bench.select((col("doc_id") + 500000L).as("doc_id"), col("text")))
    val exact = Dedup.decontaminate(corpus, bench, 8)
    val bloom = Dedup.decontaminateBloom(corpus, bench, 8)
    assert(bloom.exceptAll(exact).count() == 0)
    assert(exact.exceptAll(bloom).count() == 0)
    assert(exact.count() > 0) // planted copies guarantee real work
  }

  test("no false negatives: every inserted value passes might_contain") {
    import spark.implicits._
    val vals = (0 until 5000).map(i => s"value-$i").toDF("v")
    val bloom = vals.agg(BloomFunctions.bloomAgg(col("v"), 5000L, 50000L).as("bf"))
    val missed = vals.where(!BloomFunctions.mightContain(bloom, col("v"))).count()
    assert(missed == 0)
  }

  test("prefilter is selective on disjoint value sets (~FPR, not pass-through)") {
    import spark.implicits._
    val inserted = (0 until 5000).map(i => s"in-$i").toDF("v")
    val probes = (0 until 5000).map(i => s"out-$i").toDF("v")
    val bloom = inserted.agg(BloomFunctions.bloomAgg(col("v"), 5000L, 50000L).as("bf"))
    val falsePos = probes.where(BloomFunctions.mightContain(bloom, col("v"))).count()
    // 10 bits/item ≈ 1% FPR; allow 5× slack before calling it broken.
    assert(falsePos < 250, s"bloom passed $falsePos of 5000 disjoint probes")
  }
}
