package graft.operators

import graft.SparkTestBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Sign-random-projection LSH: bucket determinism and the multi-probe
  * recall contract (probing Hamming-1 buckets can only ADD pairs). */
class LshSpec extends SparkTestBase {

  private lazy val emb = Tables.embeddings(spark, sf()).limit(150).cache()

  test("multi-probe pairs ⊇ single-probe pairs at the same bits/threshold") {
    val single = Lsh.cosinePairsInBuckets(emb, 8, 64, 0.05)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi = Lsh.cosinePairsMultiProbe(emb, 8, 64, 0.05)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(single.nonEmpty)
    assert(single.subsetOf(multi))
  }

  test("multi-probe pairs have buckets within Hamming distance 1") {
    val buckets = Lsh.withBucket(emb, 8, 64).select("vec_id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val multi = Lsh.cosinePairsMultiProbe(emb, 8, 64, 0.05)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(multi.nonEmpty)
    multi.foreach { case (a, b) =>
      assert(java.lang.Long.bitCount(buckets(a) ^ buckets(b)) <= 1)
    }
  }

  test("signatures are deterministic across evaluations") {
    val s1 = Lsh.withBucket(emb, 8, 64).select("vec_id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s2 = Lsh.withBucket(emb, 8, 64).select("vec_id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s1 == s2)
  }
}
