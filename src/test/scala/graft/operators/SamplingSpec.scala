package graft.operators

import graft.SparkTestBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Seeded sampling invariants and the large-corpus equivalence. */
class SamplingSpec extends SparkTestBase {

  private lazy val docs = Tables.documents(spark, sf())

  test("exactSample: exact size, distinct keys, deterministic per seed") {
    val a = Sampling.exactSample(docs, 50, 42L).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    val b = Sampling.exactSample(docs, 50, 42L).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(a.length == 50 && a.distinct.length == 50)
    assert(a == b)
    val other = Sampling.exactSample(docs, 50, 7L).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(other != a) // different seed, different sample (w.h.p.)
  }

  test("exactSampleLarge picks the identical sample (pre-filter is a pure optimization)") {
    val total = docs.count()
    val plain = Sampling.exactSample(docs, 80, 42L).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    val large = Sampling.exactSampleLarge(docs, 80, 42L, total).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(large == plain)
  }

  test("n larger than corpus returns everything") {
    val all = Sampling.exactSample(docs.limit(30), 1000, 42L).count()
    assert(all == 30)
  }
}
