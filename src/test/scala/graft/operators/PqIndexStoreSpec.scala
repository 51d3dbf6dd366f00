package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Persisted-PQ lifecycle: the on-disk codebooks round-trip to exactly
  * the deterministic fit, codes keep their IVF cell partition column,
  * and serving from the artifact matches serving from a fresh encode. */
class PqIndexStoreSpec extends SparkTestBase {

  test("persisted codebooks equal a fresh seeded fit; codes keep cell") {
    PqIndexStore.ensure(spark, sf())
    val loaded = PqIndexStore.loadModel(spark, sf())
    val fresh = Pq.fit(graft.sources.Tables.embeddings(spark, sf()),
      PqIndexStore.Dim, PqIndexStore.M, PqIndexStore.Ksub, PqIndexStore.Seed)
    assert(loaded.m == fresh.m && loaded.ksub == fresh.ksub)
    assert(loaded.codebooks.flatten.flatten.toSeq ==
      fresh.codebooks.flatten.flatten.toSeq)
    val codes = PqIndexStore.codesFrame(spark, sf())
    assert(codes.columns.toSet == Set("vec_id", "codes", "cell"))
    assert(codes.count() ==
      graft.sources.Tables.embeddings(spark, sf()).count())
  }

  test("serving from the persisted artifact matches a fresh in-memory encode") {
    val q = graft.sources.Tables.embeddings(spark, sf())
      .where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val persisted = PqIndexStore.serve(spark, sf(), q, 5, 50, 4)
    val pq = PqIndexStore.loadModel(spark, sf())
    val freshEnc = Pq.encode(pq, IvfIndexStore.indexFrame(spark, sf())
      .select("vec_id", "embedding", "cell"))
    val inMem = Pq.topKRefined(freshEnc,
      graft.sources.Tables.embeddings(spark, sf()).select("vec_id", "embedding"),
      pq, IvfIndexStore.loadModel(sf()), q, 5, 50, 4)
    assert(persisted.exceptAll(inMem).count() == 0)
    assert(inMem.exceptAll(persisted).count() == 0)
  }
}
