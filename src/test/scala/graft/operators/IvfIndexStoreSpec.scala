package graft.operators

import graft.SparkTestBase
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Build-once / serve-many lifecycle: ensure() writes exactly once, and
  * serving with every cell probed reproduces the exact brute-force
  * answer from the persisted artifact. */
class IvfIndexStoreSpec extends SparkTestBase {

  test("ensure is idempotent; full-probe serve from disk equals exact topK") {
    val d = sf()
    IvfIndexStore.ensure(spark, d)
    assert(IvfIndexStore.isBuilt(d))
    val done = new java.io.File(s"${IvfIndexStore.root(d)}/_BUILT")
    val stamp = done.lastModified()
    IvfIndexStore.ensure(spark, d) // must not rebuild
    assert(done.lastModified() == stamp)

    val emb = Tables.embeddings(spark, d)
    val q = emb.where(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val served = IvfIndexStore.serve(spark, d, q, 5, IvfIndexStore.nCells(spark, d))
      .select(col("query_id"), col("vec_id"), round(col("sim"), 6).as("sim"), col("rnk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val exact = ContentRetriever.topK(emb, q, 5)
      .select(col("query_id"), col("vec_id"), round(col("sim"), 6).as("sim"), col("rnk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(served == exact)
  }

  test("indexFrame memoizes per path; upsert invalidation drops the pinned relation") {
    val d = sf()
    val f1 = IvfIndexStore.indexFrame(spark, d)
    assert(IvfIndexStore.indexFrame(spark, d) eq f1) // memoized relation reused
    // Ivf.upsertIndex calls this hook after appending files: the next
    // serve must re-list the directory instead of reading a stale
    // FileIndex that hides the appended rows
    IvfIndexStore.invalidateIndex(IvfIndexStore.root(d) + "/index")
    assert(!(IvfIndexStore.indexFrame(spark, d) eq f1))
  }

  test("upsert rows are visible to a post-upsert load") {
    val d = sf()
    IvfIndexStore.ensure(spark, d)
    val model = IvfIndexStore.loadModel(d)
    val emb = Tables.embeddings(spark, d).select("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("ivf-upsert").toString + "/index"
    Ivf.writeIndex(Ivf.assign(model, emb.where(col("vec_id") < 100)), path)
    assert(Ivf.loadIndex(spark, path).count() == 100)
    Ivf.upsertIndex(model, emb.where(col("vec_id") >= 100 && col("vec_id") < 150), path)
    assert(Ivf.loadIndex(spark, path).count() == 150)
  }
}
