package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's offline build pipeline E1
  * (`/root/reference/Hybrid_Recom_vecdb.py:331-383`, SURVEY §3):
  * parse → seeded sample → co-purchase graph → document-text projection →
  * embed → vector-index sink, as one Spark DAG with a shared cached
  * sample and two sink branches.
  *
  * Sinks are plain overwrite-mode parquet writes (SURVEY S6/S7): the
  * reference's batched ChromaDB upsert + wipe-every-run collapse into
  * Spark's partitioned overwrite write; "the index" IS a parquet table.
  */
object OfflineIndexBuild {

  /** Document-text projection (reference `product_text`,
    * `Hybrid_Recom_vecdb.py:124-132`, SURVEY P2):
    * `title | Group: g | Category: c0` with empty parts skipped —
    * concat_ws drops nulls, and the `when`s null out empty group /
    * missing first category. */
  def productText(title: Column, group: Column, categories: Column): Column =
    concat_ws(" | ",
      title,
      when(group.isNotNull && group =!= "", concat(lit("Group: "), group)),
      when(size(categories) > 0,
        concat(lit("Category: "), element_at(categories, 1))))

  case class Artifacts(index: DataFrame, edges: DataFrame)

  /** Build the vector index + co-purchase edges from a product table
    * (asin, title, group, categories, similar). The sampled base is
    * localCheckpoint'd because both sink branches consume it (the
    * reference holds the sample in memory the same way, `:344-352`) —
    * NOT cache(): a library-held cache pins an InMemoryRelation in the
    * CacheManager forever (round-2 verdict #3), while checkpoint blocks
    * are freed by the ContextCleaner once the Artifacts are GC'd. */
  def run(products: DataFrame, sampleN: Int, seed: Long, dim: Int): Artifacts = {
    val clean = products.where(col("asin") =!= "" && col("title") =!= "")
    val sample = Sampling.exactSample(clean, sampleN, seed).localCheckpoint()
    val edges = CoPurchaseGraph.fromSimilar(sample)
    val docs = sample.withColumn("document",
      productText(col("title"), col("group"), col("categories")))
    val index = Embedder.fitEmbed(docs, "document", dim)
      .select(col("asin"), col("title"), col("group"), col("document"),
        col("embedding"))
    Artifacts(index, edges)
  }

  /** Persist both artifacts (overwrite = the reference's fresh-run wipe,
    * `Hybrid_Recom_vecdb.py:28,338-341`). */
  def write(a: Artifacts, dir: String): Unit = {
    a.index.write.mode("overwrite").parquet(s"$dir/index.parquet")
    a.edges.write.mode("overwrite").parquet(s"$dir/edges.parquet")
  }

  def load(spark: SparkSession, dir: String): Artifacts =
    Artifacts(
      spark.read.parquet(s"$dir/index.parquet"),
      spark.read.parquet(s"$dir/edges.parquet"))
}
