package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned dataset publish — the "promote to consumers" sink: write
  * the corpus partitioned by a routing column (lang → one directory per
  * language, the layout downstream per-language pipelines prune on),
  * then verify the publish by MANIFEST, not by faith: the q138 read-back
  * digests (row count + content hash sum per partition) must equal the
  * same digests computed from the SOURCE table — any dropped, duplicated
  * or mangled row changes a sum.
  *
  * Build-once like the index stores: fingerprinted path + _BUILT marker.
  */
object ExportStore {

  private val LayoutVersion = "v1"

  def root(sfDir: String): String = {
    val tag = sfDir.replaceAll("[^A-Za-z0-9._-]", "_")
    val src = new java.io.File(s"$sfDir/documents.parquet")
    val fp = s"${src.length()}-${src.lastModified()}"
    s"${System.getProperty("java.io.tmpdir")}/graft-export-$LayoutVersion-$tag-$fp"
  }
  private def dataPath(sfDir: String) = s"${root(sfDir)}/documents_by_lang"
  private def donePath(sfDir: String) = s"${root(sfDir)}/_BUILT"

  def ensure(spark: SparkSession, sfDir: String): Unit = synchronized {
    if (new java.io.File(donePath(sfDir)).exists()) return
    Tables.documents(spark, sfDir)
      .write.mode("overwrite").partitionBy("lang").parquet(dataPath(sfDir))
    new java.io.File(donePath(sfDir)).createNewFile()
  }

  /** The published dataset, read back through the partitioned layout. */
  def documents(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(dataPath(sfDir))

  /** Per-partition manifest over an arbitrary frame: (lang, n_rows,
    * content_sum) with content_sum = Σ hash31(text) — order-free exact
    * long arithmetic (≤ 2³¹ per row ⇒ no overflow below ~4·10⁹ rows
    * per partition; widen to decimal beyond). */
  def manifest(df: DataFrame): DataFrame =
    df.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_rows"),
        sum(graft.functions.TextFunctions.hash31(col("text"))).as("content_sum"))
}
