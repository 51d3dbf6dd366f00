package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed table layout — the co-located fact-fact join primitive.
  *
  * At 100 TB the `lineitem ⋈ orders` join is two tables that are BOTH
  * far too large to broadcast, so a plain join shuffles every byte of
  * both sides on every run. Bucketing pays that shuffle ONCE at write
  * time: each table is hash-partitioned into `Buckets` files on its join
  * key (Spark's bucket spec — `pmod(murmur3(key), n)` — the same hash
  * family `repartition` uses, so one up-front repartition yields exactly
  * one file per bucket) and every subsequent join reads matching buckets
  * side by side with ZERO exchange (PlanSpec asserts the executed plan
  * has no ShuffleExchange under forced sort-merge).
  *
  * This is the layout decision the reference never faces — its whole
  * corpus lives in one Python process (`Hybrid_Recom_vecdb.py:331-383`)
  * — but it is the first thing a lake deployment of this engine does to
  * its fact tables: amortized write-side partitioning instead of
  * per-query shuffles, the same trade [[graft.operators.IvfIndexStore]]
  * makes for vectors.
  *
  * Artifacts are external tables under the JVM tmpdir, fingerprinted by
  * the source parquet (size + mtime) like the index stores: regenerated
  * testdata never hits a stale layout. Registration is idempotent per
  * session — a fresh JVM re-attaches the existing bucketed files via
  * `CREATE TABLE … CLUSTERED BY … LOCATION` without rewriting anything
  * (the build-once / serve-many contract).
  */
object BucketedStore {

  val Buckets = 8
  private val LayoutVersion = "bkt-v1"

  private def tag(sfDir: String): String = {
    val t = sfDir.replaceAll("[^A-Za-z0-9]", "_").toLowerCase
    val src = new java.io.File(s"$sfDir/orders.parquet")
    s"${t}_${src.length()}_${src.lastModified()}"
  }

  private def root(sfDir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft-bucketed-$LayoutVersion-${tag(sfDir)}"

  /** Catalog name of a bucketed base table (unique per corpus
    * fingerprint, so two testdata generations never collide). */
  def tableName(sfDir: String, base: String): String =
    s"graft_${base}_b${Buckets}_${tag(sfDir)}"

  private def ensureOne(spark: SparkSession, sfDir: String,
                        base: String, key: String): Unit = {
    val name = tableName(sfDir, base)
    if (spark.catalog.tableExists(name)) return
    val path = s"${root(sfDir)}/$base"
    val done = new java.io.File(s"${root(sfDir)}/_BUILT_$base")
    if (done.exists()) {
      // Files exist from an earlier JVM — re-attach, don't rewrite.
      val ddl = spark.read.parquet(path).schema.toDDL
      spark.sql(s"""CREATE TABLE $name ($ddl) USING PARQUET
                   |CLUSTERED BY ($key) SORTED BY ($key) INTO $Buckets BUCKETS
                   |LOCATION '$path'""".stripMargin)
    } else {
      new java.io.File(root(sfDir)).mkdirs()
      // repartition on the bucket hash first so each write task holds
      // exactly one bucket's rows -> one file per bucket (a bucket
      // spread over many small files costs extra opens per scan and
      // loses the per-bucket sort guarantee).
      Tables.tableRaw(spark, sfDir, base)
        .repartition(Buckets, col(key))
        .write.bucketBy(Buckets, key).sortBy(key)
        .option("path", path).mode("overwrite").saveAsTable(name)
      done.createNewFile()
    }
  }

  /** Build (or re-attach) the bucketed fact tables. Idempotent. */
  def ensure(spark: SparkSession, sfDir: String): Unit = synchronized {
    ensureOne(spark, sfDir, "lineitem", "l_orderkey")
    ensureOne(spark, sfDir, "orders", "o_orderkey")
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = {
    ensure(spark, sfDir); spark.table(tableName(sfDir, "lineitem"))
  }

  def orders(spark: SparkSession, sfDir: String): DataFrame = {
    ensure(spark, sfDir); spark.table(tableName(sfDir, "orders"))
  }
}
