package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet corpus (TESTDATA.md).
  *
  * Every operator takes the scale-factor directory as a parameter so the
  * same code runs at sf0.001 (smoke), sf0.01 (oracle) and sf0.1 (bench),
  * and — unchanged — against a 100 TB lake: the reads are plain parquet
  * scans, so Catalyst pushes filters/column pruning down to the file
  * source and partition pruning applies when the lake is partitioned.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    scaleOut(spark, spark.read.parquet(s"$sfDir/$name.parquet"), s"$sfDir/$name.parquet")

  /** Plain scan WITHOUT the fan-out repartition — for subtrees that a
    * pushed-down filter shrinks to a handful of rows destined for a
    * broadcast (e.g. query vectors): repartitioning rows that are about
    * to be broadcast is a wasted shuffle stage. */
  def tableRaw(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def embeddingsRaw(spark: SparkSession, d: String): DataFrame =
    tableRaw(spark, d, "embeddings")

  /** Repartition decision per parquet path: probing it costs an extra
    * physical-planning pass (`df.rdd`), so it runs once per path per JVM
    * instead of once per query (round-1 verdict minor #6). */
  private val fanOutDecision = scala.collection.concurrent.TrieMap.empty[String, Boolean]

  /** Fan a narrow scan out to the cluster. The driver corpus is one
    * single-row-group parquet file per table, which Spark cannot split —
    * every map-side expression (tokenize, shingle, cosine, pair
    * expansion) would run on ONE core of local[32]. One round-robin
    * exchange up front unlocks full parallelism for everything downstream.
    * At lake scale the scan already has ≥ cores splits and this is a
    * no-op — the condition, not the repartition, is the design. */
  private def scaleOut(spark: SparkSession, df: DataFrame, path: String): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    val fanOut = fanOutDecision.getOrElseUpdate(path, {
      val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
      bytes > (64 << 10) && df.rdd.getNumPartitions < math.max(2, target / 4)
    })
    if (fanOut) df.repartition(target) else df
  }

  def lineitem(spark: SparkSession, d: String): DataFrame = table(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame = table(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = table(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = table(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = table(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame = table(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame = table(spark, d, "region")
  /** `events.ts` normalizes to TimestampType (LTZ; session tz is UTC)
    * whatever the driver generation wrote:
    *  - parquet TIMESTAMP(NANOS): Spark's vectorized reader rejects it;
    *    with `spark.sql.legacy.parquet.nanosAsLong=true` (set in
    *    Verify/Bench sessions) it arrives as a nanosecond LongType,
    *    converted here by floor division (same truncation DuckDB applies);
    *  - parquet timestamp[us] without timezone (the round-7 corpus):
    *    our sessions set `spark.sql.parquet.inferTimestampNTZ.enabled=
    *    false` so it already scans as TimestampType, but a foreign
    *    session (the driver's own) would see TIMESTAMP_NTZ, which
    *    `unix_micros`/`window()` reject — cast it; under UTC the values
    *    are identical. */
  def events(spark: SparkSession, d: String): DataFrame = {
    val raw = table(spark, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")
}
