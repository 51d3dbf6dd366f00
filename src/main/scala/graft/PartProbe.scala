package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: does a materialized frame keep its hash partitioning in
  * downstream join plans? Compares localCheckpoint (LogicalRDD) vs
  * repartition+persist (InMemoryRelation) under AQE — counting the
  * Exchanges planned on the materialized side of an equi-join.
  * Usage: runMain graft.PartProbe */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val edges = (1 to 10000).map(i => (i % 50L, i % 97L)).toDF("src", "dst")
    val ranks = (0L to 49L).map(n => (n, 1.0)).toDF("node", "rank")

    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("Exchange"))

    val viaCp = edges.repartition(col("src")).localCheckpoint()
    val jCp = viaCp.join(ranks.hint("shuffle_hash"),
      viaCp("src") === ranks("node"))
    println(s"[partprobe] checkpoint: exchanges=${exchanges(jCp)}")
    println(jCp.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Scan") ||
        l.contains("InMemory")).mkString("\n"))

    val viaCache = edges.repartition(col("src")).persist()
    viaCache.count()
    val jCache = viaCache.join(ranks.hint("shuffle_hash"),
      viaCache("src") === ranks("node"))
    println(s"[partprobe] persist:    exchanges=${exchanges(jCache)}")
    println(jCache.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Scan") ||
        l.contains("InMemory")).mkString("\n"))

    // checkpoint built with AQE off: the non-adaptive physical plan has
    // a resolved outputPartitioning for LogicalRDD to capture
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val viaCpNoAqe = edges.repartition(col("src")).localCheckpoint()
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val jNoAqe = viaCpNoAqe.join(ranks.hint("shuffle_hash"),
      viaCpNoAqe("src") === ranks("node"))
    println(s"[partprobe] cp-no-aqe:  exchanges=${exchanges(jNoAqe)}")
    println(jNoAqe.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Scan") ||
        l.contains("InMemory")).mkString("\n"))
    spark.stop()
  }
}
