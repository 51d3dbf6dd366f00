package graft

import graft.operators.{CoPurchaseGraph, PageRank}
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: time-split probe for the PageRank family — edge build vs
  * iteration loop — so optimization effort lands on the phase that
  * actually carries the isolated cost. Usage: runMain graft.PrProbe
  * <sfDir> [reps]
  */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def reap(): Unit = {
      spark.catalog.clearCache() // defensive; no DF caches registered today
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    def t(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[prprobe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
      reap()
    }

    for (r <- 1 to reps) {
      println(s"--- rep $r ---")
      t("edge_build")(
        CoPurchaseGraph.fromOrders(Tables.lineitem(spark, sfDir)).count())
      t("q149_ppr_full")(
        PageRank.personalized(
          CoPurchaseGraph.fromOrders(Tables.lineitem(spark, sfDir)),
          Tables.tableRaw(spark, sfDir, "part").where(col("p_partkey") < 5)
            .select(col("p_partkey").as("node"))).count())
      t("q94_directed_full")(
        PageRank.runDirected(
          CoPurchaseGraph.fromOrders(Tables.lineitem(spark, sfDir))).count())
      t("q63_pagerank_full")(
        PageRank.run(CoPurchaseGraph.symmetrize(
          CoPurchaseGraph.fromOrders(Tables.lineitem(spark, sfDir)))).count())
    }
    spark.stop()
  }
}
