package graft

import graft.operators.{CoPurchaseGraph, PageRank}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: same-JVM alternating A/B for the PageRank contrib-join
  * strategy — SHUFFLE (shuffle_hash both sides, the r7/r8 shape) vs
  * BROADCAST (rank/contrib frames broadcast; the edge frame never
  * exchanges inside the loop). Forces each mode via the
  * broadcastMaxNodes parameter (0 = always shuffle, MaxValue = always
  * broadcast). Also verifies the two modes agree at the rounded 6-dp
  * output contract before timing. Co-tenant load cancels across the
  * alternation. Usage: runMain graft.PrBcProbe <sfDir> [reps]
  */
object PrBcProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
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
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    def dirEdges() = CoPurchaseGraph.fromOrders(Tables.lineitem(spark, sfDir))
    def symEdges() = CoPurchaseGraph.symmetrize(dirEdges())
    def seeds() = Tables.tableRaw(spark, sfDir, "part")
      .where(col("p_partkey") < 5).select(col("p_partkey").as("node"))

    // ---- 6-dp output-equality gate between the two modes ----
    def asMap(df: DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val shufD = asMap(PageRank.runDirected(dirEdges(), broadcastMaxNodes = 0L))
    reap()
    val bcD = asMap(PageRank.runDirected(dirEdges(),
      broadcastMaxNodes = Long.MaxValue))
    reap()
    val mism = shufD.count { case (k, v) => bcD.get(k).forall(_ != v) }
    println(s"[prbc] directed 6-dp mismatches shuffle-vs-broadcast: " +
      s"$mism of ${shufD.size}")

    def time(body: => Long): Double = {
      val t0 = System.nanoTime(); body; val dt = (System.nanoTime() - t0) / 1e9
      reap(); dt
    }
    // untimed warmup of both modes per shape
    PageRank.run(symEdges(), 2, broadcastMaxNodes = 0L).count(); reap()
    PageRank.run(symEdges(), 2, broadcastMaxNodes = Long.MaxValue).count(); reap()

    val shapes = Seq[(String, Long => Long)](
      ("undirected", b => PageRank.run(symEdges(), broadcastMaxNodes = b).count()),
      ("directed  ", b => PageRank.runDirected(dirEdges(), broadcastMaxNodes = b).count()),
      ("ppr       ", b => PageRank.personalized(dirEdges(), seeds(), broadcastMaxNodes = b).count()))
    for ((name, f) <- shapes) {
      val sh = collection.mutable.Buffer[Double]()
      val bc = collection.mutable.Buffer[Double]()
      for (r <- 1 to reps) {
        sh += time(f(0L))
        bc += time(f(Long.MaxValue))
        println(f"[prbc] $name rep $r  shuffle=${sh.last}%6.2f  broadcast=${bc.last}%6.2f")
      }
      def stats(xs: Seq[Double]) =
        f"med=${xs.sorted.apply(xs.size / 2)}%6.2f min=${xs.min}%6.2f"
      println(s"[prbc] $name SHUFFLE   ${stats(sh.toSeq)}")
      println(s"[prbc] $name BROADCAST ${stats(bc.toSeq)}")
    }
    spark.stop()
  }
}
