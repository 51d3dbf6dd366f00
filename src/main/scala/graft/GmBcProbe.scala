package graft

import graft.operators.{CoPurchaseGraph, GraphMetrics}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: same-JVM alternating A/B for the GraphMetrics iterative
  * join strategy — SHUFFLE (shuffle_hash, the r7/r8 shape) vs BROADCAST
  * (node/frontier/score frames broadcast; the edge frame never exchanges
  * inside the loop), forced via broadcastMaxNodes (0 / MaxValue). Exact
  * output-equality gates run first: labelProp and bfsHops are
  * integer-exact so the modes must agree bit-for-bit; hits at the 6-dp
  * contract. Usage: runMain graft.GmBcProbe <sfDir> [reps]
  */
object GmBcProbe {

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
    def edges() = CoPurchaseGraph.fromOrders(Tables.lineitem(spark, sfDir))
    def seeds() = Tables.tableRaw(spark, sfDir, "part")
      .where(col("p_partkey") < 5).select(col("p_partkey").as("node"))

    // ---- output-equality gates between the two modes ----
    // by-name sides: each operator call localCheckpoints at CONSTRUCTION,
    // and reap() unpersists all checkpoint blocks — so side B must not
    // exist yet when side A's reap runs (eager args crashed with
    // CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND)
    def cmp(name: String, a: => DataFrame, b: => DataFrame): Unit = {
      val l = a.collect().map(_.toSeq).toSet
      reap()
      val r = b.collect().map(_.toSeq).toSet
      reap()
      println(s"[gmbc] $name equality: " +
        s"${if (l == r) "IDENTICAL" else s"DIFFER ${(l diff r).size}/${l.size}"}")
    }
    cmp("labelProp",
      GraphMetrics.labelProp(edges(), 5, broadcastMaxNodes = 0L),
      GraphMetrics.labelProp(edges(), 5, broadcastMaxNodes = Long.MaxValue))
    cmp("bfsHops",
      GraphMetrics.bfsHops(edges(), seeds(), 3, broadcastMaxNodes = 0L),
      GraphMetrics.bfsHops(edges(), seeds(), 3, broadcastMaxNodes = Long.MaxValue))
    cmp("hits",
      GraphMetrics.hits(edges(), 5, broadcastMaxNodes = 0L),
      GraphMetrics.hits(edges(), 5, broadcastMaxNodes = Long.MaxValue))

    def time(body: => Long): Double = {
      val t0 = System.nanoTime(); body; val dt = (System.nanoTime() - t0) / 1e9
      reap(); dt
    }
    val shapes = Seq[(String, Long => Long)](
      ("labelProp", b => GraphMetrics.labelProp(edges(), 5, b).count()),
      ("bfsHops  ", b => GraphMetrics.bfsHops(edges(), seeds(), 3, b).count()),
      ("hits     ", b => GraphMetrics.hits(edges(), 5, b).count()))
    for ((name, f) <- shapes) {
      val sh = collection.mutable.Buffer[Double]()
      val bc = collection.mutable.Buffer[Double]()
      for (r <- 1 to reps) {
        sh += time(f(0L))
        bc += time(f(Long.MaxValue))
        println(f"[gmbc] $name rep $r  shuffle=${sh.last}%6.2f  broadcast=${bc.last}%6.2f")
      }
      def stats(xs: Seq[Double]) =
        f"med=${xs.sorted.apply(xs.size / 2)}%6.2f min=${xs.min}%6.2f"
      println(s"[gmbc] $name SHUFFLE   ${stats(sh.toSeq)}")
      println(s"[gmbc] $name BROADCAST ${stats(bc.toSeq)}")
    }
    spark.stop()
  }
}
