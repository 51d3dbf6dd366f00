package graft

import graft.operators.{CoPurchaseGraph, PageRank}
import graft.sources.Tables
import org.apache.spark.sql.SparkSession

/** Dev tool (round 9): A/B the PageRank contrib-join modes at a |V|
  * ABOVE `PageRank.BroadcastMaxNodes` — the one path the round-8 verdict
  * flagged as spec-gated but never executed at scale ("untestable in
  * this sandbox"). With a 60× synthesized corpus
  * (`tools/scale_probe.py --mult 60`), |V| = 1.2M > 2²⁰, so the q63
  * loop takes the shuffle-hash path NATURALLY; this probe times both
  * forced modes on the same edge frame (built once, outside timing) to
  * answer two questions with data: (a) does the above-bound shuffle
  * path hold at real volume, and (b) is 2²⁰ conservatively placed —
  * i.e. would broadcasting a 1.2M-node frame still win on this
  * hardware, meaning a deployment can raise the knob.
  *
  * Usage: runMain graft.PrScaleProbe <sfDir> [iterations]
  */
object PrScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/scale_data/sf6")
    val iters = args.lift(1).map(_.toInt).getOrElse(10)
    val reps = args.lift(2).map(_.toInt).getOrElse(1)
    // reps > 1 at |V| ≫ bound accumulates per-round broadcast blocks
    // faster than ContextCleaner reclaims them — rep2 of the first
    // 3-rep run OOMed a 48 GiB heap, which is the bound's raison
    // d'être; prefer fresh JVMs per pair for clean repetition
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // q63's exact edge build, materialized ONCE outside the timed region
    val edges = CoPurchaseGraph.symmetrize(
      CoPurchaseGraph.fromOrders(Tables.lineitem(spark, sfDir)))
      .localCheckpoint()
    val e = edges.count()
    val v = edges.select("src").distinct().count()
    println(s"[prscale] |E|=$e |V|=$v (BroadcastMaxNodes=${PageRank.BroadcastMaxNodes}, " +
      s"${if (v > PageRank.BroadcastMaxNodes) "ABOVE" else "below"} bound)")

    def load1: Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    // alternate modes so ambient drift hits both arms equally
    for (rep <- 1 to reps; mode <- Seq("shuffle", "broadcast")) {
      val bound = if (mode == "broadcast") Long.MaxValue else 0L
      val l = load1
      val t0 = System.nanoTime()
      PageRank.run(edges, iters, broadcastMaxNodes = bound).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[prscale] rep$rep $mode%-9s $s%8.2f s  (load1 $l%.1f)")
    }
    spark.stop()
  }
}
