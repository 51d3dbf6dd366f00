package graft

import graft.operators.{CoPurchaseGraph, GraphMetrics, PageRank}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: same-JVM alternating A/B for the round-14 mid-loop roll
  * cadence (round fusion) across the iterative graph family — status
  * quo cadence vs fused forms. Each family first proves output
  * equality between its arms (exact row-set compare on the rounded
  * output), then alternates timed full-query runs so co-tenant load
  * cancels. Usage: runMain graft.GraphFuseProbe <sfDir> [reps] [fam,..]
  */
object GraphFuseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val only = args.lift(2).map(_.split(",").toSet)
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
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    def edges() = CoPurchaseGraph.fromOrders(Tables.lineitem(spark, sfDir))
    def seeds() = Tables.tableRaw(spark, sfDir, "part")
      .where(col("p_partkey") < 5).select(col("p_partkey").as("node"))
    def time(body: => Long): Double = {
      val t0 = System.nanoTime(); body; val dt = (System.nanoTime() - t0) / 1e9
      reap(); dt
    }
    def rows(df: DataFrame): Set[Seq[Any]] = {
      val r = df.collect().map(_.toSeq).toSet; reap(); r
    }

    // (family, arm-name -> query builder)
    val families: Seq[(String, Seq[(String, () => DataFrame)])] = Seq(
      "q94_directed" -> Seq(
        "roll1" -> (() => PageRank.runDirectedImpl(edges(), 10, 0.85,
          PageRank.BroadcastMaxNodes, 1)),
        "roll2" -> (() => PageRank.runDirectedImpl(edges(), 10, 0.85,
          PageRank.BroadcastMaxNodes, 2)),
        "roll10" -> (() => PageRank.runDirectedImpl(edges(), 10, 0.85,
          PageRank.BroadcastMaxNodes, 10))),
      "q149_ppr" -> Seq(
        "roll1" -> (() => PageRank.personalizedImpl(edges(), seeds(), 10,
          0.85, PageRank.BroadcastMaxNodes, 1)),
        "roll2" -> (() => PageRank.personalizedImpl(edges(), seeds(), 10,
          0.85, PageRank.BroadcastMaxNodes, 2)),
        "roll10" -> (() => PageRank.personalizedImpl(edges(), seeds(), 10,
          0.85, PageRank.BroadcastMaxNodes, 10))),
      "q63_pr" -> Seq(
        "roll4" -> (() => PageRank.runImpl(
          CoPurchaseGraph.symmetrize(edges()), 10, 0.85,
          PageRank.BroadcastMaxNodes, 4)),
        "roll10" -> (() => PageRank.runImpl(
          CoPurchaseGraph.symmetrize(edges()), 10, 0.85,
          PageRank.BroadcastMaxNodes, 10))),
      "q163_lp" -> Seq(
        "join" -> (() => GraphMetrics.labelPropImpl(edges(), 5,
          PageRank.BroadcastMaxNodes, fused = false)),
        "fused" -> (() => GraphMetrics.labelPropImpl(edges(), 5,
          PageRank.BroadcastMaxNodes, fused = true))),
      "q186_hits" -> Seq(
        "roll2" -> (() => GraphMetrics.hitsImpl(edges(), 5,
          PageRank.BroadcastMaxNodes, 2)),
        "roll10" -> (() => GraphMetrics.hitsImpl(edges(), 5,
          PageRank.BroadcastMaxNodes, 10))),
      // round-14 setup restructure: window-frac + raw-edge node build
      // (historical) vs join-frac + checkpoint-read node build
      "q94_setup" -> Seq(
        "window" -> (() => PageRank.runDirectedImpl(edges(), 10, 0.85,
          PageRank.BroadcastMaxNodes, PageRank.RollEveryDirected,
          setupJoin = false)),
        "join" -> (() => PageRank.runDirectedImpl(edges(), 10, 0.85,
          PageRank.BroadcastMaxNodes, PageRank.RollEveryDirected,
          setupJoin = true))),
      "q149_setup" -> Seq(
        "window" -> (() => PageRank.personalizedImpl(edges(), seeds(), 10,
          0.85, PageRank.BroadcastMaxNodes, PageRank.RollEveryDirected,
          setupJoin = false)),
        "join" -> (() => PageRank.personalizedImpl(edges(), seeds(), 10,
          0.85, PageRank.BroadcastMaxNodes, PageRank.RollEveryDirected,
          setupJoin = true))),
      "q63_setup" -> Seq(
        "window" -> (() => PageRank.runImpl(
          CoPurchaseGraph.symmetrize(edges()), 10, 0.85,
          PageRank.BroadcastMaxNodes, PageRank.RollEvery,
          setupJoin = false)),
        "join" -> (() => PageRank.runImpl(
          CoPurchaseGraph.symmetrize(edges()), 10, 0.85,
          PageRank.BroadcastMaxNodes, PageRank.RollEvery,
          setupJoin = true))),
      // round-15 (VERDICT r14 item 6): settle the kcore pairwise-peel
      // fusion that round 14 rejected on reasoning, not measurement
      "q127_kcore" -> Seq(
        "peel1" -> (() => GraphMetrics.kcoreImpl(edges(), 3, 10,
          peelsPerRoll = 1)),
        "peel2" -> (() => GraphMetrics.kcoreImpl(edges(), 3, 10,
          peelsPerRoll = 2))))
      .filter(f => only.forall(_.contains(f._1)))

    for ((fam, arms) <- families) {
      // equality gate: every arm must return the base arm's exact rows
      val base = rows(arms.head._2())
      for ((an, mk) <- arms.tail) {
        val got = rows(mk())
        val d1 = (base -- got).size; val d2 = (got -- base).size
        println(s"[fuse] $fam equality ${arms.head._1} vs $an: " +
          (if (d1 == 0 && d2 == 0) s"IDENTICAL (${base.size} rows)"
           else s"MISMATCH base-only=$d1 arm-only=$d2 of ${base.size}"))
      }
      // untimed warmup of each arm
      arms.foreach { case (_, mk) => mk().count(); reap() }
      val t = arms.map(_ => collection.mutable.Buffer[Double]())
      for (r <- 1 to reps) {
        for (((an, mk), i) <- arms.zipWithIndex)
          t(i) += time(mk().count())
        println(s"[fuse] $fam rep $r  " + arms.zipWithIndex.map {
          case ((an, _), i) => f"$an=${t(i).last}%6.2f" }.mkString("  "))
      }
      def stats(xs: Seq[Double]) =
        f"med=${xs.sorted.apply(xs.size / 2)}%6.2f min=${xs.min}%6.2f"
      arms.zipWithIndex.foreach { case ((an, _), i) =>
        println(s"[fuse] $fam $an ${stats(t(i).toSeq)}") }
    }
    spark.stop()
  }
}
