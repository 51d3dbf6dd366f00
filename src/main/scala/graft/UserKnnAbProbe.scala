package graft

import graft.operators.CoPurchaseGraph
import graft.sources.Tables
import org.apache.spark.sql.SparkSession

/** Dev tool (round 12, VERDICT item 3): same-JVM alternating A/B for
  * q165's per-user rank — WINDOW (`row_number` over the symmetrized
  * pair frame: a candidate-sized local sort, ~1.08G rows at 60×) vs
  * HEAP (`TopKAggregate.perGroupTopKCarry`: bounded per-user k-heaps in
  * ObjectHashAggregate, `shared` riding as cargo).
  *
  * This is the one candidate-sized window round 11 deliberately did NOT
  * convert: the heap trades the sort's disk footprint for a per-task
  * hash map of up to ~|users| heap buffers (~1.2M users × ~1 KB ≈
  * 1.2 GB/task at 60× — and above TopKAggregate.FallbackThresholdFloor
  * the ObjectHashAggregate falls back to sorting the REMAINDER anyway).
  * SCALE.md's conversion criterion left this clause untested; this
  * probe measures it. Alternation cancels co-tenant load; both variants
  * count the same output and assert equal row counts.
  *
  * Usage: runMain graft.UserKnnAbProbe <sfDir> [reps]
  */
object UserKnnAbProbe {
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

    // mode "late" (round 15): A arm = shipped norms-on-postings, B arm =
    // lateNorms (norm columns dropped from the pair exchange, broadcast
    // re-attach post-fold) — exact row-set equality asserted pre-timing
    val late = args.lift(2).contains("late")
    def build(b: Boolean) =
      if (late)
        CoPurchaseGraph.userNeighborsImpl(Tables.orders(spark, sfDir),
          Tables.lineitem(spark, sfDir), 5, 200, heapTopK = false,
          lateNorms = b)
      else
        CoPurchaseGraph.userNeighborsImpl(Tables.orders(spark, sfDir),
          Tables.lineitem(spark, sfDir), 5, 200, heapTopK = b)
    if (late) {
      val a = build(false).collect().map(_.toSeq).toSet
      val b = build(true).collect().map(_.toSeq).toSet
      println(s"[userknn-ab] late-norms equality: " +
        (if (a == b) s"IDENTICAL (${a.size} rows)"
         else s"MISMATCH a-only=${(a -- b).size} b-only=${(b -- a).size}"))
      require(a == b, "lateNorms diverged")
    }
    def run(arm: Boolean): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = build(arm).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      (n, dt)
    }

    // untimed warmup of the shared subtree (scan + postings join shapes)
    run(arm = false)
    var rowsW = -1L; var rowsH = -1L
    val (tw, th) = (Array.ofDim[Double](reps), Array.ofDim[Double](reps))
    for (r <- 0 until reps) {
      val (nw, dw) = run(arm = false); rowsW = nw; tw(r) = dw
      val (nh, dh) = run(arm = true); rowsH = nh; th(r) = dh
      println(f"[userknn-ab] rep$r  A ${dw}%7.2f s   B ${dh}%7.2f s")
    }
    require(rowsW == rowsH, s"variant row counts differ: $rowsW vs $rowsH")
    println(f"[userknn-ab] $sfDir rows=$rowsW  " +
      f"window_min=${tw.min}%7.2f s  heap_min=${th.min}%7.2f s  " +
      f"(samples w: ${tw.map(t => f"$t%.2f").mkString(" ")} | " +
      f"h: ${th.map(t => f"$t%.2f").mkString(" ")})")
    spark.stop()
  }
}
