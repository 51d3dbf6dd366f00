package graft

import org.apache.spark.sql.SparkSession
import java.lang.management.ManagementFactory
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Dev tool (round 13, VERDICT item 2): instrumented same-JVM repeat
  * probe for the q165 monotonic-growth anomaly.
  *
  * BENCH_ISOLATED_r12 pass-2 recorded q165's warm in-JVM repeats at
  * 6.64 → 28.39 → 55.19 s — monotonic ×8 growth inside one JVM at
  * load1 ≈ 4.8, which ambient burst noise does not produce. The
  * suspect: [[graft.Bench.runInProcess]] reaps persistent blocks +
  * System.gc() BETWEEN queries but NOT between the warm repeats of one
  * query, so any per-run state (localCheckpoint blocks, shuffle files,
  * broadcast blocks — all freed only after a JVM GC lets the
  * ContextCleaner prove them dead) accumulates across repeats.
  *
  * This probe times N back-to-back runs of one query and records, per
  * run: elapsed, GC time/count delta, post-run heap, persisted-RDD
  * block footprint (mem + disk), and the growth of this JVM's
  * blockmgr-&#42; and spark-&#42; temp dirs (shuffle + checkpoint spill). Env
  * PROBE_REAP=1 switches on the between-repeat reap (clearCache +
  * blocking unpersist + System.gc — exactly Bench's between-QUERY
  * reap) for the A/B.
  *
  * Usage: runMain graft.Q165RepeatProbe [sfDir] [runs] [queryName]
  */
object Q165RepeatProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(6)
    val qname = args.lift(2).getOrElse("q165_user_knn")
    val reapMode = sys.env.getOrElse("PROBE_REAP", "off")
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

    def gcStats: (Long, Long) = {
      val beans = ManagementFactory.getGarbageCollectorMXBeans.asScala
      (beans.map(_.getCollectionTime).sum, beans.map(_.getCollectionCount).sum)
    }
    // This JVM's spark temp dirs only: created after JVM start, so a
    // concurrent sbt/bench JVM's leftovers don't pollute the reading.
    val jvmStartMs = ManagementFactory.getRuntimeMXBean.getStartTime
    val tmp = Paths.get(sys.props.getOrElse("java.io.tmpdir", "/tmp"))
    def localDirBytes: Long = {
      def sizeOf(p: Path): Long = {
        val s = Files.walk(p)
        try s.iterator().asScala
          .filter(Files.isRegularFile(_))
          .map(f => try Files.size(f) catch { case _: Throwable => 0L })
          .sum
        finally s.close()
      }
      val ls = Files.list(tmp)
      try ls.iterator().asScala
        .filter { p =>
          val n = p.getFileName.toString
          (n.startsWith("blockmgr-") || n.startsWith("spark-")) &&
            (try Files.getLastModifiedTime(p).toMillis >= jvmStartMs
             catch { case _: Throwable => false })
        }
        .map(p => try sizeOf(p) catch { case _: Throwable => 0L })
        .sum
      finally ls.close()
    }

    // Task-level metrics: total executor run time and in-task GC time
    // per probe run — separates "tasks did more work / stalled in GC"
    // from "scheduler/driver stalls between tasks".
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val taskGcMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            taskMs.addAndGet(m.executorRunTime)
            taskGcMs.addAndGet(m.jvmGCTime)
          }
        }
      })

    // PROBE_UI_CKPT selects the q165 A/B arm explicitly now that the
    // SHIPPED default is no-checkpoint (round 13): unset → the shipped
    // registry query; "1" → checkpointUi = true (the HISTORICAL repro
    // arm that grows without a reap); "0" → checkpointUi = false called
    // directly (≡ shipped, kept for symmetry). The pre-fix env name
    // PROBE_NOCKPT=1 is honored as an alias of "0".
    val uiCkpt: Option[Boolean] =
      sys.env.get("PROBE_UI_CKPT").map(_ == "1")
        .orElse(if (sys.env.get("PROBE_NOCKPT").contains("1")) Some(false)
                else None)
    val fn: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame =
      uiCkpt match {
        case Some(ck) =>
          (s, d) => graft.operators.CoPurchaseGraph.userNeighborsImpl(
            graft.sources.Tables.orders(s, d),
            graft.sources.Tables.lineitem(s, d), 5, 200,
            heapTopK = false, checkpointUi = ck)
        case None => SparkEntry.queries(qname)
      }
    try SparkEntry.setups.get(qname).foreach(_(spark, sfDir))
    catch { case _: Throwable => () }
    println(s"[q165probe] query=$qname sf=$sfDir runs=$runs " +
      s"reap=$reapMode uiCkpt=${uiCkpt.map(_.toString).getOrElse("shipped")} " +
      s"heapMax=${Runtime.getRuntime.maxMemory / (1 << 20)}MB")
    for (i <- 1 to runs) {
      val (g0, c0) = gcStats
      val (tk0, tg0) = (taskMs.get(), taskGcMs.get())
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val el = (System.nanoTime() - t0) / 1e9
      val (g1, c1) = gcStats
      val (tk1, tg1) = (taskMs.get(), taskGcMs.get())
      val st = spark.sparkContext.getRDDStorageInfo
      val mem = st.map(_.memSize).sum / (1 << 20)
      val dsk = st.map(_.diskSize).sum / (1 << 20)
      val heap = (Runtime.getRuntime.totalMemory -
        Runtime.getRuntime.freeMemory) / (1 << 20)
      println(f"[q165probe] run$i%2d ${el}%7.2f s  rows=$n  " +
        f"gc=${g1 - g0}%5d ms/${c1 - c0}%3d  " +
        f"taskTime=${(tk1 - tk0) / 1000.0}%7.1f s (taskGc ${(tg1 - tg0) / 1000.0}%6.1f s)  " +
        f"persistedRDDs=${st.length}%3d (mem ${mem}%6d MB, disk ${dsk}%6d MB)  " +
        f"heapUsed=${heap}%6d MB  sparkTmp=${localDirBytes / (1 << 20)}%6d MB")
      // PROBE_REAP: "1" = full Bench between-query reap; "gc" = only
      // System.gc(); "unpersist" = only blocking unpersist — isolates
      // which half of the reap removes the repeat-growth state.
      reapMode match {
        case "1" =>
          try spark.catalog.clearCache() catch { case _: Throwable => () }
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
          System.gc()
        case "gc" => System.gc()
        case "unpersist" =>
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
        case _ => ()
      }
    }
    spark.stop()
  }
}
