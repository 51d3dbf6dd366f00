package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev tool (round-9 verdict item 3): stage/job dump for the
  * q114_als_mf cold-start gap — in-suite 16–33 s vs 5.4–5.6 s isolated
  * in round 8, the largest in-suite multiple not explained by load keys.
  *
  * Runs q114 TWICE in one JVM (optionally after its real fork-chunk
  * light mates, SPARK_GRAFT_ALS_PRELUDE=1), with a listener recording
  * per-stage wall / executor-run / GC / deserialize time and per-job
  * driver-side gaps (time between an action starting and its first job,
  * and between consecutive jobs — where Catalyst planning and codegen
  * live). The RUN1−RUN2 delta, split driver-vs-executor, names what the
  * first timed run pays.
  *
  * Usage: runMain graft.AlsProfile <sfDir>
  */
object AlsProfile {

  private case class St(id: Int, name: String, wallMs: Long, runMs: Long,
                        gcMs: Long, deserMs: Long, tasks: Int)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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

    val stages = mutable.ArrayBuffer.empty[St]
    val jobEvents = mutable.ArrayBuffer.empty[(String, Long, Long)] // (kind, t, id)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val tm = si.taskMetrics
        stages += St(si.stageId, si.name.takeWhile(_ != '\n'),
          (for {a <- si.completionTime; b <- si.submissionTime} yield a - b)
            .getOrElse(0L),
          if (tm == null) 0L else tm.executorRunTime,
          if (tm == null) 0L else tm.jvmGCTime,
          if (tm == null) 0L else tm.executorDeserializeTime,
          si.numTasks)
      }
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobEvents.synchronized { jobEvents += (("start", e.time, e.jobId.toLong)) }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobEvents.synchronized { jobEvents += (("end", e.time, e.jobId.toLong)) }
    })

    def runQ(name: String): Double = {
      // mirror Bench: setups (index builds, bucketed stores) run UNTIMED
      // before the query — a setup-gated chunk mate would otherwise
      // crash the prelude or pay its index build inside the profiled
      // window, distorting the cold-start comparison (round-9 ADVICE).
      try SparkEntry.setups.get(name).foreach(_(spark, sfDir))
      catch { case _: Throwable => () }
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }

    if (sys.env.contains("SPARK_GRAFT_ALS_PRELUDE")) {
      // the real chunk context: q114's fork-chunk light mates, in order
      val fork = sys.env.getOrElse("SPARK_GRAFT_FORK", "6").toInt
      val all = SparkEntry.queries.keys.toSeq.sorted
      val chunk = Bench.topoChunks(all, fork)
        .find(_.contains("q114_als_mf")).get
      chunk.filterNot(_ == "q114_als_mf").foreach { q =>
        val s = runQ(q)
        println(f"[alsprofile] prelude $q%-24s $s%6.2f s")
      }
    }

    // A/B probe: does a mid-size ALS mini-fit JIT-warm the solver paths
    // enough to pay for itself? (r8 rejected a TINY mini-fit at ~0.5 s
    // win; C2 needs real invocation counts to compile the hot loops.)
    sys.env.get("SPARK_GRAFT_ALS_MINIFIT").foreach { fracStr =>
      val frac = fracStr.toDouble
      val t0 = System.nanoTime()
      val ratings = graft.operators.AlsCf.Store.ratings(spark, sfDir)
        .sample(withReplacement = false, frac, 42L)
      graft.operators.AlsCf.fitEval(ratings, maxIter = 2).count()
      println(f"[alsprofile] minifit frac=$frac cost ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }

    def window(label: String): Unit = {
      stages.clear(); jobEvents.clear()
      val w0 = System.currentTimeMillis()
      val sec = runQ("q114_als_mf")
      val w1 = System.currentTimeMillis()
      // driver-side gaps: action start -> first job, and between jobs
      val evs = jobEvents.sortBy(_._2)
      var lastEnd = w0
      var driverGapMs = 0L
      evs.foreach {
        case ("start", t, _) =>
          driverGapMs += math.max(0L, t - lastEnd); lastEnd = math.max(lastEnd, t)
        case ("end", t, _) => lastEnd = math.max(lastEnd, t)
        case _ =>
      }
      driverGapMs += math.max(0L, w1 - lastEnd)
      val ss = stages.toSeq
      println(f"[alsprofile] == $label: wall ${sec}%6.2f s, jobs ${evs.count(_._1 == "start")}%3d, stages ${ss.size}%3d ==")
      println(f"[alsprofile] $label driver_gap_s ${driverGapMs / 1e3}%7.2f  " +
        f"stage_wall_s ${ss.map(_.wallMs).sum / 1e3}%7.2f  " +
        f"exec_run_s ${ss.map(_.runMs).sum / 1e3}%8.2f  " +
        f"gc_s ${ss.map(_.gcMs).sum / 1e3}%6.2f  " +
        f"deser_s ${ss.map(_.deserMs).sum / 1e3}%6.2f")
      ss.sortBy(-_.wallMs).take(12).foreach { s =>
        println(f"[alsprofile] $label stage ${s.id}%4d wall ${s.wallMs / 1e3}%6.2f run ${s.runMs / 1e3}%7.2f gc ${s.gcMs / 1e3}%5.2f tasks ${s.tasks}%4d  ${s.name.take(70)}")
      }
    }

    window("RUN1")
    window("RUN2")
    spark.stop()
  }
}
