package graft

import graft.operators.AlsCf
import org.apache.spark.sql.SparkSession

/** Dev tool (round 15, VERDICT r14 item 3): the two non-rewrite levers
  * on the q114 ALS fit floor.
  *
  * Mode `blocks` — same-JVM alternating A/B of [[AlsCf.fitEval]] at
  * MLlib's default block count (10) vs fewer/more blocks at this SF;
  * outputs (count digest + margin boolean) are asserted identical
  * before timing.
  *
  * Mode `coldwarm` — one COLD timed q114 in this JVM, optionally after
  * a tiny in-memory ALS warm fit (arg 3 = "warm"): run the main twice
  * in fresh JVMs and compare, re-testing round 9's "mini-fit warmer is
  * a net loss" verdict under the round-14 bench topology.
  *
  * Usage: runMain graft.AlsBlocksProbe <sfDir> blocks [reps]
  *        runMain graft.AlsBlocksProbe <sfDir> coldwarm [warm]
  */
object AlsBlocksProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mode = args.lift(1).getOrElse("blocks")
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
    import spark.implicits._

    def reap(): Unit = {
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body
      val dt = (System.nanoTime() - t0) / 1e9; reap(); dt
    }

    mode match {
      case "coldwarm" =>
        if (args.lift(2).contains("warm")) {
          val tiny = (0 until 200)
            .map(i => (i % 20, i % 10, (i % 5 + 1).toDouble))
            .toDF("user", "item", "rating")
          val tw = time(AlsCf.fitEval(tiny, maxIter = 2).count())
          println(f"[als] tiny warm fit: $tw%.2f s")
        }
        val t = time(AlsCf.fitEval(AlsCf.Store.ratings(spark, sfDir)).count())
        println(f"[als] cold q114 (warm=${args.lift(2).contains("warm")}): $t%.2f s")
      case _ =>
        val reps = args.lift(2).map(_.toInt).getOrElse(4)
        val arms: Seq[(String, Int)] =
          Seq("default10" -> -1, "blocks4" -> 4, "blocks32" -> 32)
        def run(nb: Int) =
          AlsCf.fitEval(AlsCf.Store.ratings(spark, sfDir), numBlocks = nb)
        val base = run(arms.head._2).collect().map(_.toSeq).toSet
        for ((an, nb) <- arms.tail) {
          val got = run(nb).collect().map(_.toSeq).toSet
          println(s"[als] equality ${arms.head._1} vs $an: " +
            (if (got == base) "IDENTICAL" else s"MISMATCH $base vs $got"))
        }
        reap()
        arms.foreach { case (_, nb) => run(nb).count(); reap() } // warmup
        val t = arms.map(_ => collection.mutable.Buffer[Double]())
        for (r <- 1 to reps) {
          for (((an, nb), i) <- arms.zipWithIndex)
            t(i) += time(run(nb).count())
          println(s"[als] rep $r  " + arms.zipWithIndex.map {
            case ((an, _), i) => f"$an=${t(i).last}%6.2f" }.mkString("  "))
        }
        arms.zipWithIndex.foreach { case ((an, _), i) =>
          val xs = t(i).toSeq
          println(f"[als] $an med=${xs.sorted.apply(xs.size / 2)}%6.2f " +
            f"min=${xs.min}%6.2f")
        }
    }
    spark.stop()
  }
}
