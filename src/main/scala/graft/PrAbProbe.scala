package graft

import graft.operators.{CoPurchaseGraph, Iterate}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool: same-JVM alternating A/B for the runDirected dangling-mass
  * shape — OLD (per-round aggregate + broadcast cross join) vs NEW
  * (observed metric on the roll). Co-tenant load cancels across the
  * alternation. Usage: runMain graft.PrAbProbe <sfDir> [reps] */
object PrAbProbe {

  /** The pre-observation runDirected, verbatim round-7 shape. */
  private def oldDirected(edges: DataFrame, iterations: Int = 10,
                          damping: Double = 0.85): DataFrame = {
    val frac = edges
      .withColumn("__w", sum(col("weight")).over(Window.partitionBy("src")))
      .select(col("src"), col("dst"),
        (col("weight").cast("double") / col("__w")).as("frac"))
      .localCheckpoint()
    val srcs = frac.select(col("src").as("node"), lit(true).as("__has")).distinct()
    val nodes = edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node")))
      .distinct()
      .join(srcs, Seq("node"), "left")
      .select(col("node"), col("__has").isNull.as("dang"))
      .repartition(col("node"))
      .localCheckpoint()
    val n = nodes.count()
    val base = (1.0 - damping) / n
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank"), col("dang"))
    var cp: Option[DataFrame] = None
    for (i <- 1 to iterations) {
      val contrib = frac.join(ranks.select("node", "rank")
            .hint("shuffle_hash"),
          frac("src") === col("node"))
        .groupBy(frac("dst").as("node"))
        .agg(sum(col("frac") * col("rank")).as("m"))
      val dang = ranks.where(col("dang"))
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dm"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .crossJoin(dang.hint("broadcast"))
        .select(col("node"),
          (lit(base) + lit(damping) *
            (coalesce(col("m"), lit(0.0)) + col("dm") / n)).as("rank"),
          col("dang"))
      if (i < iterations) {
        ranks = Iterate.roll(ranks, cp); cp = Some(ranks)
      }
    }
    ranks.select(col("node"), round(col("rank") * n, 6).as("pr_scaled"))
  }

  /** The round-8 obs-only shape: observation rolls, but static frames on
    * plain (partitioning-losing) localCheckpoint — the mid-step between
    * OLD and the live pin form. */
  private def obsDirected(edges: DataFrame, iterations: Int = 10,
                          damping: Double = 0.85): DataFrame = {
    import org.apache.spark.sql.Observation
    val frac = edges
      .withColumn("__w", sum(col("weight")).over(Window.partitionBy("src")))
      .select(col("src"), col("dst"),
        (col("weight").cast("double") / col("__w")).as("frac"))
      .localCheckpoint()
    val srcs = frac.select(col("src").as("node"), lit(true).as("__has")).distinct()
    val nObs = Observation()
    val nodes = edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node")))
      .distinct()
      .join(srcs, Seq("node"), "left")
      .select(col("node"), col("__has").isNull.as("dang"))
      .repartition(col("node"))
      .observe(nObs, count(lit(1)).as("n"))
      .localCheckpoint()
    val n = nObs.get("n").asInstanceOf[Long]
    val base = (1.0 - damping) / n
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank"), col("dang"))
    var dm = ranks.where(col("dang"))
      .agg(coalesce(sum(col("rank")), lit(0.0))).collect()(0).getDouble(0)
    var cp: Option[DataFrame] = None
    for (i <- 1 to iterations) {
      val contrib = frac.join(ranks.select("node", "rank")
            .hint("shuffle_hash"),
          frac("src") === col("node"))
        .groupBy(frac("dst").as("node"))
        .agg(sum(col("frac") * col("rank")).as("m"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + lit(damping) *
            (coalesce(col("m"), lit(0.0)) + lit(dm) / n)).as("rank"),
          col("dang"))
      if (i < iterations) {
        val obs = Observation()
        ranks = Iterate.roll(ranks.observe(obs,
          coalesce(sum(when(col("dang"), col("rank"))), lit(0.0))
            .as("dm")), cp)
        cp = Some(ranks)
        dm = obs.get("dm").asInstanceOf[Double]
      }
    }
    ranks.select(col("node"), round(col("rank") * n, 6).as("pr_scaled"))
  }

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
      spark.catalog.clearCache() // defensive; no DF caches registered today
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    def edges() = CoPurchaseGraph.fromOrders(Tables.lineitem(spark, sfDir))
    def time(body: => Long): Double = {
      val t0 = System.nanoTime(); body; val dt = (System.nanoTime() - t0) / 1e9
      reap(); dt
    }
    // untimed warmup of all paths
    oldDirected(edges(), 2).count(); reap()
    obsDirected(edges(), 2).count(); reap()
    graft.operators.PageRank.runDirected(edges(), 2).count(); reap()

    val olds = collection.mutable.Buffer[Double]()
    val obss = collection.mutable.Buffer[Double]()
    val news = collection.mutable.Buffer[Double]()
    for (r <- 1 to reps) {
      olds += time(oldDirected(edges()).count())
      obss += time(obsDirected(edges()).count())
      news += time(graft.operators.PageRank.runDirected(edges()).count())
      println(f"[prab] rep $r  old=${olds.last}%6.2f  obs=${obss.last}%6.2f  new=${news.last}%6.2f")
    }
    def stats(xs: Seq[Double]) =
      f"med=${xs.sorted.apply(xs.size / 2)}%6.2f min=${xs.min}%6.2f"
    println(s"[prab] OLD ${stats(olds.toSeq)}")
    println(s"[prab] OBS ${stats(obss.toSeq)}")
    println(s"[prab] NEW ${stats(news.toSeq)}")
    spark.stop()
  }
}
