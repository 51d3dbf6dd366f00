package graft

import graft.operators._
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (round 10): per-query recall of the ADAPTIVE-nCells persisted
  * index (Ivf.nCellsFor at fit time) on exactly the q34/q68 gate
  * population (vec_id < 20), swept over nProbe — the evidence that sets
  * the gated serve queries' nProbe so their recall floors (mean ≥ 0.9,
  * min ≥ 0.7) sit under MEASURED values rather than hopes.
  * Usage: runMain graft.IvfRecallProbe <sfDir> [nProbe,nProbe,...]
  */
object IvfRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val probes = args.lift(1).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(12, 14, 16, 18, 20, 23))
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

    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.where(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val ex = ContentRetriever.topK(emb, q, 10)
      .select(col("query_id"), col("vec_id"), lit(1).as("in_ex"))
      .localCheckpoint()
    val nc = IvfIndexStore.nCells(spark, sfDir)
    println(s"[recall] $sfDir adaptive nCells=$nc")
    val queries = emb.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"))
    for (np <- probes) {
      def stats(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
        val r = df.select("query_id", "vec_id")
          .join(ex, Seq("query_id", "vec_id"), "left")
          .groupBy("query_id").agg(sum(coalesce(col("in_ex"), lit(0))).as("h"))
          .agg(avg(col("h") / 10.0), min(col("h") / 10.0)).collect()(0)
        (r.getDouble(0), r.getDouble(1))
      }
      val (sm, sn) = stats(IvfIndexStore.serve(spark, sfDir, q, 10, np))
      val (jm, jn) = stats(Ivf.knnJoin(IvfIndexStore.indexFrame(spark, sfDir),
        IvfIndexStore.loadModel(sfDir), queries, 10, np)
        .where(col("query_id") < 20))
      println(f"[recall] nProbe=$np%3d  serve mean $sm%.3f min $sn%.3f   " +
        f"knnJoin mean $jm%.3f min $jn%.3f")
    }
    spark.stop()
  }
}
