package graft

import graft.operators._
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage timing + recall for the cell-cogrouped kNN join.
  * Usage: runMain graft.Probe <sfDir> [nProbe] */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nProbe = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val emb = Tables.embeddings(spark, sfDir)
    time("warm")(emb.count())
    time("ensure")(IvfIndexStore.ensure(spark, sfDir))
    val model = IvfIndexStore.loadModel(sfDir)
    val index = IvfIndexStore.indexFrame(spark, sfDir)
    val queries = emb.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"))
    val nn = Ivf.knnJoin(index, model, queries, 10, nProbe)
    time(s"knnJoin-full-nProbe$nProbe")(nn.count())
    time(s"knnJoin-again")(nn.count())
    // recall vs exact on the vec_id<20 subset
    val sub = queries.where(col("query_id") < 20)
    val ex = ContentRetriever.topK(emb, sub, 10)
      .select(col("query_id"), col("vec_id"), lit(1).as("in_ex"))
    // SQ8-vs-full serving overlap (q71 gate calibration)
    val sq = Quantize.dequantized(Quantize.int8(index, "vec_id", "embedding"))
    val quant = Ivf.topK(sq, model, queries.where(col("query_id") < 20), 10, 4)
    val full = IvfIndexStore.serve(spark, sfDir, queries.where(col("query_id") < 20), 10, 4)
    val ovl = quant.select(col("query_id"), col("vec_id"), lit(1).as("in_q"))
      .join(full.select(col("query_id"), col("vec_id"), lit(1).as("in_f")),
        Seq("query_id", "vec_id"), "full_outer")
      .groupBy("query_id")
      .agg(count(when(col("in_q").isNotNull && col("in_f").isNotNull, 1)).as("common"))
      .agg(avg(col("common") / 10.0).as("mean_overlap"),
        min(col("common") / 10.0).as("min_overlap"))
    time("sq8-overlap")(ovl.show(false))
    val rec = nn.select("query_id", "vec_id")
      .where(col("query_id") < 20)
      .join(ex, Seq("query_id", "vec_id"), "left")
      .groupBy("query_id")
      .agg(sum(coalesce(col("in_ex"), lit(0))).as("h"))
      .agg(avg(col("h") / 10.0).as("mean_recall"),
        min(col("h") / 10.0).as("min_recall"))
    time("recall")(rec.show(false))
    spark.stop()
  }
}
