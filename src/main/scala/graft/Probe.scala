package graft

import graft.operators._
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: parameter grid for ANN recall vs exact, to calibrate the
  * invariant-oracle bounds for q33/q34.
  * Usage: runMain graft.Probe <sfDir> */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.embeddings(spark, sfDir)
    val sub = emb.where(col("vec_id") < 2000)

    val exact = Dedup.cosinePairs(sub, 0.35).cache()
    val nExact = exact.count()
    for ((bl, nt) <- Seq((0.125, 4), (0.25, 4), (0.25, 8), (0.5, 4))) {
      val t0 = System.nanoTime()
      val brp = BrpLsh.cosinePairs(BrpLsh.fit(sub, bl, nt), sub, 0.35)
      val nBrp = brp.count()
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[probe] brp bl=$bl nt=$nt: exact=$nExact brp=$nBrp recall=${nBrp.toDouble / nExact}%.3f t=$dt%.1f s")
    }
    exact.unpersist()

    val q = emb.where(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val ex = ContentRetriever.topK(emb, q, 10).select("query_id", "vec_id").cache()
    ex.count()
    for ((cells, np) <- Seq((16, 8), (16, 12), (32, 12), (32, 16))) {
      val t0 = System.nanoTime()
      val model = Ivf.fit(emb, cells)
      val ivf = Ivf.topK(Ivf.assign(model, emb), model, q, 10, np)
        .select("query_id", "vec_id")
      val rec = ivf.join(ex, Seq("query_id", "vec_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("h"))
        .agg(avg(col("h") / 10.0), min(col("h") / 10.0)).collect()(0)
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[probe] ivf c=$cells np=$np: mean=${rec.getDouble(0)}%.3f min=${rec.getDouble(1)}%.2f t=$dt%.1f s")
    }
    ex.unpersist()
    spark.stop()
  }
}
