package graft

import graft.operators._
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: PQ overlap-vs-exact headroom at a given sf dir.
  * Usage: runMain graft.PqProbe <sfDir> [m] [ksub] */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val m = args.lift(1).map(_.toInt).getOrElse(8)
    val ksub = args.lift(2).map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    IvfIndexStore.ensure(spark, sfDir)
    val model = IvfIndexStore.loadModel(sfDir)
    val index = IvfIndexStore.indexFrame(spark, sfDir)
    val t0 = System.nanoTime()
    val pq = Pq.fit(Tables.embeddings(spark, sfDir), 64, m, ksub)
    System.err.println(f"[pq] fit ${(System.nanoTime() - t0) / 1e9}%.2f s (m=$m ksub=$ksub)")
    val q = Tables.embeddings(spark, sfDir).where(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    def time[T](name: String)(f: => T): T = {
      val t = System.nanoTime()
      val r = f
      System.err.println(f"[pq] $name%-30s ${(System.nanoTime() - t) / 1e9}%8.2f s")
      r
    }
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val encoded = Pq.encode(pq, index.select("vec_id", "embedding", "cell"))
    time("encode-count")(encoded.count())
    val full = IvfIndexStore.serve(spark, sfDir, q, 10, 4)
    time("exact-serve")(full.count())
    def overlap(a: org.apache.spark.sql.DataFrame) =
      a.select(col("query_id"), col("vec_id"), lit(1).as("in_p"))
        .join(full.select(col("query_id"), col("vec_id"), lit(1).as("in_f")),
          Seq("query_id", "vec_id"), "full_outer")
        .groupBy("query_id")
        .agg(count(when(col("in_p").isNotNull, 1)).as("n_p"),
          count(when(col("in_p").isNotNull && col("in_f").isNotNull, 1)).as("common"))
        .agg(avg(col("common") / 10.0).as("mean_overlap"),
          min(col("common") / 10.0).as("min_overlap"),
          min("n_p").as("min_np"), max("n_p").as("max_np"))
    val adcOnly = Pq.topK(encoded, pq, model, q, 10, 4)
    time("adc-topk-count")(adcOnly.count())
    time("adc-topk-count-again")(adcOnly.count())
    val approx = Pq.topKRefined(encoded, emb, pq, model, q, 10, 200, 4)
    time("refined-200-count")(approx.count())
    time("refined-200-overlap")(overlap(approx).show(false))
    spark.stop()
  }
}
