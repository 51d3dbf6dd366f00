package graft

import graft.operators._
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage timing for q33 at a scale factor.
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

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val sub = Tables.embeddings(spark, sfDir).where(col("vec_id") < 2000)
    time("warm")(sub.count())
    val model = time("fit")(BrpLsh.fit(sub, 0.5, 4))
    val brp = time("pairs-plan")(BrpLsh.cosinePairs(model, sub, 0.35))
    time("pairs-count")(brp.count())
    val exact = Dedup.cosinePairs(sub, 0.35)
    time("exact-count")(exact.count())
    val digest = brp.select(col("a"), col("b"), col("sim"), lit(1).as("in_brp"))
      .join(exact.select(col("a"), col("b"), lit(1).as("in_exact")),
        Seq("a", "b"), "full_outer")
      .agg(sum(coalesce(col("in_exact"), lit(0))).as("n_exact"),
        sum(coalesce(col("in_brp"), lit(0))).as("n_brp"))
    time("digest-count")(digest.count())
    time("q33-full")(SparkEntry.queries("q33_brp_pairs")(spark, sfDir).count())
    spark.stop()
  }
}
