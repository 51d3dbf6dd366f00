package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: time sub-plans of a query to locate where wall-clock goes.
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

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val docs = sources.Tables.documents(spark, sfDir)
    time("warmup-count")(docs.count())
    time("docs-count")(docs.count())
    val inv = docs.select(col("doc_id"),
        shingleSet(col("text"), 3).as("shingles"))
      .select(col("doc_id"), size(col("shingles")).cast("long").as("card"),
        explode(col("shingles")).as("shingle"))
    time("inv-count")(inv.count())
    val joined = inv.as("x").join(inv.as("y"), "shingle")
      .where(col("x.doc_id") < col("y.doc_id"))
    time("join-count")(joined.count())
    val agg = joined.groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("inter"),
        first(col("x.card")).as("card_a"), first(col("y.card")).as("card_b"))
    time("agg-count")(agg.count())
    time("q14-full")(SparkEntry.queries("q14_ngram_jaccard")(spark, sfDir).count())
    time("q14-again")(SparkEntry.queries("q14_ngram_jaccard")(spark, sfDir).count())
    spark.stop()
  }
}
