package graft

import graft.functions.TextFunctions
import graft.operators.Bm25
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool: same-JVM alternating A/B of the Bm25.topK shape — OLD
  * (3-pass: postings rebuilt for df + scoring, stats re-tokenize) vs
  * NEW (postings checkpointed once, stats folded from tf). Host noise
  * cancels across alternation. Usage: runMain graft.BmProbe <sfDir> [rounds] */
object BmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // the r7-shape topK, verbatim (pre-checkpoint, 3 corpus passes)
    def oldTopK(docs: DataFrame, queries: DataFrame, k: Int): DataFrame = {
      val k1 = Bm25.K1; val b = Bm25.B
      val post = docs.select(col("doc_id"),
          explode(TextFunctions.tokens(col("text"))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .withColumn("dl", sum(col("tf")).over(Window.partitionBy("doc_id")))
      val stats = docs.select(size(TextFunctions.tokens(col("text"))).cast("long").as("__dl"))
        .agg(count(lit(1)).as("n_docs"),
          (sum(col("__dl")).cast("double") / count(lit(1))).as("avgdl"))
      val df = post.groupBy("term").agg(count(lit(1)).as("df"))
      val qterms = queries.select(col("query_id"),
        explode(array_distinct(TextFunctions.tokens(col("query_text")))).as("term"))
      val perTerm = post.join(df, Seq("term"))
        .join(broadcast(qterms), Seq("term"))
        .crossJoin(broadcast(stats))
        .withColumn("idf",
          log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
        .withColumn("contrib",
          col("idf") * (col("tf") * (k1 + 1.0)) /
            (col("tf") + lit(k1) * (lit(1.0 - b) + (lit(b) * col("dl")) / col("avgdl"))))
      val scored = perTerm.groupBy("query_id", "doc_id")
        .agg((sum(floor(col("contrib") * 1e9 + 0.5).cast("long")) / 1e9).as("__s"))
      val w = Window.partitionBy("query_id").orderBy(col("__s").desc, col("doc_id").asc)
      scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
        .select(col("query_id"), col("doc_id"), round(col("__s"), 6).as("score"), col("rnk"))
    }

    val docs = Tables.documents(spark, sfDir)
    val queries = Seq(("kq1", "spark join fast"), ("kq2", "vector table scan"),
      ("kq3", "stream window agg")).toDF("query_id", "query_text")
    docs.count() // warm the scan

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def reap(): Unit = {
      val sc = spark.sparkContext
      sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }
    // equality gate first
    val a = oldTopK(docs, queries, 10).orderBy("query_id", "rnk").collect().toSeq
    val b0 = Bm25.topK(docs, queries, 10).orderBy("query_id", "rnk").collect().toSeq
    reap()
    println(s"[bmprobe] outputs identical: ${a == b0}")
    for (i <- 1 to rounds) {
      val tOld = time(oldTopK(docs, queries, 10).count()); reap()
      val tNew = time(Bm25.topK(docs, queries, 10).count()); reap()
      println(f"[bmprobe] round $i  old $tOld%6.2f s   new $tNew%6.2f s")
    }
    spark.stop()
  }
}
