package graft

import graft.functions.TextFunctions._
import graft.operators.Dedup
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (round 14): stage-level timing for the adaptive ngramJaccard
  * gate regression hunt — times (a) the streaming histogram aggregation,
  * (b) the eager serialized localCheckpoint of the postings, (c) the
  * histogram read back from the checkpoint blocks, separately.
  *
  * Usage: runMain graft.GateProbe <sfDir>
  */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/scale_data/sf1")
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

    val docs = Tables.documents(spark, sfDir)
    val n = 3
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[gateprobe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val sets = docs.select(col("doc_id"),
      shingleSet(col("text"), n).as("shingles"))
    val invBase = sets
      .select(col("doc_id"), size(col("shingles")).cast("long").as("card"),
        explode(col("shingles")).as("shingle"))

    def hist(src: org.apache.spark.sql.DataFrame) = {
      val volExpr = sum(col("df").cast("double") *
        (col("df") - 1).cast("double") / lit(2.0)).as("vol")
      src.groupBy("shingle").agg(count(lit(1)).as("df"))
        .where(col("df") >= 2)
        .groupBy(when(col("df") <= 1024L, col("df"))
          .otherwise(-floor(log(2.0, col("df").cast("double"))).cast("long"))
          .as("band"))
        .agg(max("df").as("cap"), volExpr)
        .select("cap", "vol")
        .collect()
    }

    t("postings count (scan warm)")(invBase.count())
    val b1 = t("STREAMING histogram over invBase")(hist(invBase))
    println(s"[gateprobe] bands: ${b1.length}")
    val snap = t("eager SER localCheckpoint of invBase")(
      invBase.localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER))
    t("histogram from checkpoint blocks")(hist(snap))
    t("docs.count")(docs.count())

    // ---- decompose the CAPPED main plan (mirrors ngramJaccard's
    // capped branch) with per-stage row counts
    val cap = args.lift(1).map(_.toInt).getOrElse(73)
    val minJaccard = 0.05
    val inv = snap
    val heavy = inv.groupBy("shingle").agg(count(lit(1)).as("df"))
      .where(col("df") > cap).select("shingle")
    t("heavy shingle count")(println(s"  -> ${heavy.count()}"))
    val light = inv.join(heavy, Seq("shingle"), "left_anti")
    t("light postings count")(println(s"  -> ${light.count()}"))
    val cand = light.as("x").join(light.as("y"), "shingle")
      .where(col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("light_inter"),
        first(col("x.card")).as("card_a"), first(col("y.card")).as("card_b"))
    t("cand pair count")(println(s"  -> ${cand.count()}"))
    val heavyPostings = inv.join(heavy, Seq("shingle"), "left_semi")
    t("heavy postings count")(println(s"  -> ${heavyPostings.count()}"))
    val heavyCnt = heavyPostings.groupBy("doc_id").agg(count(lit(1)).as("heavy"))
    val heavySets = heavyPostings
      .groupBy("doc_id").agg(collect_list(col("shingle")).as("hs"))
    t("avg heavy set size")(heavyCnt.agg(avg("heavy"), max("heavy")).show())
    val bounded = cand
      .join(heavyCnt.select(col("doc_id").as("a"), col("heavy").as("heavy_a")),
        Seq("a"), "left")
      .join(heavyCnt.select(col("doc_id").as("b"), col("heavy").as("heavy_b")),
        Seq("b"), "left")
      .na.fill(0L, Seq("heavy_a", "heavy_b"))
      .withColumn("slack", least(col("heavy_a"), col("heavy_b")))
      .withColumn("inter_ub", col("light_inter") + col("slack"))
      .where(col("inter_ub").cast("double") /
        (col("card_a") + col("card_b") - col("inter_ub")).cast("double")
        >= minJaccard)
    t("bounded count")(println(s"  -> ${bounded.count()}"))
    t("verified-sliver count (slack>0)")(
      println(s"  -> ${bounded.where(col("slack") > 0).count()}"))
    val verified = bounded.where(col("slack") > 0)
      .join(heavySets.select(col("doc_id").as("a"), col("hs").as("hsa")), Seq("a"))
      .join(heavySets.select(col("doc_id").as("b"), col("hs").as("hsb")), Seq("b"))
      .withColumn("inter", col("light_inter") +
        size(array_intersect(col("hsa"), col("hsb"))).cast("long"))
    t("verified full (array_intersect)")(println(s"  -> ${verified.count()}"))
    val exactNow = bounded.where(col("slack") === 0)
      .withColumn("inter", col("light_inter"))
    val full = exactNow.select("a", "b", "inter", "card_a", "card_b")
      .unionByName(verified.select("a", "b", "inter", "card_a", "card_b"))
      .withColumn("jaccard", col("inter").cast("double") /
        (col("card_a") + col("card_b") - col("inter")).cast("double"))
      .where(col("jaccard") >= minJaccard)
      .select("a", "b", "inter", "card_a", "card_b", "jaccard")
    t("FULL composed single action")(println(s"  -> ${full.count()}"))
    t("operator ngramJaccard maxDf=73 explicit")(
      println(s"  -> ${Dedup.ngramJaccard(docs, 3, minJaccard, maxDf = cap).count()}"))
    spark.stop()
  }
}
