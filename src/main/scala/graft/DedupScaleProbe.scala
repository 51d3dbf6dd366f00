package graft

import graft.functions.TextFunctions._
import graft.operators.Dedup
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (round 10; fixed round 11): measure the exact-pairwise
  * n-gram Jaccard operator's scaling CURVE and its restoring knob.
  *
  * The operator's join volume is Σ over shingles WITH df <= maxDf of
  * C(df, 2) — [[Dedup.ngramJaccard]] anti-joins heavy (df > maxDf)
  * shingles away entirely, it does not clamp them. The
  * degree-preserving replica corpus multiplies EVERY shingle's df by
  * the replication factor k (term frequencies are preserved by design),
  * so a fixed absolute cap admits per-shingle pair volumes that grow
  * ~k² right up until a shingle crosses the cap and its entire posting
  * drops — the worst case for an inverted-index quadratic verifier. (A
  * real growing corpus adds vocabulary — Heaps' law — and rare-shingle
  * dfs do NOT ride ∝N; the replica protocol is deliberately adversarial
  * here.) At 60× the volume under maxDf = 1000 exceeds local spill disk
  * and the query dies; this probe prints the volume curve vs maxDf
  * (cheap: one df aggregation, no join) and then RUNS the operator at a
  * chosen cap to show the knob restores completion.
  *
  * Round 12: also prints what the ADAPTIVE default (Dedup.adaptiveMaxDf,
  * budget = PairsPerDocBudget·|docs|) resolves to on the corpus, and
  * `runCap` accepts the literal `adaptive` to execute the operator under
  * the self-protecting default end-to-end.
  *
  * Usage: runMain graft.DedupScaleProbe <sfDir> [cap,cap,...] [runCap|adaptive]
  */
object DedupScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val caps = args.lift(1).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(17, 100, 1000))
    val runCap = args.lift(2)
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
    val nDocs = docs.count()
    // one pass: per-shingle df, then the predicted join volume per cap
    val df = docs
      .select(explode(shingleSet(col("text"), 3)).as("shingle"))
      .groupBy("shingle").agg(count(lit(1)).as("df"))
      .localCheckpoint()
    val aggs = caps.flatMap { c =>
      // Spark's `/` yields DoubleType; cast back so the collect-side
      // read is a plain getLong (round-11 ADVICE: the uncast double
      // column threw ClassCastException at row.getLong)
      Seq(sum(when(col("df") <= c, (col("df") * (col("df") - 1)) / 2)
            .otherwise(0L)).cast("long").as(s"pairs_under_$c"),
        sum(when(col("df") > c, 1L).otherwise(0L)).as(s"heavy_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    println(s"[dedupscale] $sfDir docs=$nDocs distinct_shingles=${df.count()}")
    caps.zipWithIndex.foreach { case (c, i) =>
      println(f"[dedupscale] maxDf=$c%6d  join_rows(df<=cap)=${row.getLong(2 * i)}%14d  " +
        f"heavy_shingles=${row.getLong(2 * i + 1)}%8d")
    }
    // what the self-protecting default would pick on THIS corpus
    val hist = df.where(col("df") >= 2)
      .groupBy("df").agg(count(lit(1)).as("nsh"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val adaptive = Dedup.adaptiveMaxDf(hist, nDocs)
    val adaptiveVol = hist.filter(_._1 <= adaptive)
      .map { case (d, n) => n.toDouble * d * (d - 1) / 2 }.sum
    println(f"[dedupscale] ADAPTIVE default -> maxDf=" +
      (if (adaptive == Int.MaxValue) "disabled (whole distribution fits)"
       else adaptive.toString) +
      f"  predicted_join_rows=${adaptiveVol}%.3g" +
      f"  gate=${Dedup.PairsPerDocBudget * nDocs}%d" +
      f"  capped_budget=${Dedup.CappedPairsPerDocBudget * nDocs}%d")
    runCap.foreach { cArg =>
      val t0 = System.nanoTime()
      val out =
        if (cArg == "adaptive") Dedup.ngramJaccard(docs, 3, 0.05).count()
        else Dedup.ngramJaccard(docs, 3, 0.05, maxDf = cArg.toInt).count()
      println(f"[dedupscale] RUN maxDf=$cArg%s  pairs_out=$out%12d  " +
        f"${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    spark.stop()
  }
}
