package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Diversity-aware rerank of retrieved candidates — Maximal Marginal
  * Relevance (Carbonell & Goldstein, SIGIR'98).
  *
  * The reference serves its top-n by blended score alone
  * (`recommend_hybrid`, `Hybrid_Recom_vecdb.py:200-235`), so near-identical
  * items (co-edition products, reprints) crowd the list. MMR greedily picks
  *   argmax over remaining c of  λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s)
  * trading relevance against redundancy with what is already selected.
  *
  * Spark shape: this is a SERVE-TIME operator over an already-retrieved
  * pool — per query at most n candidates (n ≤ 60, bounded by retrieval
  * depth), never the corpus. The pairwise n² term is computed relationally
  * (codegen'd cosine, one self-equi-join on query_id), then one shuffle
  * groups each query's pool and the greedy O(k·n) selection runs in
  * `flatMapGroups` — the idiomatic home for tiny sequential per-group
  * state. At 100 TB the cost scales with |Q|·n², independent of corpus
  * size, and partitions by query_id with no skew (every group ≤ n rows).
  *
  * Determinism contract: `rel` and the pairwise sims snap to 1e-6 BEFORE
  * selection, scores combine them with fixed IEEE ops (λ·rel − (1−λ)·
  * maxsim, the complement computed as 1.0−λ in doubles, NOT a decimal
  * literal), and ties break on item id via a strict `>` over an
  * item-ascending pool — so the greedy trace replays bit-exactly on any
  * engine from the same rounded inputs.
  */
object Rerank {

  /** One MMR selection: `rnk` is 1-based pick order, `mmr` the raw
    * (unrounded) greedy score — callers round for display. */
  final case class MmrPick(query_id: Long, item: Long, rnk: Int, mmr: Double)

  /** One interleaved slot: `pos` is 1-based, `team` the ranker whose
    * pick filled it ("A"/"B"). */
  final case class DraftPick(query_id: Long, pos: Int, item: Long,
                             team: String)

  /** Deterministic per-(query, position) coin from the engine-shared
    * md5 hash: 0 → team A drafts first on a tie. */
  def draftCoin(queryId: Long, pos: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"td:$queryId:$pos".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    (java.lang.Long.parseLong(hex, 16) % 2).toInt
  }

  /** Team-draft interleaving (Radlinski et al., CIKM'08) — the online
    * A/B primitive for comparing two rankers on LIVE traffic: users see
    * ONE merged list; each slot remembers which ranker drafted it, and
    * click credit per team decides the winner without splitting traffic.
    *
    * Draft rule per slot: the team with fewer picks drafts; on a tie the
    * seeded coin decides; the drafting team contributes its highest-
    * ranked not-yet-selected item, falling back to the other team when
    * its pool is exhausted (credit goes to the team that actually
    * supplied the item). Every input — ranks, tie coins — is
    * deterministic, so the merged list replays bit-exactly on any
    * engine (the oracle unrolls the draft like the MMR argmax).
    *
    * Same serve-time shape as [[mmr]]: pools are retrieval-depth-bounded,
    * one shuffle groups each query, the O(k) draft runs per group.
    *
    * @param a (query_id, item, rnk) ranker A's list, rnk 1-based
    * @param b (query_id, item, rnk) ranker B's list
    * @return (query_id, pos, item, team) — pos 1..k merged order.
    */
  def teamDraft(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    val tagged = a.select(col("query_id").cast("long"),
        col("item").cast("long"), col("rnk").cast("int"), lit("A").as("t"))
      .unionByName(b.select(col("query_id").cast("long"),
        col("item").cast("long"), col("rnk").cast("int"), lit("B").as("t")))
    tagged.groupByKey(_.getLong(0)).flatMapGroups { (qid, rows) =>
      val all = rows.map(r => (r.getLong(1), r.getInt(2), r.getString(3)))
        .toArray
      val listA = all.filter(_._3 == "A").sortBy(_._2).map(_._1)
      val listB = all.filter(_._3 == "B").sortBy(_._2).map(_._1)
      val seen = scala.collection.mutable.HashSet.empty[Long]
      val out = scala.collection.mutable.ArrayBuffer.empty[DraftPick]
      var ia = 0; var ib = 0; var ca = 0; var cb = 0
      while (out.size < k && (ia < listA.length || ib < listB.length)) {
        while (ia < listA.length && seen(listA(ia))) ia += 1
        while (ib < listB.length && seen(listB(ib))) ib += 1
        val aAvail = ia < listA.length
        val bAvail = ib < listB.length
        if (!aAvail && !bAvail) {
          ia = listA.length; ib = listB.length // drained: exit
        } else {
          val prefA =
            if (ca < cb) true else if (cb < ca) false
            else draftCoin(qid, out.size + 1) == 0
          val pickA = if (prefA) aAvail else !bAvail
          val item = if (pickA) listA(ia) else listB(ib)
          if (pickA) ca += 1 else cb += 1
          seen += item
          out += DraftPick(qid, out.size + 1, item, if (pickA) "A" else "B")
        }
      }
      out
    }.toDF()
  }

  /** Greedy MMR top-k per query.
    *
    * Pool-size contract: the pairwise sim list below is O(pool²) PER
    * QUERY (struct list of every co-candidate). That is safe only
    * because the pool is a RETRIEVED candidate set — bounded by
    * content_top_n + cf_top_n (≤60/query in q116), never a data-scale
    * set. `maxPool` enforces the bound in-plan: a caller that feeds an
    * unbounded frame gets its per-query pool cut to the top-`maxPool`
    * by retrieval score (deterministic item tiebreak) BEFORE the
    * quadratic join, so the worst case is pool²=64k sim entries per
    * query, not |data|².
    *
    * @param candidates (query_id, item, rel, embedding) — the retrieved
    *                   pool; `rel` is the retrieval score (any scale).
    * @param maxPool    defensive per-query pool cap ahead of the O(pool²)
    *                   pairwise stage; 256 ≫ any configured
    *                   content_top_n + cf_top_n.
    * @return (query_id, item, rnk, mmr) with rnk = 1..k selection order.
    */
  def mmr(candidates: DataFrame, k: Int, lambda: Double = 0.7,
          maxPool: Int = 256): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    // floor-snap (not round(,6)): the trace inputs need the same pure-
    // IEEE grid as the displayed score — round()'s decimal re-parse can
    // fork from DuckDB's float round at a 7th-digit half and would then
    // fork the whole greedy trace, not just a printed value
    val snap6 = (c: Column) => floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    val candAll = candidates.select(
      col("query_id").cast("long").as("query_id"),
      col("item").cast("long").as("item"), snap6(col("rel")).as("rel"),
      col("embedding"))
    // enforce the pool contract before anything quadratic; WindowGroupLimit
    // keeps this a single-exchange top-k, and at the contracted pool size
    // (≤60 < maxPool) it selects every row — q116 results are unchanged
    val cand = candAll
      .withColumn("__pr", row_number().over(org.apache.spark.sql.expressions
        .Window.partitionBy("query_id")
        .orderBy(col("rel").desc, col("item"))))
      .where(col("__pr") <= maxPool).drop("__pr")
    // pairwise candidate-candidate sims, snapped to the contract grid
    val a = cand.select(col("query_id").as("qa"), col("item").as("i"),
      col("embedding").as("va"))
    val b = cand.select(col("query_id").as("qb"), col("item").as("j"),
      col("embedding").as("vb"))
    val simAgg = a.join(b, col("qa") === col("qb") && col("i") =!= col("j"))
      .select(col("qa"), col("i"),
        struct(col("j"),
          snap6(graft.functions.VectorFunctions.cosine(col("va"), col("vb")))
            .as("sim")).as("js"))
      .groupBy(col("qa"), col("i")).agg(collect_list("js").as("sims"))
    val withSims = cand.drop("embedding")
      .join(simAgg, col("query_id") === col("qa") && col("item") === col("i"),
        "left")
      .select(col("query_id"), col("item"), col("rel"), col("sims"))

    val mu = 1.0 - lambda
    withSims.groupByKey(_.getLong(0)).flatMapGroups { (qid, rows) =>
      // (item, rel, simTo): simTo maps co-candidate -> rounded cosine
      val pool = rows.map { r =>
        val simTo = if (r.isNullAt(3)) Map.empty[Long, Double]
          else r.getSeq[Row](3).map(s => s.getLong(0) -> s.getDouble(1)).toMap
        (r.getLong(1), r.getDouble(2), simTo)
      }.toArray.sortBy(_._1)
      val selected = scala.collection.mutable.ArrayBuffer.empty[Long]
      val out = scala.collection.mutable.ArrayBuffer.empty[MmrPick]
      while (out.size < k && selected.size < pool.length) {
        var bestItem = -1L; var bestScore = Double.NegativeInfinity
        pool.foreach { case (item, rel, simTo) =>
          if (!selected.contains(item)) {
            val maxSim =
              if (selected.isEmpty) 0.0
              else selected.map(s => simTo.getOrElse(s, 0.0)).max
            val score = lambda * rel - mu * maxSim
            // strict >: pool is item-ascending, so ties keep the lowest id
            if (score > bestScore) { bestScore = score; bestItem = item }
          }
        }
        selected += bestItem
        out += MmrPick(qid, bestItem, selected.size, bestScore)
      }
      out
    }.toDF()
  }
}
