package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Seeded exact-size sampling.
  *
  * Reference: Algorithm-R reservoir sample of exactly n rows
  * (`build_random_sample`, `Hybrid_Recom_vecdb.py:102-123`) and the eval
  * query sample (`:239-245`) — both seeded, both exact-size (SURVEY R1-R3).
  *
  * Spark mapping: `orderBy(rand(seed)).limit(n)` — physically a
  * TakeOrderedAndProject: each partition keeps its local top-n by the
  * random key, the driver merges heaps. Same O(n) memory bound as the
  * reservoir, but distributed. Bit-compatibility with Python's MT19937 is
  * impossible cross-engine; parity is distributional and asserted by
  * invariants (exact size, uniqueness — SURVEY §7.4).
  */
object Sampling {

  /** Exactly min(n, |df|) uniformly sampled rows, deterministic per seed. */
  def exactSample(df: DataFrame, n: Int, seed: Long): DataFrame =
    df.orderBy(rand(seed), df.columns.map(col).head).limit(n)

  /** [[exactSample]] for corpora where the top-n merge would drown: the
    * plain form's TakeOrderedAndProject sends every partition's local
    * top-n to ONE merge point — P·n rows at P partitions, which at 100 TB
    * (P ~ 10^5) is the bottleneck. Here a map-side rand(seed) threshold
    * keeps ~n·margin candidates first, so the merge sees only survivors.
    * Because the filter and the ordering use the SAME seeded rand column,
    * the result is IDENTICAL to [[exactSample]] whenever ≥ n rows survive
    * (margin 1.5 puts the failure probability below e^{-n/20}; on the
    * impossible miss the caller sees < n rows, not a wrong sample) —
    * equality is asserted by SamplingSpec. */
  def exactSampleLarge(df: DataFrame, n: Int, seed: Long, total: Long): DataFrame = {
    val margin = 1.5
    val f = math.min(1.0, if (total <= 0) 1.0 else n * margin / total.toDouble)
    df.withColumn("__r", rand(seed))
      .where(col("__r") < f)
      .orderBy(col("__r"), df.columns.map(col).head)
      .limit(n)
      .drop("__r")
  }

  /** Deterministic stratified sample: exactly min(k, |stratum|) rows per
    * stratum, selected by md5-rank over (seed, key) — a balanced-corpus
    * builder ("k docs per language/source"), the class-rebalancing step of
    * a training-data pipeline. Selection is engine-reproducible: the rank
    * key is a pure function of (seed, key), unlike `rand(seed)` whose
    * stream depends on partition layout, so the DuckDB oracle replays the
    * IDENTICAL choice and the result hash-matches.
    *
    * Skew: one window partition per stratum would make a dominant stratum
    * (80% of a 100 TB corpus in one language) a single-task straggler.
    * Two-phase salted top-k instead: phase 1 takes k per (stratum, salt)
    * — `salts` parallel bounded heaps per stratum — phase 2 re-ranks the
    * ≤ k·salts survivors per stratum. Both windows compile to
    * WindowGroupLimit (rank pushdown: partial top-k before the sort), and
    * no partition ever holds more than the larger of |corpus|/salts and
    * k·salts rows. */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
                       k: Int, seed: Long, salts: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rank = md5(concat_ws(":", lit(seed.toString), col(keyCol).cast("string")))
    val salted = df
      .select(col(stratumCol).as("stratum"), col(keyCol).as("key"),
        rank.as("__rk"),
        pmod(crc32(col(keyCol).cast("string")), lit(salts)).as("__salt"))
    val w1 = Window.partitionBy("stratum", "__salt").orderBy(col("__rk"), col("key"))
    val w2 = Window.partitionBy("stratum").orderBy(col("__rk"), col("key"))
    salted
      .withColumn("__r1", row_number().over(w1)).where(col("__r1") <= k)
      .withColumn("rnk", row_number().over(w2)).where(col("rnk") <= k)
      .select(col("stratum"), col("key"), col("rnk"))
  }

  /** Deterministic train/val/test split — the last step before a corpus
    * ships to training. Assignment is a pure function of (seed, key):
    * bucket = hash60(seed:key) mod 100, split by cumulative percentage
    * thresholds. Pure map-side (no shuffle, no rand() — `rand(seed)`
    * depends on partition layout, so the same doc could switch splits
    * when the cluster re-partitions; the md5-derived bucket never moves,
    * and the DuckDB oracle replays the identical assignment).
    *
    * @param cuts cumulative upper bounds, e.g.
    *             Seq("train" -> 80, "val" -> 90, "test" -> 100) */
  def hashSplit(df: DataFrame, keyCol: String, seed: String,
                cuts: Seq[(String, Int)]): DataFrame = {
    require(cuts.nonEmpty && cuts.last._2 == 100 &&
      cuts.map(_._2) == cuts.map(_._2).sorted, "cuts must ascend to 100")
    val bucket = graft.functions.TextFunctions.hash60(
      concat_ws(":", lit(seed), col(keyCol).cast("string"))) % 100
    val split = cuts.init.foldRight(lit(cuts.last._1): org.apache.spark.sql.Column) {
      case ((name, hi), rest) => when(bucket < hi, name).otherwise(rest)
    }
    df.select(col(keyCol).as("key"), bucket.cast("long").as("bucket"),
      split.as("split"))
  }

  /** Exact data-mixing draw — [[stratifiedSample]] generalized to
    * per-stratum QUOTAS: the "data mixing" step that rebalances a corpus
    * to target domain/language proportions before training (quota_s docs
    * from stratum s, deterministic md5-rank selection, strata without a
    * quota dropped). Same salted two-phase shape, so a dominant stratum
    * never becomes a single-task straggler; the phase-1 window keeps the
    * LITERAL max-quota bound (WindowGroupLimit pushdown needs a
    * constant), the exact per-stratum quota filters after the broadcast
    * quota join. */
  def domainMix(df: DataFrame, stratumCol: String, keyCol: String,
                quotas: Seq[(String, Int)], seed: Long,
                salts: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val q = quotas.toDF("stratum", "quota")
    val maxK = quotas.map(_._2).max
    val rank = md5(concat_ws(":", lit(seed.toString), col(keyCol).cast("string")))
    val salted = df
      .select(col(stratumCol).as("stratum"), col(keyCol).as("key"),
        rank.as("__rk"),
        pmod(crc32(col(keyCol).cast("string")), lit(salts)).as("__salt"))
      .join(broadcast(q), Seq("stratum"))
    val w1 = Window.partitionBy("stratum", "__salt").orderBy(col("__rk"), col("key"))
    val w2 = Window.partitionBy("stratum").orderBy(col("__rk"), col("key"))
    salted
      .withColumn("__r1", row_number().over(w1))
      .where(col("__r1") <= maxK && col("__r1") <= col("quota"))
      .withColumn("rnk", row_number().over(w2)).where(col("rnk") <= col("quota"))
      .select(col("stratum"), col("key"), col("rnk"), col("quota").cast("long").as("quota"))
  }

  /** Seeded negative sampling — the contrastive-training-pair builder:
    * for each query, exactly k "negatives" drawn deterministically from
    * the corpus, excluding the query itself and its known positives.
    *
    * Scale shape: the naive form ranks |Q|·|corpus| pairs. Here every
    * corpus row is assigned ONE of `nBuckets` pools by a seeded hash of
    * its id, and a query draws only from pool `query_id mod nBuckets` —
    * an equi-join on the pool id (no broadcast required on either side),
    * so each query scans |corpus|/nBuckets candidates. The pool
    * restriction is the documented trade: negatives are uniform within a
    * 1/nBuckets slice of the corpus, which is exactly what a shared
    * random projection buys at 100 TB (FAISS-style sharded negative
    * mining uses the same trick). Within the pool, candidates rank by
    * md5(seed:query:cand) — a pure function of the pair, so any engine
    * replays the identical draw (rand(seed) would not survive a
    * repartition) — and the per-query top-k compiles to WindowGroupLimit.
    *
    * Inputs: queries(query_id), corpus(cand_id), positives(query_id,
    * cand_id). Output: (query_id, neg_id, rnk), rnk 1..k. */
  def negativeSamples(queries: DataFrame, corpus: DataFrame,
                      positives: DataFrame, k: Int, nBuckets: Int,
                      seed: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pool = corpus.select(col("cand_id"),
      pmod(graft.functions.TextFunctions.hash60(
        concat_ws(":", lit(seed), col("cand_id").cast("string"))),
        lit(nBuckets.toLong)).as("__pool"))
    val posr = positives.select(col("query_id").as("__pq"),
      col("cand_id").as("__pc"))
    val elig = queries
      .withColumn("__pool", pmod(col("query_id"), lit(nBuckets.toLong)))
      .join(pool, Seq("__pool"))
      .where(col("cand_id") =!= col("query_id"))
      .join(posr, col("query_id") === col("__pq") && col("cand_id") === col("__pc"),
        "left_anti")
    val w = Window.partitionBy("query_id")
      .orderBy(md5(concat_ws(":", lit(seed), col("query_id").cast("string"),
        col("cand_id").cast("string"))), col("cand_id"))
    elig.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select(col("query_id"), col("cand_id").as("neg_id"), col("rnk"))
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    * the top-k rows by priority u^(1/w) with u uniform per key — each
    * row's inclusion probability proportional to its weight, the
    * importance-sampling draw a curation pipeline uses to up-weight
    * high-quality documents without hard thresholds.
    *
    * Priorities compare in the log domain (ln(u)/w, same order, no
    * clustering of u^(1/w) against 1.0 for large weights) and u is the
    * md5-derived uniform (`hash60(seed:key) / 2^60`) — a pure function
    * of (seed, key) like every other draw here, so the selection is
    * partition-layout-independent and any engine replays it.
    *
    * Scale: map-side priority + global top-k = TakeOrderedAndProject
    * (per-partition bounded heaps, driver merges k·P candidates); for
    * corpora where that merge drowns, the [[exactSampleLarge]]
    * pre-filter trick applies unchanged. Non-positive weights are
    * excluded (their inclusion probability is 0 by definition).
    *
    * @return (key, weight, rnk) — rnk 1..k by descending priority. */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
                     k: Int, seed: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // u = (hash60 + 1) / 2^60 ∈ (0, 1]: the +1 guards the ~2^-60 case
    // hash60 = 0, where Spark's log(0) yields NULL (sorts last) but the
    // oracle's ln(0) raises outright — the contract is exact replay, so
    // the domain must exclude 0 on BOTH sides (round-5 advice).
    val u = (graft.functions.TextFunctions.hash60(
      concat_ws(":", lit(seed), col(keyCol).cast("string"))) + lit(1L))
      .cast("double") / lit(1152921504606846976L).cast("double") // 2^60
    val top = df.where(col(weightCol) > 0)
      .select(col(keyCol).as("key"), col(weightCol).as("weight"),
        (log(u) / col(weightCol)).as("__es"))
      .orderBy(col("__es").desc, col("key"))
      .limit(k)
    top.withColumn("rnk",
        row_number().over(Window.orderBy(col("__es").desc, col("key"))))
      .select(col("key"), col("weight"), col("rnk"))
  }

  /** Invariant summary used by the correctness harness: the sample's size,
    * key-distinctness and key-range containment — properties a seeded
    * sample must satisfy regardless of which rows the seed picked. */
  def sampleInvariants(df: DataFrame, keyCol: String, n: Int, seed: Long): DataFrame = {
    val s = exactSample(df, n, seed)
    val bounds = df.agg(min(col(keyCol)).as("lo"), max(col(keyCol)).as("hi"))
    s.agg(count(lit(1)).as("n_rows"),
        countDistinct(col(keyCol)).as("n_distinct"),
        min(col(keyCol)).as("s_lo"), max(col(keyCol)).as("s_hi"))
      .crossJoin(bounds.hint("broadcast"))
      .select(col("n_rows"), col("n_distinct"),
        (col("s_lo") >= col("lo") && col("s_hi") <= col("hi")).as("in_range"))
  }
}
