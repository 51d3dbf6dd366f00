package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A/B experiment readout with CUPED variance reduction (Deng et al.,
  * WSDM'13): adjust each unit's post-period metric y by its pre-period
  * covariate x — y' = y − θ·(x − x̄), θ = cov(x,y)/var(x) — removing the
  * between-user variance both arms share, which is what lets an
  * experiment platform call smaller lifts at the same traffic.
  *
  * Exactness: inputs arrive as pre-snapped integer units (cents), so
  * all sufficient statistics (n, Σx, Σy, Σx², Σxy, per-arm sums) are
  * DECIMAL(38,0)-exact and partition-invariant; θ, x̄ and the per-arm
  * means are a fixed handful of double ops both engines replay
  * bit-identically.
  *
  * Scale: one groupBy(unit) over the event stream (the only big-data
  * step, map-side combinable), then everything runs on |units| rows and
  * two tiny aggregates broadcast into the two-row readout.
  */
object Experiment {

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  /** @param perUnit (arm, xs, ys) — integer-unit pre/post metrics
    * @param displayScale divide-out for the final means (100 = cents)
    * @return one row per arm: (arm, n_units, mean_y, adj_mean, theta) */
  def cuped(perUnit: DataFrame, displayScale: Double = 100.0): DataFrame = {
    // Widen to DECIMAL(38,0) BEFORE multiplying: a LONG product of
    // unbounded per-unit cent sums would wrap silently past ~3e9 units
    // while the oracle's HUGEINT product stays exact (round-5 advice).
    val g = perUnit.agg(dec(count(lit(1))).as("n"),
      sum(dec(col("xs"))).as("sx"), sum(dec(col("ys"))).as("sy"),
      sum((dec(col("xs")) * dec(col("xs"))).cast("decimal(38,0)")).as("sxx"),
      sum((dec(col("xs")) * dec(col("ys"))).cast("decimal(38,0)")).as("sxy"))
    val th = g.select(
      ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
        .as("theta"),
      (col("sx").cast("double") / col("n").cast("double")).as("xbar"))
    val arms = perUnit.groupBy("arm")
      .agg(count(lit(1)).as("n_units"),
        sum(col("xs")).as("sax"), sum(col("ys")).as("say"))
    arms.crossJoin(broadcast(th))
      .select(col("arm"), col("n_units"),
        ((col("say").cast("double") / col("n_units").cast("double")) /
          lit(displayScale)).as("mean_y"),
        (((col("say").cast("double") / col("n_units").cast("double")) -
          col("theta") *
            ((col("sax").cast("double") / col("n_units").cast("double")) -
              col("xbar"))) / lit(displayScale)).as("adj_mean"),
        col("theta"))
  }

  /** Inverse-propensity-score (IPS) offline replay — evaluate a
    * DETERMINISTIC target policy ("per segment, play the action with
    * the highest logged mean reward") against a log whose declared
    * behavior policy was uniform over `nActions` arms, without ever
    * deploying it. V̂_IPS(s) = (1/n_s)·Σ_{aᵢ=π(s)} rᵢ/p with p = 1/n_A
    * — the offline sibling of team-draft interleaving (q137): that
    * compares rankers online, this replays a counterfactual policy from
    * the log alone.
    *
    * With a deterministic π the matched set is exactly the (segment,
    * π(s)) cell, so the estimate collapses to closed form
    * n_A·Σr_cell/n_s — every input an exact integer fold, the final
    * expression one division both engines replay identically. The
    * argmax tie-breaks toward the lexicographically larger action
    * (explicit window order), so the policy is reproducible.
    *
    * Shape: one (segment, action) hash aggregate (map-side combined),
    * a segment-keyed rank over the ≤|segments|·n_A cell frame, one
    * broadcast-sized join back. Nothing touches raw rows twice.
    *
    * @return (segment, n_log, target_action, n_matched, v_logged,
    *         v_ips) — values in cents at 6 dp. */
  def ipsReplay(log: DataFrame, segCol: String, actionCol: String,
                rewardCentsCol: String, nActions: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = log.groupBy(col(segCol).as("segment"),
        col(actionCol).as("action"))
      .agg(count(lit(1)).as("n_cell"), sum(col(rewardCentsCol)).as("r_cell"))
    val w = Window.partitionBy("segment")
      .orderBy((col("r_cell").cast("double") / col("n_cell").cast("double"))
        .desc, col("action").desc)
    val best = cells.withColumn("__rk", row_number().over(w))
      .where(col("__rk") === 1)
      .select(col("segment"), col("action").as("target_action"),
        col("n_cell").as("n_matched"), col("r_cell").as("__r_best"))
    val segs = cells.groupBy("segment")
      .agg(sum(col("n_cell")).as("n_log"), sum(col("r_cell")).as("__r_log"))
    segs.join(best, Seq("segment"))
      .select(col("segment"), col("n_log"), col("target_action"),
        col("n_matched"),
        round(col("__r_log").cast("double") / col("n_log").cast("double"),
          6).as("v_logged"),
        round(lit(nActions) * col("__r_best").cast("double")
          / col("n_log").cast("double"), 6).as("v_ips"))
  }

  /** Wald's sequential probability ratio test (SPRT, 1945) — the
    * early-stopping layer an experiment platform runs so a clearly
    * winning (or hopeless) treatment stops burning traffic: after every
    * observation the Bernoulli log-likelihood ratio
    * LLR_t = Σ x_i·ln(p1/p0) + (1−x_i)·ln((1−p1)/(1−p0)) is compared
    * against ln((1−β)/α) (accept H1: rate ≥ p1) and ln(β/(1−α))
    * (accept H0: rate ≤ p0); first crossing decides.
    *
    * Exactness (the DCG nano-weight trick): both per-observation log
    * terms and both thresholds snap to 1e-9 units in the DRIVER and
    * enter Spark and the oracle as the SAME integer literals, so the
    * running LLR is an exact long prefix sum and the crossing index is
    * integer-deterministic — no float accumulation anywhere.
    *
    * Shape: one window prefix-sum per segment over (orderCol, tieCol)
    * — the sequential scan is per-SEGMENT (an experiment's observation
    * stream), so segments parallelize and nothing global sorts; the
    * readout is one aggregate over the flagged frame.
    *
    * @param obs (segCol, outcomeCol 0/1, orderCol, tieCol)
    * @return per segment: (segment, n_obs, n_pos, decision,
    *         first_cross_step, llr_final) — decision ∈
    *         {accept_h1, accept_h0, continue}; llr_final in nats, 6 dp */
  def sprt(obs: DataFrame, segCol: String, outcomeCol: String,
           orderCol: String, tieCol: String,
           p0: Double, p1: Double,
           alpha: Double = 0.05, beta: Double = 0.05): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w1 = math.round(math.log(p1 / p0) * 1e9)            // win term
    val w0 = math.round(math.log((1 - p1) / (1 - p0)) * 1e9) // loss term
    val hi = math.round(math.log((1 - beta) / alpha) * 1e9)  // accept H1
    val lo = math.round(math.log(beta / (1 - alpha)) * 1e9)  // accept H0
    val seq = Window.partitionBy("segment")
      .orderBy(col(orderCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val run = obs.select(col(segCol).as("segment"),
        col(outcomeCol).cast("long").as("x"), col(orderCol), col(tieCol))
      .withColumn("__llr", sum(
        when(col("x") === 1, lit(w1)).otherwise(lit(w0))).over(seq))
      .withColumn("__step", count(lit(1)).over(seq))
      .withColumn("__cross",
        when(col("__llr") >= hi || col("__llr") <= lo, col("__step")))
    run.groupBy("segment")
      .agg(count(lit(1)).as("n_obs"), sum(col("x")).as("n_pos"),
        // struct-min on (step, llr): the LLR AT the first crossing —
        // a later opposite-boundary crossing must not flip the verdict
        min(when(col("__cross").isNotNull,
          struct(col("__step"), col("__llr")))).as("__fc"),
        max(struct(col("__step"), col("__llr"))).as("__last"))
      .select(col("segment"), col("n_obs"), col("n_pos"),
        when(col("__fc").isNull, lit("continue"))
          .otherwise(when(col("__fc.__llr") >= lit(hi), lit("accept_h1"))
            .otherwise(lit("accept_h0"))).as("decision"),
        col("__fc.__step").as("first_cross_step"),
        round(col("__last.__llr").cast("double") / 1e9, 6).as("llr_final"))
  }

  /** Difference-in-differences (the canonical quasi-experimental
    * estimator): when a change ships to a treated population at a known
    * cutover while a control population stays put, the causal lift
    * estimate is (ΔT) − (ΔC) = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post −
    * ȳ_C,pre) — the control differences out the common time trend that
    * a naive before/after comparison absorbs.
    *
    * Exactness: cents are exact longs, each cell's (n, Σ) folds
    * map-side, and the four means + DiD are a fixed handful of double
    * ops both engines replay identically. Shape: ONE 4-cell hash
    * aggregate over the stream — nothing else.
    *
    * @param df (treatedCol boolean, postCol boolean, centsCol long)
    * @return one row per (treated, post) cell: (treated, post, n,
    *         mean_cents, did) — did repeated on each row, 6 dp. */
  def diffInDiff(df: DataFrame, treatedCol: String, postCol: String,
                 centsCol: String): DataFrame = {
    val cells = df.groupBy(col(treatedCol).as("treated"),
        col(postCol).as("post"))
      .agg(count(lit(1)).as("n"), sum(col(centsCol)).as("s"))
      .withColumn("mean_cents",
        round(col("s").cast("double") / col("n").cast("double"), 6))
    def m(t: Boolean, p: Boolean): Column =
      max(when(col("treated") === t && col("post") === p, col("mean_cents")))
    val did = cells.agg(
      round(m(true, true) - m(true, false) - (m(false, true) - m(false, false)),
        6).as("did"))
    cells.crossJoin(broadcast(did))
      .select(col("treated"), col("post"), col("n"), col("mean_cents"),
        col("did"))
  }
}
