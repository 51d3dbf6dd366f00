package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity resolution: match a dirty name feed against a canonical
  * catalog by edit distance — the fuzzy generalization of
  * `QueryResolver` (reference `find_product_by_title`,
  * `Hybrid_Recom_vecdb.py:186-200`, which stops at exact/substring
  * matching and returns nothing for a typo'd title).
  *
  * The all-pairs rendering (|probes| × |catalog| levenshtein) is the
  * classic scale-killer, so this is BLOCKED resolution: candidate pairs
  * come from an equi-join on a cheap blocking key (lowercased
  * `prefixLen`-char prefix), get a length-band pre-filter (an edit
  * distance ≤ d implies |len(a) − len(b)| ≤ d), and only survivors pay
  * the levenshtein verify. Per-probe cost is the block's catalog
  * fan-out, never |catalog|.
  *
  * At 100 TB the single-prefix block inherits the stop-term hazard
  * (every "the …" title lands in one block) — the same df-capped
  * postings argument as `Dedup.ngramJaccard(maxDf)` applies: block on
  * several keys (prefix, suffix, length bucket), cap block width, and
  * let AQE split the skewed keys. The operator shape — block equi-join,
  * cheap band filter, exact verify, per-probe argmin — is what matters.
  */
object FuzzyJoin {

  /** Best catalog match per probe.
    *
    * @param probes  (probe_id, name) dirty names to resolve
    * @param catalog (cand_id, name)  canonical names
    * @param maxDist maximum accepted levenshtein distance
    * @param prefixLen blocking-prefix length (chars, lowercased);
    *                  edits inside the prefix escape the block — recall
    *                  vs cost knob, standard blocking tradeoff
    * @return (probe_id, cand_id, dist) — the (min dist, min cand_id)
    *         argmin per probe; probes with no candidate within
    *         `maxDist` are absent (unresolved).
    */
  def resolve(probes: DataFrame, catalog: DataFrame, maxDist: Int,
              prefixLen: Int = 2): DataFrame = {
    require(maxDist >= 0 && prefixLen >= 1, "maxDist >= 0, prefixLen >= 1")
    val p = probes.select(col("probe_id"), lower(col("name")).as("__pn"),
      substring(lower(col("name")), 1, prefixLen).as("__blk"),
      length(col("name")).as("__pl"))
    val c = catalog.select(col("cand_id"), lower(col("name")).as("__cn"),
      substring(lower(col("name")), 1, prefixLen).as("__blk"),
      length(col("name")).as("__cl"))
    val verified = p.join(c, Seq("__blk"))
      .where(abs(col("__pl") - col("__cl")) <= maxDist)
      .withColumn("dist", levenshtein(col("__pn"), col("__cn")).cast("long"))
      .where(col("dist") <= maxDist)
    val w = Window.partitionBy("probe_id").orderBy(col("dist"), col("cand_id"))
    verified.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .select(col("probe_id"), col("cand_id"), col("dist"))
  }
}
