package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classifier — distributed ML training as
  * PURE relational algebra: the "model" is two count tables (per-class
  * token counts + class priors), training is one groupBy over the train
  * split, and inference is a token⋈model join with a per-document log
  * sum. Nothing iterates; a 100 TB corpus trains in exactly one shuffle
  * plus one broadcast of the (vocabulary-sized) count table.
  *
  * Exactness: every count is an exact integer; each token's Laplace
  * log-likelihood ln((c+1)/(T+V)) is ONE double division + ln on
  * integer-derived values, snapped to 1e-9 fixed point BEFORE the
  * per-document summation (the bm25/q85 discipline) — so document
  * scores are exact longs, the argmax is deterministic (score DESC,
  * class ASC), and any engine replays the prediction bit-for-bit.
  */
object NaiveBayes {

  /** Train on `train` (idCol, textCol, classCol), classify `test`;
    * returns per-test-doc (idCol, pred, actual, correct).
    *
    * OOV handling: a test token absent from a class's train counts
    * scores the Laplace floor ln(1/(T_c+V)) — which DIFFERS per class
    * (smaller token totals give a higher floor), so even fully-unseen
    * tokens shift classes unequally and participate in the argmax; that
    * is the standard multinomial-NB behavior, and it is why no vocab
    * semi-join "optimization" may drop them. */
  def classify(train: DataFrame, test: DataFrame, idCol: String,
               textCol: String, classCol: String): DataFrame = {
    // per-doc token multiplicities are map-side (TermCounts — docs are
    // one row each); only the distinct (doc, tok) rows reach the
    // class-level merge instead of one row per token occurrence
    val trainToks = train.select(col(classCol).as("cls"),
      explode(TextFunctions.termCounts(
        TextFunctions.tokens(col(textCol)))).as("tc"))
    val counts = trainToks.groupBy(col("cls"), col("tc.term").as("tok"))
      .agg(sum(col("tc.tf")).as("c"))
    val totals = counts.groupBy("cls").agg(sum("c").as("t"))
    val vocab = counts.select("tok").distinct()
      .agg(count(lit(1)).as("v"))
    val priors = train.groupBy(col(classCol).as("cls"))
      .agg(count(lit(1)).as("nd"))
      .crossJoin(broadcast(train.agg(count(lit(1)).as("ntot"))))
    // per-class additive constants: ln prior, snapped
    val classConst = priors.join(totals, Seq("cls")).crossJoin(broadcast(vocab))
      .select(col("cls"), col("t"), col("v"),
        floor(log(col("nd").cast("double") / col("ntot").cast("double"))
          * lit(1e9) + lit(0.5)).cast("long").as("prior_n"))
    val testToks = test.select(col(idCol), col(classCol).as("actual"),
        explode(TextFunctions.termCounts(
          TextFunctions.tokens(col(textCol)))).as("tc"))
      .select(col(idCol), col("actual"),
        col("tc.term").as("tok"), col("tc.tf").as("mult"))
    // every DISTINCT test token meets every class: left join the count
    // table so unseen (class, token) pairs fall back to the Laplace
    // floor. Multiplicity folds as mult·ll_n — a sum of `mult` copies of
    // the IDENTICAL snapped long, so the document score is bit-equal to
    // the per-occurrence sum it replaces.
    val scoredToks = testToks
      .join(broadcast(classConst.select("cls", "t", "v")))
      .join(counts, Seq("cls", "tok"), "left_outer")
      .select(col(idCol), col("actual"), col("cls"),
        (col("mult") * floor(log((coalesce(col("c"), lit(0L)) + lit(1L)).cast("double") /
          (col("t") + col("v")).cast("double")) * lit(1e9) + lit(0.5))
          .cast("long")).as("ll_n"))
    val docScores = scoredToks.groupBy(col(idCol), col("actual"), col("cls"))
      .agg(sum("ll_n").as("ll_sum"))
      .join(broadcast(classConst.select("cls", "prior_n")), Seq("cls"))
      .withColumn("score_n", col("ll_sum") + col("prior_n"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score_n").desc, col("cls").asc)
    docScores.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col(idCol), col("cls").as("pred"), col("actual"),
        (col("cls") === col("actual")).as("correct"))
  }
}
