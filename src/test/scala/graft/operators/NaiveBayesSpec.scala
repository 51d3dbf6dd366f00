package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** NB learns planted vocabularies; scoring is deterministic. */
class NaiveBayesSpec extends SparkTestBase {

  import spark.implicits._

  private def planted = {
    val en = Seq("the cat sat on the mat", "the dog ate the bone",
      "a cat and a dog", "the bird sang a song")
    val de = Seq("der hund und die katze", "die katze schlief gut",
      "der vogel sang ein lied", "ein hund ohne knochen")
    (en.zipWithIndex.map { case (t, i) => (i.toLong, t, "en") } ++
      de.zipWithIndex.map { case (t, i) => (100L + i, t, "de") })
      .toDF("doc_id", "text", "lang")
  }

  test("classify: distinct vocabularies classify perfectly") {
    val test = Seq((500L, "the cat and the dog sat", "en"),
      (501L, "die katze und der hund", "de")).toDF("doc_id", "text", "lang")
    val out = NaiveBayes.classify(planted, test, "doc_id", "text", "lang")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(3))))
      .toMap
    assert(out(500L) == (("en", true)))
    assert(out(501L) == (("de", true)))
  }

  test("OOV-only documents fall back to the prior (majority class)") {
    // train 3 en vs 1 de: an all-unseen-token doc must get the larger
    // prior since every class scores the same Laplace floor per token
    val train = Seq((1L, "alpha beta gamma", "en"), (2L, "beta gamma", "en"),
      (3L, "gamma alpha", "en"), (4L, "zeta eta", "de"))
      .toDF("doc_id", "text", "lang")
    val test = Seq((9L, "qqq www", "de")).toDF("doc_id", "text", "lang")
    val out = NaiveBayes.classify(train, test, "doc_id", "text", "lang")
      .collect()
    // prior favors en (3/4) but de's token total is smaller, so the
    // Laplace floor ln(1/(T_c+V)) differs per class: compute the margin
    // explicitly rather than assuming — en: T=7,V=5 -> ln(1/12); de:
    // T=2,V=5 -> ln(1/7). de floor is LARGER; 2 tokens give de
    // 2*(ln(1/7)-ln(1/12)) ≈ 1.08 vs prior gap ln(3)-ln(1) ≈ 1.10 -> en
    assert(out(0).getString(1) == "en")
  }

  test("repeated test tokens fold as mult x snapped-long, equal to per-occurrence scoring") {
    // 'the' appears 3x in the test doc: the mult-weighted fold must score
    // it identically to three separate occurrence rows. Compare against a
    // per-occurrence replica: duplicate each token into its own one-token
    // doc sharing the same id is NOT equivalent (dl-free model, but
    // priors count docs), so instead assert the stronger invariant the
    // fold relies on: the predicted class and correctness of a
    // repetition-heavy doc are stable under token order permutation
    // (sum of identical longs is order-free and multiplicity-exact).
    val test = Seq((600L, "the the the cat katze", "en"),
      (601L, "katze the the the cat", "en"),
      // the discriminating pair: priors are equal (4 docs each), and
      // with the planted counts (katze: de 2+1/43, en 0+1/46; the:
      // en 5+1/46, de 0+1/43) 'katze katze the' scores de −9.09 vs
      // en −9.69 ONLY when tf is honored — clamp tf to 1 (the
      // multiplicity bug this test exists to catch) and the distinct
      // set {katze, the} flips it to en (−5.87 vs −6.42)
      (700L, "katze katze the", "de"),
      (701L, "the katze katze", "de")).toDF("doc_id", "text", "lang")
    val out = NaiveBayes.classify(planted, test, "doc_id", "text", "lang")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(600L) == out(601L))
    assert(out(600L) == "en") // 3x 'the' (en-heavy) must outvote 1x 'katze'
    assert(out(700L) == "de") // multiplicity-sensitive: en if tf clamped
    assert(out(701L) == out(700L))
  }

  test("classification is partition-invariant (fixed-point log sums)") {
    val test = Seq((500L, "the cat sat", "en"), (501L, "der hund", "de"),
      (502L, "cat katze dog hund", "en")).toDF("doc_id", "text", "lang")
    val a = NaiveBayes.classify(planted.repartition(1), test.repartition(1),
      "doc_id", "text", "lang").collect().map(_.toString).sorted
    val b = NaiveBayes.classify(planted.repartition(7), test.repartition(3),
      "doc_id", "text", "lang").collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
