package graft.operators

import graft.SparkTestBase

/** rankMetrics on hand-computed cases: NDCG position weighting, MRR
  * first-hit semantics, recall denominators, empty-truth guard. */
class EvaluationSpec extends SparkTestBase {

  import spark.implicits._

  test("perfect ranking: all metrics 1 when top-k is exactly the truth") {
    val ranked = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("query_id", "item", "rnk")
    val truth = Seq((1L, 10L), (1L, 11L), (1L, 12L)).toDF("query_id", "item")
    val r = Evaluation.rankMetrics(ranked, truth).collect()(0)
    assert(r.getLong(r.fieldIndex("n_rel")) == 3L)
    assert(r.getDouble(r.fieldIndex("ndcg10")) == 1.0)
    assert(r.getDouble(r.fieldIndex("mrr")) == 1.0)
    assert(r.getDouble(r.fieldIndex("recall10")) == 1.0)
  }

  test("single hit at rank 3: ndcg = w3/w1, mrr = 1/3") {
    val ranked = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("query_id", "item", "rnk")
    val truth = Seq((1L, 12L)).toDF("query_id", "item")
    val r = Evaluation.rankMetrics(ranked, truth).collect()(0)
    // idcg for n_rel=1 is w1=1e9; dcg = w3=5e8 -> ndcg .5
    assert(r.getDouble(r.fieldIndex("ndcg10")) == 0.5)
    assert(r.getDouble(r.fieldIndex("mrr")) == 0.333333)
    assert(r.getDouble(r.fieldIndex("recall10")) == 1.0)
  }

  test("hit at rank 2 with n_rel=2: ndcg uses the 2-deep ideal prefix") {
    val ranked = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("query_id", "item", "rnk")
    val truth = Seq((1L, 11L), (1L, 99L)).toDF("query_id", "item")
    val r = Evaluation.rankMetrics(ranked, truth).collect()(0)
    // dcg = w2; idcg = w1 + w2
    val expect = BigDecimal(630929754.0 / (1000000000L + 630929754L))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(r.fieldIndex("ndcg10")) == expect)
    assert(r.getDouble(r.fieldIndex("recall10")) == 0.5)
  }

  test("no truth for the query: metrics are 0, not null") {
    val ranked = Seq((1L, 10L, 1)).toDF("query_id", "item", "rnk")
    val truth = Seq((2L, 10L)).toDF("query_id", "item")
    val r = Evaluation.rankMetrics(ranked, truth).collect()(0)
    assert(r.getLong(r.fieldIndex("n_rel")) == 0L)
    assert(r.getDouble(r.fieldIndex("ndcg10")) == 0.0)
    assert(r.getDouble(r.fieldIndex("mrr")) == 0.0)
    assert(r.getDouble(r.fieldIndex("recall10")) == 0.0)
  }

  test("reliabilityBins: a perfectly calibrated scorer sits on the diagonal") {
    import spark.implicits._
    // 100 rows, score = i/100; positives planted so bin k has k/10 rate:
    // row i positive iff (i mod 10) < ceil(i/10 / 1) * ... simpler: make
    // positives the top-half scores: top 5 bins rate 1, bottom 5 rate 0
    val scored = (1 to 100).map(i => (1L, i.toLong, i / 100.0))
      .toDF("query_id", "item", "score")
    val truth = (51 to 100).map(i => (1L, i.toLong)).toDF("query_id", "item")
    val out = Evaluation.reliabilityBins(scored, truth, 10).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(4))))
      .toMap
    assert(out.size == 10)
    assert(out.values.forall(_._1 == 10L)) // equal-frequency: 10 each
    (1 to 5).foreach(b => assert(out(b)._3 == 0.0, s"bin $b"))
    (6 to 10).foreach(b => assert(out(b)._3 == 1.0, s"bin $b"))
    // mean score of bin 1 = mean(0.01..0.10) = 0.055 exactly (fixed-point)
    val avg1 = Evaluation.reliabilityBins(scored, truth, 10).collect()
      .find(_.getInt(0) == 1).get.getDouble(3)
    assert(math.abs(avg1 - 0.055) < 1e-12)
  }

  test("reliabilityBins: duplicate truth pairs do not double-count") {
    import spark.implicits._
    val scored = Seq((1L, 1L, 0.9), (1L, 2L, 0.1)).toDF("query_id", "item", "score")
    val truth = Seq((1L, 1L), (1L, 1L)).toDF("query_id", "item")
    val out = Evaluation.reliabilityBins(scored, truth, 2).collect()
    assert(out.map(_.getLong(1)).sum == 2L)   // still 2 scored rows
    assert(out.map(_.getLong(2)).sum == 1L)   // one positive, counted once
  }

  test("coverageGini: equal shares score 0; full concentration approaches 1") {
    import spark.implicits._
    val catalog = (1L to 10L).toDF("item_id")
    // 4 items, 3 impressions each -> gini 0, coverage 0.4
    val equal = (1L to 4L).flatMap(i => Seq.fill(3)(i)).toDF("item")
    val e = Evaluation.coverageGini(equal.toDF("item"), "item",
      catalog, "item_id").collect()(0)
    assert((e.getLong(0), e.getLong(1), e.getLong(2)) == ((10L, 4L, 12L)))
    assert(e.getDouble(3) == 0.4 && e.getDouble(4) == 0.0)
    // one item takes 97 of 100 impressions over 4 items -> near 1
    val skew = (Seq.fill(97)(1L) ++ Seq(2L, 3L, 4L)).toDF("item")
    val s = Evaluation.coverageGini(skew, "item", catalog, "item_id")
      .collect()(0)
    assert(s.getDouble(4) > 0.7)
  }

  test("intraListDiversity: orthogonal lists score 1, clones score 0") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(1.0, 0.0, 0.0)), (2L, Seq(0.0, 1.0, 0.0)),
      (3L, Seq(0.0, 0.0, 1.0)),
      (4L, Seq(1.0, 1.0, 0.0)), (5L, Seq(1.0, 1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val ranked = Seq(
      // query 1: three mutually orthogonal items → every pair d = 1
      (1L, 1L, 1), (1L, 2L, 2), (1L, 3L, 3),
      // query 2: two identical items → d = 0
      (2L, 4L, 1), (2L, 5L, 2))
      .toDF("query_id", "item", "rnk")
    val out = Evaluation.intraListDiversity(ranked, emb, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(out(1L) == ((3L, 1.0)))
    assert(out(2L) == ((1L, 0.0)))
  }

  test("intraListDiversity: a mixed list averages its pairwise distances") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)), (3L, Seq(1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val ranked = Seq((7L, 1L, 1), (7L, 2L, 2), (7L, 3L, 3))
      .toDF("query_id", "item", "rnk")
    val out = Evaluation.intraListDiversity(ranked, emb, "vec_id", "embedding")
      .collect()(0)
    // pairs: (1,2) d=1, (1,3) d=0, (2,3) d=1 → mean 2/3
    assert(out.getLong(1) == 3L && out.getDouble(2) == 0.666667)
  }
}
