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
}
