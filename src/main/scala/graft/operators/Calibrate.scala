package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Isotonic score calibration — pool-adjacent-violators (PAV) with EXACT
  * integer arithmetic.
  *
  * q122's reliability audit shows the hybrid blend's scores are not
  * probabilities; isotonic regression is the standard non-parametric fix
  * (Zadrozny & Elkan, KDD'02): fit the monotone step function minimizing
  * squared error to the (score, label) pairs, then read calibrated
  * probabilities off the steps.
  *
  * Determinism: with binary labels every pool mean is a RATIONAL
  * n_pos/n, so PAV's merge comparisons run in exact long cross-products
  * (p₁·c₂ ≥ p₂·c₁) — no float enters until the single output division.
  * The fitted function is the unique L2 projection onto the monotone
  * cone, so it equals the closed-form max-min characterization
  *   fitted(k) = max_{i≤k} min_{j≥k} avg(y[i..j])
  * — which is what the DuckDB oracle computes pairwise; correctly-rounded
  * double division is monotone in the rationals, so both renderings emit
  * identical doubles.
  *
  * Scale: ties pre-pool by score (one shuffle), then the sequential PAV
  * stack runs over DISTINCT scores in a single task — bounded by the
  * calibration set, which is eval-sized BY CONTRACT (|Q|·depth rows, the
  * same bound as every evaluation operator here). Calibrating raw 100 TB
  * scores means sampling first; the operator shape doesn't change.
  *
  * @return one row per distinct score: (score, n, n_pos, fitted),
  *         fitted non-decreasing in score.
  */
object Calibrate {

  final case class IsoBlock(score: Double, n: Long, n_pos: Long,
                            fitted: Double)

  def isotonic(scored: DataFrame, scoreCol: String,
               labelCol: String): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val blocks = scored.groupBy(col(scoreCol).cast("double").as("score"))
      .agg(count(lit(1)).as("n"), sum(col(labelCol).cast("long")).as("n_pos"))
    blocks.groupByKey(_ => 0).flatMapGroups { (_, rows) =>
      val arr = rows.map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
        .toArray.sortBy(_._1)
      // PAV stack: (c, p, nBlocks) — merge while a left pool's mean is
      // >= the right's, compared exactly as p1*c2 >= p2*c1
      val st = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
      arr.foreach { case (_, c, p) =>
        var cur = (c, p, 1)
        while (st.nonEmpty &&
          st.last._2 * cur._1 >= cur._2 * st.last._1) {
          val t = st.remove(st.length - 1)
          cur = (t._1 + cur._1, t._2 + cur._2, t._3 + cur._3)
        }
        st += cur
      }
      // expand pools back over their blocks, in score order
      val out = scala.collection.mutable.ArrayBuffer.empty[IsoBlock]
      var idx = 0
      st.foreach { case (c, p, nb) =>
        val fitted = p.toDouble / c.toDouble
        (0 until nb).foreach { _ =>
          val (s, bc, bp) = arr(idx); idx += 1
          out += IsoBlock(s, bc, bp, fitted)
        }
      }
      out
    }.toDF()
  }
}
