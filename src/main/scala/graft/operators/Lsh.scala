package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sign-random-projection LSH for cosine similarity (Charikar 2002) —
  * the 100 TB scale path for ANN / embedding dedup.
  *
  * Hyperplanes are *derived*, not sampled: component i of plane j is
  * a pure-integer Weyl-style pseudo-random value
  *   u(j,i) = ((j·dim + i) · 2654435761) mod 2^32   (Knuth multiplicative)
  *   h(j,i) = u/2^32 − 0.5                           ∈ [−0.5, 0.5)
  * so signatures are bit-reproducible across engines, runs and cluster
  * sizes with zero state to broadcast. Signature bit j = [v·h_j > 0].
  *
  * Bucketing on the signature turns near-neighbor search into an
  * equi-join: vectors only ever meet rows in their own bucket, which Spark
  * hash-partitions — no crossJoin at any scale.
  */
object Lsh {

  private def plane(j: Int, i: Column, dim: Int): Column =
    ((lit(j.toLong * dim) + i) * lit(2654435761L) % lit(4294967296L))
      .cast("double") / lit(4294967296.0) - lit(0.5)

  /** Dot product of the vector with derived hyperplane j. */
  def planeDot(vec: Column, j: Int, dim: Int): Column =
    aggregate(
      zip_with(vec, sequence(lit(0L), lit(dim.toLong - 1)),
        (x, i) => x.cast("double") * plane(j, i, dim)),
      lit(0.0), (acc, x) => acc + x)

  /** `bits`-bit signature as a non-negative long (bit j set ⇔ v·h_j > 0). */
  def signature(vec: Column, bits: Int, dim: Int): Column =
    (0 until bits).map(j =>
      when(planeDot(vec, j, dim) > 0.0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** Attach the LSH bucket column. */
  def withBucket(emb: DataFrame, bits: Int, dim: Int,
                 vecCol: String = "embedding"): DataFrame =
    emb.withColumn("bucket", signature(col(vecCol), bits, dim))

  /** Candidate near-duplicate pairs within a bucket, exact-scored.
    * Multi-probe (matching buckets at Hamming distance ≤ 1) would lift
    * recall; single-probe keeps the demo plan minimal. */
  def cosinePairsInBuckets(emb: DataFrame, bits: Int, dim: Int, minSim: Double,
                           idCol: String = "vec_id",
                           vecCol: String = "embedding"): DataFrame = {
    val b = withBucket(emb, bits, dim, vecCol)
      .select(col(idCol), col(vecCol), col("bucket"))
    b.as("x").join(b.as("y"), "bucket")
      .where(col(s"x.$idCol") < col(s"y.$idCol"))
      .withColumn("sim", cosine(col(s"x.$vecCol"), col(s"y.$vecCol")))
      .where(col("sim") >= minSim)
      .select(col(s"x.$idCol").as("a"), col(s"y.$idCol").as("b"), col("sim"))
  }
}
