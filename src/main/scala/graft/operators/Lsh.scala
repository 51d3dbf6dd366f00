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
    * Single-probe: only exact bucket matches meet ([[cosinePairsMultiProbe]]
    * lifts recall to Hamming-≤1 bucket pairs at ~(bits+1)× key volume). */
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

  /** Multi-probe variant: pairs whose buckets differ in AT MOST one
    * signature bit. One side explodes its bucket plus the `bits`
    * single-bit flips (map-side, (bits+1)× keys); the other side keeps
    * its exact bucket, so the join still hash-partitions on a narrow
    * long key and a Hamming-1 pair meets exactly twice (once per
    * direction) before the (a,b) dedup. Near-misses — close vectors
    * that one hyperplane happens to split — are exactly what this
    * recovers; recall rises at the classic multi-probe cost, with no
    * extra hash tables and still zero broadcast state. */
  def cosinePairsMultiProbe(emb: DataFrame, bits: Int, dim: Int, minSim: Double,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding"): DataFrame = {
    val b = withBucket(emb, bits, dim, vecCol)
      .select(col(idCol), col(vecCol), col("bucket"))
    // Narrow candidate join (the BrpLsh.cosinePairs pattern): probes and
    // buckets meet as (id, bucket) longs, pairs dedup as (a, b), vectors
    // join back once per distinct pair — candidate volume never carries
    // vector payloads through a shuffle.
    val probes = b.select(col(idCol),
      explode(array(col("bucket") +:
        (0 until bits).map(j => col("bucket").bitwiseXOR(lit(1L << j))): _*))
        .as("bucket"))
    val cand = probes.as("x")
      .join(b.select(col(idCol), col("bucket")).as("y"), "bucket")
      .where(col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("a"), col(s"y.$idCol").as("b"))
      .distinct()
    val v = emb.select(col(idCol), col(vecCol))
    cand
      .join(v.select(col(idCol).as("a"), col(vecCol).as("va")), Seq("a"))
      .join(v.select(col(idCol).as("b"), col(vecCol).as("vb")), Seq("b"))
      .withColumn("sim", cosine(col("va"), col("vb")))
      .where(col("sim") >= minSim)
      .select("a", "b", "sim")
  }
}
