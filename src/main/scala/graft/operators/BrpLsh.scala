package graft.operators

import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, BucketedRandomProjectionLSHModel}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MLlib BucketedRandomProjectionLSH as the managed ANN scale path
  * (SURVEY §2.4 V2 option b): on L2-NORMALIZED vectors, Euclidean
  * distance is monotone in cosine similarity
  * (‖a−b‖² = 2 − 2·cos(a,b)), so Euclidean LSH buckets preserve cosine
  * ordering and `approxSimilarityJoin(maxDist)` equals a cosine
  * threshold join with minSim = 1 − maxDist²/2.
  *
  * Complements the hand-rolled sign-random-projection [[Lsh]]: that one
  * is bit-reproducible cross-engine (oracle-checkable); this one
  * delegates bucketing to MLlib (seeded, reproducible within Spark) and
  * provides the multi-table `approxSimilarityJoin` machinery for free.
  */
object BrpLsh {

  /** Fit on (idCol, vecCol array<float>) — vectors are L2-normalized
    * inside, so distances are cosine-equivalent. */
  def fit(emb: DataFrame, bucketLength: Double = 1.0, numTables: Int = 3,
          seed: Long = 42L, vecCol: String = "embedding"): BucketedRandomProjectionLSHModel = {
    new BucketedRandomProjectionLSH()
      .setInputCol("__nvec").setOutputCol("__hashes")
      .setBucketLength(bucketLength).setNumHashTables(numTables).setSeed(seed)
      .fit(withNormalizedVec(emb, vecCol).select("__nvec"))
  }

  /** Cosine-threshold near-neighbor pairs: MLlib's fitted hash family
    * for bucketing, a narrow hand-built candidate join for the pairs.
    * Output (a, b, sim), a < b; sim is the exact cosine, so the result
    * is a subset of the exact threshold pairs.
    *
    * Why not `model.approxSimilarityJoin`: its pair-distinct shuffles
    * BOTH sides' full rows (vectors + hash arrays) once per bucket
    * COLLISION — at 100 TB the candidate volume, not the input size, is
    * the dominant term, and each candidate would carry kilobytes. Here
    * collisions shuffle only (table, bucket, id); pairs deduplicate as
    * 16-byte (a, b) rows; the two vector lookups happen once per
    * DISTINCT pair, joined by id. Same candidate set (union over hash
    * tables of same-bucket pairs), bit-identical sims, a fraction of
    * the bytes moved. */
  def cosinePairs(model: BucketedRandomProjectionLSHModel, emb: DataFrame,
                  minSim: Double, idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    require(minSim <= 1.0, "cosine similarity is at most 1")
    import graft.functions.VectorFunctions.cosine
    // Hash ONCE over narrow (id, normalized vector) rows; localCheckpoint
    // (not cache) materializes the UDF pass for the self-join without
    // leaking — the ContextCleaner frees checkpoint blocks on GC, while a
    // cache() would pin an InMemoryRelation forever (round-1 verdict #5).
    val narrow = withNormalizedVec(emb, vecCol).select(col(idCol), col("__nvec"))
    val hashed = model.transform(narrow).localCheckpoint()
    // BRP hash values are floor(projection / bucketLength) — whole-number
    // doubles in 1-element vectors; (table index, bucket) is the join key.
    val keyed = hashed.select(col(idCol).as("id"),
        posexplode(col("__hashes")).as(Seq("ht", "hv")))
      .select(col("id"), concat_ws(":", col("ht"),
        vector_to_array(col("hv")).getItem(0).cast("long")).as("bkey"))
    val cand = keyed.as("x").join(keyed.as("y"), "bkey")
      .where(col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
    val v = emb.select(col(idCol), col(vecCol))
    cand
      .join(v.select(col(idCol).as("a"), col(vecCol).as("va")), Seq("a"))
      .join(v.select(col(idCol).as("b"), col(vecCol).as("vb")), Seq("b"))
      .withColumn("sim", cosine(col("va"), col("vb")))
      .where(col("sim") >= minSim)
      .select("a", "b", "sim")
  }

  private def withNormalizedVec(emb: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol)
    val n = sqrt(aggregate(v, lit(0.0d), (acc, x) =>
      acc + x.cast("double") * x.cast("double")))
    emb.withColumn("__nvec",
      array_to_vector(transform(v, x =>
        when(n === 0.0, lit(0.0d)).otherwise(x.cast("double") / n))))
  }
}
