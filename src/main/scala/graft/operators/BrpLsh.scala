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
      .fit(withNormalizedVec(emb, vecCol))
  }

  /** Cosine-threshold near-neighbor pairs via the model's
    * approxSimilarityJoin. Output (a, b, sim), a < b. */
  def cosinePairs(model: BucketedRandomProjectionLSHModel, emb: DataFrame,
                  minSim: Double, idCol: String = "vec_id",
                  vecCol: String = "embedding"): DataFrame = {
    require(minSim <= 1.0, "cosine similarity is at most 1")
    val maxDist = math.sqrt(math.max(0.0, 2.0 - 2.0 * minSim))
    // Hash ONCE, materialize, and reuse for both join sides:
    // approxSimilarityJoin skips its internal transform when the hash
    // column is already present. localCheckpoint (not cache) stops the
    // lazy plan from re-running the normalize+hash UDF pass per side
    // WITHOUT leaking: a cache() here would pin an InMemoryRelation in
    // the CacheManager forever (round-1 verdict #5), while a local
    // checkpoint's blocks are unpersisted by the ContextCleaner as soon
    // as the returned frame is garbage-collected.
    val ds = model.transform(withNormalizedVec(emb, vecCol)).localCheckpoint()
    model.approxSimilarityJoin(ds, ds, maxDist, "dist")
      .where(col(s"datasetA.$idCol") < col(s"datasetB.$idCol"))
      .select(col(s"datasetA.$idCol").as("a"), col(s"datasetB.$idCol").as("b"),
        (lit(1.0) - col("dist") * col("dist") / 2.0).as("sim"))
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
