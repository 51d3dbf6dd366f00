package graft.operators

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.feature.{HashingTF, IDF, Normalizer, RegexTokenizer}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Text → fixed-dimension, L2-normalized float vector.
  *
  * Replaces the reference's SentenceTransformer call
  * (`Hybrid_Recom_vecdb.py:20,374-379` — all-MiniLM-L12-v2, 384-d float32)
  * with a deterministic MLlib pipeline preserving the operator contract
  * (SURVEY V1): text in, cosine-comparable `array<float>` out.
  *
  * Pipeline: RegexTokenizer → HashingTF(dim) → IDF → Normalizer(L2).
  * IDF is the only fitted stage; the fitted model broadcasts its IDF
  * vector, so transform() is map-side only — embedding 100 TB of text is
  * an embarrassingly parallel single pass, exactly like batched model
  * inference in the reference (batch=64, `Hybrid_Recom_vecdb.py:21,377`).
  */
object Embedder {

  /** Default dimension matches the driver corpus' embeddings table (64);
    * the reference used 384. */
  val DefaultDim = 64

  def fit(docs: DataFrame, textCol: String = "text", dim: Int = DefaultDim): PipelineModel = {
    val tok = new RegexTokenizer()
      .setInputCol(textCol).setOutputCol("__tokens")
      .setPattern("[^a-z0-9]+").setToLowercase(true)
    val tf = new HashingTF()
      .setInputCol("__tokens").setOutputCol("__tf").setNumFeatures(dim)
    val idf = new IDF().setInputCol("__tf").setOutputCol("__tfidf")
    val norm = new Normalizer().setInputCol("__tfidf").setOutputCol("__vec").setP(2.0)
    new Pipeline().setStages(Array(tok, tf, idf, norm)).fit(docs)
  }

  /** Embed: returns the input plus an `embedding array<float>` column.
    * The Vector→array<float> conversion uses MLlib's built-in
    * vector_to_array (codegen-friendly, no Scala closure). */
  def embed(model: PipelineModel, docs: DataFrame): DataFrame = {
    import org.apache.spark.ml.functions.vector_to_array
    model.transform(docs)
      .withColumn("embedding", vector_to_array(col("__vec"), "float32"))
      .drop("__tokens", "__tf", "__tfidf", "__vec")
  }

  /** fit + embed in one call (the offline index-build path, SURVEY §3 E1). */
  def fitEmbed(docs: DataFrame, textCol: String = "text",
               dim: Int = DefaultDim): DataFrame =
    embed(fit(docs, textCol, dim), docs)
}
