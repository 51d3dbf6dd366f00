package graft.operators

import graft.functions.expressions.VectorExpressions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric per-vector int8 scalar quantization (SQ8) of an embedding
  * column — the standard 4× memory compression for ANN serving (FAISS
  * SQ8 / Milvus SQ8 equivalent): at 100 TB the float32 vectors dominate
  * index RAM, and serving from int8 codes + one scale per vector costs
  * ~1/4 the footprint for a ~1e-2 cosine error.
  *
  * The reference stores raw float32 in ChromaDB
  * (`/root/reference/Hybrid_Recom_vecdb.py:126-141`); this is the
  * engine's scale path beyond it.
  *
  * Everything is a map-side column expression (one pipelined pass, no
  * shuffle): scale = max|v|/127, codes = round-half-up(v/scale) clamped
  * to [-127,127] — all math in double with an explicit `floor(x/s+0.5)`
  * so the DuckDB oracle replays it bit-identically (`round()` half-mode
  * conventions differ across engines; floor(+0.5) does not).
  */
object Quantize {

  private def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  private def codesOf(v: Column, scale: Column): Column =
    when(scale === 0.0, transform(v, _ => lit(0L)))
      .otherwise(transform(v, x =>
        greatest(lit(-127.0), least(lit(127.0),
          floor(x / scale + 0.5))).cast("long")))

  /** The stored form: every input column except the float vector, plus
    * (scale, codes array<long>). Zero vectors get scale 0 and all-zero
    * codes. Pass-through columns (an IVF `cell`, labels) stay, so a
    * quantized index keeps its partitioning column. */
  def int8(df: DataFrame, idCol: String = "vec_id",
           vecCol: String = "embedding"): DataFrame =
    df.withColumn("__v", toDouble(col(vecCol)))
      .withColumn("scale", array_max(transform(col("__v"), x => abs(x))) / 127.0)
      .withColumn("codes", codesOf(col("__v"), col("scale")))
      .drop("__v", vecCol)

  /** Dequantized float view of [[int8]] output — `vecCol` restored as
    * array<double> (codes × scale). Serving from SQ8 scores against
    * exactly this reconstruction. */
  def dequantized(sq: DataFrame, vecCol: String = "embedding"): DataFrame =
    sq.withColumn(vecCol,
      transform(col("codes"), c => c.cast("double") * col("scale")))

  /** Reconstruction-quality digest per vector: the L1 mass of the codes
    * (an exact engine-replayable checksum of the quantization) and the
    * cosine between the original vector and its dequantized
    * reconstruction — the error actually paid by serving from SQ8.
    * Single map-side pass: quantize, dequantize and compare without the
    * vectors ever leaving the scan's pipeline. */
  def reconstructionDigest(df: DataFrame, idCol: String = "vec_id",
                           vecCol: String = "embedding"): DataFrame = {
    val dq = transform(col("codes"), c => c.cast("double") * col("scale"))
    df.select(col(idCol), toDouble(col(vecCol)).as("__v"))
      .withColumn("scale", array_max(transform(col("__v"), x => abs(x))) / 127.0)
      .withColumn("codes", codesOf(col("__v"), col("scale")))
      .select(col(idCol), col("scale"),
        aggregate(col("codes"), lit(0L), (a, x) => a + abs(x)).as("l1_codes"),
        round(VectorExpressions.cosineSim(col("__v"), dq), 6).as("cos_recon"))
  }
}
