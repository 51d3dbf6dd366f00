package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, decoded/feature-extracted in
  * batched partition-local passes.
  *
  * The Spark-side contract is real and tested (schema, batching,
  * partition-local execution, metadata extraction as columns); the codec
  * itself is a clearly-marked deterministic STUB — the container has no
  * image/audio libraries, and a real deployment would swap
  * [[DecoderStub.decode]] for an actual codec (JNI/FFI) without touching
  * the surrounding plan.
  *
  * Scale notes: payloads never pass through a shuffle — metadata is
  * extracted map-side, and any grouping downstream operates on the (small)
  * metadata columns with the blob column pruned away by Catalyst.
  */
object Multimodal {

  /** Typed decoded-media metadata. */
  case class MediaMeta(doc_id: Long, byte_len: Long, media_type: String,
                       width: Int, height: Int, n_frames: Int)

  /** Deterministic fake codec: "decodes" a blob into plausible media
    * metadata derived purely from its length and bytes. STUB — stands in
    * for e.g. libjpeg/ffmpeg. */
  object DecoderStub {
    def decode(blob: Array[Byte]): (Int, Int, Int) = {
      val n = blob.length
      // ??? real codec goes here; the fake is a pure function of length
      // so tests and the SQL oracle can reproduce it.
      val width = 16 + (n % 240)
      val height = 16 + ((n * 7) % 240)
      val frames = 1 + (n % 30)
      (width, height, frames)
    }
  }

  /** Attach a binary payload column (here: the utf-8 bytes of `text`,
    * standing in for real media bytes) plus a media_type. */
  def withBlob(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("blob", col(textCol).cast("binary"))
      .withColumn("media_type",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")))

  /** Column-expression metadata extraction (the pure-SQL fast path that
    * mirrors DecoderStub for the oracle). */
  def extractMetaSql(withBlobDf: DataFrame): DataFrame =
    withBlobDf.select(
      col("doc_id"),
      length(col("blob")).cast("long").as("byte_len"),
      col("media_type"),
      (lit(16) + pmod(length(col("blob")), lit(240))).as("width"),
      (lit(16) + pmod(length(col("blob")) * 7, lit(240))).as("height"),
      (lit(1) + pmod(length(col("blob")), lit(30))).as("n_frames"))

  /** Typed per-payload feature vector (double precision: counts and the
    * L2 norm are exact integers/square roots, so the digest is
    * bit-comparable to the SQL oracle; cast to float32 at index-write
    * time when feeding the ANN path). */
  case class MediaFeatures(doc_id: Long, features: Array[Double])

  /** Batched partition-local feature extraction: an L2-normalized
    * `bins`-bucket byte histogram per payload — the deterministic
    * stand-in for model inference over decoded media (a real deployment
    * swaps the histogram body for the model forward pass; the
    * batching/schema/partitioning contract is identical, and the output
    * feeds the same ANN operators as text embeddings). Map-side only;
    * blobs never shuffle. */
  def featuresBatched(withBlobDf: DataFrame, bins: Int = 16): Dataset[MediaFeatures] = {
    val enc = Encoders.product[MediaFeatures]
    withBlobDf.select("doc_id", "blob")
      .mapPartitions { rows =>
        rows.map { r =>
          val blob = r.getAs[Array[Byte]](1)
          val hist = new Array[Double](bins)
          var i = 0
          while (i < blob.length) { hist((blob(i) & 0xff) % bins) += 1.0; i += 1 }
          val norm = math.sqrt(hist.map(x => x * x).sum)
          val out = if (norm == 0.0) hist else hist.map(_ / norm)
          MediaFeatures(r.getLong(0), out)
        }
      }(enc)
  }

  /** Frame sampling for video payloads: every `stride`-th frame index of
    * the decoded frame count — explode is map-side, so sampling 100 TB of
    * video rows is a single pass with no shuffle. */
  def sampleFrames(decoded: Dataset[MediaMeta], stride: Int): DataFrame =
    decoded.toDF()
      .where(col("media_type") === "video")
      .select(col("doc_id"),
        explode(sequence(lit(1), col("n_frames"), lit(stride))).as("frame_idx"))

  /** Aspect-preserving resize planning over decoded metadata: the target
    * box and the per-payload scale factor are pure column math (map-side,
    * no shuffle); the pixel resample itself would live in the same
    * batched pass as [[DecoderStub]] in a real deployment. */
  def resizePlan(decoded: Dataset[MediaMeta], maxW: Int, maxH: Int): DataFrame = {
    val scale = least(lit(maxW.toDouble) / col("width"),
      lit(maxH.toDouble) / col("height"), lit(1.0))
    decoded.toDF()
      .withColumn("scale", scale)
      .withColumn("out_w", greatest(lit(1), floor(col("width") * col("scale"))).cast("int"))
      .withColumn("out_h", greatest(lit(1), floor(col("height") * col("scale"))).cast("int"))
      .select(col("doc_id"), col("width"), col("height"),
        col("out_w"), col("out_h"))
  }

  /** Batched partition-local decode through the stub codec — the shape a
    * real decoder runs in (one codec instance per partition, rows streamed
    * through it). Returns a typed Dataset. */
  def decodeBatched(withBlobDf: DataFrame): Dataset[MediaMeta] = {
    val enc = Encoders.product[MediaMeta]
    withBlobDf.select("doc_id", "blob", "media_type")
      .mapPartitions { rows =>
        // per-partition codec init would happen here
        rows.map { r =>
          val id = r.getLong(0)
          val blob = r.getAs[Array[Byte]](1)
          val mt = r.getString(2)
          val (w, h, f) = DecoderStub.decode(blob)
          MediaMeta(id, blob.length.toLong, mt, w, h, f)
        }
      }(enc)
  }
}
