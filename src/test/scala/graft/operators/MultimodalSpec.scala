package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Multimodal plumbing: blobs stay opaque binary, metadata/features are
  * deterministic functions of the payload, frame sampling strides the
  * decoded frame count. */
class MultimodalSpec extends SparkTestBase {

  private def docs = spark.createDataFrame(Seq(
    (0L, "alpha beta"), (1L, "gamma"), (2L, "a longer video-ish payload"),
    (5L, ""))) // empty payload → zero histogram
    .toDF("doc_id", "text")

  test("featuresBatched: 16 unit-norm bins; empty payload yields the zero vector") {
    val feats = Multimodal.featuresBatched(Multimodal.withBlob(docs)).collect()
      .map(m => m.doc_id -> m.features).toMap
    assert(feats.values.forall(_.length == 16))
    feats.foreach { case (id, f) =>
      val norm = math.sqrt(f.map(x => x * x).sum)
      if (id == 5L) assert(norm == 0.0)
      else assert(math.abs(norm - 1.0) < 1e-12)
    }
    // histogram counts the actual bytes: "gamma" = 5 bytes in bins byte%16
    val g = feats(1L)
    val expect = "gamma".getBytes("UTF-8").groupBy(b => (b & 0xff) % 16)
      .view.mapValues(_.length.toDouble).toMap
    val nrm = math.sqrt(expect.values.map(x => x * x).sum)
    expect.foreach { case (bin, c) => assert(math.abs(g(bin) - c / nrm) < 1e-12) }
  }

  test("sampleFrames: only video rows, stride-5 indices within n_frames") {
    val decoded = Multimodal.decodeBatched(Multimodal.withBlob(docs))
    val nFrames = decoded.collect().map(m => m.doc_id -> m.n_frames).toMap
    val frames = Multimodal.sampleFrames(decoded, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    // doc_id % 3 == 2 → video; only doc 2 and 5 qualify
    assert(frames.map(_._1).toSet == Set(2L, 5L))
    frames.groupBy(_._1).foreach { case (id, fs) =>
      val idx = fs.map(_._2).sorted
      assert(idx.head == 1 && idx.last <= nFrames(id))
      assert(idx.sameElements(1 to nFrames(id) by 5))
    }
  }
}
