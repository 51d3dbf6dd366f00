package graft.operators

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.Exchange

/** Multimodal plumbing over the REAL codec: blobs are genuine PNG /
  * filmstrip-PNG / WAV containers; metadata comes from real header
  * probes, features from a real full decode; blobs never shuffle. */
class MultimodalSpec extends SparkTestBase {

  private def docs = spark.createDataFrame(Seq(
    (0L, "alpha beta"),          // image
    (1L, "gamma"),               // audio (WAV, 5 samples)
    (2L, "a longer video-ish payload"), // video filmstrip
    (4L, "")))                   // empty audio payload → zero-frame WAV
    .toDF("doc_id", "text")

  test("blobs are real containers a stock JVM codec opens") {
    val blobs = Multimodal.withBlob(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("blob")).toMap
    // image doc 0: a real PNG ImageIO reads directly, at the rule dims
    val n0 = "alpha beta".getBytes("UTF-8").length
    val img = ImageIO.read(new ByteArrayInputStream(blobs(0L)))
    assert(img.getWidth == 16 + n0 % 240 && img.getHeight == 16 + 7 * n0 % 240)
    // decoded pixels are exactly the cycled text bytes (lossless round-trip)
    val src = "alpha beta".getBytes("UTF-8")
    val px = (0 until img.getWidth * img.getHeight).map(p =>
      img.getRaster.getSample(p % img.getWidth, p / img.getWidth, 0))
    assert(px.zipWithIndex.forall { case (v, p) => v == (src(p % src.length) & 0xff) })
    // audio doc 1: a real RIFF/WAVE container, one frame per text byte
    assert(new String(blobs(1L).slice(0, 4), "US-ASCII") == "RIFF")
    val aff = javax.sound.sampled.AudioSystem
      .getAudioFileFormat(new ByteArrayInputStream(blobs(1L)))
    assert(aff.getFrameLength == "gamma".getBytes("UTF-8").length)
    // video doc 2: one filmstrip PNG of height frame_h * n_frames
    val n2 = "a longer video-ish payload".getBytes("UTF-8").length
    val strip = ImageIO.read(new ByteArrayInputStream(blobs(2L)))
    assert(strip.getHeight == (16 + 7 * n2 % 240) * (1 + n2 % 30))
  }

  test("decodeBatched: real header-probe metadata per media type") {
    val meta = Multimodal.decodeBatched(Multimodal.withBlob(docs)).collect()
      .map(m => m.doc_id -> m).toMap
    val n0 = 10; val n2 = 26
    assert(meta(0L) == Multimodal.MediaMeta(0L, "image",
      16 + n0 % 240, 16 + 7 * n0 % 240, 1, (16 + n0 % 240).toLong * (16 + 7 * n0 % 240)))
    assert(meta(1L) == Multimodal.MediaMeta(1L, "audio", 0, 0, 5, 5L))
    val (w2, h2, f2) = (16 + n2 % 240, 16 + 7 * n2 % 240, 1 + n2 % 30)
    assert(meta(2L) == Multimodal.MediaMeta(2L, "video", w2, h2, f2,
      w2.toLong * h2 * f2))
    // empty audio payload: a valid zero-frame WAV
    assert(meta(4L) == Multimodal.MediaMeta(4L, "audio", 0, 0, 0, 0L))
  }

  test("featuresBatched: 16 unit-norm bins over the REAL decoded buffer; " +
    "empty payload yields the zero vector") {
    val feats = Multimodal.featuresBatched(Multimodal.withBlob(docs)).collect()
      .map(m => m.doc_id -> m.features).toMap
    assert(feats.values.forall(_.length == 16))
    // expected histogram: text bytes cycled to the decoded-buffer length
    def expect(id: Long, text: String): Array[Double] = {
      val src = text.getBytes("UTF-8"); val n = src.length
      val w = 16 + n % 240; val h = 16 + (7 * n) % 240
      val t = (id % 3) match {
        case 0 => w * h
        case 1 => n
        case _ => w * h * (1 + n % 30)
      }
      val hist = new Array[Double](16)
      (0 until t).foreach(p => hist((src(p % n) & 0xff) % 16) += 1.0)
      val nrm = math.sqrt(hist.map(x => x * x).sum)
      if (nrm == 0.0) hist else hist.map(_ / nrm)
    }
    Seq(0L -> "alpha beta", 1L -> "gamma",
        2L -> "a longer video-ish payload").foreach { case (id, text) =>
      val e = expect(id, text)
      assert(feats(id).zip(e).forall { case (a, b) => math.abs(a - b) < 1e-12 },
        s"doc $id")
    }
    // zero-frame audio: empty PCM → zero vector (norm guard)
    assert(feats(4L).forall(_ == 0.0))
  }

  test("sampleFrames: only video rows, stride-5 indices within n_frames") {
    val decoded = Multimodal.decodeBatched(Multimodal.withBlob(docs))
    val nFrames = decoded.collect().map(m => m.doc_id -> m.n_frames).toMap
    val frames = Multimodal.sampleFrames(decoded, 5).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(frames.map(_._1).toSet == Set(2L)) // doc_id % 3 == 2 → video
    frames.groupBy(_._1).foreach { case (id, fs) =>
      val idx = fs.map(_._2).sorted
      assert(idx.head == 1 && idx.last <= nFrames(id))
      assert(idx.sameElements(1 to nFrames(id) by 5))
    }
  }

  test("resizePlan: visual rows only, aspect preserved within the box") {
    val decoded = Multimodal.decodeBatched(Multimodal.withBlob(docs))
    val plans = Multimodal.resizePlan(decoded, 8, 8).collect()
      .map(r => r.getLong(0) -> (r.getInt(3), r.getInt(4))).toMap
    assert(plans.keySet == Set(0L, 2L)) // audio rows (width 0) excluded
    plans.values.foreach { case (w, h) => assert(w <= 8 && h <= 8 && w >= 1 && h >= 1) }
  }

  test("plan shape: blob generation, probe and decode are all map-side — " +
    "zero Exchange, blobs never shuffle") {
    val meta = Multimodal.decodeBatched(Multimodal.withBlob(docs)).toDF()
    val feats = Multimodal.featuresBatched(Multimodal.withBlob(docs)).toDF()
    Seq(meta, feats).foreach { df =>
      val ex = df.queryExecution.executedPlan.collect { case e: Exchange => e }
      assert(ex.isEmpty, s"unexpected shuffle: ${df.queryExecution.executedPlan}")
    }
  }
}
