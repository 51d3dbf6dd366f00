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

  test("empty visual payloads: real 16x16 PNG of zero bytes → bin-0 unit " +
    "vector (the cycle() zero-fill rule, pinned on both engine and oracle)") {
    // round-9 ADVICE: the old spec only exercised empty AUDIO (tt = 0,
    // zero vector); an empty IMAGE/VIDEO payload still has a real
    // 16×16 raster (n = 0 ⇒ W = H = 16, frames = 1) that cycle()
    // zero-fills, so every byte is 0 and the histogram concentrates in
    // bin 0 — the oracle's `n = 0 AND tt > 0` branch replays exactly this.
    val ed = spark.createDataFrame(Seq((3L, ""), (5L, "")))
      .toDF("doc_id", "text") // 3 % 3 = 0 → image, 5 % 3 = 2 → video
    val meta = Multimodal.decodeBatched(Multimodal.withBlob(ed)).collect()
      .map(m => m.doc_id -> m).toMap
    assert(meta(3L) == Multimodal.MediaMeta(3L, "image", 16, 16, 1, 256L))
    assert(meta(5L) == Multimodal.MediaMeta(5L, "video", 16, 16, 1, 256L))
    val feats = Multimodal.featuresBatched(Multimodal.withBlob(ed)).collect()
      .map(m => m.doc_id -> m.features).toMap
    Seq(3L, 5L).foreach { id =>
      assert(feats(id)(0) == 1.0 && feats(id).tail.forall(_ == 0.0),
        s"doc $id should be the bin-0 unit vector")
    }
  }

  test("resizeDigest: executed nearest-neighbor resample matches the " +
    "integer rule byte-for-byte; encode→decode round trip pinned") {
    val one = spark.createDataFrame(Seq((0L, "alpha beta"))).toDF("doc_id", "text")
    // n = 10 → W = 26, H = 86; 8×8 box → scale = 8/86, out = 2×8
    val src = "alpha beta".getBytes("UTF-8")
    val (w, h) = (26, 86)
    val raster = Array.tabulate(w * h)(p => src(p % src.length))
    val scale = math.min(math.min(8.0 / w, 8.0 / h), 1.0)
    val (outW, outH) = (math.max(1, math.floor(w * scale).toInt),
      math.max(1, math.floor(h * scale).toInt))
    assert((outW, outH) == (2, 8))
    val expected = Array.tabulate(outW * outH) { p =>
      val (y, x) = (p / outW, p % outW)
      raster((y * h / outH) * w + x * w / outW)
    }
    val (expSum, expWsum) = expected.zipWithIndex.foldLeft((0L, 0L)) {
      case ((s, ws), (b, i)) => (s + (b & 0xff), ws + (i + 1L) * (b & 0xff))
    }
    val d = Multimodal.resizeDigest(Multimodal.withBlob(one), 8, 8).collect()(0)
    assert(d == Multimodal.ResizeDigest(0L, w, h, outW, outH, 1,
      expSum, expWsum, roundtrip_ok = true))
    // the store form: a real PNG at the planned dims whose decoded bytes
    // ARE the expected resample (lossless, stock-reader-openable)
    val stored = Multimodal.resizeBatched(Multimodal.withBlob(one), 8, 8)
      .collect()(0).getAs[Array[Byte]]("blob")
    val img = ImageIO.read(new ByteArrayInputStream(stored))
    assert(img.getWidth == outW && img.getHeight == outH)
    val back = (0 until outW * outH).map(p =>
      img.getRaster.getSample(p % outW, p / outW, 0).toByte)
    assert(back.sameElements(expected))
  }

  test("resizeDigest: filmstrip resample is per-frame (video keeps its " +
    "frame count); every doc round-trips") {
    val ds = Multimodal.resizeDigest(Multimodal.withBlob(docs), 8, 8).collect()
      .map(d => d.doc_id -> d).toMap
    assert(ds.keySet == Set(0L, 2L)) // audio excluded
    val n2 = 26
    assert(ds(2L).n_frames == 1 + n2 % 30)
    assert(ds(2L).out_w <= 8 && ds(2L).out_h <= 8)
    assert(ds.values.forall(_.roundtrip_ok))
  }

  test("plan shape: blob generation, probe, decode and resample are all " +
    "map-side — zero Exchange, blobs never shuffle") {
    val meta = Multimodal.decodeBatched(Multimodal.withBlob(docs)).toDF()
    val feats = Multimodal.featuresBatched(Multimodal.withBlob(docs)).toDF()
    val resize = Multimodal.resizeDigest(Multimodal.withBlob(docs), 8, 8).toDF()
    Seq(meta, feats, resize).foreach { df =>
      val ex = df.queryExecution.executedPlan.collect { case e: Exchange => e }
      assert(ex.isEmpty, s"unexpected shuffle: ${df.queryExecution.executedPlan}")
    }
  }
}
