package graft.multimodal

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MediaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val pngMagic = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
  private val jpegMagic = Array(0xFF, 0xD8, 0xFF, 0xE0).map(_.toByte)

  private def blobs = Seq(
    (0L, pngMagic ++ Array.tabulate(100)(_.toByte)),
    (1L, jpegMagic ++ Array.tabulate(50)(i => (i * 3).toByte)),
    (2L, "just text".getBytes("UTF-8"))).toDF("doc_id", "blob")

  test("magic-byte sniffing (expression path)") {
    val got = blobs.select($"doc_id", MediaPipeline.sniffFormat($"blob").as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(0L -> "png", 1L -> "jpeg", 2L -> "unknown"))
  }

  test("batched decode is REAL: ImageIO round trip recovers synthetic dims in all 3 JDK codecs") {
    val real = Seq(
      (20L, MediaPipeline.syntheticImage(20L, "png")),
      (21L, MediaPipeline.syntheticImage(21L, "bmp")),
      (22L, MediaPipeline.syntheticImage(22L, "gif"))).toDF("doc_id", "blob")
    val metas = MediaPipeline.decodeMeta(real, batchSize = 2).collect()
      .map(m => m.doc_id -> m).toMap
    assert(metas(20L).format == "png" && metas(21L).format == "bmp" && metas(22L).format == "gif")
    for (id <- 20L to 22L) {
      assert(metas(id).width == 16 + (id % 17).toInt, s"doc $id width")
      assert(metas(id).height == 16 + (id % 13).toInt, s"doc $id height")
      assert(metas(id).n_bytes > 0)
    }
    // garbage that only LOOKS like an image: sniffed format, 0×0 dims
    val fake = MediaPipeline.decodeMeta(blobs, batchSize = 2).collect()
      .map(m => m.doc_id -> m).toMap
    assert(fake(0L).format == "png" && fake(0L).width == 0 && fake(0L).height == 0)
    assert(fake(0L).n_bytes == 108 && fake(1L).n_bytes == 54)
    // deterministic: second run identical
    val again = MediaPipeline.decodeMeta(real.repartition(3)).collect()
      .map(m => m.doc_id -> m).toMap
    assert(again == metas)
  }

  test("pixelStats: channel sums match the synthetic formula exactly (PNG and BMP lossless)") {
    def expected(id: Long): (Long, Long, Long, Long, Long) = {
      val w = 16 + (id % 17).toInt
      val h = 16 + (id % 13).toInt
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val base = id + 3L * x + 7L * y
        sr += java.lang.Math.floorMod(base, 256L)
        sg += java.lang.Math.floorMod(base + 11L, 256L)
        sb += java.lang.Math.floorMod(base + 22L, 256L)
      }
      (w.toLong, h.toLong, sr, sg, sb)
    }
    val real = Seq(
      (7L, MediaPipeline.syntheticImage(7L, "png")),
      (8L, MediaPipeline.syntheticImage(8L, "bmp")),
      (9L, null: Array[Byte])).toDF("doc_id", "blob")
    val got = MediaPipeline.pixelStats(real, batchSize = 2).collect()
      .map(s => s.doc_id -> s).toMap
    for (id <- Seq(7L, 8L)) {
      val (w, h, sr, sg, sb) = expected(id)
      val s = got(id)
      assert((s.width, s.height, s.sum_r, s.sum_g, s.sum_b) == ((w, h, sr, sg, sb)), s"doc $id")
    }
    assert(got(9L) == MediaPipeline.PixelStats(9L, 0, 0, 0, 0, 0))
  }

  test("decodeMeta and sniffFormat agree on truncated/partial magics") {
    // 2-byte JPEG prefix with a wrong 3rd byte and a PNG prefix cut at 3
    // bytes: sniffFormat says unknown, and the decoder must agree — the
    // two classifiers live in one pipeline.
    val tricky = Seq(
      (10L, Array(0xFF, 0xD8, 0x00, 0x01).map(_.toByte)),
      (11L, Array(0x89, 0x50, 0x4E).map(_.toByte)),
      (12L, jpegMagic), (13L, pngMagic)).toDF("doc_id", "blob")
    val sniffed = tricky.select($"doc_id", MediaPipeline.sniffFormat($"blob").as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val decoded = MediaPipeline.decodeMeta(tricky).collect()
      .map(m => m.doc_id -> m.format).toMap
    assert(sniffed == decoded, s"sniff=$sniffed decode=$decoded")
    assert(sniffed(10L) == "unknown" && sniffed(11L) == "unknown")
    assert(sniffed(12L) == "jpeg" && sniffed(13L) == "png")
  }

  test("frameSample: bounded fan-out, exact slicing, short/null blobs yield no frames") {
    val longBlob = Array.tabulate(2000)(i => (i * 7).toByte) // (2000-48)/128+1 = 16 → capped at 8
    val shortBlob = Array.tabulate(300)(_.toByte)            // (300-48)/128+1 = 2
    val tiny = Array.tabulate(10)(_.toByte)                  // < frameBytes → 0
    val df = Seq((0L, longBlob), (1L, shortBlob), (2L, tiny), (3L, null))
      .toDF("doc_id", "blob")
    val frames = MediaPipeline.frameSample(df, frameBytes = 48, stride = 128,
        maxFrames = 8, batchSize = 2).collect()
    val byDoc = frames.groupBy(_.doc_id)
    assert(byDoc(0L).length == 8 && byDoc(1L).length == 2)
    assert(!byDoc.contains(2L) && !byDoc.contains(3L))
    // content: frame i is exactly blob[i*stride, i*stride+frameBytes)
    byDoc(1L).sortBy(_.frame_idx).zipWithIndex.foreach { case (f, i) =>
      assert(f.frame.sameElements(shortBlob.slice(i * 128, i * 128 + 48)))
    }
    // deterministic across partitionings
    val again = MediaPipeline.frameSample(df.repartition(3)).collect()
      .map(f => (f.doc_id, f.frame_idx) -> f.frame.toSeq).toMap
    assert(again == frames.map(f => (f.doc_id, f.frame_idx) -> f.frame.toSeq).toMap)
  }

  test("resize: real decode + nearest-neighbor resample matches the formula; null/garbage-safe") {
    val df = Seq(
      (0L, MediaPipeline.syntheticImage(0L, "png")),   // 16×16
      (1L, MediaPipeline.syntheticImage(1L, "bmp")),   // 17×17
      (2L, "just text".getBytes("UTF-8")),             // undecodable
      (9L, null: Array[Byte])).toDF("doc_id", "blob")
    val out = MediaPipeline.resize(df, width = 4, height = 4, batchSize = 2)
      .collect().map(r => r.doc_id -> r).toMap
    assert(out.size == 4)
    assert(out.values.forall(r => r.pixels.length == 4 * 4 * 3 && r.width == 4 && r.height == 4))
    assert(out(9L).pixels.forall(_ == 0) && out(2L).pixels.forall(_ == 0))
    // nearest sampling: out(x,y) = src(⌊x·sw/4⌋, ⌊y·sh/4⌋), channels from the formula
    for ((id, sw, sh) <- Seq((0L, 16, 16), (1L, 17, 17)); y <- 0 until 4; x <- 0 until 4) {
      val base = id + 3L * (x * sw / 4) + 7L * (y * sh / 4)
      val o = (y * 4 + x) * 3
      val px = out(id).pixels
      assert((px(o) & 0xFF) == java.lang.Math.floorMod(base, 256L).toInt, s"doc $id ($x,$y) R")
      assert((px(o + 1) & 0xFF) == java.lang.Math.floorMod(base + 11L, 256L).toInt, s"doc $id ($x,$y) G")
      assert((px(o + 2) & 0xFF) == java.lang.Math.floorMod(base + 22L, 256L).toInt, s"doc $id ($x,$y) B")
    }
  }

  test("byte-histogram features: 256 dims, L1-normalized, content-sensitive") {
    val feats = MediaPipeline.byteHistogram(blobs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats.values.forall(_.length == 256))
    feats.foreach { case (id, f) =>
      assert(math.abs(f.sum - 1.0f) < 1e-5, s"doc $id not normalized")
    }
    assert(feats(0L) != feats(1L))
  }
}
