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

  test("batched decode: typed schema, deterministic stub dims, exact byte counts") {
    val metas = MediaPipeline.decodeMeta(blobs, batchSize = 2).collect()
      .map(m => m.doc_id -> m).toMap
    assert(metas(0L).format == "png" && metas(1L).format == "jpeg")
    assert(metas(0L).n_bytes == 108 && metas(1L).n_bytes == 54)
    assert(metas(0L).width >= 16 && metas(0L).height >= 16)
    // deterministic: second run identical
    val again = MediaPipeline.decodeMeta(blobs.repartition(3)).collect()
      .map(m => m.doc_id -> m).toMap
    assert(again == metas)
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

  test("resize: every output exactly width*height*3 bytes, content-dependent, null-safe") {
    val out = MediaPipeline.resize(blobs.union(Seq((9L, null: Array[Byte])).toDF("doc_id", "blob")),
        width = 4, height = 4, batchSize = 2).collect().map(r => r.doc_id -> r).toMap
    assert(out.size == 4)
    assert(out.values.forall(r => r.pixels.length == 4 * 4 * 3 && r.width == 4 && r.height == 4))
    assert(!out(0L).pixels.sameElements(out(1L).pixels))
    assert(out(9L).pixels.forall(_ == 0)) // null blob → zero buffer, not a crash
    // stub fill is cyclic source bytes
    assert(out(2L).pixels.take(9).sameElements("just text".getBytes("UTF-8")))
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
