package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Per-item decoded metadata (the schema a real image/audio decode batch
  * returns).
  */
final case class MediaMeta(
    doc_id: Long,
    format: String,
    width: Int,
    height: Int,
    n_bytes: Long)

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata, plus decode / feature-extract stages.
  *
  * Image decode is REAL: [[decodeMeta]], [[pixelStats]] and [[resize]]
  * run `javax.imageio.ImageIO` (PNG/BMP/GIF ship with the JDK — no new
  * dependency) inside the batched `mapPartitions` plumbing, and the gate
  * verifies decoded dimensions and channel sums against a closed-form
  * oracle over [[syntheticImage]]'s deterministic pixels. The one
  * remaining stub is VIDEO demuxing ([[frameSample]] slices container
  * bytes instead of extracting packets — the JDK has no demuxer), and it
  * is labeled as such there.
  */
object MediaPipeline {

  /** Magic-byte container sniffing — real logic, pure expressions. */
  def sniffFormat(blob: Column): Column = {
    val magic8 = hex(substring(blob, 1, 8))
    when(magic8.startsWith("89504E47"), "png")
      .when(magic8.startsWith("FFD8FF"), "jpeg")
      .when(magic8.startsWith("47494638"), "gif")
      .when(magic8.startsWith("424D"), "bmp")
      .when(magic8.startsWith("52494646"), "riff") // wav/avi container
      .when(magic8.startsWith("1A45DFA3"), "mkv")
      .otherwise("unknown")
  }

  /** JVM-side magic sniff, byte-for-byte the same classification as the
    * [[sniffFormat]] expression (the two classifiers in one pipeline
    * must agree).
    */
  private def sniffBytes(blob: Array[Byte]): String =
    if (blob.length >= 4 && blob(0) == 0x89.toByte && blob(1) == 'P'
        && blob(2) == 'N' && blob(3) == 'G') "png"
    else if (blob.length >= 3 && blob(0) == 0xFF.toByte && blob(1) == 0xD8.toByte
        && blob(2) == 0xFF.toByte) "jpeg"
    else if (blob.length >= 4 && blob(0) == 'G' && blob(1) == 'I'
        && blob(2) == 'F' && blob(3) == '8') "gif"
    else if (blob.length >= 2 && blob(0) == 'B' && blob(1) == 'M') "bmp"
    else "unknown"

  /** REAL decode of one blob: `ImageIO.read` (null on undecodable input —
    * ImageIO's contract for unrecognized containers and our signal for
    * corrupt rows: format stays the sniffed container, dims go 0).
    */
  private def readImage(blob: Array[Byte]): java.awt.image.BufferedImage =
    if (blob.isEmpty) null
    else
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
      catch { case _: Exception => null }

  /** Deterministic synthetic image for a doc id — the pixels the gate
    * oracle regenerates in closed form (DuckDB cannot run a PNG codec,
    * so verifying a REAL decode needs content that is both codec-real
    * and SQL-predictable): width = 16 + id % 17, height = 16 + id % 13,
    * channel values (id + 3x + 7y + 11c) mod 256 for c = 0,1,2 (R,G,B).
    * Encoded with the requested JDK codec; PNG and BMP are lossless RGB
    * (pixels survive the round trip exactly), GIF palette-quantizes
    * (dims survive, pixels need not — dims-only checks there).
    */
  def syntheticImage(docId: Long, format: String): Array[Byte] = {
    val w = 16 + (docId % 17).toInt
    val h = 16 + (docId % 13).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = docId + 3L * x + 7L * y
        val r = java.lang.Math.floorMod(base, 256L).toInt
        val g = java.lang.Math.floorMod(base + 11L, 256L).toInt
        val b = java.lang.Math.floorMod(base + 22L, 256L).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, format, bos),
      s"no JDK ImageIO writer for format '$format'")
    bos.toByteArray
  }

  /** Batched REAL decode: one pass per partition, items processed in
    * batches of `batchSize` exactly like a model invocation would be;
    * each item goes through `ImageIO.read` and reports its actual
    * decoded dimensions (0×0 when the codec rejects the blob).
    */
  def decodeMeta(df: DataFrame, batchSize: Int = 64): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, blobOrNull) =>
            val blob = if (blobOrNull == null) Array.emptyByteArray else blobOrNull
            val img = readImage(blob)
            MediaMeta(id, sniffBytes(blob),
              width = if (img == null) 0 else img.getWidth,
              height = if (img == null) 0 else img.getHeight,
              n_bytes = blob.length.toLong)
          }
        }
      }
  }

  /** Per-image pixel statistics off the REAL decode: decoded dims plus
    * per-channel pixel sums — the content-level check that the codec
    * round trip is byte-exact, not just shape-preserving (any single
    * wrong pixel shifts a channel sum). Undecodable blobs report 0 dims
    * and 0 sums.
    */
  final case class PixelStats(doc_id: Long, width: Long, height: Long,
                              sum_r: Long, sum_g: Long, sum_b: Long)

  def pixelStats(df: DataFrame, batchSize: Int = 64): Dataset[PixelStats] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, blobOrNull) =>
            val blob = if (blobOrNull == null) Array.emptyByteArray else blobOrNull
            val img = readImage(blob)
            if (img == null) PixelStats(id, 0, 0, 0, 0, 0)
            else {
              var sr = 0L; var sg = 0L; var sb = 0L
              var y = 0
              while (y < img.getHeight) {
                var x = 0
                while (x < img.getWidth) {
                  val p = img.getRGB(x, y)
                  sr += (p >> 16) & 0xFF
                  sg += (p >> 8) & 0xFF
                  sb += p & 0xFF
                  x += 1
                }
                y += 1
              }
              PixelStats(id, img.getWidth.toLong, img.getHeight.toLong, sr, sg, sb)
            }
          }
        }
      }
  }

  /** One sampled frame payload of a video/container blob. */
  final case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame sampling for video binary columns: every `stride`-th offset
    * yields one fixed-size `frameBytes` payload, at most `maxFrames` per
    * doc — the bounded fan-out a trainer's frame sampler needs (an
    * UNbounded explode of a long video is the multimodal analogue of a
    * hub vertex: one row that floods a partition).
    *
    * ==== STUB ==== a real demuxer replaces the byte slicing with
    * container packet extraction + keyframe decode; the per-partition
    * batching, the bound, and the (doc_id, frame_idx, frame) schema are
    * the real plumbing — and because the stub is pure byte slicing, the
    * gate ORACLE can replay it exactly (hex-slice in SQL), so the batch
    * path is content-verified end to end, not just shape-checked.
    */
  def frameSample(df: DataFrame, frameBytes: Int = 48, stride: Int = 128,
                  maxFrames: Int = 8, batchSize: Int = 64): Dataset[Frame] = {
    require(frameBytes > 0 && stride > 0 && maxFrames > 0)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { case (id, blobOrNull) =>
            val blob = if (blobOrNull == null) Array.emptyByteArray else blobOrNull
            val n =
              if (blob.length < frameBytes) 0
              else math.min(maxFrames, (blob.length - frameBytes) / stride + 1)
            (0 until n).iterator.map { i =>
              Frame(id, i,
                java.util.Arrays.copyOfRange(blob, i * stride, i * stride + frameBytes))
            }
          }
        }
      }
  }

  /** Resized image payload (target dims + interleaved RGB buffer). */
  final case class Resized(doc_id: Long, width: Int, height: Int,
                           pixels: Array[Byte])

  /** Resize stage off the REAL decode: binary in → fixed-size RGB buffer
    * out, batched per partition — the preprocessing step feeding a
    * vision encoder (every output is exactly width·height·3 bytes, so
    * downstream batch tensors are rectangular by construction).
    * Sampling is nearest-neighbor with explicit integer index math
    * (src = ⌊dst·srcDim/dstDim⌋) rather than Graphics2D interpolation:
    * the resample is then bit-deterministic across JVMs and replayable
    * by a closed-form oracle over [[syntheticImage]] pixels.
    * Undecodable blobs yield a zero buffer.
    */
  def resize(df: DataFrame, width: Int = 32, height: Int = 32,
             batchSize: Int = 64): Dataset[Resized] = {
    require(width > 0 && height > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val outLen = width * height * 3
    df.select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, blobOrNull) =>
            val blob = if (blobOrNull == null) Array.emptyByteArray else blobOrNull
            val img = readImage(blob)
            val out = new Array[Byte](outLen)
            if (img != null) {
              val (sw, sh) = (img.getWidth, img.getHeight)
              var y = 0
              while (y < height) {
                val sy = y * sh / height
                var x = 0
                while (x < width) {
                  val p = img.getRGB(x * sw / width, sy)
                  val o = (y * width + x) * 3
                  out(o) = ((p >> 16) & 0xFF).toByte
                  out(o + 1) = ((p >> 8) & 0xFF).toByte
                  out(o + 2) = (p & 0xFF).toByte
                  x += 1
                }
                y += 1
              }
            }
            Resized(id, width, height, out)
          }
        }
      }
  }

  /** REAL feature extraction: L1-normalized 256-bin byte histogram per
    * blob — binary → float-vector, the standard multimodal feature shape
    * (swap the body for pixel/CLIP features; schema stays).
    */
  def byteHistogram(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, blob) =>
          val counts = new Array[Float](256)
          if (blob != null) {
            var i = 0
            while (i < blob.length) { counts(blob(i) & 0xFF) += 1f; i += 1 }
            if (blob.length > 0) {
              var j = 0
              while (j < 256) { counts(j) /= blob.length; j += 1 }
            }
          }
          (id, counts)
        }
      }
      .toDF("doc_id", "features")
  }
}
