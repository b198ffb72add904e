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
  * The Spark-side plumbing here is REAL and tested: binary columns with
  * magic-byte sniffing (codegen'd expressions), per-partition batched
  * decode with a typed output schema, and a 256-bin byte-histogram
  * feature extractor (the exact shape of an embedding/feature UDF:
  * binary in → float vector out, computed in batches inside
  * mapPartitions). The pixel/sample DECODE itself is a clearly-marked
  * STUB — image/audio codecs do not ship in this container — that
  * derives deterministic fake dimensions instead of calling a codec.
  */
object MediaPipeline {

  /** Magic-byte container sniffing — real logic, pure expressions. */
  def sniffFormat(blob: Column): Column = {
    val magic8 = hex(substring(blob, 1, 8))
    when(magic8.startsWith("89504E47"), "png")
      .when(magic8.startsWith("FFD8FF"), "jpeg")
      .when(magic8.startsWith("47494638"), "gif")
      .when(magic8.startsWith("52494646"), "riff") // wav/avi container
      .when(magic8.startsWith("1A45DFA3"), "mkv")
      .otherwise("unknown")
  }

  /** Batched "decode": one pass per partition, items processed in batches
    * of `batchSize` exactly like a codec/model invocation would be.
    *
    * ==== STUB ==== The dimension extraction below fabricates
    * deterministic width/height from the blob bytes; a real deployment
    * replaces ONLY the body of `decodeOne` with the codec call — the
    * partitioning, batching, schema and null-handling stay as-is.
    */
  def decodeMeta(df: DataFrame, batchSize: Int = 64): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // real codecs amortize setup per batch; the stub has none
          batch.iterator.map { case (id, blob) =>
            decodeOne(id, if (blob == null) Array.emptyByteArray else blob)
          }
        }
      }
  }

  /** STUB decode of a single item (deterministic fake dimensions).
    * Magic checks use the SAME prefixes as [[sniffFormat]] (3-byte
    * FFD8FF / 4-byte 89504E47) — a 2-byte check would classify blobs the
    * sniffer calls "unknown", and the two classifiers in one pipeline
    * must agree.
    */
  private def decodeOne(id: Long, blob: Array[Byte]): MediaMeta = {
    val fmt =
      if (blob.length >= 4 && blob(0) == 0x89.toByte && blob(1) == 'P'
          && blob(2) == 'N' && blob(3) == 'G') "png"
      else if (blob.length >= 3 && blob(0) == 0xFF.toByte && blob(1) == 0xD8.toByte
          && blob(2) == 0xFF.toByte) "jpeg"
      else "unknown"
    val h = java.util.Arrays.hashCode(blob)
    MediaMeta(id, fmt,
      width = 16 + math.floorMod(h, 64) * 16,
      height = 16 + math.floorMod(h >> 8, 64) * 16,
      n_bytes = blob.length.toLong)
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

  /** Resized image payload (target dims + stub pixel buffer). */
  final case class Resized(doc_id: Long, width: Int, height: Int,
                           pixels: Array[Byte])

  /** Resize stage: binary in → fixed-size binary out, batched per
    * partition — the shape of a preprocessing step feeding a vision
    * encoder (every output is exactly width·height·3 bytes, so downstream
    * batch tensors are rectangular by construction).
    *
    * ==== STUB ==== fills the RGB buffer by cycling the source bytes
    * (deterministic, content-dependent) instead of decode+interpolate;
    * swap ONLY the buffer fill for a codec call.
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
            val out = new Array[Byte](outLen)
            if (blob.length > 0) {
              var i = 0
              while (i < outLen) { out(i) = blob(i % blob.length); i += 1 }
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
