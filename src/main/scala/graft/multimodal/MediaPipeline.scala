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
