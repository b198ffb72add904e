package graft.core

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Snapshot-versioned Parquet table layer.
  *
  * The north rule asks for Iceberg-style checkpoints with per-partition
  * lineage and iteration metrics; no Iceberg runtime jar ships in this
  * sandbox (`/opt/spark/jars`), so this thin layer emulates the snapshot
  * semantics we need on plain Parquet directories:
  *
  * {{{
  *   dir/snapshot=00007/...parquet      // data of snapshot 7
  *   dir/_manifests/00007.json          // commit metadata for snapshot 7
  * }}}
  *
  * A snapshot is visible iff its manifest exists (manifest write is the
  * atomic commit point, written after the data), so a torn write is never
  * picked up by `latest`. The manifest records per-partition lineage
  * (partitionId, rowCount, order-independent checksum) plus the caller's
  * iteration metrics, and `latest` re-validates total rows + checksum on
  * resume. Swap-in for a real Iceberg catalog is confined to this file.
  */
object TableIO {

  final case class PartitionStat(partitionId: Int, rowCount: Long, checksum: Long)

  final case class Manifest(
      snapshot: Int,
      iteration: Int,
      rowCount: Long,
      /** XOR of per-partition checksums — order/partitioning independent. */
      checksum: Long,
      partitions: Seq[PartitionStat],
      metrics: Map[String, Double],
      committedAtMs: Long
  )

  private def manifestDir(dir: String) = Paths.get(dir, "_manifests")
  private def snapshotPath(dir: String, snap: Int) = f"$dir/snapshot=$snap%05d"

  /** Per-partition (rowCount, checksum) of a DataFrame as currently
    * partitioned. Checksum = XOR of xxhash64 over all columns per row —
    * commutative/associative and overflow-free (ANSI mode), so the
    * table-level XOR is stable across repartitionings.
    */
  def partitionStats(df: DataFrame): Seq[PartitionStat] = {
    val cols = df.columns.map(col)
    df.select(
        spark_partition_id().as("pid"),
        xxhash64(cols.toSeq: _*).as("h"))
      .groupBy("pid")
      .agg(count(lit(1)).as("rows"), expr("bit_xor(h)").as("chk"))
      .collect()
      .map(r => PartitionStat(r.getInt(0), r.getLong(1), if (r.isNullAt(2)) 0L else r.getLong(2)))
      .toSeq
      .sortBy(_.partitionId)
  }

  /** Write `df` as the next snapshot of `dir` and commit a manifest. */
  def commit(df: DataFrame, dir: String, iteration: Int, metrics: Map[String, Double]): Manifest = {
    val snap = latestSnapshotId(dir).getOrElse(-1) + 1
    val dataPath = snapshotPath(dir, snap)
    df.write.mode("overwrite").parquet(dataPath)
    // Stats computed on the data as written (re-read => lineage of the
    // checkpoint, not of the in-memory plan).
    val written = df.sparkSession.read.parquet(dataPath)
    val parts = partitionStats(written)
    val m = Manifest(
      snapshot = snap,
      iteration = iteration,
      rowCount = parts.map(_.rowCount).sum,
      checksum = parts.map(_.checksum).foldLeft(0L)(_ ^ _),
      partitions = parts,
      metrics = metrics,
      committedAtMs = System.currentTimeMillis()
    )
    Files.createDirectories(manifestDir(dir))
    val tmp = manifestDir(dir).resolve(f".${snap}%05d.json.tmp")
    val fin = manifestDir(dir).resolve(f"${snap}%05d.json")
    Files.write(tmp, renderJson(m).getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, fin, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    m
  }

  def latestSnapshotId(dir: String): Option[Int] = {
    val md = manifestDir(dir)
    if (!Files.isDirectory(md)) return None
    // Close the directory stream (runs on every commit/resume — an open
    // stream per superstep leaks one fd until GC).
    val listing = Files.list(md)
    val ids =
      try listing.iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.endsWith(".json") && !n.startsWith("."))
        .map(_.stripSuffix(".json").toInt)
        .toSeq
      finally listing.close()
    if (ids.isEmpty) None else Some(ids.max)
  }

  /** Latest committed snapshot: (manifest, data). Validates row count and
    * table checksum against the manifest; throws on mismatch (a resume from
    * corrupt state must fail loudly, not silently diverge).
    */
  def latest(spark: SparkSession, dir: String): Option[(Manifest, DataFrame)] =
    latestSnapshotId(dir).map { snap =>
      val m = readManifest(dir, snap)
      val df = spark.read.parquet(snapshotPath(dir, snap))
      val parts = partitionStats(df)
      val rows = parts.map(_.rowCount).sum
      val chk = parts.map(_.checksum).foldLeft(0L)(_ ^ _)
      require(rows == m.rowCount && chk == m.checksum,
        s"checkpoint $dir snapshot $snap failed validation: " +
          s"rows $rows/${m.rowCount} checksum $chk/${m.checksum}")
      (m, df)
    }

  def readManifest(dir: String, snap: Int): Manifest = {
    val txt = new String(
      Files.readAllBytes(manifestDir(dir).resolve(f"$snap%05d.json")),
      StandardCharsets.UTF_8)
    parseJson(txt)
  }

  // --- minimal hand-rolled JSON (no external deps available) ---

  private def renderJson(m: Manifest): String = {
    val parts = m.partitions
      .map(p => s"""{"partitionId":${p.partitionId},"rowCount":${p.rowCount},"checksum":${p.checksum}}""")
      .mkString("[", ",", "]")
    val met = m.metrics.toSeq.sortBy(_._1)
      // NaN/Infinity are not legal JSON and would poison any external
      // json.load of the manifest; a non-finite metric carries no
      // information, so render it as null (parse skips it).
      .map { case (k, v) =>
        val r = if (v.isNaN || v.isInfinite) "null" else v.toString
        s""""$k":$r"""
      }
      .mkString("{", ",", "}")
    s"""{"snapshot":${m.snapshot},"iteration":${m.iteration},"rowCount":${m.rowCount},""" +
      s""""checksum":${m.checksum},"committedAtMs":${m.committedAtMs},""" +
      s""""metrics":$met,"partitions":$parts}"""
  }

  /** Parses exactly the JSON this object writes (numbers + flat structure). */
  private def parseJson(s: String): Manifest = {
    def num(key: String): String = {
      val m = s"""\"$key\":(-?[0-9.eE+-]+)""".r.findFirstMatchIn(s)
      m.getOrElse(throw new IllegalArgumentException(s"manifest missing $key")).group(1)
    }
    val partRe = """\{"partitionId":(-?\d+),"rowCount":(\d+),"checksum":(-?\d+)\}""".r
    val partsBlock = s.substring(s.indexOf("\"partitions\":"))
    val parts = partRe.findAllMatchIn(partsBlock)
      .map(m => PartitionStat(m.group(1).toInt, m.group(2).toLong, m.group(3).toLong))
      .toSeq
    val metRe = """"([a-zA-Z0-9_]+)":(-?[0-9.eE+-]+)""".r
    val metStart = s.indexOf("\"metrics\":")
    val metEnd = s.indexOf("}", metStart)
    val metrics = metRe.findAllMatchIn(s.substring(metStart + 10, metEnd + 1))
      .map(m => m.group(1) -> m.group(2).toDouble)
      .toMap
    Manifest(num("snapshot").toInt, num("iteration").toInt, num("rowCount").toLong,
      num("checksum").toLong, parts, metrics, num("committedAtMs").toLong)
  }
}
