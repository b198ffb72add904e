package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EventStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("streaming hourly aggregation equals the batch aggregation") {
    // streaming file source needs a DIRECTORY: stage the single parquet
    // file into a temp dir (with several copies ≙ several micro-batches)
    val srcDir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      srcDir.resolve("part-0.parquet"))
    // ts is TimestampNTZ in Spark 4 parquet reads → generic get, not getTimestamp
    val batch = EventStream.hourlyAgg(spark.read.parquet(srcDir.toString))
      .collect().map(r => (r.get(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val streamed = EventStream.runOnce(spark, srcDir.toString, "ev_test")
      .collect().map(r => (r.get(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("sessionization: gap splits, per-session bounds and counts") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2025-01-01 00:00:00")
    def ts(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val events = Seq(
      (1L, ts(0), 1.0), (1L, ts(10), 2.0), (1L, ts(70), 3.0), // gap 60 > 30 → split
      (2L, ts(5), 4.0)).toDF("user_id", "ts", "value")
    val got = EventStream.sessionize(events, gapMinutes = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(4), r.getDouble(5))).toMap
    assert(got == Map(
      (1L, 1L) -> (2L, 3.0), // first session: 2 events, value 1+2
      (1L, 2L) -> (1L, 3.0),
      (2L, 1L) -> (1L, 4.0)))
  }
}
