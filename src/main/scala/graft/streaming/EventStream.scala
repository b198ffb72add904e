package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Structured Streaming face of the engine: the events table consumed as
  * a stream (file source), watermarked, aggregated in tumbling event-time
  * windows — the same aggregation RelationalQueries.eventsHourly runs in
  * batch (spec asserts stream == batch; that equivalence is the point of
  * the unified Dataset model).
  *
  * At crawl scale this is the continuous-ingest path: new WARC/event
  * partitions land in the source directory and the checkpointed query
  * incrementally maintains the hourly aggregates; `withWatermark` bounds
  * state exactly like the reference bounds its frontier memory.
  */
object EventStream {

  /** The shared aggregation, applied to either a batch or streaming df.
    * Parquet event times arrive as TIMESTAMP_NTZ; watermarks require
    * TIMESTAMP — cast is exact under the fixed UTC session timezone.
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("value")), 3).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("sum_value"))

  /** Run the streaming query over a parquet directory until all available
    * input is processed; results land in an in-memory table `name`.
    */
  def runOnce(spark: SparkSession, sourceDir: String, name: String): DataFrame = {
    val schema = spark.read.parquet(sourceDir).schema
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(sourceDir)
    val q: StreamingQuery = hourlyAgg(stream).writeStream
      .outputMode(OutputMode.Complete())
      .format("memory")
      .queryName(name)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }

  /** Sessionization with custom state: gap-based sessions per user via
    * flatMapGroupsWithState — the `KeyValueGroupedDataset` stateful path
    * (here exposed as a deterministic batch-computable equivalent using a
    * window lag/cumsum, which IS the semantics the stateful operator
    * maintains incrementally).
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapMinutes * 60L, 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 3).as("sum_value"))
  }
}
