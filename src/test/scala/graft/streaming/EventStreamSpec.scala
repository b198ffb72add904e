package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EventStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  /** Stage the events table into a stream-source dir, then append
    * far-future sentinel rows (twice — the batch that ADVANCES the
    * watermark emits nothing; the next one flushes) so every real
    * window/session is sealed in Append mode.
    */
  private def withSentinels(test: (String, java.sql.Timestamp) => Unit): Unit = {
    import spark.implicits._
    val srcDir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      srcDir.resolve("part-0.parquet"))
    val maxTs = spark.read.parquet(srcDir.toString)
      .agg(max(col("ts").cast("timestamp"))).head().getTimestamp(0)
    val sentinelTs = new java.sql.Timestamp(maxTs.getTime + 365L * 24 * 3600 * 1000)
    test(srcDir.toString, sentinelTs)
  }

  private def addSentinel(srcDir: String, ts: java.sql.Timestamp, name: String): Unit = {
    // Clone one source row and rewrite its fields: keeps the exact schema
    // (ts is TimestampNTZ in Spark 4 parquet; cast is exact under the
    // fixed UTC session timezone).
    val tmp = java.nio.file.Files.createTempDirectory("graft-sentinel")
    spark.read.parquet(s"$srcDir/part-0.parquet").limit(1)
      .withColumn("event_id", lit(-1L))
      .withColumn("ts", lit(ts).cast("timestamp_ntz"))
      .withColumn("user_id", lit(-1L))
      .withColumn("event_type", lit("sentinel"))
      .withColumn("value", lit(-1.0))
      .coalesce(1).write.mode("overwrite").parquet(tmp.resolve("d").toString)
    // the file source lists FILES in srcDir (not subdirs): move the part
    // file in as a sibling of part-0.parquet
    val part = java.nio.file.Files.list(tmp.resolve("d")).iterator()
    val found = Iterator.continually(part).takeWhile(_.hasNext).map(_.next())
      .find(_.getFileName.toString.endsWith(".parquet")).get
    java.nio.file.Files.copy(found, java.nio.file.Paths.get(s"$srcDir/$name.parquet"))
  }

  test("streaming hourly aggregation (Append, watermark-evicted state) equals batch") {
    withSentinels { (srcDir, sentinelTs) =>
      val batch = EventStream.hourlyAgg(spark.read.parquet(s"$srcDir/part-0.parquet"))
        .collect().map(r => (r.get(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
      val drain = EventStream.runOnce(spark, srcDir, "ev_test")
      drain.drain()
      addSentinel(srcDir, sentinelTs, "sent1")
      drain.drain()
      addSentinel(srcDir, new java.sql.Timestamp(sentinelTs.getTime + 3600_000L), "sent2")
      val streamed = drain.stop()
        .filter(col("event_type") =!= "sentinel")
        .collect().map(r => (r.get(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
      assert(streamed == batch)
      assert(batch.nonEmpty)
    }
  }

  test("streaming SLIDING windows (1h/30min, Append) equal batch; every event in 2 windows") {
    withSentinels { (srcDir, sentinelTs) =>
      val batchDf = EventStream.slidingAgg(spark.read.parquet(s"$srcDir/part-0.parquet"))
      val batch = batchDf
        .collect().map(r => (r.get(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
      // Sliding coverage: total window-contributions = 2 × event count.
      val nEvents = spark.read.parquet(s"$srcDir/part-0.parquet").count()
      assert(batch.values.map(_._1).sum == 2 * nEvents)
      val schema = spark.read.parquet(srcDir).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val drain = EventStream.startDrain(EventStream.slidingAgg(stream), "ev_sliding",
        org.apache.spark.sql.streaming.OutputMode.Append())
      drain.drain()
      addSentinel(srcDir, sentinelTs, "sent1s")
      drain.drain()
      addSentinel(srcDir, new java.sql.Timestamp(sentinelTs.getTime + 3600_000L), "sent2s")
      val streamed = drain.stop()
        .filter(col("event_type") =!= "sentinel")
        .collect().map(r => (r.get(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
      assert(streamed == batch)
      assert(batch.nonEmpty)
    }
  }

  test("stream-static enrichment (broadcast dim, stateless) equals batch") {
    withSentinels { (srcDir, _) =>
      val ev = spark.read.parquet(s"$srcDir/part-0.parquet")
      val dim = graft.queries.RelationalQueries.userTierDim(ev)
      val batch = EventStream.enrich(ev, dim, Seq("user_id"))
        .select(col("event_id"), col("tier"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val stream = spark.readStream.schema(ev.schema).parquet(srcDir)
      val drain = EventStream.startDrain(
        EventStream.enrich(stream, dim, Seq("user_id"))
          .select(col("event_id"), col("tier")),
        "ev_enrich", org.apache.spark.sql.streaming.OutputMode.Append())
      val streamed = drain.stop()
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(streamed == batch)
      assert(batch.nonEmpty)
      // Left-join contract: every event survives (dim covers all users
      // here, but the map sizes pin no row was dropped by the join).
      assert(batch.size == ev.count())
    }
  }

  test("STREAM-STREAM interval join (attribution) equals batch; inner join emits without watermark wait") {
    withSentinels { (srcDir, _) =>
      val ev = spark.read.parquet(s"$srcDir/part-0.parquet")
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val batch = EventStream.attributionJoin(ev).collect().map(key).toSet
      assert(batch.nonEmpty)
      // Same function over a readStream: BOTH join sides buffer in the
      // state store, watermark + range predicate bound the buffered views.
      val stream = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val drain = EventStream.startDrain(EventStream.attributionJoin(stream),
        "ev_attrib", org.apache.spark.sql.streaming.OutputMode.Append())
      val streamed = drain.stop().collect().map(key).toSet
      assert(streamed == batch)
    }
  }

  test("STREAM-STREAM join state is watermark-BOUNDED: buffered views evict once unmatchable") {
    import spark.implicits._
    val srcDir = java.nio.file.Files.createTempDirectory("graft-attrib-state").toString
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
    def ev(id: Long, user: Long, typ: String, minute: Long) =
      (id, new java.sql.Timestamp(base + minute * 60000L), user, typ, 1.0, "")
    // Batch A: 40 views + their purchases inside one lookback window.
    val batchA = ((1L to 40L).map(u => ev(u, u, "view", u % 10)) ++
      (1L to 40L).map(u => ev(100 + u, u, "purchase", 30))).toSeq
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    writePart(batchA, srcDir, "a")
    val stream = spark.readStream.schema(batchA.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val drain = EventStream.startDrain(EventStream.attributionJoin(stream),
      "ev_attrib_state", org.apache.spark.sql.streaming.OutputMode.Append())
    drain.drain()
    def stateRows: Long = drain.query.recentProgress
      .filter(_.stateOperators.nonEmpty)
      .lastOption.map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
    val afterA = stateRows
    assert(afterA >= 80, s"both sides of batch A should be buffered, state=$afterA")
    // Batch B jumps event time 10 hours: the conversion watermark moves to
    // ~hour 9, making every batch-A view (< watermark - 4h lookback)
    // provably unmatchable. Batch C triggers the cleanup batch that runs
    // WITH that advanced watermark (watermarks take effect one batch late).
    writePart(((900L, 900L, "view", 600L) :: Nil).map(t => ev(t._1, t._2, t._3, t._4))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"), srcDir, "b")
    drain.drain()
    writePart(((901L, 901L, "purchase", 610L) :: Nil).map(t => ev(t._1, t._2, t._3, t._4))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"), srcDir, "c")
    drain.drain()
    val afterC = stateRows
    assert(afterC < afterA / 4,
      s"watermark did not evict batch-A join state: $afterA -> $afterC")
    // The A-era pairs were still all emitted before eviction.
    val out = drain.stop()
    assert(out.filter(col("conv_id") <= 200).count() == 40)
  }

  private def writePart(df: org.apache.spark.sql.DataFrame, srcDir: String, name: String): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-part")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.resolve("d").toString)
    val part = java.nio.file.Files.list(tmp.resolve("d")).iterator()
    val found = Iterator.continually(part).takeWhile(_.hasNext).map(_.next())
      .find(_.getFileName.toString.endsWith(".parquet")).get
    java.nio.file.Files.copy(found, java.nio.file.Paths.get(s"$srcDir/$name.parquet"))
  }

  test("STREAMING exact dedup: first arrival survives, duplicates within the horizon drop, state evicts past it") {
    import spark.implicits._
    val srcDir = java.nio.file.Files.createTempDirectory("graft-dedup-stream").toString
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(minutes: Long) = new java.sql.Timestamp(base.getTime + minutes * 60000L)
    writePart(Seq((1L, "alpha", ts(0)), (2L, "beta", ts(1)), (3L, "alpha", ts(2)))
      .toDF("doc_id", "text", "ts"), srcDir, "part-0")
    val drain = EventStream.runDedup(spark, srcDir, "dedup_test", horizon = "1 hour")
    drain.drain()
    writePart(Seq((4L, "beta", ts(3)), (5L, "gamma", ts(4)))
      .toDF("doc_id", "text", "ts"), srcDir, "part-1")
    drain.drain()
    // Stream survivors so far == batch Dedup.exact groups over the same
    // docs (everything within one horizon): one survivor per group, and
    // arrival order == doc_id order here, so survivor == keeper.
    val batchKeepers = graft.text.Dedup.exact(
      Seq((1L, "alpha"), (2L, "beta"), (3L, "alpha"), (4L, "beta"), (5L, "gamma"))
        .toDF("doc_id", "text"))
      .select("keeper").distinct().as[Long].collect().toSet
    val sofar = drain.table.select("doc_id").as[Long].collect().toSet
    assert(sofar == batchKeepers && sofar == Set(1L, 2L, 5L))
    // Output contract: the ORIGINAL columns, nothing else — the internal
    // watermark cast and fingerprint columns must not leak (ADVICE r3)
    assert(drain.table.columns.toSeq == Seq("doc_id", "text", "ts"))
    // The deterministic batch FACE (what the s_dedup_first gate query
    // verifies against DuckDB) yields the same survivors on this in-order
    // arrival sequence: first (ts, doc_id) row per fingerprint key.
    val face = EventStream.dedupBatchFace(
      Seq((1L, "alpha", ts(0)), (2L, "beta", ts(1)), (3L, "alpha", ts(2)),
          (4L, "beta", ts(3)), (5L, "gamma", ts(4))).toDF("doc_id", "text", "ts"),
      "ts", "doc_id").select("doc_id").as[Long].collect().toSet
    assert(face == sofar)
    // Advance the watermark far past horizon: alpha's seen-key state must
    // be EVICTED (this is what bounds memory), so a far-later duplicate
    // is a fresh first arrival, not a drop.
    writePart(Seq((6L, "omega", ts(600))).toDF("doc_id", "text", "ts"), srcDir, "part-2")
    drain.drain()
    writePart(Seq((7L, "alpha", ts(601))).toDF("doc_id", "text", "ts"), srcDir, "part-3")
    val finalDocs = drain.stop().select("doc_id").as[Long].collect().toSet
    assert(finalDocs == Set(1L, 2L, 5L, 6L, 7L),
      s"expected horizon-evicted re-duplicate to survive, got $finalDocs")
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

  test("STREAMING sessionization (flatMapGroupsWithState) equals batch sessionize") {
    withSentinels { (srcDir, sentinelTs) =>
      // cast NTZ → timestamp so batch session bounds compare exactly with
      // the stream's Timestamp output
      val events = spark.read.parquet(s"$srcDir/part-0.parquet")
        .withColumn("ts", col("ts").cast("timestamp"))
      val batch = EventStream.sessionize(events, gapMinutes = 30)
        .collect()
        .map(r => (r.getLong(0), r.get(2).toString, r.get(3).toString) ->
          (r.getLong(4), r.getDouble(5))).toMap

      val schema = events.schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val sessions = EventStream.sessionizeStream(stream, gapMinutes = 30)
      val drain = EventStream.startDrain(sessions.toDF(), "sess_test",
        org.apache.spark.sql.streaming.OutputMode.Append())
      drain.drain()
      addSentinel(srcDir, sentinelTs, "sent1")
      drain.drain()
      addSentinel(srcDir, new java.sql.Timestamp(sentinelTs.getTime + 3600_000L), "sent2")
      val streamed = drain.stop()
        .filter(col("user_id") =!= -1L)
        .collect()
        .map(r => (r.getLong(0), r.get(1).toString, r.get(2).toString) ->
          (r.getLong(3), r.getDouble(4))).toMap
      assert(streamed == batch)
      assert(batch.nonEmpty)
    }
  }

  test("sessionization gap boundary at SUB-second precision: stream == batch") {
    import spark.implicits._
    // batch compares unix_timestamp (floor-seconds) diffs; the stream must
    // use the same precision or events ~gap apart split differently.
    val srcDir = java.nio.file.Files.createTempDirectory("graft-subsec")
    val t0 = java.sql.Timestamp.valueOf("2025-01-01 10:00:00").getTime
    def ts(offMs: Long) = new java.sql.Timestamp(t0 + offMs)
    Seq(
      // 1800.4 s apart but floor-second diff = 1800 (not > gap) → ONE session
      (1L, ts(100), 1.0), (1L, ts(1800500), 2.0),
      // floor-second diff 1801 > 1800 → split
      (2L, ts(100), 3.0), (2L, ts(1801500), 4.0))
      .toDF("user_id", "ts", "value")
      .coalesce(1).write.mode("overwrite").parquet(srcDir.toString)

    val events = spark.read.parquet(srcDir.toString)
      .withColumn("ts", col("ts").cast("timestamp"))
    def key(r: org.apache.spark.sql.Row, o: Int) =
      (r.getLong(0), r.get(o).toString, r.get(o + 1).toString) ->
        (r.getLong(o + 2), r.getDouble(o + 3))
    val batch = EventStream.sessionize(events, gapMinutes = 30)
      .collect().map(key(_, 2)).toMap
    assert(batch.keys.count(_._1 == 1L) == 1, s"user 1 must be ONE session: $batch")
    assert(batch.keys.count(_._1 == 2L) == 2, s"user 2 must split: $batch")

    val schema = spark.read.parquet(srcDir.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
    val drain = EventStream.startDrain(
      EventStream.sessionizeStream(stream, gapMinutes = 30).toDF(), "sess_subsec",
      org.apache.spark.sql.streaming.OutputMode.Append())
    drain.drain()
    def sentinel(name: String, t: java.sql.Timestamp): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-subsec-sent")
      Seq((-1L, t, -1.0)).toDF("user_id", "ts", "value")
        .coalesce(1).write.mode("overwrite").parquet(tmp.resolve("d").toString)
      val listing = java.nio.file.Files.list(tmp.resolve("d"))
      try {
        val it = listing.iterator()
        Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
          .find(_.getFileName.toString.endsWith(".parquet"))
          .foreach(f => java.nio.file.Files.copy(
            f, java.nio.file.Paths.get(s"$srcDir/$name.parquet")))
      } finally listing.close()
    }
    val far = new java.sql.Timestamp(t0 + 365L * 24 * 3600 * 1000)
    sentinel("sent1", far); drain.drain()
    sentinel("sent2", new java.sql.Timestamp(far.getTime + 3600_000L))
    val streamed = drain.stop()
      .filter(col("user_id") =!= -1L)
      .collect().map(key(_, 1)).toMap
    assert(streamed == batch)
  }
}
