package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational coverage over the TPC-H-ish testdata tables (joins, windows,
  * set ops, time-bucketed event aggregation) + the multimodal binary
  * metadata path. Float determinism policy: sums restricted to
  * integer-valued doubles are exact in any order; order-sensitive sums are
  * rounded coarsely enough that cross-engine ulps cannot flip the digit.
  */
object RelationalQueries {

  /** Join pipeline: per-nation order count, total quantity, revenue.
    * Exercises a broadcast dim join (nation/customer side) feeding a
    * shuffle agg — at scale nation broadcasts, lineitem never re-sorts.
    */
  def joinAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val c = spark.read.parquet(s"$dir/customer.parquet")
    val n = spark.read.parquet(s"$dir/nation.parquet")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        countDistinct(col("o_orderkey")).as("n_orders"),
        sum(col("l_quantity")).as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 0).as("revenue"))
  }

  val joinAggSql: String =
    """SELECT n_name,
      |       count(DISTINCT o_orderkey) AS n_orders,
      |       sum(l_quantity) AS sum_qty,
      |       round(sum(l_extendedprice * (1.0 - l_discount)), 0) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name""".stripMargin

  /** Window functions: top-3 orders per customer by total price
    * (no arithmetic on the doubles → raw values compare exactly).
    */
  def windowTopOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    o.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("rk").cast("long").as("rk"))
  }

  val windowTopOrdersSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
      |  FROM orders
      |) t WHERE rk <= 3""".stripMargin

  /** Set operations: customers with orders but no high-value order
    * (EXCEPT), plus suppliers ∩ customers by nation (INTERSECT semantics
    * via keys).
    */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val withOrders = o.select(col("o_custkey").as("key")).distinct()
    val highValue = o.filter(col("o_totalprice") > 300000.0)
      .select(col("o_custkey").as("key")).distinct()
    withOrders.except(highValue).orderBy(col("key"))
  }

  val setOpsSql: String =
    """SELECT o_custkey AS key FROM orders
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0
      |ORDER BY key""".stripMargin

  /** EXISTS / NOT EXISTS face: per-market-segment counts of customers
    * WITH at least one high-value order (totalprice > 450000 — ~2/3 of
    * customers at the gate SFs, so BOTH branches carry rows; every
    * customer has *some* order, which would leave a bare NOT EXISTS
    * empty and unverified) and WITHOUT one — the has-activity split
    * every retention report starts from. Spelled as ONE pass: customer
    * left-joins the distinct qualifying custkeys and the match-null
    * becomes the status — both EXISTS branches from one scan of each
    * table, where the literal semi-join + anti-join spelling scans
    * customer twice. The filter pushes to the orders scan; the distinct
    * custkey side partial-aggregates map-side and broadcasts when small;
    * the status derivation is a pure projection.
    */
  def existsSplit(spark: SparkSession, dir: String): DataFrame = {
    val c = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    val od = spark.read.parquet(s"$dir/orders.parquet")
      .where(col("o_totalprice") > 450000.0)
      .select(col("o_custkey").as("c_custkey")).distinct()
      .withColumn("has", lit(1))
    c.join(od, Seq("c_custkey"), "left")
      .groupBy(col("c_mktsegment"),
        when(col("has").isNotNull, "has_big_order").otherwise("no_big_order")
          .as("status"))
      .agg(count(lit(1)).as("n_cust"))
  }

  val existsSplitSql: String =
    """SELECT c_mktsegment, 'has_big_order' AS status, count(*) AS n_cust
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000.0)
      |GROUP BY c_mktsegment
      |UNION ALL
      |SELECT c_mktsegment, 'no_big_order' AS status, count(*) AS n_cust
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000.0)
      |GROUP BY c_mktsegment""".stripMargin

  /** ROLLUP cube face: quantity/count at (returnflag, linestatus),
    * per-returnflag subtotals, and the grand total in ONE pass — Spark
    * plans grouping sets as a single Expand + aggregate, so the subtotal
    * levels cost one extra shuffle row per input row, not one extra scan
    * per level (the 100 TB difference between ROLLUP and a UNION of
    * re-aggregations). NULL group markers are replaced with 'ALL'
    * sentinels: both engines null out rolled-up keys, but a NULL group
    * key would be indistinguishable from genuine null data in the
    * compare.
    */
  def rollup(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
        col("sum_qty"), col("n"))

  val rollupSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
      |       coalesce(l_linestatus, 'ALL') AS l_linestatus,
      |       sum(l_quantity) AS sum_qty, count(*) AS n
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** CUBE face: every grouping-set combination of (returnflag, ship
    * year) — the full cross-tab report next to [[rollup]]'s hierarchy.
    * Same single-Expand plan property: Spark emits 4 grouping-set rows
    * per input row into ONE map-side-combined aggregate (one shuffle),
    * vs 4 separate scans+aggregates for the UNION spelling. Ship year
    * (an exact int both engines derive identically from the date) keeps
    * the cube's second axis low-cardinality, the CUBE sweet spot.
    */
  def cube(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_returnflag"), year(col("l_shipdate")).as("ship_year"),
        col("l_quantity"), col("l_extendedprice"))
      .cube(col("l_returnflag"), col("ship_year"))
      .agg(sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("ship_year").cast("long"), lit(-1L)).as("ship_year"),
        col("sum_qty"), col("sum_price"), col("n"))

  val cubeSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
      |       coalesce(CAST(year(l_shipdate) AS BIGINT), -1) AS ship_year,
      |       sum(l_quantity) AS sum_qty,
      |       sum(l_extendedprice) AS sum_price,
      |       count(*) AS n
      |FROM lineitem GROUP BY CUBE (l_returnflag, year(l_shipdate))""".stripMargin

  /** PIVOT face: hourly event matrix, one column per event type — the
    * wide-format report shape. Deliberately spelled as conditional
    * aggregation (`count(when(...))` per type) rather than
    * `RelationalGroupedDataset.pivot`: with a KNOWN value list the two are
    * semantically identical, but `.pivot` plans as TWO aggregates — a
    * partial count shuffled on (hour, type), then a `pivotfirst` shuffled
    * again on hour — while the conditional form is ONE map-side-combined
    * aggregate with a single shuffle on hour. At 100 TB that halves the
    * shuffle volume and drops the wider (hour, type) key space entirely.
    * (An IMPLICIT `.pivot` would additionally pay a full distinct scan to
    * discover the columns and yield a run-dependent schema.)
    */
  def eventsPivot(spark: SparkSession, dir: String): DataFrame = {
    def cnt(t: String) =
      count(when(col("event_type") === t, 1)).as(t)
    spark.read.parquet(s"$dir/events.parquet")
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(cnt("view"), cnt("click"), cnt("purchase"), cnt("signup"), cnt("error"))
  }

  val eventsPivotSql: String =
    """SELECT date_trunc('hour', ts) AS hour,
      |       count(*) FILTER (WHERE event_type = 'view') AS "view",
      |       count(*) FILTER (WHERE event_type = 'click') AS click,
      |       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |       count(*) FILTER (WHERE event_type = 'signup') AS signup,
      |       count(*) FILTER (WHERE event_type = 'error') AS error
      |FROM events GROUP BY 1""".stripMargin

  /** Tumbling 1-hour event aggregation — the batch face of the streaming
    * pipeline (graft.streaming.EventStream runs the identical aggregation
    * as a watermarked Structured Streaming query; the spec asserts
    * stream == batch).
    */
  def eventsHourly(spark: SparkSession, dir: String): DataFrame = {
    val e = spark.read.parquet(s"$dir/events.parquet")
    e.groupBy(
        date_trunc("hour", col("ts")).as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("value")), 3).as("sum_value"),
        countDistinct(col("user_id")).as("users"))
  }

  val eventsHourlySql: String =
    """SELECT date_trunc('hour', ts) AS hour, event_type,
      |       count(*) AS n,
      |       round(sum(value), 3) AS sum_value,
      |       count(DISTINCT user_id) AS users
      |FROM events
      |GROUP BY 1, 2""".stripMargin

  /** Approximate distinct users per hour via the engine's HLL kernel
    * (the [[graft.functions.Hll]] counter HyperBall iterates — here as
    * a standalone aggregate over the event stream, the shape a
    * dashboard's "unique visitors" query takes at 10¹² events where
    * exact distinct would shuffle every user id): per-row codegen'd
    * `hll_init` sketches, register-max merge (partial map-side — the
    * shuffle carries 64-byte sketches per group, never user ids),
    * estimator CASE at the end. The EXACT count rides along, so the
    * gate row also re-verifies the estimator's error profile at every
    * scale factor (not just its determinism).
    */
  def hllUsers(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Hll
    val e = spark.read.parquet(s"$dir/events.parquet")
    e.groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(
        countDistinct(col("user_id")).as("users"),
        Hll.hllCount(Hll.hllMergeAgg(Hll.hllInit(6)(col("user_id")))).as("users_hll"))
  }

  /** Oracle: the splitmix64 register chain + estimator CASE replayed in
    * closed form over the DISTINCT (hour, user) pairs (register-max is
    * idempotent, so per-event and per-distinct-user sketches agree) —
    * the same factored SQL the HyperBall oracle composes
    * ([[GraphQueries.hllRegSql]]/[[GraphQueries.hllEstSql]]).
    */
  lazy val hllUsersSql: String =
    s"""WITH hu AS MATERIALIZED (
       |  SELECT DISTINCT date_trunc('hour', ts) AS hour, user_id AS id FROM events),
       |uu AS (SELECT DISTINCT id FROM hu),
       |${graft.queries.GraphQueries.hllRegSql("uu", "u")},
       |ball AS (
       |  SELECT hu.hour, r.j, max(r.rho) AS rho
       |  FROM hu JOIN ureg r ON r.id = hu.id GROUP BY hu.hour, r.j),
       |est AS (
       |  SELECT hour, count(*) AS present, sum(power(2.0, -rho)) AS invp
       |  FROM ball GROUP BY hour),
       |ex AS (
       |  SELECT date_trunc('hour', ts) AS hour, count(DISTINCT user_id) AS users
       |  FROM events GROUP BY 1)
       |SELECT ex.hour, ex.users, ${graft.queries.GraphQueries.hllEstSql("est.present", "est.invp")} AS users_hll
       |FROM ex JOIN est ON est.hour = ex.hour""".stripMargin

  /** Sliding 1-hour/30-minute windows, batch face
    * ([[graft.streaming.EventStream.slidingAgg]] — the spec pins
    * stream == batch; this row pins batch == DuckDB).
    */
  def eventsSliding(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.EventStream.slidingAgg(
      spark.read.parquet(s"$dir/events.parquet"))

  /** Oracle: each event lands in exactly len/slide = 2 windows whose
    * starts are the two slide-aligned instants within the hour before it;
    * `time_bucket`'s 2000-01-01 origin is a whole multiple of 30 minutes
    * from the epoch, so the alignment matches Spark's epoch-aligned
    * `window()`.
    */
  val eventsSlidingSql: String =
    """WITH sh AS (
      |  SELECT unnest([INTERVAL '0' MINUTE, INTERVAL '30' MINUTE]) AS off
      |),
      |w AS (
      |  SELECT time_bucket(INTERVAL '30 minutes', ts) - off AS win_start,
      |         event_type, value
      |  FROM events CROSS JOIN sh
      |)
      |SELECT win_start, event_type, count(*) AS n,
      |       round(sum(value), 3) AS sum_value
      |FROM w GROUP BY 1, 2""".stripMargin

  /** Stream-static enrichment, batch face
    * ([[graft.streaming.EventStream.enrich]] — the spec pins stream ==
    * batch; this row pins batch == DuckDB): events joined to the derived
    * user-tier dimension (user_id mod 3 → free/pro/team), rolled up per
    * tier. The dim is broadcast, so the event side never shuffles for
    * the join; only the 3-key rollup exchanges.
    */
  def eventsEnriched(spark: SparkSession, dir: String): DataFrame = {
    val ev = spark.read.parquet(s"$dir/events.parquet")
    graft.streaming.EventStream.enrich(ev, userTierDim(ev), Seq("user_id"))
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 3).as("sum_value"))
  }

  /** The derived static dimension shared by the gate face and the
    * streaming spec: every user_id seen in `ev`, tiered by id mod 3.
    */
  def userTierDim(ev: DataFrame): DataFrame =
    ev.select(col("user_id")).distinct()
      .withColumn("tier",
        element_at(array(lit("free"), lit("pro"), lit("team")),
          (col("user_id") % 3 + 1).cast("int")))

  val eventsEnrichedSql: String =
    """WITH dim AS (
      |  SELECT DISTINCT user_id,
      |         CASE CAST(user_id % 3 AS INTEGER)
      |           WHEN 0 THEN 'free' WHEN 1 THEN 'pro' ELSE 'team' END AS tier
      |  FROM events)
      |SELECT d.tier, count(*) AS n, round(sum(e.value), 3) AS sum_value
      |FROM events e LEFT JOIN dim d USING (user_id)
      |GROUP BY d.tier""".stripMargin

  /** Gap-based sessionization, batch face
    * ([[graft.streaming.EventStream.sessionize]] — the exact semantics
    * the flatMapGroupsWithState stream maintains incrementally;
    * `EventStreamSpec` pins stream == batch, this gate row pins batch ==
    * DuckDB). 30-minute gap over the events table.
    */
  def sessions(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.EventStream.sessionize(
      spark.read.parquet(s"$dir/events.parquet"), gapMinutes = 30)

  /** Oracle replays lag → gap flag → cumulative session index → agg.
    * Gap compares FLOOR-seconds (Spark's `unix_timestamp` truncates;
    * DuckDB's `epoch` keeps the micros as a fraction, so it is floored
    * explicitly). The window session index is cast to BIGINT (DuckDB
    * integer sums widen to HUGEINT).
    */
  val sessionsSql: String =
    """WITH l AS (
      |  SELECT user_id, ts, value,
      |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
      |  FROM events),
      |n AS (
      |  SELECT user_id, ts, value,
      |         CASE WHEN prev_ts IS NULL
      |              OR CAST(floor(epoch(ts)) AS BIGINT)
      |                 - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800
      |              THEN 1 ELSE 0 END AS new_s
      |  FROM l),
      |s AS (
      |  SELECT user_id, ts, value,
      |         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
      |  FROM n)
      |SELECT user_id, session_idx,
      |       min(ts) AS session_start, max(ts) AS session_end,
      |       count(*) AS n_events, round(sum(value), 3) AS sum_value
      |FROM s GROUP BY user_id, session_idx""".stripMargin

  /** Stream-stream interval-join attribution, batch face
    * ([[graft.streaming.EventStream.attributionJoin]] — the spec pins
    * stream (two state-store-buffered sides, watermark-bounded) == batch;
    * this row pins batch == DuckDB): each purchase joined to the same
    * user's views in the 4 hours before it.
    */
  def attribution(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.EventStream.attributionJoin(
      spark.read.parquet(s"$dir/events.parquet"))

  /** delay_sec floors both timestamps to whole seconds (Spark's
    * `unix_timestamp` truncates; DuckDB's `epoch` keeps micros), matching
    * the sessionization convention; the RANGE predicate itself compares
    * full-precision timestamps on both engines.
    */
  val attributionSql: String =
    """SELECT c.event_id AS conv_id, v.event_id AS view_id, c.user_id,
      |       CAST(floor(epoch(c.ts)) AS BIGINT)
      |       - CAST(floor(epoch(v.ts)) AS BIGINT) AS delay_sec
      |FROM events c JOIN events v
      |  ON v.user_id = c.user_id
      | AND v.ts <= c.ts AND v.ts >= c.ts - INTERVAL 4 HOUR
      |WHERE c.event_type = 'purchase' AND v.event_type = 'view'""".stripMargin

  /** Multimodal metadata path: documents' text treated as an opaque binary
    * blob column — byte length + magic prefix, the schema/partitioning
    * plumbing a real image/audio pipeline needs (decode is stubbed in
    * graft.multimodal.BinaryOps; codecs don't ship in this sandbox).
    */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame = {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    d.select(
      col("doc_id"),
      col("text").cast("binary").as("blob"))
      .select(
        col("doc_id"),
        length(col("blob")).cast("long").as("n_bytes"),
        hex(substring(col("blob"), 1, 4)).as("magic"))
  }

  val binaryMetaSql: String =
    """SELECT doc_id,
      |       octet_length(encode(text)) AS n_bytes,
      |       left(hex(encode(text)), 8) AS magic
      |FROM documents""".stripMargin
  // magic: first 4 BYTES (8 hex chars), not first 4 characters —
  // left(text,4)||encode would take 4 CODEPOINTS and diverge from the
  // Spark substring-on-binary on any non-ASCII document.

  /** Frame sampling through the REAL batched mapPartitions path
    * ([[graft.multimodal.MediaPipeline.frameSample]]); frames come back
    * as hex so the oracle can verify CONTENT (DuckDB's md5 is
    * VARCHAR-only and it has no blob substring — hex-slicing the encoded
    * text replays the byte slicing exactly, same trick as binaryMeta's
    * magic column).
    */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
    graft.multimodal.MediaPipeline.frameSample(d).toDF()
      .select(col("doc_id"),
        col("frame_idx").cast("long").as("frame_idx"),
        hex(col("frame")).as("frame_hex"))
  }

  val frameSampleSql: String =
    """WITH b AS (
      |  SELECT doc_id, hex(encode(text)) AS hx,
      |         octet_length(encode(text)) AS len
      |  FROM documents
      |)
      |SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
      |       substring(hx, CAST(i * 256 + 1 AS BIGINT), 96) AS frame_hex
      |FROM b, (SELECT unnest(range(0, 8)) AS i) t
      |WHERE len >= 48 AND i <= (len - 48) // 128""".stripMargin
  // frameBytes=48, stride=128, maxFrames=8: hex offsets are 2× byte
  // offsets (i*128*2=i*256; 48*2=96 hex chars); range(0,8) caps frames.

  /** REAL image decode through the batched path: per doc a deterministic
    * synthetic image ([[graft.multimodal.MediaPipeline.syntheticImage]],
    * codec cycling png/bmp/gif by doc_id) is ENCODED with the JDK codec
    * and DECODED back with `ImageIO.read`; the gate face emits the
    * decoded (not requested) dimensions, so any codec round-trip failure
    * is a red row. The oracle replays the dimension formula in closed
    * form — DuckDB cannot run a PNG codec, which is exactly why the
    * synthetic pixels are SQL-predictable.
    */
  def decodeMetaImages(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long")).as[Long]
    val blobs = ids.map { id =>
      val fmt = (id % 3) match { case 0 => "png"; case 1 => "bmp"; case _ => "gif" }
      (id, graft.multimodal.MediaPipeline.syntheticImage(id, fmt))
    }.toDF("doc_id", "blob")
    graft.multimodal.MediaPipeline.decodeMeta(blobs).toDF()
      .select(col("doc_id"), col("format"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"))
  }

  val decodeMetaImagesSql: String =
    """SELECT doc_id,
      |       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png'
      |            WHEN 1 THEN 'bmp' ELSE 'gif' END AS format,
      |       CAST(16 + doc_id % 17 AS BIGINT) AS width,
      |       CAST(16 + doc_id % 13 AS BIGINT) AS height
      |FROM documents""".stripMargin

  /** Pixel-level check of the real decode: per-channel pixel sums over
    * the decoded image (PNG for every doc — lossless RGB, so the decoded
    * pixels must be bit-exact vs the synthesis formula; any single wrong
    * pixel shifts a channel sum). The oracle computes the same sums in
    * closed form by unnesting the (x, y) grid per document.
    */
  def pixelHist(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long")).as[Long]
    val blobs = ids.map { id =>
      (id, graft.multimodal.MediaPipeline.syntheticImage(id, "png"))
    }.toDF("doc_id", "blob")
    graft.multimodal.MediaPipeline.pixelStats(blobs).toDF()
  }

  val pixelHistSql: String =
    """WITH dims AS (
      |  SELECT doc_id, 16 + doc_id % 17 AS w, 16 + doc_id % 13 AS h
      |  FROM documents
      |)
      |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      |       CAST(sum((doc_id + 3*xs.x + 7*ys.y) % 256) AS BIGINT) AS sum_r,
      |       CAST(sum((doc_id + 3*xs.x + 7*ys.y + 11) % 256) AS BIGINT) AS sum_g,
      |       CAST(sum((doc_id + 3*xs.x + 7*ys.y + 22) % 256) AS BIGINT) AS sum_b
      |FROM dims
      |CROSS JOIN LATERAL (SELECT unnest(range(0, dims.w)) AS x) AS xs
      |CROSS JOIN LATERAL (SELECT unnest(range(0, dims.h)) AS y) AS ys
      |GROUP BY doc_id, w, h""".stripMargin

  /** Point-in-time join: each event picks up the customer's latest order
    * at-or-before the event timestamp, via the merge-based
    * [[graft.operators.AsOfJoin]] (one shuffle on the key, linear window
    * scan — at sf0.01 the naive range join would touch ~95k
    * (event, earlier-order) pairs for 10k events; the merge touches
    * |events| + |orders| rows). Orders are first deduped to one per
    * (custkey, orderdate) — greatest orderkey wins — which is the
    * operator's right-side uniqueness contract AND makes the pick
    * deterministic in both engines.
    */
  def asofOrders(spark: SparkSession, dir: String): DataFrame = {
    val e = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("user_id"), col("ts"))
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val w = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
      .orderBy(col("o_orderkey").desc)
    val r = o.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        col("o_totalprice"))
    graft.operators.AsOfJoin
      .asOf(e, r, "user_id", "o_custkey", "ts", "o_orderdate")
      .select(col("event_id"), col("user_id"), col("o_orderkey"),
        col("o_totalprice"))
  }

  /** Interval join: same-user event pairs within the preceding hour —
    * (a, b) where b fired in [a.ts − 1h, a.ts], via the bin-bucketed
    * [[graft.operators.RangeJoin]] (bin = window width ⇒ each left
    * interval explodes to ≤ 2 bins; the join is an equi-join on
    * (user, bin), never a per-user cartesian). Microsecond epochs on
    * both sides (`unix_micros` / `epoch_us`) keep the comparison exact
    * integer arithmetic in both engines.
    */
  def rangeEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val win = 3600000000L // 1 hour in micros
    // ts is TIMESTAMP_NTZ in the parquet; the session runs UTC
    // (Sessions.tuned), so the NTZ→TIMESTAMP cast is value-preserving and
    // unix_micros equals DuckDB's epoch_us on the naive value.
    val us = unix_micros(col("ts").cast("timestamp"))
    val l = ev.select(col("event_id").as("a"), col("user_id"),
      (us - win).as("lo"), us.as("hi"))
    val r = ev.select(col("event_id").as("b"), col("user_id").as("u2"),
      us.as("bts"))
    graft.operators.RangeJoin
      .pointInInterval(l, r, "user_id", "u2", "lo", "hi", "bts", binWidth = win)
      .filter(col("a") =!= col("b"))
      .select(col("a"), col("b"), col("user_id"))
  }

  val rangeEventsSql: String =
    """SELECT a.event_id AS a, b.event_id AS b, a.user_id
      |FROM events a JOIN events b ON a.user_id = b.user_id
      |  AND a.event_id <> b.event_id
      |  AND epoch_us(b.ts) BETWEEN epoch_us(a.ts) - 3600000000 AND epoch_us(a.ts)""".stripMargin

  /** DuckDB replays the same dedupe, then its native ASOF LEFT JOIN. */
  /** Tolerance (max-staleness) in microseconds for `q_asof_tol`: 8400
    * days. The corpus staleness median is ~8372 days (modern event
    * timestamps vs TPC-H-era order dates), so this bound keeps most
    * matches and nulls a real minority — both branches of the tolerance
    * predicate carry rows.
    */
  private val AsofTolMicros: Long = 8400L * 86400L * 1000000L

  /** As-of join with a staleness bound
    * ([[graft.operators.AsOfJoin.asOf]] `tolerance`): same alignment as
    * q_asof, but a preceding order older than the tolerance no longer
    * counts as point-in-time context. Times travel as epoch micros
    * (exact integer cross-engine).
    */
  def asofOrdersTol(spark: SparkSession, dir: String): DataFrame = {
    val e = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"))
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val w = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
      .orderBy(col("o_orderkey").desc)
    val r = o.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("od_us"),
        col("o_orderkey"), col("o_totalprice"))
    graft.operators.AsOfJoin
      .asOf(e, r, "user_id", "o_custkey", "ts_us", "od_us",
        tolerance = Some(AsofTolMicros))
      .select(col("event_id"), col("user_id"), col("o_orderkey"),
        col("o_totalprice"))
  }

  /** Oracle: the native ASOF LEFT JOIN picks the same latest-preceding
    * row; the tolerance then NULLs the matched columns (not the row —
    * left-outer semantics are preserved), exactly as the Scala side does.
    */
  val asofOrdersTolSql: String =
    s"""WITH r AS (
       |  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
       |         row_number() OVER (PARTITION BY o_custkey, o_orderdate
       |                            ORDER BY o_orderkey DESC) AS rn
       |  FROM orders
       |),
       |rr AS (SELECT o_custkey, epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS od_us,
       |              o_orderkey, o_totalprice
       |       FROM r WHERE rn = 1)
       |SELECT e.event_id, e.user_id,
       |       CASE WHEN rr.od_us >= epoch_us(e.ts) - $AsofTolMicros
       |            THEN rr.o_orderkey END AS o_orderkey,
       |       CASE WHEN rr.od_us >= epoch_us(e.ts) - $AsofTolMicros
       |            THEN rr.o_totalprice END AS o_totalprice
       |FROM events e ASOF LEFT JOIN rr
       |  ON e.user_id = rr.o_custkey AND epoch_us(e.ts) >= rr.od_us""".stripMargin

  val asofOrdersSql: String =
    """WITH r AS (
      |  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey, o_orderdate
      |                            ORDER BY o_orderkey DESC) AS rn
      |  FROM orders
      |),
      |rr AS (SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
      |       FROM r WHERE rn = 1)
      |SELECT e.event_id, e.user_id, rr.o_orderkey, rr.o_totalprice
      |FROM events e ASOF LEFT JOIN rr
      |  ON e.user_id = rr.o_custkey AND e.ts >= rr.o_orderdate""".stripMargin

  /** Price threshold for the bloom-pruned semi-join: selects ~10% of
    * orders, so the bloom prunes ~90% of lineitem before any shuffle.
    */
  private val BloomPriceCut = 450000.0

  /** Bloom-pruned exact semi-join (the explicit runtime-row-filter
    * pattern): revenue rollup of lineitem rows whose order is
    * high-value. The small side (filtered order keys) builds a Bloom
    * filter ONCE (distributed partial build, driver merge — the same
    * treeAggregate Spark's own `runtime.bloomFilter` rewrite uses); the
    * fact side is pruned MAP-SIDE inside whole-stage codegen by
    * [[graft.functions.SketchExpressions.bloomMightContain]] before the
    * exact semi-join removes the (≤ fpp) false positives. At 100 TB the
    * semi-join's shuffle moves ~|match|·(1+fpp) rows instead of |fact| —
    * the bloom is the difference between shuffling 100 TB and shuffling
    * the 10% that survives. Result is EXACT (bloom has no false
    * negatives), which is what the plain-IN oracle checks.
    */
  def bloomSemi(spark: SparkSession, dir: String): DataFrame = {
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val hot = o.filter(col("o_totalprice") > BloomPriceCut)
      .select(col("o_orderkey"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nHot = hot.count()
    val bloom = hot.stat.bloomFilter("o_orderkey", math.max(nHot, 1L), 0.01)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    val pruned = li.filter(
      graft.functions.SketchExpressions.bloomMightContain(col("l_orderkey"), bytes))
    val out = pruned
      .join(hot, pruned("l_orderkey") === hot("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))
    hot.unpersist()
    out
  }

  val bloomSemiSql: String =
    s"""SELECT l_returnflag, count(*) AS n_rows,
       |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
       |FROM lineitem
       |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
       |                     WHERE o_totalprice > $BloomPriceCut)
       |GROUP BY l_returnflag""".stripMargin
}
