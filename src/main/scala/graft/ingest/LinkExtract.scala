package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scale-safe deterministic dense id assignment (url → 0..n-1 by url sort
  * order) — the Spark equivalent of the reference's dense `usize` node ids.
  *
  * NOT a global single-partition window: range-partition by the key, number
  * within each partition, then add per-partition offsets (the offsets table
  * is #partitions rows — driver-tiny at any scale).
  */
object DenseIds {

  /** Input: any DataFrame with a unique string column `keyCol`.
    * Output: (key, id) with dense ids 0..n-1 assigned in key sort order.
    */
  def assign(df: DataFrame, keyCol: String, numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
                else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // Eager checkpoint, not persist: `keyed` is read twice (counts +
    // final join) but must not outlive the call — a persist here had no
    // release path and pinned one full key-set cache per ingest for the
    // session lifetime. The result is checkpointed too, so releasing
    // `keyed` leaves a self-contained map (callers re-persist if they
    // want a longer-lived copy).
    val keyed = df.select(col(keyCol).as("key")).distinct()
      .repartitionByRange(parts, col("key"))
      .withColumn("pid", spark_partition_id())
      .withColumn("rn", row_number().over(Window.partitionBy("pid").orderBy("key")))
      .localCheckpoint(true)
    val counts = keyed.groupBy("pid").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft(0L)(_ + _._2).zip(counts).map {
      case (off, (pid, _)) => (pid, off)
    }
    val offDf = broadcast(
      spark.createDataFrame(offsets.toSeq).toDF("pid", "offset"))
    val out = keyed.join(offDf, Seq("pid"))
      .select(col("key").as(keyCol), (col("offset") + col("rn") - 1).as("id"))
      .localCheckpoint(true)
    graft.core.Lineage.release(keyed)
    out
  }
}

/** Link extraction: Common-Crawl-style pages table → directed edge table.
  *
  * The ingest path of the north_star: pages (url, warc_ts, html, text,
  * lang) → anchor hrefs from `html` → resolve to dense vertex ids →
  * Dataset[Edge]. Pure Spark expressions (regexp over the html string);
  * external links (targets not in the crawl) are dropped, like the
  * reference's graphs which are closed over their node set.
  */
object LinkExtract {

  /** (src_url, dst_url) pairs from anchor tags. */
  def links(pages: DataFrame): DataFrame =
    pages.select(
        col("url").as("src_url"),
        explode(
          regexp_extract_all(col("html").cast("string"),
            lit("""<a href="([^"]+)""""), lit(1))).as("dst_url"))

  /** WET-style plain-text extraction (url, text, n_tokens): strip every
    * markup tag (replaced by a space so token boundaries survive
    * tag-adjacent text), collapse whitespace runs, trim. The
    * Common-Crawl WARC→WET step — the front of every webtext training
    * pipeline; [[TextOps]] quality / dedup / language-id operators then
    * run on the extracted `text` column.
    *
    * Pure codegen'd per-row string expressions — zero shuffles, zero
    * joins; at crawl scale this is a map-only pass whose cost is the
    * regexp scan of each page's html, pipelined into whatever consumes
    * it. (A production extractor adds entity decoding and script/style
    * content drops — tag stripping is the structural part and keeps the
    * whole derivation portable to the SQL oracle.)
    */
  def extractText(pages: DataFrame): DataFrame = {
    val stripped = trim(regexp_replace(
      regexp_replace(col("html").cast("string"), "<[^>]+>", " "), " +", " "))
    pages
      .select(col("url"), stripped.as("text"))
      .select(col("url"), col("text"),
        when(length(col("text")) === 0, lit(0L))
          .otherwise(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
  }

  /** (url, id) dense vertex map over all page urls (every crawled page is
    * a vertex even if never linked — matches Graph-over-all-pages
    * semantics and keeps dangling pages).
    */
  def vertexMap(pages: DataFrame): DataFrame = DenseIds.assign(pages, "url")

  /** Edge table (src: Long, dst: Long); duplicate links collapse later in
    * the adjacency build. The two resolve joins shuffle on url — at crawl
    * scale the vertex map is far bigger than broadcastable, so these are
    * sort-merge/shuffle-hash joins by design (one-time ingest cost).
    */
  def edges(pages: DataFrame, vertexMap: DataFrame): DataFrame = {
    val l = links(pages)
    l.join(vertexMap.select(col("url").as("src_url"), col("id").as("src")), Seq("src_url"))
      .join(vertexMap.select(col("url").as("dst_url"), col("id").as("dst")), Seq("dst_url"))
      .select(col("src"), col("dst"))
  }

  /** Full ingest: pages → (vertexMap, edges). The vertex map is already
    * an eager checkpoint (see [[DenseIds.assign]]) — both resolve joins
    * read its blocks without recompute, no extra persist needed.
    */
  def ingest(pages: DataFrame): (DataFrame, DataFrame) = {
    val vm = vertexMap(pages)
    (vm, edges(pages, vm))
  }

  /** Host-graph collapse: page-level (src_url, dst_url) links → weighted
    * host-level arcs (src_host, dst_host, weight = link multiplicity,
    * intra-host self-loops kept). The standard web-graph aggregation
    * (WebGraph's host graphs; the bow-tie analyses run at this level):
    * a 10¹⁰-edge page graph collapses to a ~10⁷-vertex host graph every
    * downstream algorithm can then afford dense state for.
    *
    * Pure codegen'd expressions + ONE map-side-combined shuffle keyed by
    * the host pair — per-partition partial counts mean the shuffle
    * carries at most (distinct host pairs per partition) rows, not one
    * row per page link. Links whose url has no parseable host collapse
    * into the empty-string host rather than being dropped (an auditable
    * bucket, not silent loss).
    */
  /** (src_url, dst_url, anchor) triples from complete anchor tags — the
    * href-only [[links]] extraction plus the tag's inner text. Two-step
    * because `regexp_extract_all` yields ONE capture group per match:
    * explode whole tags, then project each group from the (short) tag
    * string. All codegen'd string expressions, no UDFs.
    */
  def anchors(pages: DataFrame): DataFrame =
    pages
      .select(
        col("url").as("src_url"),
        explode(
          regexp_extract_all(col("html").cast("string"),
            lit("""<a href="[^"]+">[^<]*</a>"""), lit(0))).as("tag"))
      .select(
        col("src_url"),
        regexp_extract(col("tag"), """<a href="([^"]+)"""", 1).as("dst_url"),
        regexp_extract(col("tag"), """>([^<]*)</a>""", 1).as("anchor"))

  /** Per-target anchor-text signals — the classic link-based document
    * signal of web search (inlink anchor terms describe the TARGET):
    * (dst_url, inlinks, n_anchors = distinct anchor strings, top_anchor =
    * most frequent anchor, ties to the lexicographically smallest).
    *
    * Shape: one partial-aggregated shuffle to (dst_url, anchor) counts —
    * map-side combine absorbs the "every page says 'click here' about
    * google.com" skew before it ships — then one exchange by dst_url for
    * the window (rank + both per-target totals in a single pass over
    * DISTINCT-anchor rows, already ≤ vocabulary per target, not inlink
    * cardinality).
    */
  def anchorText(anchors: DataFrame): DataFrame = {
    val counts = anchors
      .groupBy(col("dst_url"), col("anchor"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("dst_url")
    counts
      .select(
        col("dst_url"),
        col("anchor"),
        row_number().over(w.orderBy(col("c").desc, col("anchor").asc)).as("rn"),
        sum(col("c")).over(w).as("inlinks"),
        count(lit(1)).over(w).as("n_anchors"))
      .where(col("rn") === 1)
      .select(col("dst_url"), col("inlinks"), col("n_anchors"),
        col("anchor").as("top_anchor"))
  }

  def hostGraph(links: DataFrame): DataFrame = {
    val host = (c: String) =>
      regexp_extract(col(c), "^https?://([^/]+)", 1)
    links
      .select(host("src_url").as("src_host"), host("dst_url").as("dst_host"))
      .groupBy(col("src_host"), col("dst_host"))
      .agg(count(lit(1)).as("weight"))
  }
}
