package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §4).
  *
  * Everything is a pure function of (vertex id, seed) built from codegen'd
  * Spark expressions over `spark.range(n)` — no driver-side data, no RNG
  * state, no UDFs — so the same (n, seed) produces byte-identical tables at
  * any parallelism and any scale (the per-row invariant of the input_hint:
  * byte-identical extracted text per url).
  *
  * Topology (web-shaped, per FIXTURES.md §4):
  *  - host-locality blocks of 16 pages (`url = https://site{id/16}.test/page{id}`);
  *  - power-law-ish out-degrees via inverse-CDF on a uniform hash
  *    (exponent ~2.2, capped), hubs = low ids get extra in-links because
  *    2/10 of targets are drawn from the low-id range (skew for salting
  *    tests);
  *  - ~2% dangling pages (out-degree 0 — exercises PageRank dangling mass);
  *  - self-links and duplicate links possible on ingest (deduped in
  *    adjacency build), like the reference's test graphs.
  */
object PageGen {

  private def h(seed: Long, cols: org.apache.spark.sql.Column*) =
    xxhash64((lit(seed) +: cols): _*)

  private def u01(seed: Long, cols: org.apache.spark.sql.Column*) =
    (pmod(h(seed, cols: _*), lit(1000000L)).cast("double") / 1000000.0)

  /** Directed edge table (src, dst) on ids 0..n-1 — the topology that
    * [[pages]] embeds as anchors, generated directly (the fast path used
    * by benchmarks; `LinkExtractSpec` asserts pages→extract == this).
    */
  def edges(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    spark.range(n).toDF("src")
      .select(col("src"), degreeExpr(n, seed).as("deg"))
      .filter(col("deg") > 0) // sequence(0, -1) would descend, not be empty
      .select(col("src"), explode(sequence(lit(0L), col("deg") - 1)).as("i"))
      .select(col("src"), targetExpr(n, seed).as("dst"))
  }

  /** Out-degree of `src`: 0 for ~2% dangling; else power-law-ish
    * inverse-CDF `ceil(u^(-1/1.2))` clamped to [1, 256] (mean ~6).
    */
  private def degreeExpr(n: Long, seed: Long) = {
    val dangling = pmod(h(seed + 1, col("src")), lit(50L)) === 0
    val u = u01(seed + 2, col("src")) + lit(1e-9)
    val pl = least(ceil(pow(u, -1.0 / 1.2)), lit(256L)).cast("long")
    when(dangling, lit(0L)).otherwise(greatest(pl, lit(1L)))
  }

  /** Target of link slot (src, i): 50% intra-host, 20% hub (low-id bias),
    * 30% uniform. Always in [0, n).
    */
  private def targetExpr(n: Long, seed: Long) = {
    val mode = pmod(h(seed + 3, col("src"), col("i")), lit(10L))
    val host = (col("src") / 16).cast("long")
    val intraHost = least(host * 16 + pmod(h(seed + 4, col("src"), col("i")), lit(16L)), lit(n - 1))
    // clamped to n: for n < 16 the floor would emit dst ≥ n, inventing
    // vertices and breaking the pages↔edges equivalence on tiny graphs
    val hubRange = math.min(n, math.max(16L, math.round(math.sqrt(n.toDouble))))
    val hub = pmod(h(seed + 5, col("src"), col("i")), lit(hubRange))
    val uniform = pmod(h(seed + 6, col("src"), col("i")), lit(n))
    when(mode < 5, intraHost).when(mode < 7, hub).otherwise(uniform)
  }

  private def urlOf(idCol: org.apache.spark.sql.Column) =
    concat(lit("https://site"), (idCol / 16).cast("long"), lit(".test/page"), idCol)

  /** Pages table per the input_hint schema:
    * (url string, warc_ts timestamp, html binary, text string, lang string).
    * `html` embeds the [[edges]] topology as `<a href>` anchors; `text` is a
    * pure function of the id (byte-identical per url across runs).
    */
  def pages(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    val anchors = edges(spark, n, seed)
      .groupBy(col("src").as("id"))
      .agg(concat_ws("\n", collect_list(
        concat(lit("""<a href=""""), urlOf(col("dst")), lit("""">link</a>""")))).as("anchorHtml"))

    val textExpr = concat(
      lit("Synthetic crawl document number "), col("id"),
      lit(" hosted on site "), (col("id") / 16).cast("long"),
      lit(". "),
      // deterministic pseudo-sentence padding, length varies by id hash
      concat_ws("", array_repeat(
        lit("The quick brown fox jumps over the lazy dog. "),
        (pmod(h(seed + 7, col("id")), lit(8L)) + 1).cast("int"))))

    spark.range(n).toDF("id")
      .join(anchors, Seq("id"), "left")
      .select(
        col("id"),
        urlOf(col("id")).as("url"),
        (lit(1700000000L) + col("id")).cast("timestamp").as("warc_ts"),
        concat(
          lit("<html><head><title>page "), col("id"), lit("</title></head><body>\n"),
          coalesce(col("anchorHtml"), lit("")),
          lit("\n<p>"), textExpr, lit("</p></body></html>")
        ).cast("binary").as("html"),
        textExpr.as("text"),
        when(pmod(h(seed + 8, col("id")), lit(10L)) < 8, "en")
          .when(pmod(h(seed + 8, col("id")), lit(10L)) === 8, "de")
          .otherwise("fr").as("lang"))
      .drop("id")
  }
}
