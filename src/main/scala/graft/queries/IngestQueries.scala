package graft.queries

import graft.ingest.{LinkExtract, UrlNorm}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver-contract query for the ingest pipeline (north-rule "pages →
  * links → dense ids → edges"), with a DuckDB oracle.
  *
  * The sf dirs carry no pages table, so a Common-Crawl-SHAPED pages table
  * (url, html) is derived DETERMINISTICALLY from `documents` with string
  * arithmetic both engines evaluate identically; the Spark side then runs
  * the real ingest operators (LinkExtract regexp anchor extraction →
  * DenseIds range-partitioned id assignment → edge resolve joins) while
  * the oracle re-derives the same pages and replicates the extraction
  * with `regexp_extract_all` + a window row_number (the oracle-sized
  * equivalent of DenseIds' partition-offset scheme).
  */
object IngestQueries {

  private def urlOf(id: Column): Column =
    concat(lit("http://site"), id % 40, lit(".test/p"), id)

  /** (url, html) pages: doc d links to targets (d·31 + j·17 + 1) mod n,
    * j < d mod 5 (so some pages have no links and stay dangling vertices).
    * Anchor text is a term from a 9-word vocabulary, w((d·13 + j·7) mod 9)
    * — deterministic, varied per (source, slot) so per-target anchor
    * aggregation ([[anchorText]]) has real frequency structure.
    */
  def pages(spark: SparkSession, dir: String): DataFrame = {
    val d = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"))
    val n = d.count()
    val nLinks = col("doc_id") % 5
    val anchors = transform(
      sequence(lit(0), nLinks.cast("long") - 1),
      j => concat(lit("<a href=\""), urlOf((col("doc_id") * 31 + j * 17 + 1) % n),
        lit("\">w"), (col("doc_id") * 13 + j * 7) % 9, lit("</a>")))
    d.select(
      urlOf(col("doc_id")).as("url"),
      concat(
        lit("<html><body>"),
        // sequence(0,-1) DESCENDS in Spark: guard the no-link case.
        concat_ws("", when(nLinks > 0, anchors).otherwise(array().cast("array<string>"))),
        lit("</body></html>")).as("html"))
  }

  /** Dense-id edge table from the full ingest pipeline. */
  def links(spark: SparkSession, dir: String): DataFrame = {
    val (vm, edges) = LinkExtract.ingest(pages(spark, dir))
    edges.distinct().select(col("src"), col("dst"))
  }

  /** Shared oracle prefix: the derived pages table + extracted links. */
  private val pagesLnkSql: String =
    """cnt AS (SELECT count(*) AS n FROM documents),
      |pages AS (
      |  SELECT 'http://site' || (doc_id % 40) || '.test/p' || doc_id AS url,
      |         -- coalesce: DuckDB's array_to_string(empty, '') is NULL,
      |         -- Spark's concat_ws is '' — the no-link page must have
      |         -- non-null html in BOTH engines or extract-text diverges.
      |         '<html><body>' || coalesce(array_to_string(
      |           list_transform(range(0, doc_id % 5),
      |             j -> '<a href="http://site' || (((doc_id * 31 + j * 17 + 1) % n) % 40) ||
      |                  '.test/p' || ((doc_id * 31 + j * 17 + 1) % n) ||
      |                  '">w' || ((doc_id * 13 + j * 7) % 9) || '</a>'),
      |           ''), '') || '</body></html>' AS html
      |  FROM documents CROSS JOIN cnt
      |),
      |lnk AS (
      |  SELECT url AS src_url,
      |         unnest(regexp_extract_all(html, '<a href="([^"]+)"', 1)) AS dst_url
      |  FROM pages
      |)""".stripMargin

  val linksSql: String =
    s"""WITH $pagesLnkSql,
       |ids AS (SELECT url, row_number() OVER (ORDER BY url) - 1 AS id FROM pages)
       |SELECT DISTINCT s.id AS src, t.id AS dst
       |FROM lnk JOIN ids s ON s.url = lnk.src_url JOIN ids t ON t.url = lnk.dst_url""".stripMargin

  /** Weighted host-level graph from the same derived pages
    * ([[LinkExtract.hostGraph]] over the raw extracted links — weight
    * counts page-level link multiplicity, before the edge-level
    * distinct).
    */
  def hostGraph(spark: SparkSession, dir: String): DataFrame =
    LinkExtract.hostGraph(LinkExtract.links(pages(spark, dir)))

  val hostGraphSql: String =
    s"""WITH $pagesLnkSql
       |SELECT regexp_extract(src_url, '^https?://([^/]+)', 1) AS src_host,
       |       regexp_extract(dst_url, '^https?://([^/]+)', 1) AS dst_host,
       |       count(*) AS weight
       |FROM lnk GROUP BY src_host, dst_host""".stripMargin

  /** Host-level PageRank — the composite pipeline a web-search stack
    * actually runs (host quality priors feed crawl scheduling and doc
    * ranking): derived pages → link extraction → host-graph collapse →
    * dense host ids → 5 unweighted power iterations over the DISTINCT
    * host-pair graph → ranks mapped back to hostnames.
    *
    * Scale shape: the expensive page-level work is the one map-side-
    * combined host collapse ([[LinkExtract.hostGraph]]); everything after
    * runs on the ~10⁷-host graph (here 40 hosts), so the PageRank cost is
    * negligible next to the collapse — exactly the asymmetry the host
    * abstraction exists for.
    */
  /** Distinct host pairs → dense host ids → resolved integer edge table,
    * shared by i_host_rank and i_host_cc (one link extraction + id
    * assignment per session; a drifting copy here would silently split
    * the two host-level faces). `hostGraph`'s groupBy already yields
    * unique pairs, so no extra distinct.
    */
  private def hostDense(spark: SparkSession, dir: String): (DataFrame, DataFrame) =
    graft.core.SessionMemo(spark, s"hostDense:$dir") {
      val hedges = LinkExtract.hostGraph(LinkExtract.links(pages(spark, dir)))
        .select(col("src_host"), col("dst_host"))
      val hosts = graft.ingest.DenseIds.assign(
        hedges.select(col("src_host").as("host"))
          .union(hedges.select(col("dst_host").as("host"))), "host")
      val edges = hedges
        .join(hosts.select(col("host").as("src_host"), col("id").as("src")), Seq("src_host"))
        .join(hosts.select(col("host").as("dst_host"), col("id").as("dst")), Seq("dst_host"))
        .select(col("src"), col("dst"))
        .localCheckpoint(true)
      (hosts, edges)
    }

  def hostRank(spark: SparkSession, dir: String): DataFrame = {
    val (hosts, edges) = hostDense(spark, dir)
    graft.operators.PageRank.runFixed(graft.core.Graph.fromEdges(edges), iterations = 5)
      .join(hosts, Seq("id"))
      .select(col("host"), round(col("rank"), 8).as("rank"))
  }

  /** Oracle: PageRank is vertex-identity-agnostic, so the unrolled stage
    * chain (shared with g_pagerank5 via [[GraphQueries.prStagesSql]]) runs
    * keyed directly by hostname — no dense-id replay needed.
    */
  val hostRankSql: String =
    s"""WITH $pagesLnkSql,
       |hedges AS MATERIALIZED (
       |  SELECT DISTINCT regexp_extract(src_url, '^https?://([^/]+)', 1) AS src,
       |         regexp_extract(dst_url, '^https?://([^/]+)', 1) AS dst
       |  FROM lnk),
       |hnodes AS (SELECT src AS id FROM hedges UNION SELECT dst AS id FROM hedges),
       |hod AS (SELECT src AS id, count(*) AS c FROM hedges GROUP BY src),
       |hndeg AS (SELECT n.id, coalesce(hod.c, 0) AS deg
       |          FROM hnodes n LEFT JOIN hod ON n.id = hod.id),
       |hcnt AS (SELECT count(*) AS n FROM hnodes),
       |hpr0 AS (SELECT id, 1.0 / hcnt.n AS rank, deg FROM hndeg CROSS JOIN hcnt),
       |${GraphQueries.prStagesSql(5, "hedges", "hndeg", "hcnt", "hpr")}
       |SELECT id AS host, round(rank, 8) AS rank FROM hpr5""".stripMargin

  /** Weighted host-level PageRank ([[graft.operators.PageRank.runWeightedFixed]]):
    * same host graph, but link MULTIPLICITY matters — a host funneling
    * 100 links to one neighbor sends it 100× the rank mass of a
    * single-link neighbor. Runs directly on hostname strings (the
    * operator is vertex-type-agnostic), so the whole query is collapse →
    * rank → done.
    */
  def hostRankWeighted(spark: SparkSession, dir: String): DataFrame =
    graft.operators.PageRank.runWeightedFixed(
      hostGraph(spark, dir).select(
        col("src_host").as("src"), col("dst_host").as("dst"), col("weight")),
      iterations = 5)
      .select(col("id").as("host"), round(col("rank"), 8).as("rank"))

  /** Unrolled weighted-PR oracle: contribution = rank·w/W(u), dangling =
    * zero-out-weight mass; weights and out-weights cast to DOUBLE so both
    * engines run the identical (rank * w) / W float expression.
    */
  val hostRankWeightedSql: String = {
    val stages = (1 to 5).map { k =>
      val p = s"wpr${k - 1}"
      s"""wpr$k AS (
         |  SELECT n.id,
         |         (0.15 / wcnt.n) + 0.85 * (coalesce(c.contrib, 0) + d.dang / wcnt.n) AS rank,
         |         n.ow
         |  FROM wdeg n
         |  CROSS JOIN wcnt
         |  CROSS JOIN (SELECT coalesce(sum(rank), 0) AS dang FROM $p WHERE ow = 0) d
         |  LEFT JOIN (
         |    SELECT e.dst AS id, sum(p.rank * e.w / p.ow) AS contrib
         |    FROM $p p JOIN wh e ON e.src = p.id
         |    WHERE p.ow > 0
         |    GROUP BY e.dst
         |  ) c ON c.id = n.id
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH $pagesLnkSql,
       |wh AS MATERIALIZED (
       |  SELECT regexp_extract(src_url, '^https?://([^/]+)', 1) AS src,
       |         regexp_extract(dst_url, '^https?://([^/]+)', 1) AS dst,
       |         CAST(count(*) AS DOUBLE) AS w
       |  FROM lnk GROUP BY 1, 2),
       |wnodes AS (SELECT src AS id FROM wh UNION SELECT dst AS id FROM wh),
       |wow AS (SELECT src AS id, sum(w) AS ow FROM wh GROUP BY src),
       |wdeg AS (SELECT n.id, coalesce(wow.ow, CAST(0 AS DOUBLE)) AS ow
       |         FROM wnodes n LEFT JOIN wow ON n.id = wow.id),
       |wcnt AS (SELECT count(*) AS n FROM wnodes),
       |wpr0 AS (SELECT id, 1.0 / wcnt.n AS rank, ow FROM wdeg CROSS JOIN wcnt),
       |$stages
       |SELECT id AS host, round(rank, 8) AS rank FROM wpr5""".stripMargin
  }

  /** Site-level weakly-connected components: the host graph's undirected
    * component structure (crawl-frontier islands, link-farm clusters —
    * the 10⁷-host face of the bow-tie/WCC story that g_cc verifies at
    * page-id granularity). Pipeline: distinct host pairs → dense host
    * ids ([[graft.ingest.DenseIds.assign]] — sort-order assignment, so
    * the min dense id in a component IS its lexicographically smallest
    * hostname) → the engine's CC operator → labels mapped back to
    * hostnames. Component label = smallest member hostname.
    */
  def hostCc(spark: SparkSession, dir: String): DataFrame = {
    val (hosts, edges) = hostDense(spark, dir)
    // Cap-guarded local finish (union-find — identical min-dense-id
    // labels); the ~40-host derived graph is pure superstep latency
    // distributed, and the budget routes a real 10⁷-host graph to the
    // distributed path unchanged.
    graft.operators.ConnectedComponents.run(graft.core.Graph.fromEdges(edges),
      localFinishEdges = 2000000L).components
      .join(hosts, Seq("id"))
      .join(hosts.select(col("id").as("comp"), col("host").as("comp_host")), Seq("comp"))
      .select(col("host"), col("comp_host"))
  }

  /** Oracle: synchronous min-label propagation over the symmetrized host
    * pairs, unrolled [[HostCcRounds]] rounds — strings propagate
    * directly (`least` on VARCHAR), no dense-id replay needed; the
    * fixpoint label is the smallest member hostname, and extra rounds
    * past the fixpoint are monotone no-ops (measured depth ≤ 4 at both
    * gate scale factors on the ~40-host graph). Self-checking: a
    * sentinel row (`host = 'ORACLE-UNCONVERGED …'`) is appended only if
    * any label still changed on the final round, so a corpus deep enough
    * to exceed the unroll surfaces as an ORACLE defect instead of
    * flagging the engine's correct answer (ADVICE r4).
    */
  val HostCcRounds = 12

  val hostCcSql: String = {
    val rounds = (1 to HostCcRounds).map { k =>
      val p = s"hcl${k - 1}"
      s"""hcl$k AS MATERIALIZED (
         |  SELECT c.host, least(c.lab, coalesce(m.nlab, c.lab)) AS lab
         |  FROM $p c LEFT JOIN (
         |    SELECT e.src AS host, min(l.lab) AS nlab
         |    FROM hsym e JOIN $p l ON l.host = e.dst GROUP BY e.src) m
         |  ON m.host = c.host)""".stripMargin
    }.mkString(",\n")
    s"""WITH $pagesLnkSql,
       |hcedges AS MATERIALIZED (
       |  SELECT DISTINCT regexp_extract(src_url, '^https?://([^/]+)', 1) AS src,
       |         regexp_extract(dst_url, '^https?://([^/]+)', 1) AS dst
       |  FROM lnk),
       |hsym AS MATERIALIZED (
       |  SELECT src, dst FROM hcedges WHERE src <> dst
       |  UNION SELECT dst AS src, src AS dst FROM hcedges WHERE src <> dst),
       |hcn AS (SELECT src AS host FROM hcedges UNION SELECT dst FROM hcedges),
       |hcl0 AS (SELECT host, host AS lab FROM hcn),
       |$rounds
       |SELECT host, lab AS comp_host FROM hcl$HostCcRounds
       |UNION ALL
       |SELECT 'ORACLE-UNCONVERGED after $HostCcRounds rounds' AS host,
       |       CAST(count(*) AS VARCHAR) AS comp_host
       |FROM hcl$HostCcRounds a JOIN hcl${HostCcRounds - 1} b
       |  ON a.host = b.host AND a.lab <> b.lab
       |HAVING count(*) > 0""".stripMargin
  }

  /** Per-target anchor-text signals ([[LinkExtract.anchorText]]) over the
    * same derived pages.
    */
  def anchorText(spark: SparkSession, dir: String): DataFrame =
    LinkExtract.anchorText(LinkExtract.anchors(pages(spark, dir)))

  val anchorTextSql: String =
    s"""WITH $pagesLnkSql,
       |tags AS (
       |  SELECT unnest(regexp_extract_all(html, '<a href="[^"]+">[^<]*</a>')) AS tag
       |  FROM pages
       |),
       |a AS (
       |  SELECT regexp_extract(tag, '<a href="([^"]+)"', 1) AS dst_url,
       |         regexp_extract(tag, '>([^<]*)</a>', 1) AS anchor
       |  FROM tags
       |),
       |c AS (SELECT dst_url, anchor, count(*) AS c FROM a GROUP BY 1, 2),
       |ranked AS (
       |  SELECT dst_url, anchor,
       |         row_number() OVER (PARTITION BY dst_url ORDER BY c DESC, anchor ASC) AS rn,
       |         CAST(sum(c) OVER (PARTITION BY dst_url) AS BIGINT) AS inlinks,
       |         count(*) OVER (PARTITION BY dst_url) AS n_anchors
       |  FROM c
       |)
       |SELECT dst_url, inlinks, n_anchors, anchor AS top_anchor
       |FROM ranked WHERE rn = 1""".stripMargin

  /** WET-style text extraction ([[LinkExtract.extractText]]) over the
    * same derived pages: strip tags (tag → space so tag-adjacent tokens
    * stay separated), collapse spaces, trim, count tokens.
    */
  def extractText(spark: SparkSession, dir: String): DataFrame =
    LinkExtract.extractText(pages(spark, dir))

  val extractTextSql: String =
    s"""WITH $pagesLnkSql,
       |t AS (
       |  SELECT url,
       |         trim(regexp_replace(regexp_replace(html, '<[^>]+>', ' ', 'g'),
       |                             ' +', ' ', 'g')) AS text
       |  FROM pages
       |)
       |SELECT url, text,
       |       CASE WHEN length(text) = 0 THEN 0
       |            ELSE len(string_split(text, ' ')) END AS n_tokens
       |FROM t""".stripMargin

  /** Co-citation "related pages" over the extracted page-link graph
    * ([[graft.operators.CoCitation]] keyed directly by url — the
    * operator is vertex-type-agnostic, so no dense-id replay is needed):
    * target pairs linked by ≥ 2 common sources. The dense derived
    * lineitem graph is the WRONG substrate for this operator (its
    * out-degrees are uniformly huge, so the hub cap — correctly —
    * discards everything); the page graph has the bounded-fan-out shape
    * co-citation is defined for.
    */
  def cocite(spark: SparkSession, dir: String): DataFrame =
    graft.operators.CoCitation
      .run(LinkExtract.links(pages(spark, dir))
        .select(col("src_url").as("src"), col("dst_url").as("dst")))
      .select(col("u"), col("v"), col("common"))

  /** Shared oracle CTE chain: dedup'd capped links + co-cited triples
    * (u < v as url strings; both engines compare ASCII urls bytewise).
    * `srcExpr`/`dstExpr` pick the pairing direction: (src_url, dst_url)
    * co-cites targets; swapped, it couples sources (bibliographic
    * coupling — the hub cap then bounds the shared target's IN-degree
    * and the Adamic–Adar weight becomes 1/ln(indeg), the standard
    * inverse-log-popularity discount).
    */
  private def pairsSql(srcExpr: String, dstExpr: String): String =
    s"""el AS MATERIALIZED (SELECT DISTINCT $srcExpr AS src, $dstExpr AS dst FROM lnk),
       |od AS (SELECT src, count(*) AS c FROM el GROUP BY src),
       |cap AS MATERIALIZED (
       |  SELECT e.src, e.dst, od.c FROM el e JOIN od USING (src)
       |  WHERE od.c <= ${graft.operators.CoCitation.DefaultMaxOutDeg}),
       |p AS (SELECT a.src, a.c, a.dst AS u, b.dst AS v
       |      FROM cap a JOIN cap b ON a.src = b.src AND a.dst < b.dst)""".stripMargin

  val cociteSql: String =
    s"""WITH $pagesLnkSql,
       |${pairsSql("src_url", "dst_url")}
       |SELECT u, v, count(*) AS common FROM p GROUP BY u, v
       |HAVING count(*) >= 2""".stripMargin

  /** Adamic–Adar link-prediction scores over the same co-cited pairs
    * (each common source contributes 1/ln(outdeg); see
    * [[graft.operators.CoCitation]] for the rounding and cap rationale).
    */
  def adamicAdar(spark: SparkSession, dir: String): DataFrame =
    graft.operators.CoCitation
      .run(LinkExtract.links(pages(spark, dir))
        .select(col("src_url").as("src"), col("dst_url").as("dst")))

  val adamicAdarSql: String =
    s"""WITH $pagesLnkSql,
       |${pairsSql("src_url", "dst_url")}
       |SELECT u, v, count(*) AS common,
       |       round(sum(1.0 / ln(CAST(c AS DOUBLE))), 6) AS aa
       |FROM p GROUP BY u, v
       |HAVING count(*) >= 2""".stripMargin

  /** Bibliographic coupling (Kessler 1963) — co-citation's mirror: two
    * SOURCES are related when their out-link sets overlap. Same
    * [[graft.operators.CoCitation]] operator fed the reversed edge table,
    * so the hub cap bounds the shared target's in-degree and the `aa`
    * weight becomes 1/ln(indeg) — popular targets (navigation pages,
    * boilerplate links) say little about the pair; rare shared targets
    * say a lot.
    */
  def coupling(spark: SparkSession, dir: String): DataFrame =
    graft.operators.CoCitation
      .run(LinkExtract.links(pages(spark, dir))
        .select(col("dst_url").as("src"), col("src_url").as("dst")))

  val couplingSql: String =
    s"""WITH $pagesLnkSql,
       |${pairsSql("dst_url", "src_url")}
       |SELECT u, v, count(*) AS common,
       |       round(sum(1.0 / ln(CAST(c AS DOUBLE))), 6) AS aa
       |FROM p GROUP BY u, v
       |HAVING count(*) >= 2""".stripMargin

  /** Neighborhood Jaccard over the co-cited target pairs
    * ([[graft.operators.CoCitation.jaccard]]) — co-citation's
    * set-overlap normalization: common citing sources over the UNION of
    * the two targets' capped citer sets, so promiscuously-cited targets
    * (navigation pages) stop dominating the raw common count.
    */
  def nbrJaccard(spark: SparkSession, dir: String): DataFrame =
    graft.operators.CoCitation
      .jaccard(LinkExtract.links(pages(spark, dir))
        .select(col("src_url").as("src"), col("dst_url").as("dst")))

  val nbrJaccardSql: String =
    s"""WITH $pagesLnkSql,
       |${pairsSql("src_url", "dst_url")},
       |td AS (SELECT dst AS t, count(*) AS d FROM cap GROUP BY dst),
       |cj AS (
       |  SELECT u, v, count(*) AS common FROM p GROUP BY u, v
       |  HAVING count(*) >= 2)
       |SELECT cj.u, cj.v, cj.common,
       |       CAST(cj.common AS DOUBLE) / (tu.d + tv.d - cj.common) AS jaccard
       |FROM cj
       |JOIN td tu ON tu.t = cj.u
       |JOIN td tv ON tv.t = cj.v""".stripMargin

  /** Top-3 pages per host by inlink count — the per-site authority
    * shortlist (seed URLs for recrawl priority, per-host quality probes).
    * One map-side-combined inlink count over the link table (popular
    * targets partial-aggregate before the shuffle), then a window
    * partitioned by HOST — partitions are per-site page counts, never the
    * corpus; ties break on URL so the shortlist is deterministic.
    */
  def topInlinks(spark: SparkSession, dir: String): DataFrame = {
    val inl = LinkExtract.links(pages(spark, dir))
      .groupBy(col("dst_url").as("url"))
      .agg(count(lit(1)).as("inlinks"))
      .withColumn("host", regexp_extract(col("url"), "^https?://([^/]+)", 1))
    val w = Window.partitionBy(col("host"))
      .orderBy(desc("inlinks"), asc("url"))
    inl.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 3)
      .select(col("host"), col("url"), col("inlinks"), col("rank"))
  }

  val topInlinksSql: String =
    s"""WITH $pagesLnkSql,
       |inl AS (
       |  SELECT dst_url AS url, count(*) AS inlinks,
       |         regexp_extract(dst_url, '^https?://([^/]+)', 1) AS host
       |  FROM lnk GROUP BY dst_url)
       |SELECT host, url, inlinks, rank FROM (
       |  SELECT host, url, inlinks,
       |         row_number() OVER (PARTITION BY host ORDER BY inlinks DESC, url ASC) AS rank
       |  FROM inl
       |) t WHERE rank <= 3""".stripMargin

  /** URL canonicalization + variant collapse ([[graft.ingest.UrlNorm]])
    * — the crawl-frontier dedup: each document's base URL plus a messy
    * fetch variant (case 0: uppercased scheme+host; 1: utm tracking
    * params; 2: fragment; 3: explicit default port; 4: doubled+trailing
    * slashes — all identity-preserving, so each collapses onto its base),
    * and every 7th doc adds a variant with a REAL param among tracking
    * ones (`?ref=a&utm_x=1`), which canonicalizes to its own
    * `?ref=a` group — pinning that stripping is surgical, not "drop the
    * whole query string".
    *
    * Scale shape: canonicalization is scan-fused string codegen; the
    * group-by is map-side-combined on the canonical key — the same
    * shuffle the downstream exact-dedup pays anyway.
    */
  def urlCanon(spark: SparkSession, dir: String): DataFrame = {
    val d = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"))
    val host = col("doc_id") % 40
    val base = urlOf(col("doc_id"))
    val variant = col("doc_id") % 5
    val messy = when(variant === 0,
        concat(lit("HTTP://SITE"), host, lit(".TEST/p"), col("doc_id")))
      .when(variant === 1, concat(base, lit("?utm_source=feed&utm_campaign=x")))
      .when(variant === 2, concat(base, lit("#sec2")))
      .when(variant === 3,
        concat(lit("http://site"), host, lit(".test:80/p"), col("doc_id")))
      .otherwise(concat(base, lit("//")))
    val extra = concat(base, lit("?ref=a&utm_x=1"))
    d.select(explode(
        when(col("doc_id") % 7 === 0, array(base, messy, extra))
          .otherwise(array(base, messy))).as("url"))
      .groupBy(UrlNorm.canonicalize(col("url")).as("canon_url"))
      .agg(count(lit(1)).as("n_raw"))
  }

  val urlCanonSql: String =
    s"""WITH v AS (
       |  SELECT doc_id,
       |         'http://site' || (doc_id % 40) || '.test/p' || doc_id AS base,
       |         CASE doc_id % 5
       |           WHEN 0 THEN 'HTTP://SITE' || (doc_id % 40) || '.TEST/p' || doc_id
       |           WHEN 1 THEN 'http://site' || (doc_id % 40) || '.test/p' || doc_id
       |                       || '?utm_source=feed&utm_campaign=x'
       |           WHEN 2 THEN 'http://site' || (doc_id % 40) || '.test/p' || doc_id || '#sec2'
       |           WHEN 3 THEN 'http://site' || (doc_id % 40) || '.test:80/p' || doc_id
       |           ELSE 'http://site' || (doc_id % 40) || '.test/p' || doc_id || '//'
       |         END AS messy
       |  FROM documents),
       |raw AS (
       |  SELECT unnest(CASE WHEN doc_id % 7 = 0
       |                     THEN [base, messy, base || '?ref=a&utm_x=1']
       |                     ELSE [base, messy] END) AS u
       |  FROM v)
       |SELECT ${graft.ingest.UrlNorm.canonicalizeSql("u")} AS canon_url,
       |       count(*) AS n_raw
       |FROM raw GROUP BY canon_url""".stripMargin

  /** Redirect-chain resolution ([[graft.operators.PointerJump]]) — the
    * crawl-ingest alias resolver: every fetched redirect record resolved
    * to its chain terminal (the canonical landing URL) plus the hop
    * count. Chains are synthesized deterministically: doc d contributes
    * L = d mod 4 redirect hops redirN.test/pd → redir(N−1).test/pd → …
    * → the real page URL, so chain lengths 0–3 and terminal fan-in are
    * both exercised.
    *
    * Scale shape: pointer DOUBLING — ceil(log2 L)+1 self-equi-joins of
    * the 24 B/row (src, ptr, hops) state, never O(L) one-hop walks; the
    * oracle replays the walk as a recursive CTE (fine at gate depth 3,
    * exactly the linear shape the operator exists to avoid at crawl
    * scale).
    */
  def redirects(spark: SparkSession, dir: String): DataFrame = {
    val d = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"))
    def rurl(k: Column): Column =
      concat(lit("http://redir"), k, lit(".test/p"), col("doc_id"))
    val mapping = d
      .select(col("doc_id"), explode(sequence(lit(1L), lit(3L))).as("k"))
      .where(col("k") <= col("doc_id") % 4)
      .select(rurl(col("k")).as("src"),
        when(col("k") === 1, urlOf(col("doc_id")))
          .otherwise(rurl(col("k") - 1)).as("next"))
    graft.operators.PointerJump.resolve(mapping)
      .select(col("src"), col("final").as("final_url"), col("hops"),
        col("resolved"))
  }

  val redirectsSql: String =
    """WITH RECURSIVE m AS (
      |  SELECT 'http://redir' || k || '.test/p' || doc_id AS src,
      |         CASE WHEN k = 1
      |              THEN 'http://site' || (doc_id % 40) || '.test/p' || doc_id
      |              ELSE 'http://redir' || (k - 1) || '.test/p' || doc_id
      |         END AS next
      |  FROM documents, (SELECT unnest([1, 2, 3]) AS k) t
      |  WHERE k <= doc_id % 4
      |),
      |r AS (
      |  SELECT src, next AS cur, 1 AS hops FROM m
      |  UNION ALL
      |  SELECT r.src, m.next, r.hops + 1 FROM r JOIN m ON m.src = r.cur
      |)
      |SELECT src, cur AS final_url, CAST(hops AS BIGINT) AS hops,
      |       true AS resolved
      |FROM r WHERE cur NOT IN (SELECT src FROM m)""".stripMargin

  /** Crawl-slot coloring: greedy graph coloring
    * ([[graft.operators.Coloring]] — synchronous Jones–Plassmann rounds)
    * of the extracted page-link graph, the conflict-free crawl scheduler
    * (no two linked pages fetched in the same slot — the multi-slot
    * generalization of one [[graft.operators.Mis]] round). The fixpoint
    * equals the sequential greedy coloring of the salted-hash permutation
    * order — a deterministic function of (graph, salt). The link graph's
    * degree is BOUNDED by construction (≤ 4 out-links/page), so the
    * permutation DAG's depth stays O(log n) at every scale factor —
    * unlike the lineitem-derived graphs, which densify with sf and would
    * grow the round count unboundedly.
    */
  def coloring(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Coloring.run(
      graft.core.Graph.fromEdges(links(spark, dir)), salt = "col",
      localFinishEdges = 2000000L).colors

  private val ColoringRounds = 20

  /** Oracle: the ingest CTE chain (pages → links → dense ids) feeding
    * the same synchronous rounds, unrolled — `prec` holds every
    * vertex's smaller-(hash, id) neighbors over the symmetrized simple
    * graph (one NULL row for permutation sources so they surface in
    * round 1); a vertex becomes ready when uncolored with every
    * precedent colored, and takes the mex of their colors via the
    * sorted-row-number gap trick (first rank where color ≠ rank).
    * [[ColoringRounds]] only needs to be ≥ the permutation DAG's depth
    * (measured 11 at the gate SFs, 14 at sf0.1) — extra stages are
    * no-ops at fixpoint.
    */
  lazy val coloringSql: String = {
    def h(x: String): String =
      s"CAST(('0x' || substring(md5(CAST($x AS VARCHAR) || ':col'), 1, 15)) AS BIGINT)"
    val rounds = (1 to ColoringRounds).map { i =>
      val c = s"c${i - 1}"
      s"""ready$i AS MATERIALIZED (
         |  SELECT p.v FROM prec p
         |  LEFT JOIN $c cv ON cv.id = p.v
         |  LEFT JOIN $c cl ON cl.id = p.lo
         |  GROUP BY p.v
         |  HAVING count(cv.id) = 0 AND count(p.lo) = count(cl.id)),
         |nb$i AS (
         |  SELECT DISTINCT p.v, cl.color
         |  FROM prec p JOIN ready$i r ON r.v = p.v
         |  JOIN $c cl ON cl.id = p.lo),
         |mex$i AS (
         |  SELECT v, coalesce(min(CASE WHEN color <> rn THEN rn END),
         |                     count(*)) AS color
         |  FROM (SELECT v, color,
         |               row_number() OVER (PARTITION BY v ORDER BY color) - 1 AS rn
         |        FROM nb$i) t
         |  GROUP BY v),
         |c$i AS MATERIALIZED (
         |  SELECT id, color FROM $c
         |  UNION ALL
         |  SELECT r.v AS id, coalesce(m.color, 0) AS color
         |  FROM ready$i r LEFT JOIN mex$i m ON m.v = r.v)""".stripMargin
    }.mkString(",\n")
    s"""WITH $pagesLnkSql,
       |ids AS (SELECT url, row_number() OVER (ORDER BY url) - 1 AS id FROM pages),
       |edges AS MATERIALIZED (
       |  SELECT DISTINCT s.id AS src, t.id AS dst
       |  FROM lnk JOIN ids s ON s.url = lnk.src_url
       |           JOIN ids t ON t.url = lnk.dst_url),
       |nodes AS MATERIALIZED (
       |  SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges),
       |sym AS MATERIALIZED (
       |  SELECT src, dst FROM edges WHERE src <> dst
       |  UNION SELECT dst, src FROM edges WHERE src <> dst),
       |prec AS MATERIALIZED (
       |  SELECT n.id AS v, s.dst AS lo
       |  FROM nodes n LEFT JOIN sym s
       |    ON s.src = n.id AND (${h("s.dst")}, s.dst) < (${h("s.src")}, s.src)),
       |c0 AS (SELECT CAST(NULL AS BIGINT) AS id, CAST(NULL AS BIGINT) AS color
       |       WHERE false),
       |$rounds
       |SELECT id, CAST(color AS BIGINT) AS color FROM c$ColoringRounds""".stripMargin
  }

  /** Canonical-URL keep-best dedup — the refetch collapser that runs
    * BEFORE any text dedup in a crawl pipeline: multiple raw fetches of
    * one page (tracking params, case variants, port/slash noise — the
    * [[urlCanon]] messy-variant menu) collapse onto a canonical key, and
    * ONE survivor is kept per key: the longest extracted text (fullest
    * fetch), ties to the smallest doc_id (stable across reruns).
    * Refetches are synthesized by mapping doc d onto page d mod
    * [[UrlDedupPages]], so every canonical key has ~n/200 contenders.
    *
    * Scale shape: canonicalization is scan-fused codegen'd string work;
    * keep-best is ONE map-side-combined aggregate — max of a (n_chars,
    * −doc_id) struct plus a count — on the canonical key. Identical
    * shuffle shape to exact dedup: no window function, no corpus sort,
    * partial aggregation absorbs popular-page skew.
    */
  def urlDedup(spark: SparkSession, dir: String): DataFrame = {
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
    val page = col("doc_id") % UrlDedupPages
    val host = page % 40
    val base = concat(lit("http://site"), host, lit(".test/p"), page)
    val variant = col("doc_id") % 5
    val messy = when(variant === 0,
        concat(lit("HTTP://SITE"), host, lit(".TEST/p"), page))
      .when(variant === 1, concat(base, lit("?utm_source=feed&utm_campaign=x")))
      .when(variant === 2, concat(base, lit("#sec2")))
      .when(variant === 3,
        concat(lit("http://site"), host, lit(".test:80/p"), page))
      .otherwise(concat(base, lit("//")))
    d.select(UrlNorm.canonicalize(messy).as("canon_url"),
        col("doc_id"), col("n_chars"))
      .groupBy("canon_url")
      .agg(
        max(struct(col("n_chars"), (-col("doc_id")).as("negid"))).as("best"),
        count(lit(1)).as("n_dups"))
      .select(col("canon_url"), (-col("best.negid")).as("doc_id"),
        col("best.n_chars").as("n_chars"), col("n_dups"))
  }

  private val UrlDedupPages = 200

  val urlDedupSql: String = {
    val page = s"(doc_id % $UrlDedupPages)"
    s"""WITH raw AS (
       |  SELECT doc_id, n_chars,
       |         CASE doc_id % 5
       |           WHEN 0 THEN 'HTTP://SITE' || ($page % 40) || '.TEST/p' || $page
       |           WHEN 1 THEN base || '?utm_source=feed&utm_campaign=x'
       |           WHEN 2 THEN base || '#sec2'
       |           WHEN 3 THEN 'http://site' || ($page % 40) || '.test:80/p' || $page
       |           ELSE base || '//'
       |         END AS u
       |  FROM (SELECT doc_id, n_chars,
       |               'http://site' || ($page % 40) || '.test/p' || $page AS base
       |        FROM documents)),
       |canon AS (
       |  SELECT doc_id, n_chars, ${UrlNorm.canonicalizeSql("u")} AS canon_url
       |  FROM raw),
       |ranked AS (
       |  SELECT canon_url, doc_id, n_chars,
       |         row_number() OVER (PARTITION BY canon_url
       |                            ORDER BY n_chars DESC, doc_id) AS rn,
       |         count(*) OVER (PARTITION BY canon_url) AS n_dups
       |  FROM canon)
       |SELECT canon_url, doc_id, n_chars, n_dups FROM ranked WHERE rn = 1""".stripMargin
  }
}
