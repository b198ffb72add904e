package graft.ingest

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PageGenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("pages: input_hint schema, deterministic across generations") {
    val p1 = PageGen.pages(spark, 200)
    assert(p1.schema.map(f => (f.name, f.dataType.typeName)) ==
      Seq("url" -> "string", "warc_ts" -> "timestamp", "html" -> "binary",
        "text" -> "string", "lang" -> "string"))
    val h1 = p1.agg(expr("bit_xor(xxhash64(url, warc_ts, html, text, lang))")).head().getLong(0)
    val h2 = PageGen.pages(spark, 200).repartition(7)
      .agg(expr("bit_xor(xxhash64(url, warc_ts, html, text, lang))")).head().getLong(0)
    assert(h1 == h2) // byte-identical per url regardless of partitioning
  }

  test("edges: deterministic, in-range, web-shaped (dangling + hubs)") {
    val n = 2000L
    val e = PageGen.edges(spark, n).cache()
    val mm = e.agg(min("src"), max("src"), min("dst"), max("dst")).head()
    assert(mm.getLong(0) >= 0 && mm.getLong(1) < n && mm.getLong(2) >= 0 && mm.getLong(3) < n)
    val srcs = e.select("src").distinct().count()
    val danglingFrac = 1.0 - srcs.toDouble / n
    assert(danglingFrac > 0.005 && danglingFrac < 0.06, s"dangling=$danglingFrac")
    // hubs: low ids collect extra in-links
    val lowIn = e.filter(col("dst") < 50).count()
    assert(lowIn.toDouble / e.count() > 0.05)
    // power-law-ish: some vertex has out-degree >= 20x the mean
    val maxDeg = e.groupBy("src").count().agg(max("count")).head().getLong(0)
    assert(maxDeg > 20L * e.count() / n)
    e.unpersist()
  }
}

class DenseIdsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ids are dense 0..n-1 in key sort order, any partitioning") {
    val keys = (0 until 500).map(i => f"k${(i * 7919) % 500}%04d").distinct
    val df = keys.toDF("url").repartition(13)
    val got = DenseIds.assign(df, "url", numPartitions = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = keys.sorted.zipWithIndex.map { case (k, i) => k -> i.toLong }.toMap
    assert(got == want)
  }
}

class LinkExtractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** The ingest invariant: pages → href extraction reproduces exactly the
    * directly-generated topology (modulo the url↔id bijection).
    */
  test("extracted edges == directly generated edges (via url id parse)") {
    val n = 300L
    val pages = PageGen.pages(spark, n)
    val byUrl = LinkExtract.links(pages)
      .select(
        regexp_extract(col("src_url"), "page(\\d+)$", 1).cast("long").as("src"),
        regexp_extract(col("dst_url"), "page(\\d+)$", 1).cast("long").as("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val direct = PageGen.edges(spark, n)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(byUrl == direct)
  }

  test("anchorText: per-target counts, distinct anchors, frequency-then-lex top pick") {
    import spark.implicits._
    val pages = Seq(
      ("u1", """<x><a href="t1">alpha</a><a href="t1">beta</a><a href="t2">gamma</a></x>"""),
      ("u2", """<a href="t1">beta</a><a href="t1">alpha</a>"""),
      ("u3", """<a href="t2">delta</a><a href="t3"></a>""")
    ).toDF("url", "html")
    val got = LinkExtract.anchorText(LinkExtract.anchors(pages))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got == Map(
      // t1: alpha×2 beta×2 — frequency tie broken lexicographically
      "t1" -> ((4L, 2L, "alpha")),
      // t2: gamma×1 delta×1 → lex min delta
      "t2" -> ((2L, 2L, "delta")),
      // empty inner text is still an anchor occurrence
      "t3" -> ((1L, 1L, ""))))
  }

  test("extractText: tag-adjacent tokens stay split; whitespace collapses; no-tag and empty pages") {
    import spark.implicits._
    val pages = Seq(
      ("u1", """<html><body><a href="x">one</a><a href="y">two</a></body></html>"""),
      ("u2", "plain  text   here"), // no tags: collapse only
      ("u3", "<html><body></body></html>"), // tags only -> empty text
      ("u4", "a<br/>b")
    ).toDF("url", "html")
    val got = LinkExtract.extractText(pages)
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got == Map(
      "u1" -> (("one two", 2L)),
      "u2" -> (("plain text here", 3L)),
      "u3" -> (("", 0L)),
      "u4" -> (("a b", 2L))))
  }

  test("full ingest: dense vertex map covers all pages; edges in range") {
    val pages = PageGen.pages(spark, 200L)
    val (vm, edges) = LinkExtract.ingest(pages)
    assert(vm.count() == 200L)
    assert(vm.agg(min("id"), max("id")).head() match {
      case r => r.getLong(0) == 0L && r.getLong(1) == 199L
    })
    val e = edges.cache()
    assert(e.count() > 0)
    assert(e.agg(max("src"), max("dst")).head().toSeq.forall(_.asInstanceOf[Long] < 200L))
    // every edge endpoint resolves to a crawled page (closure over node set)
    vm.unpersist(); e.unpersist()
  }
}
