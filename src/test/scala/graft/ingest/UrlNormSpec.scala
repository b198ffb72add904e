package graft.ingest

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UrlNormSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(UrlNorm.canonicalize(col("url"))).as[String].collect().toSeq

  test("each rule: fragment, case, default port, slashes, tracking params") {
    assert(canon(
      "http://a.test/p1#frag",
      "HTTP://A.Test/Path/Mixed",           // path case PRESERVED
      "http://a.test:80/p1",
      "https://a.test:443/p1",
      "https://a.test:8443/p1",             // non-default port KEPT
      "http://a.test//x///y/",
      "http://a.test/p1?utm_source=f&utm_campaign=x",
      "http://a.test/p1?utm_source=f&ref=h&utm_campaign=x", // survivor re-anchored
      "http://a.test/p1?ref=h&fbclid=abc",
      "http://a.test/"
    ) == Seq(
      "http://a.test/p1",
      "http://a.test/Path/Mixed",
      "http://a.test/p1",
      "https://a.test/p1",
      "https://a.test:8443/p1",
      "http://a.test/x/y",
      "http://a.test/p1",
      "http://a.test/p1?ref=h",
      "http://a.test/p1?ref=h",
      "http://a.test"
    ))
  }

  test("idempotent: canonicalize(canonicalize(u)) == canonicalize(u)") {
    val raw = Seq(
      "HTTP://B.TEST:80//p//q/?utm_x=1&a=2&gclid=z#f",
      "https://c.test/p?a=1",
      "not a url at all",
      "ftp://weird.test:21/file")
    val once = canon(raw: _*)
    assert(canon(once: _*) == once)
  }

  test("DuckDB-SQL twin produces the same rule list textually") {
    // The SQL twin is gate-verified for VALUES (i_url_canon); here pin
    // that both mention every rule's pattern so a one-sided edit fails.
    val sql = UrlNorm.canonicalizeSql("u")
    for (pat <- Seq("#.*", ":80", ":443", "/{2,}", "utm_", "fbclid", "gclid", "^&"))
      assert(sql.contains(pat), s"SQL twin lost rule pattern $pat")
  }
}
