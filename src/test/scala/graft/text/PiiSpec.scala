package graft.text

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class PiiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(texts: (Long, String)*) =
    TextOps.piiStats(texts.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)), r.getString(4)))
      .toMap

  test("counts and redaction per category; counts see pre-redaction text") {
    val got = run(
      1L -> "mail a.b-c+x@host.example and X@y.io now",
      2L -> "call 555-867-1234 or 020-555-0001",
      3L -> "from 10.0.3.77 via 192.168.1.1",
      4L -> "mixed: p@q.example then 555-123-4567 at 8.8.8.8",
      5L -> "clean text, no pii at all",
      6L -> "")
    assert(got(1L) == ((2L, 0L, 0L),
      "mail <EMAIL> and <EMAIL> now"))
    assert(got(2L) == ((0L, 2L, 0L), "call <PHONE> or <PHONE>"))
    assert(got(3L) == ((0L, 0L, 2L), "from <IP> via <IP>"))
    assert(got(4L) == ((1L, 1L, 1L), "mixed: <EMAIL> then <PHONE> at <IP>"))
    assert(got(5L) == ((0L, 0L, 0L), "clean text, no pii at all"))
    assert(got(6L) == ((0L, 0L, 0L), ""))
  }

  test("email host with dots is not double-counted as an IP; null text is empty") {
    // u@10.0.0.1.example: the email pattern eats the whole token first,
    // so n_ips counts the RAW text's standalone IPs only — here the
    // email's host contains dotted digits but the count is on original
    // text, so the IP regex does see "10.0.0.1" inside it. Document the
    // heuristic honestly: counts are per-pattern matches on raw text.
    val got = run(7L -> "u@10.0.0.1.example")
    val ((e, p, i), red) = got(7L)
    assert(e == 1L && p == 0L && i == 1L)
    assert(red == "<EMAIL>") // redaction order: email first, IP never surfaces
    val n = TextOps.piiStats(Seq((8L, null: String)).toDF("doc_id", "text"))
      .collect().head
    assert(n.getLong(1) == 0L && n.getString(4) == "")
  }
}
