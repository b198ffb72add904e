package graft.text

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class PackSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Sequential replay of the contiguous packing rule. */
  private def seqPack(docs: Seq[(Long, String, String)], c: Long)
      : Map[(String, Long), (Long, Long, Long)] = {
    val out = scala.collection.mutable.Map[(String, Long), (Long, Long, Long)]()
    docs.groupBy(_._3).foreach { case (src, ds) =>
      var start = 0L
      ds.sortBy(_._1).foreach { case (_, text, _) =>
        val tok = text.split("\\s+").count(_.nonEmpty).toLong
        val bin = start / c
        val straddle = if (tok > 0 && (start + tok - 1) / c > bin) 1L else 0L
        val (nd, nt, ns) = out.getOrElse((src, bin), (0L, 0L, 0L))
        out((src, bin)) = (nd + 1, nt + tok, ns + straddle)
        start += tok
      }
    }
    out.toMap
  }

  test("packing stats match the sequential replay (empty docs, straddles, shards)") {
    import spark.implicits._
    val words = (n: Int) => Seq.fill(n)("w").mkString(" ")
    val docs = Seq(
      (0L, words(5), "a"),   // a: starts 0
      (1L, "", "a"),         // empty doc, start 5
      (2L, words(4), "a"),   // start 5, straddles the c=8 boundary
      (3L, words(20), "a"),  // start 9: spans bins 1..3
      (4L, words(8), "b"),   // b: exactly fills bin 0
      (5L, words(1), "b"))   // starts bin 1 cleanly
    val dir = java.nio.file.Files.createTempDirectory("packspec").toString
    docs.toDF("doc_id", "text", "source").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")

    val got = graft.queries.TextQueries.packStats(8)(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val want = seqPack(docs, 8)
    assert(got == want, s"got $got\nwant $want")
    // pinned goldens for the interesting rows
    assert(got(("a", 0L)) == (3L, 9L, 1L)) // docs 0,1,2; doc 2 straddles
    assert(got(("a", 1L)) == (1L, 20L, 1L)) // doc 3 starts bin 1, spans to 3
    assert(got(("b", 0L)) == (1L, 8L, 0L)) // exact fill is NOT a straddle
    assert(got(("b", 1L)) == (1L, 1L, 0L))
  }
}
