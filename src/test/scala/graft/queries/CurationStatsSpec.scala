package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Sequential Scala oracles for the corpus-statistics queries (the gate
  * checks them against DuckDB; these replays pin the SEMANTICS — exact
  * interpolation formula, codepoint bigrams, UTF-8-byte tie order — so a
  * both-engines-wrong-identically drift is caught too).
  */
class CurationStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("lenPercentiles == sort + linear-interpolation replay per language") {
    val got = TextQueries.lenPercentiles(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select("lang", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1).toDouble))
    def q(sorted: Array[Double], p: Double): Double = {
      val rank = p * (sorted.length - 1)
      val lo = math.floor(rank).toInt
      val hi = math.ceil(rank).toInt
      sorted(lo) + (rank - lo) * (sorted(hi) - sorted(lo))
    }
    val byLang = rows.groupBy(_._1)
    assert(got.keySet == byLang.keySet)
    byLang.foreach { case (lang, rs) =>
      val v = rs.map(_._2).sorted
      val (n, p10, p50, p90, p99) = got(lang)
      assert(n == v.length, s"$lang count")
      for (((p, gotV)) <- Seq(0.1 -> p10, 0.5 -> p50, 0.9 -> p90, 0.99 -> p99))
        assert(math.abs(gotV - q(v, p)) < 1e-9, s"$lang p$p: got $gotV want ${q(v, p)}")
    }
  }

  test("bpePairs == codepoint-bigram count replay, top-50 by (n desc, UTF-8-byte pair asc)") {
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").collect()
      .flatMap(r => if (r.isNullAt(0)) None else Some(r.getString(0)))
    val counts = scala.collection.mutable.Map[String, Long]()
    for (t <- texts; w <- t.split("\\s+")) {
      // Spark's length()/substring() count CODEPOINTS; a UTF-16 replay
      // would drift on any supplementary character.
      val cps = w.codePoints().toArray
      if (cps.length >= 2)
        for (i <- 0 until cps.length - 1) {
          val p = new String(cps, i, 2)
          counts(p) = counts.getOrElse(p, 0L) + 1L
        }
    }
    // Spark string asc = unsigned UTF-8 byte order (UTF8String.compareTo),
    // not java.lang.String's UTF-16 order.
    def utf8Less(a: String, b: String): Boolean = {
      val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c < 0
        i += 1
      }
      x.length < y.length
    }
    val want = counts.toSeq
      .sortWith((a, b) => if (a._2 != b._2) a._2 > b._2 else utf8Less(a._1, b._1))
      .take(50)
    val got = TextQueries.bpePairs(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
    assert(got.size == 50 && got.head._2 >= got.last._2)
  }
}
