package graft.text

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MixingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Scala replay of portableHash60 for membership oracles. */
  private def hash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  test("hashSample: deterministic, monotone in rate, stable under corpus growth") {
    import spark.implicits._
    val small = (0L until 400L).toDF("doc_id")
    val grown = (0L until 1000L).toDF("doc_id")
    def ids(df: org.apache.spark.sql.DataFrame, rate: Double): Set[Long] =
      Mixing.hashSample(df, col("doc_id"), rate, "t").collect().map(_.getLong(0)).toSet
    val s25 = ids(small, 0.25)
    assert(s25 == ids(small, 0.25)) // deterministic
    assert(s25.subsetOf(ids(small, 0.5))) // monotone
    // growing the corpus never flips an existing row's membership
    assert(ids(grown, 0.25).filter(_ < 400L) == s25)
    // membership matches the hash replay exactly
    val threshold = math.round(0.25 * (1L << 60))
    assert(s25 == (0L until 400L).filter(i => hash60(s"$i:t") < threshold).toSet)
    // rate roughly honored
    assert(math.abs(s25.size / 400.0 - 0.25) < 0.08)
  }

  test("stratifiedSample: per-stratum rates with default fallback, exact replay") {
    import spark.implicits._
    val docs = (0L until 600L).map(i => (i, Seq("en", "zh", "fr")(i.toInt % 3)))
      .toDF("doc_id", "lang")
    val got = Mixing.stratifiedSample(docs, col("lang"), col("doc_id"),
      rates = Map("en" -> 0.25, "zh" -> 0.5), defaultRate = 0.125, salt = "x")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def thr(rate: Double) = math.round(rate * (1L << 60))
    val want = (0L until 600L).flatMap { i =>
      val lang = Seq("en", "zh", "fr")(i.toInt % 3)
      val rate = Map("en" -> 0.25, "zh" -> 0.5).getOrElse(lang, 0.125)
      if (hash60(s"$i:x") < thr(rate)) Some(i -> lang) else None
    }.toMap
    assert(got == want)
    // and the three strata really get three different effective rates
    val byLang = got.groupBy(_._2).view.mapValues(_.size / 200.0).toMap
    assert(byLang.getOrElse("zh", 0.0) > byLang.getOrElse("en", 0.0))
    assert(byLang.getOrElse("en", 0.0) > byLang.getOrElse("fr", 0.0))
  }

  test("sqrtTemperatureWeights: sqrt proportionality and unit sum") {
    import spark.implicits._
    // group a: 4 docs x 4 tokens = 16; group b: 1 doc x 4 tokens = 4
    val docs = ((1 to 4).map(i => (i.toLong, "w w w w", "a")) :+ ((9L, "w w w w", "b")))
      .toDF("doc_id", "text", "source")
    val got = Mixing.sqrtTemperatureWeights(docs, col("source"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("a")._1 == 4L && got("a")._2 == 16L)
    assert(got("b")._1 == 1L && got("b")._2 == 4L)
    // sqrt(16):sqrt(4) = 2:1 → weights 2/3, 1/3
    assert(math.abs(got("a")._3 - 0.666667) < 1e-6)
    assert(math.abs(got("b")._3 - 0.333333) < 1e-6)
    assert(math.abs(got.values.map(_._3).sum - 1.0) < 1e-5)
  }
}
