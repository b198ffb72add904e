package graft.text

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class RepLinesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("duplicate-line stats: dedupe after trim, empties dropped, null text safe") {
    val docs = Seq(
      (0L, "a\nb\na\n\n  a  \nc"),   // lines a,b,a,a,c -> 5 total, 3 distinct
      (1L, "x\ny\nz"),               // no dups
      (2L, "same\nsame\nsame"),      // all dups
      (3L, ""),                      // no lines
      (4L, null.asInstanceOf[String]),
      (5L, "\n \n  \n")              // whitespace-only lines vanish
    ).toDF("doc_id", "text")
    val got = TextOps.repLines(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(0L) == ((5L, 3L, 0.4)))
    assert(got(1L) == ((3L, 3L, 0.0)))
    assert(got(2L)._1 == 3L && got(2L)._2 == 1L
      && math.abs(got(2L)._3 - 0.666667) < 1e-9) // round(2/3, 6)
    assert(got(3L) == ((0L, 0L, 0.0)))
    assert(got(4L) == ((0L, 0L, 0.0)))
    assert(got(5L) == ((0L, 0L, 0.0)))
  }
}
