package graft.text

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class TfIdfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("top terms, smoothed idf values, and deterministic tie-break") {
    val docs = Seq(
      (0L, "cat cat dog"),
      (1L, "cat fish"),
      (2L, "dog dog dog bird")).toDF("doc_id", "text")
    val got = TextOps.tfIdfTop(docs, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> (r.getString(1), r.getDouble(3)))
      .toMap

    def idf(df: Int) = math.log(4.0 / (df + 1)) + 1 // N = 3
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    // doc 0: cat tf=2 (df 2), dog tf=1 (df 2) -> cat first
    assert(got((0L, 1L)) == ("cat", r6(2 * idf(2))))
    assert(got((0L, 2L)) == ("dog", r6(1 * idf(2))))
    // doc 1: cat and fish both tf=1; fish df=1 outscores cat df=2
    assert(got((1L, 1L)) == ("fish", r6(1 * idf(1))))
    assert(got((1L, 2L)) == ("cat", r6(1 * idf(2))))
    // doc 2: dog tf=3 dominates bird
    assert(got((2L, 1L)) == ("dog", r6(3 * idf(2))))
    assert(got((2L, 2L)) == ("bird", r6(1 * idf(1))))
    assert(got.size == 6)
  }

  test("equal scores break ties by term ascending; null/empty text emits nothing") {
    val docs = Seq(
      (0L, "b a"), // same tf, same df -> same score
      (1L, null.asInstanceOf[String]),
      (2L, "   ")).toDF("doc_id", "text")
    val rows = TextOps.tfIdfTop(docs, k = 2).collect()
    assert(rows.forall(_.getLong(0) == 0L))
    val byRank = rows.map(r => r.getLong(2) -> r.getString(1)).toMap
    assert(byRank(1L) == "a" && byRank(2L) == "b")
  }
}
