package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Sequential replay of the BV-style successor-gap γ-cost histogram:
  * sorted distinct successors per source, zigzag first gap against the
  * source id, gap−1 afterwards, γ length 2⌊log2(n+1)⌋+1.
  */
class GapBitsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("gapBits == Scala zigzag/gamma replay over the derived edges") {
    val edges = GraphQueries.edgesDf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def gamma(n: Long): Long = 2L * (63 - java.lang.Long.numberOfLeadingZeros(n + 1)) + 1
    val want = edges.groupBy(_._1).toSeq.flatMap { case (src, es) =>
      val dsts = es.map(_._2).distinct.sorted
      val first = if (dsts.head >= src) 2 * (dsts.head - src) else 2 * (src - dsts.head) - 1
      (first +: dsts.sliding(2).collect { case Array(a, b) => b - a - 1 }.toSeq).map(gamma)
    }.groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    val got = GraphQueries.gapBits(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    // γ lengths are odd by construction; total gaps == distinct arc count.
    assert(got.keySet.forall(_ % 2 == 1))
    assert(got.values.sum == edges.distinct.length)
  }

  test("gamma cost table spot-checks (gap 0 -> 1 bit, 1 -> 3, 2 -> 3, 3 -> 5, 6 -> 5, 7 -> 7)") {
    import spark.implicits._
    // One source with successors engineered to produce known gap values:
    // src 0, dsts [0,2,4,8,15,23]: first zigzag 2*0=0, then gaps-1 = 1,1,3,6,7.
    val df = Seq((0L, 0L), (0L, 2L), (0L, 4L), (0L, 8L), (0L, 15L), (0L, 23L))
      .toDF("src", "dst").createOrReplaceTempView("__gap_fixture")
    val got = spark.sql(
      """SELECT bits, count(*) AS n FROM (
        |  SELECT CAST(2 * floor(log2(g + 1)) + 1 AS BIGINT) AS bits FROM (
        |    SELECT explode(transform(dsts, (d, i) ->
        |      CASE WHEN i = 0 THEN
        |        CASE WHEN d >= src THEN 2 * (d - src) ELSE 2 * (src - d) - 1 END
        |      ELSE d - element_at(dsts, i) - 1 END)) AS g
        |    FROM (SELECT src, sort_array(collect_set(dst)) AS dsts
        |          FROM __gap_fixture GROUP BY src)))
        |GROUP BY bits""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 3L -> 2L, 5L -> 2L, 7L -> 1L))
  }
}
