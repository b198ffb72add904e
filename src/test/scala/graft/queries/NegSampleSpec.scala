package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class NegSampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def md5Hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  test("negative samples match the sequential degree^0.75 replay") {
    val edges = GraphQueries.edgesDf(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val deg = edges.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ids = deg.keys.toSeq.sorted
    val w = ids.map(v => v -> math.floor(math.sqrt(deg(v) * math.sqrt(deg(v))) * 256).toLong).toMap
    val tot = ids.map(w).sum
    // cumulative intervals in id order
    val lo = scala.collection.mutable.Map[Long, Long]()
    var acc = 0L
    ids.foreach { v => lo(v) = acc; acc += w(v) }
    def pick(u: Long): Long = ids.find(v => u >= lo(v) && u < lo(v) + w(v)).get

    val got = GraphQueries.negSample(64)(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 64, s"expected one negative per draw, got ${got.size}")
    (0 until 64).foreach { j =>
      val u = md5Hash60(s"neg:$j") % tot
      assert(got(j.toLong) == pick(u), s"draw $j diverged")
    }
  }
}
