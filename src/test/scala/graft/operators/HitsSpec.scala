package graft.operators

import graft.{Fixtures, TestSpark}
import graft.core.Graph
import org.scalatest.funsuite.AnyFunSuite

class HitsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Sequential HITS replay (L1 normalization, h₀ = 1). */
  private def seqHits(edges: Seq[(Long, Long)], iters: Int): Map[Long, (Double, Double)] = {
    val es = edges.distinct
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    var h = nodes.map(_ -> 1.0).toMap
    var a = nodes.map(_ -> 0.0).toMap
    def l1(m: Map[Long, Double]): Map[Long, Double] = {
      val s = m.values.sum
      if (s > 0) m.map { case (k, v) => k -> v / s } else m.map { case (k, _) => k -> 0.0 }
    }
    for (_ <- 1 to iters) {
      a = l1(nodes.map(v => v -> es.filter(_._2 == v).map(e => h(e._1)).sum).toMap)
      h = l1(nodes.map(v => v -> es.filter(_._1 == v).map(e => a(e._2)).sum).toMap)
    }
    nodes.map(v => v -> ((h(v), a(v)))).toMap
  }

  test("HITS matches the sequential oracle on fixture graphs") {
    for (edges <- Seq(Fixtures.bucket9, Fixtures.tree7, Fixtures.erdosRenyi(60, 0.06, 11))) {
      val got = Hits.run(Graph.fromPairs(spark, edges), iterations = 3)
        .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
      val want = seqHits(edges, 3)
      assert(got.keySet == want.keySet)
      got.foreach { case (v, (hb, au)) =>
        assert(math.abs(hb - want(v)._1) < 1e-12 && math.abs(au - want(v)._2) < 1e-12,
          s"vertex $v: got ($hb, $au) want ${want(v)}")
      }
    }
  }

  test("in-star: the center is the unit authority, spokes are equal hubs") {
    val edges = (1L to 5L).map(s => (s, 0L))
    val got = Hits.run(Graph.fromPairs(spark, edges), iterations = 2)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(math.abs(got(0L)._2 - 1.0) < 1e-12) // all authority mass on the center
    assert(got(0L)._1 == 0.0)                  // the center links to nothing
    (1L to 5L).foreach { s =>
      assert(math.abs(got(s)._1 - 0.2) < 1e-12 && got(s)._2 == 0.0)
    }
  }

  test("mass conservation: hub and auth each sum to 1 on a connected graph") {
    val got = Hits.run(Graph.fromPairs(spark, Fixtures.erdosRenyi(40, 0.1, 3)), iterations = 4)
      .collect()
    assert(math.abs(got.map(_.getDouble(1)).sum - 1.0) < 1e-9)
    assert(math.abs(got.map(_.getDouble(2)).sum - 1.0) < 1e-9)
  }
}
