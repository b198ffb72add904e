package graft.operators

import graft.{Fixtures, TestSpark}
import graft.core.Graph
import org.scalatest.funsuite.AnyFunSuite

class SalsaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Sequential SALSA replay: degree-split contributions, L1-normalized
    * per half-step, h₀ = 1 (the Scala engine's exact semantics).
    */
  private def seqSalsa(edges: Seq[(Long, Long)], iters: Int): Map[Long, (Double, Double)] = {
    val es = edges.distinct
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val outdeg = es.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val indeg = es.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    var h = nodes.map(_ -> 1.0).toMap
    var a = nodes.map(_ -> 0.0).toMap
    def l1(m: Map[Long, Double]): Map[Long, Double] = {
      val s = m.values.sum
      if (s > 0) m.map { case (k, v) => k -> v / s } else m.map { case (k, _) => k -> 0.0 }
    }
    for (_ <- 1 to iters) {
      a = l1(nodes.map(v => v -> es.filter(_._2 == v).map(e => h(e._1) / outdeg(e._1)).sum).toMap)
      h = l1(nodes.map(v => v -> es.filter(_._1 == v).map(e => a(e._2) / indeg(e._2)).sum).toMap)
    }
    nodes.map(v => v -> ((h(v), a(v)))).toMap
  }

  test("SALSA matches the sequential oracle on fixture graphs") {
    for (edges <- Seq(Fixtures.bucket9, Fixtures.tree7, Fixtures.erdosRenyi(60, 0.06, 11))) {
      val got = Salsa.run(Graph.fromPairs(spark, edges), iterations = 3)
        .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
      val want = seqSalsa(edges, 3)
      assert(got.keySet == want.keySet)
      got.foreach { case (v, (hb, au)) =>
        assert(math.abs(hb - want(v)._1) < 1e-12 && math.abs(au - want(v)._2) < 1e-12,
          s"vertex $v: got ($hb, $au) want ${want(v)}")
      }
    }
  }

  test("TKC robustness: SALSA authority follows in-degree, not clique mass") {
    // A 4-clique of mutually-linking pages (the tightly-knit community,
    // hub-auth growth factor 9) vs one page endorsed by FIVE independent
    // spokes (growth factor 5). HITS's mutual reinforcement concentrates
    // authority in the clique exponentially; SALSA weights distinct
    // endorsements, so the independently-cited page out-ranks every
    // clique member.
    val cliqueIds = Seq(1L, 2L, 3L, 4L)
    val clique = for (u <- cliqueIds; v <- cliqueIds if u != v) yield (u, v)
    val spokes = (10L to 14L).map(s => s -> 20L)
    val edges = clique ++ spokes
    val got = Salsa.run(Graph.fromPairs(spark, edges), iterations = 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(cliqueIds.forall(c => got(20L) > got(c)),
      s"page 20 (5 independent citations) should out-rank the clique: $got")
    val hits = Hits.run(Graph.fromPairs(spark, edges), iterations = 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(cliqueIds.forall(c => hits(c) > hits(20L)),
      s"sanity: HITS should favor the clique here: $hits")
  }

  test("uniform out-star: walk mass splits equally among targets") {
    // One hub linking to 4 targets: every target gets auth 1/4.
    val edges = (1L to 4L).map(t => (0L, t))
    val got = Salsa.run(Graph.fromPairs(spark, edges), iterations = 2)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    (1L to 4L).foreach(t => assert(math.abs(got(t)._2 - 0.25) < 1e-12))
    assert(math.abs(got(0L)._1 - 1.0) < 1e-12)
  }
}
