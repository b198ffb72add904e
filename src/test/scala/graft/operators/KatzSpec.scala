package graft.operators

import graft.{Fixtures, TestSpark}
import graft.core.Graph
import org.scalatest.funsuite.AnyFunSuite

class KatzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Sequential replay of the exact engine algebra:
    * x₀ = β; xₜ₊₁(v) = β + α·Σ_{(u,v)} xₜ(u).
    */
  private def seqKatz(edges: Seq[(Long, Long)], iters: Int,
                      alpha: Double = 0.05, beta: Double = 1.0): Map[Long, Double] = {
    val es = edges.distinct
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
    var x = nodes.map(_ -> beta).toMap
    for (_ <- 1 to iters) {
      x = nodes.map { v =>
        v -> (beta + alpha * es.filter(_._2 == v).map(e => x(e._1)).sum)
      }.toMap
    }
    x
  }

  test("Katz matches the sequential oracle on fixtures and ER graphs") {
    for (edges <- Seq(Fixtures.bucket9, Fixtures.tree7, Fixtures.clique5,
                      Fixtures.erdosRenyi(80, 0.05, 7))) {
      val got = Katz.runFixed(Graph.fromPairs(spark, edges), iterations = 4)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val want = seqKatz(edges, 4)
      assert(got.keySet == want.keySet)
      got.foreach { case (v, x) =>
        assert(math.abs(x - want(v)) < 1e-9, s"vertex $v: got $x want ${want(v)}")
      }
    }
  }

  test("walk counting: no degree division — a hub passes full score downstream") {
    // k spokes each point at a relay; the relay points at a sink.
    // After 2 iterations: sink = β + α·(β + α·k·β) — the k paths of
    // length 2 all count (PageRank would divide the relay's score away).
    val k = 5
    val edges = (1L to k.toLong).map(s => s -> 100L) :+ (100L -> 200L)
    val got = Katz.runFixed(Graph.fromPairs(spark, edges), iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val a = 0.05
    assert(math.abs(got(200L) - (1.0 + a * (1.0 + a * k))) < 1e-12)
    assert(math.abs(got(100L) - (1.0 + a * k)) < 1e-12)
    // spokes receive nothing: x = β throughout
    assert((1L to k.toLong).forall(s => got(s) == 1.0))
  }
}
