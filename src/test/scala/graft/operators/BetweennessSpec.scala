package graft.operators

import graft.{Fixtures, TestSpark}
import graft.core.Graph
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

class BetweennessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Sequential Brandes replay (level-synchronous BFS + deepest-first
    * dependency accumulation), with the same bounded-depth semantics as
    * the operator.
    */
  private def seqBrandes(edges: Seq[(Long, Long)], seeds: Seq[Long],
                         maxDepth: Int = 32): Map[Long, Double] = {
    val es = edges.distinct
    val adj = es.groupBy(_._1).map { case (s, l) => s -> l.map(_._2) }
    val vs = (es.map(_._1) ++ es.map(_._2)).distinct
    val bc = mutable.Map[Long, Double]().withDefaultValue(0.0)
    for (s <- seeds.distinct if vs.contains(s)) {
      val dist = mutable.Map(s -> 0)
      val sigma = mutable.Map(s -> 1L)
      val order = mutable.ArrayBuffer(s)
      var frontier = Seq(s)
      var d = 0
      while (frontier.nonEmpty && d < maxDepth) {
        d += 1
        val next = mutable.LinkedHashMap[Long, Long]()
        for (u <- frontier; v <- adj.getOrElse(u, Nil) if !dist.contains(v))
          next(v) = next.getOrElse(v, 0L) + sigma(u)
        for ((v, sg) <- next) { dist(v) = d; sigma(v) = sg; order += v }
        frontier = next.keys.toSeq
      }
      val delta = mutable.Map[Long, Double]().withDefaultValue(0.0)
      for (v <- order.reverse) {
        for (w <- adj.getOrElse(v, Nil) if dist.get(w).contains(dist(v) + 1))
          delta(v) += sigma(v).toDouble / sigma(w) * (1 + delta(w))
        if (v != s) bc(v) += delta(v)
      }
    }
    vs.map(v => v -> bc(v)).toMap
  }

  private def run(edges: Seq[(Long, Long)], seeds: Seq[Long],
                  maxDepth: Int = 32): Map[Long, Double] =
    Betweenness.run(Graph.fromPairs(spark, edges), seeds, maxDepth)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  private def close(a: Map[Long, Double], b: Map[Long, Double]): Unit = {
    assert(a.keySet == b.keySet)
    for ((k, v) <- a)
      assert(math.abs(v - b(k)) <= 1e-9 * math.max(1.0, math.abs(v)),
        s"vertex $k: $v vs ${b(k)}")
  }

  test("diamond: shortest-path mass splits over the two middle vertices") {
    // 0→{1,2}→3: σ(3)=2, so δ(1)=δ(2)=1/2·(1+0); endpoints excluded.
    val got = run(Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L)), Seq(0L))
    assert(got == Map(0L -> 0.0, 1L -> 0.5, 2L -> 0.5, 3L -> 0.0))
  }

  test("path: every interior vertex carries all deeper targets") {
    // 0→1→2→3: δ(2)=1, δ(1)=1+δ(2)=2 (bc counts paths to BOTH 2 and 3).
    val got = run(Seq((0L, 1L), (1L, 2L), (2L, 3L)), Seq(0L))
    assert(got == Map(0L -> 0.0, 1L -> 2.0, 2L -> 1.0, 3L -> 0.0))
  }

  test("matches the sequential oracle on fixtures and ER graphs, multi-seed") {
    for ((edges, seeds) <- Seq(
      (Fixtures.bucket9, Seq(0L, 1L, 2L)),
      (Fixtures.triangleTail, Seq(0L)),
      (Fixtures.tree7, Seq(0L, 1L)),
      (Fixtures.erdosRenyi(60, 0.05, 11), Seq(0L, 5L, 11L, 23L)),
      (Fixtures.erdosRenyi(40, 0.15, 3), Seq(0L, 1L, 2L, 3L))
    )) close(run(edges, seeds), seqBrandes(edges, seeds))
  }

  test("bounded depth: both sides ignore paths longer than the cap") {
    val edges = Fixtures.erdosRenyi(50, 0.04, 19)
    for (cap <- Seq(1, 2, 3))
      close(run(edges, Seq(0L, 7L), maxDepth = cap),
        seqBrandes(edges, Seq(0L, 7L), maxDepth = cap))
  }

  test("seeds absent from the graph contribute nothing; output covers every vertex") {
    val edges = Seq((0L, 1L), (1L, 2L))
    val got = run(edges, Seq(0L, 999L))
    assert(got.keySet == Set(0L, 1L, 2L))
    assert(got == seqBrandes(edges, Seq(0L)))
  }
}
