package graft.operators

import graft.{Fixtures, TestSpark}
import graft.core.Graph
import org.scalatest.funsuite.AnyFunSuite

class ReorderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Sequential replay of the ordering definition: rank in
    * (component min id, undirected BFS level from that min id, id).
    */
  private def seqOrder(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val und = (edges ++ edges.map(_.swap)).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // component = min reachable id (undirected closure)
    val comp = scala.collection.mutable.Map[Long, Long]()
    val dist = scala.collection.mutable.Map[Long, Long]()
    nodes.foreach { v =>
      if (!comp.contains(v)) { // v is its component's min: BFS from it
        var frontier = Set(v)
        var d = 0L
        val seen = scala.collection.mutable.Set(v)
        while (frontier.nonEmpty) {
          frontier.foreach { x => comp(x) = v; dist(x) = d }
          frontier = frontier.flatMap(x => und.getOrElse(x, Set.empty))
            .filterNot(seen)
          seen ++= frontier
          d += 1
        }
      }
    }
    nodes.sortBy(v => (comp(v), dist(v), v)).zipWithIndex
      .map { case (v, i) => v -> i.toLong }.toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val g = Graph.fromPairs(spark, edges)
    val comps = ConnectedComponents.run(g).components
    Reorder.bfsOrder(g.symmetrize, comps)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("bfsOrder matches the sequential (comp, level, id) replay; bijective") {
    for (edges <- Seq(
        Fixtures.tree7,
        Fixtures.erdosRenyi(60, 0.05, 7),
        // two components with interleaved ids: {0,2,4,6} path, {1,3,5} path
        Seq(0L -> 2L, 2L -> 4L, 4L -> 6L, 1L -> 3L, 3L -> 5L))) {
      val got = run(edges)
      val want = seqOrder(edges)
      assert(got == want, s"ordering diverged on ${edges.take(4)}…")
      assert(got.values.toSeq.sorted == (0L until got.size).toSeq)
    }
  }

  test("a scrambled path renumbers back to contiguity: γ cost strictly drops") {
    // path under a fixed id scramble (id -> (7*id + 3) mod 101): natural
    // gaps are large, the BFS order restores near-neighbor ids
    val scramble = (v: Long) => (7 * v + 3) % 101
    val edges = (0L until 100L).map(v => scramble(v) -> scramble(v + 1))
    val g = Graph.fromPairs(spark, edges)
    val mapping = Reorder.bfsOrder(g.symmetrize, ConnectedComponents.run(g).components)
    val m = mapping.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def gamma(es: Seq[(Long, Long)]): Long = es.groupBy(_._1).toSeq.map { case (s, g0) =>
      val ds = g0.map(_._2).distinct.sorted
      val gaps = (if (ds.head >= s) 2 * (ds.head - s) else 2 * (s - ds.head) - 1) +:
        ds.sliding(2).filter(_.size == 2).map(p => p(1) - p(0) - 1).toSeq
      gaps.map(x => 2 * (63 - java.lang.Long.numberOfLeadingZeros(x + 1)) + 1L).sum
    }.sum
    val nat = gamma(edges)
    val bfs = gamma(edges.map { case (s, d) => m(s) -> m(d) })
    assert(bfs < nat, s"BFS order did not reduce γ cost: $bfs >= $nat")
    // layered-BFS locality on a path: the root sits mid-path, layers hold
    // ≤ 2 vertices, so every remapped arc spans at most 3 new ids
    val remapped = edges.map { case (s, d) => m(s) -> m(d) }
    assert(remapped.forall { case (s, d) => math.abs(d - s) <= 3 },
      s"non-local remapped arc: ${remapped.filter(p => math.abs(p._2 - p._1) > 3)}")
  }

  test("web topology under an id scramble: BFS reorder recovers real γ compression") {
    // PageGen's crawl-order ids have host-block locality; a multiplicative
    // scramble destroys it (the "random renumber" worst case a crawl
    // mid-pipeline can land in). The reorder must win it back — this is
    // the production decision the g_bfs_reorder query reports, on a graph
    // with actual web structure (the gate's mod-601 derived graph is
    // locality-free by construction, so its gain is honestly ~0).
    val raw = graft.ingest.PageGen.edges(spark, 3000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val P = 4099L // prime > max id; x -> 1103x mod P is a bijection
    val scramble = (v: Long) => (1103L * v) % P
    val edges = raw.map { case (s, d) => scramble(s) -> scramble(d) }
    val g = Graph.fromPairs(spark, edges)
    val mapping = Reorder.bfsOrder(g.symmetrize, ConnectedComponents.run(g).components)
    val m = mapping.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def gamma(es: Seq[(Long, Long)]): Long = es.groupBy(_._1).toSeq.map { case (s, g0) =>
      val ds = g0.map(_._2).distinct.sorted
      val gaps = (if (ds.head >= s) 2 * (ds.head - s) else 2 * (s - ds.head) - 1) +:
        ds.sliding(2).filter(_.size == 2).map(p => p(1) - p(0) - 1).toSeq
      gaps.map(x => 2 * (63 - java.lang.Long.numberOfLeadingZeros(x + 1)) + 1L).sum
    }.sum
    val nat = gamma(edges)
    val bfs = gamma(edges.map { case (s, d) => m(s) -> m(d) })
    assert(bfs < nat,
      s"BFS order failed to recover locality on web topology: $bfs >= $nat")
  }

  test("disconnected components get contiguous, component-ordered ranges") {
    val edges = Seq(10L -> 11L, 11L -> 12L, 3L -> 4L, 4L -> 5L)
    val got = run(edges)
    // component mins: 3 (block first), then 10
    assert(got(3L) == 0 && got(4L) == 1 && got(5L) == 2)
    assert(got(10L) == 3 && got(11L) == 4 && got(12L) == 5)
  }
}
