package graft.operators

import graft.{Fixtures, TestSpark}
import graft.core.Graph
import org.scalatest.funsuite.AnyFunSuite

class SccSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def canon(m: Map[Long, Long]): Map[Long, Long] = {
    val mins = m.groupBy(_._2).map { case (c, kv) => c -> kv.keys.min }
    m.map { case (v, c) => v -> mins(c) }
  }

  // localFinishEdges = 0 pins the DISTRIBUTED pivot path: every fixture
  // here fits the default hybrid budget and would otherwise route to the
  // driver-side Tarjan finish (covered separately below).
  private def fbMap(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Scc.run(Graph.fromPairs(spark, edges), localFinishEdges = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("bucket9: SCC sizes [2,2,1,1,1,1,1]; 3 and 4 share a component (test_sccs.rs:91-123)") {
    val t = Scc.tarjanMap(Fixtures.bucket9)
    val sizes = t.groupBy(_._2).map(_._2.size).toSeq.sorted.reverse
    assert(sizes == Seq(2, 2, 1, 1, 1, 1, 1))
    assert(t(3L) == t(4L) && t(1L) == t(2L))
    assert(canon(fbMap(Fixtures.bucket9)) == canon(t))
  }

  test("triangle+tail: sizes [3,1] (test_sccs.rs:129-141)") {
    val t = Scc.tarjanMap(Fixtures.triangleTail)
    assert(t.groupBy(_._2).map(_._2.size).toSeq.sorted == Seq(1, 3))
    assert(canon(fbMap(Fixtures.triangleTail)) == canon(t))
  }

  test("cycle4 / clique5 single SCC; tree7 all singletons (test_sccs.rs:145-204)") {
    assert(Scc.tarjanMap(Fixtures.cycle4).values.toSet.size == 1)
    assert(Scc.tarjanMap(Fixtures.clique5).values.toSet.size == 1)
    assert(Scc.tarjanMap(Fixtures.tree7).values.toSet.size == 7)
    assert(canon(fbMap(Fixtures.cycle4)).values.toSet.size == 1)
    assert(canon(fbMap(Fixtures.tree7)).values.toSet.size == 7)
  }

  test("lozenge: exact Tarjan component vector [2,2,1,0] (test_sccs.rs:245-254)") {
    val t = Scc.tarjanMap(Fixtures.lozenge)
    assert(Seq(t(0L), t(1L), t(2L), t(3L)) == Seq(2L, 2L, 1L, 0L))
  }

  test("distributed FB equals Tarjan on ER graphs (Kosaraju-vs-Tarjan analogue, test_sccs.rs:229-242)") {
    // 2 seeds × {sparse, dense}: distributed rounds are level-sequential
    // Spark jobs, so each extra combo costs real suite wall-clock; the
    // hybrid test below adds web-topology coverage on top of these.
    for (seed <- 1 to 2; p <- Seq(0.02, 0.06)) {
      val edges = Fixtures.erdosRenyi(40, p, seed)
      assert(canon(fbMap(edges)) == canon(Scc.tarjanMap(edges)), s"seed=$seed p=$p")
    }
  }

  test("directed chain converges in O(log n) rounds (hash-random pivots), labels exact") {
    // A path is all singleton SCCs; a min-id pivot policy peels the head
    // each round with an F-reach over the ENTIRE rest — O(n) rounds and
    // O(n²) total BFS levels, exhausting any sane round cap at web
    // scale. Hash-random pivots split like quicksort: expected O(log n)
    // rounds, O(n) total levels. 16 vertices with a 12-round cap still
    // separates the two policies (min-id peel would need 15+ rounds)
    // while keeping the level-sequential Spark jobs inside the suite's
    // wall budget.
    val edges = (0L until 15L).map(i => (i, i + 1))
    val got = Scc.run(Graph.fromPairs(spark, edges), maxRounds = 12, localFinishEdges = 0)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 16 && got.forall { case (v, c) => v == c })
  }

  test("hybrid local finish: default budget routes the residual to driver Tarjan, labels identical") {
    // Web-shaped PageGen topology (giant SCC + dangling tail + hubs): the
    // hybrid path (default budget — local finish fires round 1 at this
    // scale), the pure distributed path, and driver Tarjan must agree
    // exactly. This is the bounded-residual policy a 10⁹-node crawl
    // relies on: distributed rounds carve the bulk, the O(budget) tail
    // finishes in one driver pass instead of O(tail) rounds.
    val edges = graft.ingest.PageGen.edges(spark, 2000).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val g = Graph.fromPairs(spark, edges)
    val hybrid = canon(Scc.run(g).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    val tarjan = canon(Scc.tarjanMap(edges))
    assert(hybrid == tarjan)
    // a mid-budget run exercises BOTH: ≥1 distributed round, then local
    val mixed = canon(Scc.run(g, localFinishEdges = edges.length / 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
    assert(mixed == tarjan)
  }

  test("tarjan whole-graph early exit: stops at the first closing revisit (tarjan.rs:60-76)") {
    // chain 0→…→11, back edge 11→0, plus chords 11→k for k=1..10: the
    // sorted successor scan at node 11 sees 0 first — that single
    // revisit closes the graph into one SCC with every vertex
    // discovered, so the remaining 10 chords must never be examined.
    val n = 12
    val chain = (0 until n - 1).map(i => (i.toLong, i + 1L))
    val back = Seq((n - 1L, 0L))
    val chords = (1 until n - 1).map(k => (n - 1L, k.toLong))
    val (comp, stats) = Scc.tarjanMapStats(chain ++ back ++ chords)
    assert(comp.keySet.size == n && comp.values.toSet == Set(0L))
    assert(stats.earlyExit, "single-SCC graph with all nodes discovered must exit early")
    assert(stats.revisits == 1L, s"examined ${stats.revisits} revisits; without the exit: ${n - 1}")
    // same labels as the plain cycle (residual-path flush preserves numbering)
    assert(comp == Scc.tarjanMap(chain ++ back))
    // multi-SCC graphs never trigger it and keep exact pop-order numbering
    val (loz, st2) = Scc.tarjanMapStats(Fixtures.lozenge)
    assert(!st2.earlyExit)
    assert(loz == Map(0L -> 2L, 1L -> 2L, 2L -> 1L, 3L -> 0L))
  }

  test("Dfs.visitWithPath returns the residual visit path on break (seq.rs stack())") {
    // break at the Previsit of node 3 on a 0→1→2→3 chain: the abandoned
    // path is 0,1,2,3 (root → current, push order)
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L))
    val (completed, path) = Dfs.visitWithPath(edges, Seq(0L), {
      case Dfs.Previsit(3L, _, _, _) => false
      case _ => true
    })
    assert(!completed && path == Seq(0L, 1L, 2L, 3L))
    val (done, empty) = Dfs.visitWithPath(edges, Seq(0L), _ => true)
    assert(done && empty.isEmpty)
  }

  test("tarjanLocal DataFrame path + sort_by_size renumbering") {
    val df = Scc.tarjanLocal(Graph.fromPairs(spark, Fixtures.bucket9))
    val ranked = ConnectedComponents.sortBySize(df)
    // largest components (size 2) first: ranks 0,1; then singletons
    val sizesByRank = ranked.select("rank", "size").distinct().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizesByRank(0) == 2L && sizesByRank(1) == 2L)
  }
}
