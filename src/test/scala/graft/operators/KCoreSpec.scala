package graft.operators

import graft.TestSpark
import graft.core.Graph
import org.scalatest.funsuite.AnyFunSuite

class KCoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def coreMap(edges: Seq[(Long, Long)], k: Int): (Map[Long, Long], Int, Boolean) = {
    val r = KCore.run(Graph.fromPairs(spark, edges), k)
    (r.core.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap, r.rounds, r.converged)
  }

  /** Sequential reference: synchronous peel over an undirected simple
    * graph (self-loops dropped) — removes ALL sub-k vertices per round.
    * Round counting matches [[KCore.run]]'s documented semantics: a
    * terminal round that removes only already-isolated vertices (no edge
    * change) is not counted.
    */
  private def seqKCore(edges: Seq[(Long, Long)], k: Int): (Map[Long, Int], Int) = {
    val adj = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
    for ((u, v) <- edges if u != v) {
      adj.getOrElseUpdate(u, scala.collection.mutable.Set.empty) += v
      adj.getOrElseUpdate(v, scala.collection.mutable.Set.empty) += u
    }
    var rounds = 0
    var removing = true
    while (removing) {
      val rm = adj.collect { case (x, s) if s.size < k => x }.toSeq
      if (rm.isEmpty) removing = false
      else {
        if (rm.exists(adj(_).nonEmpty)) rounds += 1
        for (x <- rm) { for (y <- adj(x)) adj(y) -= x; adj -= x }
      }
    }
    (adj.map { case (x, s) => x -> s.size }.toMap, rounds)
  }

  /** Sequential coreness (exact peel, no cap) for differential testing. */
  private def seqCoreness(edges: Seq[(Long, Long)], vertices: Seq[Long]): Map[Long, Int] = {
    val adj = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
    for (v <- vertices) adj.getOrElseUpdate(v, scala.collection.mutable.Set.empty)
    for ((u, v) <- edges if u != v) { adj(u) += v; adj(v) += u }
    val core = scala.collection.mutable.Map.empty[Long, Int]
    var k = 0
    while (adj.nonEmpty) {
      var changed = true
      while (changed) {
        val rm = adj.collect { case (x, s) if s.size < k => x }.toSeq
        changed = rm.nonEmpty
        for (x <- rm) {
          core(x) = k - 1 max 0
          for (y <- adj(x)) adj(y) -= x
          adj -= x
        }
      }
      k += 1
    }
    core.toMap
  }

  test("triangle with a tail: 2-core is exactly the triangle") {
    // 1-2-3 triangle, 3-4-5 path tail
    val (core, rounds, conv) =
      coreMap(Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 4L, 4L -> 5L), k = 2)
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    assert(conv)
    assert(rounds == 2) // round 1 peels 5, round 2 peels 4
  }

  test("path P5 at k=2 cascades to empty in 2 edge-changing rounds") {
    val (core, rounds, conv) = coreMap(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L), k = 2)
    assert(core.isEmpty)
    // {1,5} then {2,4}; the final removal of the now-isolated {3} changes
    // no edge and is not a counted round (KCore.Result.rounds semantics).
    assert(rounds == 2)
    assert(conv)
  }

  test("direction, parallel arcs and self-loops do not affect the core") {
    // Same triangle+tail encoded with reversed arcs, duplicates, loops.
    val (core, _, _) = coreMap(
      Seq(2L -> 1L, 2L -> 3L, 1L -> 3L, 3L -> 1L, 4L -> 3L, 4L -> 5L,
        5L -> 4L, 1L -> 1L, 4L -> 4L), k = 2)
    assert(core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("k=1 drops only isolated/self-loop-only vertices") {
    val (core, _, _) = coreMap(Seq(1L -> 2L, 3L -> 3L), k = 1)
    assert(core == Map(1L -> 1L, 2L -> 1L))
  }

  test("differential vs sequential peel on a seeded pseudo-random graph") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(400)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
    for (k <- Seq(2, 3, 5)) {
      val (got, gotRounds, conv) = coreMap(edges, k)
      val (want, wantRounds) = seqKCore(edges, k)
      assert(got == want.map { case (x, d) => x -> d.toLong }, s"k=$k core mismatch")
      assert(gotRounds == wantRounds, s"k=$k round-count mismatch")
      assert(conv)
    }
  }

  test("coreness matches the exact sequential peel (incl. isolated=0)") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(300)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong)) :+
      (100L -> 100L) // self-loop-only vertex: coreness 0
    val g = Graph.fromPairs(spark, edges)
    val got = KCore.coreness(g, kMax = 32).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vertices = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val want = seqCoreness(edges, vertices).map { case (x, c) => x -> c.toLong }
    assert(got == want)
  }

  test("coreness kMax cap: survivors report kMax") {
    // K5 has coreness 4 everywhere; cap at 2 reports 2.
    val k5 = for (i <- 0L until 5L; j <- (i + 1) until 5L) yield (i, j)
    val got = KCore.coreness(Graph.fromPairs(spark, k5), kMax = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L until 5L).map(_ -> 2L).toMap)
  }

  test("maxRounds cap reports non-convergence") {
    val r = KCore.run(Graph.fromPairs(spark,
      Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L)), k = 2, maxRounds = 1)
    assert(!r.converged)
    assert(r.rounds == 1)
  }
}
