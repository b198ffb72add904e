package graft.operators

import graft.TestSpark
import graft.core.Graph
import org.scalatest.funsuite.AnyFunSuite

class MisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def runMis(edges: Seq[(Long, Long)], salt: String = "",
                     maxRounds: Int = 64): (Map[Long, Boolean], Int, Boolean) = {
    val r = Mis.run(Graph.fromPairs(spark, edges), salt, maxRounds)
    (r.mis.collect().map(x => x.getLong(0) -> x.getBoolean(1)).toMap,
      r.rounds, r.converged)
  }

  /** Scala replay of [[graft.text.TextOps.portableHash60]]. */
  private def h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
  }

  /** Sequential greedy MIS over the (hash, id) permutation — the exact
    * fixpoint contract of the synchronous local-minima rounds.
    */
  private def greedyMis(edges: Seq[(Long, Long)], salt: String): Set[Long] = {
    val adj = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
    val verts = scala.collection.mutable.Set.empty[Long]
    for ((u, v) <- edges) {
      verts += u; verts += v
      if (u != v) {
        adj.getOrElseUpdate(u, scala.collection.mutable.Set.empty) += v
        adj.getOrElseUpdate(v, scala.collection.mutable.Set.empty) += u
      }
    }
    val taken = scala.collection.mutable.Set.empty[Long]
    for (v <- verts.toSeq.sortBy(v => (h60(s"$v:$salt"), v)))
      if (!adj.getOrElse(v, Set.empty).exists(taken)) taken += v
    taken.toSet
  }

  private def checkMisProperties(edges: Seq[(Long, Long)], got: Map[Long, Boolean]): Unit = {
    val in = got.collect { case (v, true) => v }.toSet
    // independence: no edge inside the set
    for ((u, v) <- edges if u != v)
      assert(!(in(u) && in(v)), s"edge ($u,$v) inside the MIS")
    // maximality: every outside vertex has an in-set neighbor
    val adj = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, e.swap)).groupMap(_._1)(_._2)
    for (v <- got.keys if !in(v))
      assert(adj.getOrElse(v, Nil).exists(in),
        s"vertex $v outside the MIS with no MIS neighbor (not maximal)")
  }

  test("triangle: exactly one vertex, the smallest permutation key") {
    val edges = Seq(0L -> 1L, 1L -> 2L, 2L -> 0L)
    val (got, _, conv) = runMis(edges)
    assert(conv)
    assert(got.count(_._2) == 1)
    assert(got.filter(_._2).keySet == greedyMis(edges, ""))
  }

  test("star: center or all leaves, per the permutation (plus isolated vertex)") {
    val edges = Seq(0L -> 1L, 0L -> 2L, 0L -> 3L, 0L -> 4L, 9L -> 9L)
    val (got, _, conv) = runMis(edges)
    assert(conv)
    checkMisProperties(edges, got)
    assert(got(9L), "self-loop-only vertex is isolated in the simple graph and must join")
    assert(got.filter(_._2).keySet == greedyMis(edges, ""))
  }

  test("greedy-permutation differential on ER graphs, two salts") {
    for (seed <- Seq(1, 7); salt <- Seq("", "s2")) {
      val edges = graft.Fixtures.erdosRenyi(60, 0.08, seed)
      val (got, rounds, conv) = runMis(edges, salt)
      assert(conv)
      checkMisProperties(edges, got)
      assert(got.filter(_._2).keySet == greedyMis(edges, salt),
        s"seed=$seed salt=$salt: not the greedy-permutation MIS")
      assert(rounds <= 20, s"ER-60 took $rounds rounds (expected O(log n))")
    }
  }

  test("salt changes the set but not the contract") {
    val edges = graft.Fixtures.erdosRenyi(60, 0.1, 3)
    val (a, _, _) = runMis(edges, "a")
    val (b, _, _) = runMis(edges, "b")
    checkMisProperties(edges, a)
    checkMisProperties(edges, b)
    // determinism: same salt twice is identical
    val (a2, _, _) = runMis(edges, "a")
    assert(a == a2)
  }

  test("maxRounds honesty: a bound of 1 on a path leaves undecided rows unresolved") {
    // 0-1-2-3-4 path: round 1 takes the local minima; a 1-round cap
    // cannot certify maximality for the untouched middle.
    val edges = (0L until 4L).map(i => i -> (i + 1))
    val (got1, rounds1, conv1) = runMis(edges, maxRounds = 1)
    assert(rounds1 == 1)
    val (gotFull, _, convFull) = runMis(edges)
    assert(convFull)
    checkMisProperties(edges, gotFull)
    if (!conv1) {
      // undecided rows default to false, so the capped set is a SUBSET
      val in1 = got1.collect { case (v, true) => v }.toSet
      val inF = gotFull.collect { case (v, true) => v }.toSet
      assert(in1.subsetOf(inF))
    }
  }
}
