package graft.operators

import graft.TestSpark
import graft.core.Graph
import org.scalatest.funsuite.AnyFunSuite

class ColoringSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def runColoring(edges: Seq[(Long, Long)], salt: String = "",
                          maxRounds: Int = 64): (Map[Long, Long], Int, Boolean) = {
    val r = Coloring.run(Graph.fromPairs(spark, edges), salt, maxRounds)
    (r.colors.collect().collect {
      case x if !x.isNullAt(1) => x.getLong(0) -> x.getLong(1)
    }.toMap, r.rounds, r.converged)
  }

  /** Scala replay of [[graft.text.TextOps.portableHash60]]. */
  private def h60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
  }

  /** Sequential greedy coloring over the (hash, id) permutation — the
    * exact fixpoint contract of the synchronous Jones–Plassmann rounds.
    */
  private def greedyColoring(edges: Seq[(Long, Long)], salt: String): Map[Long, Long] = {
    val adj = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
    val verts = scala.collection.mutable.Set.empty[Long]
    for ((u, v) <- edges) {
      verts += u; verts += v
      if (u != v) {
        adj.getOrElseUpdate(u, scala.collection.mutable.Set.empty) += v
        adj.getOrElseUpdate(v, scala.collection.mutable.Set.empty) += u
      }
    }
    val color = scala.collection.mutable.Map.empty[Long, Long]
    for (v <- verts.toSeq.sortBy(v => (h60(s"$v:$salt"), v))) {
      val taken = adj.getOrElse(v, Set.empty).flatMap(color.get)
      color(v) = Iterator.from(0).map(_.toLong).find(!taken(_)).get
    }
    color.toMap
  }

  private def assertProper(edges: Seq[(Long, Long)], got: Map[Long, Long]): Unit =
    for ((u, v) <- edges if u != v)
      assert(got(u) != got(v), s"edge ($u,$v) monochromatic: ${got(u)}")

  test("triangle uses exactly colors {0,1,2}") {
    val edges = Seq(0L -> 1L, 1L -> 2L, 2L -> 0L)
    val (got, _, conv) = runColoring(edges)
    assert(conv)
    assert(got.values.toSet == Set(0L, 1L, 2L))
    assertProper(edges, got)
  }

  test("star: hub and leaves 2-colored; every isolated source colored 0") {
    // star 0-1..0-5 plus the isolated self-loop vertex 9
    val edges = (1L to 5L).map(0L -> _) :+ (9L -> 9L)
    val (got, _, conv) = runColoring(edges)
    assert(conv)
    assertProper(edges, got)
    assert(got.values.max <= 1L, s"star must 2-color, got $got")
    assert(got(9L) == 0L, "self-loop-only vertex is an isolated source: color 0")
  }

  test("path graph fixpoint == sequential greedy of the permutation order") {
    val edges = (0L until 19L).map(i => i -> (i + 1))
    val (got, _, conv) = runColoring(edges, salt = "p")
    assert(conv)
    assert(got == greedyColoring(edges, "p"))
  }

  test("ER graph: proper, == sequential greedy, and <= maxDeg+1 colors") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(400)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    val (got, rounds, conv) = runColoring(edges, salt = "er")
    assert(conv, s"did not converge in $rounds rounds")
    assertProper(edges, got)
    assert(got == greedyColoring(edges, "er"))
    val deg = edges.filter(e => e._1 != e._2).flatMap(e => Seq(e, e.swap))
      .groupMapReduce(_._1)(_ => 1)(_ + _)
    assert(got.values.max <= deg.values.max.toLong,
      s"used ${got.values.max + 1} colors vs maxDeg+1 = ${deg.values.max + 1}")
  }

  test("salt changes the permutation, not the validity") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(200)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val (a, _, _) = runColoring(edges, salt = "a")
    val (b, _, _) = runColoring(edges, salt = "b")
    assertProper(edges, a)
    assertProper(edges, b)
    assert(a == greedyColoring(edges, "a"))
    assert(b == greedyColoring(edges, "b"))
  }

  test("maxRounds honesty: capped run reports converged=false, partial colors null") {
    // a long path forces dependency depth > 1 round almost surely
    val edges = (0L until 40L).map(i => i -> (i + 1))
    val r = Coloring.run(Graph.fromPairs(spark, edges), salt = "cap", maxRounds = 1)
    assert(!r.converged)
    assert(r.rounds == 1)
    val rows = r.colors.collect()
    assert(rows.exists(_.isNullAt(1)), "capped run must leave undecided rows null")
    // the round-1 colors it DID assign agree with the fixpoint
    val fix = greedyColoring(edges, "cap")
    for (x <- rows if !x.isNullAt(1))
      assert(x.getLong(1) == fix(x.getLong(0)))
  }
}
