package graft.operators

import graft.{Fixtures, TestSpark}
import graft.core.Graph
import org.scalatest.funsuite.AnyFunSuite

class LandmarksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Sequential BFS distances from one source over the undirected view. */
  private def bfsFrom(und: Map[Long, Set[Long]], s: Long): Map[Long, Long] = {
    val d = scala.collection.mutable.Map(s -> 0L)
    var frontier = Set(s)
    var lvl = 0L
    while (frontier.nonEmpty) {
      lvl += 1
      frontier = frontier.flatMap(x => und.getOrElse(x, Set.empty))
        .filterNot(d.contains)
      frontier.foreach(x => d(x) = lvl)
    }
    d.toMap
  }

  private def undOf(edges: Seq[(Long, Long)]): Map[Long, Set[Long]] =
    (edges ++ edges.map(_.swap)).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("sketch distances match sequential BFS from the degree-picked landmarks") {
    for (edges <- Seq(Fixtures.tree7, Fixtures.bucket9, Fixtures.erdosRenyi(60, 0.05, 3))) {
      val g = Graph.fromPairs(spark, edges)
      val lm = Landmarks.pick(g, 3).collect().map(_.getLong(0)).toSet
      // expected pick: top-3 by (out+in) degree on the distinct arcs, tie by id
      val e = edges.distinct
      val deg = e.flatMap(p => Seq(p._1, p._2)).groupBy(identity).view.mapValues(_.size.toLong).toMap
      val want = deg.toSeq.sortBy { case (id, d) => (-d, id) }.take(3).map(_._1).toSet
      assert(lm == want, s"landmark pick diverged: $lm vs $want")

      val got = Landmarks.sketch(g.symmetrize, Landmarks.pick(g, 3))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val und = undOf(edges)
      val exp = lm.flatMap(l => bfsFrom(und, l).map { case (v, d) => (l, v) -> d }).toMap
      assert(got == exp, s"sketch diverged on ${edges.take(3)}…")
    }
  }

  test("estimate is a triangle-inequality upper bound, exact through a landmark") {
    import spark.implicits._
    val edges = Fixtures.erdosRenyi(50, 0.06, 9)
    val g = Graph.fromPairs(spark, edges)
    val sk = Landmarks.sketch(g.symmetrize, Landmarks.pick(g, 3))
    val und = undOf(edges)
    val nodes = edges.flatMap(p => Seq(p._1, p._2)).distinct.sorted.take(12)
    val pairs = (for (u <- nodes; v <- nodes if u < v) yield (u, v)).toDF("u", "v")
    val est = Landmarks.estimate(sk, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val lms = Landmarks.pick(g, 3).collect().map(_.getLong(0))
    val dl = lms.map(l => l -> bfsFrom(und, l)).toMap
    est.foreach { case ((u, v), e) =>
      val truth = bfsFrom(und, u).get(v)
      // upper bound on the true distance…
      truth.foreach(t => assert(e >= t, s"estimate $e below true $t for ($u,$v)"))
      // …and exactly the best through-landmark path
      val best = lms.flatMap(l => for (a <- dl(l).get(u); b <- dl(l).get(v)) yield a + b)
      assert(best.nonEmpty && e == best.min, s"($u,$v): $e != ${best.minOption}")
    }
  }

  test("a landmark on the shortest path makes the estimate exact (path graph)") {
    import spark.implicits._
    // path 0-1-2-3-4-5-6: degree-2 interior ties resolve to ids 1,2,3
    val edges = (0L until 6L).map(v => v -> (v + 1))
    val g = Graph.fromPairs(spark, edges)
    val sk = Landmarks.sketch(g.symmetrize, Landmarks.pick(g, 3))
    val est = Landmarks.estimate(sk, Seq((0L, 6L), (0L, 4L)).toDF("u", "v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(est((0L, 6L)) == 6L) // landmark 3 sits mid-path: exact
    assert(est((0L, 4L)) == 4L)
  }
}
