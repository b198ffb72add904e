package graft.operators

import graft.{Fixtures, TestSpark}
import graft.core.Graph
import org.scalatest.funsuite.AnyFunSuite

class WeightedPageRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Sequential weighted-PR replay (dangling mass uniform, fixed iters). */
  private def seqWeighted(edges: Seq[(String, String, Double)], iters: Int,
                          alpha: Double = 0.85): Map[String, Double] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size
    val outW = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dang = nodes.filter(v => outW.getOrElse(v, 0.0) == 0.0).map(r).sum
      val base = (1.0 - alpha) / n + alpha * dang / n
      r = nodes.map { v =>
        val contrib = edges.filter(_._2 == v).map { case (u, _, w) => r(u) * w / outW(u) }.sum
        v -> (base + alpha * contrib)
      }.toMap
    }
    r
  }

  private def run(edges: Seq[(String, String, Double)], iters: Int): Map[String, Double] = {
    import spark.implicits._
    PageRank.runWeightedFixed(edges.toDF("src", "dst", "weight"), iters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  test("matches the sequential replay (string ids, dangling, parallel arcs)") {
    val edges = Seq(
      ("a", "b", 3.0), ("a", "c", 1.0), ("b", "c", 2.0),
      ("c", "a", 1.0), ("c", "d", 1.0), // d is dangling
      ("b", "c", 1.0) // parallel arc: weights add
    )
    val got = run(edges, 5)
    val want = seqWeighted(edges, 5)
    assert(got.keySet == want.keySet)
    got.foreach { case (v, x) =>
      assert(math.abs(x - want(v)) < 1e-12, s"vertex $v: got $x want ${want(v)}")
    }
    assert(math.abs(got.values.sum - 1.0) < 1e-9) // mass conserved
  }

  test("weight sensitivity: a 3:1 out-weight split sends 3x the mass") {
    val got = run(Seq(("s", "x", 3.0), ("s", "y", 1.0)), 1)
    // After one iteration from uniform 1/3: contrib(x) = (1/3)·(3/4),
    // contrib(y) = (1/3)·(1/4); s gets no contribution, so the surpluses
    // over s's rank are in exactly the 3:1 weight ratio.
    assert(math.abs((got("x") - got("s")) - 3.0 * (got("y") - got("s"))) < 1e-12)
    assert(got("x") > got("y"))
  }

  test("uniform weights on a simple graph reduce to unweighted PageRank") {
    import spark.implicits._
    val pairs = Fixtures.erdosRenyi(50, 0.08, 17)
    val weighted = pairs.distinct.map { case (s, d) => (s, d, 1.0) }
    val got = PageRank.runWeightedFixed(
      weighted.toDF("src", "dst", "weight"), iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = PageRank.runFixed(Graph.fromPairs(spark, pairs), iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (v, x) =>
      assert(math.abs(x - want(v)) < 1e-12, s"vertex $v: got $x want ${want(v)}")
    }
  }
}
