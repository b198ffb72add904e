package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class ModularitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def run(labels: Seq[(Long, Long)],
                  edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Double)] = {
    import spark.implicits._
    GraphQueries.modularityOf(labels.toDF("id", "label"), edges.toDF("src", "dst"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
  }

  test("two triangles bridged by one edge: the textbook two-community golden") {
    // Communities {0,1,2} and {3,4,5}; m = 7 undirected edges (A = 14
    // arcs). Each community: within_arcs = 6, deg_sum = 7 →
    // contribution = 6/14 − (7/14)² = 3/7 − 1/4; Q = 2× ≈ 0.357.
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 4L), (4L, 5L), (5L, 3L), (2L, 3L))
    val labels = Seq(0L -> 10L, 1L -> 10L, 2L -> 10L, 3L -> 20L, 4L -> 20L, 5L -> 20L)
    val got = run(labels, edges)
    val want = 6.0 / 14 - (7.0 / 14) * (7.0 / 14)
    assert(got(10L) == ((6L, 7L, want)))
    assert(got(20L) == ((6L, 7L, want)))
    assert(math.abs(got.values.map(_._3).sum - (6.0 / 7 - 0.5)) < 1e-12)
  }

  test("single community over the whole graph has Q = 0 exactly") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L))
    val got = run(edges.flatMap(e => Seq(e._1, e._2)).distinct.map(_ -> 99L), edges)
    assert(got == Map(99L -> ((6L, 6L, 0.0))))
  }

  test("direction, duplicates and self-loops do not matter; empty communities appear") {
    // Both directions + a duplicate + a self-loop collapse to the same
    // undirected simple graph; vertex 7's singleton community has no
    // arcs at all but still gets a row.
    val edges = Seq((0L, 1L), (1L, 0L), (0L, 1L), (2L, 2L), (1L, 2L))
    val labels = Seq(0L -> 1L, 1L -> 1L, 2L -> 2L, 7L -> 7L)
    val got = run(labels, edges)
    // undirected simple: {0-1, 1-2}, A = 4 arcs; community 1 within = 2
    // (0↔1), deg_sum = deg(0)+deg(1) = 1+2 = 3.
    assert(got(1L) == ((2L, 3L, 2.0 / 4 - (3.0 / 4) * (3.0 / 4))))
    assert(got(2L) == ((0L, 1L, 0.0 / 4 - (1.0 / 4) * (1.0 / 4))))
    assert(got(7L) == ((0L, 0L, 0.0)))
  }
}
