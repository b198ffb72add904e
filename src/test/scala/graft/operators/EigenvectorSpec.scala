package graft.operators

import graft.{Fixtures, TestSpark}
import graft.core.Graph
import org.scalatest.funsuite.AnyFunSuite

class EigenvectorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Sequential replay of the engine algebra: in-neighbor sum then L2
    * normalization per stage, x₀ = 1.
    */
  private def seqEigen(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] = {
    val es = edges.distinct
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
    var x = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to iters) {
      val y = nodes.map(v => v -> es.filter(_._2 == v).map(e => x(e._1)).sum).toMap
      val nrm = math.sqrt(y.values.map(v => v * v).sum)
      x = if (nrm > 0) y.map { case (k, v) => k -> v / nrm }
          else y.map { case (k, _) => k -> 0.0 }
    }
    x
  }

  test("eigenvector matches the sequential oracle on fixtures and ER graphs") {
    for (edges <- Seq(Fixtures.bucket9, Fixtures.clique5, Fixtures.cycle4,
                      Fixtures.erdosRenyi(70, 0.06, 19))) {
      val got = Eigenvector.runFixed(Graph.fromPairs(spark, edges), iterations = 4)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val want = seqEigen(edges, 4)
      assert(got.keySet == want.keySet)
      got.foreach { case (v, x) =>
        assert(math.abs(x - want(v)) < 1e-9, s"vertex $v: got $x want ${want(v)}")
      }
    }
  }

  test("a cycle's principal eigenvector is uniform") {
    val got = Eigenvector.runFixed(Graph.fromPairs(spark, Fixtures.cycle4), iterations = 8)
      .collect().map(_.getDouble(1))
    got.foreach(x => assert(math.abs(x - 0.5) < 1e-12))
  }

  test("acyclic mass decays to the zero vector (zero-norm guard)") {
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L))
    val got = Eigenvector.runFixed(Graph.fromPairs(spark, path), iterations = 6)
      .collect().map(_.getDouble(1))
    got.foreach(x => assert(x == 0.0))
  }
}
