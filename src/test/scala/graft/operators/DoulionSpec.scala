package graft.operators

import graft.{Fixtures, SeqOracles, TestSpark}
import graft.core.Graph
import org.scalatest.funsuite.AnyFunSuite

class DoulionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** The engine's portable hash, replayed: first 15 hex chars of md5. */
  private def hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  private def canon(edges: Seq[(Long, Long)]): Set[(Long, Long)] =
    edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet

  test("invP=1 keeps every edge and reproduces the exact triangle count") {
    for (edges <- Seq(Fixtures.bucket9, Fixtures.clique5, Fixtures.erdosRenyi(60, 0.1, 5))) {
      val row = TriangleCount.doulion(Graph.fromPairs(spark, edges), invP = 1).head()
      assert(row.getLong(0) == canon(edges).size)
      assert(row.getLong(1) == SeqOracles.triangles(edges))
      assert(row.getLong(2) == SeqOracles.triangles(edges))
    }
  }

  test("sampled count matches a sequential replay of the same hash sample") {
    val edges = Fixtures.erdosRenyi(80, 0.15, 9)
    val invP = 4
    val kept = canon(edges).filter { case (u, v) =>
      hash60(s"$u:$v:doulion") % invP == 0
    }
    val row = TriangleCount.doulion(Graph.fromPairs(spark, edges), invP = invP).head()
    assert(row.getLong(0) == kept.size, "kept-edge count must match the replayed sample")
    val want = SeqOracles.triangles(kept.toSeq)
    assert(row.getLong(1) == want)
    assert(row.getLong(2) == want * invP.toLong * invP * invP)
  }

  test("determinism: two runs (and re-partitioned input) agree exactly") {
    val edges = Fixtures.erdosRenyi(70, 0.12, 21)
    val a = TriangleCount.doulion(Graph.fromPairs(spark, edges), invP = 2).head()
    val b = TriangleCount.doulion(Graph.fromPairs(spark, edges.reverse), invP = 2).head()
    assert(a == b)
  }
}
