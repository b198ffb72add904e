package graft.operators

import graft.{Fixtures, TestSpark}
import graft.core.Graph
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SCC condensation composition behind the `g_condense` gate face:
  * edge table ⋈ SCC labels on both endpoints → distinct inter-component
  * arcs. The result must be exactly the brute-force condensation and —
  * the defining property — a DAG.
  */
class CondenseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def condense(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    val g = Graph.fromPairs(spark, edges)
    val labels = Scc.run(g)
    val e = edges.toDF("src", "dst")
    e.join(labels.select($"id".as("src"), $"comp".as("comp_src")), Seq("src"))
      .join(labels.select($"id".as("dst"), $"comp".as("comp_dst")), Seq("dst"))
      .filter($"comp_src" =!= $"comp_dst")
      .select($"comp_src", $"comp_dst").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  /** Brute-force: reachability closure → mutual-reach components labeled
    * by min member → distinct cross-component arcs.
    */
  private def seqCondense(edges: Seq[(Long, Long)]): Set[(Long, Long)] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val reach = scala.collection.mutable.Map[Long, Set[Long]]()
    for (n <- nodes) {
      var seen = Set(n); var frontier = Set(n)
      while (frontier.nonEmpty) {
        val next = edges.filter(e => frontier(e._1)).map(_._2).toSet -- seen
        seen ++= next; frontier = next
      }
      reach(n) = seen
    }
    val comp = nodes.map(n => n -> nodes.filter(m => reach(n)(m) && reach(m)(n)).min).toMap
    edges.map(e => (comp(e._1), comp(e._2))).filter(p => p._1 != p._2).toSet
  }

  test("condensation matches brute force on fixtures and ER graphs") {
    for (edges <- Seq(Fixtures.bucket9, Fixtures.triangleTail, Fixtures.lozenge,
                      Fixtures.dag4, Fixtures.erdosRenyi(50, 0.05, 13))) {
      assert(condense(edges) == seqCondense(edges))
    }
  }

  test("the condensation is a DAG (no component reaches itself)") {
    val arcs = condense(Fixtures.erdosRenyi(60, 0.08, 17))
    // Kahn peel: a cyclic residual would never empty.
    var remaining = arcs
    var nodes = (arcs.map(_._1) ++ arcs.map(_._2)).toSet
    var progress = true
    while (nodes.nonEmpty && progress) {
      val sinksOrSources = nodes.filter(n => !remaining.exists(_._2 == n))
      progress = sinksOrSources.nonEmpty
      nodes --= sinksOrSources
      remaining = remaining.filterNot(a => sinksOrSources(a._1) || sinksOrSources(a._2))
    }
    assert(nodes.isEmpty, s"cycle among condensation components: $nodes")
  }
}
