package graft.operators

import graft.{Fixtures, TestSpark}
import graft.core.Graph
import graft.functions.GraphChecks
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class TopoSortSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("dag4 is acyclic; layering is a valid topological order") {
    val res = TopoSort.run(Graph.fromPairs(spark, Fixtures.dag4))
    assert(res.acyclic)
    val layer = res.layers.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    Fixtures.dag4.foreach { case (u, v) =>
      assert(layer(u) < layer(v), s"edge ($u,$v) violates layering")
    }
  }

  test("tree7 layering by depth") {
    val res = TopoSort.run(Graph.fromPairs(spark, Fixtures.tree7))
    assert(res.acyclic)
    val layer = res.layers.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(layer(0L) == 0 && layer(1L) == 1 && layer(6L) == 2)
  }

  test("cycles detected; off-cycle prefix still layered") {
    assert(!TopoSort.isAcyclic(Graph.fromPairs(spark, Fixtures.cycle4)))
    assert(!TopoSort.isAcyclic(Graph.fromPairs(spark, Seq((0L, 0L))))) // self-loop
    // 0 -> 1 -> 2 -> 1 (cycle on 1,2): vertex 0 peels, 1/2 don't
    val res = TopoSort.run(Graph.fromPairs(spark, Seq((0L, 1L), (1L, 2L), (2L, 1L))))
    assert(!res.acyclic)
    assert(res.layers.collect().map(_.getLong(0)).toSet == Set(0L))
  }

  test("random DAGs (ER upper-triangular) are acyclic; ER with cycles are not") {
    val dag = Fixtures.erdosRenyi(30, 0.15, 5).filter { case (u, v) => u < v }
    assert(TopoSort.isAcyclic(Graph.fromPairs(spark, dag)))
    val res = TopoSort.run(Graph.fromPairs(spark, dag))
    val layer = res.layers.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    dag.foreach { case (u, v) => assert(layer(u) < layer(v)) }
  }

  test("deep path DAG (80 layers) exercises the layer-union compaction") {
    // > layerCompactEvery rounds: the accumulated union is checkpointed
    // mid-run; layering must survive the compaction intact.
    val path = (0L until 79L).map(i => (i, i + 1))
    val res = TopoSort.run(Graph.fromPairs(spark, path))
    assert(res.acyclic && res.rounds >= 80)
    val layer = res.layers.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(layer.size == 80)
    (0L to 79L).foreach(v => assert(layer(v) == v.toInt, s"vertex $v"))
  }

  test("driver-finish path (localFinishVertices) == pure distributed peel") {
    for (edges <- Seq(
      Fixtures.dag4,
      Fixtures.erdosRenyi(40, 0.1, 7).filter { case (u, v) => u < v },
      Seq((0L, 1L), (1L, 2L), (2L, 1L), (0L, 3L)), // partial cycle
      Seq((0L, 1L), (1L, 1L), (0L, 2L)))) { // self-loop must stay cyclic in BOTH paths
      val g1 = TopoSort.run(Graph.fromPairs(spark, edges))
      val g2 = TopoSort.run(Graph.fromPairs(spark, edges), localFinishVertices = 1000000)
      // mid-run switch: a few distributed rounds, then driver finish
      val g3 = TopoSort.run(Graph.fromPairs(spark, edges), localFinishVertices = 10)
      val m1 = g1.layers.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(g2.layers.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap == m1)
      assert(g3.layers.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap == m1)
      assert(g2.acyclic == g1.acyclic && g3.acyclic == g1.acyclic)
    }
  }
}

/** Driver-exact DFS visit: EXACT order parity with the reference's DFS
  * goldens (the distributed analogues assert validity only — DFS order
  * is procedure-specific).
  */
class DfsSpec extends AnyFunSuite {

  test("top_sort exact orders (test_depth_first.rs:18-36)") {
    assert(Dfs.topSortLocal(Seq((1L, 2L), (0L, 1L))) == Seq(0L, 1L, 2L))
    assert(Dfs.topSortLocal(Seq((0L, 1L), (1L, 2L), (2L, 0L))) == Seq(0L, 1L, 2L))
    assert(Dfs.topSortLocal(Seq((0L, 1L), (0L, 2L), (2L, 3L), (1L, 3L))) == Seq(0L, 2L, 1L, 3L))
  }

  test("acyclicity via on-stack revisit break (test_depth_first.rs:38-54)") {
    assert(Dfs.isAcyclicLocal(Seq((1L, 2L), (0L, 1L))))
    assert(!Dfs.isAcyclicLocal(Seq((0L, 1L), (1L, 2L), (2L, 0L))))
    assert(Dfs.isAcyclicLocal(Seq((0L, 1L), (0L, 2L), (2L, 3L), (1L, 3L))))
    // forward/cross arcs are NOT cycles (on_stack=false revisits)
    assert(Dfs.isAcyclicLocal(Seq((0L, 1L), (0L, 2L), (1L, 2L))))
  }

  test("previsit depth equals path position on a chain (test_depth_first.rs:56-70)") {
    val chain = (0L until 5L).map(i => (i, i + 1))
    Dfs.visit(chain, Seq(0L), {
      case Dfs.Previsit(node, _, _, depth) => assert(node == depth); true
      case _ => true
    })
  }

  test("event stream is a valid DFS narrative (pre/post nest, preds are tree arcs)") {
    val edges = graft.Fixtures.bucket9
    val open = scala.collection.mutable.Set[Long]()
    var events = 0
    Dfs.visit(edges, Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L), {
      case Dfs.Previsit(node, pred, root, depth) =>
        assert(depth == 0 || open.contains(pred)); open += node; events += 1; true
      case Dfs.Postvisit(node, _, _, _) =>
        assert(open.contains(node)); open -= node; events += 1; true
      case _ => events += 1; true
    })
    assert(open.isEmpty && events > 0)
  }
}

class GraphChecksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("argmax/argmin: first instance on ties (reference semantics)") {
    import spark.implicits._
    val df = Seq((0L, 5.0), (1L, 9.0), (2L, 9.0), (3L, 1.0)).toDF("id", "v")
    assert(GraphChecks.argmax(df, col("v"), col("id")).get.getLong(0) == 1L)
    assert(GraphChecks.argmin(df, col("v"), col("id")).get.getLong(0) == 3L)
    assert(GraphChecks.argmaxFiltered(df, col("v"), col("v"), col("id"),
      col("id") =!= 1L).get.getLong(0) == 2L)
  }

  test("checkTransposed / checkSymmetric") {
    val g = Graph.fromPairs(spark, Fixtures.triangleTail)
    assert(GraphChecks.checkTransposed(g, g.transpose))
    assert(!GraphChecks.checkTransposed(g, g))
    assert(!GraphChecks.checkSymmetric(g))
    assert(GraphChecks.checkSymmetric(g.symmetrize))
  }
}
