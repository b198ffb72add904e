package graft.operators

import graft.core.Graph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Topological layering + acyclicity by iterative Kahn peeling.
  *
  * The reference computes top-sort as a reverse DFS postorder
  * (`/root/reference/src/algo/top_sort.rs:17-46`) and acyclicity via a
  * DFS on-stack revisit check (`/root/reference/src/algo/acyclicity.rs:
  * 16-38`). DFS has no distributed dataflow analogue (SURVEY §2.2), so
  * both are re-algorithmized as Kahn peeling: repeatedly remove
  * zero-in-degree vertices; the removal round is the topological LAYER
  * (any linearization of layers is a valid topo order — tests assert
  * validity, not the reference's DFS-specific order), and the graph is
  * acyclic iff peeling empties it.
  *
  * Rounds = longest path length; per round one aggregation + anti-join
  * over the shrinking remainder. Web-DAG layerings are shallow; for
  * pathological deep chains the driver loop is the bound, as in every
  * label-propagation-style algorithm here.
  */
object TopoSort {

  final case class Result(
      /** (id, layer) for peeled vertices; vertices on cycles are ABSENT. */
      layers: DataFrame,
      acyclic: Boolean,
      rounds: Int
  )

  def run(graph: Graph, maxRounds: Int = 10000): Result = {
    val spark = graph.spark
    import spark.implicits._

    var remainingEdges = graph.edges.toDF().persist(StorageLevel.MEMORY_AND_DISK)
    var remainingVerts = graph.vertices.toDF("id").persist(StorageLevel.MEMORY_AND_DISK)
    var remainingCount = remainingVerts.count()
    var layers = spark.emptyDataset[(Long, Int)].toDF("id", "layer")
    var round = 0
    var progressing = true

    while (remainingCount > 0 && progressing && round < maxRounds) {
      val zeroIn = remainingVerts
        .join(remainingEdges.select($"dst".as("id")).distinct(), Seq("id"), "left_anti")
        .persist(StorageLevel.MEMORY_AND_DISK)
      val peeled = zeroIn.count()
      if (peeled == 0) {
        progressing = false // remainder is all on cycles
        zeroIn.unpersist()
      } else {
        layers = layers.union(zeroIn.select($"id", lit(round).as("layer")))
          .localCheckpoint(true)
        val newVerts = remainingVerts.join(zeroIn, Seq("id"), "left_anti")
          .localCheckpoint(true)
        val newEdges = remainingEdges
          .join(zeroIn.select($"id".as("src")), Seq("src"), "left_anti")
          .localCheckpoint(true)
        remainingVerts.unpersist(); remainingEdges.unpersist(); zeroIn.unpersist()
        remainingVerts = newVerts
        remainingEdges = newEdges
        remainingCount -= peeled
        round += 1
      }
    }
    Result(layers, acyclic = remainingCount == 0, rounds = round)
  }

  def isAcyclic(graph: Graph): Boolean = run(graph).acyclic
}
