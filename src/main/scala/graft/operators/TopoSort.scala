package graft.operators

import graft.core.{Graph, Lineage}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  * State per round is ONLY the (id, indeg) vertex Dataset: peeling layer
  * r subtracts the peeled vertices' out-contributions from the remaining
  * in-degrees (a gather over the persisted adjacency, shuffling one row
  * per touched vertex). The edge set is never rewritten — at web scale
  * re-materializing the full remaining edge set per round would write
  * O(E · depth) bytes; the delta state writes O(V) per round total
  * across the run.
  *
  * Rounds = longest path length; web-DAG layerings are shallow; for
  * pathological deep chains the driver loop is the bound, as in every
  * label-propagation-style algorithm here.
  */
object TopoSort {

  /** Rounds between layer-union compactions (plan depth bound). */
  private val layerCompactEvery = 32

  final case class Result(
      /** (id, layer) for peeled vertices; vertices on cycles are ABSENT. */
      layers: DataFrame,
      acyclic: Boolean,
      rounds: Int
  )

  def run(
      graph: Graph,
      maxRounds: Int = 10000,
      /** Finish the peel on the DRIVER once the remaining subgraph has at
        * most this many vertices (0 = never): each distributed round
        * costs a fixed 2–3 Spark jobs regardless of size, so a deep tail
        * of tiny layers pays O(depth) driver latency for no parallelism —
        * the same cost-based small-graph policy as [[Scc.tarjanLocal]]
        * (and Spark's own broadcast threshold). The collected state is
        * one (id, indeg) row per remaining vertex plus the edges among
        * them; callers size the threshold to their driver heap.
        */
      localFinishVertices: Long = 0): Result = {
    val spark = graph.spark
    import spark.implicits._

    val adj = graph.adjacency // persisted, hash-partitioned by src
    adj.count()
    // Self-loops never reach indegree 0: keep them in the state so the
    // cycle is reported, like the reference's on-stack revisit.
    var state = graph.inDegrees.localCheckpoint(true)
    var remainingCount = state.count()
    var layers = spark.emptyDataset[(Long, Int)].toDF("id", "layer")
    val peels = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var round = 0
    var progressing = true

    while (remainingCount > 0 && progressing && round < maxRounds
           && remainingCount > localFinishVertices) {
      // Eager checkpoint: `layers` keeps a live reference to each round's
      // peel, so the blocks must survive the release of the parent state.
      val zero = state.filter($"deg" === 0L).select($"id").localCheckpoint(true)
      val peeled = zero.count()
      if (peeled == 0) {
        progressing = false // remainder is all on cycles
        Lineage.release(zero)
      } else {
        peels += zero
        layers = layers.union(zero.select($"id", lit(round).as("layer")))
        val dec = adj
          .join(zero.select($"id".as("src")), Seq("src"), "left_semi")
          .select(explode($"dsts").as("id"))
          .groupBy($"id")
          .agg(count(lit(1)).as("dec"))
        val next = state
          .join(zero, Seq("id"), "left_anti")
          .join(dec, Seq("id"), "left")
          .select($"id", ($"deg" - coalesce($"dec", lit(0L))).as("deg"))
          .localCheckpoint(true)
        Lineage.release(state)
        state = next
        // Compact the accumulated layer union every K rounds:
        // Dataset.union re-analyzes the whole plan per call, so an
        // unbounded chain is O(rounds²) driver work (and a StackOverflow
        // on deep DAGs). The eager checkpoint collapses it to one leaf;
        // the peel blocks it consumed can then be released — this
        // round's `zero` included, since `next` is already materialized.
        if ((round + 1) % layerCompactEvery == 0) {
          val compact = layers.localCheckpoint(true)
          peels.foreach(Lineage.release)
          peels.clear()
          peels += compact
          layers = compact
        }
        remainingCount -= peeled
        round += 1
      }
    }
    // Driver finish of the small remainder: same Kahn semantics, zero
    // per-layer Spark jobs.
    if (remainingCount > 0 && progressing && remainingCount <= localFinishVertices) {
      val ids = state.select($"id").collect().map(_.getLong(0)).toSet
      // Self-loops are KEPT (same as the distributed peel): a (v,v) edge
      // pins indeg(v) ≥ 1 forever, so v is correctly reported cyclic.
      val localEdges = graph.edges.toDF()
        .join(state.select($"id".as("src")), Seq("src"), "left_semi")
        .join(state.select($"id".as("dst")), Seq("dst"), "left_semi")
        .select($"src", $"dst")
        .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
      val indeg = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      val succ = scala.collection.mutable.Map[Long, List[Long]]().withDefaultValue(Nil)
      ids.foreach(v => indeg(v) = 0L)
      localEdges.foreach { case (s, d) => succ(s) = d :: succ(s); indeg(d) += 1 }
      val localLayers = scala.collection.mutable.ArrayBuffer[(Long, Int)]()
      var frontier = ids.filter(indeg(_) == 0L).toSeq.sorted
      while (frontier.nonEmpty) {
        frontier.foreach(v => localLayers += ((v, round)))
        val next = scala.collection.mutable.ArrayBuffer[Long]()
        frontier.foreach { v =>
          succ(v).foreach { d => indeg(d) -= 1; if (indeg(d) == 0L) next += d }
        }
        frontier = next.distinct.sorted.toSeq
        round += 1
      }
      remainingCount -= localLayers.length
      progressing = remainingCount == 0
      if (localLayers.nonEmpty)
        layers = layers.union(localLayers.toSeq.toDF("id", "layer"))
    }
    // Materialize the layer union off the per-round checkpoints, then the
    // result is self-contained and the per-round blocks can be dropped.
    val out = layers.localCheckpoint(true)
    Lineage.release(state)
    peels.foreach(Lineage.release)
    Result(out, acyclic = remainingCount == 0, rounds = round)
  }

  def isAcyclic(graph: Graph): Boolean = run(graph).acyclic
}
