package graft.operators

import graft.core.{CheckpointConfig, Graph, IterationContext}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-truss decomposition (Cohen 2008) over the undirected simple graph —
  * the edge-level density analysis next to [[KCore]]: the k-truss is the
  * maximal subgraph in which every edge closes at least k−2 triangles
  * WITHIN the subgraph. Trusses are the standard community-core signal on
  * web/social graphs: a k-truss is always contained in the (k−1)-core,
  * but demands cohesion (shared neighbors per edge) rather than mere
  * degree, so it rejects the star-shaped hubs that survive coring.
  *
  * Semantics (deterministic):
  *  - graph is made simple and undirected (direction and self-loops
  *    ignored, parallel edges collapsed — the [[TriangleCount]] contract);
  *  - synchronous peel: each round computes the support of EVERY
  *    surviving edge ([[TriangleCount.supportOfCanonical]]) and removes
  *    all edges with support < k−2 simultaneously, so the round count is
  *    the peel depth, a graph invariant, not a removal-order artifact;
  *  - fixpoint: the surviving edge set — every edge with in-subgraph
  *    support ≥ k−2 (possibly empty).
  *
  * Scale shape: state is the surviving canonical (u, v) edge table — it
  * only SHRINKS, and each round is one support pass (the degree-ordered
  * wedge equi-join + closing-edge semi-join of [[TriangleCount]], whose
  * orientation bounds wedge blow-up by O(√m) even at hub vertices) plus
  * one filter and one action, lineage cut per round
  * ([[IterationContext.cut]]). No per-vertex adjacency arrays, no driver
  * state. Truss peel depth on web graphs is small (tens); callers
  * needing a bounded pass cap `maxRounds` and read `converged`.
  */
object KTruss {

  final case class Result(
      /** (u: Long, v: Long, support: Long) — the k-truss edges (u < v)
        * with their in-truss support (every support ≥ k−2; empty when
        * the whole graph peels away). Computed lazily over the final
        * state: consuming it costs one support pass.
        */
      truss: DataFrame,
      /** Synchronous peel rounds until fixpoint (0 = already a k-truss). */
      rounds: Int,
      converged: Boolean,
      history: Seq[graft.core.SuperstepMetrics]
  )

  def run(
      graph: Graph,
      k: Int,
      maxRounds: Int = 1000,
      checkpoint: Option[CheckpointConfig] = None,
      verbose: Boolean = false
  ): Result = {
    require(k >= 3, s"k must be >= 3 (k-2 triangles per edge), got $k")
    val spark = graph.spark
    import spark.implicits._

    val ctx = new IterationContext("ktruss", checkpoint, verbose = verbose)
    val resumed = ctx.resume(spark)
    var state = resumed.map(_._1).getOrElse {
      ctx.init(graph.edges
        .filter($"src" =!= $"dst")
        .select(least($"src", $"dst").as("u"), greatest($"src", $"dst").as("v"))
        .distinct()
        .toDF())
    }
    var prevEdges = state.count()
    var rounds = resumed.map(_._2).getOrElse(0)
    var changed = prevEdges > 0

    while (changed && rounds < maxRounds) {
      val next = ctx.cut(
        TriangleCount.supportOfCanonical(state)
          .filter($"support" >= (k - 2).toLong)
          .select($"u", $"v"))
      val cnt = next.count()
      changed = cnt != prevEdges
      if (changed) {
        rounds += 1
        state = ctx.advance(rounds, next,
          deltaNorm = (prevEdges - cnt).toDouble, messages = prevEdges,
          changed = prevEdges - cnt)
        prevEdges = cnt
        if (cnt == 0L) changed = false
      } else {
        // Fixpoint probe — release the discarded cut frame's blocks, like
        // every superseded state (the KCore pattern).
        next.unpersist()
        graft.core.Lineage.release(next)
      }
    }

    val truss = TriangleCount.supportOfCanonical(state)
    ctx.close()
    Result(truss, rounds, converged = !changed, ctx.history.toSeq)
  }
}
