package graft.operators

import graft.core.{CheckpointConfig, Graph, IterationContext}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition (Seidman 1983; Matula–Beck peeling) over the
  * symmetrized simple graph — the standard web/social-graph density
  * analysis next to the bow-tie decomposition ([[BowTie]]): the k-core is
  * the maximal subgraph in which every vertex has degree >= k.
  *
  * Semantics (deterministic):
  *  - graph is symmetrized ([[Graph.symmetrize]]), self-loops dropped,
  *    parallel edges collapsed — degrees are simple undirected degrees;
  *  - synchronous peel: each round removes ALL vertices whose current
  *    degree is < k simultaneously (so the round count is the peel DEPTH,
  *    a graph invariant, not an artifact of removal order);
  *  - fixpoint: the surviving subgraph, every vertex with degree >= k.
  *
  * Scale shape: state is the surviving (src, dst) edge table — it only
  * SHRINKS. Each round is one map-side-combined degree count plus two
  * left-semi joins (src side reuses the groupBy partitioning; the dst
  * side is the one genuine exchange), one action, lineage cut per round
  * ([[IterationContext.cut]]). No per-vertex adjacency arrays, no driver
  * state — a 10^10-edge crawl peels with the same plan. Peel depth on
  * web graphs is O(100) rounds; callers needing a bounded pass can cap
  * `maxRounds` and read `converged`.
  */
object KCore {

  final case class Result(
      /** (id: Long, deg: Long) — vertices of the k-core with their
        * in-core degree (empty when the whole graph peels away).
        */
      core: DataFrame,
      /** Synchronous peel rounds until fixpoint (0 = already a k-core).
        * A round is counted iff it changed the surviving EDGE set: a
        * vertex whose last edge disappears leaves the subgraph in that
        * same round (it cannot be in any k-core for k >= 1), so the
        * classic vertex-peel's trailing "remove the now-isolated
        * vertices" round — always terminal, never mid-cascade, since an
        * edge-no-op round leaves every degree unchanged — is not
        * counted separately.
        */
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
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = graph.spark
    import spark.implicits._

    val ctx = new IterationContext("kcore", checkpoint, verbose = verbose)
    val resumed = ctx.resume(spark)
    var state = resumed.map(_._1).getOrElse {
      ctx.init(graph.symmetrize.edges.filter($"src" =!= $"dst").toDF())
    }
    var prevEdges = state.count()
    var rounds = resumed.map(_._2).getOrElse(0)
    var changed = prevEdges > 0

    while (changed && rounds < maxRounds) {
      val keep = state
        .groupBy($"src")
        .agg(count(lit(1)).as("deg"))
        .filter($"deg" >= k)
        .select($"src")
      val next = ctx.cut(
        state
          .join(keep, Seq("src"), "left_semi")
          .join(keep.select($"src".as("dst")), Seq("dst"), "left_semi")
          .select($"src", $"dst"))
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
        // Fixpoint probe: the freshly-built (and materialized) cut frame
        // is discarded — release its checkpoint blocks explicitly, like
        // every superseded state (leaked, they pin |E| rows until GC).
        next.unpersist()
        graft.core.Lineage.release(next)
      }
    }

    val core = state.groupBy($"src".as("id")).agg(count(lit(1)).as("deg"))
    ctx.close()
    Result(core, rounds, converged = !changed, ctx.history.toSeq)
  }

  /** Core numbers (coreness): per-vertex max k such that the vertex is in
    * the k-core, computed by INCREMENTAL peeling — the k-core is a
    * subgraph of the (k-1)-core, so each level continues from the
    * previous level's surviving edges and total work is bounded by
    * (levels x surviving size), not (levels x |E|). Vertices removed
    * while peeling to the k-core get core number k-1; survivors of the
    * `kMax` level are reported as `kMax` (a documented cap — web-graph
    * core numbers concentrate in the low tens, and callers can raise it).
    * Vertices with no (non-loop) neighbors have core number 0.
    *
    * Output: (id: Long, core: Long).
    */
  def coreness(
      graph: Graph,
      kMax: Int = 32,
      checkpoint: Option[CheckpointConfig] = None,
      verbose: Boolean = false
  ): DataFrame = {
    require(kMax >= 1, s"kMax must be >= 1, got $kMax")
    val spark = graph.spark
    import spark.implicits._

    val ctx = new IterationContext("coreness", checkpoint, verbose = verbose)
    val sym0 = graph.symmetrize.edges.filter($"src" =!= $"dst").toDF()
    val state0 = ctx.init(sym0)
    var state = state0
    var stateCount = state.count()
    // All vertices (incl. isolated / self-loop-only ones, which the
    // symmetrized simple edge table no longer carries): core number 0
    // until an edge level claims them.
    val allVertices = graph.vertices.toDF("id")
    var labels = allVertices.select($"id", lit(0L).as("core"))
    var iter = 0

    var level = 1
    while (level <= kMax && stateCount > 0) {
      // Peel to the `level`-core fixpoint, continuing from the current
      // surviving edge set.
      var changed = true
      while (changed) {
        val keep = state
          .groupBy($"src")
          .agg(count(lit(1)).as("deg"))
          .filter($"deg" >= level)
          .select($"src")
        val next = ctx.cut(
          state
            .join(keep, Seq("src"), "left_semi")
            .join(keep.select($"src".as("dst")), Seq("dst"), "left_semi")
            .select($"src", $"dst"))
        val cnt = next.count()
        changed = cnt != stateCount
        if (changed) {
          iter += 1
          state = ctx.advance(iter, next,
            deltaNorm = (stateCount - cnt).toDouble, messages = stateCount,
            changed = stateCount - cnt)
          stateCount = cnt
        } else {
          // Discarded fixpoint probe — release like any superseded state.
          next.unpersist()
          graft.core.Lineage.release(next)
        }
      }
      // Survivors of this level are in the level-core: their core number
      // is at least `level` (overwrites the previous level's label).
      val survivors = state.select($"src".as("id")).distinct()
      val newLabels = ctx.cut(
        labels
          .join(survivors.select($"id", lit(true).as("inCore")), Seq("id"), "left")
          .select($"id", when($"inCore", lit(level.toLong)).otherwise($"core").as("core")))
      newLabels.count()
      // Release the superseded label frame — but only frames WE cut: the
      // initial frame's plan embeds the caller's graph.vertices lineage.
      if (level > 1) { labels.unpersist(); graft.core.Lineage.release(labels) }
      labels = newLabels
      level += 1
    }

    // Only `labels` leaves this method: drop the final edge-state blocks
    // (but never walk the INITIAL frame's plan — it embeds caller-owned
    // lineage, the IterationContext release-guard rationale).
    val lastState = state
    ctx.close(keepFinal = false)
    if (lastState ne state0) graft.core.Lineage.release(lastState)
    labels
  }
}
