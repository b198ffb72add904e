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
    var rounds = resumed.map(_._2).getOrElse(0)
    // (min surviving degree, edge count) in ONE action: min >= k IS the
    // fixpoint test, so no discarded probe round is ever built (the probe
    // used to cost one full semi-join pass + a throwaway checkpoint).
    var (minDeg, prevEdges) = degStats(state)
    var hitCap = false

    while (prevEdges > 0 && minDeg < k && !hitCap) {
      if (rounds >= maxRounds) hitCap = true
      else {
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
        val (md, cnt) = degStats(next) // materializes the cut state
        rounds += 1
        state = ctx.advance(rounds, next,
          deltaNorm = (prevEdges - cnt).toDouble, messages = prevEdges,
          changed = prevEdges - cnt)
        prevEdges = cnt
        minDeg = md
      }
    }

    val core = state.groupBy($"src".as("id")).agg(count(lit(1)).as("deg"))
    ctx.close()
    Result(core, rounds, converged = !hitCap, ctx.history.toSeq)
  }

  /** (min per-vertex degree, total edge rows) of a surviving (src, dst)
    * edge-state frame, in one aggregate action — (0, 0) when empty. The
    * degree aggregate reuses the state's partitioning; sum(deg) counts
    * every edge row exactly once, so this equals `state.count()` while
    * also deciding peel-fixpoint (`min >= k`) without a probe round.
    */
  private def degStats(state: DataFrame): (Long, Long) = {
    val r = state.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .agg(min(col("deg")), sum(col("deg"))).head()
    if (r.isNullAt(0)) (0L, 0L) else (r.getLong(0), r.getLong(1))
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
    // All vertices (incl. isolated / self-loop-only ones, which the
    // symmetrized simple edge table no longer carries): core number 0
    // until an edge level claims them.
    val allVertices = graph.vertices.toDF("id")
    var labels = allVertices.select($"id", lit(0L).as("core"))
    var labelsCut = false
    var iter = 0

    // One fused (minDeg, edges) aggregate drives the whole peel: when the
    // min surviving degree md >= level, levels level..md are ALL no-op
    // peels (the k-core equals the current subgraph for every k <= md),
    // so the survivors are labeled min(md, kMax) ONCE and the level jumps
    // to md + 1. The per-level probe round + per-level label rewrite this
    // replaces cost ~3 jobs x kMax even on graphs (like the dense gate
    // graph, min degree >> kMax) where no peel ever removes anything.
    var (minDeg, stateEdges) = degStats(state)
    var level = 1
    while (level <= kMax && stateEdges > 0) {
      if (minDeg >= level) {
        val eff = math.min(minDeg, kMax.toLong)
        val survivors = state.select($"src".as("id")).distinct()
        val newLabels = ctx.cut(
          labels
            .join(survivors.select($"id", lit(true).as("inCore")), Seq("id"), "left")
            .select($"id", when($"inCore", lit(eff)).otherwise($"core").as("core")))
        newLabels.count()
        // Release the superseded label frame — but only frames WE cut: the
        // initial frame's plan embeds the caller's graph.vertices lineage.
        if (labelsCut) { labels.unpersist(); graft.core.Lineage.release(labels) }
        labels = newLabels
        labelsCut = true
        level = eff.toInt + 1
      } else {
        // At least one vertex sits below `level`: one synchronous peel
        // round (guaranteed to remove edges), then re-read the stats.
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
        val (md, cnt) = degStats(next) // materializes the cut state
        iter += 1
        state = ctx.advance(iter, next,
          deltaNorm = (stateEdges - cnt).toDouble, messages = stateEdges,
          changed = stateEdges - cnt)
        stateEdges = cnt
        minDeg = md
      }
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
