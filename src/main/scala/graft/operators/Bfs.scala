package graft.operators

import graft.core.{Graph, Lineage}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Level-synchronous parallel breadth-first visit.
  *
  * The Spark dataflow equivalent of the reference's BFS family
  * (`/root/reference/src/algo/visits/breadth_first/seq.rs:89-225`,
  * `par_fair.rs:92-330`, `par_low_mem.rs:77-215`): the frontier is a
  * Dataset; one superstep = frontier ⋈ adjacency → explode successors →
  * anti-join the visited set → new frontier at distance t+1. The atomic
  * visited-bitvec dedup of the reference becomes a shuffle dedup
  * (`groupBy(node).min(pred)`), and its "fair" work chunking is Spark's
  * partitioning + AQE. Supports multiple roots (multi-source BFS), like
  * the reference's `visit_filtered_with(roots, …)`.
  *
  * Predecessors are tracked as min-id parent (deterministic; the
  * reference's parallel BFS has a race-dependent pred — ours is the
  * canonical choice, tests assert distances + pred validity).
  */
object Bfs {

  /** (id, dist, pred) for every vertex REACHED from `roots`; unreached
    * vertices are absent. Roots have dist 0 and pred = themselves.
    *
    * `allowed`: optional (id) membership Dataset — the visit expands only
    * into listed vertices, the Dataset form of the reference's filtered
    * visits (`breadth_first/mod.rs:68-76` FilterArgsPred; used there to
    * confine a BFS to one SCC, `computer.rs:780-793`). Catalyst pushes
    * the semi-join below the gather. `maxDepth` is the early-termination
    * analogue of `ControlFlow::Break` (`visits/mod.rs:110-135`).
    */
  def run(graph: Graph, roots: Seq[Long], maxDepth: Int = Int.MaxValue,
          allowed: Option[DataFrame] = None): DataFrame = {
    val spark = graph.spark
    import spark.implicits._
    runFrom(graph, roots.distinct.sorted.toDF("id"), maxDepth, allowed)
  }

  /** [[run]] with the root set as a DataFrame (an `id` column): the seed
    * set stays distributed, so callers seeding one root PER COMPONENT of
    * a 10⁸-component crawl (e.g. [[Reorder.bfsOrder]]) never collect it
    * on the driver. Semantics identical to [[run]].
    */
  def runFrom(graph: Graph, roots: DataFrame, maxDepth: Int = Int.MaxValue,
              allowed: Option[DataFrame] = None): DataFrame = {
    val spark = graph.spark
    import spark.implicits._

    val adj = graph.adjacency
    // Per-level lineage cut (localCheckpoint) on the DISCOVERED set only;
    // the visited set is a LAZY union over those checkpointed leaves — a
    // linear-size plan of cached scans, so the eager re-copy of the whole
    // visited set every level (one extra Spark job + one full state write
    // per level) is gone, and each level runs exactly ONE job (the
    // frontier count that materializes `discovered`).
    // `allowed` gates the ROOTS too, not just expansion: the reference's
    // filtered visit applies its predicate to every visited node
    // including the seeds — an out-of-set root must produce nothing.
    var roots0 = roots.select($"id").distinct()
    allowed.foreach(a => roots0 = roots0.join(a.select($"id"), Seq("id"), "left_semi"))
    var visited = roots0
      .select($"id", lit(0).as("dist"), $"id".as("pred"))
      .localCheckpoint(true)
    var frontier = visited
    var depth = 0
    var frontierSize = frontier.count()

    while (frontierSize > 0 && depth < maxDepth) {
      depth += 1
      var expanded = adj
        .join(frontier.select($"id".as("src"), $"pred"), Seq("src"))
        .select(explode($"dsts").as("id"), $"src".as("predCand"))
      allowed.foreach(a => expanded = expanded.join(a.select($"id"), Seq("id"), "left_semi"))
      // min(pred) BEFORE the visited anti-join (guide §2.3: aggregate
      // before you shuffle): the partial aggregation collapses the
      // |frontier-edges| exploded rows map-side, so the exchange carries
      // at most one row per distinct target; the anti-join then runs on
      // the same id partitioning with no further exchange. Filtering by
      // id commutes with aggregating pred over id, so results are
      // unchanged.
      val discovered = expanded
        .groupBy($"id")
        .agg(min($"predCand").as("pred"))
        .join(visited.select($"id"), Seq("id"), "left_anti")
        .select($"id", lit(depth).as("dist"), $"pred")
        .localCheckpoint(false)
      frontierSize = discovered.count()
      if (frontierSize > 0) {
        // Lazy union: `discovered` and every earlier level stay alive as
        // the union's leaves (total cached rows = |visited| — the same
        // bytes the eager copy held, without re-writing them each level).
        visited = visited.union(discovered)
        frontier = discovered
      } else {
        Lineage.release(discovered) // terminal empty level
      }
    }
    visited
  }

  /** Source-tagged multi-source BFS: one level-synchronous pipeline runs
    * MANY independent BFS at once (the Spark way to amortize driver-loop
    * latency across the reference's one-BFS-per-sweep structure,
    * `/root/reference/src/algo/exact_sum_sweep/computer.rs:558-714`).
    *
    * `sources`: (tag, id) seed rows — each tag is an independent visit.
    * `confine`: optional (tag, id) membership — a visit expands only into
    * vertices listed under its tag (the reference's filtered visit, used
    * for SCC-confined pivot BFS, `computer.rs:780-793`; Catalyst pushes
    * the semi-join below the gather).
    *
    * Returns (tag, id, dist) for every reached pair.
    */
  def tagged(
      adj: org.apache.spark.sql.Dataset[graft.core.AdjChunk],
      sources: DataFrame,
      confine: Option[DataFrame] = None): DataFrame = {
    val spark = adj.sparkSession
    import spark.implicits._
    // confine gates the SEEDS too (filtered-visit parity with [[run]]).
    var sources0 = sources
    confine.foreach(c => sources0 = sources0.join(c, Seq("tag", "id"), "left_semi"))
    var visited = sources0.select($"tag", $"id", lit(0).as("dist")).localCheckpoint(true)
    var frontier = visited
    var depth = 0
    var n = frontier.count()
    while (n > 0) {
      depth += 1
      // distinct (a map-side-combined aggregate) runs BEFORE the visited
      // anti-join, which then reuses the same (tag, id) partitioning; the
      // visited set is a lazy union over the per-level checkpoints, so
      // each level is ONE job — see [[runFrom]].
      var next = adj
        .join(frontier.select($"id".as("src"), $"tag"), Seq("src"))
        .select($"tag", explode($"dsts").as("id"))
        .distinct()
      confine.foreach(c => next = next.join(c, Seq("tag", "id"), "left_semi"))
      val discovered = next
        .join(visited.select($"tag", $"id"), Seq("tag", "id"), "left_anti")
        .select($"tag", $"id", lit(depth).as("dist"))
        .localCheckpoint(false)
      n = discovered.count()
      if (n > 0) {
        visited = visited.union(discovered)
        frontier = discovered
      } else {
        Lineage.release(discovered) // terminal empty level
      }
    }
    visited
  }

  /** Forward-closure membership: every vertex reachable from `seeds`
    * (a DataFrame with an `id` column — seeds stay distributed, so a
    * seed set proportional to the graph, e.g. a giant SCC, never lands
    * on the driver). Returns a single-column (id) frame INCLUDING the
    * seeds. Distances/preds are not tracked — the reachable-SET form of
    * [[run]] used by region decompositions ([[BowTie]]), where only
    * membership matters and dropping the per-level metadata keeps the
    * anti-join state one long per vertex.
    *
    * `allowed` confines expansion (and the seeds, like [[run]]) to a
    * vertex subset: closures over a residual region (e.g. "reachable
    * from IN without entering the core's forward set") stay linear in
    * the REGION, not the graph.
    */
  def closure(adj: org.apache.spark.sql.Dataset[graft.core.AdjChunk],
              seeds: DataFrame,
              allowed: Option[DataFrame] = None): DataFrame = {
    val spark = adj.sparkSession
    import spark.implicits._
    var seeds0 = seeds.select($"id").distinct()
    allowed.foreach(a => seeds0 = seeds0.join(a.select($"id"), Seq("id"), "left_semi"))
    var visited = seeds0.localCheckpoint(true)
    var frontier = visited
    var n = frontier.count()
    while (n > 0) {
      // Lazy visited union + one job per level — see [[runFrom]].
      var next = adj
        .join(frontier.select($"id".as("src")), Seq("src"))
        .select(explode($"dsts").as("id"))
        .distinct()
      allowed.foreach(a => next = next.join(a.select($"id"), Seq("id"), "left_semi"))
      val discovered = next
        .join(visited, Seq("id"), "left_anti")
        .localCheckpoint(false)
      n = discovered.count()
      if (n > 0) {
        visited = visited.union(discovered)
        frontier = discovered
      } else {
        Lineage.release(discovered)
      }
    }
    visited
  }

  /** Distances only (drops pred). */
  def distances(graph: Graph, roots: Seq[Long]): DataFrame =
    run(graph, roots).select(col("id"), col("dist"))

  /** Eccentricity of one vertex = max BFS distance over reached set. */
  def eccentricity(graph: Graph, root: Long): Int = {
    val r = run(graph, Seq(root)).agg(max(col("dist"))).head()
    if (r.isNullAt(0)) 0 else r.getInt(0)
  }
}
