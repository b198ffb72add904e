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
    // Lineage is cut every level (localCheckpoint): the visited set is
    // referenced both by the anti-join and the union, so the raw plan
    // would otherwise grow exponentially with depth.
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
      val discovered = expanded
        .join(visited.select($"id"), Seq("id"), "left_anti")
        .groupBy($"id")
        .agg(min($"predCand").as("pred"))
        .select($"id", lit(depth).as("dist"), $"pred")
        .localCheckpoint(false)
      frontierSize = discovered.count()
      if (frontierSize > 0) {
        val newVisited = visited.union(discovered).localCheckpoint(true)
        // Release superseded per-level checkpoints (frontier at depth 1 IS
        // visited — double release is a harmless no-op).
        Lineage.release(frontier)
        Lineage.release(visited)
        visited = newVisited
        frontier = discovered
      } else {
        Lineage.release(discovered) // terminal empty level
      }
    }
    // the last non-empty frontier is dead once the loop exits (visited is
    // its own checkpoint); at depth-0 exit frontier IS visited — keep it
    if (frontier ne visited) Lineage.release(frontier)
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
        val newVisited = visited.union(discovered).localCheckpoint(true)
        Lineage.release(frontier)
        Lineage.release(visited)
        visited = newVisited
        frontier = discovered
      } else {
        Lineage.release(discovered) // terminal empty level
      }
    }
    if (frontier ne visited) Lineage.release(frontier)
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
        val newVisited = visited.union(discovered).localCheckpoint(true)
        Lineage.release(frontier)
        Lineage.release(visited)
        visited = newVisited
        frontier = discovered
      } else {
        Lineage.release(discovered)
      }
    }
    if (frontier ne visited) Lineage.release(frontier)
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
