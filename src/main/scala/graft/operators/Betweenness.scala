package graft.operators

import graft.core.{Graph, Lineage}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Sampled betweenness centrality — Brandes' dependency accumulation
  * (Brandes 2001, "A faster algorithm for betweenness centrality") from a
  * fixed seed set, the standard scalable estimator (Brandes–Pich 2007)
  * for a metric whose exact form is all-pairs: bc(v) = Σ_{s ∈ seeds}
  * δ_s(v), where δ_s(v) = Σ_{t} σ_st(v)/σ_st sums over shortest paths
  * through v. Directed, unweighted, endpoints excluded (δ_s(s) is never
  * accumulated). The reference family computes distance machinery via
  * visits/SumSweep (`/root/reference/src/algo/visits`,
  * `exact_sum_sweep`); betweenness is the same BFS skeleton plus the
  * path-count DP, re-expressed as two level-synchronous Dataset loops.
  *
  * Phase 1 (forward, one BFS level per superstep over ALL seeds at
  * once): state (s, id, dist, sigma) where sigma = #shortest s→id paths
  * — level d+1 vertices are frontier-successors not yet visited for that
  * seed, their sigma the SUM of predecessor sigmas (associative, so the
  * aggregation partial-combines map-side). Path counts are exact int64;
  * they overflow only past 2^63 paths (≈ graphs with shortest-path
  * counts beyond any crawl graph's at bounded depth) and both engines
  * would overflow identically before the gate could diverge.
  *
  * Phase 2 (backward, one level per superstep, deepest first):
  *   δ_d(s,v) = Σ_{(v,w)∈E, dist_s(w)=d+1} σ_s(v)/σ_s(w) · (1 + δ(s,w))
  * — the classic accumulation, as a join of level-d vertices against
  * their level-(d+1) successors' (sigma, delta).
  *
  * Scale shape: the arc table is hash-partitioned by src once and
  * persisted; each forward superstep shuffles only (s, id, dist, sigma)
  * state (|seeds| × frontier, never arcs), each backward superstep only
  * the two level slices. The visited table grows to |seeds| × reached —
  * the estimator's documented memory bound (choose |seeds| accordingly;
  * 100 TB practice is tens-to-hundreds of seeds per pass, many passes).
  * `maxDepth` caps both phases symmetrically, giving well-defined
  * bounded-depth semantics (paths longer than maxDepth ignored) — the
  * loop normally stops at frontier-empty fixpoint well before the cap.
  */
object Betweenness {

  /** (id, bc) for EVERY vertex of `graph` (zero for vertices on no
    * counted shortest path). `seeds` are filtered to existing vertices —
    * a seed absent from the graph contributes nothing, identically on
    * the oracle side.
    */
  def run(graph: Graph, seeds: Seq[Long], maxDepth: Int = 32): DataFrame = {
    require(seeds.nonEmpty, "Betweenness needs at least one seed")
    require(maxDepth >= 1, "maxDepth must be >= 1")
    val spark = graph.spark
    import spark.implicits._

    val arcs = graph.edges.toDF()
      .repartition($"src")
      .persist(StorageLevel.MEMORY_AND_DISK)

    // ---- forward: BFS levels with path counting -----------------------
    val seedRows = seeds.distinct.toDF("id")
      .join(graph.vertices.toDF("id"), Seq("id"), "left_semi")
    var frontier = seedRows
      .select($"id".as("s"), $"id", lit(0).as("dist"), lit(1L).as("sigma"))
      .localCheckpoint(true)
    // visited accumulates every settled (s, id) with its dist and sigma;
    // persisted per level (it is joined against on every later step).
    var visited = frontier
    var depth = 0
    var frontierRows = frontier.count()
    val levels = scala.collection.mutable.ArrayBuffer[(Int, Long)]((0, frontierRows))
    while (frontierRows > 0 && depth < maxDepth) {
      depth += 1
      val next = frontier
        .join(arcs, frontier("id") === arcs("src"))
        .groupBy($"s", $"dst")
        .agg(sum($"sigma").as("sigma"))
        .join(visited.select($"s", $"id".as("dst")), Seq("s", "dst"), "left_anti")
        .select($"s", $"dst".as("id"), lit(depth).as("dist"), $"sigma")
        .localCheckpoint(true)
      frontierRows = next.count()
      if (frontierRows > 0) {
        val acc = visited.union(next).localCheckpoint(true)
        Lineage.release(visited)
        Lineage.release(frontier)
        visited = acc
        frontier = next
        levels += ((depth, frontierRows))
      } else {
        Lineage.release(frontier)
        frontier = next
      }
    }

    // ---- backward: dependency accumulation, deepest level first -------
    val maxLevel = levels.last._1
    // delta for the current level being consumed (starts empty: deepest
    // vertices have no strictly-deeper successors).
    var deltaBelow = spark.emptyDataset[(Long, Long, Double)]
      .toDF("s", "id", "delta")
      .localCheckpoint(true)
    val perLevelDeltas = scala.collection.mutable.ArrayBuffer[DataFrame]()
    for (d <- (maxLevel - 1) to 0 by -1) {
      val below = visited.where($"dist" === d + 1)
        .join(deltaBelow, Seq("s", "id"), "left")
        .select($"s", $"id".as("dst"), $"sigma".as("wSigma"),
          coalesce($"delta", lit(0.0)).as("wDelta"))
      val level = visited.where($"dist" === d)
      val delta = level
        .join(arcs, level("id") === arcs("src"))
        .join(below, Seq("s", "dst"))
        .groupBy($"s", $"id")
        .agg(sum($"sigma".cast("double") / $"wSigma" * (lit(1.0) + $"wDelta"))
          .as("delta"))
        .localCheckpoint(true)
      // every per-level delta stays alive: the final bc union reads ALL
      // of them (releasing the previous level here dropped its checkpoint
      // blocks out from under that union).
      perLevelDeltas += delta
      deltaBelow = delta
    }

    // bc(v) = Σ_s δ_s(v), v ≠ s; every graph vertex appears (0.0 default).
    val contributions =
      if (perLevelDeltas.isEmpty) spark.emptyDataset[(Long, Long, Double)].toDF("s", "id", "delta")
      else perLevelDeltas.reduce(_ union _)
    val bc = contributions
      .where($"id" =!= $"s")
      .groupBy($"id")
      .agg(sum($"delta").as("bc"))
    val out = graph.vertices.toDF("id")
      .join(bc, Seq("id"), "left")
      .select($"id", coalesce($"bc", lit(0.0)).as("bc"))
    arcs.unpersist(blocking = false)
    out
  }
}
