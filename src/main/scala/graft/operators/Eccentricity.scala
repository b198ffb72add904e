package graft.operators

import graft.core.Graph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Eccentricities, radius and diameter — the output surface of the
  * reference's ExactSumSweep (`/root/reference/src/algo/exact_sum_sweep/`),
  * re-expressed as Dataset pipelines.
  *
  * The reference certifies exact radius/diameter with few BFS via per-SCC
  * bound DP; our exact variant batches ALL single-source BFS into one
  * source-tagged multi-source BFS (state = the distance closure, O(n·reach)
  * rows — the Spark-idiomatic exact form; the reference's own tests use
  * per-root BFS the same way, `tests/test_exact_sum_sweep.rs:314-347`).
  * For web-scale graphs the estimation path is HyperBall's neighbourhood
  * function ([[effectiveDiameter]]), exactly as in the WebGraph ecosystem.
  *
  * Semantics (reference parity):
  *  - eccF(v) = max distance to any vertex REACHABLE from v (0 if none);
  *  - diameter = max_v eccF(v);
  *  - radius = min eccF over RADIAL vertices: those that can reach the
  *    largest SCC (`computer.rs:495-544` marks them via one backward BFS
  *    from a largest-SCC vertex).
  */
object Eccentricity {

  /** Distance closure (src, id, dist): dist = d(src, id) for every
    * reachable pair. Level-synchronous multi-source BFS with the source id
    * carried through the shuffle.
    */
  def allPairsDistances(graph: Graph): DataFrame = {
    val spark = graph.spark
    import spark.implicits._
    val adj = graph.adjacency
    var visited = graph.vertices.toDF("id")
      .select($"id".as("srcV"), $"id", lit(0).as("dist"))
      .localCheckpoint(true)
    var frontier = visited
    var depth = 0
    var n = frontier.count()
    while (n > 0) {
      depth += 1
      val next = adj
        .join(frontier.select($"id".as("src"), $"srcV"), Seq("src"))
        .select($"srcV", explode($"dsts").as("id"))
        .distinct()
        .join(visited.select($"srcV", $"id"), Seq("srcV", "id"), "left_anti")
        .select($"srcV", $"id", lit(depth).as("dist"))
        .localCheckpoint(true)
      n = next.count()
      if (n > 0) {
        visited = visited.union(next).localCheckpoint(true)
        frontier = next
      }
    }
    visited.select($"srcV".as("src"), $"id", $"dist")
  }

  /** (id, ecc) forward eccentricities, exact. */
  def forwardEcc(graph: Graph): DataFrame =
    allPairsDistances(graph)
      .groupBy(col("src").as("id"))
      .agg(max(col("dist")).as("ecc"))

  final case class RadiusDiameterResult(
      radius: Int, radiusVertex: Long, diameter: Int, diameterVertex: Long)

  /** Exact radius/diameter with reference tie-breaking (smallest vertex id). */
  def radiusDiameter(graph: Graph): RadiusDiameterResult = {
    val spark = graph.spark
    import spark.implicits._
    val ecc = forwardEcc(graph).persist()
    val (diamV, diam) = ecc.orderBy($"ecc".desc, $"id".asc).limit(1).collect()
      .headOption.map(r => (r.getLong(0), r.getInt(1))).getOrElse((-1L, 0))

    // Radial set: vertices reaching the largest SCC (backward BFS from one
    // of its members over the transpose).
    val comps = Scc.run(graph).persist()
    val largest = comps.groupBy($"comp").agg(count(lit(1)).as("sz"))
      .orderBy($"sz".desc, $"comp".asc).limit(1).collect()
    val (radV, rad) =
      if (largest.isEmpty) (-1L, 0)
      else {
        val pivot = largest.head.getLong(0) // comp label = min member id
        val radial = Bfs.run(graph.transpose, Seq(pivot)).select($"id")
        val r = ecc.join(radial, Seq("id"))
          .orderBy($"ecc".asc, $"id".asc).limit(1).collect()
        r.headOption.map(x => (x.getLong(0), x.getInt(1))).getOrElse((-1L, 0))
      }
    ecc.unpersist(); comps.unpersist()
    RadiusDiameterResult(rad, radV, diam, diamV)
  }

  /** Effective diameter at fraction `alpha` from a neighbourhood function,
    * with the WebGraph-style linear interpolation between radii.
    */
  def effectiveDiameter(nf: Seq[Double], alpha: Double = 0.9): Double = {
    require(nf.nonEmpty)
    val target = alpha * nf.last
    val t = nf.indexWhere(_ >= target)
    if (t <= 0) 0.0
    else t - 1 + (target - nf(t - 1)) / (nf(t) - nf(t - 1))
  }
}
