package graft.operators

import graft.core.Graph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Eccentricities, radius and diameter — the output surface of the
  * reference's ExactSumSweep (`/root/reference/src/algo/exact_sum_sweep/`).
  *
  * Backed by the real bounded-sweep computer ([[SumSweep]]) since round 2:
  * round 1 answered these queries through an all-pairs distance closure,
  * which is O(n·reach) state — correct at gate scale, impossible on a web
  * graph with a giant SCC. The closure survives only as the ScalaTest
  * differential oracle (per-root [[graft.SeqOracles.bfs]]).
  *
  * Semantics (reference parity):
  *  - eccF(v) = max distance to any vertex REACHABLE from v (0 if none);
  *  - diameter = max_v eccF(v);
  *  - radius = min eccF over RADIAL vertices: those that can reach the
  *    largest SCC (`computer.rs:495-544` marks them via one backward BFS
  *    from a largest-SCC vertex).
  *
  * For estimation at web scale the companion path is HyperBall's
  * neighbourhood function ([[effectiveDiameter]]).
  */
object Eccentricity {

  /** (id, ecc) forward eccentricities, exact (SumSweep AllForward). */
  def forwardEcc(graph: Graph): DataFrame =
    SumSweep.compute(graph, SumSweep.Output.AllForward).ecc

  final case class RadiusDiameterResult(
      radius: Int, radiusVertex: Long, diameter: Int, diameterVertex: Long)

  /** Exact radius/diameter with canonical tie-breaking (smallest vertex
    * id among the extremal vertices). Runs SumSweep at AllForward level
    * so the extremal VERTEX choice is deterministic — the early-stopping
    * RadiusDiameter level certifies the values but reports whichever
    * witness vertex closed first.
    */
  def radiusDiameter(graph: Graph): RadiusDiameterResult = {
    val r = SumSweep.compute(graph, SumSweep.Output.AllForward)
    fromEcc(r.ecc, r.radial)
  }

  /** Derive canonical radius/diameter from a full (id, ecc) set + radial
    * set (shared by callers that already hold the SumSweep result).
    */
  def fromEcc(ecc: DataFrame, radial: DataFrame): RadiusDiameterResult = {
    val spark = ecc.sparkSession
    import spark.implicits._
    // Only own the cache if the caller hasn't already persisted it —
    // essShared hands in a deliberately long-lived MEMORY_AND_DISK frame
    // shared across gate queries; evicting it here would force recompute.
    val cachedHere = ecc.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    val e = if (cachedHere) ecc.persist() else ecc
    val (diamV, diam) = e.orderBy($"ecc".desc, $"id".asc).limit(1).collect()
      .headOption.map(r => (r.getLong(0), r.getInt(1))).getOrElse((-1L, 0))
    val rad = e.join(radial.select($"id"), Seq("id"))
      .orderBy($"ecc".asc, $"id".asc).limit(1).collect()
    val (radV, radE) = rad.headOption.map(x => (x.getLong(0), x.getInt(1))).getOrElse((-1L, 0))
    if (cachedHere) e.unpersist()
    RadiusDiameterResult(radE, radV, diam, diamV)
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

  /** Mean distance and spid (shortest-paths index of dispersion,
    * variance/mean of the distance distribution — WebGraph's
    * web-vs-social discriminator: spid > 1 ⇒ web-like) from a
    * neighbourhood function. The distribution's mass at radius t is the
    * NF increment Δ(t) (Δ(0) = NF(0), the distance-0 self-pairs).
    */
  def distanceStats(nf: Seq[Double]): (Double, Double) = {
    require(nf.nonEmpty)
    val total = nf.last
    if (total <= 0) return (0.0, 0.0)
    var m1 = 0.0
    var m2 = 0.0
    for (t <- 1 until nf.length) {
      val d = nf(t) - nf(t - 1)
      m1 += t * d
      m2 += t.toDouble * t * d
    }
    val mean = m1 / total
    val spid = if (mean > 0) (m2 / total - mean * mean) / mean else 0.0
    (mean, spid)
  }
}
