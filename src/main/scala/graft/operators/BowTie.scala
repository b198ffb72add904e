package graft.operators

import graft.core.Graph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bow-tie decomposition of a directed graph (Broder et al., "Graph
  * structure in the Web", WWW 2000): classify every vertex relative to
  * the largest SCC (the CORE) into the classic web-macrostructure
  * regions. This is THE link-graph census query — the first analysis run
  * on any new web crawl — composed entirely from operators the engine
  * already has (SCC, weak components, multi-source closures), so the
  * whole decomposition costs one SCC run plus four membership BFS
  * closures, each linear in its region.
  *
  * Regions (per vertex):
  *   - `core`          — member of the largest SCC (ties: most members,
  *                       then smallest component label).
  *   - `in`            — reaches the core, not in it.
  *   - `out`           — reachable from the core, not in it.
  *   - `tube`          — on an IN→OUT path that bypasses the core.
  *   - `tendril_in`    — reachable from IN but reaching neither the core
  *                       nor OUT.
  *   - `tendril_out`   — reaches OUT but neither in the core's forward
  *                       set nor reachable from IN.
  *   - `tendril_other` — in the core's weak component but attached only
  *                       against the edge direction (e.g. a vertex whose
  *                       out-edges point INTO a tendril). Broder et al.
  *                       lump these into TENDRILS; kept distinct here so
  *                       the four tendril-ish flavors are auditable.
  *   - `disconnected`  — outside the core's weak component.
  *
  * Scale shape: the two core closures (forward/backward over the
  * persisted CSR adjacency and its transpose) shuffle only (id) state
  * per level; the two tendril closures are CONFINED to the complement of
  * the core's forward/backward sets (any IN→v path that entered the
  * forward-closed set could never leave it, so confinement is exact) —
  * at web scale where CORE∪IN∪OUT is ~75% of vertices (Broder's
  * measurement), the tendril sweeps touch only the remaining quarter.
  * The final classification is one union + one groupBy(id) bitmask — a
  * single shuffle, not six joins.
  */
object BowTie {

  /** Per-vertex (id, region). `scc`/`wcc`: pre-computed (id, comp)
    * labelings to share with sibling queries (labels must be the min
    * member id, as [[Scc.run]] and [[ConnectedComponents.run]] produce);
    * computed here when absent.
    */
  def run(
      graph: Graph,
      scc: Option[DataFrame] = None,
      wcc: Option[DataFrame] = None): DataFrame = {
    val spark = graph.spark
    import spark.implicits._

    val nodes = graph.vertices.toDF("id")
    val sccDf = scc.getOrElse(Scc.run(graph))

    // Largest SCC (count desc, comp asc) — a limit(1) pick, driver-safe.
    val top = sccDf
      .groupBy($"comp")
      .agg(count(lit(1)).as("c"))
      .orderBy($"c".desc, $"comp".asc)
      .limit(1)
      .select($"comp")
    if (top.isEmpty) return nodes.select($"id", lit("disconnected").as("region"))
    val core = sccDf.join(broadcast(top), Seq("comp")).select($"id")

    // Forward/backward closures of the core. IN∩fwd = OUT∩bwd = ∅ (a
    // vertex both reaching and reached by the core IS core).
    val fwd = Bfs.closure(graph.adjacency, core)
    val bwd = Bfs.closure(graph.transposeAdjacency, core)
    val inn = bwd.join(core, Seq("id"), "left_anti")
    val outt = fwd.join(core, Seq("id"), "left_anti")

    // Tendril closures, confined to the complement of the core's
    // forward (resp. backward) set: fwd is forward-closed, so a path
    // from IN that entered it could never reach a vertex outside it —
    // confinement drops no member and keeps the sweep region-linear.
    val notFwd = nodes.join(fwd, Seq("id"), "left_anti")
    val notBwd = nodes.join(bwd, Seq("id"), "left_anti")
    val fwdIn = Bfs.closure(graph.adjacency, inn, allowed = Some(notFwd))
    val bwdOut = Bfs.closure(graph.transposeAdjacency, outt, allowed = Some(notBwd))

    // The core's weak component (all core members share one comp; min
    // is a deterministic 1-row scalar).
    val wccDf = wcc.getOrElse(ConnectedComponents.run(graph).components)
    val mainComp = wccDf
      .join(core, Seq("id"), "left_semi")
      .agg(min($"comp"))
      .head()
      .getLong(0)
    val mainWcc = wccDf.filter($"comp" === mainComp).select($"id")

    // One groupBy(id) over the tagged union = the whole classification
    // in a single shuffle (memberships are disjoint-bit, sum == OR).
    val tagged = core.select($"id", lit(1L).as("b"))
      .union(inn.select($"id", lit(2L).as("b")))
      .union(outt.select($"id", lit(4L).as("b")))
      .union(fwdIn.select($"id", lit(8L).as("b")))
      .union(bwdOut.select($"id", lit(16L).as("b")))
      .union(mainWcc.select($"id", lit(32L).as("b")))
    val mask = tagged.groupBy($"id").agg(sum($"b").as("m"))

    val m = coalesce($"m", lit(0L))
    nodes
      .join(mask, Seq("id"), "left")
      .select(
        $"id",
        when((m.bitwiseAND(1L)) > 0, "core")
          .when((m.bitwiseAND(2L)) > 0, "in")
          .when((m.bitwiseAND(4L)) > 0, "out")
          .when((m.bitwiseAND(32L)) === 0, "disconnected")
          .when((m.bitwiseAND(8L)) > 0 && (m.bitwiseAND(16L)) > 0, "tube")
          .when((m.bitwiseAND(8L)) > 0, "tendril_in")
          .when((m.bitwiseAND(16L)) > 0, "tendril_out")
          .otherwise("tendril_other")
          .as("region"))
  }

  /** Region census: (region, size) — the headline numbers of the Broder
    * analysis (the famous 28/21/21/22/8% split).
    */
  def sizes(
      graph: Graph,
      scc: Option[DataFrame] = None,
      wcc: Option[DataFrame] = None): DataFrame =
    run(graph, scc, wcc)
      .groupBy(col("region"))
      .agg(count(lit(1)).as("size"))
}
