package graft.operators

import graft.core.{Graph, Lineage}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Locality-preserving vertex renumbering.
  *
  * The compression side of the reference's world: BVGraph's γ-coded
  * successor gaps (`/root/reference/tests/graphs/cnr-2000.properties`
  * records 2.897 bits/link) only stay small when neighbors get nearby
  * ids, and the standard cheap ordering that achieves this on web graphs
  * is a breadth-first traversal order (the "BFS ordering" evaluated in
  * the WebGraph compression literature as the baseline locality order —
  * crawl order ≈ BFS order is WHY raw crawls compress at all). This
  * operator produces that renumbering as a Dataset pipeline; the
  * `g_gap_bits` γ-cost histogram is its measurement twin, and
  * `GraphQueries.bfsOrderGain` reports total γ bits before/after — the
  * read-before-you-pay signal for reordering 10¹² edges.
  *
  * Ordering definition (total, deterministic): vertices sort by
  * (component min-id, undirected BFS level from that component's min-id
  * vertex, vertex id). Every vertex is reached: levels come from a
  * multi-root BFS on the SYMMETRIZED graph seeded with one root per
  * component (the component's min member — exactly the label
  * [[ConnectedComponents.run]] converges to).
  *
  * Scale shape: the rank assignment is TWO-LEVEL, never a global
  * single-partition window over the vertex table — (1) rank within each
  * (comp, level) layer via a window PARTITIONED by layer (distributed;
  * a layer streams through one partition), (2) layer start offsets via a
  * running sum over the layer-size table (|layers| ≤ |V|, in practice
  * orders of magnitude smaller — components × small diameter). The
  * offsets join is an equi-join on (comp, level) that AQE broadcasts
  * when small. Roots are seeded as a DataFrame ([[Bfs.runFrom]]), so a
  * 10⁸-component crawl never collects its root set on the driver.
  */
object Reorder {

  /** (id, new_id) — a bijection onto 0..|V|-1 in (comp, BFS level, id)
    * order. `sym` is the SYMMETRIZED graph (callers that already hold a
    * memoized symmetric adjacency pass it instead of paying
    * `symmetrize` again); `comps` is the (id, comp = min member id)
    * output of [[ConnectedComponents.run]] for the same graph.
    */
  def bfsOrder(sym: Graph, comps: DataFrame): DataFrame = {
    val spark = sym.spark
    import spark.implicits._

    val roots = comps.where($"id" === $"comp").select($"id")
    val lev = Bfs.runFrom(sym, roots).select($"id", $"dist")
    val keyed = comps.select($"id", $"comp")
      .join(lev, Seq("id"))
      .localCheckpoint(true)
    Lineage.release(lev)

    val out = rankPlan(keyed).localCheckpoint(true)
    Lineage.release(keyed)
    out
  }

  /** The (lazy) two-level rank plan over (id, comp, dist) rows, separated
    * so `PlanSpec` can pin its shape: the vertex-table window must stay
    * layer-partitioned; only the layer-size table may cross a
    * single-partition stage.
    */
  private[graft] def rankPlan(keyed: DataFrame): DataFrame = {
    val spark = keyed.sparkSession
    import spark.implicits._

    val inLayer = row_number().over(
      Window.partitionBy($"comp", $"dist").orderBy($"id")) - 1
    val layerSizes = keyed.groupBy($"comp", $"dist").agg(count(lit(1)).as("sz"))
    // Running sum over the LAYER table only (see scaladoc): strictly
    // preceding layers in (comp, dist) order.
    val off = coalesce(
      sum($"sz").over(Window.orderBy($"comp", $"dist")
        .rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L))
    val offsets = layerSizes.select($"comp", $"dist", off.as("off"))

    keyed
      .withColumn("lrank", inLayer)
      .join(offsets, Seq("comp", "dist"))
      .select($"id", ($"off" + $"lrank").as("new_id"))
  }
}
