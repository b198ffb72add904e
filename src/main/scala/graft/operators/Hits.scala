package graft.operators

import graft.core.{Graph, Lineage}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** HITS (Kleinberg's hubs & authorities) — the other classic link-graph
  * eigenvector pair next to PageRank: a page is a good AUTHORITY if good
  * hubs link to it, a good HUB if it links to good authorities.
  *
  *   a_k(v) = Σ_{u→v} h_{k-1}(u)   then L1-normalize
  *   h_k(u) = Σ_{u→v} a_k(v)       then L1-normalize
  *
  * L1 (sum-to-1) normalization instead of the textbook L2: same fixed
  * point direction, but the normalizer is a plain `sum` both engines
  * (Spark and the DuckDB oracle) evaluate identically — no sqrt whose
  * argument is an order-dependent dot product. An edgeless direction
  * normalizes to all-zeros rather than dividing by zero.
  *
  * Scale shape matches [[PageRank.run]]: per iteration, two equi-joins of
  * the persisted CSR adjacency against the (id, score) state — shuffle
  * carries only 16-byte state rows, hub successor lists are pre-chunked
  * (`AdjChunk`), partial aggregation is map-side — plus one driver scalar
  * per half-step (the L1 normalizer, the same one-action-per-superstep
  * budget as PageRank's dangling sum). Lineage is cut every iteration.
  */
object Hits {

  /** (id, hub, auth) after `iterations` full a-then-h rounds, h₀ = 1. */
  def run(graph: Graph, iterations: Int): DataFrame = {
    require(iterations >= 1, "HITS needs at least one iteration")
    val spark = graph.spark
    import spark.implicits._

    val adj = graph.adjacency
    // (src, dst) pairs from the chunked adjacency — reused each iteration.
    val arcs = adj
      .select($"src", explode($"dsts").as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val verts = graph.vertices.toDF("id")

    // Checkpoint the UNNORMALIZED gather first so the join is computed
    // exactly once; the normalizer sum and the division are then two
    // cheap scans of the checkpointed blocks (the naive order — agg
    // action, then checkpoint the lazy frame — runs the gather join
    // twice per half-step).
    def l1Normalize(scores: DataFrame, scoreCol: String): DataFrame = {
      val raw = scores.localCheckpoint(true)
      val r = raw.agg(sum(col(scoreCol))).head()
      val s = if (r.isNullAt(0)) 0.0 else r.getDouble(0)
      val normed =
        if (s > 0) raw.select($"id", (col(scoreCol) / lit(s)).as(scoreCol))
        else raw.select($"id", lit(0.0).as(scoreCol))
      val out = normed.localCheckpoint(true)
      Lineage.release(raw)
      out
    }

    var hub = verts.select($"id", lit(1.0).as("h")).localCheckpoint(true)
    var auth: DataFrame = null
    for (_ <- 1 to iterations) {
      val aRaw = arcs
        .join(hub.select($"id".as("src"), $"h"), Seq("src"))
        .groupBy($"dst".as("id"))
        .agg(sum($"h").as("a"))
      val aAll = verts
        .join(aRaw, Seq("id"), "left")
        .select($"id", coalesce($"a", lit(0.0)).as("a"))
      val aNext = l1Normalize(aAll, "a")
      if (auth != null) Lineage.release(auth)
      auth = aNext

      val hRaw = arcs
        .join(auth.select($"id".as("dst"), $"a"), Seq("dst"))
        .groupBy($"src".as("id"))
        .agg(sum($"a").as("h"))
      val hAll = verts
        .join(hRaw, Seq("id"), "left")
        .select($"id", coalesce($"h", lit(0.0)).as("h"))
      val hNext = l1Normalize(hAll, "h")
      Lineage.release(hub)
      hub = hNext
    }
    val out = hub.join(auth, Seq("id")).select($"id", $"h".as("hub"), $"a".as("auth"))
    arcs.unpersist()
    out
  }
}
