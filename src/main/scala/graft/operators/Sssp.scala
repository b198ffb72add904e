package graft.operators

import graft.core.Lineage
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Single-source (or multi-source) shortest paths over a WEIGHTED edge
  * table — synchronous Bellman–Ford relaxation, the weighted sibling of
  * [[Bfs]] (which is SSSP with unit weights): per round, every vertex's
  * tentative distance relaxes through all in-arcs,
  *
  *   dₖ(v) = min( dₖ₋₁(v), min_{(u,v,w)∈E} dₖ₋₁(u) + w )
  *
  * stopping at the first round that changes nothing (a fixpoint: further
  * rounds are identities, so stopping early equals running any larger
  * round count — the DuckDB oracle can unroll a fixed K and match
  * exactly) or at `maxRounds`. After k rounds dₖ(v) is exactly the
  * weight of the lightest ≤ k-arc path, so a `maxRounds` cutoff is a
  * well-defined bounded-hop semantics, not an approximation artifact.
  * Unreached vertices are absent (no ∞ sentinel materializes).
  *
  * Negative weights are rejected: with a changed-nothing stop a negative
  * cycle would loop until `maxRounds` and return non-shortest labels
  * silently; Dijkstra-style preconditions keep the contract honest.
  *
  * Scale shape (the [[PageRank.runWeightedFixed]] layout): the edge
  * table is hash-partitioned by src ONCE and persisted for the loop —
  * per round only the 16-byte (id, dist) state shuffles to meet it, the
  * per-target min partial-aggregates map-side (hub in-degree never
  * concentrates raw messages), and ONE driver action per round reads the
  * changed count off the checkpointed next state. Rows per message batch
  * are bounded by the frontier's out-arc count, not |E|: vertices whose
  * distance is still ∞ have no state row and generate no messages.
  */
object Sssp {

  /** (id, dist) for every vertex reachable from `roots` (dist 0 at each
    * root). `edges` rows are (src, dst, w) with w a non-negative numeric
    * column; vertex ids may be any equality-comparable type.
    */
  def run(edges: DataFrame, roots: DataFrame, maxRounds: Int = 64): DataFrame = {
    require(maxRounds >= 1, "maxRounds must be >= 1")
    val spark = edges.sparkSession
    import spark.implicits._

    val e = edges
      .select($"src", $"dst", $"w".cast("long").as("w"))
      .repartition($"src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    require(e.where($"w" < 0).isEmpty,
      "Sssp requires non-negative weights (negative cycles would defeat the fixpoint stop)")

    var dist = roots
      .select(col(roots.columns.head).as("id")).distinct()
      .select($"id", lit(0L).as("dist"))
      .localCheckpoint(true)
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxRounds) {
      round += 1
      val relaxed = e
        .join(dist.select($"id".as("src"), $"dist"), Seq("src"))
        .select($"dst".as("id"), ($"dist" + $"w").as("cand"))
        .groupBy($"id")
        .agg(min($"cand").as("cand"))
      val next = dist
        .join(relaxed, Seq("id"), "full")
        .select(
          $"id",
          least(coalesce($"dist", $"cand"), coalesce($"cand", $"dist")).as("dist"),
          ($"dist".isNull || ($"cand".isNotNull && $"cand" < $"dist")).as("didChange"))
        .localCheckpoint(true)
      val row = next.agg(sum(when($"didChange", 1L).otherwise(0L))).head()
      changed = if (row.isNullAt(0)) 0L else row.getLong(0)
      Lineage.release(dist)
      dist = next.select($"id", $"dist")
    }
    e.unpersist(blocking = false)
    dist
  }
}
