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
  * Negative, null, and non-integer weights are rejected up front: a
  * negative cycle would defeat the changed-nothing stop and return
  * non-shortest labels silently, and a fractional weight would silently
  * truncate under the int64 cast; Dijkstra-style preconditions keep the
  * contract honest.
  *
  * Scale shape (the [[PageRank.runWeightedFixed]] layout): the edge
  * table is hash-partitioned by src ONCE and persisted for the loop —
  * per round only the 16-byte (id, dist) state shuffles to meet it, the
  * per-target min partial-aggregates map-side (hub in-degree never
  * concentrates raw messages), and ONE driver action per round reads the
  * changed count off the checkpointed next state. Relaxation is DELTA:
  * only the vertices whose distance improved last round send messages,
  * so total message volume is Σ changed-out-arcs across rounds — not
  * O(rounds × settled-out-arcs) — while the full-outer min-merge keeps
  * every settled label.
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

    // Validate BEFORE persisting (a rejected input must not leave cached
    // blocks behind): weights must be present, non-negative — a negative
    // cycle would defeat the fixpoint stop — and exactly representable as
    // int64, so a fractional weight fails loudly instead of silently
    // truncating shortest paths.
    require(edges
      .where($"w".isNull || $"w" < 0 ||
        $"w".cast("double") =!= $"w".cast("long").cast("double"))
      .isEmpty,
      "Sssp requires non-null, non-negative, integer-representable weights")
    val e = edges
      .select($"src", $"dst", $"w".cast("long").as("w"))
      .repartition($"src")
      .persist(StorageLevel.MEMORY_AND_DISK)

    var dist = roots
      .select(col(roots.columns.head).as("id")).distinct()
      .select($"id", lit(0L).as("dist"))
      .localCheckpoint(true)
    // Delta relaxation: only vertices whose distance improved last round
    // generate messages this round (their out-arcs are the only ones that
    // can improve anything — the min-merge against the full `dist` keeps
    // settled labels). Round 1's frontier is the roots themselves.
    var frontier = dist
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxRounds) {
      round += 1
      val relaxed = e
        .join(frontier.select($"id".as("src"), $"dist"), Seq("src"))
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
      frontier = next.where($"didChange").select($"id", $"dist")
    }
    e.unpersist(blocking = false)
    dist
  }
}
