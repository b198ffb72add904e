package graft.operators

import graft.core.Graph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Eigenvector centrality by normalized power iteration:
  *
  *   x₀(v)   = 1
  *   yₜ₊₁(v) = Σ_{(u,v)∈E} xₜ(u)
  *   xₜ₊₁    = yₜ₊₁ / ‖yₜ₊₁‖₂
  *
  * The L2 normalization (not PageRank's stochastic scaling, not Katz's
  * additive β) makes the fixpoint the principal eigenvector of Aᵀ —
  * the "endorsed by important pages" recursion in its purest form. On
  * directed graphs vertices outside any cycle's basin decay to 0, which
  * is the textbook behavior (use Katz/PageRank when that matters).
  *
  * Scale shape — identical to [[PageRank.runFixed]]: one (id, x) state
  * shuffle per superstep against the src-partitioned chunked adjacency,
  * map-side partial sums absorb hub in-degree, ONE action per superstep
  * (the squared-norm aggregate), lineage cut every superstep.
  */
object Eigenvector {

  def runFixed(graph: Graph, iterations: Int): DataFrame = {
    val spark = graph.spark
    import spark.implicits._

    val adj = graph.adjacency
    var state = graph.outDegrees
      .select($"id", lit(1.0).as("x"))
      .localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val contribs = adj
        .join(state.select($"id".as("src"), $"x"), Seq("src"))
        .select(explode($"dsts").as("id"), $"x".as("c"))
        .groupBy($"id")
        .agg(sum($"c").as("contrib"))
      val raw = state
        .select($"id")
        .join(contribs, Seq("id"), "left")
        .select($"id", coalesce($"contrib", lit(0.0)).as("y"))
        .localCheckpoint(true)
      // one action per superstep: the squared norm
      val nrmRow = raw.agg(sum($"y" * $"y")).head()
      val nrm = if (nrmRow.isNullAt(0)) 0.0 else math.sqrt(nrmRow.getDouble(0))
      val next = raw
        .select($"id",
          (if (nrm > 0) $"y" / lit(nrm) else lit(0.0)).as("x"))
        .localCheckpoint(true)
      graft.core.Lineage.release(state)
      graft.core.Lineage.release(raw)
      state = next
    }
    state.select($"id", $"x")
  }
}
