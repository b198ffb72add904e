package graft.operators

import graft.core.{CheckpointConfig, Graph, IterationContext, SuperstepMetrics}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components by iterative min-label propagation (hash-to-min)
  * over the symmetrized graph, to fixpoint.
  *
  * Computes the same partition of vertices as the reference's symmetric
  * flood-fill (`/root/reference/src/algo/sccs/symm_seq.rs:16-49`,
  * `symm_par.rs:28-80`); our canonical component label is the minimum
  * vertex id in the component (the reference numbers components in
  * DFS-visit order — a procedural artifact; both sides normalize to
  * min-id labels for comparison, see SURVEY.md §7.3).
  *
  * Each superstep: every vertex proposes its current label to all
  * neighbors (gather over CSR adjacency), takes the min of proposals and
  * its own label. Terminates when no label changes — O(diameter) rounds;
  * web graphs have small effective diameter, so the round count stays low
  * at 100 TB just as at test scale.
  */
object ConnectedComponents {

  final case class Result(
      /** (id: Long, comp: Long) — comp = min vertex id of the component. */
      components: DataFrame,
      iterations: Int,
      numComponents: Long,
      history: Seq[SuperstepMetrics]
  )

  def run(
      graph: Graph,
      maxIter: Int = 200,
      checkpoint: Option[CheckpointConfig] = None,
      verbose: Boolean = false,
      /** Opt-in bounded driver-local finish ([[Scc.run]]'s policy): when
        * > 0 and the graph's edge count fits the budget (~16 B/edge
        * collected), labels come from one driver union-find pass instead
        * of O(diameter) supersteps — each superstep costs whole Spark
        * jobs of fixed overhead, which DOMINATES on small derived graphs
        * (the near-dup PAIR graphs of `d_embed_neardup`/`d_neardup_rep`
        * measured ~15 s of superstep overhead for a few hundred edges).
        * Default 0 = always distributed; the gate's `g_cc` row and every
        * CC spec run the distributed path. Call sites that derive a
        * bounded small graph (LSH pair graphs) opt in; the budget still
        * routes a larger-than-expected pair graph to the distributed
        * path, so the bound is a hint, not a correctness assumption.
        */
      localFinishEdges: Long = 0L
  ): Result = {
    val spark = graph.spark
    import spark.implicits._

    if (localFinishEdges > 0 && graph.numEdges <= localFinishEdges) {
      val edges = graph.edges.collect().map(e => (e.src, e.dst)).toSeq
      val labels = unionFindMin(edges)
      val comps = labels.toSeq.toDF("id", "comp")
      return Result(comps, 0, labels.values.toSet.size.toLong, Nil)
    }

    val sym = graph.symmetrize
    val adj = sym.adjacency

    val ctx = new IterationContext("cc", checkpoint, verbose = verbose)
    val resumed = ctx.resume(spark)
    var state = resumed.map(_._1).getOrElse {
      ctx.init(sym.vertices.toDF("id").select($"id", $"id".as("comp")))
    }
    var iter = resumed.map(_._2).getOrElse(0)

    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      iter += 1
      // Gather: each vertex's label flows to its out-neighbors in the
      // symmetric graph (= all neighbors). min is associative → partial
      // aggregation absorbs hub in-degree skew.
      val proposals = adj
        .join(state.select($"id".as("src"), $"comp"), Seq("src"))
        .select(explode($"dsts").as("id"), $"comp")
        .groupBy($"id")
        .agg(min($"comp").as("proposal"))

      val next = state
        .join(proposals, Seq("id"), "left")
        .select(
          $"id",
          least($"comp", coalesce($"proposal", $"comp")).as("comp"),
          ($"proposal" < $"comp").as("didChange"))
      val cutNext = ctx.cut(next)

      val row = cutNext.agg(sum(when($"didChange", 1L).otherwise(0L))).head()
      changed = if (row.isNullAt(0)) 0L else row.getLong(0)

      state = ctx.advance(iter, cutNext.select($"id", $"comp"),
        deltaNorm = changed.toDouble, messages = sym.numEdges, changed = changed)
    }

    ctx.close()
    val comps = state.select($"id", $"comp")
    Result(comps, iter, comps.select($"comp").distinct().count(), ctx.history.toSeq)
  }

  /** Driver union-find with min-id labels — identical output contract to
    * the distributed path (comp = min member id over the symmetrized
    * edges). Union-by-min keeps roots canonical so no relabel pass is
    * needed; path compression in `find` keeps it near-linear.
    */
  private[operators] def unionFindMin(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (u, v) =>
      parent.getOrElseUpdate(u, u)
      parent.getOrElseUpdate(v, v)
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    parent.keys.map(v => v -> find(v)).toMap
  }

  /** Component sizes plus size-ranked renumbering, reproducing the
    * reference's `sort_by_size` postprocessing exactly: components
    * renumbered by decreasing size, ties broken by the canonical (min-id)
    * label ascending (`/root/reference/src/algo/sccs/mod.rs:50-88`).
    *
    * Returns (id, comp, size, rank) — rank 0 = largest component.
    * The per-component table is tiny relative to vertices (num components
    * ≪ n for web graphs), so the rank join broadcasts.
    */
  def sortBySize(components: DataFrame): DataFrame = {
    val sizes = components.groupBy("comp").agg(count(lit(1)).as("size"))
    val ranked = sizes.withColumn(
      "rank",
      dense_rank().over(Window.orderBy(desc("size"), asc("comp"))) - 1)
    components.join(broadcast(ranked), Seq("comp"))
      .select(col("id"), col("comp"), col("size"), col("rank"))
  }
}
