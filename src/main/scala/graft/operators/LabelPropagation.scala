package graft.operators

import graft.core.{CheckpointConfig, Graph, IterationContext, SuperstepMetrics}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Synchronous label propagation (community detection) over the
  * symmetrized graph.
  *
  * Semantics (deterministic — required for oracle/golden parity):
  *  - every vertex starts with its own id as label;
  *  - each superstep, a vertex adopts the most frequent label among its
  *    neighbors' current labels (neighbor multiset, self excluded);
  *    ties broken by the SMALLEST label; isolated vertices keep theirs;
  *  - fixed iteration cap (synchronous LP can 2-cycle on bipartite
  *    structures, so the cap — not only stability — terminates).
  *
  * The reference family's LLP is referenced from the webgraph crate at
  * `/root/reference/src/algo/sccs/mod.rs:43`; this is the standard
  * synchronous variant on the same superstep skeleton as CC/PageRank.
  *
  * Scale: frequency counting is a two-level aggregation —
  * groupBy(dst,label).count is partially aggregated map-side, then the
  * per-vertex argmax is a min_by over (−count, label), also associative.
  * No unbounded per-vertex state materializes anywhere.
  */
object LabelPropagation {

  final case class Result(
      /** (id: Long, label: Long) */
      labels: DataFrame,
      iterations: Int,
      history: Seq[SuperstepMetrics]
  )

  def run(
      graph: Graph,
      maxIter: Int = 10,
      checkpoint: Option[CheckpointConfig] = None,
      verbose: Boolean = false,
      /** Opt-in bounded driver-local twin (the [[ConnectedComponents.run]]
        * cap pattern): when > 0, no checkpointing is requested, and the
        * arc count fits the budget (~16 B/arc collected), the synchronous
        * vote rounds run on driver arrays — vote counts are exact
        * integers with a total (count desc, label asc) order, so the
        * result is bit-identical to the distributed rounds (pinned by
        * `LocalTwinSpec`). Default 0 = always distributed.
        */
      localFinishEdges: Long = 0L
  ): Result = {
    val spark = graph.spark
    import spark.implicits._

    if (localFinishEdges > 0 && checkpoint.isEmpty && graph.numEdges <= localFinishEdges) {
      val g = new Mis.LocalSym(graph, "")
      var label = g.ids.clone()
      val history = scala.collection.mutable.ArrayBuffer.empty[SuperstepMetrics]
      var iter = 0
      var changed = 1L
      val cnt = new java.util.HashMap[java.lang.Long, Long]()
      while (changed > 0 && iter < maxIter) {
        iter += 1
        changed = 0L
        val next = label.clone()
        var i = 0
        while (i < g.n) {
          if (g.off(i + 1) > g.off(i)) {
            cnt.clear()
            var p = g.off(i)
            while (p < g.off(i + 1)) { cnt.merge(label(g.nbr(p)), 1L, _ + _); p += 1 }
            var bestLabel = Long.MaxValue
            var bestCnt = -1L
            val it = cnt.entrySet().iterator()
            while (it.hasNext) {
              val e = it.next()
              if (e.getValue > bestCnt ||
                  (e.getValue == bestCnt && e.getKey < bestLabel)) {
                bestCnt = e.getValue; bestLabel = e.getKey
              }
            }
            if (bestLabel != label(i)) { next(i) = bestLabel; changed += 1 }
          }
          i += 1
        }
        label = next
        history += SuperstepMetrics(iter, changed.toDouble, g.nbr.length.toLong,
          changed, 1.0, 0L)
      }
      val labels = spark.createDataFrame(
        spark.sparkContext.parallelize(
          (0 until g.n).map(i => (g.ids(i), label(i))),
          math.max(1, spark.sparkContext.defaultParallelism / 4)))
        .toDF("id", "label")
      return Result(labels, iter, history.toSeq)
    }

    val sym = graph.symmetrize
    // Exclude self-loops: a vertex should not vote for its own label.
    val adj = graft.core.Graph
      .fromEdges(sym.edges.filter($"src" =!= $"dst").toDF(), sym.chunkSize)
      .adjacency

    val ctx = new IterationContext("lp", checkpoint, verbose = verbose, suspendAdaptive = true)
    try {
      val resumed = ctx.resume(spark)
      var state = resumed.map(_._1).getOrElse {
        ctx.init(sym.vertices.toDF("id").select($"id", $"id".as("label")))
      }
      var iter = resumed.map(_._2).getOrElse(0)

      var changed = 1L
      while (changed > 0 && iter < maxIter) {
        iter += 1
        val votes = adj
          .join(state.select($"id".as("src"), $"label"), Seq("src"))
          .select(explode($"dsts").as("id"), $"label")
          .groupBy($"id", $"label")
          .agg(count(lit(1)).as("cnt"))
        // argmax by count, ties -> min label: min_by over the lexicographic
        // struct (−cnt, label) — associative, codegen-friendly, no window.
        val winner = votes
          .groupBy($"id")
          .agg(min_by($"label", struct((-$"cnt").as("negCnt"), $"label")).as("newLabel"))

        val next = state
          .join(winner, Seq("id"), "left")
          .select(
            $"id",
            coalesce($"newLabel", $"label").as("label"),
            (coalesce($"newLabel", $"label") =!= $"label").as("didChange"))
        val cutNext = ctx.cut(next)

        val row = cutNext.agg(sum(when($"didChange", 1L).otherwise(0L))).head()
        changed = if (row.isNullAt(0)) 0L else row.getLong(0)

        state = ctx.advance(iter, cutNext.select($"id", $"label"),
          deltaNorm = changed.toDouble, messages = sym.numEdges, changed = changed)
      }

      ctx.close()
      Result(state.select($"id", $"label"), iter, ctx.history.toSeq)
    } finally ctx.restoreAqe()
  }
}
