package graft.operators

import graft.core.Graph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact per-vertex reachable-set sizes via the SCC condensation.
  *
  * reach(v) = Σ |C'| over SCCs C' reachable from comp(v) — vertices of
  * the same SCC share one answer, so the O(n²)-row all-pairs closure
  * collapses to a DP over the condensation DAG, computed on the driver
  * with one bitset per component (C²/8 bytes; the same place the
  * reference holds its SccGraph, `exact_sum_sweep/scc_graph.rs:25-31`).
  *
  * Scale story, stated honestly: exact transitive-closure SIZE is
  * inherently quadratic in the condensation — web graphs can have
  * C ≈ 10⁵–10⁷ components (cnr-2000: 100,977), so `maxComponents`
  * guards the driver DP (1.25 GB of bitset at 10⁵). Beyond it the
  * engine's answer is HyperBall's per-vertex ball estimate, exactly as
  * in the WebGraph ecosystem.
  */
object Reachability {

  def counts(
      graph: Graph,
      components: Option[DataFrame] = None,
      maxComponents: Int = 100000): DataFrame = {
    val spark = graph.spark
    import spark.implicits._

    val created = components.isEmpty
    val comps = components.getOrElse(Scc.run(graph))
    if (created) comps.persist()
    val sizes = comps.groupBy($"comp").agg(count(lit(1)).as("sz"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c = sizes.size
    require(c <= maxComponents,
      s"condensation has $c components (> $maxComponents): exact reach is " +
        "quadratic in the condensation — use HyperBall's estimate at this scale")

    // Condensation edges (deduped) — one shuffle, C'-bounded output.
    val condensed = graph.edges.toDF()
      .join(comps.select($"id".as("src"), $"comp".as("c1")), Seq("src"))
      .join(comps.select($"id".as("dst"), $"comp".as("c2")), Seq("dst"))
      .filter($"c1" =!= $"c2")
      .select($"c1", $"c2").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))

    val labels = sizes.keys.toArray.sorted
    val idx = labels.zipWithIndex.toMap
    val succ = Array.fill(c)(List.empty[Int])
    val indeg = new Array[Int](c)
    condensed.foreach { case (a, b) =>
      succ(idx(a)) = idx(b) :: succ(idx(a)); indeg(idx(b)) += 1
    }
    // Reverse-topological DP: descendants(c) = {c} ∪ ⋃ descendants(succ).
    val topo = new Array[Int](c)
    var head = 0
    val queue = scala.collection.mutable.Queue(labels.indices.filter(indeg(_) == 0): _*)
    while (queue.nonEmpty) {
      val u = queue.dequeue(); topo(head) = u; head += 1
      succ(u).foreach { v => indeg(v) -= 1; if (indeg(v) == 0) queue += v }
    }
    val bits = Array.fill(c)(null: java.util.BitSet)
    val reach = new Array[Long](c)
    topo.reverseIterator.foreach { u =>
      val bs = new java.util.BitSet(c)
      bs.set(u)
      succ(u).foreach(v => bs.or(bits(v)))
      bits(u) = bs
      var total = 0L
      var i = bs.nextSetBit(0)
      while (i >= 0) { total += sizes(labels(i)); i = bs.nextSetBit(i + 1) }
      reach(u) = total
    }

    val reachDf = broadcast(
      labels.indices.map(i => (labels(i), reach(i))).toDF("comp", "reach"))
    val out = comps.join(reachDf, Seq("comp")).select($"id", $"reach")
      .localCheckpoint(true) // self-contained before dropping our comps cache
    if (created) comps.unpersist()
    out
  }
}
