package graft.tools

import graft.core.{Graph, Sessions}
import graft.ingest.PageGen
import graft.operators._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off golden derivation for the pinned web-topology fixture
  * (`WebFixtureSpec`) — the cnr-2000 analogue of the reference's
  * real-graph regression tests (`tests/test_sccs.rs:213-226` pins
  * cnr-2000 = 325,557 nodes / 3,216,152 arcs / exactly 100,977 SCCs).
  * The reference's BV-format binaries are undecodable here, so the spec
  * instead pins invariants of the deterministic [[PageGen]] topology at
  * n=100k: every value printed by this main was cross-checked between
  * two independent computers at derivation time (distributed FB-Trim SCC
  * vs local Tarjan; distributed CC vs the SCC condensation; SumSweep's
  * certified radius/diameter vs its own adaptive bounds) and then frozen
  * as constants in the spec.
  *
  * Run: `sbt -batch "runMain graft.tools.WebGolden [n]"` — prints one
  * `GOLDEN {...}` line with the values and per-section timings.
  */
object WebGolden {

  /** Independent driver-side Kosaraju (finish-order DFS + reverse sweep)
    * — deliberately a DIFFERENT algorithm from both `Scc.tarjanMap` and
    * the distributed FB-Trim, so the pinned SCC count is confirmed by
    * two unrelated computations before freezing.
    */
  private def kosarajuSccCount(edges: Seq[(Long, Long)]): Long = {
    import scala.collection.mutable
    val adj = edges.groupBy(_._1).map { case (s, l) => s -> l.map(_._2) }
    val radj = edges.groupBy(_._2).map { case (d, l) => d -> l.map(_._1) }
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val visited = mutable.Set[Long]()
    val order = mutable.ArrayBuffer[Long]()
    for (v <- verts if !visited(v)) {
      val stack = mutable.ArrayBuffer[(Long, Iterator[Long])]((v, adj.getOrElse(v, Nil).iterator))
      visited += v
      while (stack.nonEmpty) {
        val (u, it) = stack.last
        if (it.hasNext) {
          val w = it.next()
          if (!visited(w)) { visited += w; stack += ((w, adj.getOrElse(w, Nil).iterator)) }
        } else { order += u; stack.remove(stack.length - 1); () }
      }
    }
    var count = 0L
    val seen = mutable.Set[Long]()
    for (v <- order.reverseIterator if !seen(v)) {
      count += 1
      val stack = mutable.ArrayBuffer(v); seen += v
      while (stack.nonEmpty) {
        val u = stack.remove(stack.length - 1)
        for (w <- radj.getOrElse(u, Nil) if !seen(w)) { seen += w; stack += w }
      }
    }
    count
  }

  /** Driver-side union-find CC count over the symmetrized edges. */
  private def unionFindCcCount(edges: Seq[(Long, Long)]): Long = {
    import scala.collection.mutable
    val parent = mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      parent(x) = r; r
    }
    (edges.map(_._1) ++ edges.map(_._2)).distinct.foreach(v => parent(v) = v)
    edges.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    parent.keys.map(find).toSet.size.toLong
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark: SparkSession = Sessions.tuned(SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-web-golden")
      .config("spark.sql.shuffle.partitions", cores.toString))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"GOLDEN-TIME $label ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val g = Graph.fromEdges(PageGen.edges(spark, n))
    val (nv, ne) = timed("graph")((g.numVertices, g.numEdges))
    val maxOut = g.outDegrees.agg(max($"deg")).head().getLong(0)
    val maxIn = g.inDegrees.agg(max($"deg")).head().getLong(0)

    // ---- "ext" mode: round-4 operator goldens (k-core, bow-tie) --------
    // Separate derivation pass so extending the pinned set never re-runs
    // the original sections. Each value is cross-checked before freezing:
    // k-core sizes by distributed peel AND an independent sequential
    // peel; the bow-tie core size must equal the largest-SCC golden.
    if (args.contains("ext")) {
      val localEdges = g.edges.collect().map(e => (e.src, e.dst)).toSeq
      def seqCore(k: Int): (Long, Int) = {
        import scala.collection.mutable
        val adj = mutable.Map.empty[Long, mutable.Set[Long]]
        for ((u, v) <- localEdges if u != v) {
          adj.getOrElseUpdate(u, mutable.Set.empty) += v
          adj.getOrElseUpdate(v, mutable.Set.empty) += u
        }
        var rounds = 0
        var removing = true
        while (removing) {
          val rm = adj.collect { case (x, s) if s.size < k => x }.toSeq
          if (rm.isEmpty) removing = false
          else {
            if (rm.exists(adj(_).nonEmpty)) rounds += 1
            for (x <- rm) { for (y <- adj(x)) adj(y) -= x; adj -= x }
          }
        }
        (adj.size.toLong, rounds)
      }
      val kparts = for (k <- Seq(2, 5, 10)) yield {
        val r = timed(s"kcore$k")(KCore.run(g, k))
        val sz = r.core.count()
        val (seqSz, seqRounds) = seqCore(k)
        s""""k$k":{"size":$sz,"seqSize":$seqSz,"rounds":${r.rounds},"seqRounds":$seqRounds}"""
      }
      val bt = timed("bowtie")(BowTie.sizes(g)).collect()
        .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
      val btJson = bt.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
      println(s"""GOLDEN-EXT {${kparts.mkString(",")},"bowtie":$btJson}""")
      spark.stop()
      return
    }

    val scc = timed("scc")(Scc.run(g).persist())
    val sccCount = scc.select($"comp").distinct().count()
    val largestScc = scc.groupBy($"comp").count().agg(max($"count")).head().getLong(0)
    val sccLocalCount = timed("tarjanLocal")(
      Scc.tarjanLocal(g).select($"comp").distinct().count())
    val localEdges = g.edges.collect().map(e => (e.src, e.dst)).toSeq
    val sccKosaraju = timed("kosaraju")(kosarajuSccCount(localEdges))

    val cc = timed("cc")(ConnectedComponents.run(g))
    val ccCount = cc.numComponents
    val largestCc = cc.components.groupBy($"comp").count()
      .agg(max($"count")).head().getLong(0)
    val ccUnionFind = timed("unionFind")(unionFindCcCount(localEdges))

    val tri = timed("triangles")(TriangleCount.total(g))

    val ess = timed("sumsweep")(
      SumSweep.compute(g, SumSweep.Output.RadiusDiameter, components = Some(scc)))

    val hb = timed("hyperball")(HyperBall.run(g))
    val nf = hb.neighbourhoodFunction.map(v => f"$v%.4f").mkString("[", ",", "]")

    println(
      s"""GOLDEN {"n":$n,"vertices":$nv,"arcs":$ne,"maxOutDeg":$maxOut,"maxInDeg":$maxIn,""" +
      s""""sccs":$sccCount,"sccsLocal":$sccLocalCount,"sccsKosaraju":$sccKosaraju,""" +
      s""""largestScc":$largestScc,""" +
      s""""ccs":$ccCount,"ccsUnionFind":$ccUnionFind,"largestCc":$largestCc,"triangles":$tri,""" +
      s""""radius":${ess.radius},"radiusVertex":${ess.radiusVertex},""" +
      s""""diameter":${ess.diameter},"diameterVertex":${ess.diameterVertex},""" +
      s""""essBfs":${ess.iterations},"hbIters":${hb.iterations},"nf":$nf}""")
    spark.stop()
  }
}
