package graft.operators

import graft.{Fixtures, SeqOracles, TestSpark}
import graft.core.Graph
import org.scalatest.funsuite.AnyFunSuite

class EccentricitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def eccMap(edges: Seq[(Long, Long)]): Map[Long, Int] =
    Eccentricity.forwardEcc(Graph.fromPairs(spark, edges))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("path3-cyclic: ecc fwd [2,1,2], diameter 2, radius 1 at vertex 1 (test_exact_sum_sweep.rs:24-50)") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 1L), (1L, 0L))
    assert(eccMap(edges) == Map(0L -> 2, 1L -> 1, 2L -> 2))
    val rd = Eccentricity.radiusDiameter(Graph.fromPairs(spark, edges))
    assert(rd.diameter == 2 && rd.radius == 1 && rd.radiusVertex == 1L)
  }

  test("cycle4: diameter = radius = 3 (test_exact_sum_sweep.rs:149-177)") {
    val rd = Eccentricity.radiusDiameter(Graph.fromPairs(spark, Fixtures.cycle4))
    assert(rd.diameter == 3 && rd.radius == 3)
  }

  test("clique5: all ecc = 1 (test_exact_sum_sweep.rs:180-221)") {
    assert(eccMap(Fixtures.clique5).values.toSet == Set(1))
  }

  test("lozenge: radius 2 (test_exact_sum_sweep.rs:85-104)") {
    val rd = Eccentricity.radiusDiameter(Graph.fromPairs(spark, Fixtures.lozenge))
    assert(rd.radius == 2)
  }

  test("star9 undirected: ecc [2,3,4,3,4,3,4,3,4] (test_undir_sum_sweep.rs:40-81)") {
    // hub 0 <-> 1,3,5,7; spoke i <-> leaf i+1
    val base = Seq((0L, 1L), (0L, 3L), (0L, 5L), (0L, 7L),
      (1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L))
    val g = Graph.fromPairs(spark, base).symmetrize
    val ecc = Eccentricity.forwardEcc(g).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(ecc == Map(0L -> 2, 1L -> 3, 2L -> 4, 3L -> 3, 4L -> 4,
      5L -> 3, 6L -> 4, 7L -> 3, 8L -> 4))
  }

  test("sparse ids: radius 1 at vertex 10 (test_exact_sum_sweep.rs:242-250)") {
    val edges = Seq((10L, 32L), (10L, 65L), (65L, 10L), (21L, 44L))
    val rd = Eccentricity.radiusDiameter(Graph.fromPairs(spark, edges))
    assert(rd.radius == 1 && rd.radiusVertex == 10L)
  }

  test("ER differential: ecc matches per-root BFS oracle (test_exact_sum_sweep.rs:314-347)") {
    val edges = Fixtures.erdosRenyi(40, 0.06, 2)
    val got = eccMap(edges)
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct
    verts.foreach { v =>
      val dists = SeqOracles.bfs(edges, Seq(v))
      assert(got(v) == dists.values.max, s"vertex $v")
    }
  }

  test("fuzz differential: ecc == per-root BFS across topologies (incl. disconnected)") {
    val graphs = Seq(
      Fixtures.erdosRenyi(35, 0.04, 11), // sparse, fragmentary SCCs
      Fixtures.erdosRenyi(30, 0.10, 12), // denser, near-flat ecc
      Fixtures.erdosRenyi(20, 0.08, 13) ++ // two disjoint components
        Fixtures.erdosRenyi(20, 0.08, 14).map { case (a, b) => (a + 100L, b + 100L) })
    graphs.zipWithIndex.foreach { case (edges, i) =>
      val got = eccMap(edges)
      (edges.map(_._1) ++ edges.map(_._2)).distinct.foreach { v =>
        assert(got(v) == SeqOracles.bfs(edges, Seq(v)).values.max, s"graph $i vertex $v")
      }
    }
  }

  test("SumSweep certifies radius+diameter in FAR fewer BFS than 2n (bounded sweeps)") {
    // The reference's headline property (Borassi et al.): radius/diameter
    // certified with tens of BFS where the textbook needs n fwd + n bwd.
    // batch=1 = the reference's exact per-sweep granularity. (AllForward
    // on a FLAT-eccentricity random graph degenerates to ~1 BFS/vertex in
    // the reference too — that regime is covered by the differential
    // tests above, not a sweep-count bound.)
    val edges = Fixtures.erdosRenyi(120, 0.04, 5)
    val n = (edges.map(_._1) ++ edges.map(_._2)).distinct.size
    val r = SumSweep.compute(Graph.fromPairs(spark, edges), SumSweep.Output.RadiusDiameter, batch = 1)
    assert(r.iterations < n / 2, s"${r.iterations} BFS for $n vertices (textbook: ${2 * n})")
    val allEcc = (edges.map(_._1) ++ edges.map(_._2)).distinct
      .map(v => v -> SeqOracles.bfs(edges, Seq(v)).values.max).toMap
    assert(r.diameter == allEcc.values.max)
    // radius = min ecc over RADIAL vertices (those reaching the largest SCC)
    val comp = Scc.tarjanMap(edges)
    val largest = comp.groupBy(_._2).maxBy { case (c, m) => (m.size, -c) }._2.keySet
    val radial = allEcc.keys.filter(v => SeqOracles.bfs(edges, Seq(v)).keySet.exists(largest))
    assert(r.radius == radial.map(allEcc).min)
  }

  test("multi-SCC chain exercises the condensation-DAG upper-bound step") {
    // two 4-cycles bridged by a directed path: distinct SCCs, deep DAG
    val c1 = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    val c2 = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L))
    val bridge = Seq((2L, 20L), (20L, 21L), (21L, 10L))
    val edges = c1 ++ c2 ++ bridge
    val got = eccMap(edges)
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct
    verts.foreach { v =>
      assert(got(v) == SeqOracles.bfs(edges, Seq(v)).values.max, s"vertex $v")
    }
    val rd = Eccentricity.radiusDiameter(Graph.fromPairs(spark, edges))
    // radial set = vertices reaching the largest SCC (c1, label 0)
    assert(rd.radius == verts.filter(v => SeqOracles.bfs(edges, Seq(v)).contains(0L))
      .map(v => SeqOracles.bfs(edges, Seq(v)).values.max).min)
    assert(rd.diameter == got.values.max)
  }

  test("ORDINAL component labels (not min-member ids) are normalized at intake") {
    import spark.implicits._
    // tarjanLocal-style labeling: SCC ordinals 0..k-1 — NOT vertex ids.
    // The radial derivation seeds a BFS at the largest-SCC label; an
    // ordinal would silently seed an unrelated vertex.
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (3L, 40L), (40L, 41L))
    val t = Scc.tarjanMap(edges)
    val ord = t.values.toSeq.distinct.sorted.zipWithIndex.toMap
    val ordinal = t.toSeq.map { case (v, c) => (v, ord(c).toLong) }.toDF("id", "comp")
    val g = Graph.fromPairs(spark, edges)
    val r = SumSweep.compute(g, SumSweep.Output.All, components = Some(ordinal))
    val allEcc = (edges.map(_._1) ++ edges.map(_._2)).distinct
      .map(v => v -> SeqOracles.bfs(edges, Seq(v)).values.max).toMap
    assert(r.diameter == allEcc.values.max)
    r.ecc.collect().foreach(row =>
      assert(row.getInt(1) == allEcc(row.getLong(0)), s"vertex ${row.getLong(0)}"))
  }

  test("Reachability via condensation matches the closure oracle") {
    for (edges <- Seq(Fixtures.bucket9, Fixtures.lozenge, Fixtures.erdosRenyi(50, 0.03, 9))) {
      val got = Reachability.counts(Graph.fromPairs(spark, edges))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct
      verts.foreach { v =>
        assert(got(v) == SeqOracles.bfs(edges, Seq(v)).size, s"vertex $v")
      }
    }
  }

  test("explicit EMPTY radial set: radius stays unknown (usize::MAX analogue; test_exact_sum_sweep.rs:253-281)") {
    import spark.implicits._
    val empty = Seq.empty[Long].toDF("id")
    val r = SumSweep.compute(Graph.fromPairs(spark, Fixtures.lozenge),
      SumSweep.Output.RadiusDiameter, radialVertices = Some(empty))
    assert(r.radius == Int.MaxValue && r.radiusVertex == -1L)
    assert(r.diameter == 2) // lozenge: max ecc (0/1 reach everything in ≤2)
  }

  test("scalar output levels certify exactly their scalar (Radius / Diameter)") {
    val edges = Fixtures.erdosRenyi(60, 0.05, 3)
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val allEcc = verts.map(v => v -> SeqOracles.bfs(edges, Seq(v)).values.max).toMap
    val comp = Scc.tarjanMap(edges)
    val largest = comp.groupBy(_._2).maxBy(_._2.size)._2.keySet
    val radial = verts.filter(v => SeqOracles.bfs(edges, Seq(v)).keySet.exists(largest))
    val g = Graph.fromPairs(spark, edges)
    val rRes = SumSweep.compute(g, SumSweep.Output.Radius)
    assert(rRes.radius == radial.map(allEcc).min)
    assert(allEcc(rRes.radiusVertex) == rRes.radius, "radius witness must attain the radius")
    val dRes = SumSweep.compute(g, SumSweep.Output.Diameter)
    assert(dRes.diameter == allEcc.values.max)
    // the witness must ATTAIN the diameter — as its forward ecc (forward
    // closure path) or backward ecc (the D = max eccB path); a vertex
    // whose ecc is merely a stale earlier candidate is an invalid witness
    val w = dRes.diameterVertex
    val eccBw = SeqOracles.bfs(edges.map(_.swap), Seq(w)).values.max
    assert(allEcc(w) == dRes.diameter || eccBw == dRes.diameter,
      s"diameter witness $w: eccF=${allEcc(w)} eccB=$eccBw diameter=${dRes.diameter}")
  }

  test("fromEcc does not evict a caller-persisted ecc frame (essShared reuse)") {
    val g = Graph.fromPairs(spark, Fixtures.cycle4)
    val r = SumSweep.compute(g, SumSweep.Output.AllForward)
    val cached = r.ecc.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cached.count()
    Eccentricity.fromEcc(cached, r.radial)
    assert(cached.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
      "fromEcc must not unpersist a frame it didn't cache")
    cached.unpersist()
  }

  test("undirected computer: star9 golden, fewer BFS than the directed route (undir_outputs.rs)") {
    val base = Seq((0L, 1L), (0L, 3L), (0L, 5L), (0L, 7L),
      (1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L))
    val sym = base ++ base.map(_.swap)
    val g = Graph.fromPairs(spark, sym)
    val r = SumSweep.computeUndirected(g, SumSweep.Output.AllForward, batch = 1)
    val ecc = r.ecc.collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(ecc == Map(0L -> 2, 1L -> 3, 2L -> 4, 3L -> 3, 4L -> 4,
      5L -> 3, 6L -> 4, 7L -> 3, 8L -> 4))
    assert(r.diameter == 4 && r.radius == 2 && r.radiusVertex == 0L)
    // per-output iteration counters (undir_outputs.rs fields)
    assert(r.radiusIterations > 0 && r.radiusIterations <= r.iterations)
    assert(r.diameterIterations > 0 && r.diameterIterations <= r.iterations)
    // the specialization's point: every sweep tightens BOTH bounds, so
    // full certification needs measurably fewer BFS than the directed
    // computer on the same symmetric graph
    val dir = SumSweep.compute(g, SumSweep.Output.AllForward, batch = 1)
    assert(r.iterations < dir.iterations,
      s"undirected ${r.iterations} BFS vs directed ${dir.iterations}")
  }

  test("undirected differential: ecc/radius/diameter == BFS oracle on symmetric topologies (incl. disconnected)") {
    val bases = Seq(
      Fixtures.cycle4,
      Fixtures.erdosRenyi(30, 0.06, 21),
      Fixtures.erdosRenyi(15, 0.10, 22) ++ // two disjoint components
        Fixtures.erdosRenyi(15, 0.10, 23).map { case (a, b) => (a + 100L, b + 100L) })
    bases.foreach { b0 =>
      val sym = (b0 ++ b0.map(_.swap)).distinct
      val got = SumSweep.computeUndirected(Graph.fromPairs(spark, sym))
      val eccGot = got.ecc.collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
      val verts = (sym.map(_._1) ++ sym.map(_._2)).distinct
      val eccWant = verts.map(v => v -> SeqOracles.bfs(sym, Seq(v)).values.max).toMap
      assert(eccGot == eccWant)
      assert(got.diameter == eccWant.values.max)
      // radial set = largest CC (ties by min label): radius over it
      val comp = SeqOracles.cc(sym)
      val largest = comp.groupBy(_._2).maxBy { case (c, m) => (m.size, -c) }._2.keySet
      assert(got.radius == largest.map(eccWant).min)
    }
  }

  test("maxComponents guard: allCC step disabled above threshold, results still exact") {
    // 8 directed 3-cycles chained by bridges: 8 SCCs, deep condensation
    val edges = (0 until 8).flatMap { i =>
      val b = 10L * i
      Seq((b, b + 1), (b + 1, b + 2), (b + 2, b)) ++
        (if (i < 7) Seq((b, b + 10)) else Nil)
    }
    val g = Graph.fromPairs(spark, edges)
    val guarded = SumSweep.compute(g, SumSweep.Output.All, maxComponents = 4)
    assert(guarded.allCcSteps == 0, "guard must disable the condensation step")
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val eccWant = verts.map(v => v -> SeqOracles.bfs(edges, Seq(v)).values.max).toMap
    guarded.ecc.collect().foreach(r =>
      assert(r.getInt(1) == eccWant(r.getLong(0)), s"vertex ${r.getLong(0)}"))
    val normal = SumSweep.compute(g, SumSweep.Output.All)
    assert(guarded.diameter == normal.diameter && guarded.radius == normal.radius)
    assert(normal.diameter == eccWant.values.max)
  }

  test("effective diameter interpolation on an exact NF") {
    val nf = SeqHyperBall.exactNf(Fixtures.cycle4) // 4, 8, 12, 16
    assert(Eccentricity.effectiveDiameter(nf, 1.0) == 3.0)
    assert(math.abs(Eccentricity.effectiveDiameter(nf, 0.5) - 1.0) < 1e-9)
  }

  test("distance stats (mean, spid) from an NF: hand-computed + degenerate cases") {
    // nf = [3, 7, 9]: Δ(1)=4, Δ(2)=2 over total 9 →
    // mean = (1·4 + 2·2)/9 = 8/9; E[t²] = (1·4 + 4·2)/9 = 12/9;
    // spid = (12/9 − (8/9)²)/(8/9)
    val (mean, spid) = Eccentricity.distanceStats(Seq(3.0, 7.0, 9.0))
    assert(math.abs(mean - 8.0 / 9.0) < 1e-12)
    val varWant = 12.0 / 9.0 - math.pow(8.0 / 9.0, 2)
    assert(math.abs(spid - varWant / (8.0 / 9.0)) < 1e-12)
    // DIRECTED cycle4: each source sees distances 0,1,2,3 → mean
    // (1+2+3)/4 = 1.5 over NF.last = 16 pairs (self-pairs in the
    // denominator, WebGraph's avg-distance convention)
    val nf = SeqHyperBall.exactNf(Fixtures.cycle4)
    assert(math.abs(Eccentricity.distanceStats(nf)._1 - 1.5) < 1e-9)
    // single-radius NF → zero mass beyond t=0 → (0, 0); empty total → (0, 0)
    assert(Eccentricity.distanceStats(Seq(5.0)) == ((0.0, 0.0)))
    assert(Eccentricity.distanceStats(Seq(0.0)) == ((0.0, 0.0)))
    // a trailing converged iteration (Δ=0 tail) must not move the stats
    val (m1, s1) = Eccentricity.distanceStats(nf)
    val (m2, s2) = Eccentricity.distanceStats(nf :+ nf.last)
    assert(m1 == m2 && s1 == s2)
  }

  test("localFinishEdges twin == sweep computer: ecc, radial, canonical radius/diameter") {
    // The r6 broadcast-CSR local-exact path must agree with the
    // distributed sweep computer on every output a caller consumes —
    // including the radial set and the fromEcc-canonical extremal picks.
    val graphs = Seq(
      Fixtures.erdosRenyi(35, 0.05, 21),
      Fixtures.erdosRenyi(25, 0.12, 22), // dense, near-flat ecc
      Fixtures.erdosRenyi(18, 0.08, 23) ++ // disconnected
        Fixtures.erdosRenyi(18, 0.08, 24).map { case (a, b) => (a + 100L, b + 100L) },
      Seq((10L, 32L), (10L, 65L), (65L, 10L), (21L, 44L))) // sparse ids
    graphs.zipWithIndex.foreach { case (edges, i) =>
      val gd = Graph.fromPairs(spark, edges)
      val gl = Graph.fromPairs(spark, edges)
      val dist = SumSweep.compute(gd, SumSweep.Output.AllForward)
      val loc = SumSweep.compute(gl, SumSweep.Output.AllForward,
        localFinishEdges = 1000000L)
      def m(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(m(loc.ecc) == m(dist.ecc), s"graph $i ecc")
      def rset(df: org.apache.spark.sql.DataFrame) =
        df.select("id").collect().map(_.getLong(0)).toSet
      assert(rset(loc.radial) == rset(dist.radial), s"graph $i radial")
      val want = Eccentricity.fromEcc(dist.ecc, dist.radial)
      assert(loc.radius == want.radius && loc.radiusVertex == want.radiusVertex,
        s"graph $i radius")
      assert(loc.diameter == want.diameter && loc.diameterVertex == want.diameterVertex,
        s"graph $i diameter")
    }
  }

  test("localFinishEdges twin (undirected) == computeUndirected on a symmetric ER graph") {
    val edges = Fixtures.erdosRenyi(30, 0.08, 25)
    val sym = edges ++ edges.map { case (a, b) => (b, a) }
    val dist = SumSweep.computeUndirected(Graph.fromPairs(spark, sym))
    val loc = SumSweep.computeUndirected(Graph.fromPairs(spark, sym),
      localFinishEdges = 1000000L)
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(m(loc.ecc) == m(dist.ecc))
    def rset(df: org.apache.spark.sql.DataFrame) =
      df.select("id").collect().map(_.getLong(0)).toSet
    assert(rset(loc.radial) == rset(dist.radial))
  }
}
