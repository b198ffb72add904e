package graft.operators

import graft.TestSpark
import graft.core.Graph
import graft.ingest.PageGen
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pinned web-topology regression fixture — the analogue of the
  * reference's real-graph golden tests (`tests/test_sccs.rs:213-226` pins
  * cnr-2000 = 325,557 nodes / 3,216,152 arcs / exactly 100,977 SCCs;
  * `tests/graphs/cnr-2000.properties:25,29`). The reference's BV-format
  * binaries are undecodable in this sandbox, so the fixture is the
  * deterministic [[PageGen]] topology (pure expression of (id, seed):
  * byte-identical at any parallelism) with goldens derived ONCE by
  * `graft.tools.WebGolden` and frozen here. At derivation time every
  * pinned value was confirmed by at least two independent computations:
  * SCC count by distributed FB-Trim AND local Tarjan AND an independent
  * driver Kosaraju (6589 = 6589 = 6589); CC count by distributed
  * hash-to-min AND driver union-find; radius/diameter by SumSweep's own
  * certified adaptive bounds (`essBfs` bounded sweeps to certification).
  *
  * Unlike the ER fuzz specs, this net catches cross-operator drift on a
  * graph with a web graph's actual structure: one giant SCC (93% of
  * vertices) plus thousands of small ones, heavy in-degree skew
  * (maxIn 351 vs mean ~4), dangling pages, and host-block locality.
  *
  * SumSweep's full radius/diameter certification is pinned at n=5000:
  * its cost is sequential-BFS-level count (~2000 Spark jobs regardless of
  * parallelism), which at n=100k would dominate the whole suite's wall
  * clock. The n=100k section pins everything whose cost scales with data,
  * not job count.
  */
class WebFixtureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // ---- frozen goldens (graft.tools.WebGolden, 2026-08-18) -------------
  // GOLDEN {"n":100000,"vertices":99925,"arcs":422743,"maxOutDeg":165,
  //  "maxInDeg":351,"sccs":6589,"sccsLocal":6589,"largestScc":93288,
  //  "ccs":3,"largestCc":99923,"triangles":67028,"radius":13,
  //  "diameter":23,"hbIters":19,"nf":[...]}
  private val N = 100000L
  private val Vertices = 99925L
  private val Arcs = 422743L
  private val MaxOutDeg = 165L
  private val MaxInDeg = 351L
  private val Sccs = 6589L
  private val LargestScc = 93288L
  private val Ccs = 3L
  private val LargestCc = 99923L
  private val Triangles = 67028L
  private val HbIters = 19
  private val Nf: Seq[Double] = Seq(
    100713.8925, 516400.4733, 2094355.2106, 7798681.4102, 26726388.1257,
    84451190.1384, 247129299.0865, 654873520.8659, 1504541621.1481,
    2905916328.1301, 4677329574.4773, 6295701665.3548, 7251332381.9509,
    7580004549.0644, 7641527725.4461, 7648415063.6038, 7649083636.8684,
    7649142521.1283, 7649146501.6772)

  private lazy val g: Graph = {
    val graph = Graph.fromEdges(PageGen.edges(spark, N))
    graph.adjacency.count() // materialize once for all tests
    graph
  }

  test("100k web fixture: vertex/arc counts and degree extremes") {
    assert(g.numVertices == Vertices)
    assert(g.numEdges == Arcs)
    assert(g.outDegrees.agg(max(col("deg"))).head().getLong(0) == MaxOutDeg)
    assert(g.inDegrees.agg(max(col("deg"))).head().getLong(0) == MaxInDeg)
  }

  test("100k web fixture: SCC count and giant-SCC size (cnr-2000 analogue of test_sccs.rs:213-226)") {
    val scc = Scc.run(g).persist()
    assert(scc.select(col("comp")).distinct().count() == Sccs)
    assert(scc.groupBy(col("comp")).count().agg(max(col("count"))).head().getLong(0) == LargestScc)
    scc.unpersist()
  }

  test("100k web fixture: weak CC count and giant-CC size") {
    val cc = ConnectedComponents.run(g)
    assert(cc.numComponents == Ccs)
    assert(cc.components.groupBy(col("comp")).count()
      .agg(max(col("count"))).head().getLong(0) == LargestCc)
  }

  test("100k web fixture: exact triangle count") {
    assert(TriangleCount.total(g) == Triangles)
  }

  test("100k web fixture: k-core sizes and peel depths (seq-peel cross-checked at derivation)") {
    // GOLDEN-EXT (graft.tools.WebGolden "ext", 2026-08-18): every size
    // and round count matched an independent sequential peel exactly —
    // {"k2":{"size":99460,"rounds":2},"k5":{"size":34031,"rounds":27},
    //  "k10":{"size":1443,"rounds":5}}. The k=5 peel's 27-round cascade
    // is the deep-peel regression web topology provides and ER graphs
    // don't.
    for ((k, size, rounds) <- Seq((2, 99460L, 2), (5, 34031L, 27), (10, 1443L, 5))) {
      val r = KCore.run(g, k)
      assert(r.converged, s"k=$k did not converge")
      assert(r.core.count() == size, s"k=$k core size")
      assert(r.rounds == rounds, s"k=$k peel depth")
    }
  }

  test("100k web fixture: bow-tie census (core == the giant-SCC golden)") {
    // GOLDEN-EXT: regions sum to the vertex golden; `core` is exactly
    // the largest SCC pinned above — a CROSS-operator consistency the
    // per-operator fuzz specs cannot observe.
    val got = BowTie.sizes(g).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "core" -> LargestScc,
      "in" -> 4550L, "out" -> 2056L,
      "tendril_in" -> 20L, "tendril_out" -> 7L, "tube" -> 2L,
      "disconnected" -> 2L))
    assert(got.values.sum == Vertices)
  }

  test("100k web fixture: HyperBall NF sequence and iteration count") {
    val hb = HyperBall.run(g)
    assert(hb.iterations == HbIters)
    assert(hb.neighbourhoodFunction.length == Nf.length)
    // registers are bit-identical at any parallelism; the NF aggregation
    // is a double sum whose order varies with partitioning — tolerance
    // covers summation-order noise only (~1e-11 relative), not drift
    hb.neighbourhoodFunction.zip(Nf).foreach { case (got, want) =>
      assert(math.abs(got - want) <= math.max(1e-4, 1e-9 * want),
        s"NF: $got vs frozen $want")
    }
  }

  test("5k web fixture: SumSweep certified radius 9 / diameter 17") {
    // GOLDEN {"n":5000,...,"radius":9,"radiusVertex":4718,"diameter":17,
    //  "diameterVertex":1691,...} — full adaptive-bound certification on
    //  web topology (giant SCC 4649/5000 + 347 small SCCs).
    val g5 = Graph.fromEdges(PageGen.edges(spark, 5000))
    val ess = SumSweep.compute(g5, SumSweep.Output.RadiusDiameter)
    assert(ess.radius == 9, s"radius ${ess.radius}")
    assert(ess.diameter == 17, s"diameter ${ess.diameter}")
  }
}
