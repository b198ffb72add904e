package graft.operators

import graft.TestSpark
import graft.core.Graph
import org.scalatest.funsuite.AnyFunSuite

class BowTieSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def regions(edges: Seq[(Long, Long)]): Map[Long, String] =
    BowTie.run(Graph.fromPairs(spark, edges)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  // One graph exercising every region: core 3-cycle {1,2,3}; IN {10,11};
  // OUT {20,21}; tube 30 (IN→30→OUT, bypassing the core); tendril_in 40
  // (hangs off IN); tendril_out 41 (feeds OUT); tendril_other 50 (points
  // INTO a tendril — weakly attached only); disconnected {60,61}.
  private val web: Seq[(Long, Long)] = Seq(
    1L -> 2L, 2L -> 3L, 3L -> 1L, // core
    10L -> 1L, 11L -> 10L,        // in
    3L -> 20L, 20L -> 21L,        // out
    10L -> 30L, 30L -> 20L,       // tube
    11L -> 40L,                   // tendril_in
    41L -> 21L,                   // tendril_out
    50L -> 40L,                   // tendril_other
    60L -> 61L                    // disconnected
  )

  test("all eight regions on the hand-built bow-tie graph") {
    val r = regions(web)
    assert(Seq(1L, 2L, 3L).forall(r(_) == "core"))
    assert(Seq(10L, 11L).forall(r(_) == "in"))
    assert(Seq(20L, 21L).forall(r(_) == "out"))
    assert(r(30L) == "tube")
    assert(r(40L) == "tendril_in")
    assert(r(41L) == "tendril_out")
    assert(r(50L) == "tendril_other")
    assert(Seq(60L, 61L).forall(r(_) == "disconnected"))
    assert(r.size == 13)
  }

  test("sizes census matches the per-vertex regions") {
    val g = Graph.fromPairs(spark, web)
    val sizes = BowTie.sizes(g).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes == Map(
      "core" -> 3L, "in" -> 2L, "out" -> 2L, "tube" -> 1L,
      "tendril_in" -> 1L, "tendril_out" -> 1L, "tendril_other" -> 1L,
      "disconnected" -> 2L))
  }

  test("pure cycle is all core; pure DAG chain is core+in+out by largest-SCC tie-break") {
    val cyc = regions(Seq(0L -> 1L, 1L -> 2L, 2L -> 0L))
    assert(cyc.values.forall(_ == "core"))
    // Chain 0→1→2: all SCCs singletons, tie broken to smallest label 0 —
    // so 0 is core and everything downstream is OUT.
    val chain = regions(Seq(0L -> 1L, 1L -> 2L))
    assert(chain == Map(0L -> "core", 1L -> "out", 2L -> "out"))
  }

  test("shared scc/wcc inputs produce the same decomposition") {
    val g = Graph.fromPairs(spark, web)
    val scc = Scc.run(g)
    val wcc = ConnectedComponents.run(g).components
    val viaShared = BowTie.run(g, Some(scc), Some(wcc)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaShared == regions(web))
  }
}
