package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class CoCitationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // s1 -> {a,b,c}, s2 -> {a,b}, s3 -> {a,b}, s4 -> {c} (deg-1: never pairs)
  private val edges = Seq(
    ("s1", "a"), ("s1", "b"), ("s1", "c"),
    ("s2", "a"), ("s2", "b"),
    ("s3", "a"), ("s3", "b"),
    ("s4", "c")).toDF("src", "dst")

  test("pair counts, support floor, and Adamic-Adar weights") {
    val got = CoCitation.run(edges, minSupport = 1).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    // (a,b): co-cited by s1 (deg 3) + s2, s3 (deg 2) each
    val aaAB = 1.0 / math.log(3) + 2.0 / math.log(2)
    assert(got(("a", "b"))._1 == 3L)
    assert(math.abs(got(("a", "b"))._2 - aaAB) < 1e-5)
    // (a,c) and (b,c): only s1
    assert(got(("a", "c")) == (1L, BigDecimal(1.0 / math.log(3))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    assert(got(("b", "c"))._1 == 1L)
    assert(got.size == 3)
    // default support floor (2) keeps only (a,b)
    val floored = CoCitation.run(edges).collect()
    assert(floored.length == 1 && floored.head.getString(0) == "a")
  }

  test("hub cap drops over-degree sources; duplicate arcs count once") {
    val hub = Seq.tabulate(5)(i => ("hub", s"t$i")).toDF("src", "dst")
    val dup = edges.union(edges) // duplicated arcs must not double common
    assert(CoCitation.run(hub.union(dup), maxOutDeg = 4, minSupport = 1)
      .where($"u" === "a" && $"v" === "b").head().getLong(2) == 3L)
    assert(CoCitation.run(hub, maxOutDeg = 4, minSupport = 1).count() == 0)
    assert(CoCitation.run(hub, maxOutDeg = 5, minSupport = 1).count() == 10)
  }

  test("reversed edges give bibliographic coupling: sources paired by shared targets, 1/ln(indeg) weights") {
    val rev = edges.select($"dst".as("src"), $"src".as("dst"))
    val got = CoCitation.run(rev, minSupport = 1).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    // s1,s2 share {a,b}; a has indeg 3, b has indeg 3 (s1,s2,s3 each).
    assert(got(("s1", "s2")) == (2L, BigDecimal(2.0 / math.log(3))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    // s1,s4 share only c (indeg 2).
    assert(got(("s1", "s4"))._1 == 1L)
    assert(math.abs(got(("s1", "s4"))._2 - 1.0 / math.log(2)) < 1e-5)
  }
}
