package graft.operators

import graft.{Fixtures, TestSpark}
import graft.core.Graph
import org.scalatest.funsuite.AnyFunSuite

class LouvainSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def runLouvain(edges: Seq[(Long, Long)], rounds: Int = 4): Map[Long, Long] = {
    Louvain.run(Graph.fromPairs(spark, edges), rounds).labels
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Exact sequential replay of the synchronous parity-alternating move
    * rounds — BigInt score arithmetic, (score desc, comm asc) argmax —
    * the operator's deterministic contract.
    */
  private def replay(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val sym = edges.filter(e => e._1 != e._2).flatMap(e => Seq(e, e.swap)).distinct
    val deg = verts.map(v => v -> sym.count(_._1 == v).toLong).toMap
    val a = sym.size.toLong
    var lab = verts.map(v => v -> v).toMap
    for (r <- 1 to rounds) {
      // keysIterator, not keys.map: a Set.map would collapse members with
      // EQUAL degree into one element and under-count the volume
      val members = lab.groupBy(_._2).map { case (c, m) => c -> m.keys.toSet }
      val vol = members.map { case (c, ms) => c -> ms.iterator.map(deg).sum }
      lab = verts.map { v =>
        if ((v + r) % 2 != 0) v -> lab(v)
        else {
          val own = lab(v)
          val k = sym.filter(_._1 == v).groupBy(e => lab(e._2))
            .map { case (c, es) => c -> es.size.toLong }
          val best = (k.keySet + own).toSeq
            // Grappolo singleton rule: a move into a singleton community
            // is admissible only when its lone member id < v.
            .filter { c =>
              c == own || !(members(c).size == 1 && members(c).head > v)
            }
            .map { c =>
              val volc = vol.getOrElse(c, 0L) - (if (c == own) deg(v) else 0L)
              (BigInt(a) * BigInt(k.getOrElse(c, 0L)) - BigInt(deg(v)) * BigInt(volc), c)
            }.minBy { case (s, c) => (-s, c) }
          v -> best._2
        }
      }.toMap
    }
    lab
  }

  test("same-parity singleton pair merges instead of swap-oscillating") {
    // Edge (1,3): both odd, both eligible in odd rounds — without the
    // singleton rule they trade labels forever and end as two
    // singletons; with it, 3 joins 1 in round 1 and the pair stays
    // merged.
    val got = runLouvain(Seq(1L -> 3L))
    assert(got(1L) == got(3L), s"swap cycle not broken: $got")
    assert(got == replay(Seq(1L -> 3L), 4))
  }

  test("two triangles with a bridge resolve to the two triangles") {
    val edges = Seq(0L -> 1L, 1L -> 2L, 2L -> 0L,
                    3L -> 4L, 4L -> 5L, 5L -> 3L,
                    2L -> 3L)
    val got = runLouvain(edges)
    assert(Set(got(0L), got(1L), got(2L)).size == 1)
    assert(Set(got(3L), got(4L), got(5L)).size == 1)
    assert(got(0L) != got(3L), s"bridge merged the triangles: $got")
    assert(got == replay(edges, 4))
  }

  test("clique stays one community; its label is a member") {
    val got = runLouvain(Fixtures.clique5)
    assert(got.values.toSet.size == 1)
    assert(got.keySet.contains(got.values.head))
    assert(got == replay(Fixtures.clique5, 4))
  }

  test("self-loop-only vertex keeps its own singleton community") {
    val edges = Seq(0L -> 1L, 1L -> 0L, 7L -> 7L)
    val got = runLouvain(edges)
    assert(got(7L) == 7L)
    assert(got(0L) == got(1L))
    assert(got == replay(edges, 4))
  }

  test("ER differential: engine matches the sequential replay across round counts") {
    for (seed <- Seq(11L, 12L); rounds <- Seq(3, 4)) {
      val edges = Fixtures.erdosRenyi(40, 0.08, seed)
      assert(runLouvain(edges, rounds) == replay(edges, rounds),
        s"seed=$seed rounds=$rounds")
    }
  }

  test("output is independent of input partitioning") {
    val edges = Fixtures.erdosRenyi(30, 0.1, 5L)
    import spark.implicits._
    val df = edges.toDF("src", "dst").repartition(7)
    val g = Graph.fromEdges(df)
    val got = Louvain.run(g, 4).labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == replay(edges, 4))
  }
}
