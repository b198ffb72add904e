package graft.operators

import graft.{Fixtures, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

class SsspSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Sequential Bellman–Ford replay (run to fixpoint, capped). */
  private def seqSssp(edges: Seq[(Long, Long, Long)], roots: Seq[Long],
                      maxRounds: Int = 64): Map[Long, Long] = {
    var dist = roots.map(_ -> 0L).toMap
    var changed = true
    var round = 0
    while (changed && round < maxRounds) {
      round += 1
      changed = false
      val next = scala.collection.mutable.Map(dist.toSeq: _*)
      for ((s, d, w) <- edges; ds <- dist.get(s)) {
        if (!next.get(d).exists(_ <= ds + w)) { next(d) = ds + w; changed = true }
      }
      dist = next.toMap
    }
    dist
  }

  test("hand-built graph: weighted distances differ from hop counts; unreached absent") {
    // 0→1 (w5), 0→2 (w1), 2→1 (w1): shortest 0→1 is 2 via the 2-hop path.
    // 3→4 unreachable from 0.
    val edges = Seq((0L, 1L, 5L), (0L, 2L, 1L), (2L, 1L, 1L), (3L, 4L, 2L))
    val got = Sssp.run(edges.toDF("src", "dst", "w"), Seq(0L).toDF("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 2L -> 1L, 1L -> 2L))
  }

  test("matches the sequential oracle on random weighted graphs; multi-root; bounded rounds") {
    val base = Fixtures.erdosRenyi(80, 0.05, 7)
    val edges = base.map { case (s, d) => (s, d, ((s * 7 + d * 13) % 10) + 1) }
    for (roots <- Seq(Seq(0L), Seq(0L, 17L, 44L))) {
      val got = Sssp.run(edges.toDF("src", "dst", "w"), roots.toDF("id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == seqSssp(edges, roots), s"roots=$roots")
    }
    // Bounded rounds = lightest <=k-arc path, replayed by the capped oracle.
    val got2 = Sssp.run(edges.toDF("src", "dst", "w"), Seq(0L).toDF("id"), maxRounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == seqSssp(edges, Seq(0L), maxRounds = 2))
  }

  test("negative, null, and fractional weights are rejected") {
    assertThrows[IllegalArgumentException] {
      Sssp.run(Seq((0L, 1L, -1L)).toDF("src", "dst", "w"), Seq(0L).toDF("id"))
    }
    assertThrows[IllegalArgumentException] {
      Sssp.run(Seq((0L, 1L, null.asInstanceOf[java.lang.Long]))
        .toDF("src", "dst", "w"), Seq(0L).toDF("id"))
    }
    assertThrows[IllegalArgumentException] {
      // 0.5 would silently truncate to 0 under the int64 cast
      Sssp.run(Seq((0L, 1L, 0.5)).toDF("src", "dst", "w"), Seq(0L).toDF("id"))
    }
    // but a lossless double weight is fine
    val ok = Sssp.run(Seq((0L, 1L, 2.0)).toDF("src", "dst", "w"), Seq(0L).toDF("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ok == Map(0L -> 0L, 1L -> 2L))
  }
}
