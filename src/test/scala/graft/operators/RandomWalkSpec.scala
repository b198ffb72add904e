package graft.operators

import graft.{Fixtures, TestSpark}
import graft.core.Graph
import org.scalatest.funsuite.AnyFunSuite

class RandomWalkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def md5Hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  /** Sequential replay of the hash-seeded walk. */
  private def seqWalks(edges: Seq[(Long, Long)], steps: Int,
                       salt: String = ""): Map[(Long, Long), Long] = {
    val succ = edges.distinct.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.sorted.toIndexedSeq).toMap
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val out = scala.collection.mutable.Map[(Long, Long), Long]()
    nodes.foreach { v =>
      var cur = v
      out((v, 0L)) = cur
      for (t <- 1 to steps) {
        succ.get(cur).filter(_.nonEmpty).foreach { ds =>
          cur = ds((md5Hash60(s"$cur:$salt$t") % ds.size).toInt)
        }
        out((v, t.toLong)) = cur
      }
    }
    out.toMap
  }

  test("walks match the sequential replay, cover dead ends, step 0 is the start") {
    for (edges <- Seq(Fixtures.tree7, Fixtures.bucket9, Fixtures.erdosRenyi(50, 0.08, 5))) {
      val got = RandomWalk.run(Graph.fromPairs(spark, edges), steps = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val want = seqWalks(edges, 4)
      assert(got == want)
      // every walk has exactly steps+1 positions, step 0 at the start
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      nodes.foreach { v => assert(got((v, 0L)) == v) }
      assert(got.size == nodes.size * 5)
    }
  }

  test("walk hops follow real edges (or absorb at dead ends)") {
    val edges = Fixtures.erdosRenyi(40, 0.08, 9)
    val eset = edges.toSet
    val byWalk = RandomWalk.run(Graph.fromPairs(spark, edges), steps = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    byWalk.values.foreach { hops =>
      hops.sortBy(_._2).map(_._3).sliding(2).foreach {
        case Array(a, b) => assert(a == b || eset((a, b)), s"phantom hop $a->$b")
        case _           =>
      }
    }
  }

  test("hub chunk slicing: walks through a vertex with out-degree > chunkSize are exact") {
    // star hub 0 -> 1..300 with tiny chunkSize forces multi-chunk lookup
    import spark.implicits._
    val edges = (1L to 300L).map(d => (0L, d)) ++ Seq((300L, 0L))
    val g = Graph.fromEdges(edges.toDF("src", "dst"), chunkSize = 16)
    val got = RandomWalk.run(g, steps = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == seqWalks(edges, 2))
  }

  test("salt changes the walk; same salt reproduces it") {
    val g = Graph.fromPairs(spark, Fixtures.erdosRenyi(50, 0.1, 2))
    def runSalt(s: String) = RandomWalk.run(g, steps = 3, salt = s)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val a = runSalt("x")
    assert(a == runSalt("x"))
    assert(a != runSalt("y"))
  }
}
