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

  /** Sequential replay of the node2vec-biased walk: hop 1 uniform (as
    * [[seqWalks]]), hops ≥ 2 pick the first dst-ordered successor whose
    * cumulative 0.5/1.0/0.25 weight exceeds u·total.
    */
  private def seqNode2vec(edges: Seq[(Long, Long)], steps: Int, salt: String,
                          p: Double = 2.0, q: Double = 4.0): Map[(Long, Long), Long] = {
    val e = edges.distinct
    val succ = e.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.sorted.toIndexedSeq).toMap
    val eset = e.toSet
    val nodes = e.flatMap(x => Seq(x._1, x._2)).distinct
    val out = scala.collection.mutable.Map[(Long, Long), Long]()
    nodes.foreach { v =>
      var prev = v
      var cur = v
      out((v, 0L)) = cur
      for (t <- 1 to steps) {
        if (t == 1) {
          succ.get(cur).filter(_.nonEmpty).foreach { ds =>
            prev = cur
            cur = ds((md5Hash60(s"$cur:$salt$t") % ds.size).toInt)
          }
          out((v, 1L)) = cur
        } else {
          succ.get(cur).filter(_.nonEmpty) match {
            case Some(ds) =>
              val wts = ds.map(x =>
                if (x == prev) 1.0 / p
                else if (eset((prev, x))) 1.0
                else 1.0 / q)
              val tot = wts.sum
              val u = md5Hash60(s"$v:$prev:$cur:$salt$t").toDouble / math.pow(2, 60)
              var cum = 0.0
              var pick = -1L
              for (i <- ds.indices if pick < 0) {
                cum += wts(i)
                if (cum > u * tot) pick = ds(i)
              }
              prev = cur
              cur = pick
            case None => prev = cur // dead end absorbs
          }
          out((v, t.toLong)) = cur
        }
      }
    }
    out.toMap
  }

  test("node2vec matches the sequential biased replay (dead ends, hubs, ER)") {
    for (edges <- Seq(Fixtures.tree7, Fixtures.bucket9, Fixtures.erdosRenyi(50, 0.08, 5))) {
      val got = RandomWalk.node2vec(Graph.fromPairs(spark, edges), steps = 4, salt = "b")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val want = seqNode2vec(edges, 4, "b")
      assert(got == want, s"node2vec diverged on ${edges.take(3)}…")
    }
  }

  test("node2vec return bias: p≫ discourages, p≪ forces the backtrack") {
    // two-node cycle plus a decoy: from 1 the candidates are {0 (=prev), 2}
    val edges = Seq(0L -> 1L, 1L -> 0L, 1L -> 2L, 2L -> 1L, 0L -> 3L, 3L -> 0L)
    // q fixed; tiny p makes the return weight dominate, so every hop-2
    // step from a degree-2 vertex returns to its predecessor
    val low = RandomWalk.node2vec(Graph.fromPairs(spark, edges), steps = 2,
      p = 0.0078125, q = 4.0, salt = "s")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = seqNode2vec(edges, 2, "s", p = 0.0078125, q = 4.0)
    assert(low == want)
    // with weight 128 vs ≤ 1.25 total of the others, u < 128/129.25 almost
    // surely: all 4 hop-2 states with a valid predecessor must backtrack
    val back = low.collect { case ((s, 2L), n) if low((s, 1L)) != s => (s, n) }
    assert(back.nonEmpty && back.forall { case (s, n) => n == s },
      s"low-p walks did not return to their start: $back")
  }

  test("node2vec in-neighborhood bias is exact on a fixture where cases differ") {
    // 0->1, 1->{0,2,3}, 0->2 (so from cur=1 prev=0: x=0 return 0.5,
    // x=2 in N(0) weight 1, x=3 explore 0.25)
    val edges = Seq(0L -> 1L, 1L -> 0L, 1L -> 2L, 1L -> 3L, 0L -> 2L,
      2L -> 0L, 3L -> 0L)
    val got = RandomWalk.node2vec(Graph.fromPairs(spark, edges), steps = 3, salt = "w")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == seqNode2vec(edges, 3, "w"))
  }
}
