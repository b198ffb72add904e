package graft.operators

import graft.TestSpark
import graft.core.Graph
import org.scalatest.funsuite.AnyFunSuite

class KTrussSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def trussMap(edges: Seq[(Long, Long)], k: Int): (Map[(Long, Long), Long], Int, Boolean) = {
    val r = KTruss.run(Graph.fromPairs(spark, edges), k)
    (r.truss.collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap,
      r.rounds, r.converged)
  }

  /** Sequential reference: synchronous truss peel over the undirected
    * simple graph — per round, count each surviving edge's common
    * neighbors within the surviving set, remove ALL edges below k−2
    * simultaneously. Round counting matches [[KTruss.run]]: a round is
    * counted iff it changed the edge set.
    */
  private def seqKTruss(edges: Seq[(Long, Long)], k: Int): (Map[(Long, Long), Int], Int) = {
    var es = edges.collect { case (u, v) if u != v => (u min v, u max v) }.toSet
    def adj(s: Set[(Long, Long)]): Map[Long, Set[Long]] =
      (s.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) })
        .groupBy(_._1).map { case (x, ys) => x -> ys.map(_._2).toSet }
    var rounds = 0
    var changed = true
    while (changed) {
      val a = adj(es)
      val next = es.filter { case (u, v) => (a(u) & a(v)).size >= k - 2 }
      changed = next != es
      if (changed) { rounds += 1; es = next }
    }
    val a = adj(es)
    (es.map { case (u, v) => (u, v) -> (a.getOrElse(u, Set.empty) & a.getOrElse(v, Set.empty)).size }.toMap,
      rounds)
  }

  test("5-clique is its own 5-truss (every edge closes 3 triangles); a tail edge peels") {
    val clique = for (i <- 0L until 5L; j <- (i + 1) until 5L) yield (i, j)
    val edges = clique :+ (4L, 99L)
    val (t, rounds, conv) = trussMap(edges, k = 5)
    assert(conv)
    assert(t.keySet === clique.toSet)
    assert(t.values.forall(_ === 3L))
    assert(rounds === 1) // one round removes the tail edge; fixpoint probe after
  }

  test("cascade to empty: a triangle chain under k=4 peels away end-in") {
    // Triangles sharing single vertices: each edge is in exactly 1 triangle,
    // so a 4-truss (support >= 2) removes everything in one synchronous round.
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L), (4L, 2L))
    val (t, rounds, conv) = trussMap(edges, k = 4)
    assert(conv)
    assert(t.isEmpty)
    assert(rounds === 1)
  }

  test("multi-round cascade: bridge edge loses support only after its triangle dies") {
    // K4 on {0,1,2,3}; a pendant triangle {3,4,5} where edge (4,5) also
    // hangs a weak triangle {4,5,6} — under k=4: round 1 removes the six
    // edges in only one triangle each ((3,4),(3,5),(4,6),(5,6)), round 2
    // removes (4,5) whose remaining support then falls under 2.
    val k4 = for (i <- 0L until 4L; j <- (i + 1) until 4L) yield (i, j)
    val edges = k4 ++ Seq((3L, 4L), (3L, 5L), (4L, 5L), (4L, 6L), (5L, 6L))
    val (t, rounds, conv) = trussMap(edges, k = 4)
    assert(conv)
    assert(t.keySet === k4.toSet)
    assert(rounds === 2)
  }

  test("differential vs sequential peel on a deterministic ER graph (directed, loops, dups)") {
    val rnd = new scala.util.Random(20260819L)
    val n = 60
    val edges = Seq.fill(700)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
    for (k <- Seq(3, 4, 5)) {
      val (got, gotRounds, conv) = trussMap(edges, k)
      val (want, wantRounds) = seqKTruss(edges, k)
      assert(conv)
      assert(got.view.mapValues(_.toInt).toMap === want, s"k=$k")
      assert(gotRounds === wantRounds, s"k=$k rounds")
    }
  }

  test("incremental support maintenance is peel-identical to the full-recount loop") {
    // The pre-round-5 implementation recomputed every surviving edge's
    // support each round; the incremental version must produce the same
    // fixpoint, supports, and round count on a graph with a multi-round
    // cascade. Full-recount loop reproduced here as the reference.
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(50820L)
    val n = 90
    val edges = Seq.fill(1200)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
    for (k <- Seq(3, 4, 6)) {
      val (got, gotRounds, conv) = trussMap(edges, k)
      assert(conv)
      var st = spark.createDataFrame(edges.collect {
        case (u, v) if u != v => (u min v, u max v)
      }.distinct).toDF("u", "v").localCheckpoint(true)
      var prev = st.count()
      var rounds = 0
      var changed = prev > 0
      while (changed) {
        val next = TriangleCount.supportOfCanonical(st)
          .filter(col("support") >= (k - 2).toLong)
          .select(col("u"), col("v"))
          .localCheckpoint(true)
        val cnt = next.count()
        changed = cnt != prev
        if (changed) { rounds += 1; st = next; prev = cnt }
        if (cnt == 0) changed = false
      }
      val want = TriangleCount.supportOfCanonical(st.localCheckpoint(true)).collect()
        .map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
      assert(got === want, s"k=$k supports")
      assert(gotRounds === rounds, s"k=$k rounds")
    }
  }

  test("maxRounds honesty: a capped run reports converged = false") {
    // The k4+pendant graph needs 2 rounds; cap at 1.
    val k4 = for (i <- 0L until 4L; j <- (i + 1) until 4L) yield (i, j)
    val edges = k4 ++ Seq((3L, 4L), (3L, 5L), (4L, 5L), (4L, 6L), (5L, 6L))
    val r = KTruss.run(Graph.fromPairs(spark, edges), k = 4, maxRounds = 1)
    assert(!r.converged)
    assert(r.rounds === 1)
  }

  test("k-truss is contained in the (k-1)-core (structural invariant on ER)") {
    val rnd = new scala.util.Random(7L)
    val n = 50
    val edges = Seq.fill(500)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
    val g = Graph.fromPairs(spark, edges)
    val truss = KTruss.run(g, k = 4).truss.collect()
      .flatMap(x => Seq(x.getLong(0), x.getLong(1))).toSet
    val core = KCore.run(g, k = 3).core.collect().map(_.getLong(0)).toSet
    assert(truss.subsetOf(core))
  }
}
