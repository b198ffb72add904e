package graft

import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** One shared local session for the whole forked test JVM. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = graft.core.Sessions.tuned(SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4"))
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

/** Reference-derived tiny fixtures (FIXTURES.md §2; arcs cited from the
  * reference's tests directory).
  */
object Fixtures {
  /** tests/test_sccs.rs:91-107 — 9-node "buckets" graph. */
  val bucket9: Seq[(Long, Long)] = Seq(
    (0L, 0L), (1L, 0L), (1L, 2L), (2L, 1L), (2L, 3L), (2L, 4L), (2L, 5L),
    (3L, 4L), (4L, 3L), (5L, 5L), (5L, 6L), (5L, 7L), (5L, 8L), (6L, 7L), (8L, 7L))
  /** tests/test_sccs.rs:129-141 */
  val triangleTail: Seq[(Long, Long)] = Seq((0L, 1L), (1L, 2L), (2L, 0L), (1L, 3L))
  val cycle4: Seq[(Long, Long)] = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
  val clique5: Seq[(Long, Long)] =
    for { u <- 0L until 5L; v <- 0L until 5L if u != v } yield (u, v)
  val tree7: Seq[(Long, Long)] = Seq((0L, 1L), (0L, 2L), (1L, 3L), (1L, 4L), (2L, 5L), (2L, 6L))
  /** tests/test_sccs.rs:245-254 */
  val lozenge: Seq[(Long, Long)] = Seq((0L, 1L), (1L, 0L), (0L, 2L), (1L, 3L), (2L, 3L))
  /** tests/test_bfv.rs:114-132 */
  val multiroot: Seq[(Long, Long)] = Seq((0L, 1L), (1L, 2L), (3L, 2L))
  val dag4: Seq[(Long, Long)] = Seq((0L, 1L), (0L, 2L), (2L, 3L), (1L, 3L))

  /** Seeded Erdős–Rényi directed graph (no self loops). */
  def erdosRenyi(n: Int, p: Double, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    for {
      u <- 0 until n; v <- 0 until n
      if u != v && rnd.nextDouble() < p
    } yield (u.toLong, v.toLong)
  }
}

/** Naive single-threaded oracles (the analogue of the reference's in-test
  * oracles, e.g. tests/test_bfv.rs:19-54 `correct_dists`).
  */
object SeqOracles {

  private def verts(edges: Seq[(Long, Long)]): Seq[Long] =
    (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted

  /** Union-find CC over the symmetrized edge set; labels = min member id. */
  def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      parent(x) = r; r
    }
    verts(edges).foreach(v => parent(v) = v)
    edges.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    verts(edges).map(v => v -> find(v)).toMap
  }

  /** Textbook power-iteration PageRank with dangling redistribution. */
  def pagerank(edges: Seq[(Long, Long)], alpha: Double, iters: Int): Map[Long, Double] = {
    val es = edges.distinct
    val vs = verts(es)
    val n = vs.size
    val out = es.groupBy(_._1).map { case (s, l) => s -> l.size }
    var rank = vs.map(v => v -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dang = vs.filter(v => !out.contains(v)).map(rank).sum
      val contrib = mutable.Map[Long, Double]().withDefaultValue(0.0)
      es.foreach { case (s, d) => contrib(d) += rank(s) / out(s) }
      rank = vs.map { v =>
        v -> ((1 - alpha) / n + alpha * (contrib(v) + dang / n))
      }.toMap
    }
    rank
  }

  def bfs(edges: Seq[(Long, Long)], roots: Seq[Long]): Map[Long, Int] = {
    val es = edges.distinct
    val adjM = es.groupBy(_._1).map { case (s, l) => s -> l.map(_._2) }
    val dist = mutable.Map[Long, Int]()
    var frontier = roots.distinct
    frontier.foreach(r => dist(r) = 0)
    var d = 0
    while (frontier.nonEmpty) {
      d += 1
      frontier = frontier
        .flatMap(v => adjM.getOrElse(v, Nil))
        .distinct
        .filterNot(dist.contains)
      frontier.foreach(v => dist(v) = d)
    }
    dist.toMap
  }

  /** Brute-force triangle count on the simple undirected graph. */
  def triangles(edges: Seq[(Long, Long)]): Long = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val vs = verts(edges)
    val triples = for {
      i <- vs.indices; j <- (i + 1) until vs.size; k <- (j + 1) until vs.size
      if und((vs(i), vs(j))) && und((vs(j), vs(k))) && und((vs(i), vs(k)))
    } yield 1
    triples.size.toLong
  }

  /** Synchronous LP: most frequent neighbor label, ties -> min label. */
  def lp(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val sym = (edges ++ edges.map(_.swap)).distinct.filter(e => e._1 != e._2)
    val adjM = sym.groupBy(_._1).map { case (s, l) => s -> l.map(_._2) }
    val vs = verts(edges)
    var lab = vs.map(v => v -> v).toMap
    for (_ <- 1 to iters) {
      lab = vs.map { v =>
        val nb = adjM.getOrElse(v, Nil).map(lab)
        if (nb.isEmpty) v -> lab(v)
        else {
          val counts = nb.groupBy(identity).map { case (l, o) => (l, o.size) }
          v -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
        }
      }.toMap
    }
    lab
  }
}
