package graft.operators

import graft.core.{CheckpointConfig, Graph, IterationContext}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Maximal independent set by synchronous local-minima rounds over a
  * hash permutation — the distributed symmetry-breaking primitive
  * (Luby 1986 / Blelloch et al. 2012 greedy-permutation form): in each
  * round, every live vertex whose permutation key is smaller than all of
  * its live neighbors' keys joins the MIS; winners and their neighbors
  * leave the graph. The fixpoint is EXACTLY the sequential greedy MIS of
  * the permutation order — the output is a deterministic function of the
  * graph and `salt`, independent of round structure, partitioning, and
  * retries (the key is [[graft.text.TextOps.portableHash60]] of
  * "id:salt", ties broken by id — not an RNG). MIS drives scheduling-
  * style pipeline stages: crawl politeness groups (no two adjacent hosts
  * fetched in the same slot), one-per-neighborhood landmark selection,
  * coloring seeds.
  *
  * Scale shape: per round, ONE per-edge key comparison + distinct
  * ("vertices with a smaller live neighbor" — map-side combined) and the
  * winner/removal anti-joins over a state that only SHRINKS; no per-
  * vertex adjacency arrays, no driver state. Expected O(log n) rounds
  * (each round removes a constant expected fraction of live edges), so a
  * 10^10-edge graph resolves in ~30 shuffle rounds. Vertices with no
  * live neighbor are local minima vacuously and join the MIS in their
  * first live round.
  */
object Mis {

  final case class Result(
      /** (id: Long, in_mis: Boolean) for EVERY vertex; undecided rows
        * (only when `converged` is false) report in_mis = false.
        */
      mis: DataFrame,
      rounds: Int,
      converged: Boolean
  )

  private[graft] def keyOf(id: Column, salt: String): Column =
    graft.text.TextOps.portableHash60(
      concat(id.cast("string"), lit(":" + salt)))

  /** Driver-side replica of [[keyOf]] — md5("id:salt") first 15 hex
    * digits as a nonneg 60-bit long, bit-identical to
    * [[graft.text.TextOps.portableHash60]] (15 hex digits = bytes 0–6
    * plus the high nibble of byte 7). Shared by the [[Mis]] and
    * [[Coloring]] local twins; pinned against the column expression by
    * `MisSpec`.
    */
  private[operators] def keyOfLocal(id: Long, salt: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest((id.toString + ":" + salt)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /** Compact local view of the symmetric simple graph + permutation keys
    * — the shared scaffolding of the [[Mis]]/[[Coloring]] local twins.
    */
  private[operators] final class LocalSym(graph: Graph, salt: String) {
    private val raw = graph.edges.collect()
    private val idToIdx = new java.util.HashMap[Long, Integer]()
    private val idsBuf = scala.collection.mutable.ArrayBuffer.empty[Long]
    private def idx(id: Long): Int = {
      val e = idToIdx.get(id)
      if (e != null) e.intValue()
      else { val i = idsBuf.length; idToIdx.put(id, i); idsBuf += id; i }
    }
    raw.foreach { e => idx(e.src); idx(e.dst) }
    val ids: Array[Long] = idsBuf.toArray
    val n: Int = ids.length
    lazy val key: Array[Long] = ids.map(keyOfLocal(_, salt)) // unused by the LP twin
    /** (key, id)-precedence: does a come strictly before b? */
    def before(a: Int, b: Int): Boolean =
      key(a) < key(b) || (key(a) == key(b) && ids(a) < ids(b))
    // CSR over distinct symmetric non-loop arcs
    val (off, nbr) = {
      val arcSet = scala.collection.mutable.HashSet.empty[(Int, Int)]
      raw.foreach { e =>
        if (e.src != e.dst) {
          val u = idx(e.src); val v = idx(e.dst)
          arcSet += ((u, v)); arcSet += ((v, u))
        }
      }
      val deg = new Array[Int](n)
      arcSet.foreach { case (u, _) => deg(u) += 1 }
      val o = new Array[Int](n + 1)
      var i = 0
      while (i < n) { o(i + 1) = o(i) + deg(i); i += 1 }
      val nb = new Array[Int](arcSet.size)
      val fill = java.util.Arrays.copyOf(o, n)
      arcSet.foreach { case (u, v) => nb(fill(u)) = v; fill(u) += 1 }
      (o, nb)
    }
  }

  def run(
      graph: Graph,
      salt: String = "",
      maxRounds: Int = 64,
      checkpoint: Option[CheckpointConfig] = None,
      verbose: Boolean = false,
      /** Opt-in bounded driver-local twin (the [[ConnectedComponents.run]]
        * cap pattern): when > 0, no checkpointing is requested, and the
        * arc count fits the budget (~16 B/arc collected), the Luby
        * local-minima rounds are simulated round-for-round on driver
        * arrays — the output is already a deterministic function of
        * (graph, salt) by the permutation-greedy equivalence, and the
        * simulation preserves `rounds`/`converged`/the maxRounds cutoff
        * exactly (pinned by `MisSpec`'s differential). Each distributed
        * round is ~5 tiny shuffles of pure job latency on a derived gate
        * graph. Default 0 = always distributed.
        */
      localFinishEdges: Long = 0L
  ): Result = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val spark = graph.spark
    import spark.implicits._

    if (localFinishEdges > 0 && checkpoint.isEmpty && graph.numEdges <= localFinishEdges) {
      val g = new LocalSym(graph, salt)
      val live = Array.fill(g.n)(true)
      val inMis = new Array[Boolean](g.n)
      var remaining = g.n.toLong
      var rounds = 0
      while (remaining > 0 && rounds < maxRounds) {
        // winners = live local minima of the (key, id) permutation
        val winner = new Array[Boolean](g.n)
        var i = 0
        while (i < g.n) {
          if (live(i)) {
            var isMin = true
            var p = g.off(i)
            while (isMin && p < g.off(i + 1)) {
              val u = g.nbr(p)
              if (live(u) && g.before(u, i)) isMin = false
              p += 1
            }
            winner(i) = isMin
          }
          i += 1
        }
        i = 0
        while (i < g.n) {
          if (live(i) && winner(i)) {
            inMis(i) = true; live(i) = false
            var p = g.off(i)
            while (p < g.off(i + 1)) { live(g.nbr(p)) = false; p += 1 }
          }
          i += 1
        }
        rounds += 1
        remaining = live.count(identity).toLong
      }
      val mis = spark.createDataFrame(
        spark.sparkContext.parallelize(
          (0 until g.n).map(i => (g.ids(i), inMis(i))),
          math.max(1, spark.sparkContext.defaultParallelism / 4)))
        .toDF("id", "in_mis")
      return Result(mis, rounds, converged = remaining == 0)
    }

    val ctx = new IterationContext("mis", checkpoint, verbose = verbose)
    var liveE = ctx.init(graph.symmetrize.edges.filter($"src" =!= $"dst").toDF())
    // Live vertices start as ALL vertices (isolated ones win round 1).
    var liveV = graph.vertices.toDF("id").localCheckpoint(true)
    val misParts = scala.collection.mutable.ArrayBuffer[DataFrame]()

    var rounds = 0
    var remaining = liveV.count()
    while (remaining > 0 && rounds < maxRounds) {
      // A vertex loses the round iff some live neighbor has a smaller
      // (key, id); winners are the permutation's live local minima.
      val losers = liveE
        .where(struct(keyOf($"dst", salt), $"dst") <
          struct(keyOf($"src", salt), $"src"))
        .select($"src".as("id")).distinct()
      val winners = liveV.join(losers, Seq("id"), "left_anti")
        .localCheckpoint(true)
      val removed = winners
        .union(liveE.join(winners.select($"id".as("src")), Seq("src"), "left_semi")
          .select($"dst".as("id")))
        .distinct()
      val nextV = liveV.join(removed, Seq("id"), "left_anti").localCheckpoint(true)
      val nextE = ctx.cut(
        liveE
          .join(nextV.select($"id".as("src")), Seq("src"), "left_semi")
          .join(nextV.select($"id".as("dst")), Seq("dst"), "left_semi")
          .select($"src", $"dst"))
      rounds += 1
      val cnt = nextV.count()
      nextE.count() // materialize the lazy cut BEFORE advance releases the old state
      liveE = ctx.advance(rounds, nextE,
        deltaNorm = (remaining - cnt).toDouble, messages = remaining,
        changed = remaining - cnt)
      graft.core.Lineage.release(liveV)
      misParts += winners
      liveV = nextV
      remaining = cnt
    }

    val misIds =
      if (misParts.isEmpty) spark.emptyDataset[Long].toDF("id")
      else misParts.reduce(_ union _)
    val mis = graph.vertices.toDF("id")
      .join(misIds.select($"id", lit(true).as("in_mis")), Seq("id"), "left")
      .select($"id", coalesce($"in_mis", lit(false)).as("in_mis"))
    ctx.close()
    Result(mis, rounds, converged = remaining == 0)
  }
}
