package graft.operators

import graft.core.{CheckpointConfig, Graph, IterationContext, SuperstepMetrics}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Modularity-optimizing community detection by synchronous Louvain
  * local moving (Blondel et al. 2008, level-1 move phase) with the two
  * devices parallel implementations use against synchronous swap
  * cycles:
  *
  *  - Grappolo's minimum-label rule (Lu, Halappanavar, Kalyanaraman
  *    2015 §4.1): a vertex v may move into a SINGLETON community only
  *    if its lone member's id is smaller than v. This kills the
  *    singleton–singleton swap (two adjacent singletons electing each
  *    other forever — e.g. the single edge (1,3), where both vertices
  *    would otherwise trade labels every round and never merge);
  *  - parity alternation: round r may move only vertices with (id + r)
  *    even. NOT a proper coloring (same-parity neighbors still move
  *    together — odd cycles admit none), but it halves simultaneous-
  *    move conflicts among non-singleton communities, where a
  *    transient joint move is harmless because the singleton rule
  *    anchors every merge.
  *
  * Complements [[LabelPropagation]]: LP maximizes label agreement,
  * Louvain maximizes MODULARITY — the difference shows on hub-heavy
  * web graphs where LP collapses into one giant label.
  *
  * Semantics (deterministic — required for oracle/golden parity):
  *  - unit arc weights on the simple symmetrized graph (self-loops
  *    dropped, duplicate arcs collapsed); every vertex starts in its
  *    own singleton community;
  *  - each round, every ELIGIBLE vertex i (parity above) moves to the
  *    community c among its neighbors' current communities ∪ {own}
  *    maximizing the exact-integer move score
  *      score2(c) = A·k(i,c) − deg(i) · (vol(c) − [c = comm(i)]·deg(i))
  *    where A = 2m = |sym arcs|, k(i,c) = arcs from i into c, vol(c) =
  *    Σ deg over members. This is the standard ΔQ numerator scaled by
  *    2m² (positive constant — same argmax), kept in decimal(38,0) so
  *    the comparison is EXACT at any scale (A·k overflows i64 around
  *    10¹⁹; no float argmax can flip on an engine's summation order);
  *    ties broken by the SMALLEST community id;
  *  - fixed round count; an even count gives both parity classes equal
  *    turns. Vertices with no neighbors keep their community.
  *
  * Scale shape: per round ONE arcs ⋈ state gather (the k(i,c) count,
  * map-side combined — the same O(E) shuffle as LP's vote step), an
  * O(V) volume aggregate, and an O(neighbor-communities) candidate
  * equi-join; state is one (id, comm) row per vertex, no per-vertex
  * adjacency arrays, no driver state. The argmax is a min_by over
  * (−score, comm) — associative partial aggregation, never a window
  * over the corpus.
  *
  * Reference: webgraph-algo-rs ships LLP-family clustering in the
  * webgraph crate (cited at `src/algo/sccs/mod.rs:43`); Louvain is the
  * modularity member of that community-detection family.
  */
object Louvain {

  final case class Result(
      /** (id: Long, comm: Long) for EVERY vertex. */
      labels: DataFrame,
      rounds: Int,
      history: Seq[SuperstepMetrics]
  )

  def run(
      graph: Graph,
      rounds: Int = 4,
      checkpoint: Option[CheckpointConfig] = None,
      verbose: Boolean = false,
      /** Opt-in bounded driver-local twin (the [[ConnectedComponents.run]]
        * cap pattern): when > 0, no checkpointing is requested, and the
        * arc count fits the budget (~16 B/arc collected), the synchronous
        * move rounds run on driver arrays — every quantity in the move
        * score is an exact integer (A·k − deg·vol fits i64 far beyond the
        * cap) and ties break on the smallest community id, so the result
        * is bit-identical to the distributed rounds by determinism, not
        * by luck (pinned by `LouvainSpec`'s differential). Each
        * distributed round is ~7 tiny shuffles of pure job latency on a
        * derived gate graph. Default 0 = always distributed.
        */
      localFinishEdges: Long = 0L
  ): Result = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = graph.spark
    import spark.implicits._

    if (localFinishEdges > 0 && checkpoint.isEmpty && graph.numEdges <= localFinishEdges)
      return runLocal(graph, rounds)

    val sym = graph.symmetrize.edges.filter($"src" =!= $"dst").toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val arcsTotal = sym.count() // A = 2m
    // Degrees over ALL vertices (a vertex seen only in self-loops has
    // simple degree 0 and can never move — its own community is its
    // only candidate).
    val deg = graph.vertices.toDF("id")
      .join(sym.groupBy($"src".as("id")).agg(count(lit(1)).as("deg")), Seq("id"), "left")
      .select($"id", coalesce($"deg", lit(0L)).as("deg"))
      .localCheckpoint(true)

    val ctx = new IterationContext("louvain", checkpoint, verbose = verbose, suspendAdaptive = true)
    try {
      val resumed = ctx.resume(spark)
      var state = resumed.map(_._1).getOrElse {
        ctx.init(deg.select($"id", $"id".as("comm")))
      }
      var round = resumed.map(_._2).getOrElse(0)

      while (round < rounds) {
        round += 1
        val next = ctx.cut(moveRound(sym, deg, arcsTotal, state, round))
        val row = next.agg(sum(when($"didChange", 1L).otherwise(0L))).head()
        val changed = if (row.isNullAt(0)) 0L else row.getLong(0)
        state = ctx.advance(round, next.select($"id", $"comm"),
          deltaNorm = changed.toDouble, messages = arcsTotal, changed = changed)
      }

      sym.unpersist()
      graft.core.Lineage.release(deg)
      ctx.close()
      Result(state.select($"id", $"comm"), round, ctx.history.toSeq)
    } finally ctx.restoreAqe()
  }

  /** The driver-local twin of the synchronous move rounds: identical
    * semantics by construction — same symmetric simple arc set, same
    * parity eligibility (floorMod, matching `pmod`), same exact-integer
    * score, same (score desc, comm asc) winner, same Grappolo singleton
    * admissibility — over compact arrays instead of per-round shuffles.
    */
  private def runLocal(graph: Graph, rounds: Int): Result = {
    val spark = graph.spark
    import spark.implicits._
    val raw = graph.edges.collect()
    // vertex universe: every endpoint (self-loop-only vertices included —
    // they have simple degree 0 and never move, like the distributed path)
    val idToIdx = new java.util.HashMap[Long, Integer]()
    val idsBuf = scala.collection.mutable.ArrayBuffer.empty[Long]
    def idx(id: Long): Int = {
      val e = idToIdx.get(id)
      if (e != null) e.intValue()
      else { val i = idsBuf.length; idToIdx.put(id, i); idsBuf += id; i }
    }
    raw.foreach { e => idx(e.src); idx(e.dst) }
    val n = idsBuf.length
    val ids = idsBuf.toArray
    // symmetric simple arcs, deduplicated
    val arcSet = scala.collection.mutable.HashSet.empty[(Int, Int)]
    raw.foreach { e =>
      if (e.src != e.dst) {
        val u = idx(e.src); val v = idx(e.dst)
        arcSet += ((u, v)); arcSet += ((v, u))
      }
    }
    val arcsTotal = arcSet.size.toLong // A = 2m
    val deg = new Array[Long](n)
    arcSet.foreach { case (u, _) => deg(u) += 1 }
    // CSR over symmetric arcs
    val off = new Array[Int](n + 1)
    var i = 0
    while (i < n) { off(i + 1) = off(i) + deg(i).toInt; i += 1 }
    val nbr = new Array[Int](arcsTotal.toInt)
    val fill = java.util.Arrays.copyOf(off, n)
    arcSet.foreach { case (u, v) => nbr(fill(u)) = v; fill(u) += 1 }

    var comm = Array.tabulate(n)(i => i) // communities carry VERTEX ids; track as idx
    val history = scala.collection.mutable.ArrayBuffer.empty[SuperstepMetrics]
    var round = 0
    while (round < rounds) {
      round += 1
      // community stats under the CURRENT labels
      val vol = new Array[Long](n)
      val csize = new Array[Long](n)
      val cmin = Array.fill(n)(Long.MaxValue)
      i = 0
      while (i < n) {
        val c = comm(i)
        vol(c) += deg(i); csize(c) += 1
        if (ids(i) < cmin(c)) cmin(c) = ids(i)
        i += 1
      }
      val next = comm.clone()
      var changed = 0L
      val k = new java.util.HashMap[Integer, Long]()
      i = 0
      while (i < n) {
        if (java.lang.Math.floorMod(ids(i) + round.toLong, 2L) == 0L) {
          k.clear()
          var p = off(i)
          while (p < off(i + 1)) { val c = comm(nbr(p)); k.merge(c, 1L, _ + _); p += 1 }
          val own = comm(i)
          k.putIfAbsent(own, 0L)
          var bestComm = -1
          var bestCommId = Long.MaxValue
          var bestScore = Long.MinValue
          val it = k.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            val c = e.getKey.intValue()
            // Grappolo singleton rule (staying put always admissible)
            val admissible = c == own || !(csize(c) == 1L && cmin(c) > ids(i))
            if (admissible) {
              val score = arcsTotal * e.getValue -
                deg(i) * (vol(c) - (if (c == own) deg(i) else 0L))
              val cId = ids(c)
              if (score > bestScore || (score == bestScore && cId < bestCommId)) {
                bestScore = score; bestComm = c; bestCommId = cId
              }
            }
          }
          if (bestComm >= 0 && bestComm != own) { next(i) = bestComm; changed += 1 }
        }
        i += 1
      }
      comm = next
      history += SuperstepMetrics(round, changed.toDouble, arcsTotal, changed, 1.0, 0L)
    }
    val labels = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0 until n).map(i => (ids(i), ids(comm(i)))),
        math.max(1, spark.sparkContext.defaultParallelism / 4)))
      .toDF("id", "comm")
    Result(labels, rounds, history.toSeq)
  }

  /** One synchronous move round over `state` (id, comm) → the NEXT state
    * (id, comm, didChange), UNCUT — [[run]] cuts it per superstep;
    * `PlanSpec` explains it directly (a cut frame's plan is just the
    * checkpoint scan, which would make any plan assertion vacuous).
    */
  private[graft] def moveRound(
      sym: DataFrame,
      deg: DataFrame,
      arcsTotal: Long,
      state: DataFrame,
      round: Int): DataFrame = {
    val spark = state.sparkSession
    import spark.implicits._
    val dec = "decimal(38,0)"
    // k(i, c): arcs from i into community c under the CURRENT labels.
    // Gather through the arc table exactly like LP's vote step: the
    // (id, comm) state is the only iterating side.
    val kic = sym
      .join(state.select($"id".as("dst"), $"comm"), Seq("dst"))
      .groupBy($"src".as("id"), $"comm")
      .agg(count(lit(1)).as("k"))
    // Per-community volume (Σ deg), size, and min member id in ONE O(V)
    // aggregate; size/min feed the Grappolo singleton rule.
    val stats = state.join(deg, Seq("id"))
      .groupBy($"comm")
      .agg(sum($"deg").as("vol"), count(lit(1)).as("csize"), min($"id").as("cmin"))
    // Candidates = neighbor communities ∪ the vertex's own (k = 0 when
    // no internal arc); max() keeps the real k where both rows exist.
    // Only this round's parity class recomputes — everyone else
    // carries their community forward unchanged.
    val cand = kic
      .union(state.select($"id", $"comm", lit(0L).as("k")))
      .where(pmod($"id" + lit(round.toLong), lit(2L)) === 0)
      .groupBy($"id", $"comm").agg(max($"k").as("k"))
    val scored = cand
      .join(stats, Seq("comm"), "left") // own singleton of a deg-0 vertex has no stats row
      .join(deg, Seq("id"))
      .join(state.select($"id", $"comm".as("own")), Seq("id"))
      // Grappolo minimum-label rule: moving INTO a singleton community is
      // admissible only when its lone member's id is smaller than the
      // mover's (staying put is always admissible).
      .where($"comm" === $"own" ||
        !(coalesce($"csize", lit(1L)) === 1L && coalesce($"cmin", $"id") > $"id"))
      .select($"id", $"comm",
        (lit(arcsTotal).cast(dec) * $"k".cast(dec)
          - $"deg".cast(dec) * (coalesce($"vol", lit(0L)).cast(dec)
            - when($"comm" === $"own", $"deg").otherwise(lit(0L)).cast(dec)))
          .as("score"))
    val winner = scored
      .groupBy($"id")
      .agg(min_by($"comm", struct((-$"score").as("negScore"), $"comm")).as("newComm"))
    state.join(winner, Seq("id"), "left")
      .select($"id", coalesce($"newComm", $"comm").as("comm"),
        (coalesce($"newComm", $"comm") =!= $"comm").as("didChange"))
  }
}
