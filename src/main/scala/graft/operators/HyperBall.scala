package graft.operators

import graft.core.{Graph, IterationContext, SuperstepMetrics}
import graft.functions.Hll
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HyperBall (Boldi–Vigna): per-vertex HyperLogLog counters of the ball
  * of radius t, iterated to stability; neighbourhood function and
  * geometric centralities accumulated from per-iteration count deltas.
  *
  * Reference: `/root/reference/src/algo/hyperball/hyperball_impl.rs`
  *  - update rule c'(v) = c(v) ∪ ⋃_{(v,w)∈E} c(w)   (:1034-1049)
  *  - NF(t) = Σ_v count(c_t(v)); stop when no counter modified, or after
  *    iteration 3 when NF(t)/NF(t−1) < 1+threshold                 (:559-578)
  *  - Σd += Δcount·t and Σ1/d += Δcount/t per iteration            (:1072-1094)
  *  - derived: closeness = 1/Σd, harmonic = Σ1/d, lin = count²/Σd
  *    (isolated → 1), nieminen = count² − Σd                       (:633-757)
  *
  * Dataflow: one superstep = push each vertex's sketch to its in-neighbors
  * through the TRANSPOSE adjacency (the reference materializes transposes
  * rather than reverse-lookup, `/root/reference/src/main.rs:46`), merge
  * per target (register-wise max — associative ⇒ map-side partial merge),
  * then merge with the vertex's own sketch. The reference's SYSTOLIC mode
  * (gather only from counters that changed last round, switched on when
  * modified < n/4, :795-796) maps to driving the push from the changed
  * subset — exact, because an unchanged successor's sketch is already
  * contained in the target's sketch from the previous round. Its
  * local-mode distinction collapses into the same plan (AQE broadcasts
  * the tiny changed-set automatically).
  *
  * Merges are idempotent/commutative/associative, so results are
  * BIT-IDENTICAL to a sequential run — asserted in HyperBallSpec the
  * same way the reference asserts par-vs-seq equality (:1263-1322).
  */
object HyperBall {

  final case class Result(
      /** (id, registers, reachable, sumDist, sumInvDist,
        *  closeness, harmonic, lin, nieminen)
        */
      stats: DataFrame,
      /** NF(t) for t = 0..iterations. */
      neighbourhoodFunction: Seq[Double],
      iterations: Int,
      history: Seq[SuperstepMetrics]
  )

  def run(
      graph: Graph,
      log2m: Int = 6,
      threshold: Double = 0.0,
      maxIter: Int = 100,
      seed: Long = 42L,
      verbose: Boolean = false,
      /** Optional node weights (id, weight int): weight w seeds the
        * counter with w distinct elements instead of the node's own id —
        * the reference's weighted init (`hyperball_impl.rs:1167-1174`;
        * default = add own id, `:1176-1178`).
        */
      weights: Option[DataFrame] = None,
      /** Optional discount function f(t): accumulates Σ_v Σ_t Δcount·f(t)
        * per vertex — the reference's `discounted_centrality`
        * (`hyperball_impl.rs:744-757`). Evaluated on the driver per
        * iteration (t is a scalar), applied as a literal column.
        */
      discount: Option[Int => Double] = None,
      /** Use the Java-webgraph-parity Jenkins hash instead of splitmix64
        * ([[graft.functions.HllLogic.hashJenkins]]): with seed 42 this is
        * the configuration of the reference's Java-golden tests
        * (`tests/test_hyperball.rs:23-172`), making a run replayable
        * against those goldens if a decodable graph is available. Every
        * statistical guarantee is hash-agnostic; results differ only in
        * which registers each vertex hashes to.
        */
      jenkinsHash: Boolean = false
  ): Result = {
    val spark = graph.spark
    import spark.implicits._

    val n = graph.numVertices
    val tAdj = graph.transposeAdjacency
    val systolicThreshold = n / 4 // reference hyperball_impl.rs:795-796

    val ctx = new IterationContext("hyperball", verbose = verbose, suspendAdaptive = true)
    try {
      // state: (id, regs, cnt, sumDist, sumInvDist, modified)
      // Weighted init: weight w ⇒ w distinct seeded elements per counter
      // (hash(id·2^20 + i) for i<w); default init = the node's own id.
      val initRegs = weights match {
        case None =>
          graph.vertices.toDF("id")
            .select($"id", Hll.hllInit(log2m, seed, jenkinsHash)($"id").as("regs"))
        case Some(w) =>
          // Seeded element = (id << shift) + slot must be INJECTIVE over
          // (id, slot): a fixed 2^20 slot space silently aliases vertex
          // id's elements with vertex id+1's once any weight ≥ 2^20
          // (undercounting every union). Size the slot field to the actual
          // max weight (one agg over the small weights table) and verify
          // the id field still fits.
          val wCast = w.select(col("id"), col("weight").cast("long").as("weight"))
          val maxW = Option(wCast.agg(max($"weight")).head().get(0))
            .map(_.asInstanceOf[Long]).getOrElse(1L)
          val shift = math.max(20, 64 - java.lang.Long.numberOfLeadingZeros(math.max(maxW - 1, 1)))
          require(shift <= 62 && n <= (1L << (62 - shift)),
            s"weighted init: maxWeight=$maxW needs $shift slot bits; " +
              s"$n vertices no longer fit the id field without aliasing")
          // weight stays LONG through the explode: a re-cast to int here
          // would wrap weights >= 2^31 negative, and the weight>0 filter
          // would then silently hand the vertex an empty counter instead of
          // failing the require above (sequence() accepts long bounds).
          val seeded = graph.vertices.toDF("id")
            .join(wCast, Seq("id"), "left")
            .select($"id", coalesce($"weight", lit(1L)).as("weight"))
            .filter($"weight" > 0)
            .select($"id", explode(sequence(lit(0L), $"weight" - 1)).as("slot"))
            .select($"id",
              Hll.hllInit(log2m, seed, jenkinsHash)(shiftleft($"id", shift) + $"slot").as("r"))
            .groupBy($"id").agg(Hll.hllMergeAgg($"r").as("regs"))
          // weight-0 vertices get an EMPTY counter (reference semantics)
          graph.vertices.toDF("id")
            .join(seeded, Seq("id"), "left")
            .select($"id", coalesce($"regs", lit(graft.functions.HllLogic.empty(log2m))).as("regs"))
      }
      // cnt MUST be the sketch's own estimate (≈1.000122 for one element at
      // log2m=12), not literal 1.0 — otherwise unchanged vertices see a
      // phantom count delta on iteration 1 and accumulate bogus sumDist.
      var state = ctx.init(
        initRegs
          .select($"id", $"regs",
            Hll.hllCount($"regs").as("cnt"),
            lit(0.0).as("sumDist"),
            lit(0.0).as("sumInvDist"),
            lit(0.0).as("sumDiscounted"),
            lit(true).as("modified")))

      // NF(0) = sum of the INITIAL counter estimates: ≈n for default init,
      // but weighted init seeds w(v) elements, so the literal n would skew
      // both the neighbourhood function and the relInc early-stop ratio.
      val nf0 = state.agg(sum($"cnt")).head() match {
        case r if r.isNullAt(0) => 0.0
        case r => r.getDouble(0)
      }
      val nf = scala.collection.mutable.ArrayBuffer[Double](nf0)
      var modified = n
      var iter = 0
      var done = false

      while (!done && modified > 0 && iter < maxIter) {
        iter += 1
        // Systolic: only changed counters can contribute new elements.
        val sources =
          if (modified < systolicThreshold) state.filter($"modified") else state
        val gathered = tAdj
          .join(sources.select($"id".as("src"), $"regs"), Seq("src"))
          .select(explode($"dsts").as("id"), $"regs")
          .groupBy($"id")
          .agg(Hll.hllMergeAgg($"regs").as("gregs"))

        val fT = discount.map(f => f(iter)).getOrElse(0.0)
        val next = state
          .join(gathered, Seq("id"), "left")
          .select(
            $"id",
            Hll.hllMerge2($"regs", $"gregs").as("regs"),
            $"regs".as("prevRegs"), $"cnt".as("prevCnt"),
            $"sumDist", $"sumInvDist", $"sumDiscounted")
          .select(
            $"id", $"regs",
            Hll.hllCount($"regs").as("cnt"),
            $"prevCnt", $"sumDist", $"sumInvDist", $"sumDiscounted",
            ($"regs" =!= $"prevRegs").as("modified"))
          // Only POSITIVE count deltas accumulate (hyperball_impl.rs:1073-
          // 1089 `if delta > 0.0`, matching Java HyperBall): the union can
          // only grow the true ball, so a dip in the ESTIMATE is
          // approximation noise, and subtracting it would let one node's
          // register flicker push sumDist measurably off the Java goldens
          // (observed 12% on cnr-2000 before this clamp).
          .select(
            $"id", $"regs", $"cnt",
            greatest($"cnt" - $"prevCnt", lit(0.0)).as("delta"),
            $"sumDist", $"sumInvDist", $"sumDiscounted", $"modified")
          .select(
            $"id", $"regs", $"cnt",
            ($"sumDist" + $"delta" * iter).as("sumDist"),
            ($"sumInvDist" + $"delta" / iter).as("sumInvDist"),
            ($"sumDiscounted" + $"delta" * fT).as("sumDiscounted"),
            $"modified")
        val cutNext = ctx.cut(next)

        val row = cutNext.agg(
          sum(when($"modified", 1L).otherwise(0L)),
          sum($"cnt")).head()
        modified = if (row.isNullAt(0)) 0L else row.getLong(0)
        if (modified > 0) {
          // NF is monotone by definition; enforce like the reference (:919-928).
          // No entry when nothing changed: the final stabilization check is
          // not a new radius (NF(t) is defined up to the last growth).
          val rawNf = if (row.isNullAt(1)) 0.0 else row.getDouble(1)
          nf += math.max(rawNf, nf.last)
        }
        val relInc = nf.last / nf(math.max(nf.length - 2, 0))
        state = ctx.advance(iter, cutNext, deltaNorm = relInc - 1,
          messages = graph.numEdges, changed = modified)

        if (modified == 0 || (iter > 3 && threshold > 0 && relInc < 1 + threshold))
          done = true
      }

      ctx.close()
      val stats = state.select(
        $"id", $"regs",
        $"cnt".as("reachable"),
        $"sumDist", $"sumInvDist",
        when($"sumDist" > 0, lit(1.0) / $"sumDist").otherwise(0.0).as("closeness"),
        $"sumInvDist".as("harmonic"),
        when($"sumDist" > 0, $"cnt" * $"cnt" / $"sumDist").otherwise(1.0).as("lin"),
        ($"cnt" * $"cnt" - $"sumDist").as("nieminen"),
        $"sumDiscounted".as("discounted"))
      Result(stats, nf.toSeq, iter, ctx.history.toSeq)
    } finally ctx.restoreAqe()
  }
}
