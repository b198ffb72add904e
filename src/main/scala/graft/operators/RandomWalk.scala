package graft.operators

import graft.core.{Graph, Lineage}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic hash-seeded random walks — the graph-embedding
  * training-data primitive (DeepWalk/node2vec corpora are exactly "a walk
  * per vertex, k hops"): from every vertex, `steps` hops where the hop
  * taken at node u on step t is sorted-successor index
  * `portableHash60(u ++ ":" ++ t) mod outdeg(u)`. Hash-seeded instead of
  * RNG-seeded so the walk set is reproducible across retries/stragglers
  * (a re-run task MUST emit the same walk — Spark recomputes lost
  * partitions from lineage) and replayable by the DuckDB oracle. Dead
  * ends absorb (the walk stays put), matching PageRank's dangling-mass
  * convention of never teleporting mid-walk.
  *
  * Scale shape: ONE equi-join per hop — state meets the chunk-sliced
  * adjacency ([[graft.core.AdjChunk]]) on the current vertex; every
  * chunk row carries the FULL out-degree, so the hop index
  * j = hash mod deg and its owning chunk (j/chunkSize, offset
  * j%chunkSize) are computed from the joined row itself, no separate
  * degree join. Non-hub vertices join exactly one chunk row; a
  * 10⁶-degree hub fans out to its chunk COUNT (deg/chunkSize narrow
  * rows, filtered to the one owning chunk) — never a hub-sized array
  * in the shuffle. State is (start, cur) = 16 bytes/walk. All `steps` hop
  * states stay checkpointed until the long-form output is materialized,
  * then every intermediate is released — peak pinned state is
  * (steps+1)·n·16 B, the output's own size.
  *
  * Output long-form: (start, step, node), step 0..steps — one walk per
  * vertex. For corpus generation (many walks per vertex), union runs
  * with distinct `salt`s mixed into the hash; per-walk cost is
  * unchanged.
  */
object RandomWalk {

  def run(graph: Graph, steps: Int, salt: String = ""): DataFrame = {
    require(steps >= 0)
    val spark = graph.spark
    import spark.implicits._

    val adjS = graph.adjacency.toDF().select(
      $"src".as("a_src"), $"deg".as("a_deg"),
      $"chunk".as("a_chunk"), $"dsts".as("a_dsts"))
    val chunkSize = graph.chunkSize.toLong

    val states = scala.collection.mutable.ArrayBuffer[DataFrame](
      graph.vertices.toDF("start")
        .select($"start", $"start".as("cur"))
        .localCheckpoint(true))

    for (t <- 1 to steps) {
      states += hopStep(states.last, adjS, chunkSize, t, salt).localCheckpoint(true)
    }
    val out = states.zipWithIndex
      .map { case (s, t) =>
        s.select($"start", lit(t.toLong).as("step"), $"cur".as("node"))
      }
      .reduce(_ unionByName _)
      .localCheckpoint(true)
    states.foreach(Lineage.release)
    out
  }

  /** node2vec-biased walks (Grover & Leskovec 2016): one walk per vertex,
    * hop 1 uniform (no predecessor yet — exactly [[hopStep]]), hops ≥ 2
    * biased by the 2nd-order weights w(x) = 1/p if x = prev (return),
    * 1 if x ∈ N(prev) (stay close), 1/q otherwise (explore). Selection is
    * deterministic: candidate successors of cur are ranked in dst order,
    * and the walk takes the first whose cumulative weight share exceeds
    * u = hash(start:prev:cur:step:salt)/2⁶⁰ — reproducible across
    * retries/stragglers and replayable by the oracle, like [[run]].
    *
    * Cross-engine exactness: with the default p = 2, q = 4 every weight
    * is a dyadic fraction (0.5 / 1.0 / 0.25), so cumulative sums are
    * EXACT doubles (no rounding ever) and the selection comparison
    * `cum > u·total` is bit-identical in any IEEE engine evaluating in
    * the same dst order — the gate compare needs no float tolerance.
    * Non-dyadic p/q still work but put the oracle one ulp from a
    * boundary; keep powers of two for gated runs.
    *
    * Scale shape per biased hop: candidates = state ⋈ adjacency(cur)
    * EXPLODED to one row per successor (node2vec inherently weights every
    * successor — the fan-out is Σ deg(frontier), the operator's true
    * cost); the N(prev) membership probe is an equi-join against the
    * (src, dst)-partitioned edge table (partitioned ONCE, reused every
    * hop — only the candidate stream shuffles); ranking is a per-walk
    * window cumsum (streams — a 10⁶-degree hub never materializes an
    * array) + a map-side-combined min. State stays (start, prev, cur) =
    * 24 B/walk.
    */
  def node2vec(graph: Graph, steps: Int, p: Double = 2.0, q: Double = 4.0,
               salt: String = ""): DataFrame = {
    require(steps >= 0)
    require(p > 0 && q > 0, s"p and q must be positive, got p=$p q=$q")
    val spark = graph.spark
    import spark.implicits._

    val adjS = graph.adjacency.toDF().select(
      $"src".as("a_src"), $"chunk".as("a_chunk"), $"dsts".as("a_dsts"))
    // Membership-probe side, partitioned by the join key ONCE so every
    // hop's probe reuses the exchange and only candidates shuffle.
    val nbE = graph.edges.toDF()
      .select($"src".as("nb_src"), $"dst".as("nb_dst"))
      .repartition($"nb_src", $"nb_dst")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val w0 = graph.vertices.toDF("start")
      .select($"start", $"start".as("prev"), $"start".as("cur"))
      .localCheckpoint(true)
    val states = scala.collection.mutable.ArrayBuffer[DataFrame](w0)
    if (steps >= 1) {
      // Hop 1 is the uniform hop: prev = the start vertex.
      val s1 = hopStep(w0.select($"start", $"cur"), // hopStep's expected shape
        graph.adjacency.toDF().select(
          $"src".as("a_src"), $"deg".as("a_deg"),
          $"chunk".as("a_chunk"), $"dsts".as("a_dsts")),
        graph.chunkSize.toLong, 1, salt)
        .select($"start", $"start".as("prev"), $"cur")
      states += s1.localCheckpoint(true)
    }
    for (t <- 2 to steps)
      states += biasedHop(states.last, adjS, nbE, p, q, t, salt).localCheckpoint(true)

    val out = states.zipWithIndex
      .map { case (s, t) =>
        s.select($"start", lit(t.toLong).as("step"), $"cur".as("node"))
      }
      .reduce(_ unionByName _)
      .localCheckpoint(true)
    states.foreach(Lineage.release)
    nbE.unpersist()
    out
  }

  /** One (lazy) biased hop plan, separated so `PlanSpec` can pin its
    * shape (no cartesian, no adjacency array crossing an exchange).
    */
  private[graft] def biasedHop(st: DataFrame, adjS: DataFrame, nbE: DataFrame,
                               p: Double, q: Double, t: Int, salt: String): DataFrame = {
    val spark = st.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window

    val cand = st
      .join(adjS, st("cur") === adjS("a_src"), "inner")
      .select($"start", $"prev", $"cur", explode($"a_dsts").as("x"))
    val weighted = cand
      .join(nbE, $"prev" === $"nb_src" && $"x" === $"nb_dst", "left")
      .select($"start", $"prev", $"cur", $"x",
        when($"x" === $"prev", lit(1.0 / p))
          .when($"nb_src".isNotNull, lit(1.0))
          .otherwise(lit(1.0 / q)).as("wt"))
    val u = graft.text.TextOps.portableHash60(
      concat($"start".cast("string"), lit(":"), $"prev".cast("string"),
        lit(":"), $"cur".cast("string"), lit(":" + salt + t.toString)))
      .cast("double") / lit(math.pow(2, 60))
    val byWalk = Window.partitionBy($"start")
    val sel = weighted
      .withColumn("cum",
        sum($"wt").over(byWalk.orderBy($"x")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot", sum($"wt").over(byWalk))
      .where($"cum" > u * $"tot")
      .groupBy($"start").agg(min($"x").as("nxt"))
    st.join(sel, Seq("start"), "left")
      .select($"start", $"cur".as("prev"), coalesce($"nxt", $"cur").as("cur"))
  }

  /** One (lazy) hop plan: one left join on the current vertex; each chunk
    * row knows the full degree, so the hop index and its owning chunk are
    * derived in-row and the non-owning chunk rows of hubs are filtered
    * out. Dead ends (no adjacency row at all) keep a_src null and absorb.
    * Separate from the checkpointing loop so `PlanSpec` can pin the
    * one-exchange-per-hop shape.
    */
  private[graft] def hopStep(st: DataFrame, adjS: DataFrame, chunkSize: Long,
                             t: Int, salt: String): DataFrame = {
    val spark = st.sparkSession
    import spark.implicits._
    val h = graft.text.TextOps.portableHash60(
      concat($"cur".cast("string"), lit(":"), lit(salt + t.toString)))
    st
      .join(adjS, st("cur") === adjS("a_src"), "left")
      .withColumn("j", (h % $"a_deg")) // a_deg >= 1 on every chunk row
      .where($"a_src".isNull
        || ($"j" / chunkSize).cast("long") === $"a_chunk".cast("long"))
      .select($"start",
        coalesce(
          element_at($"a_dsts", ($"j" % chunkSize).cast("int") + 1),
          $"cur").as("cur"))
  }
}
