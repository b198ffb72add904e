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
