package graft.operators

import graft.core.Lineage
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pointer-doubling chain resolution — the redirect/canonical-alias
  * resolver of a crawl ingest: given a partial function `next` as a
  * (src, next) mapping (HTTP 301 targets, rel=canonical pointers, URL
  * alias records), resolve every source to its chain TERMINAL (the first
  * node with no outgoing pointer) plus the hop count.
  *
  * The naive resolver walks one hop per round — O(L) shuffles for chain
  * length L, and a single pathological 10⁴-hop redirect loop-free chain
  * (they exist in real crawls) costs 10⁴ jobs. Pointer doubling
  * (Wyllie's list-ranking step; cf. the shortcutting in Kiveris et al.
  * "Connected Components in MapReduce" — the same halving argument) keeps
  * a total map P_t: x → f^(2^t)(x) and squares it each round:
  * P_{t+1}(x) = P_t(P_t(x)), ONE self-equi-join keyed by the current
  * pointer per round, so ~log2 L rounds resolve every chain (a row
  * completes within one round of its hop total reaching its terminal
  * distance). At 100 TB the mapping is sharded by src hash; each round
  * shuffles only (src, ptr, hops) triples — 24 B/row regardless of chain
  * shape.
  *
  * Resolved rows LEAVE the iterated state: each round splits the live
  * rows into newly-done (checkpointed once, appended to the result
  * fragments, never rewritten) and still-live (the only rows the next
  * round re-checkpoints). The per-round join still needs the done
  * fragments on its build side — a live row may jump through an
  * already-resolved one and inherit its total hops — but they are read
  * from their one-time checkpoint, not rewritten. On a mapping dominated
  * by short chains plus a few redirect loops, per-round cost decays with
  * the live count instead of staying corpus-sized.
  *
  * Cycles (redirect loops): a cycle has no terminal; its members converge
  * to a fixed 2^t-step rotation and would double forever. `maxRounds`
  * bounds the loop; rows still live at the bound are reported with
  * `resolved = false` (hops = the 2^t lower bound) — the honest crawl-ops
  * answer ("flag the loop"), not an infinite job.
  *
  * Output: (src, final, hops, resolved) for every src in the mapping.
  */
object PointerJump {

  def resolve(mapping: DataFrame, maxRounds: Int = 20): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")

    // P_0 = one application of `next`: ptr = next(src), hops = 1.
    // Terminals never appear as srcs, so lookups against P for a terminal
    // miss — the left join's null marks "ptr is terminal, stop".
    var live = mapping
      .select(col("src"), col("next").as("ptr"), lit(1L).as("hops"))
      .localCheckpoint(true)
    val doneParts = scala.collection.mutable.ArrayBuffer[DataFrame]()

    var round = 0
    var remaining = live.count()
    while (remaining > 0 && round < maxRounds) {
      // P(x) ← P(P(x)): jump through the full map — still-live rows
      // advance the pointer 2^t steps; done rows carry TOTAL hops, so
      // jumping through one finishes the jumper too.
      val build = (doneParts.toSeq.map(_.withColumn("j_done", lit(true)))
        :+ live.withColumn("j_done", lit(false)))
        .map(_.select(col("src").as("j_src"), col("ptr").as("j_ptr"),
          col("hops").as("j_hops"), col("j_done")))
        .reduce(_ unionByName _)
      val stepped = live
        .join(build, live("ptr") === build("j_src"), "left")
        .select(
          col("src"),
          coalesce(col("j_ptr"), col("ptr")).as("ptr"),
          (col("hops") + coalesce(col("j_hops"), lit(0L))).as("hops"),
          // done: the ptr is itself a terminal (no map row at all), or
          // the jumped-through row already reached one.
          (col("j_src").isNull || col("j_done")).as("done"))
        .localCheckpoint(true)
      val newlyDone = stepped.filter(col("done"))
        .select(col("src"), col("ptr"), col("hops")).localCheckpoint(true)
      val nextLive = stepped.filter(!col("done"))
        .select(col("src"), col("ptr"), col("hops")).localCheckpoint(true)
      Lineage.release(stepped)
      Lineage.release(live)
      if (!newlyDone.isEmpty) doneParts += newlyDone
      live = nextLive
      round += 1
      remaining = live.count()
    }
    (doneParts.toSeq.map(_.withColumn("resolved", lit(true)))
      :+ live.withColumn("resolved", lit(false)))
      .map(_.select(col("src"), col("ptr").as("final"), col("hops"),
        col("resolved")))
      .reduce(_ unionByName _)
  }
}
