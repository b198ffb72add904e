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
  * pointer per round, so ceil(log2 L) shuffles resolve every chain. At
  * 100 TB the mapping is sharded by src hash; each round shuffles only
  * (src, ptr, hops) triples — 24 B/row regardless of chain shape.
  *
  * Cycles (redirect loops): a cycle has no terminal; its members converge
  * to a fixed 2^t-step rotation and would double forever. `maxRounds`
  * bounds the loop; rows still changing at the bound are reported with
  * `resolved = false` (hops = the 2^t lower bound) — the honest crawl-ops
  * answer ("flag the loop"), not an infinite job.
  *
  * Output: (src, final, hops, resolved) for every src in the mapping.
  */
object PointerJump {

  def resolve(mapping: DataFrame, maxRounds: Int = 20): DataFrame = {
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val spark = mapping.sparkSession

    // P_0 = one application of `next`: ptr = next(src), hops = 1.
    // Terminals never appear as srcs, so lookups against P for a terminal
    // miss — the left join's null marks "ptr is terminal, stop".
    var p = mapping
      .select(col("src"), col("next").as("ptr"), lit(1L).as("hops"),
        lit(false).as("done"))
      .localCheckpoint(true)

    var round = 0
    var remaining = p.filter(!col("done")).count()
    while (remaining > 0 && round < maxRounds) {
      // P(x) ← P(P(x)): rows whose ptr has its own P-row jump 2^t steps;
      // rows whose ptr is terminal (no P-row) are done. Already-done rows
      // pass through untouched — they stay in the state so the output is
      // total, but the join's build side only grows with live rows.
      val jump = p.select(col("src").as("j_src"), col("ptr").as("j_ptr"),
        col("hops").as("j_hops"), col("done").as("j_done"))
      val next = p
        .join(jump, p("ptr") === jump("j_src") && !p("done"), "left")
        .select(
          col("src"),
          coalesce(col("j_ptr"), col("ptr")).as("ptr"),
          (col("hops") + coalesce(col("j_hops"), lit(0L))).as("hops"),
          // done: the ptr is itself a terminal (no P-row at all), or the
          // jumped-through row already reached one (its hops are total).
          (col("done") || col("j_src").isNull
            || coalesce(col("j_done"), lit(false))).as("done"))
        .localCheckpoint(true)
      Lineage.release(p)
      p = next
      round += 1
      remaining = p.filter(!col("done")).count()
    }
    val out = p.select(col("src"), col("ptr").as("final"), col("hops"),
      col("done").as("resolved"))
    out
  }
}
