package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

import scala.collection.mutable.ArrayBuffer

/** Per-superstep iteration metrics — the Spark analogue of the reference's
  * progress logging threaded through every algorithm
  * (`/root/reference/src/algo/sccs/tarjan.rs:18-20`), extended with the
  * north-rule metrics: delta-norm, messages shuffled, skew ratio.
  */
final case class SuperstepMetrics(
    iteration: Int,
    /** Algorithm-defined convergence norm (e.g. PageRank L1 delta). */
    deltaNorm: Double,
    /** Rows that crossed the shuffle this superstep (gather messages). */
    messages: Long,
    /** Vertices whose state changed this superstep. */
    changed: Long,
    /** max/mean rows per partition of the new state (1.0 = even). */
    skewRatio: Double,
    wallMs: Long
)

final case class CheckpointConfig(dir: String, every: Int = 1)

/** Driver-side superstep loop support shared by all iterative operators:
  * cuts lineage every superstep, commits state to the snapshot table layer
  * (making any run resumable mid-iteration), and records metrics.
  *
  * Lineage policy: iterative dataflows reference the previous state more
  * than once per superstep, so the raw logical plan grows EXPONENTIALLY
  * with iteration count (persist caches data but never truncates the
  * plan). Operators therefore pass every new state through
  * [[IterationContext.cut]], which replaces the plan with a
  * constant-size scan: `localCheckpoint` in-process, or a re-read of the
  * committed snapshot when the durable table layer is configured (the
  * cluster-reliable variant — executor loss cannot lose local
  * checkpoint blocks).
  *
  * This is the Spark-native replacement for the reference's visit
  * framework + `IterationContext` (`/root/reference/src/algo/hyperball/
  * hyperball_impl.rs:413-461`): the mechanics of iteration (double
  * buffering, temp-state spill, progress, resumability) live here; each
  * operator supplies only the per-superstep dataflow.
  */
final class IterationContext(
    name: String,
    checkpoint: Option[CheckpointConfig] = None,
    /** Prefer re-reading the durable snapshot (instead of local
      * checkpoint blocks) every N committed supersteps.
      */
    durableCutEvery: Int = 8,
    verbose: Boolean = false,
    /** Suspend AQE for the loop's lifetime — see [[savedAqe]]. Right for
      * STABLE-state loops (rank family: state cardinality and join
      * shapes never change, so adaptivity is pure per-superstep
      * overhead — measured ~35-40%/iter on PageRank). WRONG for
      * shrinking-state loops (CC pointer jumping, peels): there AQE's
      * runtime broadcast-join conversion is load-bearing as the live
      * side shrinks under the broadcast threshold (measured: g_cc_incr
      * 26 → 68 s with AQE suspended in CC).
      */
    suspendAdaptive: Boolean = false
) {

  private var prev: Option[DataFrame] = None
  /** The caller-provided initial/resumed state. Its plan may embed
    * checkpointed inputs the CALLER owns (e.g. a DenseIds vertex map the
    * caller joins against after the loop), so when it is superseded only
    * its own persist is dropped — [[Lineage.release]] walking its plan
    * would unpersist those caller blocks and break any later read
    * (observed: i_host_rank's post-loop hostname join lost the DenseIds
    * checkpoint). States built by [[cut]] are rooted AT their checkpoint
    * RDD, so releasing them touches exactly the context-owned blocks.
    */
  private var initial: Option[DataFrame] = None
  private var iterStartMs: Long = System.currentTimeMillis()
  val history: ArrayBuffer[SuperstepMetrics] = ArrayBuffer.empty

  /** AQE is suspended for the loop's lifetime (saved at [[init]]/
    * [[resume]], restored by [[close]] — nesting restores like a stack).
    * Superstep plans are hand-shaped (shuffle partitions fixed, SHJ
    * pinned, state size known and stable), so adaptive execution buys
    * nothing here and its per-superstep costs — replanning every job,
    * QueryStage materialization barriers at each exchange, coalesce
    * decisions that can shrink parallelism below the core count — are
    * pure per-iteration overhead. Measured (interleaved A/B, local[8],
    * 4M-node/16.9M-arc PageRank, 9 fixed iters, same box): 3.63/3.64
    * s/iter median without AQE vs 5.08/5.98 with — ~35-40% faster.
    * Ad-hoc relational queries keep AQE: it is saved/restored, not
    * turned off globally.
    */
  private var savedAqe: Option[String] = None

  private def suspendAqe(spark: org.apache.spark.sql.SparkSession): Unit =
    if (suspendAdaptive && savedAqe.isEmpty) {
      savedAqe = Some(spark.conf.get("spark.sql.adaptive.enabled", "true"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      aqeSession = Some(spark)
    }
  private var aqeSession: Option[org.apache.spark.sql.SparkSession] = None

  /** If a checkpoint exists, the state + iteration to resume from. */
  def resume(spark: org.apache.spark.sql.SparkSession): Option[(DataFrame, Int)] =
    checkpoint.flatMap { c =>
      TableIO.latest(spark, c.dir).map { case (m, df) =>
        suspendAqe(spark)
        val st = df.persist(StorageLevel.MEMORY_AND_DISK)
        prev = Some(st)
        initial = Some(st)
        (st, m.iteration)
      }
    }

  /** Install the initial state (iteration 0). Returns the persisted state. */
  def init(state: DataFrame): DataFrame = {
    suspendAqe(state.sparkSession)
    val st = state.persist(StorageLevel.MEMORY_AND_DISK)
    prev = Some(st)
    initial = Some(st)
    iterStartMs = System.currentTimeMillis()
    st
  }

  /** Truncate the lineage of a freshly-built superstep state. Lazy: the
    * caller's convergence-stats action materializes it (exactly one
    * pass over the data per superstep). Deserialized storage measured
    * faster than MEMORY_AND_DISK_SER here (ser/deser cost exceeds the GC
    * saving; UnsafeRow blocks are already compact byte-backed rows).
    */
  def cut(df: DataFrame): DataFrame =
    df.localCheckpoint(false, StorageLevel.MEMORY_AND_DISK)

  /** Checkpoint block storage of superseded states must be released
    * EXPLICITLY — see [[Lineage.release]].
    */
  private def releaseCheckpointBlocks(df: DataFrame): Unit = Lineage.release(df)

  /** Record superstep `iteration` whose state `next` the caller has already
    * built via [[cut]] and materialized (via its stats action). Commits to
    * the table layer when due. Returns the state to iterate from next.
    */
  def advance(
      iteration: Int,
      next: DataFrame,
      deltaNorm: Double,
      messages: Long,
      changed: Long
  ): DataFrame = {
    var st = next
    val doCheckpoint = checkpoint.exists(c => iteration % c.every == 0)
    val skew = if (doCheckpoint || verbose) skewRatio(st) else 1.0
    if (doCheckpoint) {
      val c = checkpoint.get
      val m = Map(
        "deltaNorm" -> deltaNorm,
        "messages" -> messages.toDouble,
        "changed" -> changed.toDouble,
        "skewRatio" -> skew)
      TableIO.commit(st, c.dir, iteration, m)
      if (iteration % durableCutEvery == 0) {
        // Swap in the durable snapshot as the live state: reliable
        // lineage root + frees the in-process copy. The commit above
        // fully materialized the snapshot, so the in-process checkpoint
        // blocks of `next` can be dropped NOW — it is about to become
        // neither `prev` nor the live state, and unreleased it would
        // leak one full state's blocks per swap (the adjacency-eviction
        // trap this class exists to prevent).
        st = TableIO.latest(st.sparkSession, c.dir).get._2
          .persist(StorageLevel.MEMORY_AND_DISK)
        if (next ne st) {
          next.unpersist()
          releaseCheckpointBlocks(next)
        }
      }
    }
    prev.filter(_ ne st).foreach { p =>
      p.unpersist()
      if (!initial.exists(_ eq p)) releaseCheckpointBlocks(p)
    }
    prev = Some(st)
    val now = System.currentTimeMillis()
    val metrics = SuperstepMetrics(iteration, deltaNorm, messages, changed, skew, now - iterStartMs)
    iterStartMs = now
    history += metrics
    if (verbose) {
      // One log line per superstep, like the reference's ProgressLogger.
      println(f"[graft/$name] iter=$iteration%3d delta=$deltaNorm%.3e msgs=$messages changed=$changed skew=${metrics.skewRatio}%.2f ${metrics.wallMs}ms")
    }
    st
  }

  /** max/mean rows per partition of the materialized state (codegen'd
    * aggregate over spark_partition_id, no Row conversion).
    */
  private def skewRatio(df: DataFrame): Double = {
    try {
      import org.apache.spark.sql.functions._
      val sizes = df.groupBy(spark_partition_id()).count()
        .collect().map(_.getLong(1)).filter(_ > 0)
      if (sizes.isEmpty) 1.0
      else sizes.max.toDouble / (sizes.sum.toDouble / sizes.length)
    } catch { case _: Throwable => 1.0 }
  }

  def close(keepFinal: Boolean = true): Unit = {
    if (!keepFinal) prev.foreach(_.unpersist())
    prev = None
    restoreAqe()
  }

  /** Restore the session's AQE setting. Idempotent (the saved value is
    * cleared on first restore, so a later [[close]] is a no-op), and safe
    * to call from an operator's `finally` even after a normal `close()`:
    * without this guard a superstep failure mid-loop would leak
    * `spark.sql.adaptive.enabled=false` into the session, silently
    * stripping AQE (runtime broadcast conversion, skew-join splitting)
    * from every later query Verify/Bench runs past the failure.
    */
  def restoreAqe(): Unit = {
    for (ss <- aqeSession; v <- savedAqe) ss.conf.set("spark.sql.adaptive.enabled", v)
    aqeSession = None
    savedAqe = None
  }
}
