package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bin-bucketed range join: all (left, right) pairs with equal keys where
  * the right point `t` falls inside the left interval `[lo, hi]` — the
  * interval/temporal-window primitive (event × validity window, reading ×
  * calibration period) that Spark SQL plans as a broadcast-nested-loop or
  * a per-key cartesian + filter, both quadratic per key.
  *
  * The bucketed plan: the left interval is exploded over the time bins it
  * covers (at most (hi−lo)/binWidth + 1 rows — bounded by the interval
  * length, a caller-known constant, never by data volume), the right
  * point maps to exactly ONE bin, and the join becomes an equi-join on
  * (key, bin) followed by the exact BETWEEN filter. Each qualifying pair
  * matches in exactly one bin — the one containing `t` — so no dedup
  * pass is needed. Cost: one shuffle of |L|·(bins/interval) + |R| narrow
  * rows; candidate density per bucket is (pairs whose bins collide), the
  * quantity `binWidth` tunes (≈ interval length is the sweet spot:
  * ~2 bins per left row, right rows spread across time).
  *
  * Times are numeric (epoch seconds/micros as long); callers cast
  * timestamps. Intervals with hi < lo, or null key/bounds/point, match
  * nothing. Floor-division bins handle negative times correctly.
  *
  * Output: every left column, then every right column EXCEPT the right
  * key (it equals the left key and is merged into it by the equi-join);
  * inner-join semantics; other name collisions are the caller's to
  * resolve.
  */
object RangeJoin {

  /** Default per-row bin bound: a left row covering more bins than this is
    * EXCLUDED from the join (see [[oversizedIntervals]]). 2^16 bins ≈ a
    * 64k-binWidth-long interval — far beyond any sane interval/binWidth
    * ratio (the sweet spot is ~2 bins/interval), yet small enough that no
    * single row can materialize an array near Spark's limit.
    */
  val DefaultMaxBins: Long = 1L << 16

  /** Times beyond ±2^61 are treated as sentinel garbage and the row is
    * dropped (left rows: auditable via [[oversizedIntervals]]). Every
    * real epoch time at any unit is orders of magnitude inside the
    * bound; allowing larger values would let bin arithmetic overflow
    * (ANSI: throws; legacy: wraps) and one poisoned row kill the whole
    * job — the failure mode this operator's guards exist to prevent.
    */
  private val TimeAbsBound: Double = math.pow(2.0, 61)

  /** True iff the raw time is inside [[TimeAbsBound]] — evaluated on a
    * lossless long→double cast, so the predicate itself can never
    * overflow.
    */
  private def inRange(c: org.apache.spark.sql.Column) =
    abs(c.cast("double")) < TimeAbsBound

  /** Floor-division bin as a DOUBLE, total for every long input: the
    * value is CLAMPED to 0 outside [[TimeAbsBound]] BEFORE any long
    * arithmetic — `c - pmod(c, w)` itself underflows for c within w of
    * Long.MinValue (the second-round review find; Spark may also
    * reorder filter conjuncts, so guarding with a preceding AND is not
    * enough under ANSI). Clamped rows are excluded by the callers'
    * [[inRange]] predicates; in range, the pmod-subtract keeps the
    * division an exact multiple so bin edges never flip on FP.
    */
  private def dbin(c: org.apache.spark.sql.Column, binWidth: Long) = {
    val cc = when(inRange(c), c).otherwise(lit(0L))
    (cc - pmod(cc, lit(binWidth))) / binWidth
  }

  private def bin(c: org.apache.spark.sql.Column, binWidth: Long) =
    dbin(c, binWidth).cast("long") // |bin| <= 2^61: cast-safe

  /** The guard under which a left row is allowed into the explode:
    * overflow-free for ANY (lo, hi, binWidth) — a sentinel interval
    * (Long.MinValue, Long.MaxValue) cannot overflow the guard itself —
    * the r3-ADVICE failure class this guard exists for.
    */
  private def leftGuard(lo: String, hi: String, binWidth: Long, maxBins: Long) =
    inRange(col(lo)) && inRange(col(hi)) &&
      (dbin(col(hi), binWidth) - dbin(col(lo), binWidth)) < lit(maxBins.toDouble)

  def pointInInterval(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      lo: String,
      hi: String,
      t: String,
      binWidth: Long,
      maxBins: Long = DefaultMaxBins
  ): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(maxBins > 0, "maxBins must be positive")
    val l2 = left
      .where(col(leftKey).isNotNull && col(lo).isNotNull && col(hi).isNotNull
        && col(lo) <= col(hi))
      // Guard BEFORE the explode: one malformed sentinel interval (e.g.
      // hi = Long.MaxValue) would otherwise make sequence() exceed Spark's
      // max array length and kill the whole job at runtime (ADVICE r3).
      // Oversized rows are dropped from the join — auditable via
      // [[oversizedIntervals]], which evaluates the same predicate.
      .where(leftGuard(lo, hi, binWidth, maxBins))
      .withColumn("__bin",
        explode(sequence(bin(col(lo), binWidth), bin(col(hi), binWidth))))
      .withColumnRenamed(leftKey, "__k")
    val r2 = right
      .where(col(rightKey).isNotNull && col(t).isNotNull
        // A sentinel point (|t| near the long extremes) can never match
        // a guarded interval; drop it rather than let it poison the bin
        // arithmetic.
        && inRange(col(t)))
      .withColumn("__bin", bin(col(t), binWidth))
      .withColumnRenamed(rightKey, "__k")
    l2.join(r2, Seq("__k", "__bin"))
      .where(col(t) >= col(lo) && col(t) <= col(hi))
      .drop("__bin")
      .withColumnRenamed("__k", leftKey)
  }

  /** The left rows [[pointInInterval]] DROPS under its guard (too many
    * bins OR sentinel-magnitude bounds) — the audit face: a pipeline
    * that must not lose rows silently runs this (count or sink it) next
    * to the join; anything it returns is a data-quality incident (a
    * sentinel hi, a units mix-up), not a join input.
    */
  def oversizedIntervals(
      left: DataFrame,
      leftKey: String,
      lo: String,
      hi: String,
      binWidth: Long,
      maxBins: Long = DefaultMaxBins
  ): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(maxBins > 0, "maxBins must be positive")
    left.where(col(leftKey).isNotNull && col(lo).isNotNull && col(hi).isNotNull
      && col(lo) <= col(hi)
      && !leftGuard(lo, hi, binWidth, maxBins))
  }
}
