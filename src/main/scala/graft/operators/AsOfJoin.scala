package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-match) join: for every left row, attach the single
  * right row with the greatest `rightTime <= leftTime` under the same key
  * — the temporal-alignment primitive (event ↔ latest preceding order,
  * tick ↔ last quote) a training-data pipeline needs for point-in-time
  * joins, and an operator Spark SQL lacks natively.
  *
  * MERGE-based, not range-join-based: both sides are tagged and unioned,
  * shuffled ONCE on the key, and each partition is scanned linearly by a
  * running `last(right_payload, ignoreNulls)` window — right rows sort
  * before left rows at equal timestamps (tag 0 < 1), so a right row at
  * exactly `leftTime` matches. Cost is one shuffle + one sort over
  * |L| + |R| rows, independent of the time-overlap density; the naive
  * `ON key AND r.t <= l.t` range join Spark would plan explodes to every
  * (left, earlier-right) pair before a per-left argmax — quadratic per
  * key at 100 TB. No broadcast, no driver state; time-skewed keys cost
  * one window partition each (bounded by per-key row count, the same
  * bound the range join cannot beat).
  *
  * Rows with a null key or null time never match: dropped from the merge
  * on the right; kept but matched-to-nothing on the left (a null key
  * shares a window partition only with other left rows, and a null time
  * sorts before every right row — either way the running `last` is null).
  *
  * DETERMINISM contract: the right side must be unique per (key, time) —
  * at equal (key, time) the window's pick is otherwise tie-ambiguous.
  * Callers dedupe first (see `RelationalQueries.asofOrders`: greatest
  * `o_orderkey` wins); `requireUniqueRight` is not checked here — an
  * extra groupBy at every call would double the operator's shuffle count
  * for a property the caller usually guarantees by construction.
  *
  * Output: every left column, then every right column (null when no
  * right row precedes the left row — left-outer semantics). Column name
  * collisions between the two sides are the caller's to resolve.
  */
object AsOfJoin {

  /** `tolerance`: maximum staleness — a match additionally requires
    * `rightTime >= leftTime - tolerance` (inclusive, pandas
    * `merge_asof`-style; times must be numeric, same unit as the time
    * columns). Implemented as a projection over the merge's running
    * match — the matched right row carries its own time — so the plan
    * shape (one shuffle + one window pass) is unchanged; too-stale
    * matches null out, preserving left-outer semantics.
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      tolerance: Option[Long] = None
  ): DataFrame = {
    // A negative tolerance can never match (the running match already
    // satisfies rightTime <= leftTime) — fail fast like pandas does
    // rather than silently nulling every row.
    tolerance.foreach(tol => require(tol >= 0, s"tolerance must be >= 0, got $tol"))
    val lStruct = struct(left.columns.map(left.col): _*)
    val rStruct = struct(right.columns.map(right.col): _*)
    val rType = right.schema
      .foldLeft(new org.apache.spark.sql.types.StructType()) { (s, f) =>
        s.add(f.name, f.dataType, nullable = true)
      }
    val l2 = left
      .select(
        col(leftKey).as("__k"),
        col(leftTime).as("__t"),
        lit(1).as("__tag"),
        lStruct.as("__l"),
        lit(null).cast(rType).as("__r"))
    val r2 = right
      .where(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
        col(rightKey).as("__k"),
        col(rightTime).as("__t"),
        lit(0).as("__tag"),
        lit(null).cast(left.schema).as("__l"),
        rStruct.as("__r"))
    val w = Window
      .partitionBy(col("__k"))
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val leftCols = left.columns.map(c => col("__l").getField(c).as(c))
    val rightCols = right.columns.map(c => col("__m").getField(c).as(c))
    val matched = last(col("__r"), ignoreNulls = true).over(w)
    val bounded = tolerance.fold(matched)(tol =>
      when(matched.getField(rightTime) >= col("__t") - tol, matched))
    l2.unionByName(r2)
      .withColumn("__m", bounded)
      .where(col("__tag") === 1)
      .select(leftCols ++ rightCols: _*)
  }
}
