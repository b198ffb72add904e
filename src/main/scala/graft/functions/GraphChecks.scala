package graft.functions

import graft.core.Graph
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Scalar/utility operators mirroring the reference's `utils` module
  * (SURVEY §2.5): argmax/argmin with first-instance tie semantics, and the
  * transpose/symmetry debug validators.
  */
object GraphChecks {

  /** Row with the max `value`, ties → smallest `idx` (the reference's
    * `math::argmax` returns the FIRST max instance,
    * `/root/reference/src/utils/argmax.rs:29-36`).
    */
  def argmax(df: DataFrame, value: Column, idx: Column): Option[Row] =
    df.orderBy(value.desc, idx.asc).limit(1).collect().headOption

  def argmin(df: DataFrame, value: Column, idx: Column): Option[Row] =
    df.orderBy(value.asc, idx.asc).limit(1).collect().headOption

  /** Filtered variant with an extra tie-break column
    * (`argmax_filtered`, `/root/reference/src/utils/argmax.rs:74-98`:
    * max value, then max tie-break, then first index).
    */
  def argmaxFiltered(df: DataFrame, value: Column, tie: Column, idx: Column,
                     pred: Column): Option[Row] =
    df.filter(pred).orderBy(value.desc, tie.desc, idx.asc).limit(1).collect().headOption

  /** True iff `t` is exactly the transpose of `g`
    * (`check_transposed`, `/root/reference/src/utils/mod.rs:84-118`).
    */
  def checkTransposed(g: Graph, t: Graph): Boolean = {
    val gt = g.edges.toDF().select(col("dst").as("src"), col("src").as("dst"))
    gt.exceptAll(t.edges.toDF()).isEmpty && t.edges.toDF().exceptAll(gt).isEmpty
  }

  /** True iff the graph equals its own transpose
    * (`check_symmetric`, `/root/reference/src/utils/mod.rs:121-143`).
    */
  def checkSymmetric(g: Graph): Boolean = checkTransposed(g, g)
}
