package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Tight-loop kernels over embedding arrays, Java-callable from codegen. */
object VecKernel {

  /** Σ aᵢ·bᵢ in double precision, left-to-right — the SAME summation
    * order as the `aggregate(zip_with(...))` fold it replaces, so results
    * (and the DuckDB oracles) are bit-identical.
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def norm(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = a.getFloat(i).toDouble; s += x * x; i += 1 }
    math.sqrt(s)
  }

  /** array<double> variants — SQL literals like `array(1.0, 2.0)` build
    * ArrayType(DoubleType); reading those slots with getFloat would return
    * garbage silently, so the expressions dispatch on the element type.
    */
  def dotD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  def normD(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = a.getDouble(i); s += x * x; i += 1 }
    math.sqrt(s)
  }
}

/** Native expressions for the similarity kernels: Spark's higher-order
  * functions (`aggregate`/`zip_with`) are INTERPRETED per row — on the
  * O(n²) cosine baseline that allocated a boxed lambda frame per pair
  * and dominated the bench (e_cosine_topk 87 s → these run the loop in
  * generated code over the unsafe array data directly).
  *
  * Accepted input: array<float> (the embeddings tables) or array<double>
  * (SQL array literals); anything else is rejected at ANALYSIS time —
  * `ExpectsInputTypes` is unavailable outside org.apache.spark.sql in
  * Spark 4 (`AbstractDataType` is private[sql]), so the check is a
  * `checkInputDataTypes` override.
  */
object VectorExpressions {

  private def elemKind(dt: DataType): Option[Boolean] = dt match {
    case ArrayType(FloatType, _) => Some(false)
    case ArrayType(DoubleType, _) => Some(true)
    case _ => None
  }

  private def typeError(name: String, dt: DataType): TypeCheckResult =
    TypeCheckResult.TypeCheckFailure(
      s"$name requires array<float> or array<double>, got ${dt.catalogString}")

  case class DotExpr(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "vec_dot"

    override def checkInputDataTypes(): TypeCheckResult =
      (elemKind(left.dataType), elemKind(right.dataType)) match {
        case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
        case (Some(_), Some(_)) => TypeCheckResult.TypeCheckFailure(
          s"vec_dot requires both sides to have the same element type, got " +
            s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
        case (None, _) => typeError(prettyName, left.dataType)
        case _ => typeError(prettyName, right.dataType)
      }

    private def isDouble: Boolean = elemKind(left.dataType).contains(true)

    override protected def nullSafeEval(a: Any, b: Any): Any =
      if (isDouble) VecKernel.dotD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      else VecKernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = if (isDouble) "dotD" else "dot"
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernel.$fn($a, $b)")
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotExpr =
      copy(left = l, right = r)
  }

  case class NormExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "vec_norm"

    override def checkInputDataTypes(): TypeCheckResult =
      elemKind(child.dataType) match {
        case Some(_) => TypeCheckResult.TypeCheckSuccess
        case None => typeError(prettyName, child.dataType)
      }

    private def isDouble: Boolean = elemKind(child.dataType).contains(true)

    override protected def nullSafeEval(a: Any): Any =
      if (isDouble) VecKernel.normD(a.asInstanceOf[ArrayData])
      else VecKernel.norm(a.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fn = if (isDouble) "normD" else "norm"
      defineCodeGen(ctx, ev, a => s"graft.functions.VecKernel.$fn($a)")
    }

    override protected def withNewChildInternal(c: Expression): NormExpr =
      copy(child = c)
  }
}
