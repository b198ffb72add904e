package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

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
}

/** Native expressions for the similarity kernels: Spark's higher-order
  * functions (`aggregate`/`zip_with`) are INTERPRETED per row — on the
  * O(n²) cosine baseline that allocated a boxed lambda frame per pair
  * and dominated the bench (e_cosine_topk 87 s → these run the loop in
  * generated code over the unsafe array data directly).
  */
object VectorExpressions {

  case class DotExpr(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "vec_dot"

    override protected def nullSafeEval(a: Any, b: Any): Any =
      VecKernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernel.dot($a, $b)")

    override protected def withNewChildrenInternal(l: Expression, r: Expression): DotExpr =
      copy(left = l, right = r)
  }

  case class NormExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "vec_norm"

    override protected def nullSafeEval(a: Any): Any =
      VecKernel.norm(a.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.functions.VecKernel.norm($a)")

    override protected def withNewChildInternal(c: Expression): NormExpr =
      copy(child = c)
  }
}
