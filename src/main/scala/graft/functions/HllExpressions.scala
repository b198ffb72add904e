package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType}

/** Native Catalyst expressions for the HLL kernel — the designed custom
  * surface of SURVEY §4 ("custom Catalyst surface actually needed").
  *
  * These replace the round-1 ScalaUDF wrappers, which sat on HyperBall's
  * hottest inner loop (`g_hyperball`): a ScalaUDF breaks whole-stage
  * codegen at every call site and pays per-row encoder dispatch, while
  * these expressions compile to a direct static call on `HllLogic`
  * (BinaryType is already `byte[]` internally — zero conversion).
  * The group-merge stays an imperative `Aggregator` ([[Hll.MergeAgg]]):
  * partial (map-side) register-max merging is exactly what the aggregate
  * buffer machinery does.
  */
object HllExpressions {

  /** hll_init(id): a fresh sketch seeded with the vertex's own id —
    * the reference's default counter init (`hyperball_impl.rs:1176-1178`).
    * `jenkins` selects the Java-webgraph-parity hash
    * ([[HllLogic.hashJenkins]]) over the default splitmix64.
    */
  case class HllInitExpr(child: Expression, log2m: Int, seed: Long,
                         jenkins: Boolean = false)
      extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "hll_init"

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"hll_init requires a BIGINT id, got ${child.dataType.catalogString}")

    override protected def nullSafeEval(id: Any): Any =
      HllLogic.init(id.asInstanceOf[Long], log2m, seed, jenkins)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.HllLogic.init($c, $log2m, ${seed}L, $jenkins)")

    override protected def withNewChildInternal(newChild: Expression): HllInitExpr =
      copy(child = newChild)
  }

  /** hll_count(regs): the cardinality estimate (α·m²/Σ2^-reg with the
    * linear-counting branch — `hyper_log_log_logic.rs:169-186`).
    */
  case class HllCountExpr(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "hll_count"

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"hll_count requires a BINARY sketch, got ${child.dataType.catalogString}")

    override protected def nullSafeEval(regs: Any): Any =
      HllLogic.count(regs.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HllLogic.count($c)")

    override protected def withNewChildInternal(newChild: Expression): HllCountExpr =
      copy(child = newChild)
  }

  /** hll_merge2(a, b): register-wise max union; null-PERMISSIVE — a null
    * side yields the other side unchanged (a vertex that gathered no
    * messages this superstep keeps its own sketch), so this cannot use
    * the null-intolerant fast path and generates its own null logic.
    */
  case class HllMerge2Expr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = left.nullable && right.nullable
    override def prettyName: String = "hll_merge2"

    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType == BinaryType && right.dataType == BinaryType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"hll_merge2 requires two BINARY sketches, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

    override def eval(input: InternalRow): Any = {
      val a = left.eval(input)
      val b = right.eval(input)
      if (a == null) b
      else if (b == null) a
      else HllLogic.merge(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val aGen = left.genCode(ctx)
      val bGen = right.genCode(ctx)
      ev.copy(code = code"""
        ${aGen.code}
        ${bGen.code}
        boolean ${ev.isNull} = ${aGen.isNull} && ${bGen.isNull};
        byte[] ${ev.value} = null;
        if (!${ev.isNull}) {
          if (${aGen.isNull}) { ${ev.value} = ${bGen.value}; }
          else if (${bGen.isNull}) { ${ev.value} = ${aGen.value}; }
          else { ${ev.value} = graft.functions.HllLogic.merge(${aGen.value}, ${bGen.value}); }
        }""")
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): HllMerge2Expr =
      copy(left = newLeft, right = newRight)
  }
}
