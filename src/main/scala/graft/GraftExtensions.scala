package graft

import graft.functions.{HllExpressions, VectorExpressions}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point registering graft's native
  * expressions as SQL functions — the blessed extension mechanism for a
  * custom Catalyst surface. Sessions built through
  * [[graft.core.Sessions.tuned]] load it automatically; external users
  * add `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  *
  *  - `hll_init(id[, log2m[, seed]])` → binary sketch
  *  - `hll_merge2(a, b)`              → register-wise max union
  *  - `hll_count(regs)`               → cardinality estimate
  *  - `vec_dot(a, b)` / `vec_norm(a)` → embedding kernels
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo("graft.functions", name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("hll_init"), info("hll_init"),
      (args: Seq[Expression]) => {
        def intArg(i: Int, dflt: Long): Long = args.lift(i) match {
          case Some(Literal(v: Int, _)) => v.toLong
          case Some(Literal(v: Long, _)) => v
          case None => dflt
          case other => throw new IllegalArgumentException(s"hll_init: literal expected, got $other")
        }
        // SQL integer literals are IntegerType; the kernel hashes a Long —
        // cast so interpreted eval and codegen agree (a bare int CCEs on
        // the interpreted path, silently widens under codegen).
        val id = org.apache.spark.sql.catalyst.expressions.Cast(
          args.head, org.apache.spark.sql.types.LongType)
        HllExpressions.HllInitExpr(id, intArg(1, 6L).toInt, intArg(2, 42L))
      }))
    ext.injectFunction((FunctionIdentifier("hll_merge2"), info("hll_merge2"),
      (args: Seq[Expression]) => HllExpressions.HllMerge2Expr(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("hll_count"), info("hll_count"),
      (args: Seq[Expression]) => HllExpressions.HllCountExpr(args.head)))
    ext.injectFunction((FunctionIdentifier("vec_dot"), info("vec_dot"),
      (args: Seq[Expression]) => VectorExpressions.DotExpr(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("vec_norm"), info("vec_norm"),
      (args: Seq[Expression]) => VectorExpressions.NormExpr(args.head)))
  }
}
