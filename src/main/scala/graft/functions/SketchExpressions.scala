package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql.{column, expression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Probe-side expressions for the two classic stream sketches, as native
  * codegen'd Catalyst expressions — the "sketch prunes, exact verifies"
  * primitives a 100 TB pipeline runs before any expensive shuffle:
  *
  *  - [[SketchExpressions.bloomMightContain]]: runtime row-level
  *    filtering — build a Bloom filter over the small (already-filtered)
  *    join side once, probe the 100 TB side MAP-SIDE inside whole-stage
  *    codegen, and only the surviving rows enter the shuffle. One-sided
  *    error (no false negatives) means a final exact semi-join gives an
  *    exact answer while the shuffle moved ~selectivity·|big| rows. This
  *    is Spark's own `spark.sql.optimizer.runtime.bloomFilter` pattern
  *    made explicit and pluggable.
  *  - [[SketchExpressions.cmsEstimate]]: Count–Min frequency estimate
  *    (Cormode & Muthukrishnan 2005) — CMS only OVER-estimates, so
  *    `estimate ≥ T` selects a SUPERSET of the true ≥T heavy hitters;
  *    an exact count over just the surviving rows then removes the false
  *    positives. Two scans, but the wide aggregation state shrinks from
  *    |vocabulary| to |heavy tail|.
  *
  * Both carry the sketch as serialized bytes (a plain `Array[Byte]`
  * constructor arg, so the expression tree ships with the task closure)
  * and rebuild the probe object lazily ONCE per JVM/deserialization;
  * codegen embeds the rebuilt sketch via `ctx.addReferenceObj`, so the
  * per-row cost is one virtual call on unboxed input — no UDF, no
  * interpreter.
  */
object SketchExpressions {

  /** `value` (long/int) is probably in the set encoded by `bytes`
    * ([[BloomFilter.writeTo]] format). False positives at the filter's
    * configured fpp; false negatives never.
    */
  def bloomMightContain(value: Column, bytes: Array[Byte]): Column =
    column(BloomMightContain(expression(value), bytes))

  /** CMS point-frequency estimate (≥ the true count) for a long/int/string
    * `value` against a [[CountMinSketch.writeTo]]-serialized sketch.
    */
  def cmsEstimate(value: Column, bytes: Array[Byte]): Column =
    column(CmsEstimate(expression(value), bytes))
}

/** `mightContain(value)` against a serialized [[BloomFilter]]. */
case class BloomMightContain(
    value: Expression,
    bloomBytes: Array[Byte]
) extends UnaryExpression {

  override def child: Expression = value
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def checkInputDataTypes(): TypeCheckResult = value.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a long/int key, got ${dt.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any = v match {
    case l: Long => bloom.mightContainLong(l)
    case i: Int => bloom.mightContainLong(i.toLong)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong((long) $c)")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(value = c)
}

/** `estimateCount(value)` against a serialized [[CountMinSketch]];
  * returns the (over-)estimated frequency as a long.
  */
case class CmsEstimate(
    value: Expression,
    cmsBytes: Array[Byte]
) extends UnaryExpression {

  override def child: Expression = value
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cms_estimate"

  @transient private lazy val cms: CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(cmsBytes))

  override def checkInputDataTypes(): TypeCheckResult = value.dataType match {
    case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a long/int/string key, got ${dt.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any = v match {
    case l: Long => cms.estimateCount(java.lang.Long.valueOf(l))
    case i: Int => cms.estimateCount(java.lang.Integer.valueOf(i))
    case s: UTF8String => cms.estimateCount(s.toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cms", cms, classOf[CountMinSketch].getName)
    value.dataType match {
      case StringType =>
        defineCodeGen(ctx, ev, c => s"$ref.estimateCount($c.toString())")
      case IntegerType =>
        defineCodeGen(ctx, ev, c => s"$ref.estimateCount((Object) java.lang.Integer.valueOf($c))")
      case _ =>
        defineCodeGen(ctx, ev, c => s"$ref.estimateCount((Object) java.lang.Long.valueOf($c))")
    }
  }

  override protected def withNewChildInternal(c: Expression): CmsEstimate =
    copy(value = c)
}
