package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) interleave of two long keys — the multi-dimensional
  * clustering key for data-skipping layouts. Bit i of `left` lands at
  * output bit 2i, bit i of `right` at 2i+1 (inputs masked to their low
  * 32 bits), so sorting by the key tiles the 2-D key space: any
  * contiguous key range — a file or row group after a range-partitioned
  * write — covers a bounded span of BOTH dimensions, which is what lets
  * min/max stats prune scans filtered on either column. The spread is
  * the standard magic-number bit dilation (5 shift/mask rounds, branch
  * free) — pure long arithmetic, so the DuckDB oracle replays it exactly
  * (LayoutOps.spreadSql) and whole-stage codegen inlines it. */
case class ZOrderKey(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder2 expects (bigint, bigint), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrderKey.compute(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ZOrderKey.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderKey =
    copy(left = newLeft, right = newRight)
}

object ZOrderKey {
  /** dilate the low 32 bits of v to the even bit positions of a long */
  def spread(v0: Long): Long = {
    var v = v0 & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  def compute(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  def zorder2(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      ZOrderKey(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
