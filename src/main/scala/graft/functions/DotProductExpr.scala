package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Custom codegen'd dot product over two array<double> columns: the inner
  * loop of similarity search. Left-to-right accumulation — bit-identical
  * to the `aggregate(zip_with(...))` fold it replaces and to the DuckDB
  * oracle's list_sum(list_transform(...)), but a tight primitive loop
  * instead of per-element Catalyst lambda dispatch (64 boxed calls per
  * pair × |queries|·|corpus| pairs dominates brute-force top-k otherwise).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotProduct.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    // a malformed embedding must surface as an error, not a
    // plausible-but-truncated similarity (zip_with would yield nulls here)
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"dot_product: vector lengths differ ($n vs ${b.numElements()})")
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  def dotProduct(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      DotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
