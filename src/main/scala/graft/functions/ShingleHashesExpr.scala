package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expression: all k-gram polynomial hashes of a string in
  * one pass — H8(s, i) = Σ_{j<k} codepoint(s[i+j]) * 31^j for every window
  * position i. Semantically identical to the composed form
  * `explode(sequence(...)) → Σ ascii(substring(text, i+j, 1))·31^j` the
  * DuckDB oracle uses (ASCII inputs), but evaluated as a tight JVM loop
  * with whole-stage codegen instead of 8 substring allocations per window:
  * the hot inner operator of the dedup family at corpus scale.
  */
case class ShingleHashes(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String].toString, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHashes.compute($c.toString(), $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  /** one-pass window hashes (chars are UTF-16 units == codepoints for the
    * ASCII corpus the oracle semantics are defined over) */
  def compute(s: String, k: Int): GenericArrayData = {
    val n = s.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val pow = new Array[Long](k)
    pow(0) = 1L
    var j = 1
    while (j < k) { pow(j) = pow(j - 1) * 31L; j += 1 }
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      var h = 0L
      var m = 0
      while (m < k) { h += s.charAt(i + m).toLong * pow(m); m += 1 }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  def shingleHashes(c: Column, k: Int): Column =
    GraftColumnBridge.column(ShingleHashes(GraftColumnBridge.expression(c), k))
}
