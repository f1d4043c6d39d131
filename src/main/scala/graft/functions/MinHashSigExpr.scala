package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import graft.functions.PortableHash.{permA, permB, P}

/** Scalar MinHash signature over a document's (already distinct,
  * df-filtered) shingle-hash array: sig[i] = min over h of
  * (a_i * (h mod P) + b_i) mod P — the same permutation family as
  * [[MinHashSigAgg]], evaluated per row with whole-stage codegen.
  *
  * Versus the aggregate form this removes the groupBy(doc_id) shuffle
  * entirely: once shingles live as one array per document row, the
  * signature is a narrow map — at corpus scale the LSH band join becomes
  * the first (and only) shuffle of the MinHash pipeline.
  */
case class MinHashSig(child: Expression, numPerms: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], numPerms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashSig.compute($c, $numPerms)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  private val coeffs =
    scala.collection.concurrent.TrieMap.empty[Int, (Array[Long], Array[Long])]

  private def coefficients(numPerms: Int): (Array[Long], Array[Long]) =
    coeffs.getOrElseUpdate(numPerms,
      (Array.tabulate(numPerms)(permA), Array.tabulate(numPerms)(permB)))

  def compute(arr: ArrayData, numPerms: Int): GenericArrayData = {
    val (as, bs) = coefficients(numPerms)
    val out = Array.fill(numPerms)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val hm = arr.getLong(j) % P
      var i = 0
      while (i < numPerms) {
        val p = (as(i) * hm + bs(i)) % P
        if (p < out(i)) out(i) = p
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  def minhashSig(c: Column, numPerms: Int): Column =
    GraftColumnBridge.column(MinHashSig(GraftColumnBridge.expression(c), numPerms))
}
