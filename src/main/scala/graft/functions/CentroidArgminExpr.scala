package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Nearest-centroid id for a dense vector against a fixed K×dim integer
  * codebook, in one codegen pass per row. The vector is quantized exactly
  * like [[graft.operators.SimilarityOps]]'s component quantization
  * (⌊x·10⁶⌋ as long) and compared by the v-constant-free form
  * ‖c‖² − 2·c·x in exact integer arithmetic; ties take the LOWEST cluster
  * id, matching the distributed argmin's (distance, cluster) ordering.
  *
  * This exists for corpus-scaled assignment (K ~ n/occupancy): the
  * join-on-component form multiplies every row K× before aggregating
  * (12.8B shuffled rows at K=1000 over 200k vectors), and a higher-order
  * `transform`/`aggregate` form evaluates interpreted lambdas with a
  * fresh array allocation per (row, centroid). Here the codebook rides
  * the plan as one reference object (K×dim longs — half a MiB at K=1000,
  * shipped once per stage with the task binary, NOT per row or per task)
  * and each row costs K·dim primitive multiply-adds inside whole-stage
  * codegen with zero allocation.
  */
case class CentroidArgmin(child: Expression, cents: Seq[Seq[Long]])
    extends UnaryExpression {
  require(cents.nonEmpty, "empty codebook")

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  @transient private lazy val packed = CentroidArgmin.pack(cents,
    fromDouble = child.dataType match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    })

  override protected def nullSafeEval(input: Any): Any =
    packed.argmin(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebook", packed,
      classOf[CentroidArgmin.Packed].getName)
    defineCodeGen(ctx, ev, c => s"$ref.argmin($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidArgmin =
    copy(child = newChild)

  // the codebook is constructor data, not a child expression — without
  // these overrides TreeNode renders all K×dim longs into every explain /
  // plan-audit / UI string the expression appears in
  override def toString: String =
    s"centroid_argmin($child, [${cents.length}x${cents.head.length} codebook])"
  override def sql: String =
    s"centroid_argmin(${child.sql}, [${cents.length}x${cents.head.length} codebook])"
}

object CentroidArgmin {

  /** codebook flattened to primitive arrays: row-major components plus
    * per-centroid squared norms, computed once per (de)serialization */
  final class Packed(val flat: Array[Long], val norms: Array[Long],
      val k: Int, val dim: Int, val fromDouble: Boolean) extends Serializable {

    def argmin(vec: ArrayData): Int = {
      val x = new Array[Long](dim)
      var i = 0
      if (fromDouble) while (i < dim) {
        x(i) = Math.floor(vec.getDouble(i) * 1000000d).toLong; i += 1
      } else while (i < dim) {
        x(i) = Math.floor(vec.getFloat(i).toDouble * 1000000d).toLong; i += 1
      }
      var bestC = 0
      var bestD = Long.MaxValue
      var c = 0
      while (c < k) {
        var dp = 0L
        val base = c * dim
        var j = 0
        while (j < dim) { dp += flat(base + j) * x(j); j += 1 }
        val d = norms(c) - 2 * dp
        if (d < bestD) { bestD = d; bestC = c } // strict <: ties keep lower c
        c += 1
      }
      bestC
    }
  }

  private[functions] def pack(cents: Seq[Seq[Long]], fromDouble: Boolean = false): Packed = {
    val k = cents.length
    val dim = cents.head.length
    val flat = new Array[Long](k * dim)
    val norms = new Array[Long](k)
    var c = 0
    while (c < k) {
      val row = cents(c)
      require(row.length == dim, s"ragged codebook at centroid $c")
      var j = 0
      var n2 = 0L
      while (j < dim) {
        val v = row(j)
        flat(c * dim + j) = v
        n2 += v * v
        j += 1
      }
      norms(c) = n2
      c += 1
    }
    new Packed(flat, norms, k, dim, fromDouble)
  }

  /** nearest-centroid id of an `array<float>`/`array<double>` column */
  def centroidArgmin(vec: Column, cents: Array[Array[Long]]): Column =
    GraftColumnBridge.column(
      CentroidArgmin(GraftColumnBridge.expression(vec), cents.map(_.toSeq).toSeq))
}
