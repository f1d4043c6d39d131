package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Nearest-centroid id for a dense vector against a fixed K×dim integer
  * codebook, in one codegen pass per row. A float/double vector is
  * quantized exactly like [[graft.operators.SimilarityOps]]'s component
  * quantization (⌊x·10⁶⌋ as long; a long vector is taken as already
  * quantized) and compared by the v-constant-free form ‖c‖² − 2·c·x in
  * exact integer arithmetic; ties take the LOWEST cluster id, matching
  * the distributed argmin's (distance, cluster) ordering.
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

  @transient private lazy val packed =
    CentroidArgmin.pack(cents, CentroidArgmin.inputKind(child.dataType))

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

/** min over the codebook of the v-constant-free distance ‖c‖² − 2·c·x —
  * the scan-side half of a farthest-point init step: adding the row's own
  * ‖x‖² gives the true min squared distance to the chosen set, so one
  * TakeOrdered over a scan replaces the join-on-component + double
  * aggregation + window pipeline per init step. Same quantization and
  * integer arithmetic as [[CentroidArgmin]]. */
case class CentroidMinDist(child: Expression, cents: Seq[Seq[Long]])
    extends UnaryExpression {
  require(cents.nonEmpty, "empty codebook")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  @transient private lazy val packed =
    CentroidArgmin.pack(cents, CentroidArgmin.inputKind(child.dataType))

  override protected def nullSafeEval(input: Any): Any =
    packed.minDist(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebook", packed,
      classOf[CentroidArgmin.Packed].getName)
    defineCodeGen(ctx, ev, c => s"$ref.minDist($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidMinDist =
    copy(child = newChild)

  override def toString: String =
    s"centroid_mindist($child, [${cents.length}x${cents.head.length} codebook])"
  override def sql: String =
    s"centroid_mindist(${child.sql}, [${cents.length}x${cents.head.length} codebook])"
}

object CentroidArgmin {

  private[functions] final val KindFloat = 0
  private[functions] final val KindDouble = 1
  private[functions] final val KindLong = 2

  private[functions] def inputKind(dt: DataType): Int = dt match {
    case ArrayType(DoubleType, _) => KindDouble
    case ArrayType(LongType, _)   => KindLong
    case _                        => KindFloat
  }

  /** codebook flattened to primitive arrays: row-major components plus
    * per-centroid squared norms, computed once per (de)serialization */
  final class Packed(val flat: Array[Long], val norms: Array[Long],
      val k: Int, val dim: Int, val kind: Int) extends Serializable {

    private def quantize(vec: ArrayData): Array[Long] = {
      val x = new Array[Long](dim)
      var i = 0
      kind match {
        case KindDouble => while (i < dim) {
          x(i) = Math.floor(vec.getDouble(i) * 1000000d).toLong; i += 1
        }
        case KindLong => while (i < dim) { x(i) = vec.getLong(i); i += 1 }
        case _ => while (i < dim) {
          x(i) = Math.floor(vec.getFloat(i).toDouble * 1000000d).toLong; i += 1
        }
      }
      x
    }

    def argmin(vec: ArrayData): Int = {
      val x = quantize(vec)
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

    def minDist(vec: ArrayData): Long = {
      val x = quantize(vec)
      var bestD = Long.MaxValue
      var c = 0
      while (c < k) {
        var dp = 0L
        val base = c * dim
        var j = 0
        while (j < dim) { dp += flat(base + j) * x(j); j += 1 }
        val d = norms(c) - 2 * dp
        if (d < bestD) bestD = d
        c += 1
      }
      bestD
    }
  }

  private[functions] def pack(cents: Seq[Seq[Long]], kind: Int = KindFloat): Packed = {
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
    new Packed(flat, norms, k, dim, kind)
  }

  /** nearest-centroid id of an `array<float|double|bigint>` column
    * (bigint = pre-quantized components) */
  def centroidArgmin(vec: Column, cents: Array[Array[Long]]): Column =
    GraftColumnBridge.column(
      CentroidArgmin(GraftColumnBridge.expression(vec), cents.map(_.toSeq).toSeq))

  /** min ‖c‖² − 2·c·x over the codebook for an
    * `array<float|double|bigint>` column */
  def centroidMinDist(vec: Column, cents: Array[Array[Long]]): Column =
    GraftColumnBridge.column(
      CentroidMinDist(GraftColumnBridge.expression(vec), cents.map(_.toSeq).toSeq))
}
