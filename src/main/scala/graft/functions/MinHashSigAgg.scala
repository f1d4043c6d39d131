package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import graft.functions.PortableHash.{permA, permB, P}

/** Custom typed imperative aggregate (SURVEY.md §7.4's one custom-aggregate
  * candidate): the full w-permutation MinHash signature of a group's hash
  * column in a single pass over a primitive long[] buffer — replaces w
  * separate min(expr_i) aggregate columns (w expression trees per row) and
  * keeps partial aggregation: buffers min-merge across partitions, so the
  * shuffle carries one w-long signature per document, not the shingle set.
  */
case class MinHashSigAgg(
    child: Expression,
    numPerms: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private lazy val as: Array[Long] = Array.tabulate(numPerms)(permA)
  private lazy val bs: Array[Long] = Array.tabulate(numPerms)(permB)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numPerms)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val hm = v.asInstanceOf[Long] % P
      var i = 0
      while (i < numPerms) {
        val p = (as(i) * hm + bs(i)) % P
        if (p < buf(i)) buf(i) = p
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numPerms) { if (other(i) < buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numPerms)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numPerms)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSigAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSigAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSigAgg =
    copy(child = newChildren.head)
}

object MinHashSigAgg {
  /** aggregate Column: minhash signature (array<long> of length numPerms) */
  def minhashSig(c: Column, numPerms: Int): Column =
    GraftColumnBridge.column(
      MinHashSigAgg(GraftColumnBridge.expression(c), numPerms).toAggregateExpression())
}
