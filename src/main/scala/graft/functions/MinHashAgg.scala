package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftsql.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash SET-SKETCH aggregate: one numHashes-component signature per
  * GROUP, summarizing the group's distinct string values. Enables
  * sketch-based set similarity between groups (e.g. column-level
  * Jaccard for schema matching) without joining the distinct values:
  * at 100 TB each column reduces to a few hundred longs, merged
  * associatively map-side (TypedImperativeAggregate), and similarity
  * is estimated from positional signature agreement.
  *
  * Same Kirsch–Mitzenmacher permutation family as MinHashSig, so
  * per-row and per-group signatures are comparable.
  */
case class MinHashAgg(child: Expression, numHashes: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_agg"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(-1L) // unsigned max

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      val h1 = XXH64.hashUTF8String(s, 42L)
      val step = XXH64.hashUTF8String(s, 0x9747b28cL) | 1L
      var h = h1
      var j = 0
      while (j < numHashes) {
        if (java.lang.Long.compareUnsigned(h, buf(j)) < 0) buf(j) = h
        h += step
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < numHashes) {
      if (java.lang.Long.compareUnsigned(b(j), a(j)) < 0) a(j) = b(j)
      j += 1
    }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(numHashes * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
}

object MinHashAgg {
  /** Column wrapper: minhash sketch of the group's string values. */
  def minhashAgg(value: Column, numHashes: Int): Column =
    Bridge.column(MinHashAgg(Bridge.expression(value), numHashes).toAggregateExpression())
}
