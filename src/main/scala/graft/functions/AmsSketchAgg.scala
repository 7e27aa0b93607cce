package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftsql.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** F-AGMS (Fast-AGMS / sign-hash) frequency sketch aggregate (Alon,
  * Matias & Szegedy STOC'96; the fast variant of Cormode & Garofalakis
  * VLDB'05): `depth` independent rows of `width` signed counters. Each
  * value v adds sign_r(v) ∈ {±1} to counter h_r(v) of every row r.
  *
  * The point of the sketch: for two columns' sketches built with the
  * SAME (depth, width), the per-row counter dot product is an
  * unbiased estimator of the columns' frequency-vector inner product
  * Σ_v cntA(v)·cntB(v) — which IS the equi-join cardinality
  * |A ⋈ B| — with variance ~ F2(A)·F2(B)/width; the median across
  * rows tames the tail. Join sizes without executing (or even
  * shuffling for) the join: the sketch state is depth·width longs per
  * column, merged associatively map-side, constant in the corpus.
  *
  * Buffer layout: flat Array[Long] of depth·width, row-major.
  */
case class AmsSketchAgg(child: Expression, depth: Int, width: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ams_sketch_agg"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var r = 0
      while (r < depth) {
        // two independent hashes per row: bucket and sign
        val hb = XXH64.hashUTF8String(s, 1000003L * r + 17L)
        val hs = XXH64.hashUTF8String(s, 2000029L * r + 71L)
        val idx = (((hb % width) + width) % width).toInt
        buf(r * width + idx) += (if ((hs & 1L) == 0L) 1L else -1L)
        r += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(depth * width)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): AmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): AmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): AmsSketchAgg =
    copy(child = newChildren.head)
}

object AmsSketchAgg {
  /** Column wrapper: F-AGMS sketch of the group's string values. */
  def amsSketchAgg(value: Column, depth: Int, width: Int): Column =
    Bridge.column(AmsSketchAgg(Bridge.expression(value), depth, width)
      .toAggregateExpression())

  /** Join-size estimate from two same-shaped sketches: median across
    * rows of the per-row counter dot products — pure builtin-function
    * arithmetic over the two array columns (no UDF).
    */
  def joinSizeEstimate(a: Column, b: Column, depth: Int, width: Int): Column = {
    import org.apache.spark.sql.{functions => F}
    val dots = (0 until depth).map { r =>
      F.aggregate(
        F.zip_with(F.slice(a, r * width + 1, width),
          F.slice(b, r * width + 1, width), (x, y) => x * y),
        F.lit(0L), (acc, x) => acc + x)
    }
    val sorted = F.sort_array(F.array(dots: _*))
    F.element_at(sorted, depth / 2 + 1) // median (depth odd)
  }
}
