package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftsql.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Upper-triangle Gram accumulation for the distributed covariance
  * (graft.similarity.Pca.pcaTrain): each input row is a CENTERED
  * d-vector, and the aggregate sums x_i·x_j for every i ≤ j into one
  * flat d(d+1)/2 buffer — the whole covariance in ONE map-side pass.
  *
  * Why an aggregate and not SQL: the declarative form explodes every
  * vector into its d(d+1)/2 product cells (d=64 ⇒ 2080 rows per
  * vector) and hash-aggregates decimal sums over them — the shuffle
  * and the per-cell aggregate hash probes dominate PCA training. Here
  * the products never leave the task: the buffer is d(d+1)/2 longs,
  * merged associatively, constant in the corpus size.
  *
  * Determinism (the pcaTrain partitioning-invariance contract): each
  * product is rounded ONCE to 1e-12 fixed point (Math.round — ties
  * half-up on the binary value) and accumulated in EXACT long
  * arithmetic, so the total is independent of row and partition
  * order. Overflow refuses loudly (Math.addExact + a per-product
  * magnitude guard) — a blown accumulator must never wrap silently
  * into a wrong spectrum. The 1e-12 grid is exact for products below
  * 2^53/1e12 ≈ 9007 — far above centered-embedding products — and the
  * per-product cap 4.5e18 (value 4.5e6) leaves 2× addExact headroom.
  *
  * Buffer layout: row-major upper triangle — cell (i, j), i ≤ j, at
  * index i·d − i(i−1)/2 + (j − i); consumers rescale by 1e-12 via
  * exact BigDecimal(unscaled, 12) → double.
  */
case class CovUpperSumAgg(child: Expression, d: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cov_upper_sum_agg"

  private val cells = d * (d + 1) / 2

  override def createAggregationBuffer(): Array[Long] = new Array[Long](cells)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData].toDoubleArray()
      require(arr.length == d,
        s"cov_upper_sum_agg: vector length ${arr.length} != declared dim $d")
      var i = 0
      var idx = 0
      while (i < d) {
        val xi = arr(i)
        var j = i
        while (j < d) {
          val scaled = xi * arr(j) * 1e12
          if (math.abs(scaled) > 4.5e18)
            throw new ArithmeticException(
              s"cov_upper_sum_agg: centered product ${xi * arr(j)} exceeds " +
                "the 1e-12 fixed-point range — normalize the embeddings or " +
                "reduce maxTrain")
          buf(idx) = Math.addExact(buf(idx), Math.round(scaled))
          idx += 1
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
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
    Array.fill(cells)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CovUpperSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CovUpperSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CovUpperSumAgg =
    copy(child = newChildren.head)
}

object CovUpperSumAgg {
  /** Column wrapper: flat upper-triangle Σ x_i·x_j (1e-12 fixed-point
    * longs) of the group's centered double-array vectors.
    */
  def covUpperSumAgg(vec: Column, d: Int): Column =
    Bridge.column(CovUpperSumAgg(Bridge.expression(vec), d)
      .toAggregateExpression())
}
