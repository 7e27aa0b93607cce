package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftsql.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact bounded top-k-by-count aggregate: per group, the k (count,
  * key) entries largest under the total order (count desc, key asc).
  *
  * The input must be FINALIZED (key, count) rows — i.e. the output of
  * a prior count aggregation, where each key appears once. Top-k
  * selection over unique rows is then associative and commutative
  * (global top-k is contained in the union of partial top-k's), so the
  * buffer is a k-bounded set merged map-side: the exchange after the
  * count aggregation carries at most k entries per partition per
  * group, replacing the rank-window formulation whose exchange ships
  * the ENTIRE per-group distribution into one partition for a full
  * sort — the difference between a bounded merge and a vocabulary-
  * sized single-partition sort at corpus scale.
  *
  * Deterministic by construction: the order is total, so the kept set
  * (ties included) is unique regardless of partitioning or merge
  * order. Output: array<struct<n: long, key: string>>, best first.
  */
case class TopKCountAgg(num: Expression, key: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[(Long, UTF8String)]] {

  require(k >= 1, "k >= 1")

  // strict input types, checked at ANALYSIS time: a wrong column type
  // is a clear analysis error instead of a ClassCastException inside
  // the aggregation buffer at runtime. The topKByCount wrapper casts
  // for convenience, so the count check also looks THROUGH casts: a
  // wrapped fractional column would otherwise be silently floored by
  // cast-to-long and rank keys by truncated counts.
  private def castBase(e: Expression): Expression = e match {
    case c: Cast => castBase(c.child)
    case other => other
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (num.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName count must be BIGINT, got ${num.dataType.simpleString}")
    else if (!Seq[DataType](ByteType, ShortType, IntegerType, LongType)
               .contains(castBase(num).dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName count must be integral before any cast, got " +
          castBase(num).dataType.simpleString + " (a fractional count would be floored)")
    else if (key.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName key must be STRING, got ${key.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = Seq(num, key)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("key", StringType, nullable = false))), containsNull = false)
  override def prettyName: String = "topk_by_count"

  // best-first total order: count desc, key asc (binary UTF8 order,
  // the same comparison Spark's string sort and DuckDB's default
  // binary collation use)
  private def cmp = new java.util.Comparator[(Long, UTF8String)] {
    override def compare(a: (Long, UTF8String), b: (Long, UTF8String)): Int = {
      val c = java.lang.Long.compare(b._1, a._1)
      if (c != 0) c else a._2.compareTo(b._2)
    }
  }

  override def createAggregationBuffer(): java.util.TreeSet[(Long, UTF8String)] =
    new java.util.TreeSet[(Long, UTF8String)](cmp)

  private def insert(buf: java.util.TreeSet[(Long, UTF8String)],
                     n: Long, s: UTF8String): Unit = {
    if (buf.size() < k) { buf.add((n, s)); () }
    else if (cmp.compare((n, s), buf.last()) < 0) {
      buf.pollLast(); buf.add((n, s)); ()
    }
  }

  override def update(buf: java.util.TreeSet[(Long, UTF8String)],
                      input: InternalRow): java.util.TreeSet[(Long, UTF8String)] = {
    val n = num.eval(input)
    val s = key.eval(input)
    if (n != null && s != null) {
      // clone: the UTF8String may point into a reused row buffer
      insert(buf, n.asInstanceOf[Long], s.asInstanceOf[UTF8String].clone())
    }
    buf
  }

  override def merge(a: java.util.TreeSet[(Long, UTF8String)],
                     b: java.util.TreeSet[(Long, UTF8String)]): java.util.TreeSet[(Long, UTF8String)] = {
    val it = b.iterator()
    while (it.hasNext) { val e = it.next(); insert(a, e._1, e._2) }
    a
  }

  override def eval(buf: java.util.TreeSet[(Long, UTF8String)]): Any = {
    val rows = new Array[Any](buf.size())
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      rows(i) = new GenericInternalRow(Array[Any](e._1, e._2))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: java.util.TreeSet[(Long, UTF8String)]): Array[Byte] = {
    var bytes = 4
    val it0 = buf.iterator()
    while (it0.hasNext) bytes += 12 + it0.next()._2.numBytes()
    val bb = java.nio.ByteBuffer.allocate(bytes)
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e._1)
      val kb = e._2.getBytes
      bb.putInt(kb.length)
      bb.put(kb)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, UTF8String)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val cnt = bb.getLong
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      buf.add((cnt, UTF8String.fromBytes(kb)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKCountAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKCountAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKCountAgg =
    copy(num = newChildren(0), key = newChildren(1))
}

object TopKCountAgg {
  /** Column wrapper: top-k (count, key) entries of the group, best
    * first — feed it FINALIZED counts (each key once). Counts are cast
    * to long and keys to string here, so int counts / non-string keys
    * work; direct expression construction stays strictly typed.
    */
  def topKByCount(num: Column, key: Column, k: Int): Column =
    Bridge.column(TopKCountAgg(Bridge.expression(num.cast("long")),
      Bridge.expression(key.cast("string")), k).toAggregateExpression())
}
