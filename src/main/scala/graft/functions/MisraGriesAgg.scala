package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftsql.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitter summary aggregate (Misra & Gries, Sci.
  * Comput. Program. 1982; mergeable form per Agarwal et al., PODS
  * 2012): per group, at most `capacity` (key, weight) entries where
  * each surviving weight UNDER-estimates the key's true count by at
  * most N/capacity (N = group size; ≤ 2N/capacity after arbitrary
  * merges). Every key with true count above that bound is GUARANTEED
  * to survive — the candidate-generation property a two-pass top-k
  * needs: scan once for candidates, re-count only the candidates
  * exactly.
  *
  * Why this beats counting the vocabulary: a groupBy(token) count
  * shuffles one row per DISTINCT token — unbounded for bigrams/URLs
  * at corpus scale — while this buffer is map-side-combined and the
  * exchange carries at most `capacity` entries per partition per
  * group, a constant. Update is amortized O(1): the decrement-all
  * step charges one credit to each of the `capacity` increments that
  * preceded it (implemented as a shared offset, not a map sweep).
  *
  * Input: one row per occurrence (a raw exploded token stream —
  * unlike TopKCountAgg, which needs finalized counts). Output:
  * array<struct<n: long, key: string>> of surviving entries with
  * their lower-bound weights, (n desc, key asc)-ordered.
  */
case class MisraGriesAgg(key: Expression, capacity: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MisraGriesAgg.Buffer] {

  require(capacity >= 1, "capacity >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (key.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName key must be STRING, got ${key.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def children: Seq[Expression] = Seq(key)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("key", StringType, nullable = false))), containsNull = false)
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): MisraGriesAgg.Buffer =
    new MisraGriesAgg.Buffer(capacity)

  override def update(buf: MisraGriesAgg.Buffer,
                      input: InternalRow): MisraGriesAgg.Buffer = {
    val s = key.eval(input)
    // clone: the UTF8String may point into a reused row buffer
    if (s != null) buf.add(s.asInstanceOf[UTF8String].clone(), 1L)
    buf
  }

  override def merge(a: MisraGriesAgg.Buffer,
                     b: MisraGriesAgg.Buffer): MisraGriesAgg.Buffer = {
    b.foreach((k, n) => a.add(k, n))
    a
  }

  override def eval(buf: MisraGriesAgg.Buffer): Any = {
    val entries = buf.entries
    // deterministic output order: weight desc, key asc (binary UTF8 —
    // the same total order TopKCountAgg and DuckDB's binary collation
    // use), so the array is a pure function of the multiset state
    java.util.Arrays.sort(entries, new java.util.Comparator[(Long, UTF8String)] {
      override def compare(x: (Long, UTF8String), y: (Long, UTF8String)): Int = {
        val c = java.lang.Long.compare(y._1, x._1)
        if (c != 0) c else x._2.compareTo(y._2)
      }
    })
    val rows = new Array[Any](entries.length)
    var i = 0
    while (i < entries.length) {
      rows(i) = new GenericInternalRow(Array[Any](entries(i)._1, entries(i)._2))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: MisraGriesAgg.Buffer): Array[Byte] = {
    val entries = buf.entries
    var bytes = 4
    var i = 0
    while (i < entries.length) { bytes += 12 + entries(i)._2.numBytes(); i += 1 }
    val bb = java.nio.ByteBuffer.allocate(bytes)
    bb.putInt(entries.length)
    i = 0
    while (i < entries.length) {
      bb.putLong(entries(i)._1)
      val kb = entries(i)._2.getBytes
      bb.putInt(kb.length)
      bb.put(kb)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MisraGriesAgg.Buffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val cnt = bb.getLong
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      buf.add(UTF8String.fromBytes(kb), cnt)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(key = newChildren(0))
}

object MisraGriesAgg {

  /** The summary state: keyed weights plus a shared `offset` that
    * implements decrement-all in O(1) — an entry's effective weight is
    * `stored - offset`, entries at or below the offset are purged
    * lazily when the map overflows. Weighted adds make the same code
    * serve per-row updates (w = 1) and summary merges (w = partial
    * weight): adding (k, w) is w repetitions of the classic algorithm
    * collapsed into one step, so the mergeability proof of Agarwal et
    * al. applies unchanged.
    */
  final class Buffer(capacity: Int) {
    private val m = new java.util.HashMap[UTF8String, Long](capacity * 2)
    private var offset = 0L

    def add(k: UTF8String, w: Long): Unit = {
      if (w <= 0) return
      val cur = m.get(k)
      if (cur != 0L || m.containsKey(k)) { m.put(k, cur + w); () }
      else if (m.size() < capacity) { m.put(k, offset + w); () }
      else {
        // full and k absent: raise the shared offset by the smallest
        // surviving effective weight (capped by w) — the batched form
        // of "decrement every counter, drop zeros, repeat" — then
        // insert k with whatever of w remains
        var min = Long.MaxValue
        val it0 = m.values().iterator()
        while (it0.hasNext) { val v = it0.next() - offset; if (v < min) min = v }
        val dec = math.min(min, w)
        offset += dec
        val it = m.entrySet().iterator()
        while (it.hasNext) { if (it.next().getValue <= offset) it.remove() }
        val rem = w - dec
        if (rem > 0) add(k, rem)
      }
    }

    def foreach(f: (UTF8String, Long) => Unit): Unit = {
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val w = e.getValue - offset
        if (w > 0) f(e.getKey, w)
      }
    }

    def entries: Array[(Long, UTF8String)] = {
      val out = new scala.collection.mutable.ArrayBuffer[(Long, UTF8String)](m.size())
      foreach((k, n) => { out += ((n, k)); () })
      out.toArray
    }
  }

  /** Column wrapper: the group's Misra-Gries summary — at most
    * `capacity` (n, key) lower-bound entries, every key with true
    * count > 2N/capacity guaranteed present. Feed it RAW occurrence
    * rows (e.g. exploded tokens).
    */
  def misraGries(key: Column, capacity: Int): Column =
    Bridge.column(MisraGriesAgg(Bridge.expression(key.cast("string")),
      capacity).toAggregateExpression())
}
