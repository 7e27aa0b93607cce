package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftsql.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values / bottom-k) SET SKETCH aggregate: the k
  * smallest DISTINCT xxh64 hash values of the group's strings
  * (Bar-Yossef et al. 2002; Beyer et al. SIGMOD'07). Same set-sketch
  * role as [[MinHashAgg]] but a fundamentally cheaper update: one
  * hash + ONE unsigned compare against the current k-th minimum per
  * row — O(1) amortized, vs MinHashAgg's O(numHashes) loop — because
  * once the sketch holds k values, a row only does work when its
  * hash beats the current maximum (probability ≈ k/n_seen). At 100 TB
  * this is the difference between a sketch pass that rides the scan
  * for free and one that burns 1024 compare-exchanges per row.
  *
  * Jaccard between two groups comes from plain array set ops on the
  * sketches (the Beyer et al. estimator): with S = the k smallest of
  * A ∪ B (both sketches merged, deduped),
  * Ĵ = |S ∩ sk(A) ∩ sk(B)| / k, Var ≈ J(1−J)/k — the same error
  * budget as a k-permutation MinHash at equal k.
  *
  * Layout contract (what the SQL-side estimator relies on):
  * values are stored SIGN-FLIPPED (h ^ Long.MinValue) and emitted
  * SORTED ASCENDING, so the natural signed array order equals the
  * unsigned hash order — array_sort/array_union/slice compose the
  * union's bottom-k without any unsigned-compare UDF. A group with
  * fewer than k distinct values emits all of them (size < k), and
  * |sketch| then IS the exact distinct count.
  *
  * Buffer: a size-(k+1) max-heap of sign-flipped hashes plus a
  * same-capacity open-address hash set for the distinctness check
  * (KMV is defined over the distinct set; the duplicate-heavy crawl
  * columns this serves would otherwise stack repeats). Merge inserts
  * the smaller sketch into the larger with the same guard.
  */
case class KmvAgg(child: Expression, k: Int,
                  mutableAggBufferOffset: Int = 0,
                  inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvAgg.Sketch] {
  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_agg"

  override def createAggregationBuffer(): KmvAgg.Sketch =
    new KmvAgg.Sketch(k)

  override def update(buf: KmvAgg.Sketch, input: InternalRow): KmvAgg.Sketch = {
    val v = child.eval(input)
    if (v != null)
      buf.offer(XXH64.hashUTF8String(v.asInstanceOf[UTF8String], 42L)
        ^ Long.MinValue)
    buf
  }

  override def merge(a: KmvAgg.Sketch, b: KmvAgg.Sketch): KmvAgg.Sketch = {
    b.foreach(a.offer)
    a
  }

  override def eval(buf: KmvAgg.Sketch): Any =
    new GenericArrayData(buf.sortedValues)

  override def serialize(buf: KmvAgg.Sketch): Array[Byte] = {
    val vs = buf.sortedValues
    val bb = java.nio.ByteBuffer.allocate(4 + vs.length * 8)
    bb.putInt(vs.length)
    vs.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvAgg.Sketch = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new KmvAgg.Sketch(k)
    var i = 0
    while (i < n) { s.offer(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvAgg =
    copy(child = newChildren.head)
}

object KmvAgg {

  /** The k smallest distinct sign-flipped hashes: a binary max-heap
    * (root = current k-th minimum, O(1) reject for anything larger)
    * plus an open-address set for distinctness. Both structures are
    * capacity-bounded by k — the sketch never grows with the data.
    */
  final class Sketch(k: Int) {
    private val heap = new Array[Long](k)
    private var n = 0
    // open-address set, power-of-two capacity ≥ 2k (load factor ≤ .5);
    // EMPTY slots hold Long.MinValue — the one hash value that can't
    // use the set (raw xxh64 == 0 sign-flips to MinValue) is tracked
    // by the dedicated hasMin flag in offer()
    private val cap = Integer.highestOneBit(math.max(4, k * 2) - 1) << 1
    private val mask = cap - 1
    private val set = Array.fill(cap)(Long.MinValue)
    private var hasMin = false

    private def setContains(h: Long): Boolean = {
      var i = (java.lang.Long.hashCode(h * 0x9E3779B97F4A7C15L)) & mask
      while (set(i) != Long.MinValue) {
        if (set(i) == h) return true
        i = (i + 1) & mask
      }
      false
    }
    private def setAdd(h: Long): Unit = {
      var i = (java.lang.Long.hashCode(h * 0x9E3779B97F4A7C15L)) & mask
      while (set(i) != Long.MinValue && set(i) != h) i = (i + 1) & mask
      set(i) = h
    }
    private def setRemove(h: Long): Unit = {
      // open-address delete via re-insertion of the probe cluster
      var i = (java.lang.Long.hashCode(h * 0x9E3779B97F4A7C15L)) & mask
      while (set(i) != Long.MinValue && set(i) != h) i = (i + 1) & mask
      if (set(i) == Long.MinValue) return
      set(i) = Long.MinValue
      var j = (i + 1) & mask
      while (set(j) != Long.MinValue) {
        val h2 = set(j)
        set(j) = Long.MinValue
        setAdd(h2)
        j = (j + 1) & mask
      }
    }

    private def siftDown(i0: Int): Unit = {
      var i = i0
      while (true) {
        val l = 2 * i + 1
        val r = l + 1
        var m = i
        if (l < n && heap(l) > heap(m)) m = l
        if (r < n && heap(r) > heap(m)) m = r
        if (m == i) return
        val t = heap(i); heap(i) = heap(m); heap(m) = t
        i = m
      }
    }
    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0) {
        val p = (i - 1) / 2
        if (heap(p) >= heap(i)) return
        val t = heap(i); heap(i) = heap(p); heap(p) = t
        i = p
      }
    }

    /** Offer one sign-flipped hash. The hot path (sketch full, hash
      * not below the k-th minimum) is a single comparison.
      */
    def offer(h: Long): Unit = {
      if (h == Long.MinValue) {
        // the EMPTY-marker collision case: MinValue is the smallest
        // possible value, so once present it is never evicted and
        // needs no set slot — one boolean suffices
        if (hasMin) return
        hasMin = true
        if (n == k) {
          setRemove(heap(0))
          heap(0) = h
          siftDown(0)
        } else {
          heap(n) = h
          n += 1
          siftUp(n - 1)
        }
        return
      }
      if (n == k) {
        if (h >= heap(0)) return // the O(1) common case
        if (setContains(h)) return
        setRemove(heap(0))
        setAdd(h)
        heap(0) = h
        siftDown(0)
      } else {
        if (setContains(h)) return
        setAdd(h)
        heap(n) = h
        n += 1
        siftUp(n - 1)
      }
    }

    def foreach(f: Long => Unit): Unit = {
      var i = 0
      while (i < n) { f(heap(i)); i += 1 }
    }

    /** Ascending signed order == ascending unsigned hash order (the
      * values are sign-flipped).
      */
    def sortedValues: Array[Long] = {
      val out = java.util.Arrays.copyOf(heap, n)
      java.util.Arrays.sort(out)
      out
    }
  }

  /** Column wrapper: KMV bottom-k sketch of the group's string
    * values, sorted ascending in sign-flipped order.
    */
  def kmvAgg(value: Column, k: Int): Column =
    Bridge.column(KmvAgg(Bridge.expression(value), k).toAggregateExpression())
}
