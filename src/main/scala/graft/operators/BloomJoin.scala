package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Semi-join reduction via a Bloom filter — the classic distributed
  * join optimization (Bloom CACM'70 applied per Mackert & Lohman
  * SIGMOD'86's "bloomjoin"): when the probe side is huge and most of
  * its rows have NO partner, filter it against a compact membership
  * sketch of the build side's keys BEFORE the join shuffle, so the
  * dropped rows never leave their input partitions.
  *
  * This is the pattern for the case broadcast cannot cover: the build
  * side's ROWS are too big to broadcast, but its KEY SET fits a Bloom
  * filter (100 M keys ≈ 120 MB at 1% fpp — shippable where the rows
  * are not). False positives only ride to the join and fall out
  * there; the result is EXACTLY the plain join's (gated by the
  * driver oracle). Spark's own runtime row-level filtering makes the
  * same move for shuffle joins when statistics trigger it; this
  * operator makes it explicit and deterministic.
  */
object BloomJoin {

  /** Inner equi-join `big ⋈ small` on long-typed `key`, with `big`
    * pre-filtered by a Bloom filter of `small`'s distinct keys.
    *
    * The filter is built with one pass over the build side
    * (`stat.bloomFilter`, a driver-merged sketch — build side small
    * by the same contract that makes the reduction worthwhile) and
    * rides the probe-side scan as a codegen'd native predicate
    * ([[graft.functions.MightContainLong]]), evaluated BEFORE the
    * shuffle: `.explain` shows the filter under the probe scan, not
    * under the join.
    *
    * @param expectedKeys sizes the filter (defaults to a counted
    *                     distinct of the build keys — pass it when
    *                     known to save the extra job)
    */
  def prefilteredJoin(big: DataFrame, small: DataFrame, key: String,
                      fpp: Double = 0.01,
                      expectedKeys: Long = -1L): DataFrame = {
    require(big.schema(key).dataType == org.apache.spark.sql.types.LongType &&
      small.schema(key).dataType == org.apache.spark.sql.types.LongType,
      s"bloom prefilter probes a LONG key; '$key' is " +
        s"${big.schema(key).dataType.simpleString}/${small.schema(key).dataType.simpleString}")
    val n = if (expectedKeys > 0) expectedKeys
            else small.select(key).distinct().count()
    val bloom = small.stat.bloomFilter(key, math.max(n, 1L), fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    val pred = graft.functions.HashExprs
      .mightContainLong(F.col(key), bos.toByteArray)
    big.where(pred).join(small, Seq(key))
  }
}
