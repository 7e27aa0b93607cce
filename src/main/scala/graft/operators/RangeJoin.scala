package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Time-range join: pair left rows with right rows sharing a key whose
  * time lies in [leftTime - beforeUs, leftTime + afterUs].
  *
  * Spark plans a plain inequality join as BroadcastNestedLoopJoin —
  * O(|L| x |R|) and a driver OOM at scale. Here both sides are
  * bucketized by floor(time / width): the right side lands in its own
  * bucket, the left side explodes to every bucket its window overlaps
  * (a small constant when width ~ window size), and the join becomes a
  * shuffle-friendly equi-join on (key, bucket) with an exact residual
  * filter. Cost: one shuffle of each side, candidates bounded by
  * per-bucket density instead of |L| x |R|.
  */
object RangeJoin {

  /** @param left      probe side, keeps all its columns
    * @param right     build side; its time + payload get attached
    * @param key       equi-join key present in both
    * @param leftTime  epoch-us column name on left
    * @param rightTime epoch-us column name on right
    * @param beforeUs  window extent before leftTime (>= 0)
    * @param afterUs   window extent after leftTime (>= 0)
    */
  def timeRange(left: DataFrame, right: DataFrame, key: String,
                leftTime: String, rightTime: String,
                beforeUs: Long, afterUs: Long): DataFrame = {
    require(beforeUs >= 0 && afterUs >= 0)
    val widthUs = math.max(beforeUs + afterUs, 1L)
    def bucketOf(c: Column): Column = F.floor(c / F.lit(widthUs))
    val lo = bucketOf(F.col(leftTime) - F.lit(beforeUs))
    val hi = bucketOf(F.col(leftTime) + F.lit(afterUs))
    val l = left.withColumn("_bucket",
      F.explode(F.sequence(lo, hi)))
    val r = right.withColumn("_bucket", bucketOf(F.col(rightTime)))
    l.join(r, Seq(key, "_bucket"))
      .where(F.col(rightTime) >= F.col(leftTime) - F.lit(beforeUs) &&
        F.col(rightTime) <= F.col(leftTime) + F.lit(afterUs))
      .drop("_bucket")
  }

  /** INTERVAL × INTERVAL overlap join: pair left and right rows
    * sharing `key` whose HALF-OPEN intervals [ls, le) and [rs, re)
    * intersect (ls < re && rs < le) — [[timeRange]]'s general form
    * (there the right side is a point; here both sides have extent).
    *
    * Both sides explode to the fixed-width grid cells their interval
    * covers, and the join is an equi-join on (key, cell) with the
    * exact overlap as a residual filter. An overlapping pair shares
    * MANY cells; rather than a distinct (a full extra shuffle of the
    * result), each pair is emitted exactly once at its canonical
    * cell — the LATER of the two start cells, a cell every
    * overlapping pair provably shares (the standard grid-join dedup).
    *
    * Cost: each row replicates by ceil(len/width) — pick widthUs near
    * the typical interval length so the factor is a small constant;
    * candidates are bounded by per-(key, cell) density, never |L|·|R|.
    * Columns `ls`/`le`/`rs`/`re` are epoch-microsecond longs and must
    * be distinct names across the two sides.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame, key: String,
                      ls: String, le: String, rs: String, re: String,
                      widthUs: Long): DataFrame = {
    require(widthUs >= 1, "positive grid width")
    def cellOf(c: Column): Column = F.floor(c / F.lit(widthUs))
    // Empty half-open intervals ([x, x) — le <= ls) intersect nothing,
    // but the naive overlap predicate can still admit them AND their
    // descending cellOf(le-1) < cellOf(ls) range would make F.sequence
    // count DOWN, fabricating cells — drop them before exploding.
    val l = left.where(F.col(le) > F.col(ls)).withColumn("_cell",
      F.explode(F.sequence(cellOf(F.col(ls)), cellOf(F.col(le) - 1))))
    val r = right.where(F.col(re) > F.col(rs)).withColumn("_cell",
      F.explode(F.sequence(cellOf(F.col(rs)), cellOf(F.col(re) - 1))))
    l.join(r, Seq(key, "_cell"))
      .where(F.col(ls) < F.col(re) && F.col(rs) < F.col(le) &&
        F.col("_cell") === F.greatest(cellOf(F.col(ls)), cellOf(F.col(rs))))
      .drop("_cell")
  }
}
