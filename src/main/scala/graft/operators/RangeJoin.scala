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
}
