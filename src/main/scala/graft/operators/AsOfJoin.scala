package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

/** As-of join: for each left row, attach the most recent right row with
  * right.time <= left.time within the same key.
  *
  * Implemented as the union-merge pattern rather than a range join:
  * union both sides tagged, sort within key by (time, side) — right
  * rows first on equal timestamps, so "<=" semantics — and carry the
  * last non-null right payload forward with last_value(ignoreNulls).
  * Cost: ONE shuffle on the key and a partition-local sort, versus the
  * O(left x right-per-key) blowup of the naive join+filter+rank plan —
  * this is the formulation that survives 100 TB (both inputs stream
  * through; state per key is one row).
  */
object AsOfJoin {

  /** @param left      the probe side (keeps all rows)
    * @param right     the reference side (payload carried forward)
    * @param key       equi-join key column name present in both
    * @param leftTime  event-time column (any orderable type) on left
    * @param rightTime event-time column on right
    * @param payload   right columns to attach (must not clash with left)
    * @param direction "backward" (default — most recent right with
    *        right.time <= left.time) or "forward" (next right with
    *        right.time >= left.time, the "first quote after the
    *        trade" variant); same single-shuffle union-merge either
    *        way, only the window frame flips
    */
  def apply(left: DataFrame, right: DataFrame, key: String,
            leftTime: String, rightTime: String,
            payload: Seq[String], direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      "direction is 'backward' or 'forward'")
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_t", F.col(leftTime))
      .withColumn("_side", F.lit(1))
      .select((leftCols.map(F.col) :+ F.col("_t") :+ F.col("_side")) ++
        payload.map(p => F.lit(null).cast(right.schema(p).dataType).as(p)): _*)
    val r = right
      .withColumn("_t", F.col(rightTime))
      .withColumn("_side", F.lit(0))
      .select((leftCols.map(c => if (c == key) F.col(key) else F.lit(null).cast(left.schema(c).dataType).as(c)) :+
        F.col("_t") :+ F.col("_side")) ++ payload.map(F.col): _*)
    // Deterministic AND row-consistent tie-break: several right rows
    // can share (key, rightTime); ordering by (_t, _side) alone would
    // let last/first pick a physically arbitrary payload row, and
    // carrying each payload column in its OWN last/first would let the
    // output mix values from DIFFERENT tied rows (max of p1 from one,
    // last non-null p2 from another) whenever payloads contain nulls.
    // Carrying ONE struct of all payload columns pins the choice to a
    // single whole row — the lexicographically max payload tuple
    // backward, min forward (struct ordering is field-wise; payload
    // columns must be orderable types). The struct is null on left
    // rows so ignoreNulls skips them.
    val merged = l.unionByName(r).withColumn("_p",
      F.when(F.col("_side") === 0, F.struct(payload.map(F.col): _*)))
    val carried =
      if (direction == "backward") {
        // right rows sort BEFORE left on equal time -> "<=" inclusive
        val w = Window.partitionBy(key)
          .orderBy(F.col("_t").asc, F.col("_side").asc, F.col("_p").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        merged.withColumn("_p", F.last(F.col("_p"), ignoreNulls = true).over(w))
      } else {
        // left rows sort BEFORE right on equal time, and the frame
        // looks ahead -> ">=" inclusive
        val w = Window.partitionBy(key)
          .orderBy(F.col("_t").asc, F.col("_side").desc, F.col("_p").asc)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        merged.withColumn("_p", F.first(F.col("_p"), ignoreNulls = true).over(w))
      }
    carried.where(F.col("_side") === 1)
      .select(leftCols.map(F.col) ++
        payload.map(p => F.col("_p").getField(p).as(p)): _*)
  }

  /** NEAREST as-of: attach the right row minimizing |right.time −
    * left.time| within the key (sensor/tick alignment where either
    * side may lag). Both directions come from the SAME single shuffle
    * and partition-local sort: the backward candidate is
    * last_value(ignoreNulls) over (−∞, current], the forward one
    * first_value over [current, +∞) — two frames on one sorted window,
    * no second exchange. Ties (equal gaps) resolve BACKWARD, which is
    * also why the forward frame may safely miss an equal-time right
    * row (its backward gap is 0 and always wins). Time columns must
    * be numeric (epoch-µs) — the gap comparison is integer
    * arithmetic. Returns left columns + payload (from the chosen
    * side) + asof_gap_us (null when the key has no right row at all).
    */
  def nearest(left: DataFrame, right: DataFrame, key: String,
              leftTime: String, rightTime: String,
              payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val carry = payload :+ "_rt"
    val l = left
      .withColumn("_t", F.col(leftTime))
      .withColumn("_side", F.lit(1))
      .select((leftCols.map(F.col) :+ F.col("_t") :+ F.col("_side")) ++
        payload.map(p => F.lit(null).cast(right.schema(p).dataType).as(p)) :+
        F.lit(null).cast("long").as("_rt"): _*)
    val r = right
      .withColumn("_t", F.col(rightTime))
      .withColumn("_side", F.lit(0))
      .select((leftCols.map(c => if (c == key) F.col(key)
        else F.lit(null).cast(left.schema(c).dataType).as(c)) :+
        F.col("_t") :+ F.col("_side")) ++ payload.map(F.col) :+
        F.col(rightTime).cast("long").as("_rt"): _*)
    // same deterministic ROW-CONSISTENT tie-break as [[apply]]: one
    // struct of (payload..., _rt) carried whole, so several right rows
    // sharing (key, rightTime) resolve to the max payload tuple
    // backward / min forward — never a physically arbitrary row, never
    // a cross-row mix of per-column maxima
    val merged = l.unionByName(r).withColumn("_c",
      F.when(F.col("_side") === 0, F.struct(carry.map(F.col): _*)))
    val ord = Window.partitionBy(key).orderBy(
      F.col("_t").asc, F.col("_side").asc, F.col("_c").asc)
    val wBack = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = merged
      .withColumn("_bk", F.last(F.col("_c"), ignoreNulls = true).over(wBack))
      .withColumn("_fw", F.first(F.col("_c"), ignoreNulls = true).over(wFwd))
    val useBack = F.col("_fw._rt").isNull ||
      (F.col("_bk._rt").isNotNull &&
        (F.col("_t").cast("long") - F.col("_bk._rt")) <=
          (F.col("_fw._rt") - F.col("_t").cast("long")))
    carried.where(F.col("_side") === 1)
      .select(leftCols.map(F.col) ++
        payload.map(p => F.when(useBack, F.col(s"_bk.$p"))
          .otherwise(F.col(s"_fw.$p")).as(p)) :+
        F.when(useBack, F.col("_t").cast("long") - F.col("_bk._rt"))
          .otherwise(F.col("_fw._rt") - F.col("_t").cast("long"))
          .as("asof_gap_us"): _*)
  }
}
