package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Slowly-changing-dimension maintenance (Kimball type 2): apply a
  * change batch to a versioned dimension, closing superseded versions
  * and appending new ones with effective ranges — the standard
  * warehouse upkeep step a 100 TB star schema runs per load.
  *
  * Versioned layout: the tracked attribute columns plus
  * (valid_from_us, valid_to_us, is_current) — valid_to_us null on the
  * open version; exactly one current row per key.
  */
object Scd {

  /** Apply `changes` (key, attrs, change_ts_us) to versioned `dim`.
    *
    * Per change row joined to its key's CURRENT version:
    *  - attribute value differs → the current version closes
    *    (valid_to_us = change_ts_us, is_current = false) and a new
    *    open version appends (valid_from_us = change_ts_us);
    *  - value identical → no-op (no spurious version);
    *  - key absent from dim → fresh insert, open from change_ts_us.
    * Historical (already-closed) rows pass through untouched.
    *
    * Scale: ONE equi-join of the dimension against the (small) change
    * batch — broadcast when it fits, hash otherwise; untouched
    * dimension rows never shuffle wider than that join, and the
    * appended versions derive from the batch side alone. No window,
    * no global sort. One change per key per call (the per-batch
    * contract; intra-batch ordering is the caller's concern — enforce
    * upstream with a latest-per-key dedup).
    */
  def scd2Apply(dim: DataFrame, changes: DataFrame, keyCol: String,
                attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "at least one tracked attribute")
    val ch = changes.select(
      F.col(keyCol) +: F.col("change_ts_us") +:
        attrCols.map(c => F.col(c).as(s"__new_$c")): _*)
    val joined = dim.join(F.broadcast(ch), Seq(keyCol), "left")
    val changed = F.col("change_ts_us").isNotNull &&
      F.col("is_current") &&
      attrCols.map(c => !(F.col(c) <=> F.col(s"__new_$c")))
        .reduce(_ || _)
    // existing rows: close the superseded current versions
    val kept = joined.select(
      F.col(keyCol) +:
        attrCols.map(c => F.col(c)) :+
        F.col("valid_from_us") :+
        F.when(changed, F.col("change_ts_us")).otherwise(F.col("valid_to_us"))
          .as("valid_to_us") :+
        F.when(changed, F.lit(false)).otherwise(F.col("is_current"))
          .as("is_current"): _*)
    // new versions for genuinely-changed keys
    val fresh = joined.where(changed).select(
      F.col(keyCol) +:
        attrCols.map(c => F.col(s"__new_$c").as(c)) :+
        F.col("change_ts_us").as("valid_from_us") :+
        F.lit(null).cast("long").as("valid_to_us") :+
        F.lit(true).as("is_current"): _*)
    // brand-new keys: changes with no dimension row at all
    val novel = ch.join(dim.select(F.col(keyCol)), Seq(keyCol), "left_anti")
      .select(
        F.col(keyCol) +:
          attrCols.map(c => F.col(s"__new_$c").as(c)) :+
          F.col("change_ts_us").as("valid_from_us") :+
          F.lit(null).cast("long").as("valid_to_us") :+
          F.lit(true).as("is_current"): _*)
    kept.unionAll(fresh).unionAll(novel)
  }

  /** Wrap a flat table as the initial versioned dimension: every row
    * one open version effective from `fromUs`.
    */
  def scd2Init(df: DataFrame, keyCol: String, attrCols: Seq[String],
               fromUs: Long = 0L): DataFrame =
    df.select(
      F.col(keyCol) +:
        attrCols.map(c => F.col(c)) :+
        F.lit(fromUs).as("valid_from_us") :+
        F.lit(null).cast("long").as("valid_to_us") :+
        F.lit(true).as("is_current"): _*)
}
