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
    * Scale: ONE equi-join of the dimension against the change batch
    * (broadcast by default — the per-load batch is small by contract;
    * pass broadcastChanges = false for a backfill-sized batch and the
    * optimizer plans a key-shuffled hash join instead) plus a
    * key-only anti join for the novel inserts — the dimension side of
    * that anti join is pruned to its key column, so nothing
    * row-width-sized shuffles twice. Untouched dimension rows never
    * move wider than the main join, and the appended versions derive
    * from the batch side alone. No window, no global sort. One change
    * per key per call (the per-batch contract; intra-batch ordering
    * is the caller's concern — enforce upstream with a latest-per-key
    * dedup).
    */
  def scd2Apply(dim: DataFrame, changes: DataFrame, keyCol: String,
                attrCols: Seq[String],
                broadcastChanges: Boolean = true): DataFrame = {
    require(attrCols.nonEmpty, "at least one tracked attribute")
    val ch0 = changes.select(
      F.col(keyCol) +: F.col("change_ts_us") +:
        attrCols.map(c => F.col(c).as(s"__new_$c")): _*)
    val ch = if (broadcastChanges) F.broadcast(ch0) else ch0
    val joined = dim.join(ch, Seq(keyCol), "left")
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

  /** Point-in-time dimension lookup — the consumer side of SCD2:
    * enrich each fact row with the attribute values that were valid
    * AT the fact's timestamp:
    *
    *   dim.valid_from_us <= fact.ts < dim.valid_to_us (null = open)
    *
    * Exactly one version matches per (key, ts) at or after the key's
    * first version; earlier-than-history or unknown keys get null
    * attributes (left join) — auditable rather than silently dropped.
    *
    * Scale: planned as a plain HASH equi-join on the key with the
    * range predicate riding as the join condition — the per-key
    * version count is small by construction (one row per change), so
    * the post-join filter touches a handful of rows per fact row; no
    * interval index needed at any fact-table size.
    */
  def scd2Lookup(facts: DataFrame, factKey: String, tsCol: String,
                 dim: DataFrame, dimKey: String,
                 attrCols: Seq[String]): DataFrame = {
    val d = dim.select(
      F.col(dimKey).as("__dk") +: F.col("valid_from_us") +:
        F.col("valid_to_us") +: attrCols.map(F.col): _*)
    facts.join(d,
        facts(factKey) === d("__dk") &&
          d("valid_from_us") <= facts(tsCol) &&
          (d("valid_to_us").isNull || facts(tsCol) < d("valid_to_us")),
        "left")
      .drop("__dk", "valid_from_us", "valid_to_us")
  }

  /** Continuous dimension maintenance: apply each micro-batch of
    * changes to the dimension at `root` (a [[graft.sources.Versioned]]
    * table) through [[scd2Apply]] — the streaming half of the
    * warehouse-upkeep story. Each batch reads the CURRENT committed
    * snapshot, merges, and commits a NEW version atomically: an
    * in-flight reader keeps its old snapshot, a crash mid-write
    * leaves an invisible partial directory, and the streaming
    * checkpoint's monotone batch ids make replay idempotent at the
    * version level (a replayed batch re-merges against whatever
    * snapshot is current; supply latest-per-key batches upstream).
    * Batches are deduped to one change per key (max change_ts_us,
    * ties broken by the larger attribute tuple is NOT defined — feed
    * unambiguous batches) before the merge.
    */
  def scd2Ingest(changes: DataFrame, root: String, keyCol: String,
                 attrCols: Seq[String],
                 checkpointDir: Option[String] = None)
                (onBatch: (Long, Long) => Unit = (_, _) => ())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = changes.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val dim = graft.sources.Versioned.read(spark, root)
          // latest change per key wins within the batch
          val wk = org.apache.spark.sql.expressions.Window
            .partitionBy(keyCol).orderBy(F.col("change_ts_us").desc)
          val dedup = batch.withColumn("__rk", F.row_number().over(wk))
            .where(F.col("__rk") === 1).drop("__rk")
          val merged = scd2Apply(dim, dedup, keyCol, attrCols)
          val v = graft.sources.Versioned.commit(merged, root)
          onBatch(batchId, v)
        }
      }
    checkpointDir.foreach(d => w.option("checkpointLocation", d))
    w.start()
  }

  /** Type-1 MERGE (upsert + delete) from a CDC-style changeset — the
    * overwrite-in-place sibling of [[scd2Apply]] (Kimball type 1: no
    * history, latest value wins). `changes` carries (key, seqCol,
    * opCol, updateCols…): multiple events per key are compacted to
    * the LATEST by (seqCol desc, opCol desc) — the opCol tie-break is
    * a total order, and since 'U' > 'D' lexically an upsert wins a
    * same-seq tie with a delete (documented contract; feed
    * unambiguous sequence numbers to avoid relying on it).
    *
    *  - latest op = 'D'  → the target row is deleted;
    *  - latest op upsert, key in target → updateCols overwrite, all
    *    other target columns keep their values;
    *  - latest op upsert, key absent   → insert; non-update target
    *    columns are null (the caller backfills or the changeset
    *    carries the full width).
    *
    * Scale: one window over the changeset (per-load batch, small by
    * contract) + ONE full-outer equi-join on the key — untouched
    * target rows move once, no second pass, no global sort. The
    * output column set and order equal the target's.
    */
  def mergeCdc(target: DataFrame, changes: DataFrame, keyCol: String,
               seqCol: String, opCol: String,
               updateCols: Seq[String]): DataFrame = {
    require(updateCols.nonEmpty, "at least one updated column")
    val wk = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(F.col(seqCol).desc, F.col(opCol).desc)
    val latest = changes
      .select(F.col(keyCol) +: F.col(seqCol) +: F.col(opCol) +:
        updateCols.map(c => F.col(c).as(s"__new_$c")): _*)
      .withColumn("__rk", F.row_number().over(wk))
      .where(F.col("__rk") === 1)
      .drop("__rk", seqCol)
    target.join(latest, Seq(keyCol), "full")
      .where(F.col(opCol).isNull || F.col(opCol) =!= "D")
      .select(target.columns.map { c =>
        if (updateCols.contains(c))
          F.coalesce(F.col(s"__new_$c"), F.col(c)).as(c)
        else F.col(c)
      }.toSeq: _*)
  }

  /** Continuous type-1 maintenance: apply each micro-batch of CDC
    * events to the flat table at `root` (a [[graft.sources.Versioned]]
    * table) through [[mergeCdc]] — the streaming twin of the
    * merge_upsert path, same commit discipline as [[scd2Ingest]]:
    * read the CURRENT committed snapshot, merge, commit a NEW version
    * atomically (in-flight readers keep their snapshot; a crash
    * mid-write leaves an invisible partial dir; replayed batches
    * re-merge idempotently at the version level). Intra-batch event
    * ordering is mergeCdc's latest-per-(key, seq) compaction.
    */
  def scd1Ingest(changes: DataFrame, root: String, keyCol: String,
                 seqCol: String, opCol: String, updateCols: Seq[String],
                 checkpointDir: Option[String] = None)
                (onBatch: (Long, Long) => Unit = (_, _) => ())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = changes.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val dim = graft.sources.Versioned.read(spark, root)
          val merged = mergeCdc(dim, batch, keyCol, seqCol, opCol, updateCols)
          val v = graft.sources.Versioned.commit(merged, root)
          onBatch(batchId, v)
        }
      }
    checkpointDir.foreach(d => w.option("checkpointLocation", d))
    w.start()
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
