package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Continuous corpus statistics via MERGEABLE sketches — the
  * incremental half of the profile_distinct_sketch /
  * events_rolling_users_approx story: a 100 TB deployment cannot
  * recount distincts per day, it maintains a tiny sketch TABLE and
  * unions new data in. Mergeability is the whole point of choosing
  * HLL over exact countDistinct (Agarwal et al. PODS'12).
  */
object StreamingStats {

  /** Maintain a per-day HLL user-sketch table at `root` (a
    * [[graft.sources.Versioned]] table of (day_us, sk binary)) from
    * an event stream: each micro-batch reduces to its own per-day
    * sketches (one scan of the BATCH — the historical corpus is never
    * re-read), unions them with the stored rows for the touched days
    * (groupBy over |days| sketch-sized rows), and commits a new
    * version atomically — same snapshot/replay discipline as
    * scd2Ingest. Rolling DAU/WAU reports then serve from |days| 2 KB
    * rows; estimates carry HLL union error (~1.6 % RSE at lgK 12),
    * gated against exact counts by the batch twin.
    */
  def sketchIngest(events: DataFrame, root: String, lgK: Int = 12,
                   checkpointDir: Option[String] = None)
                  (onBatch: (Long, Long) => Unit = (_, _) => ())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val dayUs = 24L * 3600 * 1000 * 1000
    val w = events.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val us = F.unix_micros(F.col("ts").cast("timestamp"))
          val batchSk = batch
            .select((us - F.pmod(us, F.lit(dayUs))).as("day_us"),
              F.col("user_id"))
            .groupBy("day_us")
            .agg(F.hll_sketch_agg(F.col("user_id"), F.lit(lgK)).as("sk"))
          val merged = graft.sources.Versioned.currentVersion(spark, root) match {
            case Some(_) =>
              graft.sources.Versioned.read(spark, root)
                .unionByName(batchSk)
                .groupBy("day_us")
                .agg(F.hll_union_agg(F.col("sk"), F.lit(false)).as("sk"))
            case None => batchSk
          }
          val v = graft.sources.Versioned.commit(merged, root)
          onBatch(batchId, v)
        }
      }
    checkpointDir.foreach(d => w.option("checkpointLocation", d))
    w.start()
  }

  /** Serve the rolling-distinct report from the sketch table: DAU
    * from each day's sketch, trailing-`windowDays` WAU from a union
    * of the window's sketches — |days|·window sketch rows total,
    * independent of user cardinality.
    */
  def rollingFromSketches(sketches: DataFrame,
                          windowDays: Int = 7): DataFrame = {
    val dayUs = 24L * 3600 * 1000 * 1000
    val dau = sketches.select(F.col("day_us"),
      F.hll_sketch_estimate(F.col("sk")).as("dau_est"))
    val wau = sketches
      .select(F.col("sk"),
        F.explode(F.sequence(F.lit(0L), F.lit(windowDays - 1L))).as("off"),
        F.col("day_us"))
      .select((F.col("day_us") + F.col("off") * dayUs).as("day_us"), F.col("sk"))
      .groupBy("day_us")
      .agg(F.hll_sketch_estimate(
        F.hll_union_agg(F.col("sk"), F.lit(false))).as("wau_est"))
    dau.join(wau, Seq("day_us"))
  }

  /** Continuous DOMAIN-STATS maintenance (r18 — the streaming twin
    * of [[graft.text.Curate.domainStatsAppend]], the sketchIngest
    * pattern with exact mergeable partials instead of HLL): each
    * micro-batch reduces to its (domain, host) partials — one scan
    * of the BATCH, the historical corpus and the stats table are
    * never re-read — and appends them under the micro-batch id.
    * [[graft.text.Curate.domainStats]] over the table then equals
    * the batch recompute of everything ingested, exactly (spec-gated
    * micro-batch == batch). saveAsTable(Append) creates the table on
    * the first batch, so no separate bootstrap step exists on the
    * streaming path.
    */
  def domainStatsIngest(docs: DataFrame, urlCol: String, charsCol: String,
                        table: String, nBuckets: Int = 8,
                        checkpointDir: Option[String] = None)
                       (onBatch: Long => Unit = _ => ())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty &&
            domainStatsAppendOnce(batch, urlCol, charsCol, table,
              batchId, nBuckets))
          onBatch(batchId)
      }
    checkpointDir.foreach(d => w.option("checkpointLocation", d))
    w.start()
  }

  /** Idempotent form of [[graft.text.Curate.domainStatsAppend]] for
    * the at-least-once foreachBatch contract: a replayed micro-batch
    * arrives with the SAME batchId, and the parquet append commits
    * all-or-nothing through the file committer, so "rows for this
    * ingest_batch already exist" is a sound replay detector — skip
    * the append instead of doubling the partials. The probe reads
    * only the stats table (partials-sized, never the corpus) with
    * the ingest_batch filter pushed to the scan. Returns whether the
    * batch was appended (false = replay skipped).
    */
  def domainStatsAppendOnce(batch: DataFrame, urlCol: String,
                            charsCol: String, table: String,
                            batchId: Long, nBuckets: Int): Boolean = {
    val spark = batch.sparkSession
    val replay = spark.catalog.tableExists(table) &&
      !spark.table(table)
        .where(F.col("ingest_batch") === batchId).isEmpty
    if (!replay)
      graft.text.Curate.domainStatsAppend(batch, urlCol, charsCol,
        table, ingestBatch = batchId, nBuckets = nBuckets)
    !replay
  }
}
