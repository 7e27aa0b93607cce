package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.{functions => F}

/** Streaming distribution-drift monitor — the continuous half of the
  * [[graft.harmonize.Drift]] batch reports: a long-lived ingest
  * pipeline wants "did THIS batch's category mix move away from the
  * reference corpus?" answered as the data lands, not in a nightly
  * audit. Each micro-batch is reduced to its |categories|-row count
  * table and chi-squared against a FROZEN reference histogram (a
  * driver-small (category, cnt) frame computed once — the reference
  * corpus is never rescanned), so per-batch cost is one scan of the
  * batch plus a |categories|-row join, independent of corpus size.
  *
  * Replay contract (at-least-once foreachBatch): report appends carry
  * `ingest_batch` lineage — a checkpoint makes batch ids monotone, and
  * a partially-appended or replayed batch is cleaned by the lineage
  * filter before restart (the shared contract documented on
  * [[StreamingSearch.ingest]]).
  */
object StreamingDrift {

  /** Per micro-batch: chi-square drift report of the batch's `catCol`
    * counts against `refCounts` (category string, cnt long — the
    * frozen reference histogram), appended to the `reportPath` parquet
    * directory as (comparison, category, cnt_a, cnt_b, contrib_ppm,
    * ingest_batch) with cnt_a = reference, cnt_b = batch. Categories
    * absent from a side contribute through a zero observed cell —
    * exactly the batch operator's novel-category semantics, because
    * the full-outer count join feeds the SAME contribution assembly
    * ([[graft.harmonize.Drift.chi2FromContingency]]).
    */
  /** Numeric drift monitoring: bucketize the stream under FROZEN
    * reference bounds (the serving contract — bounds come from the
    * reference corpus once; batch values outside them CLAMP into the
    * edge buckets, so novel tails surface as edge-bucket mass, never
    * as dropped rows) and chi-square each micro-batch's bucket counts
    * against the frozen reference histogram via [[chi2Ingest]]. This
    * is the incremental form of `Drift.histDrift` — constant-size
    * state (bins), constant-size reference, one batch scan per batch.
    */
  def histIngest(stream: DataFrame, refCounts: DataFrame, valueCol: String,
                 mn: Double, mx: Double, bins: Int, reportPath: String,
                 comparison: String = "ref_vs_batch",
                 checkpointDir: Option[String] = None): StreamingQuery = {
    require(bins >= 1, "at least one bucket")
    val v = F.col(valueCol).cast("double")
    val bucket =
      if (mx == mn) F.lit(0L)
      else F.greatest(F.lit(0L),
        F.least(F.floor((v - F.lit(mn)) * F.lit(bins) / F.lit(mx - mn)),
          F.lit(bins - 1L)))
    val bucketed = stream.where(v.isNotNull)
      .select(bucket.cast("string").as("bucket"))
    chi2Ingest(bucketed, refCounts, "bucket", reportPath, comparison,
      checkpointDir)
  }

  def chi2Ingest(stream: DataFrame, refCounts: DataFrame, catCol: String,
                 reportPath: String, comparison: String = "ref_vs_batch",
                 checkpointDir: Option[String] = None): StreamingQuery = {
    val ref = refCounts
      .select(F.col("category").cast("string").as("category"),
        F.col("cnt").cast("long").as("__ra"))
    val writer = stream.writeStream
    checkpointDir.foreach(writer.option("checkpointLocation", _))
    writer.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      if (!batch.isEmpty) {
        val bc = batch
          .select(F.col(catCol).cast("string").as("category"))
          .where(F.col("category").isNotNull)
          .groupBy("category").agg(F.count(F.lit(1)).as("__rb"))
        val cont = ref.join(bc, Seq("category"), "full_outer")
          .select(F.col("category"),
            F.coalesce(F.col("__ra"), F.lit(0L)).as("cnt_a"),
            F.coalesce(F.col("__rb"), F.lit(0L)).as("cnt_b"))
        graft.harmonize.Drift.chi2FromContingency(comparison, cont)
          .withColumn("ingest_batch", F.lit(batchId))
          .write.mode(SaveMode.Append).parquet(reportPath)
      }
    }.start()
  }
}
