package graft.streaming

import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming twin of the incremental near-dup ingest loop
  * (Dedup.minhashIndexBuild / incrementalNearDupPairs): a document
  * stream where each micro-batch is
  *  1. band-probed against everything ingested SO FAR — the persisted
  *     signature index plus the batch's own signatures — and
  *     exact-verified, the resulting near-dup pairs handed to `sink`;
  *  2. appended to the corpus table and its signatures to the index,
  *     so the NEXT batch sees this one.
  * This is the daily-crawl loop with all state in TABLES, not executor
  * memory: no state store grows with the corpus (watermark-based
  * streaming dedup caps state by time; a near-dup index over the whole
  * history cannot be time-capped, so it lives in storage where a 100 TB
  * corpus's signatures belong), restarts resume from the tables, and
  * the per-batch cost is the batch-sized probe — never a corpus
  * re-shingle (see incrementalNearDupPairs).
  *
  * foreachBatch (not a stateful operator) because both halves are
  * BATCH operations on tables — exactly what foreachBatch exists for.
  * Bootstrap: create the corpus table and run minhashIndexBuild (an
  * empty corpus works) before starting the query.
  */
object StreamingDedup {

  def nearDupIngest(stream: DataFrame, corpusTable: String, indexTable: String,
                    idCol: String, textCol: String, k: Int,
                    numHashes: Int, bands: Int, threshold: Double,
                    nBuckets: Int = 64)
                   (sink: (DataFrame, Long) => Unit): StreamingQuery =
    stream.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      val spark = batch.sparkSession
      // resolve the tables INSIDE the batch so each micro-batch sees
      // the files previous batches appended (a frame captured outside
      // would pin the query start's file listing)
      val existing = spark.table(corpusTable)
      val banded = spark.table(indexTable)
      val pairs = Dedup.incrementalNearDupPairs(batch.toDF(), existing, banded,
        idCol, textCol, k, numHashes, bands, threshold)
      sink(pairs, batchId)
      pairs.unpersist()
      // probe BEFORE append: a batch must not band-join its own index
      // rows (its self-pairs already come from the in-memory union)
      batch.select(idCol, textCol).write.mode(SaveMode.Append)
        .saveAsTable(corpusTable)
      Dedup.minhashIndexAppend(batch.toDF(), idCol, textCol, k, numHashes,
        bands, indexTable, nBuckets)
    }.start()
}
