package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.{functions => F}

/** Streaming entity-resolution ingest — the link-as-they-arrive loop
  * that resolves each micro-batch of records against a PERSISTED
  * master-side link index ([[graft.harmonize.Linkage.linkIndexBuild]])
  * and appends the resolved links with `ingest_batch` lineage (the
  * StreamingDedup/StreamingSearch ingest pattern applied to record
  * linkage: a CDC or crawl stream of customer/entity records resolves
  * against the master dimension as it lands, and the master is never
  * rescanned — each batch reads only the partitions its block keys
  * touch).
  *
  * Replay contract (at-least-once foreachBatch): link appends are not
  * idempotent — a checkpoint makes batch ids monotone, and a
  * partially-appended or replayed batch is cleaned by the
  * `ingest_batch` lineage filter before restart (the shared contract
  * documented on [[StreamingSearch.ingest]]).
  */
object StreamingLinkage {

  /** Per micro-batch: partition-pruned link of the batch against the
    * index at `indexPath`, appended to the `linksPath` parquet
    * directory as (idB, idA, lev, n_candidates, ingest_batch).
    */
  def erIngest(stream: DataFrame, indexPath: String, linksPath: String,
               blockCols: Seq[String],
               idA: String, nameA: String, idB: String, nameB: String,
               maxDist: Int,
               checkpointDir: Option[String] = None): StreamingQuery = {
    val writer = stream.writeStream
    checkpointDir.foreach(writer.option("checkpointLocation", _))
    writer.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      graft.harmonize.Linkage.linkByNameIndex(batch.sparkSession, indexPath,
          batch.toDF(), blockCols, idA, nameA, idB, nameB, maxDist)
        .withColumn("ingest_batch", F.lit(batchId))
        .write.mode(SaveMode.Append).parquet(linksPath)
    }.start()
  }
}
