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

  /** Seed the incremental golden-record vote state with the MASTER
    * side's own votes (m = 1): a [[graft.sources.Versioned]] table of
    * (__cid, attribute, value, n_votes, __mm, last_batch) at
    * `votesRoot`. Returns the committed version.
    */
  def goldenSeed(a: DataFrame, idA: String, attrs: Seq[String],
                 votesRoot: String): Long = {
    // same type contract as the batch goldenRecords: a float attribute
    // would stringify with engine-specific rendering and silently break
    // the spec-gated batch/streaming equality — refuse loudly instead
    graft.harmonize.Linkage.requireGoldenAttrTypes(a, attrs, "A")
    val aM = a.select((F.col(idA).as("__cid") +: F.lit(1).as("__m") +:
      attrs.map(c => F.col(c).cast("string").as(c))): _*)
    graft.sources.Versioned.commit(
      graft.harmonize.Linkage.goldenVotesOf(aM, attrs)
        .withColumn("last_batch", F.lit(-1L)), votesRoot)
  }

  /** Merge one batch's partial votes into the state table, guarded for
    * at-least-once replay: vote counts are NOT idempotent (a replayed
    * batch would double-count), so each committed version records the
    * highest applied batch id and a batch at or below it is a no-op.
    * foreachBatch replays are monotone-from-checkpoint, so this single
    * high-water mark makes the merge exactly-once per batch — a
    * STRONGER contract than the append loops' lineage-cleanup (state
    * here is merged, not appended; cleanup-by-filter cannot apply).
    * Returns whether the batch was applied.
    */
  def goldenMergeBatch(spark: org.apache.spark.sql.SparkSession,
                       votesRoot: String, batchVotes: DataFrame,
                       batchId: Long): Boolean = {
    val cur = graft.sources.Versioned.read(spark, votesRoot)
    val last = cur.agg(F.max("last_batch")).head().getLong(0)
    if (batchId <= last) false
    else {
      val merged = graft.harmonize.Linkage.goldenVotesMerge(
          cur.drop("last_batch").unionByName(batchVotes))
        .withColumn("last_batch", F.lit(batchId))
      graft.sources.Versioned.commit(merged, votesRoot)
      true
    }
  }

  /** Streaming survivorship: each micro-batch of B records resolves
    * against the persisted link index (pruned-partition read, master
    * never rescanned), reduces to its partial vote table, and merges
    * into the state at `votesRoot` under the replay guard. Golden
    * rows serve at any time from
    * `Linkage.goldenFromVotes(Versioned.read(votesRoot).drop("last_batch"), idA)`
    * — identical to the one-shot [[graft.harmonize.Linkage.goldenRecords]]
    * over everything ingested (spec-gated equality). Per-batch cost:
    * the batch's block-footprint read + an entity-bounded state merge.
    */
  def goldenIngest(stream: DataFrame, indexPath: String, votesRoot: String,
                   blockCols: Seq[String],
                   idA: String, nameA: String, idB: String, nameB: String,
                   maxDist: Int, attrs: Seq[String],
                   checkpointDir: Option[String] = None): StreamingQuery = {
    val writer = stream.writeStream
    checkpointDir.foreach(writer.option("checkpointLocation", _))
    writer.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      if (!batch.isEmpty) {
        val spark = batch.sparkSession
        // the shared survivorship type contract, per batch (see
        // goldenSeed) — a float attribute fails HERE, not as a silent
        // batch/streaming divergence later
        graft.harmonize.Linkage.requireGoldenAttrTypes(batch.toDF(), attrs, "B")
        val links = graft.harmonize.Linkage.linkByNameIndex(spark, indexPath,
          batch.toDF(), blockCols, idA, nameA, idB, nameB, maxDist)
        val bM = links.select(F.col(idB), F.col(idA).as("__cid"))
          .join(batch.toDF(), Seq(idB))
          .select((F.col("__cid") +: F.lit(0).as("__m") +:
            attrs.map(c => F.col(c).cast("string").as(c))): _*)
        goldenMergeBatch(spark, votesRoot,
          graft.harmonize.Linkage.goldenVotesOf(bM, attrs), batchId)
        ()
      }
    }.start()
  }
}
