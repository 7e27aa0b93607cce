package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.{functions => F}

import graft.text.{Search, TextOps}

/** Streaming full-text index ingest — the per-micro-batch write loop
  * that keeps a [[graft.text.Search.bm25Build]]-shaped postings index
  * current as documents arrive (the StreamingDedup pattern applied to
  * retrieval: a crawl pipeline appends postings as it ingests, and
  * corpus inspection queries probe the live index).
  *
  * Layout: the postings table carries the same `ingest_batch` lineage
  * column as the dedup loops; corpus stats are a PER-BATCH row table
  * (ingest_batch, n, sum_dl) instead of bm25Build's single overwritten
  * row, so the query-time roll-up `groupBy(ingest_batch).max` followed
  * by a sum is IDEMPOTENT under a replayed stats append (duplicate
  * rows of one batch collapse) — the additive-overwrite used by the
  * batch [[graft.text.Search.bm25IndexAppend]] would double-count on
  * replay. Postings appends share foreachBatch's at-least-once
  * caveat: a checkpoint (same contract as StreamingDedup.nearDupIngest
  * — None only for single-run tests) makes batch ids monotone, and a
  * partially-appended crashed batch must be cleaned by `ingest_batch`
  * before restart; the lineage column exists exactly so that cleanup
  * is a partition-filter delete, not a table rebuild.
  *
  * Scale: each micro-batch tokenizes ONLY itself; the index grows by
  * the batch's postings; query cost stays Σ df(t) via the same
  * term-pruned read as the batch index.
  */
object StreamingSearch {

  /** Create the postings + per-batch-stats tables from an initial
    * corpus frame (may be empty), lineage `ingest_batch = -1`.
    */
  def bootstrap(initial: DataFrame, postingsTable: String,
                statsTable: String, idCol: String, textCol: String,
                nBuckets: Int = 64): Unit = {
    val spark = initial.sparkSession
    graft.sources.Sources.writeBucketedMulti(
      postings(initial, idCol, textCol).withColumn("ingest_batch", F.lit(-1L)),
      postingsTable, bucketBy = Seq("term"), nBuckets = nBuckets,
      sortBy = Seq("term"))
    if (!spark.catalog.tableExists(statsTable))
      graft.sources.Sources.deleteStaleTableLocation(spark, statsTable)
    statsRow(initial, idCol, textCol, -1L)
      .write.mode(SaveMode.Overwrite).saveAsTable(statsTable)
  }

  /** Append each micro-batch's postings and stats row. See the object
    * doc for the checkpoint/replay contract.
    */
  def ingest(stream: DataFrame, postingsTable: String, statsTable: String,
             idCol: String, textCol: String, nBuckets: Int = 64,
             checkpointDir: Option[String] = None): StreamingQuery = {
    val writer = stream.writeStream
    checkpointDir.foreach(writer.option("checkpointLocation", _))
    writer.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      graft.sources.Sources.writeBucketedMulti(
        postings(batch.toDF(), idCol, textCol)
          .withColumn("ingest_batch", F.lit(batchId)),
        postingsTable, bucketBy = Seq("term"), nBuckets = nBuckets,
        sortBy = Seq("term"), mode = SaveMode.Append)
      statsRow(batch.toDF(), idCol, textCol, batchId)
        .write.mode(SaveMode.Append).saveAsTable(statsTable)
    }.start()
  }

  /** Query the live index: same scoring chain as the batch paths —
    * with the same corpus content the result is row-for-row equal to
    * [[graft.text.Search.bm25TopK]] (spec-gated). The stats roll-up
    * collapses duplicate per-batch rows first (replay idempotence).
    */
  def query(spark: SparkSession, postingsTable: String, statsTable: String,
            queries: Seq[(Int, String)], k: Int = 10,
            k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "at least one query")
    val terms = queries.flatMap(q => Search.tokenizeQuery(q._2)).distinct
    val post = spark.table(postingsTable)
      .where(F.col("term").isin(terms: _*))
      .select("doc_id", "term", "dl", "tf")
    val stats = spark.table(statsTable)
      .groupBy("ingest_batch")
      .agg(F.max("n").as("n"), F.max("sum_dl").as("sum_dl"))
      .agg(F.sum("n").as("n"), F.sum("sum_dl").as("sum_dl"))
    Search.scoreAndRank(post, stats, queries, k, k1, b)
  }

  /** Streaming ANN-index ingest — the vector twin of [[ingest]]: each
    * micro-batch of (id, embedding) rows is PQ-encoded under the
    * FROZEN quantizers of the [[graft.similarity.Ann.ivfpqBuild]]
    * index at `path` and appended into its cell-partitioned codes
    * table ([[graft.similarity.Ann.ivfpqIndexAppend]]), stamped with
    * `ingest_batch` lineage. The serving loop this closes: embeddings
    * arrive from the crawl, codes accrete, and
    * [[graft.similarity.Ann.ivfpqQueryIndex]] over the live index
    * equals a one-shot frozen-train build over the union (spec-gated)
    * — the corpus is never re-encoded and the quantizers never drift
    * (the FAISS `add` contract; re-training is an offline decision).
    *
    * Replay contract (at-least-once foreachBatch): codes appends, like
    * the postings appends above, are NOT idempotent — a checkpoint
    * makes batch ids monotone, and a partially-appended or replayed
    * batch is cleaned by the `ingest_batch` lineage filter before
    * restart (partition-filter rewrite, spec-demonstrated in
    * SimilaritySpec), never a corpus re-encode.
    */
  def annIngest(stream: DataFrame, path: String, idCol: String,
                vecCol: String,
                checkpointDir: Option[String] = None): StreamingQuery = {
    val writer = stream.writeStream
    checkpointDir.foreach(writer.option("checkpointLocation", _))
    writer.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      graft.similarity.Ann.ivfpqIndexAppend(batch.sparkSession, path,
        batch.toDF(), idCol, vecCol, batchId = batchId)
    }.start()
  }

  /** [[annIngest]] for a PCA-COMPOSED index
    * ([[graft.similarity.Pca.pcaIvfpqBuild]] layout): each micro-batch
    * projects through the index's PERSISTED PCA params first, then
    * PQ-encodes under the frozen projected-space quantizers
    * ([[graft.similarity.Pca.pcaIvfpqIndexAppend]]). Never point
    * [[annIngest]] at a composed index — its codebooks live in the
    * projected space, and slicing full-width vectors into kDim/m
    * subspaces would silently encode wrong codes (the
    * pcaIvfpqIndexAppend doc's warning, now enforced by having a
    * dedicated loop). Same `ingest_batch` lineage + at-least-once
    * cleanup contract as [[annIngest]].
    */
  def annIngestPca(stream: DataFrame, path: String, idCol: String,
                   vecCol: String,
                   checkpointDir: Option[String] = None): StreamingQuery = {
    val writer = stream.writeStream
    checkpointDir.foreach(writer.option("checkpointLocation", _))
    writer.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      graft.similarity.Pca.pcaIvfpqIndexAppend(batch.sparkSession, path,
        batch.toDF(), idCol, vecCol, batchId = batchId)
    }.start()
  }

  private def postings(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val docs = df.select(F.col(idCol).as("doc_id"),
      TextOps.tokens(F.col(textCol)).as("tl"))
    docs.select(F.col("doc_id"), F.size(F.col("tl")).as("dl"),
        F.explode(F.col("tl")).as("term"))
      .groupBy("doc_id", "term", "dl")
      .agg(F.count(F.lit(1)).as("tf"))
  }

  private def statsRow(df: DataFrame, idCol: String, textCol: String,
                       batchId: Long): DataFrame =
    df.select(TextOps.tokens(F.col(textCol)).as("tl"))
      .agg(F.lit(batchId).as("ingest_batch"),
        F.count(F.lit(1)).as("n"),
        F.coalesce(F.sum(F.size(F.col("tl"))), F.lit(0L)).as("sum_dl"))
}
