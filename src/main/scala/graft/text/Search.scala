package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

/** Full-text retrieval over a document corpus — the query capability a
  * training-data pipeline uses for corpus inspection, contamination
  * triage, and quality auditing (reference analog: the value-domain
  * keyword lookups behind bdikit/api.py preview/matching flows, raised
  * to ranked retrieval).
  *
  * Scale design (100 TB): the query batch is driver-literal, so its
  * term set prunes the exploded token stream BEFORE the only
  * corpus-keyed shuffle — posting volume is bounded by Σ_t df(t)
  * (documents actually containing a query term), never corpus token
  * count. Document-length stats aggregate to ONE row (broadcast back);
  * per-term df is a ≤|query-terms|-key aggregate; scoring is a
  * broadcast join + per-row arithmetic; the final top-k window is
  * partitioned by query id. Nothing corpus-sized ever sorts globally.
  */
object Search {

  /** Driver-side twin of [[TextOps.tokens]] for query strings (tiny,
    * literal): lowercase maximal [a-z0-9] runs.
    */
  private[graft] def tokenizeQuery(q: String): Seq[String] =
    q.toLowerCase.split("[^a-z0-9]+").toSeq.filter(_.nonEmpty)

  /** BM25 top-k retrieval (Robertson et al. TREC-3; the Lucene
    * practical variant): for each query, the k highest-scoring
    * documents under
    *
    *   score(q,d) = Σ_{t ∈ q} idf(t) · tf(t,d)·(k1+1) /
    *                (tf(t,d) + k1·(1 − b + b·|d|/avgdl)),
    *   idf(t) = ln(1 + (N − df(t) + 0.5)/(df(t) + 0.5))
    *
    * Duplicate query terms count once (query terms are a set). All
    * inputs to the per-term expression are exact integers (tf, df, dl,
    * N, Σdl), so the double chain is deterministic cross-engine;
    * contributions round to 9dp and accumulate in DECIMAL so the
    * per-document sum is addition-order-free, then the score rounds to
    * 6dp. Ties break on ascending doc id.
    *
    * Output: (query_id, doc_id, score, rank), rank 1..k per query.
    */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
               queries: Seq[(Int, String)], k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "at least one query")
    val spark = df.sparkSession
    import spark.implicits._
    val terms = queries.flatMap(q => tokenizeQuery(q._2)).distinct
    val docs = df.select(F.col(idCol).as("doc_id"),
      TextOps.tokens(F.col(textCol)).as("tl"))
    // one-row exact-integer corpus stats; avgdl = Σdl/N is a single
    // double division of exact integers — no accumulation-order drift
    val stats = docs.agg(F.count(F.lit(1)).as("n"),
      F.sum(F.size($"tl")).as("sum_dl"))
    val post = docs
      .select($"doc_id", F.size($"tl").as("dl"), F.explode($"tl").as("term"))
      .where(F.col("term").isin(terms: _*))
      .groupBy("doc_id", "term", "dl")
      .agg(F.count(F.lit(1)).as("tf"))
    scoreAndRank(post, stats, queries, k, k1, b)
  }

  /** The scoring chain shared by the inline and persisted-index BM25
    * paths: `post` holds (doc_id, term, dl, tf) postings ALREADY
    * restricted to (or prunable by) the query term set, `stats` the
    * one-row (n, sum_dl). Per-term df derives from the pruned postings
    * (unique per (doc, term), so count(*) IS df(t)) — never persisted,
    * always consistent with the postings.
    */
  private[graft] def scoreAndRank(post: DataFrame, stats: DataFrame,
                                  queries: Seq[(Int, String)], k: Int,
                                  k1: Double, b: Double): DataFrame = {
    val spark = post.sparkSession
    import spark.implicits._
    val qt = queries.flatMap { case (qid, q) =>
      tokenizeQuery(q).distinct.map(t => (qid, t))
    }.distinct.toDF("query_id", "term")
    val dft = post.groupBy("term").agg(F.count(F.lit(1)).as("df"))
    val avgdl = F.col("sum_dl").cast("double") / F.col("n").cast("double")
    val idf = F.log(F.lit(1.0) +
      (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)))
    val tfNorm = (F.col("tf") * F.lit(k1 + 1)) /
      (F.col("tf") + F.lit(k1) *
        (F.lit(1 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")))
    val contrib = post
      .join(F.broadcast(qt), "term")
      .join(F.broadcast(dft), "term")
      .crossJoin(F.broadcast(stats))
      .withColumn("avgdl", avgdl)
      .withColumn("c", F.round(idf * tfNorm, 9).cast("decimal(20,9)"))
    val scored = contrib.groupBy("query_id", "doc_id")
      .agg(F.round(F.sum("c").cast("double"), 6).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(F.col("score").desc, F.col("doc_id").asc)
    scored.withColumn("rank", F.row_number().over(w))
      .where(F.col("rank") <= k)
      .select("query_id", "doc_id", "score", "rank")
  }

  /** Exact PHRASE search over positional postings — the retrieval
    * feature token-bag BM25 cannot express ("sort merge" as a unit,
    * not two independent terms). Per query phrase [t₀..t₍ₘ₋₁₎], a
    * document occurrence is a start position s with token(s+i) = tᵢ
    * for all i; documents rank by occurrence count (phrase tf —
    * INTEGER, so the gate is division-free), ties by doc_id.
    *
    * Plan shape (one join + two aggregates, no per-query scan): the
    * corpus posexplodes ONCE into (doc, term, pos); a broadcast
    * (query, idx, term) table restricts it to phrase terms
    * (broadcast-join pruning); grouping on (query, doc, pos − idx)
    * counts DISTINCT idx — a group reaching m is exactly a phrase
    * occurrence at that start (repeated phrase terms land distinct
    * idxs in the same group; overlapping occurrences are separate
    * groups). Returns (query_id, doc_id, phrase_tf, rank ≤ k).
    */
  def phraseTopK(df: DataFrame, idCol: String, textCol: String,
                 queries: Seq[(Int, String)], k: Int = 10): DataFrame = {
    val spark = df.sparkSession
    val ex = df.select(F.col(idCol).as("doc_id"),
        F.posexplode(TextOps.tokens(F.col(textCol))).as(Seq("pos", "term")))
    phraseScore(ex, spark, queries, k)
  }

  private def phraseScore(ex: DataFrame,
                          spark: org.apache.spark.sql.SparkSession,
                          queries: Seq[(Int, String)], k: Int): DataFrame = {
    import spark.implicits._
    require(queries.nonEmpty, "at least one query")
    val qtoks = queries.map { case (qid, q) => qid -> tokenizeQuery(q) }
    require(qtoks.forall(_._2.nonEmpty), "every phrase needs >= 1 token")
    val qt = qtoks.flatMap { case (qid, ts) =>
      ts.zipWithIndex.map { case (t, i) => (qid, i, t) }
    }.toDF("query_id", "idx", "term")
    val qm = qtoks.map { case (qid, ts) => (qid, ts.size) }.toDF("query_id", "m")
    val starts = ex
      .join(F.broadcast(qt), "term")
      .groupBy(F.col("query_id"), F.col("doc_id"),
        (F.col("pos") - F.col("idx")).as("start"))
      .agg(F.countDistinct(F.col("idx")).as("nidx"))
      .join(F.broadcast(qm), "query_id")
      .where(F.col("nidx") === F.col("m"))
    val tf = starts.groupBy("query_id", "doc_id")
      .agg(F.count(F.lit(1)).as("phrase_tf"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(F.col("phrase_tf").desc, F.col("doc_id").asc)
    tf.withColumn("rank", F.row_number().over(w))
      .where(F.col("rank") <= k)
      .select("query_id", "doc_id", "phrase_tf", "rank")
  }

  /** Persist the positional postings (doc_id, term, pos) as a
    * term-bucketed+sorted table — [[phraseTopK]] re-tokenizes the
    * corpus per batch; the index pays that once, and a query batch's
    * driver-literal term set prunes the read to its terms' buckets
    * (the bm25Build storage story with positions kept instead of
    * folded into tf).
    */
  def phraseBuild(df: DataFrame, idCol: String, textCol: String,
                  table: String, nBuckets: Int = 64): Unit = {
    val post = df.select(F.col(idCol).as("doc_id"),
      F.posexplode(TextOps.tokens(F.col(textCol))).as(Seq("pos", "term")))
    graft.sources.Sources.writeBucketedMulti(post, table,
      bucketBy = Seq("term"), nBuckets = nBuckets, sortBy = Seq("term"))
  }

  /** Serve a phrase-query batch from a [[phraseBuild]] index: the
    * term-pruned postings read (pushed isin on the sorted files)
    * feeds the IDENTICAL occurrence-counting chain, so with the same
    * corpus this equals [[phraseTopK]] row-for-row (the
    * text_search_phrase_idx equality gate). Serving cost is
    * Σ_t df(t)·tf̄ positions over the phrase terms only.
    */
  def phraseQueryIndex(spark: org.apache.spark.sql.SparkSession,
                       table: String, queries: Seq[(Int, String)],
                       k: Int = 10): DataFrame = {
    require(queries.nonEmpty, "at least one query")
    val terms = queries.flatMap(q => tokenizeQuery(q._2)).distinct
    val ex = spark.table(table)
      .where(F.col("term").isin(terms: _*))
      .select("doc_id", "term", "pos")
    phraseScore(ex, spark, queries, k)
  }

  /** Build a PERSISTED BM25 index: the FULL postings table
    * (doc_id, term, dl, tf) as a managed table BUCKETED (and sorted)
    * by term, plus the one-row exact-integer corpus stats at
    * `statsPath`. [[bm25TopK]] re-tokenizes the corpus per query
    * batch; at 100 TB that is a full-corpus scan per batch. The index
    * pays that scan ONCE — afterwards a query batch's driver-literal
    * term set prunes the postings read to its terms' buckets (bucket
    * pruning + a pushed isin filter on the sorted-by-term files), so
    * serving cost is bounded by Σ_t df(t) postings, independent of
    * corpus size. Per-term df is NOT persisted: it derives from the
    * pruned postings at query time (a ≤|terms|-key aggregate), so the
    * index has no derived column to drift out of sync.
    */
  def bm25Build(df: DataFrame, idCol: String, textCol: String,
                table: String, statsPath: String, nBuckets: Int = 64,
                metaCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val docs = df.select(F.col(idCol).as("doc_id") +:
      TextOps.tokens(F.col(textCol)).as("tl") +: metaCols.map(F.col): _*)
    val post = docs
      .select($"doc_id" +: F.size($"tl").as("dl") +:
        F.explode($"tl").as("term") +: metaCols.map(F.col): _*)
      .groupBy(F.col("doc_id") +: F.col("term") +: F.col("dl") +:
        metaCols.map(F.col): _*)
      .agg(F.count(F.lit(1)).as("tf"))
      // ingest_batch lineage (the StreamingSearch convention, -1 =
      // initial build): a crashed bm25IndexAppend is cleaned by
      // rewriting the table without that batch's rows — without the
      // column a partial append is indistinguishable from the corpus
      .withColumn("ingest_batch", F.lit(-1L))
    graft.sources.Sources.writeBucketedMulti(post, table,
      bucketBy = Seq("term"), nBuckets = nBuckets, sortBy = Seq("term"))
    // stats: one global row, or — when the index carries metadata
    // columns (metaCols, the filtered-search hook) — one row PER meta
    // group, so a filtered query scores BM25 over the matching
    // sub-corpus with that slice's exact N/avgdl (pre-filter
    // semantics); the query path sums the selected rows (n and Σdl
    // are additive exact integers), so the unfiltered query over a
    // grouped index still sees the global stats
    val stats =
      if (metaCols.isEmpty)
        docs.agg(F.count(F.lit(1)).as("n"), F.sum(F.size($"tl")).as("sum_dl"))
      else
        docs.groupBy(metaCols.map(F.col): _*)
          .agg(F.count(F.lit(1)).as("n"), F.sum(F.size($"tl")).as("sum_dl"))
    stats.coalesce(1).write.mode("overwrite").parquet(statsPath)
  }

  /** Append a document batch to an existing [[bm25Build]] index — the
    * write half of the per-batch ingest loop (the minhashIndexAppend
    * pattern): the batch's postings append into the term-bucketed
    * table (same bucket spec, enforced by Spark) and the one-row
    * corpus stats are re-written as the exact-integer sums of old and
    * batch (n, Σdl are additive). Batch doc ids must be NEW — BM25's
    * postings are unique per (doc, term), so re-ingesting an existing
    * id would double its rows. After the append, [[bm25QueryIndex]]
    * over the index equals [[bm25TopK]] over the unioned corpus
    * row-for-row (the text_search_bm25_incr equality gate); only the
    * BATCH is tokenized — the existing corpus is never re-read.
    *
    * Crash recovery: postings append FIRST, stats overwrite second. A
    * crash between the two leaves postings whose df the stats don't
    * reflect — the index would silently mis-score. Every appended
    * posting is stamped `ingest_batch = batchId` (initial build rows
    * carry -1), so the recovery is mechanical: rewrite the table
    * keeping `ingest_batch != batchId` (stats were never touched),
    * then re-run the append.
    */
  def bm25IndexAppend(batch: DataFrame, idCol: String, textCol: String,
                      table: String, statsPath: String,
                      nBuckets: Int = 64, batchId: Long = 0L): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    // guard BEFORE any write: a meta-grouped index (bm25Build
    // metaCols) has per-group stats rows the additive overwrite below
    // cannot maintain — refuse loudly with nothing half-appended
    val oldStats = spark.read.parquet(statsPath)
      .select(F.col("n"), F.col("sum_dl")).collect()
    require(oldStats.length == 1,
      "bm25IndexAppend supports plain (metaCols-free) indexes only: " +
        s"found ${oldStats.length} stats rows — rebuild a meta-grouped " +
        "index instead of appending")
    val old = oldStats.head
    val docs = batch.select(F.col(idCol).as("doc_id"),
      TextOps.tokens(F.col(textCol)).as("tl"))
    val post = docs
      .select($"doc_id", F.size($"tl").as("dl"), F.explode($"tl").as("term"))
      .groupBy("doc_id", "term", "dl")
      .agg(F.count(F.lit(1)).as("tf"))
      .withColumn("ingest_batch", F.lit(batchId))
    graft.sources.Sources.writeBucketedMulti(post, table,
      bucketBy = Seq("term"), nBuckets = nBuckets, sortBy = Seq("term"),
      mode = org.apache.spark.sql.SaveMode.Append)
    docs.agg(
        (F.count(F.lit(1)) + F.lit(old.getLong(0))).as("n"),
        (F.coalesce(F.sum(F.size($"tl")), F.lit(0L)) + F.lit(old.getLong(1))).as("sum_dl"))
      .coalesce(1).write.mode("overwrite").parquet(statsPath)
  }

  /** Query a persisted BM25 index built by [[bm25Build]]. Identical
    * scoring chain and arithmetic as [[bm25TopK]] — with the same
    * corpus and parameters the results are row-for-row equal (the
    * text_search_bm25_idx equality gate) — but the corpus is never
    * re-tokenized: the query terms prune the bucketed postings scan.
    */
  def bm25QueryIndex(spark: org.apache.spark.sql.SparkSession,
                     table: String, statsPath: String,
                     queries: Seq[(Int, String)], k: Int = 10,
                     k1: Double = 1.2, b: Double = 0.75,
                     filter: Option[Column] = None): DataFrame = {
    require(queries.nonEmpty, "at least one query")
    val terms = queries.flatMap(q => tokenizeQuery(q._2)).distinct
    // metadata predicate (filtered/hybrid search — needs the column in
    // bm25Build's metaCols): rides on the term-pruned bucketed scan as
    // a pushed filter, and selects the matching per-group stats rows,
    // so the query scores BM25 over the sub-corpus with the SLICE's
    // N/avgdl and df — pre-filter semantics; query cost stays bounded
    // by the slice's Σ df(t) postings
    val post = filter.foldLeft(
      spark.table(table).where(F.col("term").isin(terms: _*)))(_ where _)
    // n and Σdl are additive exact integers, so summing the selected
    // stats rows is exact — and the unfiltered query over a
    // meta-grouped index recovers the global stats the same way
    val stats = filter.foldLeft(spark.read.parquet(statsPath))(_ where _)
      .agg(F.sum("n").as("n"), F.sum("sum_dl").as("sum_dl"))
    scoreAndRank(post, stats, queries, k, k1, b)
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher SIGIR'09) of
    * ranked retrieval arms — the standard hybrid-search combiner
    * (lexical BM25 + dense vector, or any number of arms):
    *
    *   rrf(q,d) = Σ_{arms containing (q,d)} 1 / (kRrf + rank_arm(q,d))
    *
    * Rank-based, so the arms' score scales never need calibrating.
    * Each arm is a (query_id, doc_id, rank) DataFrame already truncated
    * to its own top-k, so the union the fusion aggregates is bounded by
    * |queries|·k·|arms| rows — at 100 TB the corpus-sized work happened
    * inside the arms (each with its own scale story); fusion itself
    * shuffles only the short lists. Contributions are exact rationals
    * of integer ranks rounded to 9dp and accumulated in DECIMAL, so the
    * fused score is addition-order-free cross-engine; ties break on
    * ascending doc id. `n_arms` reports how many arms surfaced the doc
    * (the agreement diagnostic hybrid deployments alert on).
    *
    * PRECONDITION: each arm must emit UNIQUE (query_id, doc_id) pairs
    * — the natural shape of a ranked top-k list, and what [[bm25TopK]]
    * and the ANN top-k operators produce. A duplicated doc inside one
    * arm would double-count its contribution and inflate n_arms; no
    * dedup is applied here because such a duplicate means the arm is
    * broken, not that the fusion should paper over it.
    *
    * Output: (query_id, doc_id, rrf_score, n_arms, rank), rank 1..k.
    */
  def rrfFuse(arms: Seq[DataFrame], k: Int = 10, kRrf: Int = 60): DataFrame = {
    require(arms.nonEmpty, "at least one ranked arm")
    val unioned = arms.map(_.select(F.col("query_id"), F.col("doc_id"),
      F.col("rank").cast("long").as("rank"))).reduce(_ unionByName _)
    val contrib = unioned.withColumn("c",
      F.round(F.lit(1.0) / (F.lit(kRrf) + F.col("rank")), 9).cast("decimal(20,9)"))
    val fused = contrib.groupBy("query_id", "doc_id")
      .agg(F.round(F.sum("c").cast("double"), 6).as("rrf_score"),
        F.count(F.lit(1)).as("n_arms"))
    val w = Window.partitionBy("query_id")
      .orderBy(F.col("rrf_score").desc, F.col("doc_id").asc)
    fused.withColumn("rank", F.row_number().over(w))
      .where(F.col("rank") <= k)
      .select("query_id", "doc_id", "rrf_score", "n_arms", "rank")
  }
}
