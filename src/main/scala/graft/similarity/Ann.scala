package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

/** Similarity search over an embedding column (array<float>).
  *
  * - cosine/topK: exact brute force — the correctness baseline. The
  *   query side is broadcast, so the corpus is scanned exactly once
  *   with no shuffle of the big side.
  * - hyperplane LSH (Charikar 2002 random-projection signatures):
  *   the scale path — bucket join replaces the full scan; hyperplanes
  *   are pseudo-random from xxhash64 so signatures are deterministic
  *   and reproducible across runs/executors with no driver state.
  */
object Ann {

  /** Cosine similarity of two array<float/double> columns; native
    * single-pass expression, left-to-right double accumulation
    * (deterministic order, no per-element lambda dispatch).
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.HashExprs.cosineSim(a, b)

  /** Exact top-k nearest corpus vectors per query vector (cosine).
    * Queries are broadcast; tie-break on corpus id ascending.
    * Output: (query_id, neighbor_id, rank, similarity[r6]).
    */
  def cosineTopK(queries: DataFrame, qId: String, qVec: String,
                 corpus: DataFrame, cId: String, cVec: String,
                 k: Int): DataFrame = {
    val q = queries.select(F.col(qId).as("query_id"), F.col(qVec).as("qv"))
    val c = corpus.select(F.col(cId).as("neighbor_id"), F.col(cVec).as("cv"))
    val scored = c.crossJoin(F.broadcast(q))
      .where(F.col("query_id") =!= F.col("neighbor_id"))
      .withColumn("sim", cosine(F.col("qv"), F.col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(F.col("sim").desc, F.col("neighbor_id").asc)
    scored.withColumn("rank", F.row_number().over(w).cast("long"))
      .where(F.col("rank") <= k)
      .select(F.col("query_id"), F.col("neighbor_id"), F.col("rank"),
        F.round(F.col("sim"), 6).as("similarity"))
  }

  /** All pairs (id1 < id2) with cosine >= threshold — exact pair join
    * (used as the dedup-by-embedding correctness baseline).
    */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String,
                  threshold: Double): DataFrame = {
    val a = df.select(F.col(idCol).as("id1"), F.col(vecCol).as("v1"))
    val b = df.select(F.col(idCol).as("id2"), F.col(vecCol).as("v2"))
    a.join(b, F.col("id1") < F.col("id2"))
      .withColumn("sim", cosine(F.col("v1"), F.col("v2")))
      .where(F.col("sim") >= threshold)
      .select(F.col("id1"), F.col("id2"), F.round(F.col("sim"), 6).as("similarity"))
  }

  /** nPlanes-bit LSH signature of a vector: bit p = sign(v . r_p) with
    * deterministic pseudo-random Rademacher hyperplanes from
    * xxh64(i, seed 42 + p) parity (native one-pass expression).
    */
  def lshSignature(vec: Column, dim: Int, nPlanes: Int): Column =
    graft.functions.HashExprs.lshSig(vec, nPlanes)

  /** IVF (inverted-file) ANN: a coarse quantizer of nCells centroids is
    * Lloyd-trained on a bounded deterministic sample (few iterations —
    * driver holds only the k x dim centroid matrix, like MLlib KMeans),
    * the corpus is partitioned by nearest cell in a single pass, and
    * each query brute-forces only its nProbe nearest cells. The per-row cell assignment is a native expression with the
    * centroid matrix riding in the plan; at 100 TB the corpus scan is
    * one pass and the candidate join touches nProbe/nCells of the data.
    * Centroid means use decimal accumulation so training is
    * deterministic across partitionings.
    */
  def ivfTopK(queries: DataFrame, qId: String, qVec: String,
              corpus: DataFrame, cId: String, cVec: String,
              k: Int, nCells: Int = 16, nProbe: Int = 3,
              iters: Int = 3, maxTrain: Int = 100000): DataFrame = {
    import graft.functions.HashExprs.topCells
    val c = corpus.select(F.col(cId).as("neighbor_id"), F.col(cVec).as("cv"))
    val cents = trainCentroids(c, nCells, iters, maxTrain)

    // ONE full-corpus pass: assign each vector to its cell on the fly —
    // no cache, the assignment feeds the candidate join directly
    val corpusCells = c.select(F.col("neighbor_id"), F.col("cv"),
      F.element_at(topCells(F.col("cv"), cents, 1), 1).as("cell"))
    probeAndRank(corpusCells, queries, qId, qVec, cents, k, nProbe)
  }

  /** Lloyd-trained coarse-quantizer centroids over (neighbor_id, cv). */
  private def trainCentroids(c: DataFrame, nCells: Int, iters: Int,
                             maxTrain: Int): Seq[Seq[Double]] = {
    import graft.functions.HashExprs.topCells
    // Lloyd training runs on a BOUNDED sample, never the full corpus:
    // at 100 TB, caching the corpus and re-scanning it per iteration is
    // 1 + iters full passes; k-means centroid quality needs only a
    // representative sample (standard practice — e.g. faiss trains IVF
    // quantizers on a capped sample). Sampling is deterministic via an
    // id-hash filter (pushdown-friendly, no driver state), hard-bounded
    // by maxTrain, and the small sample is what gets cached.
    val sampled = c.where(F.pmod(F.xxhash64(F.col("neighbor_id")), F.lit(16)) === 0)
      .limit(maxTrain)
    val train = sampled.persist()
    val trainN = train.count()
    val trainSet =
      if (trainN >= nCells * 2L) train
      else { // tiny corpora: the sample can undershoot nCells — train on
             // up to maxTrain unsampled rows instead
        train.unpersist()
        val t = c.limit(maxTrain).persist()
        t.count()
        t
      }

    // deterministic init: the nCells lowest-id training vectors
    var cents: Seq[Seq[Double]] = trainSet.orderBy("neighbor_id").limit(nCells)
      .select(F.transform(F.col("cv"), x => x.cast("double")).as("v"))
      .collect().map(_.getSeq[Double](0).toSeq).toSeq

    for (_ <- 1 to iters) {
      val assigned = trainSet.select(
        F.element_at(topCells(F.col("cv"), cents, 1), 1).as("cell"), F.col("cv"))
      val means = assigned
        .select(F.col("cell"), F.posexplode(F.col("cv")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg(F.avg(F.col("x").cast("decimal(28,10)")).cast("double").as("m"))
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct(F.col("pos"), F.col("m")))).as("pm"))
        .select(F.col("cell"), F.transform(F.col("pm"), p => p.getField("m")).as("mean"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
      cents = cents.indices.map(i => means.getOrElse(i, cents(i)))
    }
    trainSet.unpersist()
    cents
  }

  /** Probe join + exact re-rank shared by the inline and persisted IVF
    * paths: queries (broadcast) meet only the corpus rows of their
    * nProbe nearest cells.
    */
  private def probeAndRank(corpusCells: DataFrame, queries: DataFrame,
                           qId: String, qVec: String,
                           cents: Seq[Seq[Double]], k: Int,
                           nProbe: Int): DataFrame = {
    import graft.functions.HashExprs.topCells
    val queryCells = queries
      .select(F.col(qId).as("query_id"), F.col(qVec).as("qv"),
        topCells(F.col(qVec), cents, nProbe).as("cells"))
      .select(F.col("query_id"), F.col("qv"), F.explode(F.col("cells")).as("cell"))
    val scored = corpusCells.join(F.broadcast(queryCells), "cell")
      .where(F.col("query_id") =!= F.col("neighbor_id"))
      .withColumn("sim", cosine(F.col("qv"), F.col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(F.col("sim").desc, F.col("neighbor_id").asc)
    scored.withColumn("rank", F.row_number().over(w).cast("long"))
      .where(F.col("rank") <= k)
      .select(F.col("query_id"), F.col("neighbor_id"), F.col("rank"),
        F.round(F.col("sim"), 6).as("similarity"))
  }

  /** Build a PERSISTED IVF index: train the coarse quantizer, assign
    * every corpus vector to its cell in one pass, and write the corpus
    * cell-partitioned to `path/index` (plus the centroid matrix to
    * `path/centroids`). Repeated query batches then touch only their
    * probed cells' files — partition pruning does the candidate
    * selection at the STORAGE layer, so a 100 TB corpus serves a query
    * batch by reading nProbe/nCells of its bytes, with no recurring
    * training or assignment cost.
    */
  def ivfBuild(corpus: DataFrame, cId: String, cVec: String, path: String,
               nCells: Int = 16, iters: Int = 3,
               maxTrain: Int = 100000): Unit = {
    import graft.functions.HashExprs.topCells
    val c = corpus.select(F.col(cId).as("neighbor_id"), F.col(cVec).as("cv"))
    val cents = trainCentroids(c, nCells, iters, maxTrain)
    val spark = corpus.sparkSession
    val centRows = cents.zipWithIndex.map { case (m, i) =>
      org.apache.spark.sql.Row(i, m)
    }
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    spark.createDataFrame(centRows.asJava, StructType(Seq(
        StructField("cell", IntegerType, nullable = false),
        StructField("mean", ArrayType(DoubleType, containsNull = false)))))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    c.select(F.col("neighbor_id"), F.col("cv"),
        F.element_at(topCells(F.col("cv"), cents, 1), 1).as("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/index")
  }

  /** Query a persisted IVF index built by [[ivfBuild]]. The probed
    * cell set (at most |queries| x nProbe distinct ints — query
    * batches are driver-small by nature) becomes a LITERAL isin
    * predicate on the index's partition column, so the scan prunes
    * unprobed cells before reading a byte.
    */
  def ivfQueryIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                    queries: DataFrame, qId: String, qVec: String,
                    k: Int, nProbe: Int = 3): DataFrame = {
    import graft.functions.HashExprs.topCells
    val cents: Seq[Seq[Double]] = spark.read.parquet(s"$path/centroids")
      .orderBy("cell").collect().map(_.getSeq[Double](1).toSeq).toSeq
    val probed = queries
      .select(F.explode(topCells(F.col(qVec), cents, nProbe)).as("cell"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val index = spark.read.parquet(s"$path/index")
      .where(F.col("cell").isin(probed: _*))
    probeAndRank(index, queries, qId, qVec, cents, k, nProbe)
  }

  /** Approximate top-k: candidates share the query's LSH bucket (or a
    * bucket within hamming 1, via multi-probe on single-bit flips),
    * exact cosine re-rank within candidates.
    */
  def lshTopK(queries: DataFrame, qId: String, qVec: String,
              corpus: DataFrame, cId: String, cVec: String,
              k: Int, dim: Int, nPlanes: Int = 12): DataFrame = {
    val sigC = corpus.select(F.col(cId).as("neighbor_id"), F.col(cVec).as("cv"),
      lshSignature(F.col(cVec), dim, nPlanes).as("bucket"))
    // multi-probe: the exact bucket plus all single-bit flips
    val probes = F.array_union(
      F.array(F.col("qsig")),
      F.transform(F.sequence(F.lit(0), F.lit(nPlanes - 1)),
        p => F.col("qsig").bitwiseXOR(F.pow(F.lit(2.0), p).cast("long"))))
    val sigQ = queries.select(F.col(qId).as("query_id"), F.col(qVec).as("qv"),
        lshSignature(F.col(qVec), dim, nPlanes).as("qsig"))
      .select(F.col("query_id"), F.col("qv"), F.explode(probes).as("bucket"))
    val scored = sigC.join(F.broadcast(sigQ), "bucket")
      .where(F.col("query_id") =!= F.col("neighbor_id"))
      .withColumn("sim", cosine(F.col("qv"), F.col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(F.col("sim").desc, F.col("neighbor_id").asc)
    scored.withColumn("rank", F.row_number().over(w).cast("long"))
      .where(F.col("rank") <= k)
      .select(F.col("query_id"), F.col("neighbor_id"), F.col("rank"),
        F.round(F.col("sim"), 6).as("similarity"))
  }
}
