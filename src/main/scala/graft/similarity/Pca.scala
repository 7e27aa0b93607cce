package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Deterministic PCA for embedding columns — the dimensionality
  * reduction an embedding store runs before indexing (the classic
  * pre-ANN transform: FAISS's PCAMatrix / OPQ pre-rotations are the
  * public pattern; Jolliffe's PCA is the method itself).
  *
  * Split of work, sized to what each side is good at:
  *  - DISTRIBUTED: the mean vector and the d×d covariance of a
  *    bounded deterministic sample (the shared ANN trainer sample —
  *    a pure function of the ids). The covariance is ONE map-side
  *    Gram aggregate ([[graft.functions.CovUpperSumAgg]]): each task
  *    accumulates all (i ≤ j) products of its centered vectors into a
  *    flat d(d+1)/2 exact fixed-point long buffer, merged
  *    associatively — products never become rows, the shuffle carries
  *    one buffer per task, and exact integer sums keep the matrix
  *    partitioning-invariant.
  *  - DRIVER: the d×d symmetric eigensolve (cyclic Jacobi, fixed
  *    sweep order → deterministic) — O(d^3) scalar math on a matrix
  *    that is driver-small BY CONSTRUCTION; distributing it would be
  *    all overhead.
  *  - DISTRIBUTED again: projection is a shuffle-free per-row
  *    transform against the literal (mean, components) — each
  *    projection coordinate is Σ_j w_j·(x_j − μ_j) with per-term 9dp
  *    rounding and DECIMAL accumulation, so the value is
  *    addition-order-free and the SQL twin replays it exactly from
  *    the dumped component matrix.
  *
  * Sign convention: each eigenvector's largest-|w| element (lowest
  * index on ties) is made positive — eigenvectors are only defined up
  * to sign, and the convention pins the output for parity.
  */
object Pca {

  /** Mean vector + top-k principal components of the bounded sample's
    * covariance (population convention, divisor n). Returns
    * (mean[d], components[k][d], eigenvalues[k]) with components
    * orthonormal, eigenvalue-descending, sign-normalized.
    */
  def pcaTrain(df: DataFrame, idCol: String, vecCol: String, k: Int,
               maxTrain: Int = 100000,
               rowCountHint: Option[Long] = None)
      : (Seq[Double], Seq[Seq[Double]], Seq[Double]) = {
    require(k >= 1, "k >= 1")
    val c = df.select(F.col(idCol).as("neighbor_id"), F.col(vecCol).as("cv"))
    val sample = Ann.boundedTrainSample(c, maxTrain, rowCountHint)
    val n = sample.count().toDouble
    require(n >= 2, "PCA needs at least two sample vectors")
    // mean per dimension, decimal-accumulated
    val mu = sample
      .select(F.posexplode(F.transform(F.col("cv"), x => x.cast("double")))
        .as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(F.avg(F.col("x").cast("decimal(28,10)")).cast("double").as("m"))
      .orderBy("pos").collect().map(_.getDouble(1))
    val d = mu.length
    require(k <= d, s"k=$k exceeds dimension $d")
    val muL = F.typedlit(mu.toSeq)
    // centered upper-triangle covariance: ONE map-side pass with the
    // Gram aggregate (graft.functions.CovUpperSumAgg — d(d+1)/2
    // exact fixed-point long cells per task, merged associatively;
    // replaces the d(d+1)/2-rows-per-vector explode + decimal hash
    // aggregate that dominated training). Products round once to the
    // 1e-12 grid and sum exactly, so the matrix is partition-order
    // invariant; the long→double rescale goes through BigDecimal for
    // an exact decimal read.
    val centered = sample.select(
      F.zip_with(F.transform(F.col("cv"), x => x.cast("double")),
        F.sequence(F.lit(0), F.lit(d - 1)),
        (x, i) => x - F.element_at(muL, i + 1)).as("cv0"))
    val cellsFlat = centered
      .agg(graft.functions.CovUpperSumAgg
        .covUpperSumAgg(F.col("cv0"), d).as("s"))
      .head().getSeq[Long](0)
    sample.unpersist()
    def cellAt(i: Int, j: Int): Double = {
      val (lo, hi) = (math.min(i, j), math.max(i, j))
      val idx = lo * d - lo * (lo - 1) / 2 + (hi - lo)
      new java.math.BigDecimal(
        java.math.BigInteger.valueOf(cellsFlat(idx)), 12).doubleValue() / n
    }
    val cov = Array.tabulate(d, d)((i, j) => cellAt(i, j))
    val (evals, evecs) = jacobiEigen(cov)
    // top-k by eigenvalue desc, index asc on ties; sign-normalize
    val order = evals.indices.sortBy(i => (-evals(i), i)).take(k)
    val comps = order.map { ci =>
      val v = evecs.map(_(ci))
      val pivot = v.indices.maxBy(j => (math.abs(v(j)), -j))
      val sgn = if (v(pivot) < 0) -1.0 else 1.0
      v.map(_ * sgn).toSeq
    }
    (mu.toSeq, comps, order.map(evals(_)))
  }

  /** Cyclic Jacobi eigensolve of a symmetric matrix: returns
    * (eigenvalues, eigenvector matrix with vectors in COLUMNS).
    * Fixed (p, q) sweep order and a pure function of the input —
    * deterministic. Converges quadratically; 30 sweeps is far beyond
    * what a 64x64 covariance needs.
    */
  private[graft] def jacobiEigen(a: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val n = a.length
    val m = Array.tabulate(n, n)((i, j) => a(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    def off(): Double = {
      var s = 0.0
      for (i <- 0 until n; j <- i + 1 until n) s += m(i)(j) * m(i)(j)
      s
    }
    while (sweep < 30 && off() > 1e-22) {
      for (p <- 0 until n - 1; q <- p + 1 until n) {
        val apq = m(p)(q)
        if (math.abs(apq) > 1e-300) {
          val theta = (m(q)(q) - m(p)(p)) / (2.0 * apq)
          val t =
            if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
            else -1.0 / (-theta + math.sqrt(theta * theta + 1.0))
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          for (i <- 0 until n) {
            val mip = m(i)(p); val miq = m(i)(q)
            m(i)(p) = c * mip - s * miq
            m(i)(q) = s * mip + c * miq
          }
          for (i <- 0 until n) {
            val mpi = m(p)(i); val mqi = m(q)(i)
            m(p)(i) = c * mpi - s * mqi
            m(q)(i) = s * mpi + c * mqi
          }
          for (i <- 0 until n) {
            val vip = v(i)(p); val viq = v(i)(q)
            v(i)(p) = c * vip - s * viq
            v(i)(q) = s * vip + c * viq
          }
        }
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => m(i)(i)), v)
  }

  /** Project every vector onto the components — shuffle-free against
    * the literal (mean, components); each coordinate is the 9dp-term
    * DECIMAL-accumulated dot product rounded to 6dp (order-free, SQL-
    * replayable). Output: (idCol, proj array<double> of length k).
    */
  def pcaProject(df: DataFrame, idCol: String, vecCol: String,
                 mean: Seq[Double], comps: Seq[Seq[Double]]): DataFrame =
    // the oracle-pinned per-term round9/decimal9 chain, computed by
    // the codegen'd kernel ([[graft.functions.PcaProjectExpr]] — the
    // declarative k × d decimal F.aggregate folds it replaces
    // evaluated interpreted per element and dominated the
    // PCA-composed index builds); arithmetic is bit-identical, the
    // exact scaled-long sum keeps it addition-order-free
    df.select(F.col(idCol),
      graft.functions.PcaProjectExpr
        .pcaProject(F.col(vecCol), mean, comps).as("proj"))

  /** ANN in the PCA-projected space — the classic dimensionality-
    * reduced first pass (FAISS PCAMatrix + flat search): corpus and
    * queries project to kDim coordinates, the approximate scan scores
    * cosine in THAT space (kDim/d of the scan arithmetic and, in an
    * index deployment, of the stored bytes), the top rerank·k
    * candidates re-rank exactly from the full vectors. Precision and
    * ordering of the returned set are exact (re-rank); recall depends
    * on how much variance kDim captures — gate it with the floor
    * pattern (ann_pca_recall).
    */
  def pcaTopK(queries: DataFrame, qId: String, qVec: String,
              corpus: DataFrame, cId: String, cVec: String,
              k: Int, kDim: Int = 16, rerank: Int = 4,
              maxTrain: Int = 100000,
              rowCountHint: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (mu, comps, _) = pcaTrain(corpus, cId, cVec, kDim, maxTrain, rowCountHint)
    val pc = pcaProject(corpus, cId, cVec, mu, comps)
      .select(F.col(cId).as("neighbor_id"), F.col("proj").as("pc"))
    val pq = pcaProject(queries, qId, qVec, mu, comps)
      .select(F.col(qId).as("query_id"), F.col("proj").as("pq"))
    val approx = pc.crossJoin(F.broadcast(pq))
      .where(F.col("query_id") =!= F.col("neighbor_id"))
      .withColumn("asim", Ann.cosine(F.col("pq"), F.col("pc")))
    val wa = Window.partitionBy("query_id")
      .orderBy(F.col("asim").desc, F.col("neighbor_id").asc)
    val cands = approx.withColumn("__rk", F.row_number().over(wa))
      .where(F.col("__rk") <= k.toLong * rerank)
      .select("query_id", "neighbor_id")
    val q = queries.select(F.col(qId).as("query_id"), F.col(qVec).as("qv"))
    val c = corpus.select(F.col(cId).as("neighbor_id"), F.col(cVec).as("cv"))
    val scored = cands.join(c, "neighbor_id")
      .join(F.broadcast(q), "query_id")
      .withColumn("sim", Ann.cosine(F.col("qv"), F.col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(F.col("sim").desc, F.col("neighbor_id").asc)
    scored.withColumn("rank", F.row_number().over(w).cast("long"))
      .where(F.col("rank") <= k)
      .select(F.col("query_id"), F.col("neighbor_id"), F.col("rank"),
        F.round(F.col("sim"), 6).as("similarity"))
  }

  /** Persist trained PCA parameters as (comp, vec) rows — comp = -1
    * is the mean, comp 0..k-1 the components in eigenvalue order. The
    * driver-small twin of Ann.writeCentroids for the projection.
    */
  def writePcaParams(spark: org.apache.spark.sql.SparkSession,
                     mean: Seq[Double], comps: Seq[Seq[Double]],
                     path: String): Unit = {
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val rows = (org.apache.spark.sql.Row(-1, mean) +:
      comps.zipWithIndex.map { case (w, i) => org.apache.spark.sql.Row(i, w) })
    spark.createDataFrame(rows.asJava, StructType(Seq(
        StructField("comp", IntegerType, nullable = false),
        StructField("vec", ArrayType(DoubleType, containsNull = false)))))
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Read back [[writePcaParams]] output as (mean, components). */
  def readPcaParams(spark: org.apache.spark.sql.SparkSession,
                    path: String): (Seq[Double], Seq[Seq[Double]]) = {
    val rows = spark.read.parquet(path).orderBy("comp").collect()
    val (m, c) = rows.partition(_.getInt(0) < 0)
    (m.head.getSeq[Double](1).toSeq, c.map(_.getSeq[Double](1).toSeq).toSeq)
  }

  /** Build the PCA-composed partitioned ANN index — the FAISS
    * `PCARx,IVFn,PQm` factory chain (the public pre-transform + index
    * composition pattern): train PCA on the corpus sample, PROJECT
    * every vector to kDim coordinates, then train and build the
    * IVF+PQ index IN THE PROJECTED SPACE. The layout at `path`:
    * `pca` (mean + component rows), and the [[graft.similarity.Ann.ivfpqBuild]]
    * layout (`centroids`, `codebooks`, cell-partitioned `codes`) over
    * the projected vectors.
    *
    * Scale: this turns the flat [[pcaTopK]] scan into a PRUNED one —
    * a query batch reads ~nProbe/nCells of the corpus's code files
    * (partition pruning) and each row is m bytes of PQ codes over
    * kDim dims (the two compression levers multiply with the
    * projection's kDim/d); the full-width vectors surface only in the
    * candidate re-rank semi-join.
    */
  def pcaIvfpqBuild(corpus: DataFrame, cId: String, cVec: String,
                    path: String, kDim: Int = 24, nCells: Int = 16,
                    m: Int = 8, ksub: Int = 16, iters: Int = 3,
                    maxTrain: Int = 100000,
                    rowCountHint: Option[Long] = None,
                    extraCols: Seq[String] = Nil,
                    trainCorpus: Option[DataFrame] = None): Unit = {
    require(kDim % m == 0, s"projected dim $kDim must be divisible by m=$m")
    // trainCorpus (the ivfpqBuild contract lifted to the composed
    // index): ALL learned parameters — the PCA basis AND the IVF/PQ
    // quantizers — train on the given slice while the FULL corpus is
    // projected and encoded under them; the one-shot reference for
    // the frozen-quantizer append/streaming-ingest equality specs.
    val trainDf = trainCorpus.getOrElse(corpus)
    val (mu, comps, _) = pcaTrain(trainDf, cId, cVec, kDim, maxTrain,
      rowCountHint.filter(_ => trainCorpus.isEmpty))
    writePcaParams(corpus.sparkSession, mu, comps, s"$path/pca")
    // extraCols (metadata-filtered search) ride the projected frame —
    // an id-keyed join back because pcaProject keeps only (id, proj)
    val projected = withExtras(
      pcaProject(corpus, cId, cVec, mu, comps), corpus, cId, extraCols)
    Ann.ivfpqBuild(projected, cId, "proj", path, nCells, m, ksub, iters,
      maxTrain, rowCountHint, extraCols,
      trainCorpus.map(t => pcaProject(t, cId, cVec, mu, comps)))
  }

  /** Append a vector batch to a [[pcaIvfpqBuild]] index under ALL its
    * frozen parameters — the batch projects through the PERSISTED PCA
    * params first, then PQ-encodes under the persisted quantizers
    * ([[graft.similarity.Ann.ivfpqIndexAppend]]). Do NOT call the raw
    * ivfpqIndexAppend on a PCA-composed index: the codebooks live in
    * the kDim projected space, and slicing an unprojected full-width
    * vector into kDim/m-sized subspaces would encode WRONG codes
    * silently (array slicing doesn't length-check).
    */
  def pcaIvfpqIndexAppend(spark: org.apache.spark.sql.SparkSession,
                          path: String, batch: DataFrame,
                          cId: String, cVec: String,
                          extraCols: Seq[String] = Nil,
                          batchId: Long = 0L): Unit = {
    val (mu, comps) = readPcaParams(spark, s"$path/pca")
    val projected = withExtras(
      pcaProject(batch, cId, cVec, mu, comps), batch, cId, extraCols)
    Ann.ivfpqIndexAppend(spark, path, projected, cId, "proj",
      extraCols, batchId)
  }

  private def withExtras(projected: DataFrame, src: DataFrame,
                         cId: String, extraCols: Seq[String]): DataFrame =
    if (extraCols.isEmpty) projected
    else projected.join(src.select((cId +: extraCols).map(F.col): _*), cId)

  /** Query a [[pcaIvfpqBuild]] index: the query batch projects through
    * the persisted PCA params, probes its nProbe nearest cells in the
    * projected space (partition-pruned codes scan), ADC-scores the
    * projected codes, and re-ranks the top rerank·k candidates EXACTLY
    * from the ORIGINAL full-width vectors (the split-space re-rank) —
    * so precision and ordering of the returned set are exact, and only
    * recall depends on the projection + quantization (gate with the
    * floor pattern, ann_pca_ivfpq_recall).
    */
  def pcaIvfpqQueryIndex(spark: org.apache.spark.sql.SparkSession,
                         path: String,
                         queries: DataFrame, qId: String, qVec: String,
                         corpus: DataFrame, cId: String, cVec: String,
                         k: Int, nProbe: Int = 4, rerank: Int = 4,
                         filter: Option[org.apache.spark.sql.Column] = None)
      : DataFrame = {
    val (mu, comps) = readPcaParams(spark, s"$path/pca")
    val scanQ = pcaProject(queries, qId, qVec, mu, comps)
    Ann.ivfpqQueryIndexSplit(spark, path, scanQ, qId, "proj",
      queries, qVec, corpus, cId, cVec, k, nProbe, rerank, filter)
  }

  /** End-to-end training gate, one boolean row: (a) the component
    * matrix is orthonormal (driver math over the literals, |VᵀV − I|
    * max element); (b) the per-component variance of the TRAINING
    * SAMPLE's projections is non-increasing and matches the reported
    * eigenvalues — in exact arithmetic sample-projection variance
    * under the population convention IS the eigenvalue, so this ties
    * the distributed covariance, the driver eigensolve, and the
    * projection arithmetic together: break any of them and a boolean
    * flips (the literal-true oracle pattern). Tolerances absorb only
    * the documented 9dp/12dp decimal roundings.
    */
  def trainGate(df: DataFrame, idCol: String, vecCol: String, k: Int,
                maxTrain: Int = 100000,
                rowCountHint: Option[Long] = None): DataFrame = {
    val (mu, comps, evals) = pcaTrain(df, idCol, vecCol, k, maxTrain, rowCountHint)
    val d = mu.size
    val orthoErr = (for (a <- comps.indices; b <- comps.indices) yield {
      val dot = (0 until d).map(j => comps(a)(j) * comps(b)(j)).sum
      math.abs(dot - (if (a == b) 1.0 else 0.0))
    }).max
    val c = df.select(F.col(idCol).as("neighbor_id"), F.col(vecCol).as("cv"))
    val sample = Ann.boundedTrainSample(c, maxTrain, rowCountHint)
    val stats = pcaProject(sample, "neighbor_id", "cv", mu, comps)
      .select(F.posexplode(F.col("proj")).as(Seq("comp", "p")))
      .groupBy("comp")
      .agg(F.avg(F.col("p").cast("decimal(28,10)")).cast("double").as("m"),
        F.avg((F.col("p") * F.col("p")).cast("decimal(28,10)")).cast("double").as("m2"))
      .orderBy("comp").collect()
      .map(r => r.getDouble(1) -> r.getDouble(2))
    sample.unpersist()
    val vars = stats.map { case (m, m2) => m2 - m * m }
    val tol = 1e-4 * math.max(1.0, evals.headOption.getOrElse(1.0))
    val ordered = vars.indices.drop(1).forall(i => vars(i) <= vars(i - 1) + tol)
    val eigenMatch = vars.indices.forall(i => math.abs(vars(i) - evals(i)) <= tol)
    val spark = df.sparkSession
    import spark.implicits._
    Seq((k, orthoErr < 1e-9, ordered, eigenMatch))
      .toDF("k", "orthonormal_ok", "variance_order_ok", "eigen_match_ok")
  }
}
