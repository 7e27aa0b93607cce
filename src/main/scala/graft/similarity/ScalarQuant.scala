package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Scalar (per-dimension min/max) embedding quantization — the 4x
  * storage compression an embedding store applies before ANN (the
  * public pattern behind FAISS's ScalarQuantizer / the int8 vector
  * codecs in Lucene 9 KNN): dimension d's range [lo_d, hi_d] maps
  * linearly onto the 0..255 code grid, so each float becomes one
  * byte with reconstruction error bounded by half a grid step,
  * (hi_d - lo_d) / 255 / 2.
  *
  * Determinism / oracle story: bounds are exact min/max of the float
  * values (no accumulation), and the code expression
  * round((x - lo) / (hi - lo) * 255) evaluates the same IEEE double
  * chain in Spark and the SQL twin — floats widen to doubles exactly,
  * so codes hash-match cross-engine with no tolerance. A constant
  * dimension (hi == lo) codes to 0 and reconstructs to lo exactly.
  *
  * Scale: training is ONE corpus pass reduced map-side to d (pos,
  * lo, hi) rows; encode/decode are shuffle-free per-row transforms
  * against the broadcast-literal bounds (d pairs of doubles in the
  * plan), so the encoded table writes in the same job that scans the
  * raw vectors.
  */
object ScalarQuant {

  /** Per-dimension exact bounds: one aggregation pass, d rows
    * ((pos, lo, hi), pos 0-based), returned as driver literals for
    * the shuffle-free encode/decode transforms.
    */
  def sqTrain(df: DataFrame, vecCol: String): (Seq[Double], Seq[Double]) = {
    val rows = df
      .select(F.posexplode(F.transform(F.col(vecCol), x => x.cast("double")))
        .as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(F.min("x").as("lo"), F.max("x").as("hi"))
      .orderBy("pos")
      .collect()
    (rows.map(_.getDouble(1)).toSeq, rows.map(_.getDouble(2)).toSeq)
  }

  private def codeExpr(x: org.apache.spark.sql.Column,
                       lo: org.apache.spark.sql.Column,
                       hi: org.apache.spark.sql.Column) =
    F.when(hi === lo, F.lit(0L))
      .otherwise(F.round((x - lo) / (hi - lo) * F.lit(255)).cast("long"))

  /** Encode each vector to d int codes (0..255) against literal
    * bounds — shuffle-free. Output: (idCol, codes array<long>).
    */
  def sqEncode(df: DataFrame, idCol: String, vecCol: String,
               lo: Seq[Double], hi: Seq[Double]): DataFrame = {
    val loL = F.typedlit(lo)
    val hiL = F.typedlit(hi)
    df.select(F.col(idCol),
      F.zip_with(F.transform(F.col(vecCol), x => x.cast("double")),
          F.sequence(F.lit(0), F.lit(lo.size - 1)),
          (x, i) => codeExpr(x, F.element_at(loL, i + 1), F.element_at(hiL, i + 1)))
        .as("codes"))
  }

  /** Decode codes back to the grid reconstruction lo + code/255*(hi-lo)
    * — error vs the original is at most half a grid step per dim.
    * Output: (idCol, recon array<double>).
    */
  def sqDecode(codes: DataFrame, idCol: String, codesCol: String,
               lo: Seq[Double], hi: Seq[Double]): DataFrame = {
    val loL = F.typedlit(lo)
    val hiL = F.typedlit(hi)
    codes.select(F.col(idCol),
      F.zip_with(F.col(codesCol), F.sequence(F.lit(0), F.lit(lo.size - 1)),
          (c, i) => {
            val l = F.element_at(loL, i + 1)
            val h = F.element_at(hiL, i + 1)
            l + c.cast("double") / F.lit(255.0) * (h - l)
          })
        .as("recon"))
  }

  /** The wired-query shape: train + encode + explode to scalar
    * (id, pos, code) rows, every value SQL-replayable exactly.
    */
  def sqEncodeExploded(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val (lo, hi) = sqTrain(df, vecCol)
    sqEncode(df, idCol, vecCol, lo, hi)
      .select(F.col(idCol), F.posexplode(F.col("codes")).as(Seq("pos", "code")))
  }

  /** Build a PERSISTED SQ-ANN index: the int8 codes table plus the
    * (pos, lo, hi) bounds — the 4x-smaller table an embedding store
    * scans instead of raw floats (the Lucene 9 int8-KNN storage
    * shape). Deterministic: identical inputs reproduce the index.
    */
  def sqBuild(corpus: DataFrame, cId: String, cVec: String, path: String): Unit = {
    val (lo, hi) = sqTrain(corpus, cVec)
    val spark = corpus.sparkSession
    import spark.implicits._
    lo.indices.map(i => (i, lo(i), hi(i))).toDF("pos", "lo", "hi")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/bounds")
    sqEncode(corpus, cId, cVec, lo, hi)
      .withColumnRenamed(cId, "neighbor_id")
      .write.mode("overwrite").parquet(s"$path/codes")
  }

  /** Approximate top-k over a persisted SQ index: the scan reads ONLY
    * the compact codes table, reconstructs through the bounds
    * literals, scores the broadcast query batch, keeps rerank·k
    * candidates, and re-ranks them exactly from the raw vectors
    * (candidate semi-join — the same shape as the PQ/IVFPQ paths,
    * with SQ's much tighter reconstruction in place of codebooks).
    * Output matches cosineTopK; gate recall with the floor pattern.
    */
  def sqQueryIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                   queries: DataFrame, qId: String, qVec: String,
                   corpus: DataFrame, cId: String, cVec: String,
                   k: Int, rerank: Int = 4): DataFrame = {
    val b = spark.read.parquet(s"$path/bounds").orderBy("pos").collect()
    val lo = b.map(_.getDouble(1)).toSeq
    val hi = b.map(_.getDouble(2)).toSeq
    val codes = spark.read.parquet(s"$path/codes")
    sqScanAndRank(codes, lo, hi, queries, qId, qVec,
      corpus.select(F.col(cId).as("neighbor_id"), F.col(cVec).as("cv")), k, rerank)
  }

  /** Inline twin of the persisted path (train + encode in-plan) —
    * identical results with identical inputs.
    */
  def sqTopK(queries: DataFrame, qId: String, qVec: String,
             corpus: DataFrame, cId: String, cVec: String,
             k: Int, rerank: Int = 4): DataFrame = {
    val c = corpus.select(F.col(cId).as("neighbor_id"), F.col(cVec).as("cv"))
    val (lo, hi) = sqTrain(c, "cv")
    sqScanAndRank(sqEncode(c, "neighbor_id", "cv", lo, hi), lo, hi,
      queries, qId, qVec, c, k, rerank)
  }

  private def sqScanAndRank(codes: DataFrame, lo: Seq[Double], hi: Seq[Double],
                            queries: DataFrame, qId: String, qVec: String,
                            corpusVecs: DataFrame, k: Int,
                            rerank: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val recon = sqDecode(codes, "neighbor_id", "codes", lo, hi)
    val q = queries.select(F.col(qId).as("query_id"), F.col(qVec).as("qv"))
    val approx = recon.crossJoin(F.broadcast(q))
      .where(F.col("query_id") =!= F.col("neighbor_id"))
      .withColumn("asim", Ann.cosine(F.col("qv"), F.col("recon")))
    val wa = Window.partitionBy("query_id")
      .orderBy(F.col("asim").desc, F.col("neighbor_id").asc)
    val cands = approx.withColumn("__rk", F.row_number().over(wa))
      .where(F.col("__rk") <= k.toLong * rerank)
      .select("query_id", "neighbor_id")
    val scored = cands.join(corpusVecs, "neighbor_id")
      .join(F.broadcast(q), "query_id")
      .withColumn("sim", Ann.cosine(F.col("qv"), F.col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(F.col("sim").desc, F.col("neighbor_id").asc)
    scored.withColumn("rank", F.row_number().over(w).cast("long"))
      .where(F.col("rank") <= k)
      .select(F.col("query_id"), F.col("neighbor_id"), F.col("rank"),
        F.round(F.col("sim"), 6).as("similarity"))
  }
}
