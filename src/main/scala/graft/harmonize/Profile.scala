package graft.harmonize

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Column profiling — the statistics pass harmonization matchers
  * consume (the reference's distribution-based and max-val-sim
  * matchers build per-column profiles internally; api.py surfaces
  * only preview_domain). One corpus scan computes every column's
  * stats simultaneously; the long-format pivot happens on the ONE
  * aggregated row, so profiling N columns costs one pass regardless
  * of N (the multi-countDistinct EXPAND multiplies scan rows by the
  * distinct-agg count — the standard Spark trade for exact distinct
  * counts in one job; swap to approx_count_distinct at 100 TB if the
  * exactness isn't worth that constant).
  */
object Profile {

  /** Per-column stats for NUMERIC columns: NON-NULL count (`n` is
    * count(col), which excludes nulls — row count is n + n_null),
    * null count, min/max/sum (double), exact distinct count. Output
    * long-format (column, n, n_null, min_val, max_val, sum_val,
    * n_distinct) — one row per profiled column.
    */
  def numeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    val aggs = cols.flatMap { c =>
      Seq(F.count(F.col(c)).as(s"__n_$c"),
        F.sum(F.when(F.col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        F.min(F.col(c)).cast("double").as(s"__mn_$c"),
        F.max(F.col(c)).cast("double").as(s"__mx_$c"),
        // DECIMAL accumulation: a double sum's value depends on
        // partition order (not reproducible, and not cross-engine)
        F.sum(F.col(c).cast("decimal(18,6)")).cast("double").as(s"__sm_$c"),
        F.countDistinct(F.col(c)).as(s"__nd_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = F.explode(F.array(cols.map(c =>
      F.struct(F.lit(c).as("column"),
        F.col(s"__n_$c").as("n"),
        F.col(s"__nn_$c").as("n_null"),
        F.col(s"__mn_$c").as("min_val"),
        F.col(s"__mx_$c").as("max_val"),
        F.round(F.col(s"__sm_$c"), 6).as("sum_val"),
        F.col(s"__nd_$c").as("n_distinct"))): _*))
    one.select(stacked.as("p")).select("p.*")
  }

  /** Key-skew diagnosis per column — the statistic that decides
    * SALTING at scale: per candidate join/grouping column, the
    * distinct-key count, the heaviest key's row count and share, and
    * the key itself. A max_share near 1/parallelism or above means
    * one reducer owns that key's rows; feed such columns to
    * Skew.saltedJoin (or AQE skew handling) before the join.
    *
    * One unpivot scan for N columns → (col, value) counts (map-side
    * combined), then a two-level fold: per-column totals + max count,
    * and the deterministic heaviest key = max value among those at
    * max count (ties break on the larger key string — no window over
    * a corpus-sized partition; everything after the first groupBy is
    * key-cardinality-sized).
    */
  def keySkew(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    val unpiv = df.select(F.explode(F.array(cols.map(c =>
      F.struct(F.lit(c).as("column"), F.col(c).cast("string").as("v"))): _*)).as("p"))
      .select("p.*").where(F.col("v").isNotNull)
    val counts = unpiv.groupBy("column", "v").agg(F.count(F.lit(1)).as("cnt"))
      .persist()
    val agg = counts.groupBy("column").agg(
      F.count(F.lit(1)).as("n_keys"),
      F.sum("cnt").as("n_rows"),
      F.max("cnt").as("max_cnt"))
    val top = counts.join(F.broadcast(agg.select(F.col("column"), F.col("max_cnt"))),
        Seq("column"))
      .where(F.col("cnt") === F.col("max_cnt"))
      .groupBy("column").agg(F.max("v").as("top_value"))
    agg.join(F.broadcast(top), Seq("column"))
      .select(F.col("column"), F.col("n_keys"), F.col("n_rows"),
        F.col("max_cnt"),
        F.round(F.col("max_cnt").cast("double") / F.col("n_rows").cast("double"), 6)
          .as("max_share"),
        F.col("top_value"))
  }

  /** Pearson correlation matrix over numeric columns — ONE scan for
    * every unordered pair: the aggregate computes each column's exact
    * decimal Σx and Σx² plus every pair's exact Σxy, and the
    * correlations assemble from those sums on the single aggregated
    * row. N columns cost one pass with O(N²) accumulators, not O(N²)
    * scans.
    *
    * Numeric policy (SURVEY §5): the moments accumulate in DECIMAL —
    * `F.corr`'s double accumulation is partition-order-dependent and
    * not reproducible cross-engine. Inputs quantize to decimal(18,6)
    * (the Profile.numeric convention); products are decimal(37,12),
    * exact; sums widen to (38,12), exact while |Σx²| < 1e26 — holds
    * to ~1e15 rows of this data, far past the design point. The final
    *   corr = (n·Σxy − Σx·Σy) / √((n·Σx² − (Σx)²)(n·Σy² − (Σy)²))
    * evaluates in double FROM the exact sums — a fixed handful of
    * IEEE ops the twin replays with the identical expression shape.
    * Output: (col_x, col_y, n, corr) per pair, corr rounded to 6dp
    * (null when either column is constant — zero variance).
    */
  def correlation(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "correlation needs at least two columns")
    val pairs = for { i <- cols.indices; j <- (i + 1) until cols.size }
      yield (cols(i), cols(j))
    def dec(c: String) = F.col(c).cast("decimal(18,6)")
    val aggs = cols.flatMap(c => Seq(
      F.sum(dec(c)).as(s"__s_$c"),
      F.sum(dec(c) * dec(c)).as(s"__q_$c"))) ++
      pairs.map { case (x, y) => F.sum(dec(x) * dec(y)).as(s"__p_${x}__$y") } :+
      F.count(F.lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    def d(name: String) = F.col(name).cast("double")
    val stacked = F.explode(F.array(pairs.map { case (x, y) =>
      val n = d("__n")
      val cov = n * d(s"__p_${x}__$y") - d(s"__s_$x") * d(s"__s_$y")
      val vx = n * d(s"__q_$x") - d(s"__s_$x") * d(s"__s_$x")
      val vy = n * d(s"__q_$y") - d(s"__s_$y") * d(s"__s_$y")
      F.struct(F.lit(x).as("col_x"), F.lit(y).as("col_y"),
        F.col("__n").as("n"),
        F.when(vx > 0 && vy > 0,
          F.round(cov / F.sqrt(vx * vy), 6)).as("corr"))
    }: _*))
    one.select(stacked.as("p")).select("p.*")
  }

  /** Equi-width histogram per numeric column: two passes — a one-row
    * min/max aggregate (broadcast), then one bucketing groupBy with
    * at most |cols|·nBins groups. The explode unpivots |cols| values
    * per row, so N columns cost one scan at N× the row stream, the
    * same trade as [[numeric]]'s EXPAND.
    *
    * bucket = least(⌊(x − min)·nBins / (max − min)⌋, nBins−1) — the
    * max value folds into the last bucket; a constant column (max =
    * min) degenerates to the single bucket 0. All bucketing
    * arithmetic is double with a fixed expression shape (multiply
    * before divide) so the twin reproduces bucket boundaries
    * bit-for-bit. Output: (column, bucket, lo, hi, cnt) for OCCUPIED
    * buckets, lo/hi the bucket's edges rounded to 6dp.
    */
  def histogram(df: DataFrame, cols: Seq[String], nBins: Int = 10): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    require(nBins >= 1, "at least one bucket")
    val bAggs = cols.flatMap(c => Seq(
      F.min(F.col(c)).cast("double").as(s"__mn_$c"),
      F.max(F.col(c)).cast("double").as(s"__mx_$c")))
    val bounds = df.agg(bAggs.head, bAggs.tail: _*)
    val stacked = df.select(F.explode(F.array(cols.map(c =>
      F.struct(F.lit(c).as("column"), F.col(c).cast("double").as("x"))): _*)).as("p"))
      .select("p.*").where(F.col("x").isNotNull)
    def perCol(f: String => org.apache.spark.sql.Column) =
      cols.tail.foldLeft(F.when(F.col("column") === cols.head, f(cols.head))) {
        (acc, c) => acc.when(F.col("column") === c, f(c))
      }
    val mn = perCol(c => F.col(s"__mn_$c"))
    val mx = perCol(c => F.col(s"__mx_$c"))
    val bucket = F.when(mx === mn, F.lit(0L)).otherwise(
      F.least(F.floor((F.col("x") - mn) * F.lit(nBins) / (mx - mn)),
        F.lit(nBins - 1L)))
    val w = stacked.crossJoin(F.broadcast(bounds))
      .select(F.col("column"), bucket.as("bucket"), mn.as("__mn"), mx.as("__mx"))
    w.groupBy("column", "bucket", "__mn", "__mx")
      .agg(F.count(F.lit(1)).as("cnt"))
      .select(F.col("column"), F.col("bucket"),
        F.round(F.col("__mn") + F.col("bucket") * (F.col("__mx") - F.col("__mn")) / F.lit(nBins), 6).as("lo"),
        F.round(F.col("__mn") + (F.col("bucket") + 1) * (F.col("__mx") - F.col("__mn")) / F.lit(nBins), 6).as("hi"),
        F.col("cnt"))
  }

  /** The 100 TB distinct-count path, wired WITH its own error gate
    * (the corpus_quantiles_approx pattern applied here): profiling's
    * exact multi-countDistinct costs an EXPAND that multiplies scan
    * rows by the distinct-agg count; the at-scale swap is HLL++
    * (approx_count_distinct — one pass, NO expand, mergeable sketch
    * with relative standard deviation `rsd`). Per column this emits
    * whether the sketch landed within `tol` relative error of the
    * exact count — the driver oracle is the literal all-true table,
    * so a sketch regression fails parity loudly. tol = 4 x rsd gives
    * ~4 sigma of headroom; the exact side here is the gate's
    * reference, the production plan runs the sketch alone.
    */
  def numericApproxGate(df: DataFrame, cols: Seq[String],
                        rsd: Double = 0.05, tol: Double = 0.20): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    val aggs = cols.flatMap { c =>
      Seq(F.countDistinct(F.col(c)).as(s"__nd_$c"),
        F.approx_count_distinct(F.col(c), rsd).as(s"__ad_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = F.explode(F.array(cols.map(c =>
      F.struct(F.lit(c).as("column"),
        (F.abs(F.col(s"__ad_$c").cast("double") - F.col(s"__nd_$c").cast("double")) <=
          F.col(s"__nd_$c").cast("double") * tol).as("distinct_ok"))): _*))
    one.select(stacked.as("p")).select("p.*")
  }
}
