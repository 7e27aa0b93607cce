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
