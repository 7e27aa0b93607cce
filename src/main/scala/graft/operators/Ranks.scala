package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Exact global rank at scale.
  *
  * `row_number().over(Window.orderBy(...))` with no partitionBy is the
  * classic scale-killer: Catalyst plans a single-partition Exchange and
  * ONE task sorts the whole input. This helper computes the identical
  * 1-based global rank with a range-partitioned sort plus
  * per-partition offsets, so every task sorts |rows|/p and no
  * single-partition window ever appears in the plan.
  *
  * Mechanics: `repartitionByRange(order) + sortWithinPartitions(order)`
  * yields a totally-ordered RDD whose partition i holds ranks
  * (offset_i, offset_i + count_i]; `zipWithIndex` materializes those
  * offsets with one lightweight count pass over the shuffle output and
  * stamps each row with its global index. The RangePartitioner is
  * constructed exactly once (when the physical plan is instantiated by
  * `.rdd`), so the boundaries used by the count pass and the data pass
  * are the same object — the offsets cannot drift between passes. As
  * long as the order is TOTAL (callers must include a unique
  * tie-break column), the resulting rank is a pure function of the
  * data, independent of the sampled boundaries.
  *
  * Ordering semantics are Spark SQL's own (UTF8String binary
  * comparison for strings, NaN-last / signed-zero-normalized doubles)
  * because the sort happens inside the SQL engine — the ranks agree
  * bit-for-bit with what `Window.orderBy(order)` would have produced.
  */
object Ranks {

  /** Append `rankCol` = the exact 1-based global rank of each row
    * under `order`. `order` must be a total order (include a unique
    * tie-break column); `parts` defaults to the session's shuffle
    * parallelism.
    */
  def globalRank(df: DataFrame, order: Seq[Column],
                 rankCol: String = "rnk", parts: Int = 0): DataFrame = {
    require(order.nonEmpty, "globalRank needs at least one order column")
    val spark = df.sparkSession
    val p0 = if (parts > 0) parts
             else math.max(1, spark.sessionState.conf.numShufflePartitions)
    val sorted = df.repartitionByRange(p0, order: _*).sortWithinPartitions(order: _*)
    val out = StructType(df.schema.fields :+ StructField(rankCol, LongType, nullable = false))
    val ranked = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(ranked, out)
  }
}
