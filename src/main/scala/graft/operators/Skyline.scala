package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.{functions => F}

/** Skyline (Pareto-optimal set) over numeric dimensions, minimizing
  * every dimension: a row survives iff no other row is ≤ on ALL dims
  * and < on at least one (strict domination). The multi-criteria
  * "best tradeoffs" operator of Börzsönyi et al. ICDE'01; the Spark
  * integration shape follows the EDBT'23 "Skyline Queries into Spark
  * SQL" line: a LOCAL skyline per partition, then the global skyline
  * of the (output-sized) union — exact by domination transitivity
  * (anything the local pass drops is dominated by a point that either
  * survives to the end or is itself dominated by a survivor, and
  * domination composes).
  *
  * Scale contract: phase 1 is one mapPartitions pass (dominance
  * checks against the partition's running skyline — imperative
  * per-partition logic, the documented mapPartitions niche); phase 2
  * runs the SAME filter over the coalesced union of local skylines,
  * whose size is output-sensitive (2-D uniform fronts are O(log n);
  * anti-correlated data can be large, and then the answer itself is
  * large — no operator can dodge its own output). No driver collect,
  * no nested-loop join, no cartesian anywhere in the plan.
  *
  * Rows with a NULL in any skyline dimension are excluded (dominance
  * is undefined on absent values); duplicate points do not dominate
  * each other (strictness) and all survive together.
  */
object Skyline {

  def skyline(df: DataFrame, dims: Seq[String]): DataFrame = {
    require(dims.nonEmpty, "at least one skyline dimension")
    val schema = df.schema
    val idx = dims.map(schema.fieldIndex).toArray
    idx.foreach { i =>
      require(schema(i).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"skyline dimension ${schema(i).name} must be numeric")
    }
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    def localSkyline(d: DataFrame): DataFrame = d.mapPartitions { rows =>
      val kept = scala.collection.mutable.ArrayBuffer.empty[(Array[Double], Row)]
      def vals(r: Row): Array[Double] =
        idx.map(i => r.getAs[Number](i).doubleValue())
      // b dominates a: all <=, at least one <
      def dom(b: Array[Double], a: Array[Double]): Boolean = {
        var le = true; var lt = false; var i = 0
        while (i < b.length && le) {
          if (b(i) > a(i)) le = false
          else if (b(i) < a(i)) lt = true
          i += 1
        }
        le && lt
      }
      rows.foreach { r =>
        val v = vals(r)
        if (!kept.exists { case (k, _) => dom(k, v) }) {
          // r survives; evict anything r now dominates
          var i = 0
          while (i < kept.length) {
            if (dom(v, kept(i)._1)) kept.remove(i) else i += 1
          }
          kept += ((v, r))
        }
      }
      kept.iterator.map(_._2)
    }(enc)
    val clean = df.where(dims.map(c => F.col(c).isNotNull).reduce(_ && _))
    // phase 2: same filter over the output-sized union, one task
    localSkyline(localSkyline(clean).coalesce(1))
  }
}
