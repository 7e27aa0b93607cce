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
  * Scale contract: phase 1 is one mapPartitions pass per partition
  * (dominance checks against the partition's running skyline —
  * imperative per-partition logic, the documented mapPartitions
  * niche); the merge is a TREE REDUCTION — the same local pass over
  * repartition(parts/fanIn) rounds until one partition remains — so
  * the fan-in at every level is bounded and an anti-correlated front
  * (where the union of local skylines can be a large fraction of the
  * input) never serializes through a single task until it has been
  * shrunk fanIn-fold per level. Each level is a SHUFFLE boundary on
  * the (already output-sized) survivors: a narrow coalesce would pull
  * the full phase-1 scan INTO the single merged task and run the
  * whole skyline serially. Final size is output-sensitive (2-D
  * uniform fronts are O(log n); anti-correlated answers are large —
  * no operator can dodge its own output). No driver collect, no
  * nested-loop join, no cartesian anywhere in the plan.
  *
  * Rows with a NULL in any skyline dimension are excluded (dominance
  * is undefined on absent values); duplicate points do not dominate
  * each other (strictness) and all survive together.
  */
object Skyline {

  def skyline(df: DataFrame, dims: Seq[String], fanIn: Int = 8): DataFrame = {
    require(dims.nonEmpty, "at least one skyline dimension")
    require(fanIn >= 2, "tree fan-in must be at least 2")
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
    // tree reduction: local skyline, then repeat over fanIn-fold fewer
    // partitions until one remains. repartition (a real exchange), not
    // coalesce: the stage boundary keeps the wide pass parallel and
    // each level's input is the previous level's survivors only.
    var cur = localSkyline(clean)
    var parts = clean.rdd.getNumPartitions
    while (parts > 1) {
      parts = math.max(1, (parts + fanIn - 1) / fanIn)
      cur = localSkyline(cur.repartition(parts))
    }
    cur
  }
}
