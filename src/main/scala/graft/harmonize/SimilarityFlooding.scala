package graft.harmonize

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Similarity Flooding schema matching (Melnik, Garcia-Molina, Rahm,
  * ICDE 2002) — the reference's default schema matcher
  * (schema_matching/one2one/valentine.py SimFloodSchemaMatcher).
  *
  * Schema graphs here are metadata: one table node, a node per column,
  * a node per distinct data type, with labeled edges table -[col]->
  * column -[type]-> datatype. Schema metadata is driver-small by
  * definition (thousands of columns at most), so the fixpoint runs on
  * driver collections — deterministic and microseconds-fast — and only
  * the result is returned as a DataFrame. The 100 TB-scale work in
  * schema matching is INSTANCE evidence, which lives in the
  * distributed value-overlap / max-val-sim matchers.
  *
  * Fixpoint variant "basic": sigma' = sigma0 + sigma + flood(sigma),
  * normalized by the max; propagation coefficients are 1/outdeg per
  * (pair node, edge label) on the pairwise connectivity graph.
  */
object SimilarityFlooding {

  private sealed trait Node
  private case object Tbl extends Node
  private final case class Col(name: String) extends Node
  private final case class Typ(name: String) extends Node

  private def graph(cols: Seq[(String, String)]): Seq[(Node, Node, String)] =
    cols.flatMap { case (c, t) =>
      Seq((Tbl: Node, Col(c): Node, "col"), (Col(c): Node, Typ(t): Node, "type"))
    }

  private def normLev(a: String, b: String): Double = {
    val d = {
      val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
          m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      m(a.length)(b.length)
    }
    if (a.isEmpty && b.isEmpty) 1.0
    else 1.0 - d.toDouble / math.max(a.length, b.length)
  }

  /** @param srcCols (column name, data type simple string) of the source table
    * @param tgtCols same for the target table
    * @return (source, target, similarity) — best per source, ties to
    *         target ascending; similarities are flood scores normalized
    *         to [0, 1] over the final fixpoint.
    */
  def matchColumns(spark: SparkSession,
                   srcCols: Seq[(String, String)], tgtCols: Seq[(String, String)],
                   iters: Int = 10): DataFrame =
    SchemaMatcher.bestPerSource(allPairs(spark, srcCols, tgtCols, iters))

  /** The full (source, target, flood score) matrix, for either
    * assignment policy (bestPerSource / oneToOne).
    */
  def allPairs(spark: SparkSession,
               srcCols: Seq[(String, String)], tgtCols: Seq[(String, String)],
               iters: Int = 10): DataFrame = {
    val gS = graph(srcCols)
    val gT = graph(tgtCols)

    // pairwise connectivity graph: pair edges where both sides share a label
    val pcgEdges: Seq[((Node, Node), (Node, Node), String)] = for {
      (a1, a2, l1) <- gS
      (b1, b2, l2) <- gT if l1 == l2
    } yield ((a1, b1), (a2, b2), l1)
    // propagation in both directions; coefficient of q-[L]->p is
    // 1 / |out-edges of q with label L| (per-label fan-out, per paper)
    val directed = pcgEdges ++ pcgEdges.map { case (f, t, l) => (t, f, l) }
    val outByLabel: Map[((Node, Node), String), Int] = directed
      .groupBy(e => (e._1, e._3)).map { case (k, es) => k -> es.size }

    def sigma0(p: (Node, Node)): Double = p match {
      case (Col(a), Col(b)) => normLev(a, b)
      case (Typ(a), Typ(b)) => if (a == b) 1.0 else 0.0
      case (Tbl, Tbl) => 1.0
      case _ => 0.0
    }

    val nodes: Seq[(Node, Node)] =
      (directed.map(_._1) ++ directed.map(_._2)).distinct.sortBy(_.toString)
    // incoming flow per pair node: q -[L]-> p contributes
    // sigma(q) / outdeg_L(q)
    val incoming: Map[(Node, Node), Seq[((Node, Node), Double)]] = directed
      .groupBy(_._2)
      .map { case (to, es) =>
        to -> es.map { case (q, _, l) => q -> 1.0 / outByLabel((q, l)) }
      }

    var sigma: Map[(Node, Node), Double] = nodes.map(p => p -> sigma0(p)).toMap
    for (_ <- 1 to iters) {
      val next = nodes.map { p =>
        val in = incoming.getOrElse(p, Nil)
          .map { case (q, w) => sigma.getOrElse(q, 0.0) * w }.sum
        p -> (sigma0(p) + sigma(p) + in)
      }
      val mx = next.map(_._2).max
      sigma = next.map { case (p, v) => p -> (if (mx > 0) v / mx else v) }.toMap
    }

    import spark.implicits._
    val rows = sigma.toSeq.collect { case ((Col(a), Col(b)), v) => (a, b, v) }
    rows.sortBy(r => (r._1, r._2)).toDF("source", "target", "similarity")
  }
}
