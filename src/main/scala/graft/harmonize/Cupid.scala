package graft.harmonize

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cupid schema matching (Madhavan, Bernstein, Rahm, VLDB 2001) — the
  * last entry in the reference's valentine matcher matrix
  * (schema_matching/one2one/matcher_factory.py:17-19, valentine.py:47-62
  * CupidSchemaMatcher with the same parameter surface).
  *
  * Cupid combines LINGUISTIC similarity of element names with
  * STRUCTURAL similarity over the schema tree:
  *
  *  - lsim: names are tokenized (snake/camel/digit boundaries) and
  *    scored by a symmetric best-token-match average of normalized edit
  *    similarity. (The paper consults a thesaurus for synonyms; with no
  *    external thesaurus in scope, per-token edit similarity is the
  *    linguistic signal — the same substitution valentine makes when no
  *    WordNet data is available.)
  *  - ssim: for the flat relational case the schema tree is
  *    root -> columns, so leaves initialize ssim from data-type
  *    compatibility, the root pair's ssim is the fraction of leaf pairs
  *    that are strongly linked (wsim > thAccept, the paper's leaf-set
  *    similarity), and leaf ssims are then revised by the root verdict:
  *    multiplied by cInc (capped at 1) when the roots are strongly
  *    similar (> thHigh), by cDec when weakly (< thLow) — the paper's
  *    structural inc/dec step collapsed to one level.
  *  - wsim = wStruct * ssim + (1 - wStruct) * lsim, recomputed after
  *    the structural revision; best target per source on wsim.
  *
  * Schema metadata is driver-small by definition, so (like
  * [[SimilarityFlooding]]) the whole computation runs on driver
  * collections and only the result becomes a DataFrame; instance-level
  * evidence at scale lives in the distributed matchers.
  */
object Cupid {

  final case class Params(
      leafWStruct: Double = 0.2,
      wStruct: Double = 0.2,
      thAccept: Double = 0.7,
      thHigh: Double = 0.6,
      thLow: Double = 0.35,
      cInc: Double = 1.2,
      cDec: Double = 0.9)

  /** Name tokens: split on '_', '-', spaces, camelCase and
    * letter/digit boundaries; lowercased. "custKey2" -> [cust, key, 2].
    */
  private[harmonize] def nameTokens(name: String): Seq[String] = {
    val withBreaks = name
      .replaceAll("([a-z0-9])([A-Z])", "$1 $2")
      .replaceAll("([A-Za-z])([0-9])", "$1 $2")
      .replaceAll("([0-9])([A-Za-z])", "$1 $2")
    withBreaks.toLowerCase.split("[^a-z0-9]+").toSeq.filter(_.nonEmpty)
  }

  private def normLev(a: String, b: String): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
        m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    1.0 - m(a.length)(b.length).toDouble / math.max(a.length, b.length)
  }

  /** Symmetric soft token-set similarity: each token scores its best
    * counterpart, averaged over both directions.
    */
  private[harmonize] def lsim(a: String, b: String): Double = {
    val (ta, tb) = (nameTokens(a), nameTokens(b))
    if (ta.isEmpty || tb.isEmpty) return normLev(a.toLowerCase, b.toLowerCase)
    val ab = ta.map(x => tb.map(y => normLev(x, y)).max).sum
    val ba = tb.map(y => ta.map(x => normLev(x, y)).max).sum
    (ab + ba) / (ta.size + tb.size)
  }

  /** Data-type compatibility (the paper's leaf ssim initialization):
    * 1.0 for identical types, 0.5 within a compatibility group
    * (numeric / chronological / textual), 0.0 across groups.
    */
  private[harmonize] def typeCompat(a: String, b: String): Double = {
    def group(t: String): String = {
      val s = t.toLowerCase
      if (s.contains("int") || s.contains("long") || s.contains("double") ||
        s.contains("float") || s.contains("decimal") || s.contains("numeric")) "num"
      else if (s.contains("date") || s.contains("timestamp") || s.contains("time")) "chrono"
      else if (s.contains("string") || s.contains("char") || s.contains("varchar") ||
        s.contains("text")) "text"
      else s
    }
    if (a == b) 1.0 else if (group(a) == group(b)) 0.5 else 0.0
  }

  /** @param srcCols (column name, data type simple string) per source column
    * @param tgtCols same for the target table
    * @return (source, target, similarity) — best target per source by
    *         final wsim, ties to target name ascending.
    */
  def matchColumns(spark: SparkSession,
                   srcCols: Seq[(String, String)], tgtCols: Seq[(String, String)],
                   params: Params = Params()): DataFrame =
    SchemaMatcher.bestPerSource(allPairs(spark, srcCols, tgtCols, params))

  /** The full (source, target, wsim) matrix, for either assignment
    * policy (bestPerSource / oneToOne).
    */
  def allPairs(spark: SparkSession,
               srcCols: Seq[(String, String)], tgtCols: Seq[(String, String)],
               params: Params = Params()): DataFrame = {
    val p = params
    val pairs = for ((sn, st) <- srcCols; (tn, tt) <- tgtCols) yield {
      val l = lsim(sn, tn)
      val s0 = p.leafWStruct * typeCompat(st, tt) + (1 - p.leafWStruct) * l
      ((sn, tn), l, s0)
    }
    // leaf wsim with initial structural evidence (type compatibility)
    val wsim0 = pairs.map { case (k, l, _) =>
      k -> (p.wStruct * typeCompat(
        srcCols.find(_._1 == k._1).get._2, tgtCols.find(_._1 == k._2).get._2)
        + (1 - p.wStruct) * l)
    }.toMap
    // root structural similarity: strongly-linked leaf fraction
    val strong = wsim0.count(_._2 > p.thAccept)
    val rootSsim = strong.toDouble / math.max(srcCols.size, tgtCols.size)
    // the roots are the two tables under deliberate comparison: their
    // linguistic similarity is taken as 1.0 (table names are not part
    // of this API, matching valentine's dataframe-in shape)
    val rootWsim = p.wStruct * rootSsim + (1 - p.wStruct)
    // structural revision of the leaves by the root verdict
    val factor =
      if (rootWsim > p.thHigh) p.cInc
      else if (rootWsim < p.thLow) p.cDec
      else 1.0
    val rows = pairs.map { case ((sn, tn), l, _) =>
      val st = srcCols.find(_._1 == sn).get._2
      val tt = tgtCols.find(_._1 == tn).get._2
      val ssim = math.min(1.0, typeCompat(st, tt) * factor)
      (sn, tn, p.wStruct * ssim + (1 - p.wStruct) * l)
    }
    import spark.implicits._
    rows.toDF("source", "target", "similarity")
  }
}
