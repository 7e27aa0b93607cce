package graft.harmonize

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

/** Record linkage / entity resolution: link ROWS of two sources that
  * share no key — the record-level sibling of the reference's
  * value matching (bdikit/value_matching/polyfuzz.py matches distinct
  * VALUES; here whole records resolve 1:1). The classic two-stage
  * shape (Fellegi & Sunter JASA'69; blocking per Christen's survey,
  * TKDE 2012): candidate generation restricted to records agreeing on
  * a caller-chosen block key, then pairwise comparison only within
  * blocks.
  *
  * Design for scale: the pair cost is Σ_blk |A_blk|·|B_blk| — a plain
  * hash equi-join on the block key followed by a row-local edit
  * distance, NEVER an all-pairs cross. The block key is the caller's
  * scale contract (at 100 TB: multi-pass blocking with tighter keys,
  * or an LSH key from the dedup kernels); skewed blocks ride the
  * engine's AQE skew split since the join is a vanilla equi-join.
  * The 1:1 resolution is a per-B-record windowed argmax — integer
  * sort keys only (raw edit distance, then id), no cross-engine
  * float comparison anywhere.
  */
object Linkage {

  /** Link every record of `b` to its best candidate in `a`: block on
    * equality of `blockCols` (present in both frames), score
    * candidate pairs by raw Levenshtein distance between `nameA` and
    * `nameB`, keep pairs with distance ≤ maxDist, and resolve each B
    * record to the (lowest-distance, then lowest-idA) candidate — a
    * deterministic integer argmax. Returns
    * (idB, idA, lev, n_candidates) — n_candidates is the B record's
    * surviving candidate count (match-confidence evidence), one row
    * per linked B record, unordered. B records with no candidate
    * within maxDist are dropped (unlinked).
    */
  def linkByName(a: DataFrame, b: DataFrame, blockCols: Seq[String],
                 idA: String, nameA: String, idB: String, nameB: String,
                 maxDist: Int): DataFrame = {
    require(blockCols.nonEmpty, "blocking key required — all-pairs linkage is not offered")
    val cand = a.select((blockCols.map(F.col) :+ F.col(idA) :+ F.col(nameA)): _*)
      .join(b.select((blockCols.map(F.col) :+ F.col(idB) :+ F.col(nameB)): _*),
        blockCols)
      .withColumn("lev", F.levenshtein(F.col(nameA), F.col(nameB)))
      .where(F.col("lev") <= maxDist)
    val w = Window.partitionBy(idB)
      .orderBy(F.col("lev").asc, F.col(idA).asc)
    cand
      .withColumn("n_candidates", F.count(F.lit(1))
        .over(Window.partitionBy(idB)))
      .withColumn("__rn", F.row_number().over(w))
      .where(F.col("__rn") === 1)
      .select(F.col(idB), F.col(idA), F.col("lev"), F.col("n_candidates"))
  }
}
