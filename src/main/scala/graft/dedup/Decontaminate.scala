package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Test-set decontamination for training corpora: find (and drop)
  * training documents that share k-gram overlap with an evaluation /
  * benchmark corpus — the standard guard against benchmark leakage in
  * LLM training pipelines (GPT-3 appendix C / PaLM-style n-gram
  * collision checks; public methodology).
  *
  * Scale design: the training side streams — one fused per-row pass
  * builds each document's distinct shingle-hash set (8-byte longs) and
  * explodes it; the evaluation side is benchmark-sized (thousands of
  * documents, not terabytes), so its distinct shingle-hash set is
  * BROADCAST and the probe is a map-side semi/inner join. The only
  * shuffle is the final per-document count aggregation, which carries
  * at most one row per (contaminated doc, shared shingle) — a tiny
  * fraction of the corpus. No global shingle table, no self-join.
  */
object Decontaminate {

  /** Distinct shingle hashes of the evaluation corpus (one column
    * `sh`). Deduplicated before broadcast so the broadcast payload is
    * minimal.
    */
  private def evalShingles(eval: DataFrame, idCol: String, textCol: String,
                           k: Int): DataFrame =
    Dedup.docShingles(eval, idCol, textCol, k).select("sh").distinct()

  /** Per-document contamination report: (id, n_shared) where n_shared
    * is the number of DISTINCT k-gram shingles the document shares
    * with the evaluation corpus. Only contaminated documents appear
    * (n_shared >= 1); join `docs` back for the clean complement or use
    * [[clean]].
    */
  def overlap(docs: DataFrame, idCol: String, textCol: String,
              eval: DataFrame, evalIdCol: String, evalTextCol: String,
              k: Int = 8): DataFrame = {
    val docSh = Dedup.docShingles(docs, idCol, textCol, k)
    docSh.join(F.broadcast(evalShingles(eval, evalIdCol, evalTextCol, k)), "sh")
      .groupBy(F.col("id").as(idCol))
      .agg(F.count(F.lit(1)).as("n_shared"))
  }

  /** The decontaminated corpus: full rows of every document sharing
    * fewer than `minShared` distinct k-grams with the evaluation
    * corpus (default: any overlap disqualifies). Anti join against the
    * (small) contaminated-id set — the corpus itself is read once.
    */
  def clean(docs: DataFrame, idCol: String, textCol: String,
            eval: DataFrame, evalIdCol: String, evalTextCol: String,
            k: Int = 8, minShared: Long = 1L): DataFrame = {
    val bad = overlap(docs, idCol, textCol, eval, evalIdCol, evalTextCol, k)
      .where(F.col("n_shared") >= minShared)
      .select(F.col(idCol))
    docs.join(bad, Seq(idCol), "left_anti")
  }
}
