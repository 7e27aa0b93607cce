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

  /** The eval side as a PERSISTABLE frozen index (one `sh` column of
    * distinct shingle hashes) — what the streaming decontamination
    * loop bootstraps once and every micro-batch probes. Frozen by
    * definition: a benchmark doesn't grow with the training stream.
    */
  def evalShingleIndex(eval: DataFrame, evalIdCol: String,
                       evalTextCol: String, k: Int = 8): DataFrame =
    evalShingles(eval, evalIdCol, evalTextCol, k)

  /** [[overlap]] against a PRE-BUILT eval shingle index (a frame with
    * one `sh` column — [[evalShingleIndex]]'s output, typically read
    * back from its table). The probe broadcasts the index and scans
    * only `docs`.
    */
  def overlapFromShingles(docs: DataFrame, idCol: String, textCol: String,
                          evalSh: DataFrame, k: Int = 8): DataFrame =
    Dedup.docShingles(docs, idCol, textCol, k)
      .join(F.broadcast(evalSh.select("sh").distinct()), "sh")
      .groupBy(F.col("id").as(idCol))
      .agg(F.count(F.lit(1)).as("n_shared"))

  /** Per-document contamination report: (id, n_shared) where n_shared
    * is the number of DISTINCT k-gram shingles the document shares
    * with the evaluation corpus. Only contaminated documents appear
    * (n_shared >= 1); join `docs` back for the clean complement or use
    * [[clean]].
    */
  def overlap(docs: DataFrame, idCol: String, textCol: String,
              eval: DataFrame, evalIdCol: String, evalTextCol: String,
              k: Int = 8): DataFrame =
    overlapFromShingles(docs, idCol, textCol,
      evalShingles(eval, evalIdCol, evalTextCol, k), k)

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

  /** FUZZY decontamination (r17): [[overlap]]'s shared-shingle count
    * catches verbatim leakage but under-reports paraphrased or
    * lightly-edited benchmark text (a doc sharing 3 scattered k-grams
    * scores like one sharing a whole contiguous answer). This is the
    * document-LEVEL fuzzy check — Lee et al.-style near-dup matching
    * against the benchmark: training docs whose k-gram Jaccard with
    * SOME eval doc clears `threshold`.
    *
    * Scale shape (deliberately asymmetric, NOT minhashLsh's
    * self-join): the eval side is benchmark-sized, so BOTH its banded
    * MinHash signatures and its shingle-hash sets BROADCAST; the
    * training corpus bands map-side, probes the broadcast buckets
    * map-side, and verifies candidates by exact Jaccard (merge-scan
    * over sorted hash arrays) against the broadcast eval sets — the
    * corpus is scanned twice and never shuffled on content; the only
    * exchange is the candidate distinct, bounded by band collisions.
    *
    * Output: (id, eval_id, jaccard) per contaminated (train, eval)
    * pair at jaccard ≥ threshold — precision 1.0 (exact verify), so
    * an exact-Jaccard oracle gates full LSH recall, the
    * dedup_minhash contract.
    */
  def fuzzyOverlap(docs: DataFrame, idCol: String, textCol: String,
                   eval: DataFrame, evalIdCol: String, evalTextCol: String,
                   k: Int = 3, numHashes: Int = 128, bands: Int = 32,
                   threshold: Double = 0.8): DataFrame = {
    val docBanded = Dedup.minhashBanded(docs, idCol, textCol, k,
      numHashes, bands)
    val evalBanded = Dedup.minhashBanded(eval, evalIdCol, evalTextCol, k,
      numHashes, bands).withColumnRenamed("id", "eval_id")
    val cands = docBanded
      .join(F.broadcast(evalBanded), Seq("band", "key"))
      .select(F.col("id"), F.col("eval_id")).distinct()
    val trainSets = Dedup.docShingleSets(docs, idCol, textCol, k)
    val evalSets = Dedup.docShingleSets(eval, evalIdCol, evalTextCol, k)
      .select(F.col("id").as("eval_id"), F.col("shs").as("eshs"),
        F.col("sz").as("esz"))
    cands.join(trainSets, "id")
      .join(F.broadcast(evalSets), "eval_id")
      .withColumn("ni", graft.functions.HashExprs.sortedIntersectCount(
        F.col("shs"), F.col("eshs")))
      .select(F.col("id"), F.col("eval_id"),
        (F.col("ni").cast("double") /
          (F.col("sz") + F.col("esz") - F.col("ni")).cast("double"))
          .as("jaccard"))
      .where(F.col("jaccard") >= threshold)
  }

  /** The fuzzily-decontaminated corpus: docs with NO eval near-match
    * at the threshold (anti join against the small flagged-id set).
    */
  def fuzzyClean(docs: DataFrame, idCol: String, textCol: String,
                 eval: DataFrame, evalIdCol: String, evalTextCol: String,
                 k: Int = 3, numHashes: Int = 128, bands: Int = 32,
                 threshold: Double = 0.8): DataFrame = {
    val bad = fuzzyOverlap(docs, idCol, textCol,
      eval, evalIdCol, evalTextCol, k, numHashes, bands, threshold)
      .select(F.col("id").as(idCol)).distinct()
    docs.join(bad, Seq(idCol), "left_anti")
  }

  /** SEMANTIC decontamination (r18, completing the family's third
    * rung: exact shingles → fuzzy MinHash → embedding space): flag
    * training vectors whose best cosine against ANY eval vector
    * reaches `tau` — the leakage [[overlap]] and [[fuzzyOverlap]]
    * both miss, a benchmark item paraphrased or re-formatted until no
    * k-gram survives but the embedding still sits on top of it (the
    * SemDeDup-style embedding match applied to eval overlap; public
    * methodology). Output is one row per TRAINING vector —
    * (id, max_sim rounded 6dp, contaminated) — so the report is
    * total and the clean complement is a filter, not an anti-join.
    *
    * Scale shape (the family contract): the eval side is
    * benchmark-sized by definition and BROADCASTS; the training
    * corpus NEVER shuffles on content — the scan scores pairs
    * map-side (a bounded-broadcast product, the ann_topk baseline
    * shape) and the only exchange is the per-vector max aggregate,
    * map-side combined. For an eval set too large to broadcast,
    * bucket both sides through the LSH machinery first
    * (graft.similarity.Ann.cosinePairs) — same verdict column.
    *
    * The contaminated flag compares the ROUNDED max (both engines
    * compare round(max, 6) ≥ tau), so the boolean is exactly as
    * cross-engine-stable as the sim itself.
    */
  def semanticOverlap(train: DataFrame, idCol: String, vecCol: String,
                      eval: DataFrame, evalVecCol: String,
                      tau: Double): DataFrame = {
    // "the report is total" must survive degenerate inputs (r18
    // ADVICE): an empty/all-null eval split empties the crossJoin, and
    // a null vector nulls its sims — so the verdict frame is the
    // DISTINCT training ids with scores LEFT-joined on, and the flag
    // coalesces to false when no sim exists (nothing to leak against
    // is "not contaminated", not "unknown").
    val ev = eval.select(F.col(evalVecCol).as("__ev"))
      .where(F.col("__ev").isNotNull)
    val scores = train.select(F.col(idCol), F.col(vecCol).as("__tv"))
      .where(F.col("__tv").isNotNull)
      .crossJoin(F.broadcast(ev))
      .withColumn("__sim",
        graft.similarity.Ann.cosine(F.col("__tv"), F.col("__ev")))
      .groupBy(idCol)
      .agg(F.round(F.max(F.col("__sim")), 6).as("max_sim"))
    train.select(F.col(idCol)).distinct()
      .join(scores, Seq(idCol), "left")
      .withColumn("contaminated",
        F.coalesce(F.col("max_sim") >= tau, F.lit(false)))
  }
}
