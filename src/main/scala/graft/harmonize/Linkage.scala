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

  /** One comparison attribute for Fellegi-Sunter linkage: a display
    * name, the A-side and B-side column names, and the boolean
    * agreement predicate over them. Attribute order matters: attr i
    * is bit i of the agreement-pattern id.
    */
  final case class FsAttr(name: String, colA: String, colB: String,
                          agree: (org.apache.spark.sql.Column,
                            org.apache.spark.sql.Column) =>
                            org.apache.spark.sql.Column)

  /** EM-estimated Fellegi-Sunter parameters: the match proportion
    * λ and per-attribute m = P(agree | match), u = P(agree | non-
    * match) — all clamped to [1e-6, 1 − 1e-6].
    */
  final case class FsParams(lambda: Double, m: Array[Double],
                            u: Array[Double]) {
    require(m.length == u.length)
    def k: Int = m.length

    /** E-step posterior P(match | pattern p) under these params —
      * the per-pattern match score. Canonical operation order
      * (factors by ascending attribute, left-associated), mirrored
      * term-for-term by the SQL twin.
      */
    def posterior(p: Int): Double = {
      var mp = 1.0; var up = 1.0
      var i = 0
      while (i < k) {
        if (((p >> i) & 1) == 1) { mp = mp * m(i); up = up * u(i) }
        else { mp = mp * (1.0 - m(i)); up = up * (1.0 - u(i)) }
        i += 1
      }
      val num = lambda * mp
      num / (num + (1.0 - lambda) * up)
    }

    /** Per-pattern posterior in ppm fixed point — the integer the
      * linkage sorts and thresholds on (the jw_ppm convention: no
      * raw double crosses engines).
      */
    def posteriorPpm(p: Int): Long = math.floor(posterior(p) * 1e6).toLong

    /** The classic log2 match weights (Σ over attributes of
      * log2(m/u) for agreements, log2((1−m)/(1−u)) for
      * disagreements) — the standard PRESENTATION of an FS model.
      * Driver-side convenience only: log implementations differ at
      * ulp level across engines, so the cross-engine surface is
      * [[posteriorPpm]], never this.
      */
    def logWeights: Seq[(Double, Double)] =
      (0 until k).map { i =>
        (math.log(m(i) / u(i)) / math.log(2.0),
          math.log((1.0 - m(i)) / (1.0 - u(i))) / math.log(2.0))
      }
  }

  /** Fellegi-Sunter linkage (Fellegi & Sunter JASA'69) with
    * UNSUPERVISED EM parameter estimation (Winkler '88; the Splink
    * shape) — the probabilistic upgrade of [[linkByName]]'s raw-
    * distance argmax: per-attribute m/u probabilities are LEARNED
    * from the candidate pairs themselves, so a highly-discriminating
    * attribute (a phone number: u ≈ 0) outvotes a noisy one (a
    * corrupted name) without hand-set weights.
    *
    * Scale shape: candidates come from the same guarded block join
    * as [[linkByName]]; each pair reduces to a k-bit agreement
    * pattern id, and EM runs DRIVER-SIDE over the ≤ 2^k pattern-
    * count contingency table (bounded by construction — the
    * lloydLocal discipline; the corpus is never re-scanned per
    * round). Scoring is then a literal pattern→posterior lookup in
    * the plan: one scan, no shuffle beyond the argmax window.
    *
    * Determinism: fixed init (λ=0.1, m=0.9, u=0.1), `nIter` fixed
    * rounds, canonical operation order everywhere, per-round clamps
    * to [1e-6, 1−1e-6] (no 0/0), and the published score is the
    * posterior in ppm FIXED POINT. The SQL twin replays the unrolled
    * rounds term-for-term on the same IEEE doubles.
    *
    * Returns one row per linked B record:
    * (idB, idA, pid, post_ppm, n_candidates), resolved per-B by
    * (post_ppm desc, idA asc) among candidates with post_ppm ≥
    * `minPostPpm`.
    */
  def linkFellegiSunter(a: DataFrame, b: DataFrame, blockCols: Seq[String],
                        idA: String, idB: String, attrs: Seq[FsAttr],
                        nIter: Int = 15, minPostPpm: Long = 500000L,
                        maxBlockPairs: Long = 50000000L): DataFrame = {
    val cand = fsCandidates(a, b, blockCols, idA, idB, attrs, maxBlockPairs)
    val counts = cand.groupBy("pid").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val params = fsEm(counts, attrs.length, nIter)
    val scores = (0 until (1 << attrs.length)).map(params.posteriorPpm)
    val scoreArr = F.array(scores.map(F.lit(_)): _*)
    val scored = cand
      .withColumn("post_ppm", F.element_at(scoreArr, F.col("pid") + 1))
      .where(F.col("post_ppm") >= minPostPpm)
    val w = Window.partitionBy(idB)
      .orderBy(F.col("post_ppm").desc, F.col(idA).asc)
    scored
      .withColumn("n_candidates",
        F.count(F.lit(1)).over(Window.partitionBy(idB)))
      .withColumn("__rn", F.row_number().over(w))
      .where(F.col("__rn") === 1)
      .select(F.col(idB), F.col(idA), F.col("pid"), F.col("post_ppm"),
        F.col("n_candidates"))
  }

  /** Fellegi-Sunter linkage with the ORIGINAL three-way decision
    * rule (FS'69 §3; r20, VERDICT r19 #3): instead of a single
    * accept threshold, TWO thresholds partition each B record's best
    * candidate into `match` / `possible` (the clerical-review band) /
    * `non_match` — the actual FS decision procedure, which
    * [[linkFellegiSunter]]'s argmax-with-floor collapses to one band.
    *
    * FS'69 states the rule on the likelihood ratio R = P(pattern |
    * match)/P(pattern | non-match); this emits thresholds on the
    * E-step posterior in ppm instead, which is EQUIVALENT: post =
    * λR / (λR + (1−λ)) is strictly increasing in R for the fixed
    * learned λ, so two posterior cutpoints ARE two likelihood-ratio
    * cutpoints (monotone reparameterization — no information lost,
    * and the published score stays the integer ppm fixed point, the
    * cross-engine discipline).
    *
    * Explanation columns (the Splink headline UX — per-attribute
    * match weights): for each attribute, `agree_<name>` (0/1, bit i
    * of pid) and `wt_<name>` = the log2 Fellegi-Sunter weight this
    * pair ACCRUED on that attribute — log2(m/u) on agreement,
    * log2((1−m)/(1−u)) on disagreement — rounded HALF_UP to 6 dp.
    * Weights are computed DRIVER-side from the EM params and enter
    * the plan as literals (8 patterns → k literals, not a per-row
    * log); the SQL twin recomputes them from its bit-identical
    * replayed m/u doubles, and 6-dp rounding absorbs the ≤1-ulp
    * libm log divergence between engines.
    *
    * Unlike [[linkFellegiSunter]] there is NO posterior floor: every
    * B record's best candidate is returned with its band (the
    * non_match band is a real output — FS'69's "reject" is a
    * decision, not a dropped row). Same scale shape: blocked
    * candidates, driver-side EM on the ≤2^k pattern table, literal
    * lookup + one argmax window.
    */
  def linkFellegiSunterBands(a: DataFrame, b: DataFrame,
                             blockCols: Seq[String],
                             idA: String, idB: String, attrs: Seq[FsAttr],
                             nIter: Int = 15,
                             upperPpm: Long = 990000L,
                             lowerPpm: Long = 100000L,
                             maxBlockPairs: Long = 50000000L): DataFrame = {
    require(lowerPpm < upperPpm, "lowerPpm < upperPpm")
    val cand = fsCandidates(a, b, blockCols, idA, idB, attrs, maxBlockPairs)
    val counts = cand.groupBy("pid").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val params = fsEm(counts, attrs.length, nIter)
    val scores = (0 until (1 << attrs.length)).map(params.posteriorPpm)
    val scoreArr = F.array(scores.map(F.lit(_)): _*)
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lw = params.logWeights
    val scored = cand
      .withColumn("post_ppm", F.element_at(scoreArr, F.col("pid") + 1))
    val w = Window.partitionBy(idB)
      .orderBy(F.col("post_ppm").desc, F.col(idA).asc)
    val best = scored
      .withColumn("n_candidates",
        F.count(F.lit(1)).over(Window.partitionBy(idB)))
      .withColumn("__rn", F.row_number().over(w))
      .where(F.col("__rn") === 1)
      .withColumn("band",
        F.when(F.col("post_ppm") >= upperPpm, F.lit("match"))
          .when(F.col("post_ppm") >= lowerPpm, F.lit("possible"))
          .otherwise(F.lit("non_match")))
    val withWeights = attrs.zipWithIndex.foldLeft(best) {
      case (df, (t, i)) =>
        val agree = F.col("pid").bitwiseAND(F.lit(1 << i)) =!= 0
        df.withColumn(s"agree_${t.name}",
            F.when(agree, F.lit(1)).otherwise(F.lit(0)))
          .withColumn(s"wt_${t.name}",
            F.when(agree, F.lit(r6(lw(i)._1))).otherwise(F.lit(r6(lw(i)._2))))
    }
    withWeights.select((Seq(F.col(idB), F.col(idA), F.col("pid"),
      F.col("post_ppm"), F.col("band"), F.col("n_candidates")) ++
      attrs.flatMap(t => Seq(F.col(s"agree_${t.name}"),
        F.col(s"wt_${t.name}")))): _*)
  }

  /** Blocked candidate pairs reduced to their k-bit agreement
    * pattern id (attr i = bit i): (idB, idA, pid). Shares
    * [[linkByName]]'s block join and quadratic-block guard.
    */
  def fsCandidates(a: DataFrame, b: DataFrame, blockCols: Seq[String],
                   idA: String, idB: String, attrs: Seq[FsAttr],
                   maxBlockPairs: Long = 50000000L): DataFrame = {
    require(blockCols.nonEmpty,
      "blocking key required — all-pairs linkage is not offered")
    require(attrs.nonEmpty && attrs.length <= 16,
      "1..16 comparison attributes")
    requireBlockPairsBounded(a, b, blockCols, maxBlockPairs)
    val aSel = a.select(
      (blockCols.map(F.col) :+ F.col(idA)) ++
        attrs.map(t => F.col(t.colA)): _*)
    val bSel = b.select(
      (blockCols.map(F.col) :+ F.col(idB)) ++
        attrs.map(t => F.col(t.colB)): _*)
    val pid = attrs.zipWithIndex.map { case (t, i) =>
      F.when(t.agree(F.col(t.colA), F.col(t.colB)), F.lit(1 << i))
        .otherwise(F.lit(0))
    }.reduce(_ + _)
    aSel.join(bSel, blockCols)
      .select(F.col(idB), F.col(idA), pid.cast("int").as("pid"))
  }

  /** Driver-side EM over the agreement-pattern contingency table —
    * a pure function of (counts, k, nIter) in canonical IEEE order:
    * patterns ascend, factors ascend by attribute, sums left-
    * associate, every parameter clamps to [1e-6, 1 − 1e-6] each
    * round. The table has ≤ 2^k rows regardless of corpus size.
    */
  def fsEm(counts: Map[Int, Long], k: Int, nIter: Int): FsParams = {
    require(k >= 1 && k <= 16, "1..16 attributes")
    require(nIter >= 1, "nIter >= 1")
    val P = 1 << k
    val n = Array.tabulate(P)(p => counts.getOrElse(p, 0L).toDouble)
    var N = 0.0
    var p0 = 0
    while (p0 < P) { N = N + n(p0); p0 += 1 }
    require(N > 0, "no candidate pairs — nothing to estimate from")
    def clamp(x: Double): Double =
      math.min(math.max(x, 1e-6), 1.0 - 1e-6)
    var lambda = 0.1
    val m = Array.fill(k)(0.9)
    val u = Array.fill(k)(0.1)
    var it = 0
    while (it < nIter) {
      val w = new Array[Double](P)
      var p = 0
      while (p < P) {
        w(p) = FsParams(lambda, m, u).posterior(p)
        p += 1
      }
      var s = 0.0
      p = 0
      while (p < P) { s = s + n(p) * w(p); p += 1 }
      var i = 0
      while (i < k) {
        var mi = 0.0; var ui = 0.0
        var q = 0
        while (q < P) {
          if (((q >> i) & 1) == 1) {
            mi = mi + n(q) * w(q)
            ui = ui + n(q) * (1.0 - w(q))
          }
          q += 1
        }
        m(i) = clamp(mi / s)
        u(i) = clamp(ui / (N - s))
        i += 1
      }
      lambda = clamp(s / N)
      it += 1
    }
    FsParams(lambda, m, u)
  }

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
                 maxDist: Int,
                 maxBlockPairs: Long = 50000000L): DataFrame = {
    require(blockCols.nonEmpty, "blocking key required — all-pairs linkage is not offered")
    requireBlockPairsBounded(a, b, blockCols, maxBlockPairs)
    val cand = a.select((blockCols.map(F.col) :+ F.col(idA) :+ F.col(nameA)): _*)
      .join(b.select((blockCols.map(F.col) :+ F.col(idB) :+ F.col(nameB)): _*),
        blockCols)
      // threshold-bounded levenshtein: the banded O(len·maxDist) form
      // returns the EXACT distance when ≤ maxDist and -1 otherwise —
      // identical kept rows and identical lev values, a fraction of
      // the full O(len²) table per discarded candidate
      .withColumn("lev", F.levenshtein(F.col(nameA), F.col(nameB), maxDist))
      .where(F.col("lev") >= 0)
    val w = Window.partitionBy(idB)
      .orderBy(F.col("lev").asc, F.col(idA).asc)
    cand
      .withColumn("n_candidates", F.count(F.lit(1))
        .over(Window.partitionBy(idB)))
      .withColumn("__rn", F.row_number().over(w))
      .where(F.col("__rn") === 1)
      .select(F.col(idB), F.col(idA), F.col("lev"), F.col("n_candidates"))
  }

  /** LOUD block-size guard shared by the blocked linkage scorers: the
    * pair cost is Σ_blk |A_blk|·|B_blk|, quadratic in block size, and
    * a degenerate block key (constant column, giant city) silently
    * turns blocking into all-pairs. One cheap counts-only pass (two
    * map-side-combined aggregates + a join on the block key, one-row
    * collect) refuses the plan before any pair is generated; the fix
    * is a tighter/multi-pass key or [[linkSortedNeighborhood]], whose
    * candidate count is window-bounded by construction. Decimal
    * product — two 1e10-row blocks must refuse, not wrap.
    */
  private def requireBlockPairsBounded(a: DataFrame, b: DataFrame,
      blockCols: Seq[String], maxBlockPairs: Long): Unit = {
    // ONE pass (r17): tag the side, union, single map-side-combined
    // groupBy with conditional counts — replaces the r16 shape (two
    // per-side aggregates + a join), halving the guard's stage count;
    // blocks present on one side only yield a 0 product, exactly the
    // pairs they generate, so max is unchanged vs the join formulation
    val blocks = blockCols.map(F.col)
    val worst = a.select((blocks :+ F.lit(1).as("__sa")): _*)
      .unionByName(b.select((blocks :+ F.lit(0).as("__sa")): _*))
      .groupBy(blocks: _*)
      .agg(F.sum(F.col("__sa")).cast("decimal(19,0)").as("__na"),
        F.sum(F.lit(1) - F.col("__sa")).cast("decimal(19,0)").as("__nb"))
      .agg(F.max(F.col("__na") * F.col("__nb")).as("m"))
      .head()
    val worstPairs =
      if (worst.isNullAt(0)) java.math.BigDecimal.ZERO else worst.getDecimal(0)
    require(worstPairs.compareTo(
        java.math.BigDecimal.valueOf(maxBlockPairs)) <= 0,
      s"blocked linkage: largest block generates $worstPairs candidate " +
        s"pairs (> cap $maxBlockPairs) — blocking on " +
        s"${blockCols.mkString(",")} has gone quadratic; tighten the " +
        "block key or use linkSortedNeighborhood (window-bounded " +
        "candidates)")
  }

  /** [[linkByName]] with the record-linkage-standard Jaro-Winkler
    * scorer instead of raw edit distance (Winkler '90; Christen
    * TKDE'12's recommended default for person/org names — prefix
    * agreement and transpositions dominate name noise, which edit
    * distance over-penalizes). Same blocking, guard, and plan shape;
    * pairs keep jw_ppm ≥ `minPpm` (similarity in ppm fixed point —
    * [[graft.functions.HashExprs.jaroWinklerPpm]], a codegen'd
    * kernel), and each B record resolves to the (highest-jw, then
    * lowest-idA) candidate — an INTEGER argmax, so the cross-engine
    * comparison never orders raw doubles. Returns
    * (idB, idA, jw_ppm, n_candidates).
    */
  def linkByNameJw(a: DataFrame, b: DataFrame, blockCols: Seq[String],
                   idA: String, nameA: String, idB: String, nameB: String,
                   minPpm: Long,
                   maxBlockPairs: Long = 50000000L): DataFrame = {
    require(blockCols.nonEmpty, "blocking key required — all-pairs linkage is not offered")
    requireBlockPairsBounded(a, b, blockCols, maxBlockPairs)
    val cand = a.select((blockCols.map(F.col) :+ F.col(idA) :+ F.col(nameA)): _*)
      .join(b.select((blockCols.map(F.col) :+ F.col(idB) :+ F.col(nameB)): _*),
        blockCols)
      .withColumn("jw_ppm", graft.functions.HashExprs.jaroWinklerPpm(
        F.col(nameA), F.col(nameB)))
      .where(F.col("jw_ppm") >= minPpm)
    val w = Window.partitionBy(idB)
      .orderBy(F.col("jw_ppm").desc, F.col(idA).asc)
    cand
      .withColumn("n_candidates", F.count(F.lit(1))
        .over(Window.partitionBy(idB)))
      .withColumn("__rn", F.row_number().over(w))
      .where(F.col("__rn") === 1)
      .select(F.col(idB), F.col(idA), F.col("jw_ppm"), F.col("n_candidates"))
  }

  /** Sorted-neighborhood linkage (Hernández & Stolfo SIGMOD'95; the
    * standard scale-safe alternative to blocking in Christen's survey,
    * TKDE 2012): union both sources, totally order the merged stream
    * by (`sortKey`, side, id), and compare only records within a
    * sliding window of `window` consecutive positions — candidate
    * pairs are the cross-source pairs at rank distance ≤ window−1.
    *
    * Why this scales where [[linkByName]]'s blocking may not: blocked
    * pair cost is Σ_blk |A_blk|·|B_blk|, quadratic in the block size,
    * and block sizes grow with the corpus when the block key's
    * cardinality is fixed. Here the candidate count is EXACTLY
    * ≤ n·(window−1) regardless of key skew — an oversized "block"
    * (many records sharing a sort key) still contributes only
    * window-bounded pairs.
    *
    * Plan shape (no single-partition stage anywhere): global rank via
    * [[graft.operators.Ranks.globalRank]] (range-partitioned sort +
    * per-partition offsets), then neighbor pairing as a plain hash
    * equi-join on rank bands of width g = window−1 — the lower-rank
    * side is emitted into its own band and the next (2 rows), the
    * higher side once, so every pair at rank distance 1..g matches in
    * exactly one band (ry ≤ rx+g ⟹ ry div g ∈ {rx div g, rx div g+1});
    * bands hold exactly g rows each, so the join is skew-free BY
    * CONSTRUCTION. Scoring + 1:1 resolution are identical to
    * [[linkByName]] (raw Levenshtein ≤ maxDist, per-B argmax on
    * (lev, idA) — integer keys only).
    *
    * `sortKeyA`/`sortKeyB`: the SNM sort key columns (typically a
    * normalized/phonetic form of the name — key design decides recall,
    * exactly as block keys do for blocking). Ids keep their NATIVE
    * types (numeric or string): each side's id rides its own column in
    * the merged stream (null on the other side), and since the total
    * order puts `side` before the id tie-breaks, an id only ever
    * compares against ids of its own side — no cross-side common type,
    * no silent cast. Returns (idB, idA, lev, n_candidates) like
    * [[linkByName]] — n_candidates counts the B record's surviving
    * window candidates.
    */
  def linkSortedNeighborhood(a: DataFrame, b: DataFrame,
      sortKeyA: String, sortKeyB: String,
      idA: String, nameA: String, idB: String, nameB: String,
      window: Int, maxDist: Int): DataFrame =
    linkSortedNeighborhoodMulti(a, b, Seq(sortKeyA -> sortKeyB),
      idA, nameA, idB, nameB, window, maxDist)

  /** MULTI-PASS sorted neighborhood (the standard SNM recall lever —
    * Hernández & Stolfo run several passes with DIFFERENT sort keys
    * and union the candidate pairs, since any single key can sort a
    * true match apart when its leading characters are dirty): one
    * window sweep per (sortKeyA, sortKeyB) pass, candidate pairs
    * unioned and deduplicated before the shared scoring/resolution,
    * so n_candidates counts DISTINCT partners across passes and the
    * per-B argmax is over the union. Cost: passes × the single-pass
    * sweep — still O(n·window) per pass, skew-free band joins
    * throughout. The classic key pair: a normalized name ascending
    * and its REVERSE (prefix-dirty names stay adjacent under the
    * suffix key).
    */
  def linkSortedNeighborhoodMulti(a: DataFrame, b: DataFrame,
      sortKeys: Seq[(String, String)],
      idA: String, nameA: String, idB: String, nameB: String,
      window: Int, maxDist: Int): DataFrame = {
    require(sortKeys.nonEmpty, "at least one sort-key pass")
    val uni = sortKeys.map { case (ka, kb) =>
      windowCandidates(a, b, ka, kb, idA, nameA, idB, nameB, window)
    }.reduce(_ unionByName _)
    // a single pass emits each pair exactly once (band join) — only
    // multi-pass needs the dedup shuffle. Names are id-determined, so
    // pair dedup = row dedup.
    val ab = if (sortKeys.sizeIs == 1) uni else uni.distinct()
    snmResolve(ab, idA, idB, "lev",
      F.levenshtein(F.col("__na"), F.col("__nb"), maxDist),
      F.col("lev") >= 0, scoreAsc = true)
  }

  /** [[linkSortedNeighborhood]] with the Jaro-Winkler scorer (r17 —
    * the scale-safe SNM candidate bound paired with Christen
    * TKDE'12's recommended name scorer; previously the quadratic-block
    * refusal pointed at an SNM path that only offered raw edit
    * distance). Pairs keep jw_ppm ≥ `minPpm` (integer fixed point,
    * [[graft.functions.HashExprs.jaroWinklerPpm]] — byte-exact vs
    * DuckDB incl. non-ASCII, see the kernel contract), each B record
    * resolves to the
    * (highest-jw, then lowest-idA) candidate — an integer argmax.
    * Returns (idB, idA, jw_ppm, n_candidates); candidate cost is
    * n·(window−1) per pass BY CONSTRUCTION, same as the Levenshtein
    * path.
    */
  def linkSortedNeighborhoodJw(a: DataFrame, b: DataFrame,
      sortKeyA: String, sortKeyB: String,
      idA: String, nameA: String, idB: String, nameB: String,
      window: Int, minPpm: Long): DataFrame =
    linkSortedNeighborhoodJwMulti(a, b, Seq(sortKeyA -> sortKeyB),
      idA, nameA, idB, nameB, window, minPpm)

  /** Multi-pass [[linkSortedNeighborhoodJw]] — one window sweep per
    * (sortKeyA, sortKeyB) pass, unioned + deduplicated candidates,
    * shared JW scoring/argmax (the [[linkSortedNeighborhoodMulti]]
    * recall lever with the JW scorer).
    */
  def linkSortedNeighborhoodJwMulti(a: DataFrame, b: DataFrame,
      sortKeys: Seq[(String, String)],
      idA: String, nameA: String, idB: String, nameB: String,
      window: Int, minPpm: Long): DataFrame = {
    require(sortKeys.nonEmpty, "at least one sort-key pass")
    val uni = sortKeys.map { case (ka, kb) =>
      windowCandidates(a, b, ka, kb, idA, nameA, idB, nameB, window)
    }.reduce(_ unionByName _)
    val ab = if (sortKeys.sizeIs == 1) uni else uni.distinct()
    snmResolve(ab, idA, idB, "jw_ppm",
      graft.functions.HashExprs.jaroWinklerPpm(F.col("__na"), F.col("__nb")),
      F.col("jw_ppm") >= minPpm, scoreAsc = false)
  }

  /** Shared SNM scoring + 1:1 resolution over (__ia, __na, __ib, __nb)
    * candidate pairs: score, keep, per-B integer argmax on
    * (score asc|desc, idA asc) — the tail every SNM scorer variant
    * funnels through.
    */
  private def snmResolve(ab: DataFrame, idA: String, idB: String,
      scoreName: String, score: org.apache.spark.sql.Column,
      keep: org.apache.spark.sql.Column, scoreAsc: Boolean): DataFrame = {
    val cand = ab.withColumn(scoreName, score).where(keep)
    val ord = if (scoreAsc) F.col(scoreName).asc else F.col(scoreName).desc
    val w = Window.partitionBy(F.col("__ib"))
      .orderBy(ord, F.col("__ia").asc)
    cand
      .withColumn("n_candidates", F.count(F.lit(1))
        .over(Window.partitionBy(F.col("__ib"))))
      .withColumn("__rn", F.row_number().over(w))
      .where(F.col("__rn") === 1)
      .select(F.col("__ib").as(idB), F.col("__ia").as(idA),
        F.col(scoreName), F.col("n_candidates"))
  }

  /** Persist the A side (the MASTER/reference source) as a
    * directory-partitioned link index: one partition per block-key
    * combination, so serving a batch of B records reads ONLY the
    * partitions its block keys touch (partition pruning — the
    * bm25/IVF served-index story applied to entity resolution). Block
    * columns must be low-cardinality (they are the partition dirs);
    * that is already the blocking contract.
    */
  def linkIndexBuild(a: DataFrame, path: String, blockCols: Seq[String],
                     idA: String, nameA: String): Unit = {
    require(blockCols.nonEmpty, "blocking key required")
    // cluster by the partition key before the write (guide §6: small
    // files hurt twice — here every input split would otherwise leave
    // one file in EVERY block directory, |splits|×|blocks| tiny files,
    // and each pruned serve pays the per-file open cost; the Iceberg
    // hash write-distribution mode in plain parquet form). Blocks are
    // low-cardinality and individually task-sized by the blocking
    // contract, so one exchange yields one file per block dir.
    graft.sources.Sources.writePartitioned(
      a.select((blockCols.map(F.col) :+ F.col(idA) :+ F.col(nameA)): _*)
        .repartition(blockCols.map(F.col): _*),
      path, partitionBy = blockCols)
  }

  /** Link a (small) B batch against a [[linkIndexBuild]] index without
    * scanning the master: the batch's DISTINCT block-key tuples (a
    * driver-small list by the low-cardinality blocking contract)
    * become an OR-of-ANDs predicate on the partition columns, so the
    * scan is partition-pruned to the touched blocks before the same
    * join+score+resolve as [[linkByName]] runs. This is the
    * per-micro-batch serving shape: cost tracks the BATCH's block
    * footprint, never the master's size.
    */
  def linkByNameIndex(spark: org.apache.spark.sql.SparkSession,
                      path: String, b: DataFrame, blockCols: Seq[String],
                      idA: String, nameA: String, idB: String, nameB: String,
                      maxDist: Int, maxBatchBlocks: Int = 1000): DataFrame = {
    require(blockCols.nonEmpty, "blocking key required")
    val keys = b.select(blockCols.map(F.col): _*).distinct()
      .limit(maxBatchBlocks + 1).collect()
    // LOUD contract guard: the collected key list becomes an
    // OR-of-ANDs pruning predicate, so an unbounded-cardinality misuse
    // (blocking on a near-unique column) would build a giant predicate
    // and defeat pruning — refuse past the documented cap instead of
    // degrading silently. limit(cap+1) bounds the collect itself.
    require(keys.length <= maxBatchBlocks,
      s"linkByNameIndex: batch touches > $maxBatchBlocks distinct block-" +
        s"key tuples on ${blockCols.mkString(",")} — the low-cardinality " +
        "blocking contract is violated; use a coarser block key or link " +
        "the batch with linkByName against the full master")
    val aIdx = spark.read.parquet(path)
    if (keys.isEmpty) {
      // empty batch: empty result with the contract schema
      return linkByName(aIdx.limit(0), b, blockCols, idA, nameA, idB, nameB,
        maxDist)
    }
    val pruned = aIdx.where(keys.map { r =>
      blockCols.zipWithIndex.map { case (c, i) =>
        F.col(c) === F.lit(r.get(i))
      }.reduce(_ && _)
    }.reduce(_ || _))
    linkByName(pruned, b, blockCols, idA, nameA, idB, nameB, maxDist)
  }

  /** Golden-record construction (survivorship) from resolved links —
    * the step AFTER entity resolution: each master record `idA` plus
    * every B record linked to it forms a cluster, and per attribute
    * the surviving value is chosen by majority vote with the standard
    * deterministic rule stack (most votes, then master-source
    * priority, then lexicographically smallest value — cf. the
    * fusion/survivorship stage in Bleiholder & Naumann's data-fusion
    * survey, ACM CS 2008). All-integer resolution: vote counts and a
    * 0/1 master flag feed a row_number, no scores, no floats.
    *
    * Attributes must be STRING or integral on both sides (they are
    * compared and emitted as strings; float→string rendering is
    * engine-specific, so floats are refused loudly — stringify via an
    * explicit decimal cast first). Attributes with no non-null vote in
    * a cluster emit no row (honest absence, not a fabricated null).
    * Returns (idA, attribute, value, n_votes, n_distinct) — n_votes =
    * winner's votes, n_distinct = competing distinct values.
    *
    * Scale: members = A ∪ (links ⋈ B) — one equi-join; the unpivot
    * multiplies members × |attrs| (the profile Expand trade); one
    * map-side-combined vote aggregate, then windows partitioned by the
    * high-cardinality (cluster, attribute) key. Nothing corpus-sized
    * crosses a single partition.
    */
  def goldenRecords(a: DataFrame, b: DataFrame, links: DataFrame,
      idA: String, idB: String, attrs: Seq[String]): DataFrame = {
    require(attrs.nonEmpty, "at least one attribute to survive")
    requireGoldenAttrTypes(a, attrs, "A")
    requireGoldenAttrTypes(b, attrs, "B")
    def strAttrs(df: DataFrame) = attrs.map(c => F.col(c).cast("string").as(c))
    val aM = a.select((F.col(idA).as("__cid") +: F.lit(1).as("__m") +:
      strAttrs(a)): _*)
    val bM = links.select(F.col(idB), F.col(idA).as("__cid"))
      .join(b, Seq(idB))
      .select((F.col("__cid") +: F.lit(0).as("__m") +: strAttrs(b)): _*)
    goldenFromVotes(goldenVotesOf(aM.unionByName(bM), attrs), idA)
  }

  /** The shared survivorship attribute-type contract: STRING or
    * integral only — attributes are compared and emitted as strings,
    * and float→string rendering is engine-specific, so floats are
    * refused loudly on EVERY path that stringifies (batch
    * [[goldenRecords]] and the streaming seed/ingest loops alike);
    * stringify floats via an explicit decimal cast first.
    */
  def requireGoldenAttrTypes(df: DataFrame, attrs: Seq[String],
                             side: String): Unit = attrs.foreach { c =>
    import org.apache.spark.sql.types._
    val ok = df.schema(c).dataType match {
      case _: StringType => true
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    require(ok, s"golden survivorship: attribute $c on side $side must " +
      "be STRING or integral — stringify floats explicitly (engine-" +
      "portable rendering is the caller's contract)")
  }

  /** The MERGEABLE vote table behind [[goldenRecords]]: members carry
    * (__cid, __m 0/1, stringified attrs) and reduce to
    * (__cid, attribute, value, n_votes, __mm) — counts ADD and the
    * master flag MAXES across partial tables, so incremental
    * maintenance ([[graft.streaming.StreamingLinkage.goldenIngest]])
    * merges per-batch votes into a persisted state table without ever
    * rescanning history; state size is bounded by distinct
    * (cluster, attribute, value), i.e. by the entity space, not the
    * stream length.
    */
  def goldenVotesOf(members: DataFrame, attrs: Seq[String]): DataFrame =
    members
      .select(F.col("__cid"), F.col("__m"),
        F.explode(F.array(attrs.map(c =>
          F.struct(F.lit(c).as("k"), F.col(c).as("v"))): _*)).as("p"))
      .select(F.col("__cid"), F.col("__m"),
        F.col("p.k").as("attribute"), F.col("p.v").as("value"))
      .where(F.col("value").isNotNull)
      .groupBy("__cid", "attribute", "value")
      .agg(F.count(F.lit(1)).as("n_votes"), F.max("__m").as("__mm"))

  /** Merge partial vote tables (same schema as [[goldenVotesOf]]):
    * counts add, master flags max. */
  def goldenVotesMerge(parts: DataFrame): DataFrame =
    parts.groupBy("__cid", "attribute", "value")
      .agg(F.sum("n_votes").as("n_votes"), F.max("__mm").as("__mm"))

  /** Resolve a vote table to golden rows — the argmax stage of
    * [[goldenRecords]], shared verbatim by the batch operator and the
    * incremental serve path.
    */
  def goldenFromVotes(votes: DataFrame, idA: String): DataFrame = {
    val part = Window.partitionBy("__cid", "attribute")
    val w = part.orderBy(F.col("n_votes").desc, F.col("__mm").desc,
      F.col("value").asc)
    votes
      .withColumn("n_distinct", F.count(F.lit(1)).over(part))
      .withColumn("__rn", F.row_number().over(w))
      .where(F.col("__rn") === 1)
      .select(F.col("__cid").as(idA), F.col("attribute"), F.col("value"),
        F.col("n_votes"), F.col("n_distinct"))
  }

  /** One SNM window sweep: global rank over the merged (key, side,
    * id) order, cross-source pairs at rank distance ≤ window−1 via
    * the exactly-once band equi-join. Returns (__ia, __na, __ib,
    * __nb) candidate pairs, un-scored.
    */
  private def windowCandidates(a: DataFrame, b: DataFrame,
      sortKeyA: String, sortKeyB: String,
      idA: String, nameA: String, idB: String, nameB: String,
      window: Int): DataFrame = {
    require(window >= 2, "window must cover at least 2 records")
    val g = (window - 1).toLong
    // native-typed id carry: each side's id in its own column, null on
    // the other side. The total order is (__key, __side, __ida, __idb)
    // — within any equal (__key, __side) group exactly one id column is
    // non-null and it is that side's native type, so ids never compare
    // across sides and never cast (string ids order as strings, not as
    // silently-nulled longs).
    val aTyp = a.schema(a.schema.fieldIndex(idA)).dataType
    val bTyp = b.schema(b.schema.fieldIndex(idB)).dataType
    val u = a.select(F.col(sortKeyA).as("__key"), F.lit(0).as("__side"),
        F.col(idA).as("__ida"), F.lit(null).cast(bTyp).as("__idb"),
        F.col(nameA).as("__name"))
      .unionByName(
        b.select(F.col(sortKeyB).as("__key"), F.lit(1).as("__side"),
          F.lit(null).cast(aTyp).as("__ida"), F.col(idB).as("__idb"),
          F.col(nameB).as("__name")))
    val ranked = graft.operators.Ranks.globalRank(u,
      Seq(F.col("__key").asc, F.col("__side").asc,
        F.col("__ida").asc, F.col("__idb").asc), "__r")
    // band join: lower-rank row in bands (r div g, r div g + 1),
    // higher-rank row in its own band — exactly-once pairing
    val lo = ranked.select(F.col("__side").as("s1"),
      F.col("__ida").as("ia1"), F.col("__idb").as("ib1"),
      F.col("__name").as("n1"), F.col("__r").as("r1"),
      F.explode(F.array(F.expr(s"__r div ${g}L"),
        F.expr(s"__r div ${g}L + 1L"))).as("__bk"))
    val hi = ranked.select(F.col("__side").as("s2"),
      F.col("__ida").as("ia2"), F.col("__idb").as("ib2"),
      F.col("__name").as("n2"), F.col("__r").as("r2"),
      F.expr(s"__r div ${g}L").as("__bk"))
    lo.join(hi, "__bk")
      .where(F.col("r2") - F.col("r1") >= 1L &&
        F.col("r2") - F.col("r1") <= g &&
        F.col("s1") =!= F.col("s2"))
      .select(
        // sides differ, so exactly one of each pair is non-null
        F.coalesce(F.col("ia1"), F.col("ia2")).as("__ia"),
        F.when(F.col("s1") === 0, F.col("n1")).otherwise(F.col("n2")).as("__na"),
        F.coalesce(F.col("ib1"), F.col("ib2")).as("__ib"),
        F.when(F.col("s1") === 0, F.col("n2")).otherwise(F.col("n1")).as("__nb"))
  }
}
