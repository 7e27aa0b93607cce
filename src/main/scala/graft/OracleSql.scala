package graft

import graft.text.TextOps

/** DuckDB SQL twins of SparkEntry.queries, used by the driver's
  * correctness gate. Must mirror the Spark computations EXACTLY —
  * same aliases, same deterministic ORDER BY, same numeric policy
  * (SURVEY.md §5).
  */
object OracleSql {

  /** DuckDB expression: lowercase word tokens of `c`. */
  private def toks(c: String) =
    s"list_filter(string_split_regex(lower($c), '[^a-z0-9]+'), t -> t <> '')"

  private def phraseSql: String =
    s"""WITH qt AS (SELECT * FROM (VALUES
       |    (0, 0, 'batch'), (0, 1, 'batch'),
       |    (1, 0, 'window'), (1, 1, 'window'),
       |    (2, 0, 'sort'), (2, 1, 'merge'),
       |    (3, 0, 'the'), (3, 1, 'fast')) AS v(query_id, idx, term)),
       |qm AS (SELECT query_id, count(*) AS m FROM qt GROUP BY 1),
       |docs AS (SELECT doc_id, ${toks("text")} AS tl FROM documents),
       |ex AS (SELECT doc_id, unnest(tl) AS term,
       |              unnest(range(len(tl))) AS pos FROM docs),
       |st AS (SELECT qt.query_id, e.doc_id, e.pos - qt.idx AS start,
       |              count(DISTINCT qt.idx) AS nidx
       |       FROM ex e JOIN qt ON e.term = qt.term
       |       GROUP BY 1, 2, 3),
       |tf AS (SELECT s.query_id, s.doc_id, count(*) AS phrase_tf
       |       FROM st s JOIN qm USING (query_id) WHERE s.nidx = qm.m
       |       GROUP BY 1, 2),
       |top AS (SELECT query_id, doc_id, phrase_tf,
       |               row_number() OVER (PARTITION BY query_id
       |                 ORDER BY phrase_tf DESC, doc_id) AS rank
       |        FROM tf)
       |SELECT query_id, doc_id, CAST(phrase_tf AS BIGINT) AS phrase_tf,
       |       CAST(rank AS INTEGER) AS rank
       |FROM top WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  private def sqlList(words: Seq[String]) =
    words.map(w => s"'$w'").mkString("[", ", ", "]")

  private val editScored =
    """WITH src AS (SELECT DISTINCT trim(CAST(p_name AS VARCHAR)) AS source FROM part
      |             WHERE p_name IS NOT NULL AND trim(CAST(p_name AS VARCHAR)) <> ''),
      |tgt AS (SELECT DISTINCT trim(CAST(p_name AS VARCHAR)) AS target FROM part
      |        WHERE p_size <= 25 AND p_name IS NOT NULL AND trim(CAST(p_name AS VARCHAR)) <> ''),
      |scored AS (
      |  SELECT source, target,
      |         1.0 - CAST(levenshtein(source, target) AS DOUBLE)
      |               / CAST(greatest(length(source), length(target)) AS DOUBLE) AS similarity
      |  FROM src CROSS JOIN tgt),
      |best AS (
      |  SELECT source, target, similarity,
      |         row_number() OVER (PARTITION BY source ORDER BY similarity DESC, target ASC) AS rn
      |  FROM scored WHERE similarity >= 0.5)
      |""".stripMargin

  /** Exact word-3-gram-shingle Jaccard pairs at threshold 0.5 — the
    * oracle for BOTH dedup_jaccard (PPJoin exact) and dedup_minhash
    * (banded approximate with exact verification): precision is 1.0 by
    * construction for both, so equality == full recall.
    */
  private val jaccardPairsCte =
    s"""WITH tk AS (SELECT doc_id, ${toks("text")} AS tl FROM documents),
       |sh AS (SELECT DISTINCT doc_id,
       |         unnest([tl[i] || ' ' || tl[i+1] || ' ' || tl[i+2]
       |                 for i in generate_series(1, greatest(len(tl) - 2, 0))]) AS sh
       |       FROM tk),
       |n AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
       |i AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS ni
       |      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
       |pairs AS (
       |  SELECT id1, id2, jaccard FROM (
       |    SELECT id1, id2, CAST(ni AS DOUBLE) / CAST(n1.sz + n2.sz - ni AS DOUBLE) AS jaccard
       |    FROM i JOIN n n1 ON id1 = n1.doc_id JOIN n n2 ON id2 = n2.doc_id)
       |  WHERE jaccard >= 0.5)
       |""".stripMargin

  private val exactJaccardPairs = jaccardPairsCte +
    "SELECT id1, id2, jaccard FROM pairs ORDER BY id1, id2"

  /** BPE-training twins: the 8 merge stages unrolled as CTEs. Stage k
    * recounts all overlapping adjacent symbol pairs of the current
    * padded representations (weighted by word frequency), takes the
    * (count desc, pair asc) argmax, and applies the merge with the
    * SAME single-pass left-to-right `replace` semantics Spark's
    * `replace` has (both resume the scan after each replacement).
    * Char split via string_split(word, '') = Spark's
    * filter(split(word, ''), c -> c <> '').
    */
  private val bpeMerges = 8

  private def bpeStageCtes: String = {
    // every stage CTE is MATERIALIZED: DuckDB would otherwise inline
    // each reference, and the k-th stage's expression tree re-derives
    // the whole prefix — exponential blowup across 8 unrolled stages
    val wc =
      s"""wc AS MATERIALIZED (SELECT tok AS word, count(*) AS cnt
         |       FROM (SELECT unnest(${toks("text")}) AS tok FROM documents) GROUP BY tok),
         |w0 AS MATERIALIZED (SELECT ' ' || array_to_string(string_split(word, ''), ' ') || ' ' AS repr, cnt FROM wc)""".stripMargin
    val stages = (1 to bpeMerges).map { k =>
      s"""p$k AS MATERIALIZED (SELECT pair, CAST(sum(cnt) AS BIGINT) AS c
         |  FROM (SELECT cnt, unnest([l[i] || ' ' || l[i+1]
         |                            for i in generate_series(1, greatest(len(l) - 1, 0))]) AS pair
         |        FROM (SELECT string_split(trim(repr), ' ') AS l, cnt FROM w${k - 1}))
         |  GROUP BY pair),
         |b$k AS MATERIALIZED (SELECT pair, c FROM p$k ORDER BY c DESC, pair ASC LIMIT 1),
         |w$k AS MATERIALIZED (SELECT replace(repr, ' ' || coalesce((SELECT pair FROM b$k), chr(1) || chr(2)) || ' ',
         |                       ' ' || replace(coalesce((SELECT pair FROM b$k), chr(1) || chr(2)), ' ', '') || ' ') AS repr, cnt
         |        FROM w${k - 1})""".stripMargin
    }
    (wc +: stages).mkString(",\n")
  }

  private val bpeTrainSql: String = {
    val rows = (1 to bpeMerges).map(k =>
      s"SELECT CAST($k AS BIGINT) AS step, pair, replace(pair, ' ', '') AS merged, c AS cnt FROM b$k")
    s"WITH $bpeStageCtes\n${rows.mkString("\nUNION ALL ")}\nORDER BY step"
  }

  /** curate_bpe_deep_gate twin (r19): the 1024-merge driver-side
    * trainer cannot be replayed by unrolled CTEs, so the gate
    * verifies the argmax CHAIN from the companion dump — w_{k-1} is
    * reconstructed by RECURSIVELY applying the dumped merges to the
    * corpus vocabulary (same padded representation, same replace
    * semantics), and each pinned step's (count desc, pair asc)
    * argmax is recomputed from scratch over that reconstruction. A
    * hash match proves every pinned step picked the true argmax
    * given its prefix — and because the reconstruction itself CONSUMES
    * the dumped prefix, a wrong early merge corrupts every later
    * pinned step too.
    */
  private val bpeDeepGateSql: String = {
    val pinned = graft.SparkEntry.BpeDeepPinnedSteps.mkString(", ")
    s"""WITH RECURSIVE
       |wc AS MATERIALIZED (SELECT u AS word, count(*) AS cnt
       |      FROM (SELECT unnest([l[i] || '▁' || l[i+1] || '▁' || l[i+2]
       |                           for i in generate_series(1, greatest(len(l) - 2, 0))]) AS u
       |            FROM (SELECT ${toks("text")} AS l FROM documents)) GROUP BY u),
       |w0 AS MATERIALIZED (SELECT ' ' || array_to_string(string_split(word, ''), ' ') || ' ' AS repr, cnt FROM wc),
       |m AS MATERIALIZED (SELECT step, pair, merged
       |      FROM read_parquet('__VERIFY_OUT__/curate_bpe_deep/*.parquet')),
       |iter AS (SELECT CAST(0 AS BIGINT) AS step, repr, cnt FROM w0
       |  UNION ALL
       |  SELECT i.step + 1,
       |         replace(i.repr, ' ' || m.pair || ' ', ' ' || m.merged || ' '),
       |         i.cnt
       |  FROM iter i JOIN m ON m.step = i.step + 1),
       |pc AS (SELECT step + 1 AS step, pair, CAST(sum(cnt) AS BIGINT) AS c
       |  FROM (SELECT step, cnt,
       |          unnest([l[i] || ' ' || l[i+1]
       |                  for i in generate_series(1, greatest(len(l) - 1, 0))]) AS pair
       |        FROM (SELECT step, string_split(trim(repr), ' ') AS l, cnt
       |              FROM iter WHERE step + 1 IN ($pinned)))
       |  GROUP BY 1, 2)
       |SELECT step, pair, replace(pair, ' ', '') AS merged, c AS cnt
       |FROM (SELECT step, pair, c,
       |        row_number() OVER (PARTITION BY step ORDER BY c DESC, pair ASC) AS rn
       |      FROM pc)
       |WHERE rn = 1 ORDER BY step""".stripMargin
  }

  /** lang_id_nb twins (r19): the deterministic multilingual fixture
    * (SparkEntry.langFixture — same hash, vocab tables, marker
    * injection), Cavnar-Trenkle padded char trigrams, then the
    * text_classify_nb NB chain verbatim over those features.
    */
  private def langNbCtes: String = {
    val vocSql = graft.SparkEntry.LangNbVocab
      .map(_._2.map(w => s"'$w'").mkString("[", ", ", "]"))
      .mkString("[", ", ", "]")
    val langsSql = graft.SparkEntry.LangNbVocab
      .map(l => s"'${l._1}'").mkString("[", ", ", "]")
    val markersSql = graft.SparkEntry.LangNbMarkers
      .map(m => s"'$m'").mkString("[", ", ", "]")
    val tg = s"flatten(list_transform(${toks("text")}, " +
      "w -> [substr('_' || w || '_', i, 3) " +
      "for i in generate_series(1, len(w))]))"
    s"""WITH fx AS (SELECT doc_id,
       |    $langsSql[CAST(h % 5 + 1 AS INTEGER)] AS lang,
       |    array_to_string(
       |      [$vocSql[CAST(h % 5 + 1 AS INTEGER)]
       |         [CAST(((doc_id * 31 + j) * 2654435761) % 999983 % 12 + 1 AS INTEGER)]
       |       for j in generate_series(1, 6 + ((h // 5) % 5))], ' ')
       |      || CASE WHEN h % 3 = 0
       |              THEN ' ' || $markersSql[CAST(h % 5 + 1 AS INTEGER)]
       |              ELSE '' END AS text
       |  FROM (SELECT doc_id, (doc_id * 2654435761) % 999983 AS h
       |        FROM documents)),
       |tr AS (SELECT doc_id, lang, $tg AS tl FROM fx WHERE doc_id % 5 <> 0),
       |te AS (SELECT doc_id, lang, text, $tg AS tl FROM fx WHERE doc_id % 5 = 0),
       |trtok AS (SELECT lang, unnest(tl) AS tok FROM tr),
       |cnt AS (SELECT lang, tok, count(*) AS cnt FROM trtok GROUP BY lang, tok),
       |tot AS (SELECT lang, sum(cnt) AS tot FROM cnt GROUP BY lang),
       |vs AS (SELECT count(DISTINCT tok) AS v FROM cnt),
       |pri AS (SELECT lang, count(*) AS n_docs FROM tr GROUP BY lang),
       |nall AS (SELECT count(*) AS n_all FROM tr),
       |classes AS (
       |  SELECT p.lang AS cl, coalesce(t.tot, 0) AS tot,
       |         CAST(round(ln(CAST(p.n_docs AS DOUBLE) / CAST(a.n_all AS DOUBLE)), 9)
       |              AS DECIMAL(20,9)) AS prior_c
       |  FROM pri p LEFT JOIN tot t ON t.lang = p.lang CROSS JOIN nall a),
       |tetf AS (
       |  SELECT doc_id, tok, count(*) AS tf
       |  FROM (SELECT doc_id, unnest(tl) AS tok FROM te)
       |  WHERE tok IN (SELECT DISTINCT tok FROM cnt)
       |  GROUP BY doc_id, tok),
       |contrib AS (
       |  SELECT f.doc_id, k.cl,
       |         CAST(round(f.tf * ln((CAST(coalesce(c.cnt, 0) AS DOUBLE) + 1)
       |                              / CAST(k.tot + v.v AS DOUBLE)), 9)
       |              AS DECIMAL(20,9)) AS c
       |  FROM tetf f CROSS JOIN classes k
       |  LEFT JOIN cnt c ON c.lang = k.cl AND c.tok = f.tok
       |  CROSS JOIN vs v),
       |nbscored AS (
       |  SELECT s.doc_id, s.cl, s.ll + k.prior_c AS score
       |  FROM (SELECT doc_id, cl, sum(c) AS ll FROM contrib GROUP BY doc_id, cl) s
       |  JOIN classes k ON k.cl = s.cl),
       |nbpred AS (
       |  SELECT doc_id, cl AS predicted FROM (
       |    SELECT doc_id, cl,
       |           row_number() OVER (PARTITION BY doc_id
       |                              ORDER BY score DESC, cl ASC) AS rk
       |    FROM nbscored) WHERE rk = 1),
       |fb AS (SELECT cl AS fallback FROM classes
       |       ORDER BY prior_c DESC, cl ASC LIMIT 1)""".stripMargin
  }

  private val langNbVerdictSelect: String =
    """SELECT e.doc_id AS id, e.lang AS label,
      |       coalesce(p.predicted, f.fallback) AS predicted,
      |       CASE WHEN coalesce(p.predicted, f.fallback) = e.lang
      |            THEN 1 ELSE 0 END AS correct
      |FROM te e LEFT JOIN nbpred p ON p.doc_id = e.doc_id CROSS JOIN fb f""".stripMargin

  /** er_resolve_fs twin (r19): unsupervised Fellegi-Sunter EM over
    * the blocked candidates' 8-pattern agreement table, all 15 rounds
    * UNROLLED as CTE pairs mirroring Linkage.fsEm's canonical IEEE
    * operation order exactly (patterns/factors ascend, sums left-
    * associate, per-round clamps, posterior floor'd to ppm). Numeric
    * literals are e-notation: DuckDB parses a bare 0.1 as DECIMAL,
    * which would run the recursion in decimal arithmetic instead of
    * the driver's doubles.
    */
  /** Shared EM-replay prelude for the two er_resolve_fs twins: the
    * WITH chain from the dirty-twin sources through the 15 unrolled
    * EM rounds to `wf` (final params + per-pattern posteriors) and
    * `ws` (pid → post_ppm). Factored out in r20 so the bands twin
    * replays the IDENTICAL arithmetic.
    */
  private val erFsPrelude: String = {
    val k = 3; val P = 1 << k; val rounds = 15
    def mp(p: Int) = (0 until k)
      .map(i => if (((p >> i) & 1) == 1) s"m$i" else s"(1e0 - m$i)")
      .mkString(" * ")
    def up(p: Int) = (0 until k)
      .map(i => if (((p >> i) & 1) == 1) s"u$i" else s"(1e0 - u$i)")
      .mkString(" * ")
    def wCols = (0 until P).map(p =>
      s"(lam * (${mp(p)})) / ((lam * (${mp(p)})) + ((1e0 - lam) * (${up(p)}))) AS w$p")
      .mkString(",\n    ")
    def clamp(x: String) = s"least(greatest($x, 1e-6), 1e0 - 1e-6)"
    val sExpr = (0 until P).map(p => s"n$p * w$p").mkString(" + ")
    val nExpr = (0 until P).map(p => s"n$p").mkString(" + ")
    def mNum(i: Int) = (0 until P).filter(p => ((p >> i) & 1) == 1)
      .map(p => s"n$p * w$p").mkString(" + ")
    def uNum(i: Int) = (0 until P).filter(p => ((p >> i) & 1) == 1)
      .map(p => s"n$p * (1e0 - w$p)").mkString(" + ")
    val carry = (0 until P).map(p => s"n$p").mkString(", ")
    val roundsSql = (1 to rounds).map { r =>
      val prev = if (r == 1) "em0" else s"em${r - 1}"
      val mU = (0 until k).map { i =>
        s"    ${clamp(s"(${mNum(i)}) / S")} AS m$i,\n" +
          s"    ${clamp(s"(${uNum(i)}) / (N - S)")} AS u$i"
      }.mkString(",\n")
      s"""w$r AS MATERIALIZED (SELECT *,
         |    $wCols
         |  FROM $prev),
         |s$r AS MATERIALIZED (SELECT *, ($sExpr) AS S, ($nExpr) AS N FROM w$r),
         |em$r AS MATERIALIZED (SELECT
         |    ${clamp("S / N")} AS lam,
         |$mU,
         |    $carry
         |  FROM s$r)""".stripMargin
    }.mkString(",\n")
    val nCols = (0 until P).map(p =>
      s"CAST(coalesce(sum(CASE WHEN pid = $p THEN 1 END), 0) AS DOUBLE) AS n$p")
      .mkString(",\n    ")
    val initMU = (0 until k)
      .map(i => s"9e-1 AS m$i, 1e-1 AS u$i").mkString(", ")
    val wsRows = (0 until P).map(p =>
      s"SELECT $p AS pid, CAST(floor(w$p * 1e6) AS BIGINT) AS post_ppm FROM wf")
      .mkString("\n  UNION ALL ")
    s"""WITH a AS (SELECT c_custkey AS id_a, c_name AS name_a,
       |            c_acctbal AS bal_a, right(c_name, 3) AS sfx_a,
       |            c_nationkey AS nat, c_mktsegment AS seg FROM customer),
       |b AS (SELECT c_custkey + 1000000 AS id_b,
       |             regexp_replace(c_name, '0+', '0', 'g') AS name_b,
       |             CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 1e0
       |                  ELSE c_acctbal END AS bal_b,
       |             right(regexp_replace(c_name, '0+', '0', 'g'), 3) AS sfx_b,
       |             c_nationkey AS nat, c_mktsegment AS seg
       |      FROM customer WHERE c_custkey % 7 != 3),
       |cand AS MATERIALIZED (SELECT b.id_b, a.id_a,
       |    (CASE WHEN CAST(floor(jaro_winkler_similarity(a.name_a, b.name_b)
       |                          * 1e6) AS BIGINT) >= 900000
       |          THEN 1 ELSE 0 END
       |     + CASE WHEN a.bal_a = b.bal_b THEN 2 ELSE 0 END
       |     + CASE WHEN a.sfx_a = b.sfx_b THEN 4 ELSE 0 END) AS pid
       |  FROM a JOIN b ON a.nat = b.nat AND a.seg = b.seg),
       |nc AS MATERIALIZED (SELECT
       |    $nCols
       |  FROM cand),
       |em0 AS (SELECT 1e-1 AS lam, $initMU, ${(0 until P).map(p => s"n$p").mkString(", ")} FROM nc),
       |$roundsSql,
       |wf AS MATERIALIZED (SELECT *,
       |    $wCols
       |  FROM em$rounds),
       |ws AS ($wsRows)""".stripMargin
  }

  private val erFsSql: String =
    s"""$erFsPrelude,
       |kept AS (SELECT c.id_b, c.id_a, c.pid, ws.post_ppm
       |         FROM cand c JOIN ws USING (pid)
       |         WHERE ws.post_ppm >= 500000),
       |scored AS (SELECT id_b, id_a, pid, post_ppm,
       |                  count(*) OVER (PARTITION BY id_b) AS n_candidates,
       |                  row_number() OVER (PARTITION BY id_b
       |                    ORDER BY post_ppm DESC, id_a) AS rn
       |           FROM kept)
       |SELECT id_b, id_a, CAST(pid AS INTEGER) AS pid, post_ppm,
       |       CAST(n_candidates AS BIGINT) AS n_candidates
       |FROM scored WHERE rn = 1 ORDER BY id_b""".stripMargin

  /** er_resolve_fs_bands twin (r20): the FS'69 three-way decision +
    * per-attribute log2 match weights over the same replayed EM.
    * Weights recompute from wf's bit-identical m/u doubles with
    * DuckDB's ln(); round(·, 6) absorbs the ≤1-ulp libm divergence
    * vs the JVM's Math.log literals on the Spark side. No posterior
    * floor — every B record's best candidate is banded.
    */
  private val erFsBandsSql: String = {
    val attrNames = Seq("name", "acctbal", "suffix3")
    val wtCols = attrNames.zipWithIndex.map { case (nm, i) =>
      s"round(ln(m$i / u$i) / ln(2e0), 6) AS wa_$nm,\n" +
        s"    round(ln((1e0 - m$i) / (1e0 - u$i)) / ln(2e0), 6) AS wd_$nm"
    }.mkString(",\n    ")
    val attrOut = attrNames.zipWithIndex.map { case (nm, i) =>
      s"CAST(((pid >> $i) & 1) AS INTEGER) AS agree_$nm,\n" +
        s"       CASE WHEN ((pid >> $i) & 1) = 1 THEN (SELECT wa_$nm FROM wt)\n" +
        s"            ELSE (SELECT wd_$nm FROM wt) END AS wt_$nm"
    }.mkString(",\n       ")
    s"""$erFsPrelude,
       |wt AS (SELECT
       |    $wtCols
       |  FROM wf),
       |scored AS (SELECT c.id_b, c.id_a, c.pid, ws.post_ppm,
       |                  count(*) OVER (PARTITION BY c.id_b) AS n_candidates,
       |                  row_number() OVER (PARTITION BY c.id_b
       |                    ORDER BY ws.post_ppm DESC, c.id_a) AS rn
       |           FROM cand c JOIN ws USING (pid))
       |SELECT id_b, id_a, CAST(pid AS INTEGER) AS pid, post_ppm,
       |       CASE WHEN post_ppm >= 999995 THEN 'match'
       |            WHEN post_ppm >= 500000 THEN 'possible'
       |            ELSE 'non_match' END AS band,
       |       CAST(n_candidates AS BIGINT) AS n_candidates,
       |       $attrOut
       |FROM scored WHERE rn = 1 ORDER BY id_b""".stripMargin
  }

  private val bpeTokensSql: String = {
    // nested replace chain applying the learned merges in step order.
    // An EXHAUSTED stage (corpus yields fewer than bpeMerges merges)
    // has an empty b$k: the scalar subquery is NULL, and a bare
    // replace(acc, NULL, ...) would NULL the whole chain while Spark
    // just applies the shorter learned list — coalesce to an
    // unmatchable control-char sentinel so exhausted stages are
    // identity in both engines (same guard as the w$k training chain).
    val applied = (1 to bpeMerges).foldLeft(
      "' ' || array_to_string(string_split(w, ''), ' ') || ' '") { (acc, k) =>
      s"replace($acc, ' ' || coalesce((SELECT pair FROM b$k), chr(1) || chr(2)) || ' ', " +
        s"' ' || replace(coalesce((SELECT pair FROM b$k), chr(1) || chr(2)), ' ', '') || ' ')"
    }
    s"""WITH $bpeStageCtes,
       |td AS (SELECT doc_id, ${toks("text")} AS tl FROM documents),
       |sw AS (SELECT doc_id, CAST(sum(len(string_split(trim($applied), ' '))) AS BIGINT) AS n_subwords
       |       FROM (SELECT doc_id, unnest(tl) AS w FROM td) GROUP BY doc_id)
       |SELECT td.doc_id, CAST(len(tl) AS BIGINT) AS n_tokens,
       |       coalesce(sw.n_subwords, 0) AS n_subwords
       |FROM td LEFT JOIN sw USING (doc_id) ORDER BY td.doc_id""".stripMargin
  }

  /** match_schema_distribution twin: full replay of the quantile-
    * vector Wasserstein-1 matcher (SchemaMatcher.distributionAll) —
    * shared rank domain per pair, the SAME 257 dyadic fraction
    * literals (SchemaMatcher.DistributionFractions — exact doubles in
    * both engines), quantile_cont (ANSI interpolation, matches Spark's
    * exact percentile — the corpus_quantiles precedent), each |diff|
    * rounded to 6 dp and DECIMAL-summed so the sum is order-free, then
    * the argmax-per-source window. Mixed-type pairs are literal 0.0
    * rows by the matcher's contract.
    */
  private def distPairCtes(k: Int, srcTab: String, sCol: String,
                           tgtTab: String, tCol: String,
                           numeric: Boolean): String = {
    val fracs = graft.harmonize.SchemaMatcher.DistributionFractions
      .mkString("[", ", ", "]")
    val nf = graft.harmonize.SchemaMatcher.DistributionFractions.size
    def v(col: String) =
      if (numeric) s"CAST($col AS DOUBLE)"
      else s"trim(CAST($col AS VARCHAR))"
    def filt(col: String) =
      if (numeric) s"$col IS NOT NULL"
      else s"$col IS NOT NULL AND trim(CAST($col AS VARCHAR)) <> ''"
    s"""dom$k AS (SELECT value, CAST(row_number() OVER (ORDER BY value ASC) AS BIGINT) AS rnk FROM (
       |  SELECT DISTINCT ${v(sCol)} AS value FROM $srcTab WHERE ${filt(sCol)}
       |  UNION SELECT DISTINCT ${v(tCol)} FROM $tgtTab WHERE ${filt(tCol)})),
       |sq$k AS (SELECT quantile_cont(rnk, $fracs) AS q
       |         FROM $srcTab JOIN dom$k ON ${v(sCol)} = dom$k.value),
       |tq$k AS (SELECT quantile_cont(rnk, $fracs) AS q
       |         FROM $tgtTab JOIN dom$k ON ${v(tCol)} = dom$k.value),
       |n$k AS (SELECT max(rnk) AS nmax FROM dom$k),
       |d$k AS (SELECT sum(CAST(round(abs(sq$k.q[g.i] - tq$k.q[g.i]), 6) AS DECIMAL(28,6))) AS s
       |        FROM (SELECT unnest(generate_series(1, $nf)) AS i) g, sq$k, tq$k),
       |p$k AS (SELECT '$sCol' AS source, '$tCol' AS target,
       |  CASE WHEN sq$k.q IS NULL OR tq$k.q IS NULL THEN 0.0
       |       WHEN n$k.nmax <= 1 THEN 1.0
       |       ELSE round(1.0 - CAST(d$k.s AS DOUBLE)
       |                  / (CAST($nf AS DOUBLE) * CAST(n$k.nmax - 1 AS DOUBLE)), 6)
       |  END AS similarity
       |  FROM n$k, d$k, sq$k, tq$k)""".stripMargin
  }

  private val distributionSql: String = {
    val pairs = Seq(
      ("customer", "c_acctbal",    "supplier", "s_acctbal",   true),
      ("customer", "c_acctbal",    "supplier", "s_nationkey", true),
      ("customer", "c_nationkey",  "supplier", "s_acctbal",   true),
      ("customer", "c_nationkey",  "supplier", "s_nationkey", true),
      ("customer", "c_mktsegment", "supplier", "s_name",      false))
    val mixed = Seq(
      ("c_acctbal", "s_name"), ("c_nationkey", "s_name"),
      ("c_mktsegment", "s_acctbal"), ("c_mktsegment", "s_nationkey"))
    val ctes = pairs.zipWithIndex
      .map { case ((st, sc, tt, tc, num), i) => distPairCtes(i + 1, st, sc, tt, tc, num) }
      .mkString(",\n")
    val sims = (pairs.indices.map(i => s"SELECT * FROM p${i + 1}") ++
      mixed.map { case (s, t) => s"SELECT '$s' AS source, '$t' AS target, 0.0 AS similarity" })
      .mkString("\nUNION ALL ")
    s"""WITH $ctes,
       |sims AS ($sims),
       |best AS (SELECT source, target, similarity,
       |                row_number() OVER (PARTITION BY source ORDER BY similarity DESC, target ASC) AS rn
       |         FROM sims)
       |SELECT source, target, similarity FROM best WHERE rn = 1 ORDER BY source""".stripMargin
  }

  /** Synthetic text_entropy probe row (doc_id = -1), unioned onto the
    * corpus by BOTH the wired query and its twin: a combining sequence
    * (e + U+0301) and a supplementary-plane character (U+1D11E, beyond
    * the BMP) pin the cross-engine segmentation assumption — DuckDB's
    * string_split(text, '') must yield per-CODE-POINT pieces exactly
    * like the Spark kernel's surrogate-aware code-point counting, and
    * binary ORDER BY must equal code-point order, or the hash match
    * breaks HERE rather than latently on a future corpus refresh.
    * One shared constant so the two literals can never drift.
    */
  val entropyProbeText: String = // explicit escapes: e + COMBINING
    // ACUTE (two code points, NOT precomposed U+00E9) and MUSICAL
    // SYMBOL G CLEF U+1D11E (a surrogate pair in the JVM)
    "entropy probe: e\u0301 combining, \uD834\uDD1E supplementary"

  /** The wired dedup_simhash pigeonhole band masks (maxHamming = 3 →
    * 4 bands partitioning all 64 bits), generated by the SAME formula
    * as Dedup.simhashPairs so the SQL twin and the Spark operator can
    * never drift apart silently.
    */
  private val simhashBands = 4 // = wired maxHamming (3) + 1
  private val simhashMaskCase: String = {
    val masks = (0 until simhashBands).map { b =>
      val lo = (b * 64) / simhashBands
      val width = ((b + 1) * 64) / simhashBands - lo
      if (width >= 64) -1L else ((1L << width) - 1) << lo
    }
    masks.zipWithIndex
      .map { case (m, b) => s"WHEN $b THEN $m" }
      .mkString("CASE band ", " ", " END")
  }
  // band index list generated from the SAME constant as the masks, so
  // a maxHamming change can never update one but not the other
  private val simhashBandList =
    (0 until simhashBands).mkString("[", ", ", "]")

  /** Self-referential arithmetic twin for an approximate top-k query:
    * reads the RETURNED (query_id, neighbor_id) pairs from the query's
    * own dumped parquet and independently recomputes, from the raw
    * embeddings table, (a) the exact cosine similarity of each returned
    * pair and (b) the (sim desc, id asc) rank order over the returned
    * set — a precision + ordering gate complementing the recall-floor
    * gates (ann_lsh_recall / ann_ivf_recall). Recall itself is NOT
    * gated here (the returned set defines the universe); that is the
    * recall queries' job.
    */
  private def annArithmeticTwin(name: String, corpusCond: String = ""): String =
    s"""WITH got AS (SELECT query_id, neighbor_id
       |            FROM read_parquet('__VERIFY_OUT__/$name/*.parquet')),
       |j AS (SELECT g.query_id, g.neighbor_id,
       |        list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
       |                               CAST(c.embedding AS DOUBLE[])) AS sim
       |      FROM got g JOIN embeddings q ON q.vec_id = g.query_id
       |                 JOIN embeddings c ON c.vec_id = g.neighbor_id$corpusCond)
       |SELECT query_id, neighbor_id,
       |       CAST(row_number() OVER (PARTITION BY query_id
       |              ORDER BY sim DESC, neighbor_id ASC) AS BIGINT) AS "rank",
       |       round(sim, 6) AS similarity
       |FROM j ORDER BY query_id, "rank"""".stripMargin

  /** Exact normalized-levenshtein argmax assignment over the
    * customer/supplier column names — the independent twin shared by
    * every structural matcher's assignment gate (simflood, cupid): on
    * this name-aligned schema pair each matcher must recover the
    * name-evident alignment.
    */
  private val nameArgmaxAssignment =
    """WITH snames AS (SELECT unnest(['c_custkey', 'c_name', 'c_nationkey', 'c_acctbal', 'c_mktsegment']) AS source),
      |tnames AS (SELECT unnest(['s_suppkey', 's_name', 's_nationkey', 's_acctbal']) AS target),
      |scored AS (SELECT source, target,
      |                  1.0 - CAST(levenshtein(source, target) AS DOUBLE)
      |                        / CAST(greatest(length(source), length(target)) AS DOUBLE) AS similarity
      |           FROM snames CROSS JOIN tnames),
      |best AS (SELECT source, target, similarity,
      |                row_number() OVER (PARTITION BY source ORDER BY similarity DESC, target ASC) AS rn
      |         FROM scored)
      |SELECT source, target FROM best WHERE rn = 1 ORDER BY source""".stripMargin

  /** Min-label transitive closure over the wired jaccard >= 0.5 pair
    * graph — shared by dedup_components (auto path selection) and
    * dedup_components_dist (forced distributed label propagation):
    * both arms must produce THIS closure.
    */
  private def componentsClosureSql: String =
    s"""WITH RECURSIVE tk AS (SELECT doc_id, ${toks("text")} AS tl FROM documents),
       |sh AS (SELECT DISTINCT doc_id,
       |         unnest([tl[i] || ' ' || tl[i+1] || ' ' || tl[i+2]
       |                 for i in generate_series(1, greatest(len(tl) - 2, 0))]) AS sh
       |       FROM tk),
       |n AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
       |i AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS ni
       |      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
       |pairs AS (
       |  SELECT id1, id2 FROM (
       |    SELECT id1, id2, CAST(ni AS DOUBLE) / CAST(n1.sz + n2.sz - ni AS DOUBLE) AS jaccard
       |    FROM i JOIN n n1 ON id1 = n1.doc_id JOIN n n2 ON id2 = n2.doc_id)
       |  WHERE jaccard >= 0.5),
       |e AS (SELECT id1 AS a, id2 AS b FROM pairs UNION SELECT id2, id1 FROM pairs),
       |closure AS (
       |  SELECT a, b FROM e
       |  UNION
       |  SELECT closure.a, e.b FROM closure JOIN e ON closure.b = e.a)
       |SELECT a AS id, least(a, min(b)) AS component
       |FROM closure GROUP BY a ORDER BY id""".stripMargin

  val all: Map[String, String] = Map(

    "preview_domain" ->
      """SELECT lang AS value_name, count(*) AS n FROM documents
        |GROUP BY lang ORDER BY value_name""".stripMargin,

    // the exact similarity-join definition replayed quadratically
    // (length-band pruned — result-identical); Spark's answer comes
    // from the prefix-filtered candidate set, so parity proves the
    // filter loses nothing
    "match_values_edit_join" ->
      """WITH v AS (SELECT DISTINCT s_name AS s FROM supplier
        |           WHERE s_name IS NOT NULL)
        |SELECT a.s AS source, b.s AS target,
        |       CAST(levenshtein(a.s, b.s) AS INTEGER) AS lev
        |FROM v a JOIN v b
        |  ON a.s < b.s AND abs(length(a.s) - length(b.s)) <= 2
        |WHERE levenshtein(a.s, b.s) <= 2
        |ORDER BY source, target""".stripMargin,

    "match_values_edit" -> (editScored +
      """SELECT s.source, b.target, b.similarity
        |FROM src s LEFT JOIN (SELECT source, target, similarity FROM best WHERE rn = 1) b
        |  USING (source)
        |ORDER BY s.source""".stripMargin),

    "match_values_coverage" -> (editScored +
      """SELECT 'p_name' AS source_column, 'p_name' AS target_column,
        |       round(CAST((SELECT count(DISTINCT source) FROM best WHERE rn = 1) AS DOUBLE)
        |             / CAST((SELECT count(*) FROM src) AS DOUBLE), 6) AS coverage
        |""".stripMargin),

    // the registry-dispatched standard-vocabulary match: the wired
    // query registers a GDC-shaped (attribute, value) vocabulary whose
    // "part_name" domain is EXACTLY editScored's tgt CTE (distinct
    // p_name at p_size <= 25), so the independent recomputation is the
    // same edit-distance argmax the direct matcher's gate uses — what
    // this row adds is the Standards registry + domain-extraction path
    "match_values_standard" -> (editScored +
      """SELECT s.source, b.target, b.similarity
        |FROM src s LEFT JOIN (SELECT source, target, similarity FROM best WHERE rn = 1) b
        |  USING (source)
        |ORDER BY s.source""".stripMargin),

    "match_values_topk" -> (editScored +
      """SELECT source, target, similarity, CAST(rn AS BIGINT) AS "rank"
        |FROM best WHERE rn <= 3 ORDER BY source, "rank"""".stripMargin),

    "match_values_tfidf" ->
      """WITH src AS (SELECT DISTINCT trim(CAST(p_name AS VARCHAR)) AS source FROM part
        |             WHERE p_name IS NOT NULL AND trim(CAST(p_name AS VARCHAR)) <> ''),
        |tgt AS (SELECT DISTINCT trim(CAST(p_name AS VARCHAR)) AS target FROM part
        |        WHERE p_size > 25 AND p_name IS NOT NULL AND trim(CAST(p_name AS VARCHAR)) <> ''),
        |sg AS (SELECT source, gram, CAST(count(*) AS DOUBLE) AS tf FROM (
        |         SELECT source, unnest([substr(lower(source), i, 3)
        |                                for i in generate_series(1, greatest(length(source) - 2, 0))]) AS gram
        |         FROM src) GROUP BY source, gram),
        |tg AS (SELECT target, gram, CAST(count(*) AS DOUBLE) AS tf FROM (
        |         SELECT target, unnest([substr(lower(target), i, 3)
        |                                for i in generate_series(1, greatest(length(target) - 2, 0))]) AS gram
        |         FROM tgt) GROUP BY target, gram),
        |nc AS (SELECT CAST((SELECT count(*) FROM src) + (SELECT count(*) FROM tgt) AS DOUBLE) AS n_corpus),
        |dfg AS (SELECT gram, CAST(count(*) AS DOUBLE) AS df FROM (
        |          SELECT gram, source AS v FROM sg UNION ALL SELECT gram, target AS v FROM tg)
        |        GROUP BY gram),
        |idf AS (SELECT gram, ln((1.0 + n_corpus) / (1.0 + df)) + 1.0 AS idf FROM dfg, nc),
        |sw0 AS (SELECT source, gram, tf * idf AS w FROM sg JOIN idf USING (gram)),
        |snorm AS (SELECT source, sqrt(sum(w * w)) AS norm FROM sw0 GROUP BY source),
        |sw AS (SELECT source, gram, w / norm AS w FROM sw0 JOIN snorm USING (source)),
        |tw0 AS (SELECT target, gram, tf * idf AS w FROM tg JOIN idf USING (gram)),
        |tnorm AS (SELECT target, sqrt(sum(w * w)) AS norm FROM tw0 GROUP BY target),
        |tw AS (SELECT target, gram, w / norm AS w FROM tw0 JOIN tnorm USING (target)),
        |sims AS (SELECT source, target, round(sum(sw.w * tw.w), 6) AS similarity
        |         FROM sw JOIN tw USING (gram) GROUP BY source, target
        |         HAVING round(sum(sw.w * tw.w), 6) >= 0.3),
        |best AS (SELECT source, target, similarity,
        |                row_number() OVER (PARTITION BY source ORDER BY similarity DESC, target ASC) AS rn
        |         FROM sims)
        |SELECT s.source, b.target, b.similarity
        |FROM src s LEFT JOIN (SELECT source, target, similarity FROM best WHERE rn = 1) b
        |  USING (source)
        |ORDER BY s.source""".stripMargin,

    "match_schema_distribution" -> distributionSql,

    "curate_bpe" -> bpeTrainSql,
    "curate_bpe_deep_gate" -> bpeDeepGateSql,

    "curate_bpe_tokens" -> bpeTokensSql,

    "match_schema_overlap" ->
      """WITH sv AS (
        |  SELECT DISTINCT 'l_returnflag' AS source, trim(CAST(l_returnflag AS VARCHAR)) AS value
        |  FROM lineitem WHERE l_returnflag IS NOT NULL AND trim(CAST(l_returnflag AS VARCHAR)) <> ''
        |  UNION
        |  SELECT DISTINCT 'l_linestatus', trim(CAST(l_linestatus AS VARCHAR))
        |  FROM lineitem WHERE l_linestatus IS NOT NULL AND trim(CAST(l_linestatus AS VARCHAR)) <> ''),
        |tv AS (
        |  SELECT DISTINCT 'o_orderstatus' AS target, trim(CAST(o_orderstatus AS VARCHAR)) AS value
        |  FROM orders WHERE o_orderstatus IS NOT NULL AND trim(CAST(o_orderstatus AS VARCHAR)) <> ''
        |  UNION
        |  SELECT DISTINCT 'o_orderpriority', trim(CAST(o_orderpriority AS VARCHAR))
        |  FROM orders WHERE o_orderpriority IS NOT NULL AND trim(CAST(o_orderpriority AS VARCHAR)) <> ''),
        |ns AS (SELECT source, count(*) AS ns FROM sv GROUP BY source),
        |nt AS (SELECT target, count(*) AS nt FROM tv GROUP BY target),
        |inter AS (SELECT source, target, count(*) AS ni FROM sv JOIN tv USING (value) GROUP BY source, target),
        |sims AS (
        |  SELECT ns.source, nt.target,
        |         CAST(coalesce(ni, 0) AS DOUBLE) / CAST(ns.ns + nt.nt - coalesce(ni, 0) AS DOUBLE) AS similarity
        |  FROM ns CROSS JOIN nt LEFT JOIN inter ON inter.source = ns.source AND inter.target = nt.target),
        |best AS (SELECT source, target, similarity,
        |                row_number() OVER (PARTITION BY source ORDER BY similarity DESC, target ASC) AS rn
        |         FROM sims)
        |SELECT source, target, similarity FROM best WHERE rn = 1 ORDER BY source""".stripMargin,

    "match_schema_topk" ->
      """WITH sv AS (
        |  SELECT DISTINCT 'l_returnflag' AS source, trim(CAST(l_returnflag AS VARCHAR)) AS value
        |  FROM lineitem WHERE l_returnflag IS NOT NULL AND trim(CAST(l_returnflag AS VARCHAR)) <> ''
        |  UNION
        |  SELECT DISTINCT 'l_linestatus', trim(CAST(l_linestatus AS VARCHAR))
        |  FROM lineitem WHERE l_linestatus IS NOT NULL AND trim(CAST(l_linestatus AS VARCHAR)) <> ''),
        |tv AS (
        |  SELECT DISTINCT 'o_orderstatus' AS target, trim(CAST(o_orderstatus AS VARCHAR)) AS value
        |  FROM orders WHERE o_orderstatus IS NOT NULL AND trim(CAST(o_orderstatus AS VARCHAR)) <> ''
        |  UNION
        |  SELECT DISTINCT 'o_orderpriority', trim(CAST(o_orderpriority AS VARCHAR))
        |  FROM orders WHERE o_orderpriority IS NOT NULL AND trim(CAST(o_orderpriority AS VARCHAR)) <> ''),
        |ns AS (SELECT source, count(*) AS ns FROM sv GROUP BY source),
        |nt AS (SELECT target, count(*) AS nt FROM tv GROUP BY target),
        |inter AS (SELECT source, target, count(*) AS ni FROM sv JOIN tv USING (value) GROUP BY source, target),
        |sims AS (
        |  SELECT ns.source, nt.target,
        |         CAST(coalesce(ni, 0) AS DOUBLE) / CAST(ns.ns + nt.nt - coalesce(ni, 0) AS DOUBLE) AS similarity
        |  FROM ns CROSS JOIN nt LEFT JOIN inter ON inter.source = ns.source AND inter.target = nt.target),
        |ranked AS (SELECT source, target, similarity,
        |                  row_number() OVER (PARTITION BY source ORDER BY similarity DESC, target ASC) AS rn
        |           FROM sims)
        |SELECT source, target, similarity, CAST(rn AS BIGINT) AS "rank"
        |FROM ranked WHERE rn <= 2 ORDER BY source, "rank"""".stripMargin,

    // structural matchers (Similarity Flooding fixpoint, Cupid
    // linguistic+structural) produce kernel-specific SCORES, but on
    // this name-aligned schema pair their induced ASSIGNMENT must
    // recover the name-evident alignment — computed independently as
    // the exact normalized-levenshtein argmax (shared CTE; same
    // construction as match_schema_name, assignment projection only)
    "match_schema_simflood" -> nameArgmaxAssignment,

    "match_schema_cupid" -> nameArgmaxAssignment,

    // COMA composite (name + instance + type evidence) joins the
    // structural matchers' assignment gate: on the name-aligned pair
    // the composite's argmax must equal the independent levenshtein
    // argmax (composite scores are weighting-specific, spec-checked)
    "match_schema_coma" -> nameArgmaxAssignment,

    // named-standard schema matching: jaccard of each source column's
    // value domain against each standard attribute's domain, argmax
    // per source with (similarity desc, target asc) tie-break — the
    // l_returnflag row is a genuine zero-overlap TIE broken
    // alphabetically, so the tie-break rule itself is gated
    "match_schema_standard" ->
      """WITH sv AS (
        |  SELECT DISTINCT 'l_returnflag' AS source, trim(CAST(l_returnflag AS VARCHAR)) AS value
        |  FROM lineitem WHERE l_returnflag IS NOT NULL AND trim(CAST(l_returnflag AS VARCHAR)) <> ''
        |  UNION
        |  SELECT DISTINCT 'l_linestatus', trim(CAST(l_linestatus AS VARCHAR))
        |  FROM lineitem WHERE l_linestatus IS NOT NULL AND trim(CAST(l_linestatus AS VARCHAR)) <> ''),
        |tv AS (
        |  SELECT DISTINCT 'order_status' AS target, trim(CAST(o_orderstatus AS VARCHAR)) AS value
        |  FROM orders WHERE o_orderstatus IS NOT NULL AND trim(CAST(o_orderstatus AS VARCHAR)) <> ''
        |  UNION
        |  SELECT DISTINCT 'order_priority', trim(CAST(o_orderpriority AS VARCHAR))
        |  FROM orders WHERE o_orderpriority IS NOT NULL AND trim(CAST(o_orderpriority AS VARCHAR)) <> ''),
        |ns AS (SELECT source, count(*) AS ns FROM sv GROUP BY source),
        |nt AS (SELECT target, count(*) AS nt FROM tv GROUP BY target),
        |inter AS (SELECT source, target, count(*) AS ni FROM sv JOIN tv USING (value) GROUP BY source, target),
        |sims AS (
        |  SELECT ns.source, nt.target,
        |         CAST(coalesce(ni, 0) AS DOUBLE) / CAST(ns.ns + nt.nt - coalesce(ni, 0) AS DOUBLE) AS similarity
        |  FROM ns CROSS JOIN nt LEFT JOIN inter ON inter.source = ns.source AND inter.target = nt.target),
        |best AS (SELECT source, target, similarity,
        |                row_number() OVER (PARTITION BY source ORDER BY similarity DESC, target ASC) AS rn
        |         FROM sims)
        |SELECT source, target, round(similarity, 6) AS similarity
        |FROM best WHERE rn = 1 ORDER BY source""".stripMargin,

    // fromSchemaJson end-to-end: the Spark side loads the vocabulary
    // from a GDC-format schema JSON resource file; the twin re-states
    // that file's fixed literal content as VALUES rows (empty_attr
    // contributes no value rows and is filtered from matching on both
    // sides) and recomputes the same jaccard argmax
    "match_schema_standard_json" ->
      """WITH sv AS (
        |  SELECT DISTINCT 'o_orderstatus' AS source, trim(CAST(o_orderstatus AS VARCHAR)) AS value
        |  FROM orders WHERE o_orderstatus IS NOT NULL AND trim(CAST(o_orderstatus AS VARCHAR)) <> ''
        |  UNION
        |  SELECT DISTINCT 'o_orderpriority', trim(CAST(o_orderpriority AS VARCHAR))
        |  FROM orders WHERE o_orderpriority IS NOT NULL AND trim(CAST(o_orderpriority AS VARCHAR)) <> ''),
        |tv AS (
        |  SELECT * FROM (VALUES
        |    ('order_status', 'F'), ('order_status', 'O'), ('order_status', 'P'),
        |    ('order_priority', '1-URGENT'), ('order_priority', '2-HIGH'),
        |    ('order_priority', '3-MEDIUM'), ('order_priority', '0-CRITICAL'),
        |    ('region_name', 'AFRICA'), ('region_name', 'AMERICA'), ('region_name', 'ASIA'),
        |    ('region_name', 'EUROPE'), ('region_name', 'MIDDLE EAST')) AS v(target, value)),
        |ns AS (SELECT source, count(*) AS ns FROM sv GROUP BY source),
        |nt AS (SELECT target, count(*) AS nt FROM tv GROUP BY target),
        |inter AS (SELECT source, target, count(*) AS ni FROM sv JOIN tv USING (value) GROUP BY source, target),
        |sims AS (
        |  SELECT ns.source, nt.target,
        |         CAST(coalesce(ni, 0) AS DOUBLE) / CAST(ns.ns + nt.nt - coalesce(ni, 0) AS DOUBLE) AS similarity
        |  FROM ns CROSS JOIN nt LEFT JOIN inter ON inter.source = ns.source AND inter.target = nt.target),
        |best AS (SELECT source, target, similarity,
        |                row_number() OVER (PARTITION BY source ORDER BY similarity DESC, target ASC) AS rn
        |         FROM sims)
        |SELECT source, target, round(similarity, 6) AS similarity
        |FROM best WHERE rn = 1 ORDER BY source""".stripMargin,

    // identity-recovery gate for the hashing-trick profile matcher:
    // every source value on this dataset also appears in the target
    // domain (every part name occurs at some size <= 25), and identical
    // strings have identical profiles, so cosine 1.0 identity matches
    // are the REQUIRED output — recomputed here without the kernel.
    // (Data-coupled like the doc_id-arithmetic curation oracles: if a
    // testdata refresh drops a name from the target domain, revisit.)
    "match_values_embedding" ->
      """WITH src AS (SELECT DISTINCT trim(CAST(p_name AS VARCHAR)) AS source FROM part
        |             WHERE p_name IS NOT NULL AND trim(CAST(p_name AS VARCHAR)) <> '')
        |SELECT source, source AS target, 1.0 AS similarity FROM src ORDER BY source""".stripMargin,

    // assignment-only twin of the sketch matcher: the EXACT Jaccard
    // argmax per source column — the MinHash estimate's induced
    // assignment must agree with the exact computation's (scores are
    // estimates and deliberately not compared)
    "match_schema_sketch" ->
      """WITH sv AS (
        |  SELECT DISTINCT 'l_returnflag' AS source, trim(CAST(l_returnflag AS VARCHAR)) AS value
        |  FROM lineitem WHERE l_returnflag IS NOT NULL AND trim(CAST(l_returnflag AS VARCHAR)) <> ''
        |  UNION
        |  SELECT DISTINCT 'l_linestatus', trim(CAST(l_linestatus AS VARCHAR))
        |  FROM lineitem WHERE l_linestatus IS NOT NULL AND trim(CAST(l_linestatus AS VARCHAR)) <> ''),
        |tv AS (
        |  SELECT DISTINCT 'o_orderstatus' AS target, trim(CAST(o_orderstatus AS VARCHAR)) AS value
        |  FROM orders WHERE o_orderstatus IS NOT NULL AND trim(CAST(o_orderstatus AS VARCHAR)) <> ''
        |  UNION
        |  SELECT DISTINCT 'o_orderpriority', trim(CAST(o_orderpriority AS VARCHAR))
        |  FROM orders WHERE o_orderpriority IS NOT NULL AND trim(CAST(o_orderpriority AS VARCHAR)) <> ''),
        |ns AS (SELECT source, count(*) AS ns FROM sv GROUP BY source),
        |nt AS (SELECT target, count(*) AS nt FROM tv GROUP BY target),
        |inter AS (SELECT source, target, count(*) AS ni FROM sv JOIN tv USING (value) GROUP BY source, target),
        |sims AS (
        |  SELECT ns.source, nt.target,
        |         CAST(coalesce(ni, 0) AS DOUBLE) / CAST(ns.ns + nt.nt - coalesce(ni, 0) AS DOUBLE) AS similarity
        |  FROM ns CROSS JOIN nt LEFT JOIN inter ON inter.source = ns.source AND inter.target = nt.target),
        |best AS (SELECT source, target, similarity,
        |                row_number() OVER (PARTITION BY source ORDER BY similarity DESC, target ASC) AS rn
        |         FROM sims)
        |SELECT source, target FROM best WHERE rn = 1 ORDER BY source""".stripMargin,

    "match_schema_name" ->
      """WITH snames AS (SELECT unnest(['c_custkey', 'c_name', 'c_nationkey', 'c_acctbal', 'c_mktsegment']) AS source),
        |tnames AS (SELECT unnest(['s_suppkey', 's_name', 's_nationkey', 's_acctbal']) AS target),
        |scored AS (SELECT source, target,
        |                  1.0 - CAST(levenshtein(source, target) AS DOUBLE)
        |                        / CAST(greatest(length(source), length(target)) AS DOUBLE) AS similarity
        |           FROM snames CROSS JOIN tnames),
        |best AS (SELECT source, target, similarity,
        |                row_number() OVER (PARTITION BY source ORDER BY similarity DESC, target ASC) AS rn
        |         FROM scored)
        |SELECT source, target, similarity FROM best WHERE rn = 1 ORDER BY source""".stripMargin,

    // twoPhaseMatch with topN=2 over exactly 2 target columns keeps
    // every candidate pair, so phase 2 reduces to the value-overlap
    // matcher — the oracle is the same computation.
    "match_schema_twophase" ->
      """WITH sv AS (
        |  SELECT DISTINCT 'l_returnflag' AS source, trim(CAST(l_returnflag AS VARCHAR)) AS value
        |  FROM lineitem WHERE l_returnflag IS NOT NULL AND trim(CAST(l_returnflag AS VARCHAR)) <> ''
        |  UNION
        |  SELECT DISTINCT 'l_linestatus', trim(CAST(l_linestatus AS VARCHAR))
        |  FROM lineitem WHERE l_linestatus IS NOT NULL AND trim(CAST(l_linestatus AS VARCHAR)) <> ''),
        |tv AS (
        |  SELECT DISTINCT 'o_orderstatus' AS target, trim(CAST(o_orderstatus AS VARCHAR)) AS value
        |  FROM orders WHERE o_orderstatus IS NOT NULL AND trim(CAST(o_orderstatus AS VARCHAR)) <> ''
        |  UNION
        |  SELECT DISTINCT 'o_orderpriority', trim(CAST(o_orderpriority AS VARCHAR))
        |  FROM orders WHERE o_orderpriority IS NOT NULL AND trim(CAST(o_orderpriority AS VARCHAR)) <> ''),
        |ns AS (SELECT source, count(*) AS ns FROM sv GROUP BY source),
        |nt AS (SELECT target, count(*) AS nt FROM tv GROUP BY target),
        |inter AS (SELECT source, target, count(*) AS ni FROM sv JOIN tv USING (value) GROUP BY source, target),
        |sims AS (
        |  SELECT ns.source, nt.target,
        |         CAST(coalesce(ni, 0) AS DOUBLE) / CAST(ns.ns + nt.nt - coalesce(ni, 0) AS DOUBLE) AS similarity
        |  FROM ns CROSS JOIN nt LEFT JOIN inter ON inter.source = ns.source AND inter.target = nt.target),
        |best AS (SELECT source, target, similarity,
        |                row_number() OVER (PARTITION BY source ORDER BY similarity DESC, target ASC) AS rn
        |         FROM sims)
        |SELECT source, target, similarity FROM best WHERE rn = 1 ORDER BY source""".stripMargin,

    "match_schema_maxvalsim" ->
      """WITH snames AS (SELECT unnest(['l_returnflag', 'l_linestatus']) AS source),
        |tnames AS (SELECT unnest(['o_orderstatus', 'o_orderpriority']) AS target),
        |cand AS (SELECT source, target,
        |                1.0 - CAST(levenshtein(source, target) AS DOUBLE)
        |                      / CAST(greatest(length(source), length(target)) AS DOUBLE) AS name_score
        |         FROM snames CROSS JOIN tnames),
        |sv AS (
        |  SELECT DISTINCT 'l_returnflag' AS source, trim(CAST(l_returnflag AS VARCHAR)) AS sval
        |  FROM lineitem WHERE l_returnflag IS NOT NULL AND trim(CAST(l_returnflag AS VARCHAR)) <> ''
        |  UNION
        |  SELECT DISTINCT 'l_linestatus', trim(CAST(l_linestatus AS VARCHAR))
        |  FROM lineitem WHERE l_linestatus IS NOT NULL AND trim(CAST(l_linestatus AS VARCHAR)) <> ''),
        |tv AS (
        |  SELECT DISTINCT 'o_orderstatus' AS target, trim(CAST(o_orderstatus AS VARCHAR)) AS tval
        |  FROM orders WHERE o_orderstatus IS NOT NULL AND trim(CAST(o_orderstatus AS VARCHAR)) <> ''
        |  UNION
        |  SELECT DISTINCT 'o_orderpriority', trim(CAST(o_orderpriority AS VARCHAR))
        |  FROM orders WHERE o_orderpriority IS NOT NULL AND trim(CAST(o_orderpriority AS VARCHAR)) <> ''),
        |ntv AS (SELECT target, count(*) AS n_tv FROM tv GROUP BY target),
        |bestval AS (
        |  SELECT c.source, c.target, c.name_score, sv.sval, max(
        |           1.0 - CAST(levenshtein(sv.sval, tv.tval) AS DOUBLE)
        |                 / CAST(greatest(length(sv.sval), length(tv.tval)) AS DOUBLE)) AS best
        |  FROM cand c JOIN sv ON sv.source = c.source JOIN tv ON tv.target = c.target
        |  WHERE 1.0 - CAST(levenshtein(sv.sval, tv.tval) AS DOUBLE)
        |              / CAST(greatest(length(sv.sval), length(tv.tval)) AS DOUBLE) >= 0.5
        |  GROUP BY 1, 2, 3, 4),
        |vscore AS (SELECT source, target, name_score, sum(best) AS sum_best
        |           FROM bestval GROUP BY 1, 2, 3),
        |scored AS (
        |  SELECT c.source, c.target,
        |         round(coalesce((c.name_score + v.sum_best / ntv.n_tv) / 2.0,
        |                        c.name_score / 2.0), 6) AS similarity
        |  FROM cand c
        |       LEFT JOIN vscore v ON v.source = c.source AND v.target = c.target
        |       JOIN ntv ON ntv.target = c.target),
        |best AS (SELECT source, target, similarity,
        |                row_number() OVER (PARTITION BY source ORDER BY similarity DESC, target ASC) AS rn
        |         FROM scored)
        |SELECT source, target, similarity FROM best WHERE rn = 1 ORDER BY source""".stripMargin,

    "materialize_mapping" ->
      """SELECT l_orderkey AS order_id, l_linenumber AS line_number,
        |       CASE CAST(l_returnflag AS VARCHAR) WHEN 'A' THEN 'accepted' WHEN 'N' THEN 'none'
        |            WHEN 'R' THEN 'returned' ELSE NULL END AS return_status,
        |       l_quantity * 1000 AS quantity_grams
        |FROM lineitem ORDER BY order_id, line_number""".stripMargin,

    "merge_mappings" ->
      """SELECT CASE CAST(l_returnflag AS VARCHAR) WHEN 'A' THEN 'accepted' WHEN 'N' THEN 'none'
        |            WHEN 'R' THEN 'returned' ELSE NULL END AS return_status,
        |       l_orderkey AS order_id, l_linenumber AS line_number, l_linestatus AS line_status
        |FROM lineitem ORDER BY order_id, line_number""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       sum(l_quantity) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |                * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |                * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))
        |                * CAST(1 + CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
        |       count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_join" ->
      """SELECT l_orderkey,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |                * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        |       epoch_us(o_orderdate) AS o_orderdate_us
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |     JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q5_multijoin" ->
      """SELECT n_name,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |                * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DOUBLE) AS revenue
        |FROM region JOIN nation ON r_regionkey = n_regionkey
        |     JOIN customer ON n_nationkey = c_nationkey
        |     JOIN orders ON c_custkey = o_custkey
        |     JOIN lineitem ON o_orderkey = l_orderkey
        |     JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q6_filter" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |                * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q7_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       year(l_shipdate) AS l_year,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |                * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |     JOIN supplier ON l_suppkey = s_suppkey
        |     JOIN orders ON l_orderkey = o_orderkey
        |     JOIN customer ON o_custkey = c_custkey
        |     JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |     JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q4_late_orders" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q10_returns" ->
      """SELECT c_custkey, c_name, n_name,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |                * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |     JOIN orders ON l_orderkey = o_orderkey
        |     JOIN customer ON o_custkey = c_custkey
        |     JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin,

    "q12_priority" ->
      """SELECT l_returnflag,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q8_share" ->
      """SELECT year(o_orderdate) AS o_year,
        |       round(CAST(sum(CASE WHEN n1.n_name = 'NATION_3'
        |                           THEN CAST(l_extendedprice AS DECIMAL(12,2))
        |                                * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))
        |                           ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
        |             / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |                        * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DOUBLE),
        |             6) AS mkt_share
        |FROM orders
        |     JOIN lineitem ON o_orderkey = l_orderkey
        |     JOIN supplier ON l_suppkey = s_suppkey
        |     JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND o_custkey IN (SELECT c_custkey
        |                    FROM customer
        |                         JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |                         JOIN region ON n2.n_regionkey = r_regionkey
        |                    WHERE r_name = 'ASIA')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q13_custdist" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM customer LEFT JOIN orders
        |           ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |      GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |         sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |             * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev = (SELECT max(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q16_brand_suppliers" ->
      """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size BETWEEN 10 AND 20
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin,

    "q17_small_qty" ->
      """WITH per_part AS (
        |  SELECT l_partkey AS ap_partkey,
        |         sum(CAST(l_quantity AS DECIMAL(12,2))) AS qty_sum,
        |         CAST(count(*) AS DECIMAL(10,0)) AS qty_n
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS small_qty_revenue,
        |       count(*) AS n_lines
        |FROM lineitem
        |     JOIN part ON l_partkey = p_partkey
        |     JOIN per_part ON l_partkey = ap_partkey
        |WHERE p_brand = 'Brand#7'
        |  AND CAST(l_quantity AS DECIMAL(12,2)) * CAST(5 AS DECIMAL(2,0)) * qty_n < qty_sum""".stripMargin,

    "q19_disjunctive" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |               * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        |       count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 15)
        |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20 AND l_quantity BETWEEN 10 AND 25)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 20 AND 35)""".stripMargin,

    "q2_mincost" ->
      """WITH small AS (SELECT p_partkey FROM part WHERE p_size < 15),
        |o AS (SELECT l_partkey, l_suppkey,
        |             CAST(l_extendedprice AS DECIMAL(12,2)) AS price
        |      FROM lineitem SEMI JOIN small ON l_partkey = p_partkey),
        |m AS (SELECT l_partkey, min(price) AS min_price FROM o GROUP BY 1),
        |w AS (SELECT DISTINCT o.l_partkey, o.l_suppkey, m.min_price
        |      FROM o JOIN m ON o.l_partkey = m.l_partkey AND o.price = m.min_price)
        |SELECT w.l_partkey AS p_partkey, s.s_name, n.n_name,
        |       CAST(w.min_price AS DOUBLE) AS min_price
        |FROM w JOIN supplier s ON w.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |ORDER BY p_partkey, s_name""".stripMargin,

    "q9_profit" ->
      """SELECT n.n_name AS nation,
        |       CAST(year(l_shipdate) AS INTEGER) AS o_year,
        |       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
        |                     * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS DECIMAL(20,4))
        |                - CAST(CAST(CAST(0.6 AS DECIMAL(2,1))
        |                            * CAST(p_retailprice AS DECIMAL(12,2)) AS DECIMAL(14,3))
        |                       * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(20,4))) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%a%'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n ON s_nationkey = n.n_nationkey
        |GROUP BY 1, 2 ORDER BY nation ASC, o_year DESC""".stripMargin,

    "q11_important" ->
      """WITH v AS (
        |  SELECT l_partkey,
        |         sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |             * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS value
        |  FROM lineitem GROUP BY 1),
        |a AS (SELECT CAST(sum(value) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_value FROM v)
        |SELECT l_partkey, CAST(value AS DOUBLE) AS value
        |FROM v CROSS JOIN a
        |WHERE CAST(value AS DOUBLE) > CAST(1.4 AS DOUBLE) * avg_value
        |ORDER BY value DESC, l_partkey ASC""".stripMargin,

    "q21_waiting" ->
      """WITH lo AS (
        |  SELECT l_orderkey AS ok, l_suppkey AS sk,
        |         l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'),
        |late_lines AS (SELECT DISTINCT ok, sk FROM lo WHERE late),
        |all_lines AS (SELECT DISTINCT ok, sk FROM lo)
        |SELECT s_name, count(*) AS numwait
        |FROM late_lines l1
        |     JOIN supplier ON l1.sk = s_suppkey
        |     JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
        |  AND EXISTS (SELECT 1 FROM all_lines l2
        |              WHERE l2.ok = l1.ok AND l2.sk <> l1.sk)
        |  AND NOT EXISTS (SELECT 1 FROM late_lines l3
        |                  WHERE l3.ok = l1.ok AND l3.sk <> l1.sk)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""".stripMargin,

    "q20_excess" ->
      """WITH per_ps AS (
        |  SELECT l_partkey, l_suppkey,
        |         sum(CASE WHEN year(l_shipdate) = 1996
        |                  THEN CAST(l_quantity AS DECIMAL(12,2))
        |                  ELSE CAST(0 AS DECIMAL(12,2)) END) AS qty_1996,
        |         sum(CAST(l_quantity AS DECIMAL(12,2))) AS qty_all
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE '%blue%'
        |  GROUP BY l_partkey, l_suppkey),
        |hot AS (
        |  SELECT l_suppkey, count(*) AS n_excess_parts
        |  FROM per_ps
        |  WHERE qty_1996 * CAST(2 AS DECIMAL(2,0)) > qty_all
        |  GROUP BY l_suppkey)
        |SELECT s_name, n_name, n_excess_parts
        |FROM hot JOIN supplier ON l_suppkey = s_suppkey
        |         JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY s_name, n_name""".stripMargin,

    "q14_promo" ->
      """SELECT round(CAST(100.0 AS DOUBLE)
        |       * CAST(sum(CASE WHEN p_type = 'PROMO'
        |                       THEN CAST(l_extendedprice AS DECIMAL(12,2))
        |                            * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))
        |                       ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
        |       / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |                  * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))) AS DOUBLE),
        |       6) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'""".stripMargin,

    "q22_dormant" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
        |ORDER BY c_custkey""".stripMargin,

    "q18_bigorders" ->
      """WITH big AS (SELECT l_orderkey, sum(l_quantity) AS sum_qty
        |             FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 180)
        |SELECT c_name, c_custkey, o_orderkey, epoch_us(o_orderdate) AS o_orderdate_us,
        |       o_totalprice, sum_qty
        |FROM orders JOIN big ON o_orderkey = l_orderkey
        |     JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,

    "window_topn" ->
      """SELECT segment, o_orderkey, o_totalprice, "rank" FROM (
        |  SELECT c_mktsegment AS segment, o_orderkey, o_totalprice,
        |         CAST(row_number() OVER (PARTITION BY c_mktsegment
        |                                 ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS "rank"
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |WHERE "rank" <= 3 ORDER BY segment, "rank"""".stripMargin,

    "asof_join" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_us(ts) AS c_ts_us, max(event_id) AS last_click_id
        |      FROM events WHERE event_type = 'click' GROUP BY user_id, epoch_us(ts))
        |SELECT p.event_id, p.user_id, p.ts_us, c.last_click_id
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts_us >= c.c_ts_us
        |ORDER BY p.event_id""".stripMargin,

    // nearest = the backward and forward ASOF arms CASE-picked by
    // integer gap, backward on ties — mirrors AsOfJoin.nearest
    "asof_join_nearest" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_us(ts) AS c_ts_us, max(event_id) AS near_click_id
        |      FROM events WHERE event_type = 'click' GROUP BY user_id, epoch_us(ts)),
        |b AS (SELECT p.event_id, c.c_ts_us AS b_ts, c.near_click_id AS b_id
        |      FROM p ASOF LEFT JOIN c
        |        ON p.user_id = c.user_id AND p.ts_us >= c.c_ts_us),
        |f AS (SELECT p.event_id, c.c_ts_us AS f_ts, c.near_click_id AS f_id
        |      FROM p ASOF LEFT JOIN c
        |        ON p.user_id = c.user_id AND p.ts_us <= c.c_ts_us)
        |SELECT p.event_id, p.user_id, p.ts_us,
        |       CASE WHEN f.f_ts IS NULL OR (b.b_ts IS NOT NULL
        |                 AND p.ts_us - b.b_ts <= f.f_ts - p.ts_us)
        |            THEN b.b_id ELSE f.f_id END AS near_click_id,
        |       CASE WHEN f.f_ts IS NULL OR (b.b_ts IS NOT NULL
        |                 AND p.ts_us - b.b_ts <= f.f_ts - p.ts_us)
        |            THEN p.ts_us - b.b_ts ELSE f.f_ts - p.ts_us END AS asof_gap_us
        |FROM p JOIN b USING (event_id) JOIN f USING (event_id)
        |ORDER BY p.event_id""".stripMargin,

    "asof_join_forward" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_us(ts) AS c_ts_us, max(event_id) AS next_click_id
        |      FROM events WHERE event_type = 'click' GROUP BY user_id, epoch_us(ts))
        |SELECT p.event_id, p.user_id, p.ts_us, c.next_click_id
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts_us <= c.c_ts_us
        |ORDER BY p.event_id""".stripMargin,

    "range_join" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_us(ts) AS c_ts FROM events WHERE event_type = 'click'),
        |cnt AS (SELECT p.event_id, count(*) AS n
        |        FROM p JOIN c ON c.user_id = p.user_id
        |             AND c.c_ts >= p.ts_us - 3600000000 AND c.c_ts <= p.ts_us
        |        GROUP BY p.event_id)
        |SELECT p.event_id, p.user_id, p.ts_us, coalesce(cnt.n, 0) AS n_clicks_1h
        |FROM p LEFT JOIN cnt USING (event_id)
        |ORDER BY event_id""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS doc_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY doc_id""".stripMargin,

    "dedup_materialize" ->
      """SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS n_chars
        |FROM documents
        |WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text))
        |ORDER BY doc_id""".stripMargin,

    "dedup_jaccard" -> exactJaccardPairs,

    // the cap-guard diagnostic as a GATE: the two shingle-frequency
    // counters are recomputed independently (same shingle pipeline as
    // the jaccard CTE; hashed-vs-string shingles share doc frequencies
    // modulo vanishing hash collisions, as every jaccard oracle already
    // relies on), and the signature-kernel counters are pinned at the
    // clean-corpus expectation of ZERO — any counter moving at the gate
    // SF fails parity loudly and attributes it to cap pressure.
    // The six pinned counters CANNOT be recomputed here: MinHash and
    // hyperplane signatures are xxhash64-derived and DuckDB has no
    // xxhash64 — the counter-counting logic itself is instead validated
    // under genuine bucket pressure in DedupSpec ("capReport counts
    // what dfCap and bucketCap drop") and SimilaritySpec; this row's
    // added value is the per-round clean-corpus attribution signal
    "dedup_cap_report" ->
      s"""WITH tk AS (SELECT doc_id, ${toks("text")} AS tl FROM documents),
         |sh AS (SELECT DISTINCT doc_id,
         |         unnest([tl[i] || ' ' || tl[i+1] || ' ' || tl[i+2]
         |                 for i in generate_series(1, greatest(len(tl) - 2, 0))]) AS sh
         |       FROM tk),
         |dfq AS (SELECT sh, count(*) AS df FROM sh GROUP BY sh),
         |over AS (SELECT CAST(count(*) AS BIGINT) AS c,
         |                CAST(coalesce(sum(df), 0) AS BIGINT) AS s
         |         FROM dfq WHERE df > ${SparkEntry.JaccardDfCap.get}),
         |-- bucket counters recomputed from the dedup_cap_bands signature
         |-- dump (NOT pinned zeros): the gate validates the counter logic
         |-- against the actual banded tables, so genuine bucket pressure
         |-- from a testdata refresh moves both engines together
         |bk AS (SELECT space, band, key, count(*) AS bn
         |       FROM read_parquet('__VERIFY_OUT__/dedup_cap_bands/*.parquet')
         |       GROUP BY space, band, key),
         |-- per-space caps interpolated from the wired constants so a
         |-- cap change can never silently desynchronize the twin
         |ov AS (SELECT space, CAST(count(*) AS BIGINT) AS c,
         |              CAST(coalesce(sum(bn), 0) AS BIGINT) AS s
         |       FROM bk
         |       WHERE bn > CASE WHEN space = 'minhash'
         |                       THEN ${SparkEntry.MinhashBucketCap.get}
         |                       ELSE ${SparkEntry.EmbeddingBucketCap.get} END
         |       GROUP BY space)
         |SELECT metric, value FROM (
         |  SELECT 'jaccard_shingles_over_dfcap' AS metric, c AS value FROM over
         |  UNION ALL SELECT 'jaccard_postings_dropped', s FROM over
         |  UNION ALL SELECT 'minhash_buckets_over_cap',
         |    coalesce((SELECT c FROM ov WHERE space = 'minhash'), 0)
         |  UNION ALL SELECT 'minhash_band_entries_dropped',
         |    coalesce((SELECT s FROM ov WHERE space = 'minhash'), 0)
         |  UNION ALL SELECT 'embedding_buckets_over_cap',
         |    coalesce((SELECT c FROM ov WHERE space = 'embedding'), 0)
         |  UNION ALL SELECT 'embedding_band_entries_dropped',
         |    coalesce((SELECT s FROM ov WHERE space = 'embedding'), 0)
         |  UNION ALL SELECT 'embedding_hi_buckets_over_cap',
         |    coalesce((SELECT c FROM ov WHERE space = 'embedding_hi'), 0)
         |  UNION ALL SELECT 'embedding_hi_band_entries_dropped',
         |    coalesce((SELECT s FROM ov WHERE space = 'embedding_hi'), 0))
         |ORDER BY metric""".stripMargin,

    // the wired query generates candidates via MinHash(128)+LSH banding
    // and verifies them with the exact Jaccard; the oracle is the EXACT
    // pair join (same as dedup_jaccard), so the parity gate doubles as a
    // per-round full-recall check on the banded scale path — signatures
    // are deterministic (hash-derived permutations, no RNG), so this
    // either holds at the gate's SF or fails loudly
    "dedup_minhash" -> exactJaccardPairs,

    "dedup_cross_source" -> (jaccardPairsCte +
      """SELECT least(d1.source, d2.source) AS source_1,
        |       greatest(d1.source, d2.source) AS source_2,
        |       count(*) AS n_pairs
        |FROM pairs p JOIN documents d1 ON p.id1 = d1.doc_id
        |             JOIN documents d2 ON p.id2 = d2.doc_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    "corpus_stats" ->
      s"""WITH tk AS (SELECT source, lang, length(text) AS nc,
         |                   len(${toks("text")}) AS nt FROM documents)
         |SELECT source, lang, count(*) AS n_docs,
         |       CAST(sum(nc) AS BIGINT) AS sum_chars,
         |       CAST(min(nc) AS BIGINT) AS min_chars,
         |       CAST(max(nc) AS BIGINT) AS max_chars,
         |       CAST(sum(nt) AS BIGINT) AS sum_tokens
         |FROM tk GROUP BY source, lang ORDER BY source, lang""".stripMargin,

    "corpus_quantiles" ->
      s"""WITH tk AS (SELECT lang, len(${toks("text")}) AS nt FROM documents)
         |SELECT lang, round(quantile_cont(nt, 0.5), 6) AS p50,
         |       round(quantile_cont(nt, 0.9), 6) AS p90,
         |       round(quantile_cont(nt, 0.99), 6) AS p99
         |FROM tk GROUP BY lang ORDER BY lang""".stripMargin,

    // HLL-sketch distinct-count gate: literal all-true per profiled
    // column — a sketch drifting past 4x rsd fails the hash match
    "profile_numeric_approx" ->
      """SELECT c AS "column", true AS distinct_ok FROM (VALUES
        |  ('l_discount'), ('l_extendedprice'), ('l_quantity'), ('l_tax')) t(c)
        |ORDER BY c""".stripMargin,

    // sketch-error gate: literal all-true — any quantile falling
    // outside the exact rank window fails the hash match
    "corpus_quantiles_approx" ->
      """SELECT lang, true AS p50_ok, true AS p90_ok, true AS p99_ok
        |FROM (SELECT DISTINCT lang FROM documents) ORDER BY lang""".stripMargin,

    "curate_take" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
        |    ORDER BY CAST((CAST(doc_id AS HUGEINT) * 2654435761) % 1000000 AS DOUBLE) / 1000000.0 ASC,
        |             doc_id ASC) AS rk
        |  FROM documents)
        |WHERE rk <= 20 ORDER BY doc_id""".stripMargin,

    "curate_pack" ->
      s"""WITH tk AS (SELECT doc_id,
         |  CAST(floor(CAST((CAST(doc_id AS HUGEINT) * 2654435761) % 1000000 AS DOUBLE)
         |             / 1000000.0 * 4) AS BIGINT) AS shard,
         |  len(${toks("text")}) AS nt FROM documents),
         |c AS (SELECT doc_id, shard, nt,
         |  coalesce(sum(nt) OVER (PARTITION BY shard ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS strt
         |  FROM tk)
         |SELECT shard, CAST(strt // 2048 AS BIGINT) AS pack_id,
         |       count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS sum_tokens,
         |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // full Gopher repetition-rule replay over the same 2-token-line
    // reshaping the wired query applies; every ratio is rounded to 6
    // before the threshold CASE, and thresholds are CAST to DOUBLE
    // (DuckDB numeric literals default to DECIMAL)
    "dedup_paragraphs" ->
      s"""WITH tk AS (SELECT doc_id, ${toks("text")} AS ts FROM documents),
         |idx AS (SELECT doc_id, ts,
         |               unnest(generate_series(0, CAST(ceil(len(ts) / 3.0) AS BIGINT) - 1)) AS i
         |        FROM tk WHERE len(ts) > 0),
         |chunks AS (SELECT doc_id, i AS chunk_idx,
         |                  array_to_string(ts[(i * 3 + 1):((i + 1) * 3)], ' ') AS chunk
         |           FROM idx),
         |drop_set AS (SELECT chunk FROM chunks
         |             GROUP BY chunk HAVING count(DISTINCT doc_id) >= 3),
         |kept AS (SELECT doc_id, chunk_idx, chunk FROM chunks
         |         WHERE chunk NOT IN (SELECT chunk FROM drop_set)),
         |tot AS (SELECT doc_id, CAST(ceil(len(ts) / 3.0) AS BIGINT) AS n_chunks FROM tk),
         |reb AS (SELECT doc_id, count(*) AS n_kept,
         |               string_agg(chunk, ' ' ORDER BY chunk_idx) AS clean_text
         |        FROM kept GROUP BY doc_id)
         |SELECT t.doc_id, t.n_chunks,
         |       t.n_chunks - coalesce(r.n_kept, 0) AS n_dropped,
         |       coalesce(r.clean_text, '') AS clean_text
         |FROM tot t LEFT JOIN reb r USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    "curate_buckets" ->
      s"""WITH tk AS (SELECT doc_id, ${toks("text")} AS tl FROM documents),
         |ex AS (SELECT doc_id, unnest(tl) AS tok FROM tk),
         |cnt AS (SELECT tok, count(*) AS c FROM ex GROUP BY tok),
         |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n_total, CAST(count(*) AS DOUBLE) AS n_vocab FROM cnt),
         |pr AS (SELECT tok, ln(CAST(c + 1 AS DOUBLE) / (n_total + n_vocab)) AS logp FROM cnt, tot),
         |scored AS (SELECT doc_id,
         |             round(CAST(sum(CAST(round(logp, 9) AS DECIMAL(22,12))) AS DOUBLE)
         |                   / count(*), 6) AS score
         |           FROM ex JOIN pr USING (tok) GROUP BY doc_id)
         |SELECT doc_id, score,
         |       CAST(ntile(3) OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS bucket,
         |       CASE ntile(3) OVER (ORDER BY score DESC, doc_id)
         |            WHEN 1 THEN 'head' WHEN 3 THEN 'tail' ELSE 'middle' END AS bucket_name
         |FROM scored ORDER BY doc_id""".stripMargin,

    // CCNet buckets on the TRAINED KN trigram scorer: the text_kn_lm
    // probability chain verbatim, then the same ntile(3) total order
    // as curate_buckets (score desc, doc_id asc). Docs with < 3
    // tokens carry no trigram and drop out on both engines.
    "curate_buckets_kn" ->
      s"""WITH tk AS (SELECT doc_id, ${toks("text")} AS tl FROM documents),
         |tri AS (SELECT doc_id, tl[i] || ' ' || tl[i+1] || ' ' || tl[i+2] AS tg
         |        FROM (SELECT doc_id, tl, unnest(generate_series(1, len(tl) - 2)) AS i
         |              FROM tk WHERE len(tl) >= 3)),
         |bgt AS (SELECT DISTINCT tl[i] || ' ' || tl[i+1] AS bg
         |        FROM (SELECT tl, unnest(generate_series(1, len(tl) - 1)) AS i
         |              FROM tk WHERE len(tl) >= 2)),
         |parts AS (SELECT tg, count(*) AS c3,
         |                 split_part(tg, ' ', 1) || ' ' || split_part(tg, ' ', 2) AS w12,
         |                 split_part(tg, ' ', 2) AS w2,
         |                 split_part(tg, ' ', 2) || ' ' || split_part(tg, ' ', 3) AS w23,
         |                 split_part(tg, ' ', 3) AS w3
         |          FROM tri GROUP BY tg),
         |hi AS (SELECT w12, sum(c3) AS c2ctx, count(*) AS n1_hi FROM parts GROUP BY w12),
         |mid1 AS (SELECT w23, count(*) AS ncont FROM parts GROUP BY w23),
         |mid2 AS (SELECT split_part(w23, ' ', 1) AS w2, sum(ncont) AS ncm,
         |                count(*) AS n1_mid
         |         FROM mid1 GROUP BY 1),
         |uni AS (SELECT split_part(bg, ' ', 2) AS w3, count(*) AS nbg_pre
         |        FROM bgt GROUP BY 1),
         |tot AS (SELECT count(*) AS nbg_total FROM bgt),
         |pr AS (SELECT tg,
         |         ln(greatest(CAST(c3 AS DOUBLE) - 0.75, 0.0) / CAST(c2ctx AS DOUBLE)
         |            + (0.75 * CAST(n1_hi AS DOUBLE) / CAST(c2ctx AS DOUBLE)) *
         |              (greatest(CAST(ncont AS DOUBLE) - 0.75, 0.0) / CAST(ncm AS DOUBLE)
         |               + (0.75 * CAST(n1_mid AS DOUBLE) / CAST(ncm AS DOUBLE)) *
         |                 (CAST(nbg_pre AS DOUBLE) / CAST(nbg_total AS DOUBLE)))) AS logp
         |       FROM parts JOIN hi USING (w12) JOIN mid1 USING (w23)
         |            JOIN mid2 USING (w2) JOIN uni USING (w3), tot),
         |scored AS (SELECT doc_id,
         |             round(CAST(sum(CAST(round(logp, 9) AS DECIMAL(22,12))) AS DOUBLE)
         |                   / count(*), 6) AS score
         |           FROM tri JOIN pr USING (tg) GROUP BY doc_id)
         |SELECT doc_id, score,
         |       CAST(ntile(3) OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS bucket,
         |       CASE ntile(3) OVER (ORDER BY score DESC, doc_id)
         |            WHEN 1 THEN 'head' WHEN 3 THEN 'tail' ELSE 'middle' END AS bucket_name
         |FROM scored ORDER BY doc_id""".stripMargin,

    "curate_gopher" ->
      s"""WITH tk AS (SELECT doc_id, ${toks("text")} AS tl FROM documents),
         |ln AS (SELECT doc_id, tl,
         |              CASE WHEN len(tl) = 0 THEN ['']
         |                   ELSE [array_to_string(tl[2 * i - 1 : 2 * i], ' ')
         |                         for i in generate_series(1, (len(tl) + 1) // 2)] END AS ls
         |       FROM tk),
         |g2 AS (SELECT doc_id, unnest([tl[i] || ' ' || tl[i + 1]
         |                              for i in generate_series(1, greatest(len(tl) - 1, 0))]) AS g
         |       FROM tk),
         |m2 AS (SELECT doc_id, max(c) AS mx, sum(c) AS tot FROM
         |         (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2) GROUP BY 1),
         |g3 AS (SELECT doc_id, unnest([tl[i] || ' ' || tl[i + 1] || ' ' || tl[i + 2]
         |                              for i in generate_series(1, greatest(len(tl) - 2, 0))]) AS g
         |       FROM tk),
         |m3 AS (SELECT doc_id, max(c) AS mx, sum(c) AS tot FROM
         |         (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2) GROUP BY 1),
         |meas AS (SELECT ln.doc_id,
         |    CAST(len(tl) AS INTEGER) AS n_tokens,
         |    CAST(len(ls) AS INTEGER) AS n_lines,
         |    round(CASE WHEN len(ls) > 0
         |          THEN CAST(len(ls) - len(list_distinct(ls)) AS DOUBLE) / len(ls)
         |          ELSE 0.0 END, 6) AS dup_line_frac,
         |    round(CASE WHEN list_aggregate(list_transform(ls, l -> length(l)), 'sum') > 0
         |          THEN CAST(list_aggregate(list_transform(ls, l -> length(l)), 'sum')
         |               - list_aggregate(list_transform(list_distinct(ls), l -> length(l)), 'sum') AS DOUBLE)
         |               / list_aggregate(list_transform(ls, l -> length(l)), 'sum')
         |          ELSE 0.0 END, 6) AS dup_line_char_frac,
         |    round(coalesce(CAST(m2.mx AS DOUBLE) / m2.tot, 0.0), 6) AS top_2gram_share,
         |    round(coalesce(CAST(m3.mx AS DOUBLE) / m3.tot, 0.0), 6) AS top_3gram_share,
         |    round(CASE WHEN len(tl) > 0
         |          THEN CAST(list_aggregate(list_transform(tl, t -> length(t)), 'sum') AS DOUBLE) / len(tl)
         |          ELSE 0.0 END, 6) AS mean_word_len,
         |    round(CASE WHEN len(tl) > 0
         |          THEN CAST(len(list_filter(tl, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE) / len(tl)
         |          ELSE 0.0 END, 6) AS alpha_ratio
         |  FROM ln LEFT JOIN m2 ON ln.doc_id = m2.doc_id
         |          LEFT JOIN m3 ON ln.doc_id = m3.doc_id),
         |v AS (SELECT *,
         |    CASE WHEN dup_line_frac > CAST(0.05 AS DOUBLE) THEN 'dup_lines'
         |         WHEN dup_line_char_frac > CAST(0.06 AS DOUBLE) THEN 'dup_line_chars'
         |         WHEN top_2gram_share > CAST(0.10 AS DOUBLE) THEN 'top_2gram'
         |         WHEN top_3gram_share > CAST(0.09 AS DOUBLE) THEN 'top_3gram'
         |         WHEN mean_word_len < CAST(3.8 AS DOUBLE)
         |              OR mean_word_len > CAST(10.0 AS DOUBLE) THEN 'word_length'
         |         WHEN alpha_ratio < CAST(0.80 AS DOUBLE) THEN 'non_alpha'
         |         ELSE NULL END AS reason
         |  FROM meas)
         |SELECT doc_id, n_tokens, n_lines, dup_line_frac, dup_line_char_frac,
         |       top_2gram_share, top_3gram_share, mean_word_len, alpha_ratio,
         |       reason, reason IS NULL AS keep
         |FROM v ORDER BY doc_id""".stripMargin,

    // leakage-free split replay: the dedup_canonical closure CTE gives
    // the component map; split cuts are built by the SAME double
    // summation as the Spark side (0.9, then 0.9 + 0.05 — the naive
    // 0.95 literal is a DIFFERENT double than the running sum, and a
    // group key landing exactly on 950000 millionths would flip)
    "curate_split" ->
      s"""WITH RECURSIVE tk AS (SELECT doc_id, ${toks("text")} AS tl FROM documents),
         |sh AS (SELECT DISTINCT doc_id,
         |         unnest([tl[i] || ' ' || tl[i+1] || ' ' || tl[i+2]
         |                 for i in generate_series(1, greatest(len(tl) - 2, 0))]) AS sh
         |       FROM tk),
         |n AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
         |i AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS ni
         |      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |pairs AS (
         |  SELECT id1, id2 FROM (
         |    SELECT id1, id2, CAST(ni AS DOUBLE) / CAST(n1.sz + n2.sz - ni AS DOUBLE) AS jaccard
         |    FROM i JOIN n n1 ON id1 = n1.doc_id JOIN n n2 ON id2 = n2.doc_id)
         |  WHERE jaccard >= 0.5),
         |e AS (SELECT id1 AS a, id2 AS b FROM pairs UNION SELECT id2, id1 FROM pairs),
         |closure AS (
         |  SELECT a, b FROM e
         |  UNION
         |  SELECT closure.a, e.b FROM closure JOIN e ON closure.b = e.a),
         |comp AS (SELECT a AS id, least(a, min(b)) AS component FROM closure GROUP BY a),
         |g AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS group_id
         |      FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
         |k AS (SELECT doc_id, group_id,
         |             CAST((CAST(group_id AS HUGEINT) * 2654435761) % 1000000 AS DOUBLE) / 1000000.0 AS key
         |      FROM g)
         |SELECT doc_id, CAST(group_id AS BIGINT) AS group_id,
         |       CASE WHEN key < CAST(0.9 AS DOUBLE) THEN 'train'
         |            WHEN key < CAST(0.9 AS DOUBLE) + CAST(0.05 AS DOUBLE) THEN 'val'
         |            ELSE 'test' END AS split
         |FROM k ORDER BY doc_id""".stripMargin,

    // RAG chunking replay: same window arithmetic (32-token chunks
    // every 24) over the shared tokenizer; list slices are clipped at
    // the document end in both engines
    "curate_chunks" ->
      s"""WITH tk AS (SELECT doc_id, ${toks("text")} AS tl FROM documents),
         |nn AS (SELECT doc_id, tl, len(tl) AS n FROM tk WHERE len(tl) > 0),
         |cid AS (SELECT doc_id, tl,
         |               unnest(generate_series(0,
         |                 CASE WHEN n <= 32 THEN 0 ELSE (n - 32 + 23) // 24 END)) AS chunk_id
         |        FROM nn),
         |sl AS (SELECT doc_id, chunk_id,
         |              tl[chunk_id * 24 + 1 : chunk_id * 24 + 32] AS s FROM cid)
         |SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
         |       CAST(chunk_id * 24 AS INTEGER) AS start_tok,
         |       CAST(len(s) AS INTEGER) AS n_tokens,
         |       array_to_string(s, ' ') AS chunk_text
         |FROM sl ORDER BY doc_id, chunk_id""".stripMargin,

    // mixture planning: weight literals cast to DOUBLE so the
    // floor(weight * budget) multiplication is the same IEEE double
    // product as Spark's (DuckDB numeric literals default to DECIMAL)
    "curate_mix" ->
      s"""WITH tk AS (SELECT source, len(${toks("text")}) AS nt FROM documents),
         |a AS (SELECT source, CAST(sum(nt) AS BIGINT) AS available_tokens
         |      FROM tk GROUP BY source),
         |w AS (SELECT source, available_tokens,
         |  CAST(floor(CASE source WHEN 'src0' THEN CAST(0.25 AS DOUBLE)
         |                         WHEN 'src1' THEN CAST(0.1 AS DOUBLE)
         |                         ELSE CAST(0.02 AS DOUBLE) END * 4000) AS BIGINT) AS target_tokens
         |  FROM a)
         |SELECT source, available_tokens, target_tokens,
         |       round(least(1.0, CAST(target_tokens AS DOUBLE)
         |                        / CAST(available_tokens AS DOUBLE)), 6) AS rate
         |FROM w ORDER BY source""".stripMargin,

    // temperature-scaled mixture: pow() rounded to 9 decimals then
    // cast to DECIMAL so the normalizing sum is exact and order-free
    // on both engines (the one libm-sensitive op is shielded by the
    // round; every other step is identical-cast double arithmetic)
    "curate_temperature" ->
      s"""WITH tk AS (SELECT lang, len(${toks("text")}) AS nt FROM documents),
         |a AS (SELECT lang, CAST(sum(nt) AS BIGINT) AS available_tokens
         |      FROM tk GROUP BY lang),
         |t AS (SELECT CAST(sum(available_tokens) AS BIGINT) AS tot FROM a),
         |w AS (SELECT lang, available_tokens,
         |             CAST(available_tokens AS DOUBLE) / CAST(tot AS DOUBLE) AS p,
         |             CAST(round(pow(CAST(available_tokens AS DOUBLE) / CAST(tot AS DOUBLE),
         |                            CAST(0.3 AS DOUBLE)), 9) AS DECIMAL(22,12)) AS wd
         |      FROM a CROSS JOIN t),
         |s AS (SELECT lang, available_tokens, p,
         |             CAST(wd AS DOUBLE) / CAST(sum(wd) OVER () AS DOUBLE) AS sh
         |      FROM w),
         |f AS (SELECT lang, available_tokens, p, sh,
         |             CAST(floor(sh * CAST(20000 AS DOUBLE)) AS BIGINT) AS target_tokens
         |      FROM s)
         |SELECT lang, available_tokens,
         |       round(p, 6) AS natural_share,
         |       round(sh, 6) AS temp_share,
         |       target_tokens,
         |       round(least(1.0, CAST(target_tokens AS DOUBLE)
         |                        / CAST(available_tokens AS DOUBLE)), 6) AS rate,
         |       round(CAST(target_tokens AS DOUBLE)
         |             / CAST(available_tokens AS DOUBLE), 6) AS epochs
         |FROM f ORDER BY lang""".stripMargin,

    // plan -> corpus closure: the full temperature-rate chain (same
    // shielded arithmetic as curate_temperature) feeding the
    // deterministic id-hash keep predicate per row
    "curate_apply_mix" ->
      s"""WITH tk AS (SELECT lang, len(${toks("text")}) AS nt FROM documents),
         |a AS (SELECT lang, CAST(sum(nt) AS BIGINT) AS available_tokens
         |      FROM tk GROUP BY lang),
         |t AS (SELECT CAST(sum(available_tokens) AS BIGINT) AS tot FROM a),
         |w AS (SELECT lang, available_tokens,
         |             CAST(round(pow(CAST(available_tokens AS DOUBLE) / CAST(tot AS DOUBLE),
         |                            CAST(0.3 AS DOUBLE)), 9) AS DECIMAL(22,12)) AS wd
         |      FROM a CROSS JOIN t),
         |s AS (SELECT lang, available_tokens,
         |             CAST(wd AS DOUBLE) / CAST(sum(wd) OVER () AS DOUBLE) AS sh
         |      FROM w),
         |r AS (SELECT lang,
         |             round(least(1.0,
         |               CAST(CAST(floor(sh * CAST(20000 AS DOUBLE)) AS BIGINT) AS DOUBLE)
         |               / CAST(available_tokens AS DOUBLE)), 6) AS rate
         |      FROM s)
         |SELECT d.doc_id, d.lang FROM documents d JOIN r ON d.lang = r.lang
         |WHERE CAST((CAST(d.doc_id AS HUGEINT) * 2654435761) % 1000000 AS DOUBLE) / 1000000.0 < r.rate
         |ORDER BY d.doc_id""".stripMargin,

    // the composed curation chain: quality verdict (same thresholds as
    // curate_quality) -> keep-first exact dedup -> shard + pack (same
    // budget/shards as curate_pack) -> per-pack report
    "curate_pipeline" ->
      s"""WITH tk AS (SELECT doc_id, text, ${toks("text")} AS tl FROM documents),
         |ex AS (SELECT doc_id, unnest(tl) AS tok FROM tk),
         |tf AS (SELECT doc_id, tok, count(*) AS c FROM ex GROUP BY doc_id, tok),
         |top AS (SELECT doc_id, max(c) AS m FROM tf GROUP BY doc_id),
         |meas AS (SELECT tk.doc_id, tk.text,
         |    len(tk.tl) AS n_tokens,
         |    CASE WHEN len(tk.tl) > 0 THEN CAST(top.m AS DOUBLE) / CAST(len(tk.tl) AS DOUBLE)
         |         ELSE 0.0 END AS top_share,
         |    CASE WHEN length(tk.text) > 0
         |         THEN CAST(len(regexp_extract_all(tk.text, '[^a-zA-Z0-9 ]')) AS DOUBLE)
         |              / CAST(length(tk.text) AS DOUBLE)
         |         ELSE 0.0 END AS punct_ratio,
         |    len(list_filter(tk.tl, t -> list_contains(${sqlList(TextOps.stopwords.toMap.apply("en"))}, t))) AS n_stop
         |  FROM tk LEFT JOIN top USING (doc_id)),
         |kept AS (SELECT doc_id, text, n_tokens FROM meas
         |  WHERE NOT (n_tokens < 5 OR n_tokens > 100000 OR top_share > 0.3
         |             OR punct_ratio > 0.3 OR n_stop < 1)),
         |dd AS (SELECT doc_id, n_tokens FROM (
         |    SELECT doc_id, n_tokens,
         |           row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rk
         |    FROM kept) WHERE rk = 1),
         |sh AS (SELECT doc_id, n_tokens,
         |    CAST(floor(CAST((CAST(doc_id AS HUGEINT) * 2654435761) % 1000000 AS DOUBLE)
         |               / 1000000.0 * 4) AS BIGINT) AS shard
         |  FROM dd),
         |c AS (SELECT doc_id, shard, n_tokens,
         |    coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS strt
         |  FROM sh)
         |SELECT shard, CAST(strt // 2048 AS BIGINT) AS pack_id,
         |       count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "corpus_vocab" ->
      s"""WITH tok AS (SELECT lang, unnest(${toks("text")}) AS tok FROM documents),
         |c AS (SELECT lang, tok, count(*) AS n FROM tok GROUP BY 1, 2),
         |r AS (SELECT lang, tok, n,
         |        CAST(row_number() OVER (PARTITION BY lang
         |               ORDER BY n DESC, tok ASC) AS BIGINT) AS "rank"
         |      FROM c)
         |SELECT lang, tok, n, "rank" FROM r WHERE "rank" <= 10
         |ORDER BY lang, "rank"""".stripMargin,

    // Zipf slope: same deterministic top-k ranks as corpus_vocab
    // (k = 100), §5 round-9 regression addends decimal-summed, the
    // closed-form OLS replayed in DOUBLE in the same operation order
    "corpus_zipf" ->
      s"""WITH tok AS (SELECT lang, unnest(${toks("text")}) AS tok FROM documents),
         |c AS (SELECT lang, tok, count(*) AS n FROM tok GROUP BY 1, 2),
         |r AS (SELECT lang, n,
         |        row_number() OVER (PARTITION BY lang
         |          ORDER BY n DESC, tok ASC) AS rk
         |      FROM c),
         |ad AS (SELECT lang,
         |         CAST(round(ln(CAST(rk AS DOUBLE)), 9) AS DECIMAL(22,12)) AS x,
         |         CAST(round(ln(CAST(n AS DOUBLE)), 9) AS DECIMAL(22,12)) AS y,
         |         CAST(round(round(ln(CAST(rk AS DOUBLE)), 9)
         |              * round(ln(CAST(n AS DOUBLE)), 9), 9) AS DECIMAL(22,12)) AS xy,
         |         CAST(round(round(ln(CAST(rk AS DOUBLE)), 9)
         |              * round(ln(CAST(rk AS DOUBLE)), 9), 9) AS DECIMAL(22,12)) AS xx
         |       FROM r WHERE rk <= 100),
         |s AS (SELECT lang, count(*) AS n_top, sum(x) AS sx, sum(y) AS sy,
         |             sum(xy) AS sxy, sum(xx) AS sxx
         |      FROM ad GROUP BY lang),
         |g AS (SELECT lang, n_top, sx, sy, sxy, sxx,
         |        CAST(n_top AS DOUBLE) * CAST(sxx AS DOUBLE)
         |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS den
         |      FROM s)
         |SELECT lang, CAST(n_top AS BIGINT) AS n_top,
         |  round(CASE WHEN den <> 0 THEN
         |    (CAST(n_top AS DOUBLE) * CAST(sxy AS DOUBLE)
         |     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / den END, 6) AS slope,
         |  round((CAST(sy AS DOUBLE)
         |         - (CASE WHEN den <> 0 THEN
         |             (CAST(n_top AS DOUBLE) * CAST(sxy AS DOUBLE)
         |              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / den END)
         |           * CAST(sx AS DOUBLE)) / CAST(n_top AS DOUBLE), 6) AS intercept
         |FROM g ORDER BY lang""".stripMargin,

    // literal-true gate (the corpus_quantiles_approx pattern): the
    // two-pass Misra-Gries top-k must equal the exact top-k rank-for-
    // rank, so the oracle is the expected all-true table
    "corpus_vocab_approx" ->
      """SELECT DISTINCT lang, CAST(10 AS BIGINT) AS n_topk, TRUE AS topk_ok
        |FROM documents ORDER BY lang""".stripMargin,

    "corpus_bigrams_approx" ->
      """SELECT DISTINCT lang, CAST(10 AS BIGINT) AS n_topk, TRUE AS topk_ok
        |FROM documents ORDER BY lang""".stripMargin,

    // scaled-integer PMI: products in HUGEINT, floor division (all
    // operands positive, so DuckDB's floor `//` == Spark's
    // truncating `div`), BIGINT result per the pinned-type contract
    "corpus_collocations" ->
      s"""WITH tk AS (SELECT ${toks("text")} AS tl FROM documents),
         |tok AS (SELECT unnest(tl) AS tok FROM tk),
         |cu AS (SELECT tok, count(*) AS cn FROM tok GROUP BY 1),
         |tot AS (SELECT CAST(sum(cn) AS HUGEINT) AS t FROM cu),
         |bg AS (SELECT unnest([tl[i] || ' ' || tl[i+1]
         |                      for i in generate_series(1, greatest(len(tl) - 1, 0))]) AS bg
         |       FROM tk),
         |cb AS (SELECT bg, count(*) AS c_ab FROM bg
         |       GROUP BY 1 HAVING count(*) >= 5)
         |SELECT cb.bg AS bigram, cb.c_ab, a.cn AS c_a, b.cn AS c_b,
         |       CAST((CAST(cb.c_ab AS HUGEINT) * tot.t * 1000000)
         |            // (CAST(a.cn AS HUGEINT) * CAST(b.cn AS HUGEINT))
         |         AS BIGINT) AS score_ppm
         |FROM cb
         |JOIN cu a ON a.tok = split_part(cb.bg, ' ', 1)
         |JOIN cu b ON b.tok = split_part(cb.bg, ' ', 2)
         |CROSS JOIN tot
         |ORDER BY score_ppm DESC, bigram ASC LIMIT 100""".stripMargin,

    "corpus_bigrams" ->
      s"""WITH tk AS (SELECT lang, ${toks("text")} AS tl FROM documents),
         |bg AS (SELECT lang,
         |         unnest([tl[i] || ' ' || tl[i+1]
         |                 for i in generate_series(1, greatest(len(tl) - 1, 0))]) AS tok
         |       FROM tk),
         |c AS (SELECT lang, tok, count(*) AS n FROM bg GROUP BY 1, 2),
         |r AS (SELECT lang, tok, n,
         |        CAST(row_number() OVER (PARTITION BY lang
         |               ORDER BY n DESC, tok ASC) AS BIGINT) AS "rank"
         |      FROM c)
         |SELECT lang, tok, n, "rank" FROM r WHERE "rank" <= 10
         |ORDER BY lang, "rank"""".stripMargin,

    "events_json" ->
      """SELECT event_type, count(*) AS n_events,
        |       CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
        |       CAST(min(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS min_k,
        |       CAST(max(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // WARC → text: the twin replays the HTML template's closed-form
    // extraction over `documents` (the injected-proof pattern): the
    // Spark side really frames/splits/charset-decodes/extracts from
    // bytes on disk, the oracle knows the answer by construction.
    // Both URL variants carry the SAME extracted text; corpus text is
    // whitespace-collapsed exactly as the extractor would.
    "warc_text_extract" ->
      """WITH txt AS (SELECT doc_id,
        |  'Doc ' || doc_id || ' & café résumé Doc ' || doc_id || ' ' ||
        |  trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g')) ||
        |  ' fin <' || doc_id || '> éé' AS clean_text
        |  FROM documents),
        |uris AS (
        |  SELECT format('http://EXample.org/docs/{}', doc_id) AS uri,
        |         clean_text FROM txt
        |  UNION ALL
        |  SELECT format('http://www.example.org:80/docs/{}#frag', doc_id),
        |         clean_text FROM txt)
        |SELECT uri, clean_text FROM uris ORDER BY uri""".stripMargin,

    // WET twin (r20): the fixture's conversion payloads ARE the
    // WARC extraction output, so the expectation is the identical
    // closed-form template replay as warc_text_extract — passing
    // both rows proves WET == extractText(WARC) transitively
    "wet_text_extract" ->
      """WITH txt AS (SELECT doc_id,
        |  'Doc ' || doc_id || ' & café résumé Doc ' || doc_id || ' ' ||
        |  trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g')) ||
        |  ' fin <' || doc_id || '> éé' AS clean_text
        |  FROM documents),
        |uris AS (
        |  SELECT format('http://EXample.org/docs/{}', doc_id) AS uri,
        |         clean_text FROM txt
        |  UNION ALL
        |  SELECT format('http://www.example.org:80/docs/{}#frag', doc_id),
        |         clean_text FROM txt)
        |SELECT uri, clean_text FROM uris ORDER BY uri""".stripMargin,

    // WAT twin (r20): the metadata envelope's fields replayed
    // closed-form from the fixture's construction
    "wat_meta" ->
      """SELECT format('http://EXample.org/docs/{}', doc_id) AS uri,
        |       doc_id,
        |       CASE WHEN doc_id % 3 = 0 THEN 'iso-8859-1'
        |            ELSE 'utf-8' END AS charset
        |FROM documents ORDER BY uri""".stripMargin,

    // the composed crawl-ingest gate: by construction every canonical
    // URL holds exactly 2 copies (host-case vs www+port+fragment
    // variants) of 1 distinct text (utf-8 and latin-1 bodies decode
    // to the same string)
    "warc_dedup" ->
      """SELECT format('http://example.org/docs/{}', doc_id) AS url,
        |       CAST(2 AS BIGINT) AS n_copies, CAST(1 AS BIGINT) AS n_texts
        |FROM documents ORDER BY url""".stripMargin,

    // main-content extraction: the twin replays only the KEPT blocks
    // of the planted template (heading, corpus paragraph, entity
    // trailer) joined by \n — nav/header/footer/aside/link-farm/
    // one-word blocks and the whole head are boilerplate by
    // construction and must leave no byte behind
    "html_main_text" ->
      """SELECT doc_id,
        |  'Doc ' || doc_id || ' heading' || chr(10) ||
        |  trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g')) || chr(10) ||
        |  'fin <' || doc_id || '> é twin' AS main_text
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the composed WARC → main-text gate over the warc_text_extract
    // fixture: same bytes on disk, boilerplate-stripped expectation
    // (head/title/style/script pruned; h1, corpus paragraph and the
    // entity trailer kept)
    "warc_main_text" ->
      """WITH txt AS (SELECT doc_id,
        |  'Doc ' || doc_id || chr(10) ||
        |  trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g')) || chr(10) ||
        |  'fin <' || doc_id || '> éé' AS main_text
        |  FROM documents),
        |uris AS (
        |  SELECT format('http://EXample.org/docs/{}', doc_id) AS uri,
        |         main_text FROM txt
        |  UNION ALL
        |  SELECT format('http://www.example.org:80/docs/{}#frag', doc_id),
        |         main_text FROM txt)
        |SELECT uri, main_text FROM uris ORDER BY uri""".stripMargin,

    // crawl near-dup twin: exact word-3-gram Jaccard at 0.5 over the
    // closed-form MAIN texts of the near-dup fixture (each doc served
    // at its page URL and a ?v=2 variant with a 2-word suffix; the
    // shared nav/footer chrome never reaches the signatures).
    // Precision is 1.0 on the Spark side (exact verify), so equality
    // == full LSH recall — the dedup_minhash contract on crawl input.
    "warc_neardup" ->
      s"""WITH base AS (SELECT doc_id,
         |  trim(regexp_replace(text, '[ \\t\\n\\r]+', ' ', 'g')) AS mt
         |  FROM documents),
         |txt AS (
         |  SELECT format('http://crawl.example.org/p/{}', doc_id) AS id,
         |         mt AS t FROM base
         |  UNION ALL
         |  SELECT format('http://crawl.example.org/p/{}?v=2', doc_id),
         |         mt || ' appendix notes' FROM base),
         |tk AS (SELECT id, ${toks("t")} AS tl FROM txt),
         |sh AS (SELECT DISTINCT id,
         |         unnest([tl[i] || ' ' || tl[i+1] || ' ' || tl[i+2]
         |                 for i in generate_series(1, greatest(len(tl) - 2, 0))]) AS sh
         |       FROM tk),
         |n AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
         |i AS (SELECT a.id AS id1, b.id AS id2, count(*) AS ni
         |      FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id GROUP BY 1, 2),
         |pairs AS (
         |  SELECT id1, id2, jaccard FROM (
         |    SELECT id1, id2,
         |           CAST(ni AS DOUBLE) / CAST(n1.sz + n2.sz - ni AS DOUBLE) AS jaccard
         |    FROM i JOIN n n1 ON id1 = n1.id JOIN n n2 ON id2 = n2.id)
         |  WHERE jaccard >= 0.5)
         |SELECT id1, id2, jaccard FROM pairs ORDER BY id1, id2""".stripMargin,

    // URL grouping keys: the twin replays canonical/host/domain
    // CLOSED-FORM per fixture branch (uppercase+www+:80+%7E+dot-seg+
    // query-sort fold; ccSLD 3-label domain; cdnK subdomain pooling
    // with a kept nonstandard port; trailing-dot + fragment strip)
    "url_domain_key" ->
      """SELECT doc_id,
        |  CASE doc_id % 4
        |    WHEN 0 THEN 'http://news.example.com/a/p/' || doc_id || '?a=2&z=1'
        |    WHEN 1 THEN 'https://blog.shop.example.co.uk/posts/' || doc_id
        |    WHEN 2 THEN 'http://cdn' || (doc_id % 7) || '.media.example.org:8080/img/' || doc_id
        |    ELSE 'https://example.net/' || doc_id END AS url_canon,
        |  CASE doc_id % 4
        |    WHEN 0 THEN 'news.example.com'
        |    WHEN 1 THEN 'blog.shop.example.co.uk'
        |    WHEN 2 THEN 'cdn' || (doc_id % 7) || '.media.example.org'
        |    ELSE 'example.net' END AS host,
        |  CASE doc_id % 4
        |    WHEN 0 THEN 'example.com'
        |    WHEN 1 THEN 'example.co.uk'
        |    WHEN 2 THEN 'example.org'
        |    ELSE 'example.net' END AS domain
        |FROM documents ORDER BY doc_id""".stripMargin,

    "curate_domain_stats" ->
      """WITH k AS (SELECT doc_id, n_chars,
        |  CASE doc_id % 4
        |    WHEN 0 THEN 'news.example.com'
        |    WHEN 1 THEN 'blog.shop.example.co.uk'
        |    WHEN 2 THEN 'cdn' || (doc_id % 7) || '.media.example.org'
        |    ELSE 'example.net' END AS host,
        |  CASE doc_id % 4
        |    WHEN 0 THEN 'example.com'
        |    WHEN 1 THEN 'example.co.uk'
        |    WHEN 2 THEN 'example.org'
        |    ELSE 'example.net' END AS domain
        |  FROM documents)
        |SELECT domain, count(*) AS n_docs,
        |       count(DISTINCT host) AS n_hosts,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM k GROUP BY domain ORDER BY domain""".stripMargin,

    // the incremental stats table merges back to EXACTLY the batch
    // recompute (mergeable (domain, host) partial grain), so the twin
    // IS the batch twin
    "curate_domain_stats_incr" ->
      """WITH k AS (SELECT doc_id, n_chars,
        |  CASE doc_id % 4
        |    WHEN 0 THEN 'news.example.com'
        |    WHEN 1 THEN 'blog.shop.example.co.uk'
        |    WHEN 2 THEN 'cdn' || (doc_id % 7) || '.media.example.org'
        |    ELSE 'example.net' END AS host,
        |  CASE doc_id % 4
        |    WHEN 0 THEN 'example.com'
        |    WHEN 1 THEN 'example.co.uk'
        |    WHEN 2 THEN 'example.org'
        |    ELSE 'example.net' END AS domain
        |  FROM documents)
        |SELECT domain, count(*) AS n_docs,
        |       count(DISTINCT host) AS n_hosts,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM k GROUP BY domain ORDER BY domain""".stripMargin,

    // per-domain quota: the curate_take sampleKey replay partitioned
    // by the replayed registrable domain
    "curate_domain_cap" ->
      """SELECT doc_id, domain FROM (
        |  SELECT doc_id, domain, row_number() OVER (PARTITION BY domain
        |    ORDER BY CAST((CAST(doc_id AS HUGEINT) * 2654435761) % 1000000 AS DOUBLE) / 1000000.0 ASC,
        |             doc_id ASC) AS rk
        |  FROM (SELECT doc_id,
        |    CASE doc_id % 4
        |      WHEN 0 THEN 'example.com'
        |      WHEN 1 THEN 'example.co.uk'
        |      WHEN 2 THEN 'example.org'
        |      ELSE 'example.net' END AS domain
        |    FROM documents))
        |WHERE rk <= 50 ORDER BY doc_id""".stripMargin,

    // chained incremental quota == the first 50 per domain in
    // (batch, sampleKey, doc_id) lexicographic order (each batch
    // fills the remaining quota in sampleKey order, so the
    // cumulative admit set is a prefix of this global order)
    "curate_domain_cap_incr" ->
      """SELECT doc_id, domain FROM (
        |  SELECT doc_id, domain, row_number() OVER (PARTITION BY domain
        |    ORDER BY doc_id % 3 ASC,
        |             CAST((CAST(doc_id AS HUGEINT) * 2654435761) % 1000000 AS DOUBLE) / 1000000.0 ASC,
        |             doc_id ASC) AS rk
        |  FROM (SELECT doc_id,
        |    CASE doc_id % 4
        |      WHEN 0 THEN 'example.com'
        |      WHEN 1 THEN 'example.co.uk'
        |      WHEN 2 THEN 'example.org'
        |      ELSE 'example.net' END AS domain
        |    FROM documents))
        |WHERE rk <= 50 ORDER BY doc_id""".stripMargin,

    "boilerplate_ngrams" ->
      s"""WITH tk AS (SELECT doc_id, ${toks("text")} AS tl FROM documents),
         |sh AS (SELECT DISTINCT doc_id,
         |         unnest([array_to_string(tl[i:i+1], ' ')
         |                 for i in generate_series(1, greatest(len(tl) - 1, 0))]) AS shingle
         |       FROM tk)
         |SELECT shingle, count(*) AS n_docs FROM sh
         |GROUP BY shingle HAVING count(*) >= 30
         |ORDER BY n_docs DESC, shingle ASC LIMIT 20""".stripMargin,

    "dedup_incremental" ->
      """WITH inc AS (SELECT * FROM documents WHERE doc_id >= 250),
        |firstseen AS (SELECT min(doc_id) AS doc_id FROM inc GROUP BY text)
        |SELECT d.doc_id, d.lang FROM inc d
        |JOIN firstseen USING (doc_id)
        |WHERE NOT EXISTS (SELECT 1 FROM documents e
        |                  WHERE e.doc_id < 250 AND e.text = d.text)
        |ORDER BY d.doc_id""".stripMargin,

    // the persisted-index variant anti-joins the batch against the
    // bucketed hash table exactHashIndexBuild wrote instead of
    // re-hashing the corpus — same ground truth, so the shared twin
    // also proves the index read path
    "dedup_incremental_idx" ->
      """WITH inc AS (SELECT * FROM documents WHERE doc_id >= 250),
        |firstseen AS (SELECT min(doc_id) AS doc_id FROM inc GROUP BY text)
        |SELECT d.doc_id, d.lang FROM inc d
        |JOIN firstseen USING (doc_id)
        |WHERE NOT EXISTS (SELECT 1 FROM documents e
        |                  WHERE e.doc_id < 250 AND e.text = d.text)
        |ORDER BY d.doc_id""".stripMargin,

    // batch-touching subset of the exact near-dup pairs: the wired
    // query generates candidates by band-joining ONLY the incoming
    // batch's signatures, so parity against the full exact computation
    // restricted to batch pairs is the incremental path's recall gate
    "dedup_incremental_near" -> (jaccardPairsCte +
      """SELECT id1, id2, jaccard FROM pairs
        |WHERE id1 >= 250 OR id2 >= 250 ORDER BY id1, id2""".stripMargin),

    // the persisted-index variant band-joins the batch against the
    // signature TABLE minhashIndexBuild wrote (bucketed by the full
    // (band, key) join key) instead of inline signatures — same
    // parameters, same exact-Jaccard ground truth, so the shared twin
    // also gates that the bucketed storage read returns the same pairs
    "dedup_incremental_near_idx" -> (jaccardPairsCte +
      """SELECT id1, id2, jaccard FROM pairs
        |WHERE id1 >= 250 OR id2 >= 250 ORDER BY id1, id2""".stripMargin),

    "decontaminate" ->
      s"""WITH tk AS (SELECT doc_id, ${toks("text")} AS tl FROM documents),
         |sh AS (SELECT DISTINCT doc_id,
         |         unnest([array_to_string(tl[i:i+2], ' ')
         |                 for i in generate_series(1, greatest(len(tl) - 2, 0))]) AS sh
         |       FROM tk),
         |ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 20 = 0)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
         |FROM sh JOIN ev USING (sh)
         |WHERE doc_id % 20 <> 0
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // dedup_components_dist: the SAME closure gates the forced
    // distributed label-propagation arm (r19) — one twin, two paths
    "dedup_components" -> componentsClosureSql,
    "dedup_components_dist" -> componentsClosureSql,

    "dedup_canonical" ->
      s"""WITH RECURSIVE tk AS (SELECT doc_id, ${toks("text")} AS tl FROM documents),
         |sh AS (SELECT DISTINCT doc_id,
         |         unnest([tl[i] || ' ' || tl[i+1] || ' ' || tl[i+2]
         |                 for i in generate_series(1, greatest(len(tl) - 2, 0))]) AS sh
         |       FROM tk),
         |n AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
         |i AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS ni
         |      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |pairs AS (
         |  SELECT id1, id2 FROM (
         |    SELECT id1, id2, CAST(ni AS DOUBLE) / CAST(n1.sz + n2.sz - ni AS DOUBLE) AS jaccard
         |    FROM i JOIN n n1 ON id1 = n1.doc_id JOIN n n2 ON id2 = n2.doc_id)
         |  WHERE jaccard >= 0.5),
         |e AS (SELECT id1 AS a, id2 AS b FROM pairs UNION SELECT id2, id1 FROM pairs),
         |closure AS (
         |  SELECT a, b FROM e
         |  UNION
         |  SELECT closure.a, e.b FROM closure JOIN e ON closure.b = e.a),
         |losers AS (SELECT a AS id FROM closure GROUP BY a HAVING least(a, min(b)) <> a)
         |SELECT doc_id, lang FROM documents
         |WHERE doc_id NOT IN (SELECT id FROM losers)
         |ORDER BY doc_id""".stripMargin,

    // same closure as dedup_canonical, but the survivor per component
    // is the LONGEST member (token count; ties -> min id) and every
    // document maps to its survivor (singletons to themselves)
    "dedup_keep_best" ->
      s"""WITH RECURSIVE tk AS (SELECT doc_id, ${toks("text")} AS tl FROM documents),
         |sh AS (SELECT DISTINCT doc_id,
         |         unnest([tl[i] || ' ' || tl[i+1] || ' ' || tl[i+2]
         |                 for i in generate_series(1, greatest(len(tl) - 2, 0))]) AS sh
         |       FROM tk),
         |n AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
         |i AS (SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS ni
         |      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |pairs AS (
         |  SELECT id1, id2 FROM (
         |    SELECT id1, id2, CAST(ni AS DOUBLE) / CAST(n1.sz + n2.sz - ni AS DOUBLE) AS jaccard
         |    FROM i JOIN n n1 ON id1 = n1.doc_id JOIN n n2 ON id2 = n2.doc_id)
         |  WHERE jaccard >= 0.5),
         |e AS (SELECT id1 AS a, id2 AS b FROM pairs UNION SELECT id2, id1 FROM pairs),
         |closure AS (
         |  SELECT a, b FROM e
         |  UNION
         |  SELECT closure.a, e.b FROM closure JOIN e ON closure.b = e.a),
         |comp AS (SELECT a AS id, least(a, min(b)) AS component FROM closure GROUP BY a),
         |win AS (SELECT component, id AS kept_id FROM (
         |  SELECT comp.component, comp.id,
         |         row_number() OVER (PARTITION BY comp.component
         |           ORDER BY len(tk.tl) DESC, comp.id ASC) AS rk
         |  FROM comp JOIN tk ON comp.id = tk.doc_id) WHERE rk = 1)
         |SELECT d.doc_id, coalesce(w.kept_id, d.doc_id) AS kept_id
         |FROM documents d
         |LEFT JOIN comp ON d.doc_id = comp.id
         |LEFT JOIN win w ON comp.component = w.component
         |ORDER BY d.doc_id""".stripMargin,

    // SemDeDup twin: replays candidate generation (shared probe cell),
    // the cell cap, the exact-cosine verify, and the transitive-closure
    // min-id canonical map from the dedup_semantic_assign cell dump —
    // everything downstream of the Lloyd quantizer is SQL-gated; the
    // quantizer itself is gated by dedup_semantic_recall's exact-truth
    // floor (centroid training has no SQL twin).
    "dedup_semantic" ->
      s"""WITH RECURSIVE a AS (SELECT vec_id, cell
         |           FROM read_parquet('__VERIFY_OUT__/dedup_semantic_assign/*.parquet')),
         |over AS (SELECT cell FROM a GROUP BY cell
         |         HAVING count(*) > ${SparkEntry.SemanticCellCap.get}),
         |k AS (SELECT vec_id, cell FROM a
         |      WHERE cell NOT IN (SELECT cell FROM over)),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cand AS (SELECT DISTINCT a1.vec_id AS id1, a2.vec_id AS id2
         |         FROM k a1 JOIN k a2 ON a1.cell = a2.cell AND a1.vec_id < a2.vec_id),
         |p AS (SELECT id1, id2 FROM cand
         |      JOIN e e1 ON cand.id1 = e1.vec_id
         |      JOIN e e2 ON cand.id2 = e2.vec_id
         |      WHERE list_cosine_similarity(e1.v, e2.v) >= ${SparkEntry.SemanticTau}),
         |edges AS (SELECT id1 AS x, id2 AS y FROM p UNION SELECT id2, id1 FROM p),
         |closure AS (
         |  SELECT x, y FROM edges
         |  UNION
         |  SELECT closure.x, edges.y FROM closure JOIN edges ON closure.y = edges.x),
         |comp AS (SELECT x AS id, least(x, min(y)) AS component FROM closure GROUP BY x)
         |SELECT em.vec_id, coalesce(c.component, em.vec_id) AS kept_id
         |FROM embeddings em LEFT JOIN comp c ON em.vec_id = c.id
         |ORDER BY em.vec_id""".stripMargin,

    // ingest twin: same replay as dedup_semantic but over the
    // existing-trained quantizer's cell dump, restricted to pairs
    // touching the batch (id1 < bound suffices: id1 is the minimum)
    "dedup_semantic_ingest" ->
      s"""WITH a AS (SELECT vec_id, cell
         |           FROM read_parquet('__VERIFY_OUT__/dedup_semantic_ingest_cells/*.parquet')),
         |over AS (SELECT cell FROM a GROUP BY cell
         |         HAVING count(*) > ${SparkEntry.SemanticCellCap.get}),
         |k AS (SELECT vec_id, cell FROM a
         |      WHERE cell NOT IN (SELECT cell FROM over)),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cand AS (SELECT DISTINCT a1.vec_id AS id1, a2.vec_id AS id2
         |         FROM k a1 JOIN k a2 ON a1.cell = a2.cell AND a1.vec_id < a2.vec_id
         |         WHERE a1.vec_id < ${SparkEntry.SemanticProbeIds})
         |SELECT id1, id2, round(sim, 6) AS similarity FROM (
         |  SELECT id1, id2, list_cosine_similarity(e1.v, e2.v) AS sim
         |  FROM cand JOIN e e1 ON cand.id1 = e1.vec_id
         |            JOIN e e2 ON cand.id2 = e2.vec_id)
         |WHERE sim >= ${SparkEntry.SemanticTau}
         |ORDER BY id1, id2""".stripMargin,

    "dedup_semantic_recall" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |t AS (SELECT a.vec_id AS id1, b.vec_id AS id2
         |      FROM e a JOIN e b
         |        ON a.vec_id < b.vec_id AND a.vec_id < ${SparkEntry.SemanticProbeIds}
         |      WHERE list_cosine_similarity(a.v, b.v) >= ${SparkEntry.SemanticTau})
         |SELECT count(*) AS n_true_pairs, true AS recall_ok FROM t""".stripMargin,

    "decontaminate_clean" ->
      s"""WITH tk AS (SELECT doc_id, ${toks("text")} AS tl FROM documents),
         |sh AS (SELECT DISTINCT doc_id,
         |         unnest([array_to_string(tl[i:i+2], ' ')
         |                 for i in generate_series(1, greatest(len(tl) - 2, 0))]) AS sh
         |       FROM tk),
         |ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 20 = 0),
         |bad AS (SELECT DISTINCT s.doc_id FROM sh s JOIN ev USING (sh)
         |        WHERE s.doc_id % 20 <> 0)
         |SELECT doc_id, lang FROM documents
         |WHERE doc_id % 20 <> 0 AND doc_id NOT IN (SELECT doc_id FROM bad)
         |ORDER BY doc_id""".stripMargin,

    // fuzzy (near-dup) decontamination: exact cross-corpus word-3-gram
    // Jaccard at 0.5 between the train and eval splits — the Spark
    // side's exact verify makes precision 1.0, so equality == full
    // LSH recall on the broadcast-probe path
    "decontaminate_fuzzy" ->
      s"""WITH tk AS (SELECT doc_id, ${toks("text")} AS tl FROM documents),
         |sh AS (SELECT DISTINCT doc_id,
         |         unnest([tl[i] || ' ' || tl[i+1] || ' ' || tl[i+2]
         |                 for i in generate_series(1, greatest(len(tl) - 2, 0))]) AS sh
         |       FROM tk),
         |n AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
         |i AS (SELECT a.doc_id AS id, b.doc_id AS eval_id, count(*) AS ni
         |      FROM sh a JOIN sh b ON a.sh = b.sh
         |      WHERE a.doc_id % 20 <> 0 AND b.doc_id % 20 = 0
         |      GROUP BY 1, 2),
         |pairs AS (
         |  SELECT id, eval_id, jaccard FROM (
         |    SELECT id, eval_id,
         |           CAST(ni AS DOUBLE) / CAST(n1.sz + n2.sz - ni AS DOUBLE) AS jaccard
         |    FROM i JOIN n n1 ON id = n1.doc_id JOIN n n2 ON eval_id = n2.doc_id)
         |  WHERE jaccard >= 0.5)
         |SELECT id, eval_id, jaccard FROM pairs ORDER BY id, eval_id""".stripMargin,

    // semantic decontamination: the twin recomputes every training
    // vector's best cosine against the eval split independently from
    // the raw embeddings (identical sequential double chains — the
    // ann arithmetic-twin contract), rounds to 6dp, and applies the
    // SAME rounded-value threshold, so the boolean is exactly as
    // stable as the sim
    "decontaminate_semantic" ->
      """WITH tr AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |            FROM embeddings WHERE vec_id % 10 <> 0),
        |ev AS (SELECT CAST(embedding AS DOUBLE[]) AS v
        |       FROM embeddings WHERE vec_id % 10 = 0),
        |s AS (SELECT tr.vec_id,
        |             round(max(list_cosine_similarity(tr.v, ev.v)), 6) AS m
        |      FROM tr CROSS JOIN ev GROUP BY tr.vec_id)
        |SELECT vec_id, m AS max_sim, m >= 0.8 AS contaminated
        |FROM s ORDER BY vec_id""".stripMargin,

    // the wired queries compute pairs via banded LSH + exact verify; the
    // oracles are the EXACT pair join, so the parity gate doubles as a
    // per-round full-recall check on the scale path — both on the
    // clustered 8-dim coarse prefix projection, at the mid threshold
    // (0.65) and the production threshold (0.8). The low-threshold
    // full-width stress regime is spec-only (SimilaritySpec) since r8.
    "dedup_embedding_lsh" ->
      """SELECT id1, id2, similarity FROM (
        |  SELECT a.vec_id AS id1, b.vec_id AS id2,
        |         list_cosine_similarity(CAST(a.embedding[1:8] AS DOUBLE[]), CAST(b.embedding[1:8] AS DOUBLE[])) AS sim,
        |         round(list_cosine_similarity(CAST(a.embedding[1:8] AS DOUBLE[]), CAST(b.embedding[1:8] AS DOUBLE[])), 6) AS similarity
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
        |WHERE sim >= 0.65 ORDER BY id1, id2""".stripMargin,

    "dedup_embedding_lsh_hi" ->
      """SELECT id1, id2, similarity FROM (
        |  SELECT a.vec_id AS id1, b.vec_id AS id2,
        |         list_cosine_similarity(CAST(a.embedding[1:8] AS DOUBLE[]), CAST(b.embedding[1:8] AS DOUBLE[])) AS sim,
        |         round(list_cosine_similarity(CAST(a.embedding[1:8] AS DOUBLE[]), CAST(b.embedding[1:8] AS DOUBLE[])), 6) AS similarity
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
        |WHERE sim >= 0.8 ORDER BY id1, id2""".stripMargin,

    // materialized-signature twin: the companion dedup_simhash_sig
    // query dumps every document's 64-bit SimHash; this twin re-derives
    // the pigeonhole band join (4 bands over all 64 bits — any pair
    // within hamming 3 agrees on at least one full band) and the
    // hamming<=3 filter from those emitted signatures, entirely in SQL.
    // A banding-mask, band-join, or hamming bug in the Spark operator
    // breaks the hash match; the signature kernel itself is the one
    // part left to HashExprsSpec (no xxhash64 in DuckDB).
    "dedup_simhash" ->
      s"""WITH s AS (SELECT id, simhash
         |           FROM read_parquet('__VERIFY_OUT__/dedup_simhash_sig/*.parquet')),
         |b AS (SELECT id, simhash, band, simhash & ($simhashMaskCase) AS key
         |      FROM s CROSS JOIN (SELECT unnest($simhashBandList) AS band)),
         |p AS (SELECT DISTINCT a.id AS id1, c.id AS id2,
         |             a.simhash AS s1, c.simhash AS s2
         |      FROM b a JOIN b c ON a.band = c.band AND a.key = c.key AND a.id < c.id)
         |SELECT id1, id2, CAST(bit_count(xor(s1, s2)) AS BIGINT) AS hamming
         |FROM p WHERE bit_count(xor(s1, s2)) <= 3 ORDER BY id1, id2""".stripMargin,

    "ann_lsh" -> annArithmeticTwin("ann_lsh"),

    "ann_ivf" -> annArithmeticTwin("ann_ivf"),

    "ann_pq" -> annArithmeticTwin("ann_pq"),

    // persisted-index PQ path: deterministic training with identical
    // parameters must EQUAL the inline ann_pq dump row-for-row
    "ann_pq_index" ->
      """SELECT query_id, neighbor_id, "rank", similarity
        |FROM read_parquet('__VERIFY_OUT__/ann_pq/*.parquet')
        |ORDER BY query_id, "rank"""".stripMargin,

    // the persisted-index path trains the same deterministic quantizer
    // with the same parameters as the inline ann_ivf, so its result
    // must EQUAL ann_ivf's dumped output row-for-row — an equality
    // gate proving the storage-layer path (cell-partitioned index +
    // partition-pruned probe scan) loses nothing vs the inline plan
    "ann_ivf_index" ->
      """SELECT query_id, neighbor_id, "rank", similarity
        |FROM read_parquet('__VERIFY_OUT__/ann_ivf/*.parquet')
        |ORDER BY query_id, "rank"""".stripMargin,

    "ann_range" ->
      """SELECT query_id, neighbor_id, round(sim, 6) AS similarity FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS sim
        |  FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND c.vec_id <> q.vec_id)
        |WHERE sim >= 0.35
        |ORDER BY query_id, sim DESC, neighbor_id""".stripMargin,

    "ann_topk" ->
      """SELECT query_id, neighbor_id, "rank", round(sim, 6) AS similarity FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS sim,
        |         CAST(row_number() OVER (PARTITION BY q.vec_id
        |                ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC,
        |                         c.vec_id ASC) AS BIGINT) AS "rank"
        |  FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND c.vec_id <> q.vec_id)
        |WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin,

    // filtered (hybrid) search twin: the label predicate restricts the
    // CANDIDATE set before ranking — pre-filter semantics, full-k
    // lists from the slice
    "ann_topk_filtered" ->
      """SELECT query_id, neighbor_id, "rank", round(sim, 6) AS similarity FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS sim,
        |         CAST(row_number() OVER (PARTITION BY q.vec_id
        |                ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC,
        |                         c.vec_id ASC) AS BIGINT) AS "rank"
        |  FROM embeddings q JOIN embeddings c
        |    ON q.vec_id < 10 AND c.vec_id <> q.vec_id AND c.label = 7)
        |WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin,

    // duplicated-span twin: 5-token windows with >= 2 distinct docs,
    // consecutive-position runs (pos - row_number), interval-union
    // sweep via the running max end — every stage exact integers
    "dedup_spans" ->
      s"""WITH tk AS (SELECT doc_id, ${toks("text")} AS tl FROM documents),
         |w AS (SELECT doc_id, i - 1 AS pos, array_to_string(tl[i:i+4], ' ') AS sh
         |      FROM (SELECT doc_id, tl,
         |              unnest(generate_series(1, greatest(len(tl) - 4, 0))) AS i FROM tk)),
         |dup AS (SELECT sh FROM (SELECT sh, count(DISTINCT doc_id) AS nd FROM w GROUP BY sh)
         |        WHERE nd >= 2),
         |dp AS (SELECT doc_id, pos FROM w JOIN dup USING (sh)),
         |runs AS (SELECT doc_id, pos,
         |                pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos ASC) AS grp
         |         FROM dp),
         |spans AS (SELECT doc_id, min(pos) AS strt, max(pos) + 5 AS e
         |          FROM runs GROUP BY doc_id, grp),
         |sweep AS (SELECT doc_id, strt, e,
         |                 coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY strt ASC
         |                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev_e
         |          FROM spans),
         |cov AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         |               CAST(sum(greatest(e - greatest(strt, prev_e), 0)) AS BIGINT) AS dup_tokens
         |        FROM sweep GROUP BY doc_id)
         |SELECT tk.doc_id, CAST(len(tl) AS BIGINT) AS n_tokens,
         |       coalesce(n_spans, 0) AS n_spans,
         |       coalesce(dup_tokens, 0) AS dup_tokens,
         |       CASE WHEN len(tl) = 0 THEN 0.0
         |            ELSE round(CAST(coalesce(dup_tokens, 0) AS DOUBLE) / len(tl), 6)
         |       END AS dup_ratio
         |FROM tk LEFT JOIN cov USING (doc_id) ORDER BY tk.doc_id""".stripMargin,

    // substring-dedup rewrite twin: ownership (min doc per duplicated
    // window), covered-position explode, anti-join survival, ordered
    // string_agg reassembly
    "dedup_spans_clean" ->
      s"""WITH tk AS (SELECT doc_id, ${toks("text")} AS tl FROM documents),
         |w AS (SELECT doc_id, i - 1 AS pos, array_to_string(tl[i:i+4], ' ') AS sh
         |      FROM (SELECT doc_id, tl,
         |              unnest(generate_series(1, greatest(len(tl) - 4, 0))) AS i FROM tk)),
         |owned AS (SELECT sh, min(doc_id) AS owner
         |          FROM w GROUP BY sh HAVING count(DISTINCT doc_id) >= 2),
         |dp AS (SELECT DISTINCT w.doc_id, pos + j AS t
         |       FROM w JOIN owned USING (sh), unnest(generate_series(0, 4)) AS u(j)
         |       WHERE w.doc_id <> owned.owner),
         |toksx AS (SELECT doc_id, i - 1 AS t, tl[i] AS word
         |          FROM (SELECT doc_id, tl,
         |                  unnest(generate_series(1, len(tl))) AS i FROM tk)),
         |keptx AS (SELECT tx.doc_id, tx.t, tx.word FROM toksx tx
         |          ANTI JOIN dp ON tx.doc_id = dp.doc_id AND tx.t = dp.t),
         |reb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         |               string_agg(word, ' ' ORDER BY t) AS text_clean
         |        FROM keptx GROUP BY doc_id)
         |SELECT tk.doc_id, CAST(len(tl) AS BIGINT) AS n_tokens,
         |       coalesce(n_kept, 0) AS n_kept,
         |       coalesce(text_clean, '') AS text_clean
         |FROM tk LEFT JOIN reb USING (doc_id) ORDER BY tk.doc_id""".stripMargin,

    // kNN label-agreement twin: brute-force rank (sim desc, id asc),
    // 5-NN vote, (votes desc, label asc) majority — both tie-breaks
    // replayed
    "ann_knn_label" ->
      """WITH nn AS (
        |  SELECT query_id, n_label FROM (
        |    SELECT q.vec_id AS query_id, c.label AS n_label,
        |           row_number() OVER (PARTITION BY q.vec_id
        |             ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                                             CAST(c.embedding AS DOUBLE[])) DESC,
        |                      c.vec_id ASC) AS rk
        |    FROM embeddings q JOIN embeddings c
        |      ON q.vec_id < 200 AND c.vec_id <> q.vec_id)
        |  WHERE rk <= 5),
        |votes AS (SELECT query_id, n_label, count(*) AS v FROM nn GROUP BY 1, 2),
        |pred AS (SELECT query_id, n_label AS predicted FROM (
        |    SELECT query_id, n_label,
        |           row_number() OVER (PARTITION BY query_id
        |             ORDER BY v DESC, n_label ASC) AS rn FROM votes)
        |  WHERE rn = 1)
        |SELECT q.vec_id, q.label, p.predicted, q.label = p.predicted AS correct
        |FROM embeddings q JOIN pred p ON q.vec_id = p.query_id
        |WHERE q.vec_id < 200 ORDER BY q.vec_id""".stripMargin,

    // the approximate-ANN recall gates: the Spark side computes
    // recall@5 per query against its own in-plan brute-force truth and
    // emits a floor boolean; the oracle is the LITERAL all-true table,
    // so any query dropping below the floor fails the hash match
    "ann_lsh_recall" ->
      """SELECT vec_id AS query_id, true AS recall_ok FROM embeddings
        |WHERE vec_id < 10 ORDER BY query_id""".stripMargin,

    "ann_ivf_recall" ->
      """SELECT vec_id AS query_id, true AS recall_ok FROM embeddings
        |WHERE vec_id < 10 ORDER BY query_id""".stripMargin,

    "ann_pq_recall" ->
      """SELECT vec_id AS query_id, true AS recall_ok FROM embeddings
        |WHERE vec_id < 10 ORDER BY query_id""".stripMargin,

    // SQ-ANN over the persisted int8 index: precision + ordering of
    // the returned set (recall gates separately through the floor)
    "ann_sq" -> annArithmeticTwin("ann_sq"),

    // dimensionality-reduced (PCA-space) ANN: same gate pair
    "ann_pca" -> annArithmeticTwin("ann_pca"),

    "ann_pca_recall" ->
      """SELECT vec_id AS query_id, true AS recall_ok FROM embeddings
        |WHERE vec_id < 10 ORDER BY query_id""".stripMargin,

    "ann_sq_recall" ->
      """SELECT vec_id AS query_id, true AS recall_ok FROM embeddings
        |WHERE vec_id < 10 ORDER BY query_id""".stripMargin,

    // PCA projection twin: replays EVERY projection coordinate from
    // the dumped (mean, component) matrix — per-term 9dp rounding,
    // DECIMAL accumulation (order-free), 6dp final round, exactly the
    // Spark chain; the eigensolve itself is gated by
    // embedding_pca_gate's orthonormality/eigenvalue-match booleans
    "embedding_pca" ->
      """WITH cm AS (SELECT comp, pos, w
        |            FROM read_parquet('__VERIFY_OUT__/embedding_pca_components/*.parquet')),
        |mu AS (SELECT pos, w AS m FROM cm WHERE comp = -1),
        |c AS (SELECT comp, pos, w FROM cm WHERE comp >= 0),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |ex AS (SELECT vec_id, i - 1 AS pos, v[i] AS x FROM (
        |         SELECT vec_id, v, unnest(generate_series(1, len(v))) AS i FROM e)),
        |terms AS (SELECT ex.vec_id, c.comp,
        |                 CAST(round(c.w * (ex.x - mu.m), 9) AS DECIMAL(28,9)) AS t
        |          FROM ex JOIN mu USING (pos) JOIN c USING (pos))
        |SELECT vec_id, comp, round(CAST(sum(t) AS DOUBLE), 6) AS proj
        |FROM terms GROUP BY vec_id, comp
        |ORDER BY vec_id, comp""".stripMargin,

    // literal-true training gate (the recall-floor pattern): k replays
    // as a literal; the booleans assert orthonormality and the
    // sample-variance == eigenvalue identity end-to-end
    "embedding_pca_gate" ->
      """SELECT 4 AS k, true AS orthonormal_ok, true AS variance_order_ok,
        |       true AS eigen_match_ok""".stripMargin,

    // int8 scalar quantization: exact per-dimension min/max bounds and
    // the identical IEEE double chain round((x-lo)/(hi-lo)*255) —
    // float inputs widen to doubles exactly, so codes match with no
    // tolerance; constant dims code to 0 by the hi=lo guard
    "embedding_quantize" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |ex AS (SELECT vec_id, i - 1 AS pos, v[i] AS x FROM (
        |         SELECT vec_id, v, unnest(generate_series(1, len(v))) AS i FROM e)),
        |b AS (SELECT pos, min(x) AS lo, max(x) AS hi FROM ex GROUP BY pos)
        |SELECT vec_id, pos,
        |       CAST(CASE WHEN hi = lo THEN 0
        |            ELSE round((x - lo) / (hi - lo) * 255) END AS BIGINT) AS code
        |FROM ex JOIN b USING (pos)
        |ORDER BY vec_id, pos""".stripMargin,

    // composed IVFPQ index: precision + ordering of the returned set
    // (recall gates separately through the floor below)
    "ann_ivfpq" -> annArithmeticTwin("ann_ivfpq"),

    // filtered composed-index search: the label constraint is folded
    // into the twin's corpus join, so a returned row violating the
    // predicate DROPS from the twin and fails row parity — on top of
    // the usual exact-cosine precision + ordering recomputation
    "ann_ivfpq_filtered" -> annArithmeticTwin("ann_ivfpq_filtered", " AND c.label = 7"),

    "ann_ivfpq_recall" ->
      """SELECT vec_id AS query_id, true AS recall_ok FROM embeddings
        |WHERE vec_id < 10 ORDER BY query_id""".stripMargin,

    // the incremental-ingest equality gate's reference arm (one-shot
    // build, quantizers trained on the even-id slice): precision +
    // ordering of the returned set recomputed from raw embeddings
    "ann_ivfpq_frozen" -> annArithmeticTwin("ann_ivfpq_frozen"),

    // ingest-loop composed index: build on the even-id slice + append
    // the odd batch under frozen quantizers must lose nothing vs the
    // one-shot frozen-train build — row-for-row equality with that
    // query's dump (the text_search_bm25_incr equality-gate trick)
    "ann_ivfpq_incr" ->
      """SELECT query_id, neighbor_id, "rank", similarity
        |FROM read_parquet('__VERIFY_OUT__/ann_ivfpq_frozen/*.parquet')
        |ORDER BY query_id, "rank"""".stripMargin,

    // PCA-composed partitioned index: precision + ordering of the
    // returned set are EXACT (split-space re-rank reads the original
    // vectors), recomputed here from raw embeddings; recall gates
    // separately through the floor below
    "ann_pca_ivfpq" -> annArithmeticTwin("ann_pca_ivfpq"),

    "ann_pca_ivfpq_recall" ->
      """SELECT vec_id AS query_id, true AS recall_ok FROM embeddings
        |WHERE vec_id < 10 ORDER BY query_id""".stripMargin,

    // winnowing twin (Schleimer et al. SIGMOD'03): the companion
    // doc_fingerprint_hashes dump carries every positional shingle
    // hash; this replays the w=3 sliding-window minima, the
    // short-document global-min rule, and the sorted-distinct
    // fingerprint set (n_fp + ascending head) in SQL — only the
    // rolling-hash kernel itself stays spec-side (no xxhash in DuckDB)
    "doc_fingerprint" ->
      """WITH h AS (SELECT doc_id, pos, hash
        |           FROM read_parquet('__VERIFY_OUT__/doc_fingerprint_hashes/*.parquet')),
        |m AS (SELECT doc_id, pos,
        |             min(hash) OVER (PARTITION BY doc_id ORDER BY pos
        |               ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS wmin,
        |             count(*) OVER (PARTITION BY doc_id) AS len
        |      FROM h),
        |mins AS (SELECT DISTINCT doc_id, wmin FROM m WHERE pos + 3 <= len
        |         UNION
        |         SELECT doc_id, min(hash) FROM h GROUP BY doc_id HAVING count(*) < 3),
        |g AS (SELECT doc_id, count(*) AS n_fp, min(wmin) AS fp_min
        |      FROM mins GROUP BY doc_id)
        |SELECT d.doc_id, CAST(coalesce(g.n_fp, 0) AS BIGINT) AS n_fp, g.fp_min
        |FROM documents d LEFT JOIN g ON d.doc_id = g.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "text_stats" ->
      s"""WITH tk AS (SELECT doc_id, text, ${toks("text")} AS tl FROM documents)
         |SELECT doc_id,
         |       CAST(length(text) AS BIGINT) AS n_chars,
         |       CAST(len(tl) AS BIGINT) AS n_tokens,
         |       CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS BIGINT) AS n_punct,
         |       CAST(len(regexp_extract_all(text, '[A-Z]')) AS BIGINT) AS n_upper,
         |       CAST(len(list_filter(tl, t -> list_contains(${sqlList(TextOps.stopwords.toMap.apply("en"))}, t))) AS BIGINT) AS n_stopwords,
         |       CASE WHEN length(text) > 0
         |            THEN CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS DOUBLE) / CAST(length(text) AS DOUBLE)
         |            ELSE 0.0 END AS punct_ratio,
         |       CASE WHEN len(tl) > 0
         |            THEN CAST(len(list_filter(tl, t -> list_contains(${sqlList(TextOps.stopwords.toMap.apply("en"))}, t))) AS DOUBLE) / CAST(len(tl) AS DOUBLE)
         |            ELSE 0.0 END AS stopword_ratio,
         |       CASE WHEN len(tl) > 0
         |            THEN CAST(list_sum(list_transform(tl, t -> length(t))) AS DOUBLE) / CAST(len(tl) AS DOUBLE)
         |            ELSE 0.0 END AS avg_token_len
         |FROM tk ORDER BY doc_id""".stripMargin,

    "doc_profile" -> {
      val stop = sqlList(TextOps.stopwords.toMap.apply("en"))
      val scores = TextOps.stopwords.map { case (lang, words) =>
        s"len(list_filter(list_distinct(tl), t -> list_contains(${sqlList(words)}, t))) AS s_$lang"
      }.mkString(",\n       ")
      val langs = TextOps.stopwords.map(_._1)
      val mx = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
      val cases = langs.map(l => s"WHEN s_$l = mx THEN '$l'").mkString(" ")
      s"""WITH tk AS (SELECT doc_id, text, ${toks("text")} AS tl FROM documents),
         |ex AS (SELECT doc_id, unnest(tl) AS tok FROM tk),
         |tf AS (SELECT doc_id, tok, count(*) AS c FROM ex GROUP BY doc_id, tok),
         |top AS (SELECT doc_id, max(c) AS m FROM tf GROUP BY doc_id),
         |sc AS (SELECT doc_id,
         |       $scores
         |       FROM tk),
         |m AS (SELECT *, $mx AS mx FROM sc)
         |SELECT tk.doc_id,
         |       CAST(length(tk.text) AS BIGINT) AS n_chars,
         |       CAST(len(tk.tl) AS BIGINT) AS n_tokens,
         |       CAST(len(regexp_extract_all(tk.text, '[^a-zA-Z0-9 ]')) AS BIGINT) AS n_punct,
         |       CAST(len(regexp_extract_all(tk.text, '[A-Z]')) AS BIGINT) AS n_upper,
         |       CAST(len(list_filter(tk.tl, t -> list_contains($stop, t))) AS BIGINT) AS n_stopwords,
         |       CASE WHEN length(tk.text) > 0
         |            THEN CAST(len(regexp_extract_all(tk.text, '[^a-zA-Z0-9 ]')) AS DOUBLE) / CAST(length(tk.text) AS DOUBLE)
         |            ELSE 0.0 END AS punct_ratio,
         |       CASE WHEN len(tk.tl) > 0
         |            THEN CAST(len(list_filter(tk.tl, t -> list_contains($stop, t))) AS DOUBLE) / CAST(len(tk.tl) AS DOUBLE)
         |            ELSE 0.0 END AS stopword_ratio,
         |       CASE WHEN len(tk.tl) > 0
         |            THEN CAST(list_sum(list_transform(tk.tl, t -> length(t))) AS DOUBLE) / CAST(len(tk.tl) AS DOUBLE)
         |            ELSE 0.0 END AS avg_token_len,
         |       CASE WHEN m.mx = 0 THEN 'und' $cases END AS predicted_lang,
         |       CAST(len(regexp_extract_all(lower(tk.text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_tokens_bpe,
         |       round(CASE WHEN len(tk.tl) > 0
         |             THEN CAST(top.m AS DOUBLE) / CAST(len(tk.tl) AS DOUBLE)
         |             ELSE 0.0 END, 6) AS top_token_share
         |FROM tk LEFT JOIN top USING (doc_id) JOIN m USING (doc_id)
         |ORDER BY tk.doc_id""".stripMargin
    },

    "curate_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE CAST((CAST(doc_id AS HUGEINT) * 2654435761) % 1000000 AS DOUBLE) / 1000000.0 <
        |      CASE WHEN lang = 'en' THEN 0.2 ELSE 1.0 END
        |ORDER BY doc_id""".stripMargin,

    "curate_shards" ->
      """SELECT CAST(floor(CAST((CAST(doc_id AS HUGEINT) * 2654435761) % 1000000 AS DOUBLE)
        |                  / 1000000.0 * 8) AS BIGINT) AS shard,
        |       count(*) AS n_docs, min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM documents GROUP BY 1 ORDER BY shard""".stripMargin,

    "curate_quality" ->
      s"""WITH tk AS (SELECT doc_id, text, ${toks("text")} AS tl FROM documents),
         |ex AS (SELECT doc_id, unnest(tl) AS tok FROM tk),
         |tf AS (SELECT doc_id, tok, count(*) AS c FROM ex GROUP BY doc_id, tok),
         |top AS (SELECT doc_id, max(c) AS m FROM tf GROUP BY doc_id),
         |meas AS (SELECT tk.doc_id,
         |    len(tk.tl) AS n_tokens,
         |    CASE WHEN len(tk.tl) > 0 THEN CAST(top.m AS DOUBLE) / CAST(len(tk.tl) AS DOUBLE)
         |         ELSE 0.0 END AS top_share,
         |    CASE WHEN length(tk.text) > 0
         |         THEN CAST(len(regexp_extract_all(tk.text, '[^a-zA-Z0-9 ]')) AS DOUBLE)
         |              / CAST(length(tk.text) AS DOUBLE)
         |         ELSE 0.0 END AS punct_ratio,
         |    len(list_filter(tk.tl, t -> list_contains(${sqlList(TextOps.stopwords.toMap.apply("en"))}, t))) AS n_stop
         |  FROM tk LEFT JOIN top USING (doc_id)),
         |verdict AS (SELECT doc_id,
         |    CASE WHEN n_tokens < 5 THEN 'too_short'
         |         WHEN n_tokens > 100000 THEN 'too_long'
         |         WHEN top_share > 0.3 THEN 'repetitive'
         |         WHEN punct_ratio > 0.3 THEN 'symbol_heavy'
         |         WHEN n_stop < 1 THEN 'no_stopwords'
         |         ELSE NULL END AS reason
         |  FROM meas)
         |SELECT doc_id, reason IS NULL AS keep, reason
         |FROM verdict ORDER BY doc_id""".stripMargin,

    "text_lm_score" ->
      s"""WITH tk AS (SELECT doc_id, ${toks("text")} AS tl FROM documents),
         |ex AS (SELECT doc_id, unnest(tl) AS tok FROM tk),
         |cnt AS (SELECT tok, count(*) AS c FROM ex GROUP BY tok),
         |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n_total, CAST(count(*) AS DOUBLE) AS n_vocab FROM cnt),
         |pr AS (SELECT tok, ln(CAST(c + 1 AS DOUBLE) / (n_total + n_vocab)) AS logp FROM cnt, tot)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |       round(CAST(sum(CAST(round(logp, 9) AS DECIMAL(22,12))) AS DOUBLE)
         |             / count(*), 6) AS avg_logprob
         |FROM ex JOIN pr USING (tok)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // classifier audit twin: the same stopword-argmax replay as
    // lang_id, grouped against the labeled column
    "profile_numeric" -> {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      cols.map { c =>
        s"""SELECT '$c' AS "column",
           |       count($c) AS n,
           |       CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           |       CAST(min($c) AS DOUBLE) AS min_val,
           |       CAST(max($c) AS DOUBLE) AS max_val,
           |       round(CAST(sum(CAST($c AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_val,
           |       count(DISTINCT $c) AS n_distinct
           |FROM lineitem""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
    },

    "lang_confusion" -> {
      val scores = TextOps.stopwords.map { case (lang, words) =>
        s"len(list_filter(dt, t -> list_contains(${sqlList(words)}, t))) AS s_$lang"
      }.mkString(",\n       ")
      val langs = TextOps.stopwords.map(_._1)
      val mx = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
      val cases = langs.map(l => s"WHEN s_$l = mx THEN '$l'").mkString(" ")
      s"""WITH tk AS (SELECT lang, list_distinct(${toks("text")}) AS dt FROM documents),
         |sc AS (SELECT lang,
         |       $scores
         |       FROM tk),
         |m AS (SELECT *, $mx AS mx FROM sc),
         |p AS (SELECT lang, CASE WHEN mx = 0 THEN 'und' $cases END AS predicted_lang
         |      FROM m)
         |SELECT lang, predicted_lang, count(*) AS n_docs
         |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },

    "lang_id" -> {
      val scores = TextOps.stopwords.map { case (lang, words) =>
        s"len(list_filter(dt, t -> list_contains(${sqlList(words)}, t))) AS s_$lang"
      }.mkString(",\n       ")
      val langs = TextOps.stopwords.map(_._1)
      val mx = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
      val cases = langs.map(l => s"WHEN s_$l = mx THEN '$l'").mkString(" ")
      s"""WITH tk AS (SELECT doc_id, list_distinct(${toks("text")}) AS dt FROM documents),
         |sc AS (SELECT doc_id,
         |       $scores
         |       FROM tk),
         |m AS (SELECT *, $mx AS mx FROM sc)
         |SELECT doc_id, CASE WHEN mx = 0 THEN 'und' $cases END AS predicted_lang
         |FROM m ORDER BY doc_id""".stripMargin
    },

    // ordered-list formulation so the float accumulation order matches
    // the Spark kernel's ascending-code-point sum exactly (binary UTF-8
    // string order == code-point order). Both sides union the
    // entropyProbeText row (doc_id = -1: combining sequence +
    // supplementary-plane char), pinning DuckDB's per-code-point
    // string_split segmentation inside the parity gate itself.
    // Flesch reading ease in milli-units: syllable = max(1, vowel
    // groups) per token (a vowel GROUP is a maximal [aeiouy] run —
    // regexp_extract_all counts exactly what the Spark kernel scans);
    // both divisions positive-operand truncating (// == div)
    "text_readability" ->
      s"""WITH d AS (SELECT doc_id, text, ${toks("text")} AS tl FROM documents),
         |m AS (SELECT doc_id,
         |        greatest(1, len(tl)) AS w,
         |        greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS s,
         |        greatest(1, coalesce(list_sum(list_transform(tl,
         |          t -> greatest(1, len(regexp_extract_all(t, '[aeiouy]+'))))), 0)) AS syl
         |      FROM d)
         |SELECT doc_id, CAST(w AS BIGINT) AS n_words,
         |       CAST(s AS BIGINT) AS n_sentences,
         |       CAST(syl AS BIGINT) AS n_syllables,
         |       CAST(206835 - (1015 * w) // s - (84600 * syl) // w AS BIGINT)
         |         AS flesch_milli
         |FROM m ORDER BY doc_id""".stripMargin,

    "text_entropy" ->
      s"""WITH docs AS (SELECT doc_id, text FROM documents
         |              UNION ALL SELECT CAST(-1 AS BIGINT) AS doc_id,
         |                               '$entropyProbeText' AS text),
         |ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c FROM docs),
         |cnt AS (SELECT doc_id, c, CAST(count(*) AS DOUBLE) AS n FROM ch GROUP BY 1, 2),
         |g AS (SELECT doc_id, list(n ORDER BY c) AS l, sum(n) AS t FROM cnt GROUP BY 1)
         |SELECT d.doc_id,
         |       -- + 0.0 normalizes the IEEE -0.0 a negated zero-entropy
         |       -- sum produces (single-char-class docs); Spark's kernel
         |       -- always yields +0.0 there
         |       coalesce(round(-list_sum(list_transform(g.l, n -> (n / g.t) * ln(n / g.t))), 6), 0.0) + 0.0 AS char_entropy
         |FROM docs d LEFT JOIN g USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // BM25 replay: every arithmetic input (tf, df, dl, N, Σdl) is an
    // exact integer, the double chain mirrors the Spark expression's
    // operand order and literal casts, contributions round to 9dp and
    // sum in DECIMAL, the score rounds to 6dp — bit-identical
    // cross-engine (ln within rounding tolerance, like char_entropy)
    // exact positional phrase search: zip-unnest gives (term, pos);
    // grouping on (query, doc, pos - idx) counts distinct idx — a
    // group reaching m is one occurrence; integer phrase tf ranks
    "text_search_phrase" -> phraseSql,
    // served positional index = identical counting chain over the
    // term-pruned read, so the same SQL is the oracle
    "text_search_phrase_idx" -> phraseSql,

    "text_search_bm25" ->
      s"""WITH qt AS (
         |  SELECT * FROM (VALUES
         |    (0, 'spark'), (0, 'window'), (0, 'join'),
         |    (1, 'dup'), (1, 'stream'), (1, 'batch'),
         |    (2, 'fast'), (2, 'hash'), (2, 'scan'), (2, 'merge')) AS v(query_id, term)),
         |docs AS (SELECT doc_id, ${toks("text")} AS tl FROM documents),
         |stats AS (SELECT count(*) AS n, sum(len(tl)) AS sum_dl FROM docs),
         |ex AS (SELECT doc_id, len(tl) AS dl, unnest(tl) AS term FROM docs),
         |post AS (SELECT doc_id, term, dl, count(*) AS tf FROM ex
         |         WHERE term IN (SELECT DISTINCT term FROM qt)
         |         GROUP BY doc_id, term, dl),
         |dft AS (SELECT term, count(*) AS df FROM post GROUP BY term),
         |contrib AS (
         |  SELECT qt.query_id, p.doc_id,
         |         CAST(round(
         |           ln(CAST(1.0 AS DOUBLE)
         |              + (CAST(s.n - d.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
         |                / (CAST(d.df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
         |           * (CAST(p.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1))
         |           / (CAST(p.tf AS DOUBLE)
         |              + CAST(1.2 AS DOUBLE)
         |                * (CAST(0.25 AS DOUBLE)
         |                   + CAST(0.75 AS DOUBLE) * CAST(p.dl AS DOUBLE)
         |                     / (CAST(s.sum_dl AS DOUBLE) / CAST(s.n AS DOUBLE)))), 9)
         |         AS DECIMAL(20,9)) AS c
         |  FROM post p JOIN qt USING (term) JOIN dft d USING (term) CROSS JOIN stats s),
         |scored AS (SELECT query_id, doc_id, round(CAST(sum(c) AS DOUBLE), 6) AS score
         |           FROM contrib GROUP BY query_id, doc_id),
         |top AS (SELECT query_id, doc_id, score,
         |               row_number() OVER (PARTITION BY query_id
         |                                  ORDER BY score DESC, doc_id ASC) AS rank
         |        FROM scored)
         |SELECT query_id, doc_id, score, rank FROM top
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // persisted-index BM25: the term-bucketed postings table + stats
    // serve the same scoring chain over the same corpus, so the
    // result must EQUAL text_search_bm25's dump row-for-row — the
    // ann_ivf_index equality-gate trick for the storage-layer path
    "text_search_bm25_idx" ->
      """SELECT query_id, doc_id, score, "rank"
        |FROM read_parquet('__VERIFY_OUT__/text_search_bm25/*.parquet')
        |ORDER BY query_id, "rank"""".stripMargin,

    // ingest-loop BM25: build on the first slice + append the rest
    // must lose nothing vs a full rebuild — row-for-row equality with
    // the inline full-corpus query's dump
    "text_search_bm25_incr" ->
      """SELECT query_id, doc_id, score, "rank"
        |FROM read_parquet('__VERIFY_OUT__/text_search_bm25/*.parquet')
        |ORDER BY query_id, "rank"""".stripMargin,

    // the hybrid's IVF-served dense arm: precision + ordering of the
    // returned lists, recomputed from raw embeddings (the ANN
    // arithmetic-twin gate; the fusion replay below consumes the dump)
    "text_search_hybrid_idx_dense" -> annArithmeticTwin("text_search_hybrid_idx_dense"),

    // both-arms-on-index hybrid: replays the BM25 arm at k=20 from the
    // corpus (the postings-table path is equality-gated by
    // text_search_bm25_idx), takes the IVF dense arm from its gated
    // companion dump, and replays the RRF combine
    "text_search_hybrid_idx" ->
      s"""WITH qt AS (
         |  SELECT * FROM (VALUES
         |    (0, 'spark'), (0, 'window'), (0, 'join'),
         |    (1, 'dup'), (1, 'stream'), (1, 'batch'),
         |    (2, 'fast'), (2, 'hash'), (2, 'scan'), (2, 'merge')) AS v(query_id, term)),
         |docs AS (SELECT doc_id, ${toks("text")} AS tl FROM documents),
         |stats AS (SELECT count(*) AS n, sum(len(tl)) AS sum_dl FROM docs),
         |ex AS (SELECT doc_id, len(tl) AS dl, unnest(tl) AS term FROM docs),
         |post AS (SELECT doc_id, term, dl, count(*) AS tf FROM ex
         |         WHERE term IN (SELECT DISTINCT term FROM qt)
         |         GROUP BY doc_id, term, dl),
         |dft AS (SELECT term, count(*) AS df FROM post GROUP BY term),
         |contrib AS (
         |  SELECT qt.query_id, p.doc_id,
         |         CAST(round(
         |           ln(CAST(1.0 AS DOUBLE)
         |              + (CAST(s.n - d.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
         |                / (CAST(d.df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
         |           * (CAST(p.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1))
         |           / (CAST(p.tf AS DOUBLE)
         |              + CAST(1.2 AS DOUBLE)
         |                * (CAST(0.25 AS DOUBLE)
         |                   + CAST(0.75 AS DOUBLE) * CAST(p.dl AS DOUBLE)
         |                     / (CAST(s.sum_dl AS DOUBLE) / CAST(s.n AS DOUBLE)))), 9)
         |         AS DECIMAL(20,9)) AS c
         |  FROM post p JOIN qt USING (term) JOIN dft d USING (term) CROSS JOIN stats s),
         |lex_scored AS (SELECT query_id, doc_id, round(CAST(sum(c) AS DOUBLE), 6) AS score
         |               FROM contrib GROUP BY query_id, doc_id),
         |lex AS (SELECT query_id, doc_id,
         |               row_number() OVER (PARTITION BY query_id
         |                                  ORDER BY score DESC, doc_id ASC) AS rank
         |        FROM lex_scored QUALIFY rank <= 20),
         |dense AS (SELECT query_id, neighbor_id AS doc_id, "rank" AS rank
         |          FROM read_parquet('__VERIFY_OUT__/text_search_hybrid_idx_dense/*.parquet')),
         |arms AS (SELECT * FROM lex UNION ALL SELECT * FROM dense),
         |fused AS (
         |  SELECT query_id, doc_id,
         |         round(CAST(sum(CAST(round(CAST(1.0 AS DOUBLE) / (60 + rank), 9)
         |                            AS DECIMAL(20,9))) AS DOUBLE), 6) AS rrf_score,
         |         count(*) AS n_arms
         |  FROM arms GROUP BY query_id, doc_id),
         |top AS (SELECT query_id, doc_id, rrf_score, n_arms,
         |               row_number() OVER (PARTITION BY query_id
         |                                  ORDER BY rrf_score DESC, doc_id ASC) AS rank
         |        FROM fused)
         |SELECT query_id, doc_id, rrf_score, n_arms, rank FROM top
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // the filtered hybrid's dense arm: exact cosine + ordering of the
    // returned pairs, with the lang predicate folded into the corpus
    // join through the shared doc_id/vec_id id space — a returned
    // vector whose document is not English drops from the twin and
    // fails row parity
    "text_search_hybrid_filtered_dense" -> annArithmeticTwin(
      "text_search_hybrid_filtered_dense",
      " AND c.vec_id IN (SELECT doc_id FROM documents WHERE lang = 'en')"),

    // metadata-filtered hybrid: replays the lexical arm as BM25 over
    // the en SUB-CORPUS (slice N/avgdl/df — the pre-filter semantics
    // the per-lang stats rows serve), takes the lang-filtered dense
    // arm from its gated companion dump, and replays the RRF combine
    "text_search_hybrid_filtered" ->
      s"""WITH qt AS (
         |  SELECT * FROM (VALUES
         |    (0, 'spark'), (0, 'window'), (0, 'join'),
         |    (1, 'dup'), (1, 'stream'), (1, 'batch'),
         |    (2, 'fast'), (2, 'hash'), (2, 'scan'), (2, 'merge')) AS v(query_id, term)),
         |docs AS (SELECT doc_id, ${toks("text")} AS tl FROM documents
         |         WHERE lang = 'en'),
         |stats AS (SELECT count(*) AS n, sum(len(tl)) AS sum_dl FROM docs),
         |ex AS (SELECT doc_id, len(tl) AS dl, unnest(tl) AS term FROM docs),
         |post AS (SELECT doc_id, term, dl, count(*) AS tf FROM ex
         |         WHERE term IN (SELECT DISTINCT term FROM qt)
         |         GROUP BY doc_id, term, dl),
         |dft AS (SELECT term, count(*) AS df FROM post GROUP BY term),
         |contrib AS (
         |  SELECT qt.query_id, p.doc_id,
         |         CAST(round(
         |           ln(CAST(1.0 AS DOUBLE)
         |              + (CAST(s.n - d.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
         |                / (CAST(d.df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
         |           * (CAST(p.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1))
         |           / (CAST(p.tf AS DOUBLE)
         |              + CAST(1.2 AS DOUBLE)
         |                * (CAST(0.25 AS DOUBLE)
         |                   + CAST(0.75 AS DOUBLE) * CAST(p.dl AS DOUBLE)
         |                     / (CAST(s.sum_dl AS DOUBLE) / CAST(s.n AS DOUBLE)))), 9)
         |         AS DECIMAL(20,9)) AS c
         |  FROM post p JOIN qt USING (term) JOIN dft d USING (term) CROSS JOIN stats s),
         |lex_scored AS (SELECT query_id, doc_id, round(CAST(sum(c) AS DOUBLE), 6) AS score
         |               FROM contrib GROUP BY query_id, doc_id),
         |lex AS (SELECT query_id, doc_id,
         |               row_number() OVER (PARTITION BY query_id
         |                                  ORDER BY score DESC, doc_id ASC) AS rank
         |        FROM lex_scored QUALIFY rank <= 20),
         |dense AS (SELECT query_id, neighbor_id AS doc_id, "rank" AS rank
         |          FROM read_parquet('__VERIFY_OUT__/text_search_hybrid_filtered_dense/*.parquet')),
         |arms AS (SELECT * FROM lex UNION ALL SELECT * FROM dense),
         |fused AS (
         |  SELECT query_id, doc_id,
         |         round(CAST(sum(CAST(round(CAST(1.0 AS DOUBLE) / (60 + rank), 9)
         |                            AS DECIMAL(20,9))) AS DOUBLE), 6) AS rrf_score,
         |         count(*) AS n_arms
         |  FROM arms GROUP BY query_id, doc_id),
         |top AS (SELECT query_id, doc_id, rrf_score, n_arms,
         |               row_number() OVER (PARTITION BY query_id
         |                                  ORDER BY rrf_score DESC, doc_id ASC) AS rank
         |        FROM fused)
         |SELECT query_id, doc_id, rrf_score, n_arms, rank FROM top
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // hybrid retrieval twin: replays BOTH arms (BM25 at k=20, exact
    // cosine top-20 from the query batch's embeddings) and the RRF
    // combine — contributions 1/(60+rank) rounded to 9dp, DECIMAL
    // accumulated, fused score rounded to 6dp, ties on doc id
    "text_search_hybrid" ->
      s"""WITH qt AS (
         |  SELECT * FROM (VALUES
         |    (0, 'spark'), (0, 'window'), (0, 'join'),
         |    (1, 'dup'), (1, 'stream'), (1, 'batch'),
         |    (2, 'fast'), (2, 'hash'), (2, 'scan'), (2, 'merge')) AS v(query_id, term)),
         |docs AS (SELECT doc_id, ${toks("text")} AS tl FROM documents),
         |stats AS (SELECT count(*) AS n, sum(len(tl)) AS sum_dl FROM docs),
         |ex AS (SELECT doc_id, len(tl) AS dl, unnest(tl) AS term FROM docs),
         |post AS (SELECT doc_id, term, dl, count(*) AS tf FROM ex
         |         WHERE term IN (SELECT DISTINCT term FROM qt)
         |         GROUP BY doc_id, term, dl),
         |dft AS (SELECT term, count(*) AS df FROM post GROUP BY term),
         |contrib AS (
         |  SELECT qt.query_id, p.doc_id,
         |         CAST(round(
         |           ln(CAST(1.0 AS DOUBLE)
         |              + (CAST(s.n - d.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
         |                / (CAST(d.df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
         |           * (CAST(p.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1))
         |           / (CAST(p.tf AS DOUBLE)
         |              + CAST(1.2 AS DOUBLE)
         |                * (CAST(0.25 AS DOUBLE)
         |                   + CAST(0.75 AS DOUBLE) * CAST(p.dl AS DOUBLE)
         |                     / (CAST(s.sum_dl AS DOUBLE) / CAST(s.n AS DOUBLE)))), 9)
         |         AS DECIMAL(20,9)) AS c
         |  FROM post p JOIN qt USING (term) JOIN dft d USING (term) CROSS JOIN stats s),
         |lex_scored AS (SELECT query_id, doc_id, round(CAST(sum(c) AS DOUBLE), 6) AS score
         |               FROM contrib GROUP BY query_id, doc_id),
         |lex AS (SELECT query_id, doc_id,
         |               row_number() OVER (PARTITION BY query_id
         |                                  ORDER BY score DESC, doc_id ASC) AS rank
         |        FROM lex_scored QUALIFY rank <= 20),
         |dense AS (
         |  SELECT query_id, doc_id, rank FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
         |           row_number() OVER (PARTITION BY q.vec_id
         |             ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
         |                                             CAST(c.embedding AS DOUBLE[])) DESC,
         |                      c.vec_id ASC) AS rank
         |    FROM embeddings q JOIN embeddings c
         |      ON q.vec_id < 3 AND c.vec_id <> q.vec_id)
         |  WHERE rank <= 20),
         |arms AS (SELECT * FROM lex UNION ALL SELECT * FROM dense),
         |fused AS (
         |  SELECT query_id, doc_id,
         |         round(CAST(sum(CAST(round(CAST(1.0 AS DOUBLE) / (60 + rank), 9)
         |                            AS DECIMAL(20,9))) AS DOUBLE), 6) AS rrf_score,
         |         count(*) AS n_arms
         |  FROM arms GROUP BY query_id, doc_id),
         |top AS (SELECT query_id, doc_id, rrf_score, n_arms,
         |               row_number() OVER (PARTITION BY query_id
         |                                  ORDER BY rrf_score DESC, doc_id ASC) AS rank
         |        FROM fused)
         |SELECT query_id, doc_id, rrf_score, n_arms, rank FROM top
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // Naive Bayes twin: replays closed-form training (per-class token
    // counts, totals, priors, |V|), add-1 smoothed 9dp-decimal
    // log-likelihood accumulation, the label-asc argmax, and the
    // prior-argmax fallback for all-OOV documents
    "lang_id_nb" -> (langNbCtes + "\n" + langNbVerdictSelect +
      "\nORDER BY id"),

    "lang_id_nb_gate" -> {
      // heuristic replay (the lang_id twin's shape) over the SAME
      // held-out fixture split, next to the NB diagonal
      val scores = graft.text.TextOps.stopwords.map { case (lang, words) =>
        s"len(list_filter(list_distinct(${toks("text")}), " +
          s"t -> list_contains(${sqlList(words)}, t))) AS s_$lang"
      }.mkString(",\n       ")
      val langs = graft.text.TextOps.stopwords.map(_._1)
      val mx = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
      val cases = langs.map(l => s"WHEN s_$l = mx THEN '$l'").mkString(" ")
      langNbCtes +
        s""",
           |hsc AS (SELECT doc_id, lang,
           |       $scores
           |       FROM te),
           |hm AS (SELECT *, $mx AS mx FROM hsc),
           |hd AS (SELECT CAST(coalesce(sum(CASE WHEN
           |         (CASE WHEN mx = 0 THEN 'und' $cases END) = lang
           |         THEN 1 ELSE 0 END), 0) AS BIGINT) AS heuristic_diag
           |       FROM hm),
           |nbv AS ($langNbVerdictSelect),
           |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_test,
           |              CAST(coalesce(sum(correct), 0) AS BIGINT) AS nb_diag
           |       FROM nbv)
           |SELECT nd.n_test, nd.nb_diag, hd.heuristic_diag,
           |       nd.nb_diag > hd.heuristic_diag AS nb_beats_heuristic
           |FROM nd CROSS JOIN hd""".stripMargin
    },

    "text_classify_nb" ->
      s"""WITH tr AS (SELECT doc_id, lang, ${toks("text")} AS tl FROM documents
         |            WHERE doc_id % 5 <> 0),
         |te AS (SELECT doc_id, lang, ${toks("text")} AS tl FROM documents
         |       WHERE doc_id % 5 = 0),
         |trtok AS (SELECT lang, unnest(tl) AS tok FROM tr),
         |cnt AS (SELECT lang, tok, count(*) AS cnt FROM trtok GROUP BY lang, tok),
         |tot AS (SELECT lang, sum(cnt) AS tot FROM cnt GROUP BY lang),
         |vs AS (SELECT count(DISTINCT tok) AS v FROM cnt),
         |pri AS (SELECT lang, count(*) AS n_docs FROM tr GROUP BY lang),
         |nall AS (SELECT count(*) AS n_all FROM tr),
         |classes AS (
         |  -- rooted at priors (LEFT JOIN to token totals, tot=0 when
         |  -- absent) mirroring Classify.naiveBayes: an all-empty-token
         |  -- class still scores via smoothing and keeps its prior
         |  SELECT p.lang AS cl, coalesce(t.tot, 0) AS tot,
         |         CAST(round(ln(CAST(p.n_docs AS DOUBLE) / CAST(a.n_all AS DOUBLE)), 9)
         |              AS DECIMAL(20,9)) AS prior_c
         |  FROM pri p LEFT JOIN tot t ON t.lang = p.lang CROSS JOIN nall a),
         |tetf AS (
         |  SELECT doc_id, tok, count(*) AS tf
         |  FROM (SELECT doc_id, unnest(tl) AS tok FROM te)
         |  WHERE tok IN (SELECT DISTINCT tok FROM cnt)
         |  GROUP BY doc_id, tok),
         |contrib AS (
         |  SELECT f.doc_id, k.cl,
         |         CAST(round(f.tf * ln((CAST(coalesce(c.cnt, 0) AS DOUBLE) + 1)
         |                              / CAST(k.tot + v.v AS DOUBLE)), 9)
         |              AS DECIMAL(20,9)) AS c
         |  FROM tetf f CROSS JOIN classes k
         |  LEFT JOIN cnt c ON c.lang = k.cl AND c.tok = f.tok
         |  CROSS JOIN vs v),
         |scored AS (
         |  SELECT s.doc_id, s.cl, s.ll + k.prior_c AS score
         |  FROM (SELECT doc_id, cl, sum(c) AS ll FROM contrib GROUP BY doc_id, cl) s
         |  JOIN classes k ON k.cl = s.cl),
         |pred AS (
         |  SELECT doc_id, cl AS predicted FROM (
         |    SELECT doc_id, cl,
         |           row_number() OVER (PARTITION BY doc_id
         |                              ORDER BY score DESC, cl ASC) AS rk
         |    FROM scored) WHERE rk = 1),
         |fb AS (SELECT cl AS fallback FROM classes
         |       ORDER BY prior_c DESC, cl ASC LIMIT 1)
         |SELECT e.doc_id AS id, e.lang AS label,
         |       coalesce(p.predicted, f.fallback) AS predicted,
         |       CASE WHEN coalesce(p.predicted, f.fallback) = e.lang
         |            THEN 1 ELSE 0 END AS correct
         |FROM te e LEFT JOIN pred p ON p.doc_id = e.doc_id CROSS JOIN fb f
         |ORDER BY id""".stripMargin,

    // classifier-driven curation: full replay of NB training on the
    // seed slice (token-derived boilerplate label), corpus-wide
    // scoring with smoothing + decimal accumulation, argmax +
    // prior-argmax fallback, and the predicted-clean keep filter
    "curate_classify_filter" ->
      s"""WITH lab AS (SELECT doc_id, lang, ${toks("text")} AS tl,
         |              CASE WHEN len(list_filter(${toks("text")}, x -> x = 'dup')) > 0
         |                   THEN 'boiler' ELSE 'clean' END AS y
         |            FROM documents),
         |tr AS (SELECT * FROM lab WHERE doc_id % 5 <> 0),
         |trtok AS (SELECT y, unnest(tl) AS tok FROM tr),
         |cnt AS (SELECT y, tok, count(*) AS cnt FROM trtok GROUP BY y, tok),
         |tot AS (SELECT y, sum(cnt) AS tot FROM cnt GROUP BY y),
         |vs AS (SELECT count(DISTINCT tok) AS v FROM cnt),
         |pri AS (SELECT y, count(*) AS n_docs FROM tr GROUP BY y),
         |nall AS (SELECT count(*) AS n_all FROM tr),
         |classes AS (
         |  SELECT p.y AS cl, coalesce(t.tot, 0) AS tot,
         |         CAST(round(ln(CAST(p.n_docs AS DOUBLE) / CAST(a.n_all AS DOUBLE)), 9)
         |              AS DECIMAL(20,9)) AS prior_c
         |  FROM pri p LEFT JOIN tot t ON t.y = p.y CROSS JOIN nall a),
         |tetf AS (
         |  SELECT doc_id, tok, count(*) AS tf
         |  FROM (SELECT doc_id, unnest(tl) AS tok FROM lab)
         |  WHERE tok IN (SELECT DISTINCT tok FROM cnt)
         |  GROUP BY doc_id, tok),
         |contrib AS (
         |  SELECT f.doc_id, k.cl,
         |         CAST(round(f.tf * ln((CAST(coalesce(c.cnt, 0) AS DOUBLE) + 1)
         |                              / CAST(k.tot + v.v AS DOUBLE)), 9)
         |              AS DECIMAL(20,9)) AS c
         |  FROM tetf f CROSS JOIN classes k
         |  LEFT JOIN cnt c ON c.y = k.cl AND c.tok = f.tok
         |  CROSS JOIN vs v),
         |scored AS (
         |  SELECT s.doc_id, s.cl, s.ll + k.prior_c AS score
         |  FROM (SELECT doc_id, cl, sum(c) AS ll FROM contrib GROUP BY doc_id, cl) s
         |  JOIN classes k ON k.cl = s.cl),
         |pred AS (
         |  SELECT doc_id, cl AS predicted FROM (
         |    SELECT doc_id, cl,
         |           row_number() OVER (PARTITION BY doc_id
         |                              ORDER BY score DESC, cl ASC) AS rk
         |    FROM scored) WHERE rk = 1),
         |fb AS (SELECT cl AS fallback FROM classes
         |       ORDER BY prior_c DESC, cl ASC LIMIT 1)
         |SELECT l.doc_id, l.lang
         |FROM lab l LEFT JOIN pred p ON p.doc_id = l.doc_id CROSS JOIN fb f
         |WHERE coalesce(p.predicted, f.fallback) = 'clean'
         |ORDER BY l.doc_id""".stripMargin,

    // NB learning-collapse gate: n_test and n_boiler replay the split
    // and the token-derived labeling; the two booleans are literal
    // TRUE, so a Spark-side accuracy/recall collapse flips the row and
    // fails the hash match (the ann_lsh_recall floor pattern)
    "text_classify_nb_gate" ->
      s"""WITH te AS (SELECT doc_id, ${toks("text")} AS tl FROM documents
         |            WHERE doc_id % 5 = 0)
         |SELECT CAST(count(*) AS BIGINT) AS n_test,
         |       CAST(count(*) FILTER (len(list_filter(tl, x -> x = 'dup')) > 0)
         |            AS BIGINT) AS n_boiler,
         |       true AS acc_ok, true AS recall_ok
         |FROM te""".stripMargin,

    "token_count" ->
      """SELECT doc_id,
        |       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_tokens_bpe
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_scrub" ->
      s"""WITH tk AS (SELECT doc_id, text, ${toks("text")} AS tl FROM documents),
         |ex AS (SELECT doc_id, unnest(tl) AS tok FROM tk),
         |tf AS (SELECT doc_id, tok, count(*) AS c FROM ex GROUP BY doc_id, tok),
         |top AS (SELECT doc_id, max(c) AS m FROM tf GROUP BY doc_id)
         |SELECT tk.doc_id,
         |       regexp_replace(regexp_replace(tk.text,
         |         '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z][a-zA-Z]+', '<EMAIL>', 'g'),
         |         'https?://[^ ]+', '<URL>', 'g') AS clean_text,
         |       round(CASE WHEN len(tk.tl) > 0
         |             THEN CAST(top.m AS DOUBLE) / CAST(len(tk.tl) AS DOUBLE)
         |             ELSE 0.0 END, 6) AS top_token_share
         |FROM tk LEFT JOIN top USING (doc_id)
         |ORDER BY tk.doc_id""".stripMargin,

    // full PII chain replay: same deterministic suffix injection and
    // the same four-pattern regexp_replace order (email, url, ip,
    // phone; all RE2-safe, 'g' to match Spark's replace-all)
    "text_scrub_pii" ->
      """WITH aug AS (SELECT doc_id,
        |  text || printf(' call 2%02d-555-%04d or visit 10.0.%d.%d for help',
        |                 doc_id % 100, (doc_id * 7) % 10000,
        |                 doc_id % 256, (doc_id * 3) % 256) AS t
        |  FROM documents)
        |SELECT doc_id,
        |       regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
        |         '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z][a-zA-Z]+', '<EMAIL>', 'g'),
        |         'https?://[^ ]+', '<URL>', 'g'),
        |         '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
        |         '\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b', '<PHONE>', 'g') AS clean_text
        |FROM aug ORDER BY doc_id""".stripMargin,

    "text_bigram_lm" ->
      s"""WITH tk AS (SELECT doc_id, ${toks("text")} AS tl FROM documents),
         |ex AS (SELECT doc_id, unnest(tl) AS tok FROM tk),
         |cu AS (SELECT tok, count(*) AS c1 FROM ex GROUP BY tok),
         |v AS (SELECT CAST(count(*) AS DOUBLE) AS n_vocab FROM cu),
         |bg AS (SELECT doc_id, tl[i] || ' ' || tl[i + 1] AS bg
         |       FROM (SELECT doc_id, tl, unnest(generate_series(1, len(tl) - 1)) AS i
         |             FROM tk WHERE len(tl) >= 2)),
         |cb AS (SELECT bg, count(*) AS c FROM bg GROUP BY bg),
         |pr AS (SELECT bg, ln(CAST(c + 1 AS DOUBLE) / (c1 + n_vocab)) AS logp
         |       FROM cb JOIN cu ON split_part(bg, ' ', 1) = tok, v)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |       round(CAST(sum(CAST(round(logp, 9) AS DECIMAL(22,12))) AS DOUBLE)
         |             / count(*), 6) AS avg_logprob
         |FROM bg JOIN pr USING (bg)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // interpolated Kneser-Ney trigram LM: same split/count tables as
    // Curate.knTrigramLogProb, formula term-for-term in the same
    // operation order (D = 0.75 exact), §5 round-9/decimal-sum policy
    "text_kn_lm" ->
      s"""WITH tk AS (SELECT doc_id, ${toks("text")} AS tl FROM documents),
         |tri AS (SELECT doc_id, tl[i] || ' ' || tl[i+1] || ' ' || tl[i+2] AS tg
         |        FROM (SELECT doc_id, tl, unnest(generate_series(1, len(tl) - 2)) AS i
         |              FROM tk WHERE len(tl) >= 3)),
         |bgt AS (SELECT DISTINCT tl[i] || ' ' || tl[i+1] AS bg
         |        FROM (SELECT tl, unnest(generate_series(1, len(tl) - 1)) AS i
         |              FROM tk WHERE len(tl) >= 2)),
         |parts AS (SELECT tg, count(*) AS c3,
         |                 split_part(tg, ' ', 1) || ' ' || split_part(tg, ' ', 2) AS w12,
         |                 split_part(tg, ' ', 2) AS w2,
         |                 split_part(tg, ' ', 2) || ' ' || split_part(tg, ' ', 3) AS w23,
         |                 split_part(tg, ' ', 3) AS w3
         |          FROM tri GROUP BY tg),
         |hi AS (SELECT w12, sum(c3) AS c2ctx, count(*) AS n1_hi FROM parts GROUP BY w12),
         |mid1 AS (SELECT w23, count(*) AS ncont FROM parts GROUP BY w23),
         |mid2 AS (SELECT split_part(w23, ' ', 1) AS w2, sum(ncont) AS ncm,
         |                count(*) AS n1_mid
         |         FROM mid1 GROUP BY 1),
         |uni AS (SELECT split_part(bg, ' ', 2) AS w3, count(*) AS nbg_pre
         |        FROM bgt GROUP BY 1),
         |tot AS (SELECT count(*) AS nbg_total FROM bgt),
         |pr AS (SELECT tg,
         |         ln(greatest(CAST(c3 AS DOUBLE) - 0.75, 0.0) / CAST(c2ctx AS DOUBLE)
         |            + (0.75 * CAST(n1_hi AS DOUBLE) / CAST(c2ctx AS DOUBLE)) *
         |              (greatest(CAST(ncont AS DOUBLE) - 0.75, 0.0) / CAST(ncm AS DOUBLE)
         |               + (0.75 * CAST(n1_mid AS DOUBLE) / CAST(ncm AS DOUBLE)) *
         |                 (CAST(nbg_pre AS DOUBLE) / CAST(nbg_total AS DOUBLE)))) AS logp
         |       FROM parts JOIN hi USING (w12) JOIN mid1 USING (w23)
         |            JOIN mid2 USING (w2) JOIN uni USING (w3), tot)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
         |       round(CAST(sum(CAST(round(logp, 9) AS DECIMAL(22,12))) AS DOUBLE)
         |             / count(*), 6) AS avg_logprob
         |FROM tri JOIN pr USING (tg)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "events_outliers" ->
      """WITH cuts AS (SELECT event_type,
        |                     round(quantile_cont(round(value, 2), 0.99), 6) AS cutoff
        |              FROM events GROUP BY event_type)
        |SELECT event_id, event_type, value, cutoff
        |FROM events JOIN cuts USING (event_type)
        |WHERE value > cutoff
        |ORDER BY event_id""".stripMargin,

    "events_window_agg" ->
      """SELECT epoch_us(ts) - epoch_us(ts) % 3600000000 AS hour_start_us, event_type,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
        |       count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // sliding windows: every event lands in exactly window/slide = 4
    // epoch-aligned windows — replayed as an unnest over k
    "events_sliding" ->
      """WITH e AS (SELECT epoch_us(ts) AS us, event_type, user_id,
        |                  CAST(value AS DECIMAL(18,6)) AS v FROM events),
        |x AS (SELECT us - us % 900000000 - CAST(k AS BIGINT) * 900000000 AS window_start_us,
        |             event_type, user_id, v
        |      FROM e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k))
        |SELECT window_start_us, event_type,
        |       count(*) AS n_events,
        |       CAST(sum(v) AS DOUBLE) AS sum_value,
        |       count(DISTINCT user_id) AS n_users
        |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // greedy earliest-completion funnel replay: stage i+1 is the first
    // event of its type strictly after stage i within the 48-hour gap
    "events_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |s1 AS (SELECT user_id, min(us) AS t1_us FROM e
        |       WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(us) AS t2_us FROM e JOIN s1 USING (user_id)
        |       WHERE event_type = 'click' AND us > t1_us
        |         AND us <= t1_us + 172800000000 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(us) AS t3_us FROM e JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND us > t2_us
        |         AND us <= t2_us + 172800000000 GROUP BY 1)
        |SELECT s1.user_id, t1_us, t2_us, t3_us,
        |       CAST(1 + CASE WHEN t2_us IS NULL THEN 0 ELSE 1 END
        |              + CASE WHEN t3_us IS NULL THEN 0 ELSE 1 END AS INTEGER) AS steps_completed
        |FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
        |        LEFT JOIN s3 ON s1.user_id = s3.user_id
        |ORDER BY s1.user_id""".stripMargin,

    // cohort-by-first-event-day retention replay
    // rolling distinct replayed as the same fan-out: each (user, day)
    // serves the windowDays window-end days at or after it
    "events_rolling_users" ->
      """WITH ud AS (SELECT DISTINCT epoch_us(ts) - epoch_us(ts) % 86400000000 AS day_us,
        |                   user_id FROM events),
        |dau AS (SELECT day_us, count(DISTINCT user_id) AS dau FROM ud GROUP BY 1),
        |fan AS (SELECT day_us + CAST(k AS BIGINT) * 86400000000 AS day_us, user_id
        |        FROM ud CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS k)),
        |wau AS (SELECT day_us, count(DISTINCT user_id) AS wau FROM fan GROUP BY 1)
        |SELECT dau.day_us, dau.dau, wau.wau
        |FROM dau JOIN wau ON dau.day_us = wau.day_us
        |ORDER BY dau.day_us""".stripMargin,

    // sketch gate: exact dau/wau are compared, the ok booleans are
    // literal-true (the profile_distinct_sketch convention)
    "events_rolling_users_approx" ->
      """WITH ud AS (SELECT DISTINCT epoch_us(ts) - epoch_us(ts) % 86400000000 AS day_us,
        |                   user_id FROM events),
        |dau AS (SELECT day_us, count(DISTINCT user_id) AS dau FROM ud GROUP BY 1),
        |fan AS (SELECT day_us + CAST(k AS BIGINT) * 86400000000 AS day_us, user_id
        |        FROM ud CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS k)),
        |wau AS (SELECT day_us, count(DISTINCT user_id) AS wau FROM fan GROUP BY 1)
        |SELECT dau.day_us, dau.dau, wau.wau, TRUE AS dau_ok, TRUE AS wau_ok
        |FROM dau JOIN wau ON dau.day_us = wau.day_us
        |ORDER BY dau.day_us""".stripMargin,

    "events_retention" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |c AS (SELECT user_id,
        |             min(us) - min(us) % 86400000000 AS cohort_period_us
        |      FROM e GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, us - us % 86400000000 AS period_us FROM e),
        |j AS (SELECT a.user_id, cohort_period_us,
        |             CAST((period_us - cohort_period_us) // 86400000000 AS INTEGER) AS period_offset
        |      FROM a JOIN c ON a.user_id = c.user_id)
        |SELECT cohort_period_us, period_offset, count(*) AS n_users
        |FROM j WHERE period_offset BETWEEN 0 AND 30
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // disorder-audit twin: same injected arrival mixer, running
    // event-time max per (type, user) stream in arrival order, exact
    // integer lateness aggregates
    "events_late_arrivals" ->
      """WITH e AS (SELECT event_type, user_id,
        |                  CAST((CAST(event_id AS HUGEINT) * 2654435761) % 1000000007 AS BIGINT) AS arrival,
        |                  epoch_us(ts) AS us FROM events),
        |m AS (SELECT *, max(us) OVER (PARTITION BY event_type, user_id
        |        ORDER BY arrival ASC, us ASC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm FROM e),
        |x AS (SELECT event_type, user_id,
        |             CASE WHEN pm IS NOT NULL AND pm > us THEN 1 ELSE 0 END AS late,
        |             CASE WHEN pm IS NOT NULL AND pm > us THEN pm - us ELSE 0 END AS lat
        |      FROM m)
        |SELECT event_type,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |       CAST(sum(late) AS BIGINT) AS late_events,
        |       CAST(count(DISTINCT CASE WHEN late = 1 THEN user_id END) AS BIGINT) AS late_users,
        |       CAST(sum(lat) AS BIGINT) AS total_late_us,
        |       CAST(max(lat) AS BIGINT) AS max_late_us
        |FROM x GROUP BY event_type ORDER BY event_type""".stripMargin,

    "events_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |l AS (SELECT *, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev FROM e),
        |f AS (SELECT *, CASE WHEN prev IS NULL OR ts_us - prev > 1800000000 THEN 1 ELSE 0 END AS new_session FROM l),
        |s AS (SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                                       ROWS UNBOUNDED PRECEDING) AS session_no FROM f)
        |SELECT user_id, min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
        |       count(*) AS n_events, count(DISTINCT event_type) AS n_types
        |FROM s GROUP BY user_id, session_no ORDER BY user_id, session_start_us""".stripMargin,

    // the Spark side BUILDS real PNG/JPEG/GIF header bytes from
    // doc-derived dimensions and PARSES them back with the pure-JVM
    // header decoder; the oracle recomputes the expected metadata
    // arithmetically (blob sizes are the fixed per-format header
    // lengths: PNG sig+IHDR = 33, JPEG SOI+APP0+SOF0+EOI = 41, GIF
    // header+screen descriptor = 13) — a parser or builder bug breaks
    // the hash match
    // EXIF twins (r19): closed-form replay of the fixture parameters —
    // byte size (59 plain / 173 with the GPS IFD), orientation, and
    // exact micro-degrees with per-term truncating division matching
    // the walker's integer arithmetic (deg/1, min/1, sec/100 rationals)
    "multimodal_exif" ->
      """SELECT doc_id AS id,
        |       CAST(CASE WHEN doc_id % 3 = 0 THEN 173 ELSE 59 END AS BIGINT) AS n_bytes,
        |       CAST(doc_id % 8 + 1 AS INTEGER) AS orientation,
        |       doc_id % 3 = 0 AS has_gps,
        |       CASE WHEN doc_id % 3 = 0 THEN
        |         (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE -1 END) *
        |         ((doc_id % 90) * 1000000 + ((doc_id % 60) * 1000000) // 60
        |          + ((doc_id % 6000) * 1000000) // 360000) END AS gps_lat_micro,
        |       CASE WHEN doc_id % 3 = 0 THEN
        |         (CASE WHEN doc_id % 4 < 2 THEN 1 ELSE -1 END) *
        |         ((doc_id % 180) * 1000000 + ((doc_id * 7 % 60) * 1000000) // 60
        |          + ((doc_id * 13 % 6000) * 1000000) // 360000) END AS gps_lon_micro
        |FROM documents ORDER BY id""".stripMargin,

    "multimodal_exif_scrub" ->
      """SELECT doc_id AS id, doc_id % 3 = 0 AS had_gps,
        |       false AS gps_after_scrub,
        |       true AS orientation_preserved,
        |       true AS length_preserved
        |FROM documents ORDER BY id""".stripMargin,

    // orientation-apply twin: replay the inverse index mapping over
    // the PNG fixture's closed-form samples — the position-weighted
    // checksum pins every sample to its upright position
    "multimodal_orient" ->
      """WITH d AS (SELECT doc_id,
        |                  CAST(doc_id % 16 + 1 AS INTEGER) AS w,
        |                  CAST(doc_id % 12 + 1 AS INTEGER) AS h,
        |                  CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS INTEGER) AS c,
        |                  CAST(doc_id % 8 + 1 AS INTEGER) AS o
        |           FROM documents),
        |dims AS (SELECT *, CASE WHEN o >= 5 THEN h ELSE w END AS ow,
        |                   CASE WHEN o >= 5 THEN w ELSE h END AS oh FROM d),
        |s AS (SELECT doc_id, w, h, c, o, ow, oh,
        |             unnest(generate_series(0, ow * oh * c - 1)) AS j
        |      FROM dims),
        |m AS (SELECT doc_id, w, h, c, o, ow, oh, j,
        |             j % c AS ch, (j // c) % ow AS x, (j // c) // ow AS y
        |      FROM s),
        |src AS (SELECT doc_id, w, c, o, ow, oh, j, ch,
        |               CASE o WHEN 2 THEN w - 1 - x WHEN 3 THEN w - 1 - x
        |                      WHEN 4 THEN x WHEN 5 THEN y WHEN 6 THEN y
        |                      WHEN 7 THEN w - 1 - y WHEN 8 THEN w - 1 - y
        |                      ELSE x END AS sx,
        |               CASE o WHEN 2 THEN y WHEN 3 THEN h - 1 - y
        |                      WHEN 4 THEN h - 1 - y WHEN 5 THEN x
        |                      WHEN 6 THEN h - 1 - x WHEN 7 THEN h - 1 - x
        |                      WHEN 8 THEN x ELSE y END AS sy
        |        FROM m),
        |v AS (SELECT doc_id, o, ow, oh, c, j,
        |             (((sy * w + sx) * c + ch) * 31 + doc_id) % 256 AS val
        |      FROM src)
        |SELECT doc_id AS id, o AS orientation, ow AS out_w, oh AS out_h,
        |       c AS channels, CAST(sum(val) AS BIGINT) AS sum_val,
        |       CAST(sum(val * (j + 1)) AS BIGINT) AS checksum
        |FROM v GROUP BY 1, 2, 3, 4, 5 ORDER BY id""".stripMargin,

    "multimodal_meta" ->
      """SELECT doc_id,
        |       CAST(CASE doc_id % 3 WHEN 0 THEN 33 WHEN 1 THEN 41 ELSE 13 END AS BIGINT) AS n_bytes,
        |       CAST(doc_id % 640 + 1 AS INTEGER) AS width,
        |       CAST(doc_id % 480 + 1 AS INTEGER) AS height,
        |       CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'gif' END AS format
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the Spark side ENCODES a real PNG per document (deflate + cycling
    // scanline filters) and DECODES it back with the pure-JVM pixel
    // codec (Inflater + unfilter); sample values are the closed form
    // (s*31 + doc_id) % 256 over the flat sample index, so this twin
    // recomputes every aggregate arithmetically with no codec at all —
    // a compression, filter, or accumulation bug breaks the hash match.
    // Integer sums keep the parity exact; the one float (mean) is a
    // single division of two exact integers, rounded identically.
    "multimodal_video" ->
      """WITH d AS (SELECT doc_id,
        |                  CAST(doc_id % 6 + 2 AS INTEGER) AS width,
        |                  CAST(doc_id % 4 + 2 AS INTEGER) AS height,
        |                  CAST(doc_id % 5 + 2 AS INTEGER) AS nf
        |           FROM documents),
        |f AS (SELECT doc_id, width, height,
        |             unnest(generate_series(0, nf - 1)) AS frame_no FROM d),
        |sf AS (SELECT doc_id, width, height, frame_no,
        |              unnest(generate_series(0, width * height * 3 - 1)) AS s
        |       FROM f WHERE frame_no % 2 = 0),
        |v AS (SELECT doc_id, width, height, frame_no,
        |             (s * 31 + frame_no * 7 + doc_id) % 256 AS val FROM sf)
        |SELECT doc_id, CAST(frame_no AS INTEGER) AS frame_no, width, height,
        |       CAST(count(*) AS BIGINT) AS n_samples,
        |       CAST(sum(val) AS BIGINT) AS sum_val,
        |       CAST(sum(val * val) AS BIGINT) AS sum_sq,
        |       round(CAST(sum(val) AS DOUBLE) / count(*), 6) AS mean_val
        |FROM v GROUP BY 1, 2, 3, 4
        |ORDER BY doc_id, frame_no""".stripMargin,

    // audio-fingerprint twin: replays the proportional time binning
    // (bin = frame * 4 // nFrames) and the count/sum/energy aggregates
    // from the closed-form waveform, codec-free
    "multimodal_audio_fp" ->
      """WITH d AS (SELECT doc_id,
        |                  CAST(doc_id % 2 + 1 AS INTEGER) AS ch,
        |                  CAST(doc_id % 200 + 20 AS INTEGER) AS nf
        |           FROM documents),
        |s AS (SELECT doc_id, ch, nf,
        |             unnest(generate_series(0, nf * ch - 1)) AS i FROM d),
        |v AS (SELECT doc_id, ch,
        |             CAST((i // ch) * 4 // nf AS INTEGER) AS bin,
        |             (i * 37 + doc_id * 11) % 4001 - 2000 AS val
        |      FROM s)
        |SELECT doc_id, bin,
        |       CAST(count(*) // ch AS BIGINT) AS n_frames,
        |       CAST(count(*) AS BIGINT) AS n_samples,
        |       CAST(sum(val) AS BIGINT) AS sum_val,
        |       CAST(sum(abs(val)) AS BIGINT) AS sum_abs
        |FROM v GROUP BY doc_id, bin, ch ORDER BY doc_id, bin""".stripMargin,

    // frame-feature twin: replays stride-2 frame sampling AND the 2x2
    // cell binning from the canonical closed form (p = s//3, x = p%w,
    // y = p//w) — cell-level parity proves the bottom-up DIB rows were
    // mapped back to canonical coordinates, which whole-frame sums
    // cannot distinguish
    "multimodal_video_features" ->
      """WITH d AS (SELECT doc_id,
        |                  CAST(doc_id % 6 + 2 AS INTEGER) AS w,
        |                  CAST(doc_id % 4 + 2 AS INTEGER) AS h,
        |                  CAST(doc_id % 5 + 2 AS INTEGER) AS nf
        |           FROM documents),
        |f AS (SELECT doc_id, w, h,
        |             unnest(generate_series(0, nf - 1)) AS frame_no FROM d),
        |sf AS (SELECT doc_id, w, h, frame_no,
        |              unnest(generate_series(0, w * h * 3 - 1)) AS s
        |       FROM f WHERE frame_no % 2 = 0),
        |v AS (SELECT doc_id, frame_no,
        |             CAST(((s // 3) // w) * 2 // h AS INTEGER) AS cy,
        |             CAST(((s // 3) % w) * 2 // w AS INTEGER) AS cx,
        |             (s * 31 + frame_no * 7 + doc_id) % 256 AS val
        |      FROM sf)
        |SELECT doc_id, CAST(frame_no AS INTEGER) AS frame_no, cy, cx,
        |       CAST(count(*) // 3 AS BIGINT) AS n_px,
        |       CAST(count(*) AS BIGINT) AS n_samples,
        |       CAST(sum(val) AS BIGINT) AS sum_val
        |FROM v GROUP BY doc_id, frame_no, cy, cx
        |ORDER BY doc_id, frame_no, cy, cx""".stripMargin,

    "multimodal_pixels" ->
      """WITH d AS (SELECT doc_id,
        |                  CAST(doc_id % 16 + 1 AS INTEGER) AS width,
        |                  CAST(doc_id % 12 + 1 AS INTEGER) AS height,
        |                  CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS INTEGER) AS channels
        |           FROM documents),
        |s AS (SELECT doc_id, width, height, channels,
        |             unnest(generate_series(0, width * height * channels - 1)) AS i
        |      FROM d),
        |v AS (SELECT doc_id, width, height, channels, (i * 31 + doc_id) % 256 AS val FROM s)
        |SELECT doc_id, width, height, channels,
        |       CAST(count(*) AS BIGINT) AS n_samples,
        |       CAST(sum(val) AS BIGINT) AS sum_val,
        |       CAST(sum(val * val) AS BIGINT) AS sum_sq,
        |       round(CAST(sum(val) AS DOUBLE) / count(*), 6) AS mean_val
        |FROM v GROUP BY 1, 2, 3, 4 ORDER BY doc_id""".stripMargin,

    // GIF twin: palette-expanded RGB over the closed-form index
    // stream (grayscale palette -> each pixel contributes its index
    // value 3 times) — a hash match proves the LZW decode + palette
    // expansion reconstructed every index exactly
    // BMP: aggregates recomputed codec-free from the closed-form RGB
    // samples; i decomposes to (pixel, channel), pixel to (x, y) —
    // row order (bottom-up vs top-down) is invisible to the sums
    "multimodal_bmp" ->
      """WITH d AS (SELECT doc_id,
        |                  CAST(doc_id % 14 + 1 AS INTEGER) AS width,
        |                  CAST(doc_id % 10 + 1 AS INTEGER) AS height
        |           FROM documents),
        |s AS (SELECT doc_id, width, height,
        |             unnest(generate_series(0, width * height * 3 - 1)) AS i
        |      FROM d),
        |v AS (SELECT doc_id, width, height,
        |             (((i // 3) % width) * 83 + ((i // 3) // width) * 29 +
        |              (i % 3) * 7 + doc_id) % 256 AS val
        |      FROM s)
        |SELECT doc_id, width, height, CAST(3 AS INTEGER) AS channels,
        |       CAST(count(*) AS BIGINT) AS n_samples,
        |       CAST(sum(val) AS BIGINT) AS sum_val,
        |       CAST(sum(val * val) AS BIGINT) AS sum_sq,
        |       round(CAST(sum(val) AS DOUBLE) / count(*), 6) AS mean_val
        |FROM v GROUP BY 1, 2, 3 ORDER BY doc_id""".stripMargin,

    "multimodal_gif" ->
      """WITH d AS (SELECT doc_id,
        |                  CAST(doc_id % 14 + 1 AS INTEGER) AS width,
        |                  CAST(doc_id % 10 + 1 AS INTEGER) AS height
        |           FROM documents),
        |s AS (SELECT doc_id, width, height,
        |             unnest(generate_series(0, width * height - 1)) AS i
        |      FROM d),
        |v AS (SELECT doc_id, width, height, (i * 37 + doc_id) % 256 AS val FROM s)
        |SELECT doc_id, width, height, CAST(3 AS INTEGER) AS channels,
        |       CAST(3 * count(*) AS BIGINT) AS n_samples,
        |       CAST(3 * sum(val) AS BIGINT) AS sum_val,
        |       CAST(3 * sum(val * val) AS BIGINT) AS sum_sq,
        |       round(CAST(3 * sum(val) AS DOUBLE) / (3 * count(*)), 6) AS mean_val
        |FROM v GROUP BY 1, 2, 3 ORDER BY doc_id""".stripMargin,

    // JPEG DC-only twin: pixel (x, y) takes its 8x8 block's
    // closed-form gray level (block index row-major over the
    // ceil(w/8)-wide grid) — codec-free, so a hash match proves the
    // Huffman/EXTEND/DC-predictor entropy layer inverted correctly
    // perceptual image dHash (r17): EVERY signature recomputed from
    // the fixture's closed-form pixels, codec-free — generate pixels,
    // luma*1000 (gray = x1000 = the 299+587+114 RGB weighting on
    // replicated gray), pool onto the 9x8 grid by the same integer
    // floor rule, compare adjacent cells by cross-multiply, assemble
    // the 64 bits in signed two's complement (bit 63 added as the
    // explicit MinValue literal — 1<<63 overflows DuckDB's BIGINT).
    // A hash match gates PNG deflate+unfilter, BMP and GIF decode,
    // the luma weighting, the pooling rule, and the bit order at once
    "multimodal_image_dedup_sig" ->
      """WITH imgs AS (
        |  SELECT doc_id * 4 + kind AS id, doc_id, kind,
        |         CASE WHEN kind = 3 THEN 2 * (doc_id % 24 + 16)
        |              ELSE doc_id % 24 + 16 END AS w,
        |         CASE WHEN kind = 3 THEN 2 * (doc_id % 16 + 16)
        |              ELSE doc_id % 16 + 16 END AS h,
        |         doc_id % 24 + 16 AS bw
        |  FROM documents CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS kind)),
        |px AS (SELECT id, doc_id, kind, w, h, bw,
        |              unnest(generate_series(0, w * h - 1)) AS s
        |       FROM imgs),
        |v AS (SELECT id, w, h, (s % w) AS x, (s // w) AS y,
        |             1000 * (((CASE WHEN kind = 3
        |                       THEN ((s // w) // 2) * bw + (s % w) // 2
        |                       ELSE s END) * 31 + doc_id * 7) % 191
        |               + CASE WHEN kind = 2 AND ((s // w) * 8) // h = 3
        |                       AND ((s % w) * 9) // w = 4
        |                      THEN 64 ELSE 0 END) AS luma
        |      FROM px),
        |cells AS (SELECT id, (y * 8) // h AS r, (x * 9) // w AS c,
        |                 sum(luma) AS sl, count(*) AS cn
        |          FROM v GROUP BY 1, 2, 3),
        |bits AS (SELECT l.id, l.r, l.c,
        |                CASE WHEN l.sl * rr.cn > rr.sl * l.cn
        |                     THEN 1 ELSE 0 END AS bit
        |         FROM cells l JOIN cells rr
        |           ON l.id = rr.id AND l.r = rr.r AND rr.c = l.c + 1
        |         WHERE l.c <= 7)
        |SELECT id, CAST(sum(CASE WHEN bit = 0 THEN 0
        |    WHEN r * 8 + c = 63 THEN -9223372036854775808
        |    ELSE (1::BIGINT << (r * 8 + c)) END) AS BIGINT) AS dhash
        |FROM bits GROUP BY id ORDER BY id""".stripMargin,

    // near-dup image pairs: the dedup_simhash materialized-signature
    // trick — bands + hamming replayed in SQL from the _sig dump
    // (whose hashes the closed-form twin above independently gates)
    "multimodal_image_dedup" ->
      s"""WITH s AS (SELECT id, dhash
         |           FROM read_parquet('__VERIFY_OUT__/multimodal_image_dedup_sig/*.parquet')),
         |b AS (SELECT id, dhash, band, dhash & ($simhashMaskCase) AS key
         |      FROM s CROSS JOIN (SELECT unnest($simhashBandList) AS band)),
         |p AS (SELECT DISTINCT a.id AS id1, c.id AS id2,
         |             a.dhash AS s1, c.dhash AS s2
         |      FROM b a JOIN b c ON a.band = c.band AND a.key = c.key AND a.id < c.id)
         |SELECT id1, id2, CAST(bit_count(xor(s1, s2)) AS BIGINT) AS hamming
         |FROM p WHERE bit_count(xor(s1, s2)) <= 3 ORDER BY id1, id2""".stripMargin,

    // audio energy-envelope hash: FULL closed-form replay (the image
    // dhash_sig standard) — per clip variant, frame -> bin floor rule
    // -> |sample| sums (volume x2 / bin-32 +500 / stereo x2 arms) ->
    // cross-multiply sign bits -> signed 64-bit assembly
    "multimodal_audio_dedup_sig" ->
      """WITH clips AS (SELECT doc_id, kind, doc_id * 4 + kind AS id,
        |                      doc_id % 200 + 65 AS frames
        |               FROM documents
        |               CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS kind)),
        |fr AS (SELECT id, kind, frames,
        |              unnest(generate_series(0, frames - 1)) AS f
        |       FROM clips),
        |b AS (SELECT id, kind, bin,
        |             abs((f * 37 + (id // 4) * 11) % 4001 - 2000) *
        |               (1 + hh * hh // 1000 % 7) AS av
        |      FROM (SELECT id, kind, f, bin,
        |              ((id // 4) * 65 + bin + 1) % 999983 * 2654435761 % 999983 AS hh
        |            FROM (SELECT id, kind, f, (f * 65) // frames AS bin FROM fr))),
        |cells AS (SELECT id, bin,
        |    sum(CASE kind WHEN 0 THEN av WHEN 1 THEN 2 * av
        |        WHEN 2 THEN av + CASE WHEN bin = 32 THEN 500 ELSE 0 END
        |        ELSE 2 * av END) AS sab,
        |    sum(CASE WHEN kind = 3 THEN 2 ELSE 1 END) AS n
        |          FROM b GROUP BY id, kind, bin),
        |bits AS (SELECT l.id, l.bin AS i,
        |                CASE WHEN r.sab * l.n > l.sab * r.n THEN 1 ELSE 0 END AS bit
        |         FROM cells l JOIN cells r
        |           ON l.id = r.id AND r.bin = l.bin + 1
        |         WHERE l.bin <= 63)
        |SELECT id, CAST(sum(CASE WHEN bit = 0 THEN 0
        |    WHEN i = 63 THEN -9223372036854775808
        |    ELSE (1::BIGINT << i) END) AS BIGINT) AS ahash
        |FROM bits GROUP BY id ORDER BY id""".stripMargin,

    // audio near-dup pairs: bands + hamming replayed from the
    // (independently closed-form-gated) sig dump
    "multimodal_audio_dedup" ->
      s"""WITH s AS (SELECT id, ahash
         |           FROM read_parquet('__VERIFY_OUT__/multimodal_audio_dedup_sig/*.parquet')),
         |b AS (SELECT id, ahash, band, ahash & ($simhashMaskCase) AS key
         |      FROM s CROSS JOIN (SELECT unnest($simhashBandList) AS band)),
         |p AS (SELECT DISTINCT a.id AS id1, c.id AS id2,
         |             a.ahash AS s1, c.ahash AS s2
         |      FROM b a JOIN b c ON a.band = c.band AND a.key = c.key AND a.id < c.id)
         |SELECT id1, id2, CAST(bit_count(xor(s1, s2)) AS BIGINT) AS hamming
         |FROM p WHERE bit_count(xor(s1, s2)) <= 3 ORDER BY id1, id2""".stripMargin,

    // temporal luminance-envelope hash: FULL closed-form replay — the
    // per-frame texture sum is FRAME-INDEPENDENT (same canonical
    // sample range every frame), so it computes once per doc; the
    // per-(doc, bin) envelope and the per-arm (+39 grade / bin-32 +25
    // boost / x4 upscale) adjustments are exact integer terms
    "multimodal_video_dedup_sig" ->
      """WITH d AS (SELECT doc_id, 4 AS w,
        |                  doc_id % 4 + 2 AS h, doc_id % 80 + 65 AS nf
        |           FROM documents),
        |tex AS (SELECT doc_id, sum((s * 31 + doc_id * 7) % 97) AS texsum
        |        FROM (SELECT doc_id, unnest(generate_series(0, 3 * w * h - 1)) AS s
        |              FROM d)
        |        GROUP BY doc_id),
        |clips AS (SELECT doc_id, kind, doc_id * 4 + kind AS id,
        |                 3 * w * h AS s0, nf
        |          FROM d CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS kind)),
        |fr AS (SELECT id, kind, doc_id, s0, nf,
        |              unnest(generate_series(0, nf - 1)) AS f
        |       FROM clips),
        |fb AS (SELECT id, kind, doc_id, s0, (f * 65) // nf AS bin FROM fr),
        |fe AS (SELECT id, kind, doc_id, s0, bin,
        |              hh * hh // 1000 % 7 AS env
        |       FROM (SELECT id, kind, doc_id, s0, bin,
        |               (doc_id * 65 + bin + 1) % 999983 * 2654435761 % 999983 AS hh
        |             FROM fb)),
        |fs AS (SELECT fe.id, fe.bin,
        |    CASE fe.kind
        |      WHEN 0 THEN t.texsum + fe.s0 * 20 * fe.env
        |      WHEN 1 THEN t.texsum + fe.s0 * (20 * fe.env + 39)
        |      WHEN 2 THEN t.texsum + fe.s0 * (20 * fe.env +
        |                    CASE WHEN fe.bin = 32 THEN 25 ELSE 0 END)
        |      ELSE 4 * (t.texsum + fe.s0 * 20 * fe.env) END AS fsum,
        |    CASE WHEN fe.kind = 3 THEN 4 * fe.s0 ELSE fe.s0 END AS fn
        |       FROM fe JOIN tex t ON fe.doc_id = t.doc_id),
        |cells AS (SELECT id, bin, sum(fsum) AS su, sum(fn) AS n
        |          FROM fs GROUP BY id, bin),
        |bits AS (SELECT l.id, l.bin AS i,
        |                CASE WHEN r.su * l.n > l.su * r.n THEN 1 ELSE 0 END AS bit
        |         FROM cells l JOIN cells r
        |           ON l.id = r.id AND r.bin = l.bin + 1
        |         WHERE l.bin <= 63)
        |SELECT id, CAST(sum(CASE WHEN bit = 0 THEN 0
        |    WHEN i = 63 THEN -9223372036854775808
        |    ELSE (1::BIGINT << i) END) AS BIGINT) AS vhash
        |FROM bits GROUP BY id ORDER BY id""".stripMargin,

    // video near-dup pairs: bands + hamming replayed from the
    // closed-form-gated sig dump
    "multimodal_video_dedup" ->
      s"""WITH s AS (SELECT id, vhash
         |           FROM read_parquet('__VERIFY_OUT__/multimodal_video_dedup_sig/*.parquet')),
         |b AS (SELECT id, vhash, band, vhash & ($simhashMaskCase) AS key
         |      FROM s CROSS JOIN (SELECT unnest($simhashBandList) AS band)),
         |p AS (SELECT DISTINCT a.id AS id1, c.id AS id2,
         |             a.vhash AS s1, c.vhash AS s2
         |      FROM b a JOIN b c ON a.band = c.band AND a.key = c.key AND a.id < c.id)
         |SELECT id1, id2, CAST(bit_count(xor(s1, s2)) AS BIGINT) AS hamming
         |FROM p WHERE bit_count(xor(s1, s2)) <= 3 ORDER BY id1, id2""".stripMargin,

    // dual-arm spatial/temporal video signatures (r18): v is constant
    // within a grid cell, so every spatial bit reduces to a pure
    // M-comparison (envelope term cancels by proportionality, frame
    // dimension drops out); the temporal hash replays per-frame sums
    // = 4320 + 240*sum(M) + 6480*env(bin) over 432 samples/frame.
    // Arms: kind 1 shifts only bit(0,0)'s comparison to >= (the
    // +10/-10 edit), kind 2 reads the mirrored columns.
    "multimodal_video_spatial_sig" ->
      """WITH d AS (SELECT doc_id, doc_id % 16 + 65 AS nf
        |           FROM documents WHERE doc_id % 4 = 0),
        |mc AS (SELECT doc_id, gr, c, hh * hh // 1000 % 7 AS m
        |       FROM (SELECT doc_id, gr, c,
        |               (doc_id * 65 + 200 + gr * 9 + c + 1) % 999983 * 2654435761 % 999983 AS hh
        |             FROM d
        |             CROSS JOIN (SELECT unnest([0, 2, 4, 6]) AS gr)
        |             CROSS JOIN (SELECT unnest(generate_series(0, 8)) AS c))),
        |sbits AS (SELECT l.doc_id, k.kind, l.gr * 8 + l.c AS i,
        |        CASE
        |          WHEN k.kind = 2 THEN CASE WHEN lm.m > rm.m THEN 1 ELSE 0 END
        |          WHEN k.kind = 1 AND l.gr = 0 AND l.c = 0
        |            THEN CASE WHEN l.m >= r.m THEN 1 ELSE 0 END
        |          ELSE CASE WHEN l.m > r.m THEN 1 ELSE 0 END END AS bit
        |       FROM mc l
        |       JOIN mc r ON r.doc_id = l.doc_id AND r.gr = l.gr AND r.c = l.c + 1
        |       JOIN mc lm ON lm.doc_id = l.doc_id AND lm.gr = l.gr AND lm.c = 8 - l.c
        |       JOIN mc rm ON rm.doc_id = l.doc_id AND rm.gr = l.gr AND rm.c = 7 - l.c
        |       CROSS JOIN (SELECT unnest([0, 1, 2]) AS kind) k
        |       WHERE l.c <= 7),
        |sh AS (SELECT doc_id, kind,
        |        CAST(coalesce(sum(CASE WHEN bit = 1 THEN (1::BIGINT << i)
        |                               ELSE 0 END), 0) AS BIGINT) AS shash
        |       FROM sbits GROUP BY doc_id, kind),
        |ms AS (SELECT doc_id, sum(m) AS sm FROM mc GROUP BY doc_id),
        |fr AS (SELECT doc_id, nf, unnest(generate_series(0, nf - 1)) AS f FROM d),
        |fe AS (SELECT doc_id, bin, hh * hh // 1000 % 7 AS env
        |       FROM (SELECT doc_id, (f * 65) // nf AS bin,
        |               (doc_id * 65 + (f * 65) // nf + 1) % 999983 * 2654435761 % 999983 AS hh
        |             FROM fr)),
        |cells AS (SELECT fe.doc_id, bin,
        |        sum(4320 + 240 * ms.sm + 6480 * env) AS su,
        |        432 * count(*) AS n
        |       FROM fe JOIN ms ON ms.doc_id = fe.doc_id
        |       GROUP BY fe.doc_id, bin),
        |tbits AS (SELECT l.doc_id, l.bin AS i,
        |        CASE WHEN r.su * l.n > l.su * r.n THEN 1 ELSE 0 END AS bit
        |       FROM cells l JOIN cells r
        |         ON l.doc_id = r.doc_id AND r.bin = l.bin + 1
        |       WHERE l.bin <= 63),
        |th AS (SELECT doc_id, CAST(sum(CASE WHEN bit = 0 THEN 0
        |        WHEN i = 63 THEN -9223372036854775808
        |        ELSE (1::BIGINT << i) END) AS BIGINT) AS thash
        |       FROM tbits GROUP BY doc_id)
        |SELECT d.doc_id * 3 + k.kind AS id,
        |       coalesce(th.thash, 0) AS thash, sh.shash
        |FROM d
        |CROSS JOIN (SELECT unnest([0, 1, 2]) AS kind) k
        |JOIN sh ON sh.doc_id = d.doc_id AND sh.kind = k.kind
        |LEFT JOIN th ON th.doc_id = d.doc_id
        |ORDER BY id""".stripMargin,

    // dual-arm near-dup pairs: temporal bands from the sig dump
    // (complete for the AND rule), both hammings verified
    "multimodal_video_spatial_dedup" ->
      s"""WITH s AS (SELECT id, thash, shash
         |           FROM read_parquet('__VERIFY_OUT__/multimodal_video_spatial_sig/*.parquet')),
         |b AS (SELECT id, thash, shash, band, thash & ($simhashMaskCase) AS key
         |      FROM s CROSS JOIN (SELECT unnest($simhashBandList) AS band)),
         |p AS (SELECT DISTINCT a.id AS id1, c.id AS id2,
         |             a.thash AS t1, c.thash AS t2,
         |             a.shash AS s1, c.shash AS s2
         |      FROM b a JOIN b c ON a.band = c.band AND a.key = c.key AND a.id < c.id)
         |SELECT id1, id2,
         |       CAST(bit_count(xor(t1, t2)) AS BIGINT) AS t_hamming,
         |       CAST(bit_count(xor(s1, s2)) AS BIGINT) AS s_hamming
         |FROM p WHERE bit_count(xor(t1, t2)) <= 3
         |  AND bit_count(xor(s1, s2)) <= 3 ORDER BY id1, id2""".stripMargin,

    // pHash pairs: the dedup_simhash materialized-signature trick —
    // bands + hamming replayed from the phash _sig dump (the fixed-
    // point DCT itself is spec-gated: provable flat-zero/brightness/
    // container invariances; no tractable SQL twin for a 32x32 DCT)
    "multimodal_image_phash_dedup" ->
      s"""WITH s AS (SELECT id, phash
         |           FROM read_parquet('__VERIFY_OUT__/multimodal_image_phash_sig/*.parquet')),
         |b AS (SELECT id, phash, band, phash & ($simhashMaskCase) AS key
         |      FROM s CROSS JOIN (SELECT unnest($simhashBandList) AS band)),
         |p AS (SELECT DISTINCT a.id AS id1, c.id AS id2,
         |             a.phash AS s1, c.phash AS s2
         |      FROM b a JOIN b c ON a.band = c.band AND a.key = c.key AND a.id < c.id)
         |SELECT id1, id2, CAST(bit_count(xor(s1, s2)) AS BIGINT) AS hamming
         |FROM p WHERE bit_count(xor(s1, s2)) <= 3 ORDER BY id1, id2""".stripMargin,

    // served-index probe: the multimodal_image_dedup pairs TOUCHING
    // the daily batch (kind 3 = id%4=3) — the equality-gate contract
    // of the bucketed-table serve path, replayed from the same dump
    "multimodal_image_dedup_idx" ->
      s"""WITH s AS (SELECT id, dhash
         |           FROM read_parquet('__VERIFY_OUT__/multimodal_image_dedup_sig/*.parquet')),
         |b AS (SELECT id, dhash, band, dhash & ($simhashMaskCase) AS key
         |      FROM s CROSS JOIN (SELECT unnest($simhashBandList) AS band)),
         |p AS (SELECT DISTINCT a.id AS id1, c.id AS id2,
         |             a.dhash AS s1, c.dhash AS s2
         |      FROM b a JOIN b c ON a.band = c.band AND a.key = c.key AND a.id < c.id
         |      WHERE a.id % 4 = 3 OR c.id % 4 = 3)
         |SELECT id1, id2, CAST(bit_count(xor(s1, s2)) AS BIGINT) AS hamming
         |FROM p WHERE bit_count(xor(s1, s2)) <= 3 ORDER BY id1, id2""".stripMargin,

    "multimodal_jpeg" ->
      """WITH d AS (SELECT doc_id,
        |                  CAST(doc_id % 28 + 1 AS INTEGER) AS width,
        |                  CAST(doc_id % 20 + 1 AS INTEGER) AS height
        |           FROM documents),
        |s AS (SELECT doc_id, width, height,
        |             unnest(generate_series(0, width * height - 1)) AS i
        |      FROM d),
        |v AS (SELECT doc_id, width, height,
        |             (((i // width) // 8) * ((width + 7) // 8) + (i % width) // 8) AS blk
        |      FROM s),
        |px AS (SELECT doc_id, width, height, (blk * 53 + doc_id * 7) % 256 AS val FROM v)
        |SELECT doc_id, width, height, CAST(1 AS INTEGER) AS channels,
        |       CAST(count(*) AS BIGINT) AS n_samples,
        |       CAST(sum(val) AS BIGINT) AS sum_val,
        |       CAST(sum(val * val) AS BIGINT) AS sum_sq,
        |       round(CAST(sum(val) AS DOUBLE) / count(*), 6) AS mean_val
        |FROM px GROUP BY 1, 2, 3 ORDER BY doc_id""".stripMargin,

    // COLOR JPEG twin: pixel -> padded-block-grid index per plane
    // (4:2:0 on even ids: Y over the 2*ceil(w/16)-wide padded grid,
    // chroma one block per 16x16 MCU; 4:4:4 on odd ids: every plane
    // on the ceil(w/8) grid) -> closed-form Y/Cb/Cr levels -> the
    // SAME 16.16 fixed-point JFIF transform the decoder runs (the
    // +8589934592 bias keeps the dividend positive so integer
    // division IS floor) — codec-free and float-free, so a hash match
    // proves the interleaved entropy layer, the subsampling geometry,
    // and the color math
    "multimodal_jpeg_color" ->
      """WITH d AS (SELECT doc_id,
        |                  CAST(doc_id % 24 + 9 AS INTEGER) AS w,
        |                  CAST(doc_id % 18 + 5 AS INTEGER) AS h,
        |                  (doc_id % 2 = 0) AS s420
        |           FROM documents),
        |s AS (SELECT doc_id, w, h, s420,
        |             unnest(generate_series(0, w * h - 1)) AS i
        |      FROM d),
        |c AS (SELECT doc_id, w, h, s420, i % w AS x, i // w AS y FROM s),
        |b AS (SELECT doc_id, w, h,
        |             CASE WHEN s420 THEN (y // 8) * (2 * ((w + 15) // 16)) + (x // 8)
        |                  ELSE (y // 8) * ((w + 7) // 8) + (x // 8) END AS yb,
        |             CASE WHEN s420 THEN (y // 16) * ((w + 15) // 16) + (x // 16)
        |                  ELSE (y // 8) * ((w + 7) // 8) + (x // 8) END AS cbk
        |      FROM c),
        |v AS (SELECT doc_id, w, h,
        |             (yb * 29 + doc_id * 5) % 256 AS yv,
        |             (cbk * 17 + doc_id * 3) % 256 AS cbv,
        |             (cbk * 23 + doc_id * 11) % 256 AS crv
        |      FROM b),
        |rgb AS (SELECT doc_id, w, h,
        |               greatest(0, least(255, (65536 * yv + 91881 * (crv - 128) + 32768 + 8589934592) // 65536 - 131072)) AS r,
        |               greatest(0, least(255, (65536 * yv - 22554 * (cbv - 128) - 46802 * (crv - 128) + 32768 + 8589934592) // 65536 - 131072)) AS g,
        |               greatest(0, least(255, (65536 * yv + 116130 * (cbv - 128) + 32768 + 8589934592) // 65536 - 131072)) AS b2
        |        FROM v)
        |SELECT doc_id, w AS width, h AS height, CAST(3 AS INTEGER) AS channels,
        |       CAST(3 * count(*) AS BIGINT) AS n_samples,
        |       CAST(sum(r + g + b2) AS BIGINT) AS sum_val,
        |       CAST(sum(r * r + g * g + b2 * b2) AS BIGINT) AS sum_sq,
        |       round(CAST(sum(r + g + b2) AS DOUBLE) / (3 * count(*)), 6) AS mean_val
        |FROM rgb GROUP BY 1, 2, 3 ORDER BY doc_id""".stripMargin,

    // pooled-feature twin: replays pixel -> 2x2 grid-cell binning
    // (cy = y*2//h, cx = x*2//w, integer floor) and the exact integer
    // count/sum aggregates over the closed-form samples — codec-free,
    // so a hash match proves decode + binning
    "multimodal_features" ->
      """WITH d AS (SELECT doc_id,
        |                  CAST(doc_id % 16 + 1 AS INTEGER) AS w,
        |                  CAST(doc_id % 12 + 1 AS INTEGER) AS h,
        |                  CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS INTEGER) AS ch
        |           FROM documents),
        |s AS (SELECT doc_id, w, h, ch,
        |             unnest(generate_series(0, w * h * ch - 1)) AS i
        |      FROM d),
        |v AS (SELECT doc_id, ch,
        |             CAST(((i // ch) % w) * 2 // w AS INTEGER) AS cx,
        |             CAST(((i // ch) // w) * 2 // h AS INTEGER) AS cy,
        |             (i * 31 + doc_id) % 256 AS val
        |      FROM s)
        |SELECT doc_id, cy, cx,
        |       CAST(count(*) // ch AS BIGINT) AS n_px,
        |       CAST(count(*) AS BIGINT) AS n_samples,
        |       CAST(sum(val) AS BIGINT) AS sum_val
        |FROM v GROUP BY doc_id, cy, cx, ch ORDER BY doc_id, cy, cx""".stripMargin,

    // replays the nearest-neighbor index arithmetic (sx = x*w//4,
    // sy = y*h//4) over the closed-form sample values with no codec —
    // a hash match proves the raster decode AND the resample selected
    // exactly the right source pixels
    "multimodal_resize" ->
      """WITH d AS (SELECT doc_id,
        |                  CAST(doc_id % 16 + 1 AS INTEGER) AS w,
        |                  CAST(doc_id % 12 + 1 AS INTEGER) AS h,
        |                  CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS INTEGER) AS ch
        |           FROM documents),
        |jx AS (SELECT doc_id, w, h, ch,
        |              unnest(generate_series(0, 4 * 4 * ch - 1)) AS j
        |       FROM d),
        |m AS (SELECT doc_id, w, h, ch,
        |             j // (4 * ch) AS y, (j % (4 * ch)) // ch AS x, j % ch AS c
        |      FROM jx),
        |v AS (SELECT doc_id, ch,
        |             (((y * h // 4) * w + (x * w // 4)) * ch + c) * 31 + doc_id AS base
        |      FROM m)
        |SELECT doc_id, CAST(4 AS INTEGER) AS width, CAST(4 AS INTEGER) AS height,
        |       ch AS channels,
        |       CAST(count(*) AS BIGINT) AS n_samples,
        |       CAST(sum(base % 256) AS BIGINT) AS sum_val,
        |       CAST(sum((base % 256) * (base % 256)) AS BIGINT) AS sum_sq
        |FROM v GROUP BY 1, 2, 3, 4 ORDER BY doc_id""".stripMargin,

    // recomputes the WAV round-trip's aggregates from the sample
    // closed form alone — no codec on the oracle side, so a hash
    // match proves the Spark side genuinely inverted RIFF/PCM bytes
    "multimodal_audio" ->
      """WITH d AS (SELECT doc_id,
        |                  CAST(8000 + (doc_id % 4) * 4000 AS INTEGER) AS sample_rate,
        |                  CAST(doc_id % 2 + 1 AS INTEGER) AS channels,
        |                  CAST(doc_id % 200 + 20 AS BIGINT) AS n_frames
        |           FROM documents),
        |s AS (SELECT doc_id, sample_rate, channels, n_frames,
        |             unnest(generate_series(0, n_frames * channels - 1)) AS i
        |      FROM d),
        |v AS (SELECT doc_id, sample_rate, channels, n_frames,
        |             (i * 37 + doc_id * 11) % 4001 - 2000 AS val FROM s)
        |SELECT doc_id, sample_rate, channels, n_frames,
        |       CAST(count(*) AS BIGINT) AS n_samples,
        |       CAST(sum(val) AS BIGINT) AS sum_val,
        |       CAST(sum(val * val) AS BIGINT) AS sum_sq,
        |       CAST(max(abs(val)) AS INTEGER) AS peak_abs,
        |       CAST(n_frames * 1000000 // sample_rate AS BIGINT) AS duration_us
        |FROM v GROUP BY 1, 2, 3, 4 ORDER BY doc_id""".stripMargin,

    // replays the 32-frame windowing arithmetic over the closed-form
    // samples — codec-free proof of the segment explode shape
    "multimodal_audio_seg" ->
      """WITH d AS (SELECT doc_id,
        |                  CAST(doc_id % 2 + 1 AS INTEGER) AS ch,
        |                  CAST(doc_id % 200 + 20 AS BIGINT) AS nf
        |           FROM documents),
        |seg AS (SELECT doc_id, ch, nf,
        |               unnest(generate_series(0, (nf - 1) // 32)) AS segment
        |        FROM d),
        |b AS (SELECT doc_id, ch, segment,
        |             segment * 32 AS start_frame,
        |             least((segment + 1) * 32, nf) AS end_frame
        |      FROM seg),
        |ix AS (SELECT doc_id, segment, start_frame, end_frame,
        |              unnest(generate_series(start_frame * ch, end_frame * ch - 1)) AS i
        |       FROM b),
        |v AS (SELECT doc_id, segment, start_frame, end_frame,
        |             (i * 37 + doc_id * 11) % 4001 - 2000 AS val FROM ix)
        |SELECT doc_id, CAST(segment AS INTEGER) AS segment,
        |       CAST(start_frame AS BIGINT) AS start_frame,
        |       CAST(end_frame - start_frame AS BIGINT) AS n_frames,
        |       CAST(sum(val) AS BIGINT) AS sum_val,
        |       CAST(max(abs(val)) AS INTEGER) AS peak_abs
        |FROM v GROUP BY doc_id, segment, start_frame, end_frame
        |ORDER BY doc_id, segment""".stripMargin,

    // ---------------------------------------------------- r13 twins

    "profile_inclusion" -> {
      val cols = Seq(
        ("nation.n_nationkey", "nation", "n_nationkey"),
        ("nation.n_regionkey", "nation", "n_regionkey"),
        ("region.r_regionkey", "region", "r_regionkey"),
        ("customer.c_custkey", "customer", "c_custkey"),
        ("customer.c_nationkey", "customer", "c_nationkey"),
        ("supplier.s_suppkey", "supplier", "s_suppkey"),
        ("supplier.s_nationkey", "supplier", "s_nationkey"),
        ("part.p_partkey", "part", "p_partkey"),
        ("orders.o_orderkey", "orders", "o_orderkey"),
        ("orders.o_custkey", "orders", "o_custkey"),
        ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
        ("lineitem.l_partkey", "lineitem", "l_partkey"),
        ("lineitem.l_suppkey", "lineitem", "l_suppkey"))
      val d = cols.map { case (label, tab, c) =>
        s"SELECT DISTINCT '$label' AS col, CAST($c AS VARCHAR) AS v FROM $tab WHERE $c IS NOT NULL"
      }.mkString("\nUNION ALL ")
      s"""WITH d AS (
         |$d),
         |cnt AS (SELECT col, count(*) AS n FROM d GROUP BY col),
         |inter AS (SELECT a.col AS src_col, b.col AS tgt_col, count(*) AS n_inter
         |          FROM d a JOIN d b ON a.v = b.v WHERE a.col <> b.col GROUP BY 1, 2),
         |pairs AS (SELECT a.col AS src_col, b.col AS tgt_col
         |          FROM cnt a CROSS JOIN cnt b WHERE a.col <> b.col)
         |SELECT p.src_col, p.tgt_col, c.n AS n_src,
         |       coalesce(i.n_inter, 0) AS n_inter,
         |       round(CAST(coalesce(i.n_inter, 0) AS DOUBLE) / CAST(c.n AS DOUBLE), 6) AS containment,
         |       CASE WHEN coalesce(i.n_inter, 0) = c.n THEN 1 ELSE 0 END AS is_ind
         |FROM pairs p
         |JOIN cnt c ON c.col = p.src_col
         |LEFT JOIN inter i ON i.src_col = p.src_col AND i.tgt_col = p.tgt_col
         |ORDER BY 1, 2""".stripMargin
    },

    // sketch-error gate: all-true over the IN-SCOPE ordered pairs
    // (distinct-count ratio <= 4 — the estimator's honest operating
    // range, recomputed here from exact counts so the scope itself
    // is part of the gate); an estimator regression fails loudly
    "profile_inclusion_sketch" -> {
      val cols = Seq(
        ("nation.n_nationkey", "nation", "n_nationkey"),
        ("nation.n_regionkey", "nation", "n_regionkey"),
        ("region.r_regionkey", "region", "r_regionkey"),
        ("customer.c_custkey", "customer", "c_custkey"),
        ("customer.c_nationkey", "customer", "c_nationkey"),
        ("supplier.s_suppkey", "supplier", "s_suppkey"),
        ("supplier.s_nationkey", "supplier", "s_nationkey"),
        ("part.p_partkey", "part", "p_partkey"),
        ("orders.o_orderkey", "orders", "o_orderkey"),
        ("orders.o_custkey", "orders", "o_custkey"),
        ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
        ("lineitem.l_partkey", "lineitem", "l_partkey"),
        ("lineitem.l_suppkey", "lineitem", "l_suppkey"))
      val cnt = cols.map { case (label, tab, c) =>
        s"SELECT '$label' AS col, count(DISTINCT $c) AS n FROM $tab WHERE $c IS NOT NULL"
      }.mkString("\nUNION ALL ")
      s"""WITH cnt AS (
         |$cnt)
         |SELECT a.col AS src_col, b.col AS tgt_col, true AS containment_ok
         |FROM cnt a CROSS JOIN cnt b
         |WHERE a.col <> b.col
         |  AND greatest(CAST(a.n AS DOUBLE) / CAST(b.n AS DOUBLE),
         |               CAST(b.n AS DOUBLE) / CAST(a.n AS DOUBLE)) <= 4.0
         |ORDER BY 1, 2""".stripMargin
    },

    // sketch-error gate: literal all-true per join pair — the exact
    // join count is the Spark side's own reference
    "profile_joinsize_sketch" ->
      """SELECT p AS join_pair, true AS size_ok FROM (VALUES
        |  ('lineitem*orders.orderkey'), ('lineitem*part.partkey'),
        |  ('orders*customer.custkey')) t(p)
        |ORDER BY 1""".stripMargin,

    // g3 approximate-FD error: per (det, dep) the kept mass is
    // sum over det groups of the argmax dependent count; ppm by
    // HUGEINT floor division, verdict by HUGEINT product compare
    "profile_fd_approx" -> {
      val checks = Seq(
        ("orders", "o_custkey", "o_orderpriority"),
        ("orders", "o_custkey", "o_orderstatus"),
        ("nation", "n_nationkey", "n_regionkey"),
        ("lineitem", "l_orderkey", "l_suppkey"))
      checks.map { case (tab, det, dep) =>
        s"""SELECT '$tab' AS tab, '$det' AS determinant,
           |       '$dep' AS dependent,
           |       CAST(n AS BIGINT) AS n_rows,
           |       CAST(n - keep AS BIGINT) AS error_rows,
           |       CAST((CAST(n - keep AS HUGEINT) * 1000000)
           |            // CAST(n AS HUGEINT) AS BIGINT) AS error_ppm,
           |       CAST(CASE WHEN CAST(n - keep AS HUGEINT) * 1000000
           |                      <= 10000 * CAST(n AS HUGEINT)
           |            THEN 1 ELSE 0 END AS INTEGER) AS afd_holds
           |FROM (SELECT sum(mx) AS keep, sum(rws) AS n FROM (
           |  SELECT det, max(c) AS mx, sum(c) AS rws FROM (
           |    SELECT $det AS det, CAST($dep AS VARCHAR) AS v, count(*) AS c
           |    FROM $tab GROUP BY 1, 2) GROUP BY det))""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY tab, determinant, dependent")
    },

    // two-sample KS + total-variation drift: cross-multiplied integer
    // sup over value boundaries, one HUGEINT floor division at the end
    "profile_drift_ks" -> {
      val cmps = Seq(
        ("orders_totalprice:pre1998_vs_post",
          "SELECT o_totalprice AS v FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'",
          "SELECT o_totalprice AS v FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'"),
        ("lineitem_extprice:R_vs_A",
          "SELECT l_extendedprice AS v FROM lineitem WHERE l_returnflag = 'R'",
          "SELECT l_extendedprice AS v FROM lineitem WHERE l_returnflag = 'A'"),
        ("orders_totalprice:self",
          "SELECT o_totalprice AS v FROM orders",
          "SELECT o_totalprice AS v FROM orders"))
      cmps.map { case (name, aq, bq) =>
        s"""SELECT '$name' AS comparison, CAST(na AS BIGINT) AS n_a,
           |       CAST(nb AS BIGINT) AS n_b,
           |       CAST((max(abs(cva * nb - cvb * na)) * 1000000)
           |            // (na * nb) AS BIGINT) AS ks_ppm,
           |       CAST((sum(abs(ca * nb - cb * na)) * 1000000)
           |            // (2 * na * nb) AS BIGINT) AS tv_ppm
           |FROM (SELECT ca, cb,
           |        sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
           |                      AND CURRENT ROW) AS cva,
           |        sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
           |                      AND CURRENT ROW) AS cvb
           |      FROM (SELECT v, sum(ia) AS ca, sum(ib) AS cb FROM (
           |              SELECT v, CAST(1 AS HUGEINT) AS ia, CAST(0 AS HUGEINT) AS ib
           |              FROM ($aq) WHERE v IS NOT NULL
           |              UNION ALL
           |              SELECT v, 0, 1 FROM ($bq) WHERE v IS NOT NULL)
           |            GROUP BY v)),
           |     (SELECT (SELECT count(*)::HUGEINT FROM ($aq) WHERE v IS NOT NULL) AS na,
           |             (SELECT count(*)::HUGEINT FROM ($bq) WHERE v IS NOT NULL) AS nb)
           |GROUP BY na, nb""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY comparison")
    },

    // chi-square drift contributions: E truncated to micro-units first
    // (positive operands — `//` == Spark `div`), then dev^2 // E_micro;
    // NULL when a category's expected mass truncates to zero
    "profile_drift_chi2" -> {
      def contrib(o: String, side: String) =
        s"""(CASE WHEN ((cnt_a + cnt_b) * $side * 1000000) // (na + nb) > 0
           | THEN CAST((($o * 1000000 - ((cnt_a + cnt_b) * $side * 1000000) // (na + nb)) *
           |            ($o * 1000000 - ((cnt_a + cnt_b) * $side * 1000000) // (na + nb)))
           |      // (((cnt_a + cnt_b) * $side * 1000000) // (na + nb)) AS BIGINT)
           | ELSE NULL END)""".stripMargin.replace("\n", " ")
      val cmps = Seq(
        ("orders_priority:pre1998_vs_post",
          "SELECT o_orderpriority AS c FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'",
          "SELECT o_orderpriority AS c FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'"),
        ("events_type:w1_vs_rest",
          "SELECT event_type AS c FROM events WHERE ts < TIMESTAMP '2024-01-08'",
          "SELECT event_type AS c FROM events WHERE ts >= TIMESTAMP '2024-01-08'"))
      cmps.map { case (name, aq, bq) =>
        s"""SELECT '$name' AS comparison, category,
           |       CAST(cnt_a AS BIGINT) AS cnt_a, CAST(cnt_b AS BIGINT) AS cnt_b,
           |       ${contrib("cnt_a", "na")} + ${contrib("cnt_b", "nb")} AS contrib_ppm
           |FROM (SELECT category, sum(ia) AS cnt_a, sum(ib) AS cnt_b FROM (
           |        SELECT CAST(c AS VARCHAR) AS category,
           |               CAST(1 AS HUGEINT) AS ia, CAST(0 AS HUGEINT) AS ib
           |        FROM ($aq) WHERE c IS NOT NULL
           |        UNION ALL
           |        SELECT CAST(c AS VARCHAR), 0, 1 FROM ($bq) WHERE c IS NOT NULL)
           |      GROUP BY category),
           |     (SELECT sum(cnt_a) AS na, sum(cnt_b) AS nb FROM (
           |        SELECT count(*)::HUGEINT AS cnt_a, 0::HUGEINT AS cnt_b
           |        FROM ($aq) WHERE c IS NOT NULL
           |        UNION ALL
           |        SELECT 0, count(*)::HUGEINT FROM ($bq) WHERE c IS NOT NULL))""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY comparison, category")
    },

    // bucketed numeric drift: histogram's fixed double bucketing over
    // the UNION bounds, then the chi-square contingency math (same
    // micro-truncation as profile_drift_chi2)
    "profile_drift_hist" -> {
      def contrib(o: String, side: String) =
        s"""(CASE WHEN ((cnt_a + cnt_b) * $side * 1000000) // (na + nb) > 0
           | THEN CAST((($o * 1000000 - ((cnt_a + cnt_b) * $side * 1000000) // (na + nb)) *
           |            ($o * 1000000 - ((cnt_a + cnt_b) * $side * 1000000) // (na + nb)))
           |      // (((cnt_a + cnt_b) * $side * 1000000) // (na + nb)) AS BIGINT)
           | ELSE NULL END)""".stripMargin.replace("\n", " ")
      val bins = 16
      val cmps = Seq(
        ("orders_totalprice:pre1998_vs_post",
          "SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'",
          "SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'"),
        ("lineitem_extprice:R_vs_A",
          "SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem WHERE l_returnflag = 'R'",
          "SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem WHERE l_returnflag = 'A'"))
      cmps.map { case (name, aq, bq) =>
        s"""SELECT '$name' AS comparison, category,
           |       CAST(cnt_a AS BIGINT) AS cnt_a, CAST(cnt_b AS BIGINT) AS cnt_b,
           |       ${contrib("cnt_a", "na")} + ${contrib("cnt_b", "nb")} AS contrib_ppm
           |FROM (SELECT category, sum(ia) AS cnt_a, sum(ib) AS cnt_b FROM (
           |        SELECT CAST((CASE WHEN mx = mn THEN CAST(0 AS BIGINT)
           |                 ELSE least(CAST(floor((v - mn) * $bins / (mx - mn)) AS BIGINT),
           |                            CAST(${bins - 1} AS BIGINT)) END) AS VARCHAR) AS category,
           |               ia, ib
           |        FROM (SELECT v, CAST(1 AS HUGEINT) AS ia, CAST(0 AS HUGEINT) AS ib
           |              FROM ($aq) WHERE v IS NOT NULL
           |              UNION ALL
           |              SELECT v, 0, 1 FROM ($bq) WHERE v IS NOT NULL),
           |             (SELECT CAST(min(v) AS DOUBLE) AS mn, CAST(max(v) AS DOUBLE) AS mx
           |              FROM (SELECT v FROM ($aq) UNION ALL SELECT v FROM ($bq))
           |              WHERE v IS NOT NULL))
           |      GROUP BY category),
           |     (SELECT sum(ia2) AS na, sum(ib2) AS nb FROM (
           |        SELECT count(*)::HUGEINT AS ia2, 0::HUGEINT AS ib2
           |        FROM ($aq) WHERE v IS NOT NULL
           |        UNION ALL
           |        SELECT 0, count(*)::HUGEINT FROM ($bq) WHERE v IS NOT NULL))""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY comparison, category")
    },

    // semantic-type audit: the regex text comes VERBATIM from
    // Profile.semanticPatterns (one source of truth, both engines
    // evaluate identical patterns in the Java-regex ∩ RE2 subset)
    "profile_types" -> {
      val pats = graft.harmonize.Profile.semanticPatterns
      val srcs = Seq(
        ("customer", "c_custkey_s", "CAST(c_custkey AS VARCHAR)"),
        ("customer", "c_name", "c_name"),
        ("customer", "c_mktsegment", "c_mktsegment"),
        ("orders", "o_orderdate_s", "strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')"),
        ("orders", "o_totalprice_s", "CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)"),
        ("orders", "o_orderpriority", "o_orderpriority"))
      val u = srcs.map { case (t, a, e) =>
        s"SELECT '$t' AS tab, '$a' AS col, $e AS v FROM $t"
      }.mkString("\nUNION ALL ")
      val patCnt = pats.map { case (n, p) =>
        s"CAST(sum(CASE WHEN regexp_matches(v, '$p') THEN 1 ELSE 0 END) AS BIGINT) AS n_$n"
      }.mkString(",\n       ")
      val anyPat = pats.map { case (_, p) => s"regexp_matches(v, '$p')" }
        .mkString(" OR ")
      val verdictCase = pats.map { case (n, _) =>
        s"WHEN (n_rows - n_null) > 0 AND n_$n * 10 >= (n_rows - n_null) * 9 THEN '$n'"
      }.mkString("\n         ")
      s"""WITH u AS ($u),
         |c AS (SELECT tab, col, count(*) AS n_rows,
         |       CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |       CAST(sum(CASE WHEN v = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
         |       $patCnt,
         |       CAST(sum(CASE WHEN v IS NOT NULL AND NOT ($anyPat)
         |                THEN 1 ELSE 0 END) AS BIGINT) AS n_other
         |      FROM u GROUP BY 1, 2)
         |SELECT col AS "column", n_rows, n_null, n_empty,
         |       ${pats.map(p => "n_" + p._1).mkString(", ")}, n_other,
         |       (CASE $verdictCase
         |         WHEN (n_rows - n_null) = 0 THEN 'empty'
         |         ELSE 'text' END) AS verdict, tab
         |FROM c ORDER BY tab, "column"""".stripMargin
    },

    // per-dimension exact centroid drift over embedding slices:
    // micro-unit fixed point (floor(v*1e6) — exact in double), HUGEINT
    // sums, cross-multiplied gap, sign-split truncating divisions
    // (DuckDB // floors, Spark div truncates — identical after abs)
    "profile_drift_embedding" -> {
      def sdiv(num: String, den: String) =
        s"(CASE WHEN ($den) > 0 THEN (CASE WHEN ($num) >= 0 " +
          s"THEN ($num) // ($den) ELSE -((-($num)) // ($den)) END) ELSE NULL END)"
      val cmps = Seq(
        ("emb_label0_vs_label1", "label = 0", "label = 1"),
        ("emb_even_vs_odd", "vec_id % 2 = 0", "vec_id % 2 = 1"))
      cmps.map { case (name, pa, pb) =>
        s"""SELECT '$name' AS comparison, dim,
           |       CAST(ca AS BIGINT) AS n_a, CAST(cb AS BIGINT) AS n_b,
           |       CAST(${sdiv("sa", "ca")} AS BIGINT) AS mean_a_micro,
           |       CAST(${sdiv("sb", "cb")} AS BIGINT) AS mean_b_micro,
           |       CAST(${sdiv("sa * cb - sb * ca", "ca * cb")} AS BIGINT) AS gap_micro
           |FROM (SELECT dim, sum(ia * vm) AS sa, sum(ib * vm) AS sb,
           |             sum(ia) AS ca, sum(ib) AS cb
           |      FROM (SELECT CAST(unnest(range(len(embedding))) AS BIGINT) AS dim,
           |              CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
           |                   AS HUGEINT) AS vm, ia, ib
           |            FROM (SELECT embedding, CAST(1 AS HUGEINT) AS ia,
           |                    CAST(0 AS HUGEINT) AS ib
           |                  FROM embeddings WHERE ($pa) AND embedding IS NOT NULL
           |                  UNION ALL
           |                  SELECT embedding, 0, 1
           |                  FROM embeddings WHERE ($pb) AND embedding IS NOT NULL))
           |      GROUP BY dim)""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY comparison, dim")
    },

    // FD discovery twin (r19): every candidate recomputed from plain
    // GROUP BYs — g3 keep = Σ_det-group max_dep count; integer
    // arithmetic only (n <= 1e6 at the test SFs, products fit BIGINT;
    // // is DuckDB's truncating integral division, = Spark's decimal
    // div for non-negative operands)
    // pairwise MI + entropies: per pair the twin replays joint counts,
    // joint-derived marginals, and the same addend formula in the same
    // operation order (§5 round-12/decimal-sum log policy)
    "profile_mi" -> {
      val cols = Seq("l_returnflag", "l_linestatus", "l_linenumber")
      def sv(c: String) =
        s"coalesce(CAST($c AS VARCHAR), chr(0) || 'NULL')"
      val pairs = cols.combinations(2).toSeq
      val ctes = pairs.zipWithIndex.flatMap { case (s, i) =>
        val (x, y) = (s(0), s(1))
        Seq(
          s"j$i AS (SELECT ${sv(x)} AS xv, ${sv(y)} AS yv, count(*) AS c FROM lineitem GROUP BY 1, 2)",
          s"mx$i AS (SELECT xv, sum(c) AS cx FROM j$i GROUP BY xv)",
          s"my$i AS (SELECT yv, sum(c) AS cy FROM j$i GROUP BY yv)",
          s"t$i AS (SELECT sum(c) AS nn FROM j$i)",
          s"""mi$i AS (SELECT sum(CAST(round((CAST(c AS DOUBLE) / CAST(nn AS DOUBLE)) *
             |  ln((CAST(c AS DOUBLE) * CAST(nn AS DOUBLE)) /
             |     (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE))), 12) AS DECIMAL(26,14))) AS mi_s,
             |  count(*) AS n_cells
             |  FROM j$i JOIN mx$i USING (xv) JOIN my$i USING (yv), t$i)""".stripMargin,
          s"""hx$i AS (SELECT sum(CAST(round((CAST(cx AS DOUBLE) / CAST(nn AS DOUBLE)) *
             |  ln(CAST(cx AS DOUBLE) / CAST(nn AS DOUBLE)) * -1.0, 12) AS DECIMAL(26,14))) AS hx_s
             |  FROM mx$i, t$i)""".stripMargin,
          s"""hy$i AS (SELECT sum(CAST(round((CAST(cy AS DOUBLE) / CAST(nn AS DOUBLE)) *
             |  ln(CAST(cy AS DOUBLE) / CAST(nn AS DOUBLE)) * -1.0, 12) AS DECIMAL(26,14))) AS hy_s
             |  FROM my$i, t$i)""".stripMargin)
      }
      val branches = pairs.zipWithIndex.map { case (s, i) =>
        s"""SELECT 'lineitem' AS tab, '${s(0)}' AS col_x, '${s(1)}' AS col_y,
           |  CAST(nn AS BIGINT) AS n, CAST(n_cells AS BIGINT) AS n_cells,
           |  round(CAST(hx_s AS DOUBLE), 6) AS h_x,
           |  round(CAST(hy_s AS DOUBLE), 6) AS h_y,
           |  round(CAST(mi_s AS DOUBLE), 6) AS mi
           |FROM mi$i, hx$i, hy$i, t$i""".stripMargin
      }
      s"WITH ${ctes.mkString(",\n")}\n" +
        branches.mkString("", "\nUNION ALL\n", "\nORDER BY col_x, col_y")
    },

    "profile_fd_discover" -> {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_orderdate", "o_orderpriority")
      val cands = (cols.combinations(2) ++ cols.combinations(3)).toSeq
        .flatMap(s => s.map(dep => (s.filterNot(_ == dep), dep)))
      val selects = cands.map { case (det, dep) =>
        val detCols = det.mkString(", ")
        s"""SELECT 'orders' AS tab, '${det.mkString("+")}' AS determinant,
           |  '$dep' AS dependent, CAST(n AS BIGINT) AS n_rows,
           |  CAST(n - keep AS BIGINT) AS error_rows,
           |  CAST(((n - keep) * 1000000) // n AS BIGINT) AS error_ppm,
           |  CASE WHEN n = keep THEN 1 ELSE 0 END AS fd_exact,
           |  CASE WHEN (n - keep) * 1000000 <= 10000 * n THEN 1 ELSE 0 END AS afd_holds
           |FROM (SELECT sum(mx) AS keep, sum(rws) AS n FROM
           |  (SELECT max(c) AS mx, sum(c) AS rws FROM
           |    (SELECT $detCols, $dep, count(*) AS c FROM orders
           |     GROUP BY $detCols, $dep) GROUP BY $detCols))""".stripMargin
      }
      selects.mkString("", "\nUNION ALL\n",
        "\nORDER BY error_ppm, determinant, dependent")
    },

    "profile_fd" -> {
      val checks = Seq(
        ("orders", "o_orderkey", "o_custkey"),
        ("orders", "o_orderkey", "o_orderpriority"),
        ("orders", "o_custkey", "o_orderpriority"),
        ("nation", "n_nationkey", "n_regionkey"),
        ("lineitem", "l_orderkey", "l_suppkey"))
      checks.map { case (tab, det, dep) =>
        s"""SELECT '$tab' AS tab, '$det' AS determinant, '$dep' AS dependent,
           |       count(*) AS n_groups,
           |       CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS violating_groups,
           |       max(nd) AS max_branching,
           |       CASE WHEN sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0 THEN 1 ELSE 0 END AS fd_holds
           |FROM (SELECT $det, count(DISTINCT $dep) AS nd FROM $tab GROUP BY $det)""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY tab, determinant, dependent")
    },

    // same decimal-moment chain as the Spark kernel: exact (18,6)
    // quantization, exact decimal products/sums, correlations in
    // DOUBLE from the exact sums with the identical expression shape
    "profile_correlation" -> {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      // quantize at (18,6) — the value-fixing cast that matches the
      // Spark side — then widen to (19,6) so DuckDB's multiply types
      // as DECIMAL(38,12) on hugeint storage (w1+w2 <= 38 is its hard
      // multiply rule; 18+18 stays on int64 and overflows)
      def dec(c: String) = s"CAST(CAST($c AS DECIMAL(18,6)) AS DECIMAL(19,6))"
      val pairs = for { i <- cols.indices; j <- (i + 1) until cols.size }
        yield (cols(i), cols(j))
      val sums = cols.flatMap(c => Seq(
        s"sum(CAST($c AS DECIMAL(18,6))) AS s_$c",
        s"sum(${dec(c)} * ${dec(c)}) AS q_$c")) ++
        pairs.map { case (x, y) => s"sum(${dec(x)} * ${dec(y)}) AS p_${x}__$y" }
      val rows = pairs.map { case (x, y) =>
        val n = "CAST(n AS DOUBLE)"
        s"""SELECT '$x' AS col_x, '$y' AS col_y, n,
           |       round(($n * CAST(p_${x}__$y AS DOUBLE) - CAST(s_$x AS DOUBLE) * CAST(s_$y AS DOUBLE))
           |             / sqrt(($n * CAST(q_$x AS DOUBLE) - CAST(s_$x AS DOUBLE) * CAST(s_$x AS DOUBLE))
           |                  * ($n * CAST(q_$y AS DOUBLE) - CAST(s_$y AS DOUBLE) * CAST(s_$y AS DOUBLE))), 6) AS corr
           |FROM m""".stripMargin
      }
      s"""WITH m AS (SELECT count(*) AS n, ${sums.mkString(",\n       ")}
         |           FROM lineitem)
         |${rows.mkString("", "\nUNION ALL\n", "")}
         |ORDER BY col_x, col_y""".stripMargin
    },

    "profile_histogram" -> {
      def one(c: String, bins: Int) =
        s"""SELECT '$c' AS "column", bucket,
           |       round(mn + bucket * (mx - mn) / $bins, 6) AS lo,
           |       round(mn + (bucket + 1) * (mx - mn) / $bins, 6) AS hi,
           |       count(*) AS cnt
           |FROM (SELECT CASE WHEN mx = mn THEN CAST(0 AS BIGINT)
           |                  ELSE least(CAST(floor((CAST($c AS DOUBLE) - mn) * $bins / (mx - mn)) AS BIGINT),
           |                             CAST(${bins - 1} AS BIGINT)) END AS bucket,
           |             mn, mx
           |      FROM lineitem,
           |           (SELECT CAST(min($c) AS DOUBLE) AS mn, CAST(max($c) AS DOUBLE) AS mx
           |            FROM lineitem)
           |      WHERE $c IS NOT NULL)
           |GROUP BY bucket, mn, mx""".stripMargin
      Seq(one("l_quantity", 10), one("l_extendedprice", 10))
        .mkString("", "\nUNION ALL\n", "\nORDER BY \"column\", bucket")
    },

    "graph_pagerank" -> pageRankSql(iters = 5),
    "text_textrank" -> textRankSql(iters = 5),

    // Benford audit: FLOOR before the integer cast (DuckDB's
    // double->BIGINT cast rounds, which would flip 9999.6's digit);
    // integer string rendering is canonical cross-engine, unlike
    // double->string; per-mille by floor division
    "profile_benford" ->
      """WITH c AS (SELECT CAST(substr(CAST(CAST(floor(l_extendedprice)
        |                   AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit,
        |                  count(*) AS n_obs
        |           FROM lineitem WHERE l_extendedprice >= 1 GROUP BY 1),
        |t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM c)
        |SELECT digit, n_obs,
        |       CAST((n_obs * 1000) // t.n AS BIGINT) AS obs_pm,
        |       CAST(CASE digit WHEN 1 THEN 301 WHEN 2 THEN 176
        |                 WHEN 3 THEN 125 WHEN 4 THEN 97 WHEN 5 THEN 79
        |                 WHEN 6 THEN 67 WHEN 7 THEN 58 WHEN 8 THEN 51
        |                 WHEN 9 THEN 46 END AS BIGINT) AS exp_pm
        |FROM c CROSS JOIN t ORDER BY digit""".stripMargin,
    "graph_ppr" -> pprSql(iters = 5),

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |       CAST(GROUPING(l_returnflag)*2 + GROUPING(l_linestatus) AS INTEGER) AS gid
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag ASC NULLS LAST, l_linestatus ASC NULLS LAST""".stripMargin,

    "q_pivot" -> {
      val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      val cells = prios.map { p =>
        val a = p.replaceAll("[^A-Za-z0-9]+", "_").toLowerCase
        s"""CAST(count(*) FILTER (o_orderpriority = '$p') AS BIGINT) AS "$a""""
      }.mkString(",\n       ")
      s"""SELECT o_orderstatus,
         |       $cells
         |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
    },

    "text_keywords" ->
      s"""WITH tok AS (SELECT doc_id, unnest(${toks("text")}) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
         |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |ndoc AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
         |sc AS (SELECT doc_id, term,
         |         round(CAST(tf AS DOUBLE) *
         |               ln((n_docs + CAST(1 AS DOUBLE)) / (CAST(df AS DOUBLE) + CAST(1 AS DOUBLE))), 9) AS score
         |       FROM tf JOIN dfq USING (term), ndoc),
         |r AS (SELECT doc_id, term, score,
         |        CAST(row_number() OVER (PARTITION BY doc_id
         |               ORDER BY score DESC, term ASC) AS INTEGER) AS "rank"
         |      FROM sc)
         |SELECT doc_id, term, score, "rank" FROM r WHERE "rank" <= 3
         |ORDER BY doc_id, "rank"""".stripMargin,

    // ln(u)/w priority replay — u is the deterministic id hash, the
    // +0.5 offset keeps it strictly inside (0,1); key rounds to 9dp
    // BEFORE the top-k so the selection boundary matches the kernel
    "curate_weighted_sample" ->
      """WITH k AS (SELECT doc_id, n_chars,
        |             round(ln((CAST(CAST(doc_id + 0 AS HUGEINT) * 2654435761 % 1000000 AS DOUBLE) + 0.5)
        |                      / 1000000.0)
        |                   / CAST(n_chars AS DOUBLE), 9) AS sample_key
        |           FROM documents),
        |top AS (SELECT doc_id, n_chars, sample_key FROM k
        |        ORDER BY sample_key DESC, doc_id ASC LIMIT 100)
        |SELECT doc_id, n_chars, sample_key FROM top ORDER BY doc_id""".stripMargin,

    "scd2_apply" ->
      """WITH dim AS (SELECT c_custkey AS k, c_mktsegment AS seg FROM customer),
        |ch AS (SELECT c_custkey AS k, 'DELINQUENT' AS nseg,
        |              CAST(86400000000 AS BIGINT) AS ts
        |       FROM customer WHERE c_acctbal < 0
        |       UNION ALL
        |       SELECT c_custkey, c_mktsegment, CAST(86400000000 AS BIGINT)
        |       FROM customer WHERE c_acctbal >= 0 AND c_acctbal < 100
        |       UNION ALL
        |       SELECT c_custkey + 10000000, 'FIRSTCONTACT', CAST(86400000000 AS BIGINT)
        |       FROM customer WHERE c_acctbal > 9000),
        |j AS (SELECT dim.k, dim.seg, ch.nseg, ch.ts
        |      FROM dim LEFT JOIN ch ON dim.k = ch.k),
        |kept AS (SELECT k AS c_custkey, seg AS c_mktsegment,
        |                CAST(0 AS BIGINT) AS valid_from_us,
        |                CASE WHEN nseg IS NOT NULL AND nseg <> seg THEN ts END AS valid_to_us,
        |                NOT (nseg IS NOT NULL AND nseg <> seg) AS is_current
        |         FROM j),
        |fresh AS (SELECT k, nseg, ts, CAST(NULL AS BIGINT), true
        |          FROM j WHERE nseg IS NOT NULL AND nseg <> seg),
        |novel AS (SELECT ch.k, ch.nseg, ch.ts, CAST(NULL AS BIGINT), true
        |          FROM ch LEFT JOIN dim ON ch.k = dim.k WHERE dim.k IS NULL)
        |SELECT * FROM kept
        |UNION ALL SELECT * FROM fresh
        |UNION ALL SELECT * FROM novel
        |ORDER BY c_custkey, valid_from_us""".stripMargin,

    // the same versioned dimension as scd2_apply, then the
    // point-in-time range join at ts in {0, 2*batchTs}
    "scd2_lookup" ->
      """WITH dim AS (SELECT c_custkey AS k, c_mktsegment AS seg FROM customer),
        |ch AS (SELECT c_custkey AS k, 'DELINQUENT' AS nseg,
        |              CAST(86400000000 AS BIGINT) AS ts
        |       FROM customer WHERE c_acctbal < 0
        |       UNION ALL
        |       SELECT c_custkey, c_mktsegment, CAST(86400000000 AS BIGINT)
        |       FROM customer WHERE c_acctbal >= 0 AND c_acctbal < 100
        |       UNION ALL
        |       SELECT c_custkey + 10000000, 'FIRSTCONTACT', CAST(86400000000 AS BIGINT)
        |       FROM customer WHERE c_acctbal > 9000),
        |j AS (SELECT dim.k, dim.seg, ch.nseg, ch.ts
        |      FROM dim LEFT JOIN ch ON dim.k = ch.k),
        |v AS (SELECT k AS c_custkey, seg AS c_mktsegment,
        |             CAST(0 AS BIGINT) AS valid_from_us,
        |             CASE WHEN nseg IS NOT NULL AND nseg <> seg THEN ts END AS valid_to_us
        |      FROM j
        |      UNION ALL
        |      SELECT k, nseg, ts, CAST(NULL AS BIGINT)
        |      FROM j WHERE nseg IS NOT NULL AND nseg <> seg
        |      UNION ALL
        |      SELECT ch.k, ch.nseg, ch.ts, CAST(NULL AS BIGINT)
        |      FROM ch LEFT JOIN dim ON ch.k = dim.k WHERE dim.k IS NULL),
        |f AS (SELECT o_orderkey, o_custkey,
        |             (o_orderkey % 2) * CAST(172800000000 AS BIGINT) AS at_us
        |      FROM orders)
        |SELECT f.o_orderkey, f.o_custkey, f.at_us, v.c_mktsegment
        |FROM f LEFT JOIN v ON f.o_custkey = v.c_custkey
        |  AND v.valid_from_us <= f.at_us
        |  AND (v.valid_to_us IS NULL OR f.at_us < v.valid_to_us)
        |ORDER BY f.o_orderkey""".stripMargin,

    // Tukey-fence outlier audit: replays the exact interpolated
    // quartiles (distinct-value cumsum rank picks) and the ×200
    // integer-scaled fence arithmetic — no division anywhere, so the
    // decimal comparisons are bit-identical cross-engine
    "profile_outliers" -> {
      val cols = Seq("o_totalprice", "o_custkey")
      val u = (cols.map(c =>
        s"SELECT '$c' AS col, CAST($c AS DECIMAL(28,6)) AS v FROM orders WHERE $c IS NOT NULL") :+
        "SELECT 'value' AS col, CAST(value AS DECIMAL(28,6)) AS v FROM events WHERE value IS NOT NULL")
        .mkString("\nUNION ALL ")
      s"""WITH u AS (
         |$u),
         |c AS (SELECT col, v, count(*) AS cnt FROM u GROUP BY 1, 2),
         |ns AS (SELECT col, sum(cnt) AS n FROM c GROUP BY 1),
         |r AS (SELECT col, n,
         |        (n-1)*25 // 100 + 1 AS rlo25, (n-1)*25 % 100 AS rem25,
         |        (n-1)*75 // 100 + 1 AS rlo75, (n-1)*75 % 100 AS rem75
         |      FROM ns),
         |cc AS (SELECT col, v, cnt,
         |         sum(cnt) OVER (PARTITION BY col ORDER BY v
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |       FROM c),
         |q AS (SELECT cc.col,
         |        max(r.n) AS n, max(rem25) AS rem25, max(rem75) AS rem75,
         |        min(CASE WHEN cum >= rlo25 THEN v END) AS xlo25,
         |        min(CASE WHEN cum >= rlo25 + CASE WHEN rem25 > 0 THEN 1 ELSE 0 END
         |            THEN v END) AS xhi25,
         |        min(CASE WHEN cum >= rlo75 THEN v END) AS xlo75,
         |        min(CASE WHEN cum >= rlo75 + CASE WHEN rem75 > 0 THEN 1 ELSE 0 END
         |            THEN v END) AS xhi75
         |      FROM cc JOIN r ON cc.col = r.col GROUP BY 1),
         |f AS (SELECT col, n,
         |        CAST(xlo25*200 + rem25*2*(xhi25-xlo25) AS DECIMAL(38,6)) AS q1x,
         |        CAST(xlo75*200 + rem75*2*(xhi75-xlo75) AS DECIMAL(38,6)) AS q3x,
         |        CAST(xlo25*500 + rem25*5*(xhi25-xlo25)
         |             - xlo75*300 - rem75*3*(xhi75-xlo75) AS DECIMAL(38,6)) AS lofx,
         |        CAST(xlo75*500 + rem75*5*(xhi75-xlo75)
         |             - xlo25*300 - rem25*3*(xhi25-xlo25) AS DECIMAL(38,6)) AS hifx
         |      FROM q),
         |o AS (SELECT c.col,
         |        sum(CASE WHEN v*200 < lofx THEN cnt ELSE 0 END) AS n_below,
         |        sum(CASE WHEN v*200 > hifx THEN cnt ELSE 0 END) AS n_above
         |      FROM c JOIN f ON c.col = f.col GROUP BY 1)
         |SELECT f.col AS "column", CAST(f.n AS BIGINT) AS n,
         |       round(CAST(q1x AS DOUBLE)/200, 6) AS q1,
         |       round(CAST(q3x AS DOUBLE)/200, 6) AS q3,
         |       round(CAST(lofx AS DOUBLE)/200, 6) AS lo_fence,
         |       round(CAST(hifx AS DOUBLE)/200, 6) AS hi_fence,
         |       CAST(n_below AS BIGINT) AS n_below,
         |       CAST(n_above AS BIGINT) AS n_above,
         |       round(CAST(n_below + n_above AS DOUBLE) / CAST(f.n AS DOUBLE), 6)
         |         AS out_share
         |FROM f JOIN o ON f.col = o.col
         |ORDER BY 1""".stripMargin
    },

    "profile_skew" -> {
      val cols = Seq("l_returnflag", "l_linestatus", "l_suppkey", "l_partkey")
      val d = cols.map(c =>
        s"SELECT '$c' AS col, CAST($c AS VARCHAR) AS v FROM lineitem WHERE $c IS NOT NULL")
        .mkString("\nUNION ALL ")
      s"""WITH u AS (
         |$d),
         |c AS (SELECT col, v, count(*) AS cnt FROM u GROUP BY 1, 2),
         |a AS (SELECT col, count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS n_rows,
         |             max(cnt) AS max_cnt
         |      FROM c GROUP BY col),
         |t AS (SELECT c.col, max(c.v) AS top_value
         |      FROM c JOIN a ON c.col = a.col AND c.cnt = a.max_cnt
         |      GROUP BY c.col)
         |SELECT a.col AS "column", a.n_keys, a.n_rows, a.max_cnt,
         |       round(CAST(a.max_cnt AS DOUBLE) / CAST(a.n_rows AS DOUBLE), 6) AS max_share,
         |       t.top_value
         |FROM a JOIN t ON a.col = t.col
         |ORDER BY 1""".stripMargin
    },

    // salted-join equivalence gate: the oracle computes the PLAIN
    // unsalted join + aggregate — saltedJoin must reproduce it exactly
    "q_skew_salted" ->
      """WITH dim AS (SELECT l_returnflag, count(*) AS cnt,
        |                    sum(CAST(l_discount AS DECIMAL(18,6))) AS s
        |             FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag, CAST(count(*) AS BIGINT) AS n_total,
        |       CAST(sum(CASE WHEN CAST(l.l_discount AS DECIMAL(18,6)) * d.cnt > d.s
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_above
        |FROM lineitem l JOIN dim d ON l.l_returnflag = d.l_returnflag
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // mergeable-HLL distinct gate: exact per-lang (and global) token
    // vocabularies recomputed; the tolerance booleans are literal true
    // (the sketch-gate pattern — an estimator or union regression
    // flips a row and fails the hash)
    "profile_distinct_sketch" ->
      s"""WITH d AS (SELECT lang, unnest(${toks("text")}) AS tok FROM documents),
         |g AS (SELECT lang AS scope, CAST(count(DISTINCT tok) AS BIGINT) AS n_exact
         |      FROM d GROUP BY 1),
         |a AS (SELECT '*ALL*' AS scope, CAST(count(DISTINCT tok) AS BIGINT) AS n_exact
         |      FROM d)
         |SELECT scope, n_exact, true AS within_tol
         |FROM (SELECT * FROM g UNION ALL SELECT * FROM a)
         |ORDER BY scope""".stripMargin,

    // literal-true gate: the per-source-pair MinHash overlap estimates
    // must land within tolerance of the exact vocabulary overlap —
    // the oracle is the expected all-true pair matrix
    "profile_source_overlap" ->
      """SELECT a.source AS source_1, b.source AS source_2,
        |       TRUE AS jaccard_ok, TRUE AS containment_1_ok,
        |       TRUE AS containment_2_ok
        |FROM (SELECT DISTINCT source FROM documents) a
        |JOIN (SELECT DISTINCT source FROM documents) b ON a.source < b.source
        |ORDER BY source_1, source_2""".stripMargin,

    // running-ledger window battery: row_number, lag gap, DECIMAL
    // running sum (summation-tree-independent), ntile — one window
    "q_customer_ledger" ->
      """SELECT o_custkey, o_orderkey,
        |       CAST(row_number() OVER w AS BIGINT) AS seq,
        |       epoch_us(o_orderdate) - lag(epoch_us(o_orderdate), 1) OVER w AS gap_us,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |            OVER (PARTITION BY o_custkey
        |                  ORDER BY o_orderdate ASC, o_orderkey ASC
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            AS DOUBLE) AS cum_spend,
        |       CAST(ntile(4) OVER w AS INTEGER) AS seq_quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate ASC, o_orderkey ASC)
        |ORDER BY o_custkey, seq""".stripMargin,

    // last-touch attribution twin: the windowed pair join, the
    // latest-click (then highest-id) argmax per conversion, and the
    // candidate count — exact integer microseconds throughout
    "events_attribution" ->
      """WITH c AS (SELECT user_id, epoch_us(ts) AS cus, event_id AS click_id
        |           FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, epoch_us(ts) AS pus, event_id AS conv_id
        |      FROM events WHERE event_type = 'purchase'),
        |pairs AS (SELECT p.conv_id, p.user_id, p.pus, c.click_id, c.cus
        |          FROM p JOIN c ON p.user_id = c.user_id
        |          WHERE p.pus >= c.cus
        |            AND p.pus - c.cus <= CAST(21600000000 AS BIGINT)),
        |ranked AS (SELECT conv_id, user_id, pus, click_id, cus,
        |                  row_number() OVER (PARTITION BY conv_id
        |                    ORDER BY cus DESC, click_id DESC) AS rk,
        |                  count(*) OVER (PARTITION BY conv_id) AS n_candidates
        |           FROM pairs)
        |SELECT conv_id, user_id, pus AS conv_us, click_id, cus AS click_us,
        |       pus - cus AS gap_us, n_candidates
        |FROM ranked WHERE rk = 1
        |ORDER BY conv_id""".stripMargin,

    // seasonal-baseline anomaly twin: replays the day-of-week
    // baseline and the INTEGER z-test (n·c − S)² > k²·(n·Q − S²) —
    // no division, so every flag decides on exact integer compares
    "events_seasonal" ->
      """WITH daily AS (SELECT event_type,
        |                      epoch_us(ts) - epoch_us(ts) % 86400000000 AS day_us,
        |                      count(*) AS cnt
        |               FROM events GROUP BY 1, 2),
        |d AS (SELECT event_type, day_us, cnt,
        |             CAST((day_us // 86400000000) % 7 AS INTEGER) AS dow
        |      FROM daily),
        |b AS (SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n_dow,
        |             sum(cnt) AS s, sum(cnt * cnt) AS q
        |      FROM d GROUP BY 1, 2)
        |SELECT d.event_type, d.day_us, d.dow, d.cnt, b.n_dow,
        |       round(CAST(b.s AS DOUBLE) / CAST(b.n_dow AS DOUBLE), 6) AS dow_mean,
        |       (b.n_dow * d.cnt - b.s) * (b.n_dow * d.cnt - b.s)
        |         > 1 * (b.n_dow * b.q - b.s * b.s) AS is_anomaly
        |FROM d JOIN b ON d.event_type = b.event_type AND d.dow = b.dow
        |ORDER BY d.event_type, d.day_us""".stripMargin,

    // daily counts -> exact-decimal CUSUM -> per-type peak |S| argmax
    // exact daily-count autocorrelation: densified calendar, n-scaled
    // deviations (d = n*x - S so the n^2 cancels in the ratio), HUGEINT
    // lag products, one sign-split truncating ppm division at the end
    // Holt-Winters additive weekly: the seven seasonal slots ride as
    // columns s0..s6; every state expression mirrors the Spark fold's
    // operation order, rounded HALF_UP to scale 6 per day
    "events_holt_winters" -> {
      val sPrev = "CASE CAST(d.idx % 7 AS INT) " +
        (0 to 6).map(i => s"WHEN $i THEN hw.s$i").mkString(" ") + " END"
      val lNew = s"CAST(round(0.2 * (d.x - ($sPrev)) + 0.8 * (hw.l + hw.b), 6) AS DECIMAL(26,6))"
      val bNew = s"CAST(round(0.1 * (($lNew) - hw.l) + 0.9 * hw.b, 6) AS DECIMAL(26,6))"
      val sNew = s"CAST(round(0.3 * (d.x - ($lNew)) + 0.7 * ($sPrev), 6) AS DECIMAL(26,6))"
      val sCols = (0 to 6).map(i =>
        s"CASE WHEN CAST(d.idx % 7 AS INT) = $i THEN ($sNew) ELSE hw.s$i END AS s$i")
        .mkString(",\n         ")
      val sZero = (0 to 6).map(i => s"CAST(0 AS DECIMAL(26,6)) AS s$i")
        .mkString(", ")
      s"""WITH RECURSIVE c AS (
         |  SELECT event_type, epoch_us(ts) - epoch_us(ts) % 86400000000 AS day_us,
         |         count(*) AS x
         |  FROM events GROUP BY 1, 2),
         |cal AS (SELECT event_type, d0,
         |               unnest(generate_series(d0, d1, 86400000000)) AS day_us
         |        FROM (SELECT event_type, min(day_us) AS d0, max(day_us) AS d1
         |              FROM c GROUP BY 1)),
         |d AS (SELECT cal.event_type, cal.day_us, coalesce(c.x, 0) AS x,
         |             (cal.day_us - cal.d0) // 86400000000 AS idx
         |      FROM cal LEFT JOIN c USING (event_type, day_us)),
         |hw AS (
         |  SELECT event_type, idx, day_us, x,
         |         CAST(x AS DECIMAL(26,6)) AS l, CAST(0 AS DECIMAL(26,6)) AS b,
         |         CAST(0 AS DECIMAL(26,6)) AS sn,
         |         CAST(NULL AS DECIMAL(26,6)) AS f,
         |         $sZero
         |  FROM d WHERE idx = 0
         |  UNION ALL
         |  SELECT d.event_type, d.idx, d.day_us, d.x,
         |         $lNew, $bNew, $sNew,
         |         CAST(hw.l + hw.b + ($sPrev) AS DECIMAL(26,6)),
         |         $sCols
         |  FROM hw JOIN d ON d.event_type = hw.event_type AND d.idx = hw.idx + 1)
         |SELECT event_type, day_us, CAST(x AS BIGINT) AS n_events,
         |       CAST(l AS DOUBLE) AS level, CAST(b AS DOUBLE) AS trend,
         |       CAST(sn AS DOUBLE) AS seasonal, CAST(f AS DOUBLE) AS forecast,
         |       CAST(CAST(x AS DECIMAL(26,6)) - f AS DOUBLE) AS residual
         |FROM hw ORDER BY event_type, day_us""".stripMargin
    },

    // Holt linear smoothing: the twin walks the identical rounded
    // DECIMAL(26,6) state sequence through a recursive CTE (idx joins
    // the densified calendar day by day)
    "events_holt" ->
      """WITH RECURSIVE c AS (
        |  SELECT event_type, epoch_us(ts) - epoch_us(ts) % 86400000000 AS day_us,
        |         count(*) AS x
        |  FROM events GROUP BY 1, 2),
        |cal AS (SELECT event_type,
        |               unnest(generate_series(d0, d1, 86400000000)) AS day_us
        |        FROM (SELECT event_type, min(day_us) AS d0, max(day_us) AS d1
        |              FROM c GROUP BY 1)),
        |d AS (SELECT cal.event_type, cal.day_us, coalesce(c.x, 0) AS x,
        |             row_number() OVER (PARTITION BY cal.event_type
        |               ORDER BY cal.day_us) - 1 AS idx
        |      FROM cal LEFT JOIN c USING (event_type, day_us)),
        |hw AS (
        |  SELECT event_type, idx, day_us, x,
        |         CAST(x AS DECIMAL(26,6)) AS l, CAST(0 AS DECIMAL(26,6)) AS b,
        |         CAST(NULL AS DECIMAL(26,6)) AS f
        |  FROM d WHERE idx = 0
        |  UNION ALL
        |  SELECT d.event_type, d.idx, d.day_us, d.x,
        |         CAST(round(0.2 * d.x + 0.8 * (hw.l + hw.b), 6) AS DECIMAL(26,6)),
        |         CAST(round(0.1 * (CAST(round(0.2 * d.x + 0.8 * (hw.l + hw.b), 6)
        |                AS DECIMAL(26,6)) - hw.l) + 0.9 * hw.b, 6) AS DECIMAL(26,6)),
        |         CAST(hw.l + hw.b AS DECIMAL(26,6))
        |  FROM hw JOIN d ON d.event_type = hw.event_type AND d.idx = hw.idx + 1)
        |SELECT event_type, day_us, CAST(x AS BIGINT) AS n_events,
        |       CAST(l AS DOUBLE) AS level, CAST(b AS DOUBLE) AS trend,
        |       CAST(f AS DOUBLE) AS forecast,
        |       CAST(CAST(x AS DECIMAL(26,6)) - f AS DOUBLE) AS residual
        |FROM hw ORDER BY event_type, day_us""".stripMargin,

    "events_acf" ->
      """WITH counts AS (SELECT event_type,
        |                       epoch_us(ts) - epoch_us(ts) % 86400000000 AS day_us,
        |                       count(*)::HUGEINT AS x
        |                FROM events GROUP BY 1, 2),
        |cal AS (SELECT event_type,
        |               unnest(range(d0, d1 + 86400000000, 86400000000)) AS day_us
        |        FROM (SELECT event_type, min(day_us) AS d0, max(day_us) AS d1
        |              FROM counts GROUP BY 1)),
        |daily AS (SELECT c.event_type, c.day_us,
        |                 coalesce(x, 0)::HUGEINT AS x
        |          FROM cal c LEFT JOIN counts USING (event_type, day_us)),
        |st AS (SELECT event_type, count(*)::HUGEINT AS n_days, sum(x) AS sx
        |       FROM daily GROUP BY 1),
        |dev AS (SELECT d.event_type, d.day_us, st.n_days,
        |               st.n_days * d.x - st.sx AS dv
        |        FROM daily d JOIN st USING (event_type)),
        |nums AS (SELECT a.event_type, l.lag, max(a.n_days) AS n_days,
        |                sum(a.dv * b.dv) AS num
        |         FROM dev a
        |         CROSS JOIN (SELECT unnest(range(0, 8))::BIGINT AS lag) l
        |         JOIN dev b ON b.event_type = a.event_type
        |                   AND b.day_us = a.day_us + l.lag * 86400000000
        |         GROUP BY 1, 2),
        |dn AS (SELECT event_type, num AS den FROM nums WHERE lag = 0)
        |SELECT n.event_type, CAST(n.lag AS BIGINT) AS lag,
        |       CAST(n.n_days AS BIGINT) AS n_days,
        |       CASE WHEN den > 0 THEN CAST((CASE WHEN num >= 0
        |         THEN (num * 1000000) // den
        |         ELSE -((-(num * 1000000)) // den) END) AS BIGINT)
        |       ELSE NULL END AS acf_ppm
        |FROM nums n JOIN dn USING (event_type)
        |ORDER BY event_type, lag""".stripMargin,

    // skyline: the NOT EXISTS strict-domination definition, replayed
    // directly (sf0.01-sized); duplicates survive together (strict)
    "q_skyline" ->
      """SELECT a.p_partkey, a.p_retailprice, a.p_size
        |FROM part a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part b
        |  WHERE b.p_retailprice <= a.p_retailprice
        |    AND b.p_size <= a.p_size
        |    AND (b.p_retailprice < a.p_retailprice OR b.p_size < a.p_size))
        |ORDER BY a.p_partkey""".stripMargin,

    "events_changepoint" ->
      """WITH daily AS (SELECT event_type,
        |                      epoch_us(ts) - epoch_us(ts) % 86400000000 AS day_us,
        |                      count(*) AS x
        |               FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |              CAST(round(CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        |                   AS DECIMAL(20,6)) AS mean
        |       FROM daily GROUP BY 1),
        |cs AS (SELECT d.event_type, d.day_us, st.n_days,
        |              sum(CAST(d.x AS DECIMAL(20,6)) - st.mean)
        |                OVER (PARTITION BY d.event_type ORDER BY d.day_us
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
        |       FROM daily d JOIN st ON d.event_type = st.event_type),
        |r AS (SELECT event_type, day_us, n_days, s,
        |        row_number() OVER (PARTITION BY event_type
        |               ORDER BY abs(s) DESC, day_us ASC) AS rk
        |      FROM cs)
        |SELECT event_type, day_us AS cp_day_us,
        |       round(CAST(abs(s) AS DOUBLE), 6) AS peak_abs_cusum, n_days
        |FROM r WHERE rk = 1 ORDER BY event_type""".stripMargin,

    "zorder_key" -> {
      // the same 16-bit interleave as Sources.zValue, unrolled
      def interleave(col: String, off: Int) = (0 until 16).map(i =>
        s"((($col >> $i) & 1) * ${1L << (2 * i + off)})").mkString(" + ")
      s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         |       ${interleave("l_partkey", 0)}
         |       + ${interleave("l_suppkey", 1)} AS zval
         |FROM lineitem
         |ORDER BY zval ASC, l_orderkey ASC, l_linenumber ASC LIMIT 50""".stripMargin
    },

    "graph_degree" ->
      s"""WITH $shipmentEdgesCte,
         |o AS (SELECT src AS node, count(*) AS degree FROM e0 GROUP BY 1),
         |i AS (SELECT dst AS node, count(*) AS degree FROM e0 GROUP BY 1)
         |SELECT 'out' AS side, degree, count(*) AS n_nodes FROM o GROUP BY degree
         |UNION ALL
         |SELECT 'in' AS side, degree, count(*) AS n_nodes FROM i GROUP BY degree
         |ORDER BY side, degree""".stripMargin,

    "graph_triangles" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |pr AS (SELECT x.pk AS a, y.pk AS b
        |       FROM op x JOIN op y ON x.ok = y.ok AND x.pk < y.pk
        |       GROUP BY 1, 2 HAVING count(*) >= 2),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |        FROM pr e1
        |        JOIN pr e2 ON e1.b = e2.a
        |        JOIN pr e3 ON e1.a = e3.a AND e2.b = e3.b),
        |nodes AS (SELECT x AS node FROM tri
        |          UNION ALL SELECT y FROM tri
        |          UNION ALL SELECT z FROM tri)
        |SELECT node, count(*) AS n_triangles FROM nodes GROUP BY node
        |ORDER BY n_triangles DESC, node ASC LIMIT 20""".stripMargin,

    // local clustering coefficients: triangle counts + degrees over
    // the same co-order graph; lcc_ppm = (2*tri*1e6) // (deg*(deg-1))
    // in HUGEINT — non-negative operands, engine-identical truncation
    "graph_clustering" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |pr AS (SELECT x.pk AS a, y.pk AS b
        |       FROM op x JOIN op y ON x.ok = y.ok AND x.pk < y.pk
        |       GROUP BY 1, 2 HAVING count(*) >= 2),
        |dg AS (SELECT node, count(*) AS deg FROM (
        |         SELECT a AS node FROM pr UNION ALL SELECT b FROM pr)
        |       GROUP BY node),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |        FROM pr e1
        |        JOIN pr e2 ON e1.b = e2.a
        |        JOIN pr e3 ON e1.a = e3.a AND e2.b = e3.b),
        |tc AS (SELECT node, count(*) AS n_tri FROM (
        |         SELECT x AS node FROM tri
        |         UNION ALL SELECT y FROM tri
        |         UNION ALL SELECT z FROM tri) GROUP BY node)
        |SELECT d.node, CAST(d.deg AS BIGINT) AS deg,
        |       CAST(coalesce(tc.n_tri, 0) AS BIGINT) AS n_triangles,
        |       CAST((2 * coalesce(tc.n_tri, 0)::HUGEINT * 1000000)
        |            // (d.deg::HUGEINT * (d.deg - 1)) AS BIGINT) AS lcc_ppm
        |FROM dg d LEFT JOIN tc ON d.node = tc.node
        |WHERE d.deg >= 2
        |ORDER BY lcc_ppm DESC, deg DESC, d.node ASC LIMIT 20""".stripMargin,

    // generic connected components over the co-order part graph:
    // component label = min reachable id, via transitive closure
    // (support >= 3 keeps the closure component-sized)
    "graph_components" ->
      """WITH RECURSIVE op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |p AS (SELECT x.pk AS id1, y.pk AS id2
        |      FROM op x JOIN op y ON x.ok = y.ok AND x.pk < y.pk
        |      GROUP BY 1, 2 HAVING count(*) >= 3),
        |e AS (SELECT id1 AS a, id2 AS b FROM p UNION SELECT id2, id1 FROM p),
        |closure AS (
        |  SELECT a, b FROM e
        |  UNION
        |  SELECT closure.a, e.b FROM closure JOIN e ON closure.b = e.a)
        |SELECT a AS id, least(a, min(b)) AS component
        |FROM closure GROUP BY a ORDER BY id""".stripMargin,

    // synchronous deterministic label propagation, the SAME fixed
    // rounds unrolled: each round = neighbor-label counts -> per-node
    // argmax under (count desc, label asc)
    "graph_communities" -> labelPropagationSql(iters = 5),

    // modularity of those communities, division-free (Q scaled by
    // the constant 4m^2 -> exact integer columns)
    "graph_modularity" -> modularitySql(iters = 5),

    // synchronous k-core peeling, the SAME fixed rounds unrolled:
    // each round = surviving degrees -> keep >= k -> re-filter edges
    "graph_kcore" -> kCoreSql(k = 3, rounds = 8),

    // bounded multi-source BFS, the SAME fixed rounds unrolled:
    // each round = frontier-edge expansion unioned in, min per node
    "graph_bfs" -> bfsSql(rounds = 4),
    "graph_harmonic" -> harmonicSql(rounds = 4),

    // link prediction: the pivot cap (64, mirroring the wired query)
    // is part of the gated contract; PA products in HUGEINT (the
    // overflow policy), BIGINT result; (cn, pa, a, b) is a total
    // order so the LIMIT is deterministic
    "graph_linkpred" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |p AS (SELECT x.pk AS id1, y.pk AS id2
        |      FROM op x JOIN op y ON x.ok = y.ok AND x.pk < y.pk
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |e AS MATERIALIZED (SELECT id1 AS a, id2 AS b FROM p
        |                   UNION SELECT id2, id1 FROM p),
        |deg AS MATERIALIZED (SELECT a AS node, count(*) AS deg FROM e GROUP BY 1),
        |piv AS (SELECT e.a AS w, e.b AS n
        |        FROM e JOIN deg ON deg.node = e.a WHERE deg.deg <= 64),
        |cand AS (SELECT x.n AS a, y.n AS b, count(*) AS cn
        |         FROM piv x JOIN piv y ON x.w = y.w AND x.n < y.n
        |         GROUP BY 1, 2),
        |nonadj AS (SELECT c.a, c.b, c.cn FROM cand c
        |           LEFT JOIN p ON p.id1 = c.a AND p.id2 = c.b
        |           WHERE p.id1 IS NULL)
        |SELECT n.a, n.b, n.cn,
        |       CAST(CAST(da.deg AS HUGEINT) * CAST(db.deg AS HUGEINT)
        |         AS BIGINT) AS pa
        |FROM nonadj n
        |JOIN deg da ON da.node = n.a
        |JOIN deg db ON db.node = n.b
        |ORDER BY cn DESC, pa DESC, a ASC, b ASC LIMIT 100""".stripMargin,

    // Adamic-Adar variant: the 1/ln(deg) table comes from the SAME
    // Graph.aaTable call the Spark plan embeds — both engines sum
    // identical integer literals (zero drift by construction)
    "graph_linkpred_aa" -> {
      val vals = graft.operators.Graph.aaTable(64, 1000000L)
        .map { case (d, v) => s"($d, $v)" }.mkString(", ")
      s"""WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |tbl(d, aaw) AS (VALUES $vals),
         |p AS (SELECT x.pk AS id1, y.pk AS id2
         |      FROM op x JOIN op y ON x.ok = y.ok AND x.pk < y.pk
         |      GROUP BY 1, 2 HAVING count(*) >= 2),
         |e AS MATERIALIZED (SELECT id1 AS a, id2 AS b FROM p
         |                   UNION SELECT id2, id1 FROM p),
         |deg AS MATERIALIZED (SELECT a AS node, count(*) AS deg FROM e GROUP BY 1),
         |piv AS (SELECT e.a AS w, e.b AS n, deg.deg AS wdeg
         |        FROM e JOIN deg ON deg.node = e.a WHERE deg.deg <= 64),
         |cand AS (SELECT x.n AS a, y.n AS b, count(*) AS cn,
         |                sum(t.aaw) AS aa_num
         |         FROM piv x JOIN piv y ON x.w = y.w AND x.n < y.n
         |         JOIN tbl t ON t.d = x.wdeg
         |         GROUP BY 1, 2),
         |nonadj AS (SELECT c.a, c.b, c.cn, c.aa_num FROM cand c
         |           LEFT JOIN p ON p.id1 = c.a AND p.id2 = c.b
         |           WHERE p.id1 IS NULL)
         |SELECT n.a, n.b, n.cn,
         |       CAST(CAST(da.deg AS HUGEINT) * CAST(db.deg AS HUGEINT)
         |         AS BIGINT) AS pa,
         |       CAST(n.aa_num AS BIGINT) AS aa_num
         |FROM nonadj n
         |JOIN deg da ON da.node = n.a
         |JOIN deg db ON db.node = n.b
         |ORDER BY aa_num DESC, cn DESC, pa DESC, a ASC, b ASC
         |LIMIT 100""".stripMargin
    },

    // min-plus Bellman-Ford rounds over the weighted co-order graph,
    // the SAME fixed rounds unrolled
    "graph_sssp" -> ssspSql(rounds = 4),

    // the bloom prefilter must be INVISIBLE in the result: the oracle
    // is the plain join (false positives fall out at the join)
    "q_bloom_prefilter" ->
      """SELECT l_suppkey AS s_suppkey, s_name, count(*) AS n_items,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
        |         AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |WHERE s_nationkey = 3
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    // DuckDB's IEJoin handles the raw inequality overlap directly —
    // the grid machinery is the Spark side's scale path, the PAIRS
    // are the contract
    "interval_join" ->
      """WITH a AS (SELECT event_id AS a_id, user_id, epoch_us(ts) AS a_s,
        |                  epoch_us(ts) + 1800000000 AS a_e
        |           FROM events WHERE event_type = 'error'),
        |b AS (SELECT event_id AS b_id, user_id, epoch_us(ts) AS b_s,
        |             epoch_us(ts) + 600000000 AS b_e
        |      FROM events WHERE event_type = 'view')
        |SELECT a_id, b_id,
        |       least(a_e, b_e) - greatest(a_s, b_s) AS overlap_us
        |FROM a JOIN b ON a.user_id = b.user_id
        |               AND a.a_s < b.b_e AND b.b_s < a.a_e
        |ORDER BY a_id, b_id""".stripMargin,

    "er_resolve" ->
      """WITH a AS (SELECT c_custkey AS id_a, c_name AS name_a,
        |                  c_nationkey AS nat, c_mktsegment AS seg FROM customer),
        |b AS (SELECT c_custkey + 1000000 AS id_b,
        |             regexp_replace(c_name, '0+', '0', 'g') AS name_b,
        |             c_nationkey AS nat, c_mktsegment AS seg
        |      FROM customer WHERE c_custkey % 7 != 3),
        |cand AS (SELECT b.id_b, a.id_a,
        |                levenshtein(a.name_a, b.name_b) AS lev
        |         FROM a JOIN b ON a.nat = b.nat AND a.seg = b.seg
        |         WHERE levenshtein(a.name_a, b.name_b) <= 6),
        |scored AS (SELECT id_b, id_a, lev,
        |                  count(*) OVER (PARTITION BY id_b) AS n_candidates,
        |                  row_number() OVER (PARTITION BY id_b
        |                    ORDER BY lev, id_a) AS rn
        |           FROM cand)
        |SELECT id_b, id_a, CAST(lev AS INTEGER) AS lev,
        |       CAST(n_candidates AS BIGINT) AS n_candidates
        |FROM scored WHERE rn = 1 ORDER BY id_b""".stripMargin,

    // Fellegi-Sunter EM linkage (r19): the twin replays all 15
    // unrolled EM rounds term-for-term over the 8-pattern contingency
    // table — same canonical operation order (patterns ascend,
    // factors ascend, sums left-associate), same per-round
    // [1e-6, 1-1e-6] clamps, same floor(posterior*1e6) fixed point.
    // Every numeric literal is e-notation so DuckDB parses DOUBLE
    // (a bare 0.1 is DECIMAL there) and the IEEE trees match Scala's.
    "er_resolve_fs" -> erFsSql,
    "er_resolve_fs_bands" -> erFsBandsSql,

    // Jaro-Winkler sibling: scores in ppm fixed point on BOTH engines
    // (floor(jw*1e6) — the Spark kernel is calibrated to DuckDB's
    // rapidfuzz-derived semantics), argmax on (jw_ppm DESC, id_a)
    "er_resolve_jw" ->
      """WITH a AS (SELECT c_custkey AS id_a, c_name AS name_a,
        |                  c_nationkey AS nat, c_mktsegment AS seg FROM customer),
        |b AS (SELECT c_custkey + 1000000 AS id_b,
        |             regexp_replace(c_name, '0+', '0', 'g') AS name_b,
        |             c_nationkey AS nat, c_mktsegment AS seg
        |      FROM customer WHERE c_custkey % 7 != 3),
        |cand AS (SELECT b.id_b, a.id_a,
        |                CAST(floor(jaro_winkler_similarity(a.name_a, b.name_b)
        |                           * 1e6) AS BIGINT) AS jw_ppm
        |         FROM a JOIN b ON a.nat = b.nat AND a.seg = b.seg),
        |kept AS (SELECT * FROM cand WHERE jw_ppm >= 900000),
        |scored AS (SELECT id_b, id_a, jw_ppm,
        |                  count(*) OVER (PARTITION BY id_b) AS n_candidates,
        |                  row_number() OVER (PARTITION BY id_b
        |                    ORDER BY jw_ppm DESC, id_a) AS rn
        |           FROM kept)
        |SELECT id_b, id_a, jw_ppm,
        |       CAST(n_candidates AS BIGINT) AS n_candidates
        |FROM scored WHERE rn = 1 ORDER BY id_b""".stripMargin,

    // survivorship: er_resolve's link CTE chain, then per-cluster
    // majority vote with (votes desc, master-priority, value asc)
    // resolution — all-integer, value ties on binary string order
    "er_golden" ->
      """WITH a AS (SELECT c_custkey AS id_a, c_name AS name_a,
        |                  c_nationkey AS nat, c_mktsegment AS seg FROM customer),
        |b AS (SELECT c_custkey + 1000000 AS id_b,
        |             regexp_replace(c_name, '0+', '0', 'g') AS name_b,
        |             c_nationkey AS nat, c_mktsegment AS seg
        |      FROM customer WHERE c_custkey % 7 != 3),
        |cand AS (SELECT b.id_b, a.id_a,
        |                levenshtein(a.name_a, b.name_b) AS lev
        |         FROM a JOIN b ON a.nat = b.nat AND a.seg = b.seg
        |         WHERE levenshtein(a.name_a, b.name_b) <= 6),
        |links AS (SELECT id_b, id_a FROM (
        |            SELECT id_b, id_a, row_number() OVER (PARTITION BY id_b
        |              ORDER BY lev, id_a) AS rn FROM cand)
        |          WHERE rn = 1),
        |members AS (SELECT id_a AS cid, 1 AS m, name_a AS name, nat, seg FROM a
        |            UNION ALL
        |            SELECT l.id_a, 0, b.name_b, b.nat, b.seg
        |            FROM links l JOIN b USING (id_b)),
        |unp AS (SELECT cid, m, 'name' AS attribute, name AS value FROM members
        |        UNION ALL
        |        SELECT cid, m, 'nat', CAST(nat AS VARCHAR) FROM members
        |        UNION ALL
        |        SELECT cid, m, 'seg', seg FROM members),
        |votes AS (SELECT cid, attribute, value,
        |                 count(*) AS n_votes, max(m) AS mm
        |          FROM unp WHERE value IS NOT NULL GROUP BY 1, 2, 3),
        |ranked AS (SELECT cid, attribute, value, n_votes,
        |                  count(*) OVER (PARTITION BY cid, attribute) AS n_distinct,
        |                  row_number() OVER (PARTITION BY cid, attribute
        |                    ORDER BY n_votes DESC, mm DESC, value) AS rn
        |           FROM votes)
        |SELECT cid AS id_a, attribute, value,
        |       CAST(n_votes AS BIGINT) AS n_votes,
        |       CAST(n_distinct AS BIGINT) AS n_distinct
        |FROM ranked WHERE rn = 1 ORDER BY id_a, attribute""".stripMargin,

    // served-index equality gate: the pruned-partition read feeds the
    // IDENTICAL join/score/resolve, so the oracle is er_resolve's SQL
    "er_resolve_idx" ->
      """WITH a AS (SELECT c_custkey AS id_a, c_name AS name_a,
        |                  c_nationkey AS nat, c_mktsegment AS seg FROM customer),
        |b AS (SELECT c_custkey + 1000000 AS id_b,
        |             regexp_replace(c_name, '0+', '0', 'g') AS name_b,
        |             c_nationkey AS nat, c_mktsegment AS seg
        |      FROM customer WHERE c_custkey % 7 != 3),
        |cand AS (SELECT b.id_b, a.id_a,
        |                levenshtein(a.name_a, b.name_b) AS lev
        |         FROM a JOIN b ON a.nat = b.nat AND a.seg = b.seg
        |         WHERE levenshtein(a.name_a, b.name_b) <= 6),
        |scored AS (SELECT id_b, id_a, lev,
        |                  count(*) OVER (PARTITION BY id_b) AS n_candidates,
        |                  row_number() OVER (PARTITION BY id_b
        |                    ORDER BY lev, id_a) AS rn
        |           FROM cand)
        |SELECT id_b, id_a, CAST(lev AS INTEGER) AS lev,
        |       CAST(n_candidates AS BIGINT) AS n_candidates
        |FROM scored WHERE rn = 1 ORDER BY id_b""".stripMargin,

    // sorted-neighborhood replay: row_number over the merged
    // (sort-key, side, id) total order == Spark's range-partitioned
    // global rank (binary string collation both engines); window 8 →
    // cross-source pairs at rank distance 1..7
    "er_resolve_sorted" ->
      """WITH a AS (SELECT c_custkey AS id_a, c_name AS name_a,
        |                  regexp_replace(c_name, '0+', '0', 'g') AS skey
        |           FROM customer),
        |b AS (SELECT c_custkey + 1000000 AS id_b,
        |             regexp_replace(c_name, '0+', '0', 'g') AS name_b
        |      FROM customer WHERE c_custkey % 7 != 3),
        |u AS (SELECT skey AS k, 0 AS side, id_a AS id, name_a AS nm FROM a
        |      UNION ALL
        |      SELECT name_b, 1, id_b, name_b FROM b),
        |r AS (SELECT k, side, id, nm,
        |             row_number() OVER (ORDER BY k, side, id) AS rnk
        |      FROM u),
        |p AS (SELECT CASE WHEN x.side = 0 THEN x.id ELSE y.id END AS id_a,
        |             CASE WHEN x.side = 0 THEN x.nm ELSE y.nm END AS name_a,
        |             CASE WHEN x.side = 0 THEN y.id ELSE x.id END AS id_b,
        |             CASE WHEN x.side = 0 THEN y.nm ELSE x.nm END AS name_b
        |      FROM r x JOIN r y ON y.rnk - x.rnk BETWEEN 1 AND 7
        |                       AND x.side != y.side),
        |cand AS (SELECT id_b, id_a,
        |                levenshtein(name_a, name_b) AS lev
        |         FROM p WHERE levenshtein(name_a, name_b) <= 6),
        |scored AS (SELECT id_b, id_a, lev,
        |                  count(*) OVER (PARTITION BY id_b) AS n_candidates,
        |                  row_number() OVER (PARTITION BY id_b
        |                    ORDER BY lev, id_a) AS rn
        |           FROM cand)
        |SELECT id_b, id_a, CAST(lev AS INTEGER) AS lev,
        |       CAST(n_candidates AS BIGINT) AS n_candidates
        |FROM scored WHERE rn = 1 ORDER BY id_b""".stripMargin,

    // SNM + Jaro-Winkler (r17): the er_resolve_sorted rank-band
    // replay with er_resolve_jw's integer ppm scoring — floor(jw·1e6)
    // ≥ 900000 keep, (jw_ppm desc, id_a asc) argmax
    "er_resolve_sorted_jw" ->
      """WITH a AS (SELECT c_custkey AS id_a, c_name AS name_a,
        |                  regexp_replace(c_name, '0+', '0', 'g') AS skey
        |           FROM customer),
        |b AS (SELECT c_custkey + 1000000 AS id_b,
        |             regexp_replace(c_name, '0+', '0', 'g') AS name_b
        |      FROM customer WHERE c_custkey % 7 != 3),
        |u AS (SELECT skey AS k, 0 AS side, id_a AS id, name_a AS nm FROM a
        |      UNION ALL
        |      SELECT name_b, 1, id_b, name_b FROM b),
        |r AS (SELECT k, side, id, nm,
        |             row_number() OVER (ORDER BY k, side, id) AS rnk
        |      FROM u),
        |p AS (SELECT CASE WHEN x.side = 0 THEN x.id ELSE y.id END AS id_a,
        |             CASE WHEN x.side = 0 THEN x.nm ELSE y.nm END AS name_a,
        |             CASE WHEN x.side = 0 THEN y.id ELSE x.id END AS id_b,
        |             CASE WHEN x.side = 0 THEN y.nm ELSE x.nm END AS name_b
        |      FROM r x JOIN r y ON y.rnk - x.rnk BETWEEN 1 AND 7
        |                       AND x.side != y.side),
        |cand AS (SELECT id_b, id_a,
        |                CAST(floor(jaro_winkler_similarity(name_a, name_b)
        |                           * 1e6) AS BIGINT) AS jw_ppm
        |         FROM p),
        |kept AS (SELECT * FROM cand WHERE jw_ppm >= 900000),
        |scored AS (SELECT id_b, id_a, jw_ppm,
        |                  count(*) OVER (PARTITION BY id_b) AS n_candidates,
        |                  row_number() OVER (PARTITION BY id_b
        |                    ORDER BY jw_ppm DESC, id_a) AS rn
        |           FROM kept)
        |SELECT id_b, id_a, jw_ppm,
        |       CAST(n_candidates AS BIGINT) AS n_candidates
        |FROM scored WHERE rn = 1 ORDER BY id_b""".stripMargin,

    // jaro_winkler value matching (r17): FULL quadratic argmax over
    // the distinct domains (no length-band — the twin independently
    // verifies the wired 5t−4 prune's soundness), floor-ppm keep ≥
    // 900000, (ppm desc, target asc) tie-break, unmatched sources
    // kept by the left join; similarity = one IEEE division of the
    // same integers on both engines
    "match_values_jw" ->
      """WITH src AS (SELECT DISTINCT trim(CAST(p_name AS VARCHAR)) AS source
        |             FROM part WHERE p_size > 40
        |               AND trim(CAST(p_name AS VARCHAR)) IS NOT NULL
        |               AND trim(CAST(p_name AS VARCHAR)) != ''),
        |tgt AS (SELECT DISTINCT trim(CAST(p_name AS VARCHAR)) AS target
        |        FROM part WHERE p_size <= 25
        |          AND trim(CAST(p_name AS VARCHAR)) IS NOT NULL
        |          AND trim(CAST(p_name AS VARCHAR)) != ''),
        |cand AS (SELECT s.source, t.target,
        |                CAST(floor(jaro_winkler_similarity(s.source, t.target)
        |                           * 1e6) AS BIGINT) AS jw_ppm
        |         FROM src s CROSS JOIN tgt t),
        |kept AS (SELECT * FROM cand WHERE jw_ppm >= 900000),
        |best AS (SELECT source, target, jw_ppm,
        |                row_number() OVER (PARTITION BY source
        |                  ORDER BY jw_ppm DESC, target ASC) AS rn
        |         FROM kept)
        |SELECT s.source, b.target, b.jw_ppm,
        |       CAST(b.jw_ppm AS DOUBLE) / 1000000.0 AS similarity
        |FROM src s LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
        |  ON s.source = b.source
        |ORDER BY s.source""".stripMargin,

    // the byte-wise JW kernel's NON-ASCII cross-engine gate (r18):
    // same 8-variant/8-canonical name spines as the Spark builder
    // (CASE doc_id % 8), full quadratic ppm argmax — hash equality
    // proves the kernel reproduces DuckDB's rapidfuzz byte semantics
    // on 2- and 3-byte UTF-8 sequences
    "match_values_jw_unicode" ->
      """WITH src AS (SELECT DISTINCT CASE doc_id % 8
        |    WHEN 0 THEN 'Jose García' WHEN 1 THEN 'Francois Müller'
        |    WHEN 2 THEN 'Søren Kierkegard' WHEN 3 THEN 'Bjorn Åström'
        |    WHEN 4 THEN 'Antonin Dvorák'
        |    WHEN 5 THEN 'Λεωνιδας Παπαδοπουλος'
        |    WHEN 6 THEN 'Дмитрии Иванов'
        |    ELSE 'Maria Silva' END AS source FROM documents),
        |tgt AS (SELECT DISTINCT CASE doc_id % 8
        |    WHEN 0 THEN 'José García' WHEN 1 THEN 'François Müller'
        |    WHEN 2 THEN 'Søren Kierkegård' WHEN 3 THEN 'Björn Åström'
        |    WHEN 4 THEN 'Antonín Dvořák'
        |    WHEN 5 THEN 'Λεωνίδας Παπαδόπουλος'
        |    WHEN 6 THEN 'Дмитрий Иванов'
        |    ELSE 'Maria Silva' END AS target FROM documents),
        |cand AS (SELECT s.source, t.target,
        |                CAST(floor(jaro_winkler_similarity(s.source, t.target)
        |                           * 1e6) AS BIGINT) AS jw_ppm
        |         FROM src s CROSS JOIN tgt t),
        |kept AS (SELECT * FROM cand WHERE jw_ppm >= 800000),
        |best AS (SELECT source, target, jw_ppm,
        |                row_number() OVER (PARTITION BY source
        |                  ORDER BY jw_ppm DESC, target ASC) AS rn
        |         FROM kept)
        |SELECT s.source, b.target, b.jw_ppm,
        |       CAST(b.jw_ppm AS DOUBLE) / 1000000.0 AS similarity
        |FROM src s LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
        |  ON s.source = b.source
        |ORDER BY s.source""".stripMargin,

    // multi-pass SNM replay: two (key, side, id) rank orders — the
    // collapsed name and its reverse — window pairs from each pass
    // UNIONed (dedup), then the shared scoring/argmax
    "er_resolve_multipass" ->
      """WITH a AS (SELECT c_custkey AS id_a, c_name AS name_a,
        |                  regexp_replace(c_name, '0+', '0', 'g') AS k1
        |           FROM customer),
        |b AS (SELECT c_custkey + 1000000 AS id_b,
        |             CASE WHEN c_custkey % 5 = 0
        |                  THEN 'X' || substring(
        |                    regexp_replace(c_name, '0+', '0', 'g'), 2)
        |                  ELSE regexp_replace(c_name, '0+', '0', 'g')
        |             END AS name_b
        |      FROM customer WHERE c_custkey % 7 != 3),
        |u1 AS (SELECT k1 AS k, 0 AS side, id_a AS id, name_a AS nm FROM a
        |       UNION ALL SELECT name_b, 1, id_b, name_b FROM b),
        |r1 AS (SELECT k, side, id, nm,
        |              row_number() OVER (ORDER BY k, side, id) AS rnk
        |       FROM u1),
        |u2 AS (SELECT reverse(k1) AS k, 0 AS side, id_a AS id, name_a AS nm
        |       FROM a
        |       UNION ALL SELECT reverse(name_b), 1, id_b, name_b FROM b),
        |r2 AS (SELECT k, side, id, nm,
        |              row_number() OVER (ORDER BY k, side, id) AS rnk
        |       FROM u2),
        |p AS (SELECT CASE WHEN x.side = 0 THEN x.id ELSE y.id END AS id_a,
        |             CASE WHEN x.side = 0 THEN x.nm ELSE y.nm END AS name_a,
        |             CASE WHEN x.side = 0 THEN y.id ELSE x.id END AS id_b,
        |             CASE WHEN x.side = 0 THEN y.nm ELSE x.nm END AS name_b
        |      FROM r1 x JOIN r1 y ON y.rnk - x.rnk BETWEEN 1 AND 7
        |                         AND x.side != y.side
        |      UNION
        |      SELECT CASE WHEN x.side = 0 THEN x.id ELSE y.id END,
        |             CASE WHEN x.side = 0 THEN x.nm ELSE y.nm END,
        |             CASE WHEN x.side = 0 THEN y.id ELSE x.id END,
        |             CASE WHEN x.side = 0 THEN y.nm ELSE x.nm END
        |      FROM r2 x JOIN r2 y ON y.rnk - x.rnk BETWEEN 1 AND 7
        |                         AND x.side != y.side),
        |cand AS (SELECT id_b, id_a,
        |                levenshtein(name_a, name_b) AS lev
        |         FROM p WHERE levenshtein(name_a, name_b) <= 6),
        |scored AS (SELECT id_b, id_a, lev,
        |                  count(*) OVER (PARTITION BY id_b) AS n_candidates,
        |                  row_number() OVER (PARTITION BY id_b
        |                    ORDER BY lev, id_a) AS rn
        |           FROM cand)
        |SELECT id_b, id_a, CAST(lev AS INTEGER) AS lev,
        |       CAST(n_candidates AS BIGINT) AS n_candidates
        |FROM scored WHERE rn = 1 ORDER BY id_b""".stripMargin,

    // expectation suite: per-check violation counts from one scan;
    // the n_rows/n_violations integers and the pass boolean are the
    // pinned cross-engine types
    "profile_validate" ->
      """WITH n AS (SELECT count(*) AS n_rows FROM orders)
        |SELECT "check", n_rows, n_violations, n_violations = 0 AS pass
        |FROM (
        |  SELECT 'orderkey_positive' AS "check", n.n_rows,
        |         (SELECT count(*) FROM orders
        |          WHERE NOT coalesce(o_orderkey > 0, FALSE)) AS n_violations
        |  FROM n
        |  UNION ALL
        |  SELECT 'status_domain', n.n_rows,
        |         (SELECT count(*) FROM orders
        |          WHERE NOT coalesce(o_orderstatus IN ('O','F','P'), FALSE))
        |  FROM n
        |  UNION ALL
        |  SELECT 'totalprice_positive', n.n_rows,
        |         (SELECT count(*) FROM orders
        |          WHERE NOT coalesce(o_totalprice > 0, FALSE))
        |  FROM n
        |  UNION ALL
        |  SELECT 'orderdate_before_1998', n.n_rows,
        |         (SELECT count(*) FROM orders
        |          WHERE NOT coalesce(
        |            o_orderdate < TIMESTAMP '1998-01-01 00:00:00', FALSE))
        |  FROM n)
        |ORDER BY "check"""".stripMargin,

    // snapshot diff: null-safe comparison via IS NOT DISTINCT FROM
    // (Spark <=>); the mutation arithmetic replays exactly (+10 on a
    // double is IEEE-identical)
    "table_diff" ->
      """WITH bef AS (SELECT c_custkey, c_name, c_mktsegment, c_acctbal
        |             FROM customer),
        |aft AS (
        |  SELECT c_custkey, c_name,
        |         CASE WHEN c_custkey % 17 = 0 THEN 'MUTATED'
        |              ELSE c_mktsegment END AS c_mktsegment,
        |         CASE WHEN c_custkey % 13 = 0 THEN c_acctbal + 10
        |              ELSE c_acctbal END AS c_acctbal
        |  FROM bef WHERE c_custkey % 11 != 4
        |  UNION ALL
        |  SELECT c_custkey + 900000, c_name, c_mktsegment, c_acctbal
        |  FROM bef WHERE c_custkey % 19 = 0),
        |f AS (SELECT b.c_custkey IS NOT NULL AS ia,
        |             a.c_custkey IS NOT NULL AS ib,
        |             NOT (b.c_name IS NOT DISTINCT FROM a.c_name) AS dn,
        |             NOT (b.c_mktsegment IS NOT DISTINCT FROM a.c_mktsegment) AS ds,
        |             NOT (b.c_acctbal IS NOT DISTINCT FROM a.c_acctbal) AS db
        |      FROM bef b FULL OUTER JOIN aft a ON b.c_custkey = a.c_custkey)
        |SELECT kind, CAST(n AS BIGINT) AS n FROM (
        |  SELECT 'rows_before' AS kind,
        |         sum(CASE WHEN ia THEN 1 ELSE 0 END) AS n FROM f
        |  UNION ALL SELECT 'rows_after',
        |         sum(CASE WHEN ib THEN 1 ELSE 0 END) FROM f
        |  UNION ALL SELECT 'added',
        |         sum(CASE WHEN ib AND NOT ia THEN 1 ELSE 0 END) FROM f
        |  UNION ALL SELECT 'removed',
        |         sum(CASE WHEN ia AND NOT ib THEN 1 ELSE 0 END) FROM f
        |  UNION ALL SELECT 'changed',
        |         sum(CASE WHEN ia AND ib AND (dn OR ds OR db)
        |             THEN 1 ELSE 0 END) FROM f
        |  UNION ALL SELECT 'unchanged',
        |         sum(CASE WHEN ia AND ib AND NOT (dn OR ds OR db)
        |             THEN 1 ELSE 0 END) FROM f
        |  UNION ALL SELECT 'col:c_name',
        |         sum(CASE WHEN ia AND ib AND dn THEN 1 ELSE 0 END) FROM f
        |  UNION ALL SELECT 'col:c_mktsegment',
        |         sum(CASE WHEN ia AND ib AND ds THEN 1 ELSE 0 END) FROM f
        |  UNION ALL SELECT 'col:c_acctbal',
        |         sum(CASE WHEN ia AND ib AND db THEN 1 ELSE 0 END) FROM f)
        |ORDER BY kind""".stripMargin,

    "merge_upsert" ->
      """WITH target AS (SELECT c_custkey, c_name, c_mktsegment, c_acctbal
        |                FROM customer WHERE c_custkey % 5 != 2),
        |ch AS (SELECT o_custkey AS c_custkey, o_orderkey AS seq,
        |              CASE WHEN o_orderstatus = 'F' AND o_custkey % 13 = 0
        |                   THEN 'D' ELSE 'U' END AS op,
        |              o_totalprice AS new_bal
        |       FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'),
        |latest AS (SELECT c_custkey, op, new_bal,
        |                  row_number() OVER (PARTITION BY c_custkey
        |                    ORDER BY seq DESC, op DESC) AS rn
        |           FROM ch),
        |l1 AS (SELECT c_custkey, op, new_bal FROM latest WHERE rn = 1)
        |SELECT COALESCE(t.c_custkey, l.c_custkey) AS c_custkey,
        |       t.c_name, t.c_mktsegment,
        |       COALESCE(l.new_bal, t.c_acctbal) AS c_acctbal
        |FROM target t FULL OUTER JOIN l1 l ON t.c_custkey = l.c_custkey
        |WHERE l.op IS NULL OR l.op != 'D'
        |ORDER BY c_custkey""".stripMargin,

    // single-pass UCC audit: one GROUPING SETS scan, gids from
    // single-column GROUPING bits with query-assigned weights
    "profile_ucc" ->
      """WITH g AS (SELECT GROUPING(o_orderkey)*4 + GROUPING(o_custkey)*2 +
        |                  GROUPING(o_orderdate) AS gid, count(*) AS cnt
        |           FROM orders
        |           GROUP BY GROUPING SETS ((o_orderkey), (o_custkey),
        |                                   (o_orderdate),
        |                                   (o_custkey, o_orderdate))),
        |r AS (SELECT gid, count(*) AS n_groups,
        |             CAST(max(cnt) AS BIGINT) AS max_dup,
        |             CAST(sum(cnt) AS BIGINT) AS n_rows
        |      FROM g GROUP BY gid)
        |SELECT CASE gid WHEN 3 THEN 'o_orderkey' WHEN 5 THEN 'o_custkey'
        |                WHEN 6 THEN 'o_orderdate'
        |                WHEN 4 THEN 'o_custkey+o_orderdate' END AS combo,
        |       n_groups, max_dup, max_dup = 1 AS is_unique, n_rows
        |FROM r ORDER BY combo""".stripMargin,

    // UCC discovery: one branch per candidate subset (the twin plays
    // each GROUP BY straight; Spark fuses them into one grouping-sets
    // Expand), same integer report as Discovery.uccDiscover
    "profile_ucc_discover" -> {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_orderdate", "o_orderpriority")
      val branches = (1 to 2).flatMap(m => cols.combinations(m)).map { s =>
        s"""SELECT '${s.mkString("+")}' AS columns,
           |       CAST(count(*) AS BIGINT) AS n_groups,
           |       CAST(sum(cnt) AS BIGINT) AS n_rows,
           |       CAST(max(cnt) AS BIGINT) AS max_dup
           |FROM (SELECT count(*) AS cnt FROM orders
           |      GROUP BY ${s.mkString(", ")})""".stripMargin
      }
      s"""WITH u AS (${branches.mkString("\nUNION ALL\n")})
         |SELECT 'orders' AS tab, columns, n_rows, n_groups,
         |       n_rows - n_groups AS dup_rows, max_dup,
         |       CAST(CASE WHEN max_dup = 1 THEN 1 ELSE 0 END AS INTEGER) AS is_ucc
         |FROM u ORDER BY dup_rows ASC, columns ASC""".stripMargin
    },

    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS volume,
        |       CAST(GROUPING(o_orderstatus)*2 + GROUPING(o_orderpriority)
        |            AS INTEGER) AS gid
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus ASC NULLS LAST,
        |         o_orderpriority ASC NULLS LAST""".stripMargin
  )

  /** Each BFS round references the previous distance table twice
    * (carry-over + expansion), so rounds pin with AS MATERIALIZED —
    * the oracle-side analogue of the Spark per-round localCheckpoint.
    */
  private def bfsSql(rounds: Int): String = {
    val rs = (1 to rounds).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT node, min(h) AS h FROM (
         |    SELECT node, h FROM d${i - 1}
         |    UNION ALL
         |    SELECT e.b AS node, d.h + 1 AS h
         |    FROM d${i - 1} d JOIN e ON d.node = e.a)
         |  GROUP BY node)""".stripMargin
    }.mkString(",\n")
    s"""WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
       |p AS (SELECT x.pk AS id1, y.pk AS id2
       |      FROM op x JOIN op y ON x.ok = y.ok AND x.pk < y.pk
       |      GROUP BY 1, 2 HAVING count(*) >= 2),
       |e AS MATERIALIZED (SELECT id1 AS a, id2 AS b FROM p
       |                   UNION SELECT id2, id1 FROM p),
       |d0 AS MATERIALIZED (SELECT p_partkey AS node, 0 AS h
       |                    FROM part WHERE p_brand = 'Brand#1'),
       |$rs
       |SELECT node, h AS hops FROM d$rounds ORDER BY node""".stripMargin
  }

  /** [[bfsSql]] per seed, then the lcm-scaled harmonic fold: the
    * distance rounds carry (seed, node, h) so the twin replays the
    * per-pivot BFS exactly; contributions are `scale // h` — integer
    * floor division, EXACT because every 1 ≤ h ≤ rounds divides
    * lcm(1..rounds) by construction (the division-free policy). SUM
    * over INTEGERs is HUGEINT in DuckDB → cast BIGINT to match
    * Spark's long (the pinned-output-type contract).
    */
  private def harmonicSql(rounds: Int): String = {
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val scale = (1L to rounds.toLong).reduce((a, b) => a / gcd(a, b) * b)
    val rs = (1 to rounds).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT seed, node, min(h) AS h FROM (
         |    SELECT seed, node, h FROM d${i - 1}
         |    UNION ALL
         |    SELECT d.seed, e.b AS node, d.h + 1 AS h
         |    FROM d${i - 1} d JOIN e ON d.node = e.a)
         |  GROUP BY seed, node)""".stripMargin
    }.mkString(",\n")
    s"""WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
       |p AS (SELECT x.pk AS id1, y.pk AS id2
       |      FROM op x JOIN op y ON x.ok = y.ok AND x.pk < y.pk
       |      GROUP BY 1, 2 HAVING count(*) >= 2),
       |e AS MATERIALIZED (SELECT id1 AS a, id2 AS b FROM p
       |                   UNION SELECT id2, id1 FROM p),
       |d0 AS MATERIALIZED (SELECT p_partkey AS seed, p_partkey AS node, 0 AS h
       |                    FROM part
       |                    WHERE p_brand = 'Brand#1'),
       |$rs
       |SELECT node, CAST(count(*) AS BIGINT) AS n_reach,
       |       CAST(sum($scale // h) AS BIGINT) AS h_num
       |FROM d$rounds WHERE h >= 1 GROUP BY node ORDER BY node""".stripMargin
  }

  /** [[bfsSql]]'s min-plus twin: same MATERIALIZED round pins, costs
    * ride the edges (ceil of a double division — both engines compute
    * the identical IEEE quotient, so the ceil lands on the same
    * integer; cast back to BIGINT because DuckDB's ceil is DOUBLE).
    */
  private def ssspSql(rounds: Int): String = {
    val rs = (1 to rounds).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT node, min(d) AS d FROM (
         |    SELECT node, d FROM d${i - 1}
         |    UNION ALL
         |    SELECT e.b AS node, d.d + e.cost AS d
         |    FROM d${i - 1} d JOIN e ON d.node = e.a)
         |  GROUP BY node)""".stripMargin
    }.mkString(",\n")
    s"""WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
       |p AS (SELECT x.pk AS id1, y.pk AS id2,
       |             CAST(ceil(12 / count(*)) AS BIGINT) AS cost
       |      FROM op x JOIN op y ON x.ok = y.ok AND x.pk < y.pk
       |      GROUP BY 1, 2 HAVING count(*) >= 2),
       |e AS MATERIALIZED (SELECT id1 AS a, id2 AS b, cost FROM p
       |                   UNION SELECT id2, id1, cost FROM p),
       |d0 AS MATERIALIZED (SELECT p_partkey AS node, CAST(0 AS BIGINT) AS d
       |                    FROM part WHERE p_brand = 'Brand#1'),
       |$rs
       |SELECT node, d AS dist FROM d$rounds ORDER BY node""".stripMargin
  }

  /** Each round references the previous round's edge list THREE times
    * (degree count + both endpoint re-filters); left to DuckDB's
    * default CTE inlining that expands 3^rounds base scans, so every
    * round is pinned with AS MATERIALIZED — the oracle-side analogue
    * of the Spark side's per-round localCheckpoint.
    */
  private def kCoreSql(k: Int, rounds: Int): String = {
    val rs = (1 to rounds).map { i =>
      val prev = s"e${i - 1}"
      s"""k$i AS MATERIALIZED (
         |  SELECT a FROM (SELECT a, count(*) AS c FROM $prev GROUP BY a)
         |  WHERE c >= $k),
         |e$i AS MATERIALIZED (SELECT e.a, e.b FROM $prev e
         |  JOIN k$i x ON e.a = x.a JOIN k$i y ON e.b = y.a)""".stripMargin
    }.mkString(",\n")
    s"""WITH p AS (
       |  SELECT 's' || l.l_suppkey AS a, 'c' || o.o_custkey AS b
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  GROUP BY 1, 2 HAVING count(*) >= 2),
       |e0 AS MATERIALIZED (SELECT a, b FROM p UNION SELECT b, a FROM p),
       |$rs
       |SELECT a AS node, count(*) AS degree
       |FROM e$rounds GROUP BY a HAVING count(*) >= $k ORDER BY node""".stripMargin
  }

  /** Shared CTE prefix for the label-propagation twins: the co-order
    * part graph + `iters` synchronous rounds, final labels in
    * l`iters`.
    */
  private def labelPropagationCtes(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      val prev = s"l${i - 1}"
      s"""c$i AS (SELECT e.a, l.lbl, count(*) AS c
         |        FROM e JOIN $prev l ON e.b = l.node GROUP BY 1, 2),
         |r$i AS (SELECT a, lbl,
         |          row_number() OVER (PARTITION BY a
         |            ORDER BY c DESC, lbl ASC) AS rn FROM c$i),
         |l$i AS (SELECT a AS node, lbl FROM r$i WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
       |p AS (SELECT x.pk AS id1, y.pk AS id2
       |      FROM op x JOIN op y ON x.ok = y.ok AND x.pk < y.pk
       |      GROUP BY 1, 2 HAVING count(*) >= 2),
       |e AS MATERIALIZED (SELECT id1 AS a, id2 AS b FROM p
       |                   UNION SELECT id2, id1 FROM p),
       |l0 AS (SELECT a AS node, a AS lbl FROM e GROUP BY a),
       |$rounds""".stripMargin
  }

  private def labelPropagationSql(iters: Int): String =
    s"""${labelPropagationCtes(iters)}
       |SELECT node, lbl AS community FROM l$iters ORDER BY node""".stripMargin

  /** Modularity of the label-propagation communities, division-free:
    * Q·4m² = Σ_c (4m·intra_c − d_c²) — exact integers cross-engine
    * (Newman & Girvan 2004 scaled by the constant 4m²).
    */
  private def modularitySql(iters: Int): String =
    s"""${labelPropagationCtes(iters)},
       |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM p),
       |deg AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY a),
       |intra AS (SELECT x.lbl AS community, CAST(count(*) AS BIGINT) AS intra_edges
       |          FROM p JOIN l$iters x ON p.id1 = x.node
       |                 JOIN l$iters y ON p.id2 = y.node
       |          WHERE x.lbl = y.lbl GROUP BY 1),
       |dc AS (SELECT l.lbl AS community, CAST(count(*) AS BIGINT) AS n_nodes,
       |              CAST(sum(deg.d) AS BIGINT) AS degree_sum
       |       FROM l$iters l JOIN deg ON l.node = deg.node GROUP BY 1)
       |SELECT dc.community, dc.n_nodes,
       |       CAST(coalesce(intra.intra_edges, 0) AS BIGINT) AS intra_edges,
       |       dc.degree_sum,
       |       -- products in HUGEINT (the Spark side uses decimal):
       |       -- 4m*intra would overflow BIGINT at large m even when
       |       -- q_num itself is small; the final BIGINT cast only
       |       -- fails when q_num itself does not fit
       |       CAST(4 * CAST(mm.m AS HUGEINT)
       |              * CAST(coalesce(intra.intra_edges, 0) AS HUGEINT)
       |            - CAST(dc.degree_sum AS HUGEINT)
       |              * CAST(dc.degree_sum AS HUGEINT) AS BIGINT) AS q_num
       |FROM dc LEFT JOIN intra ON dc.community = intra.community
       |CROSS JOIN mm ORDER BY dc.community""".stripMargin

  /** Shared edge CTE for the graph twins: the supplier→customer
    * shipment digraph (weight = line items shipped).
    */
  private def shipmentEdgesCte: String =
    """e0 AS (SELECT concat('s', l_suppkey) AS src, concat('c', o_custkey) AS dst,
      |              count(*) AS w
      |       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |       GROUP BY 1, 2)""".stripMargin

  /** Unrolled deterministic PageRank replay — the same fixed rounds,
    * decimal contribution accumulation, and double affine update as
    * Graph.pageRank. Every fractional literal is CAST(... AS DOUBLE):
    * DuckDB parses bare decimal-point literals as DECIMAL, whose exact
    * arithmetic would diverge from the Spark side's IEEE doubles
    * (1.0-0.85 is 0.15 in decimal but 0.15000000000000002 in binary).
    */
  private def pageRankSql(iters: Int): String =
    pageRankBodySql(iters, shipmentEdgesCte, "node")

  /** [[pageRankSql]] over the word-adjacency graph — the TextRank
    * twin (same rounds, same arithmetic, different e0). The adjacency
    * CTE mirrors the wired query step for step: window-2 pairs,
    * self-pairs dropped, symmetrized weights, weight ≥ 3 pruning.
    */
  private def textRankSql(iters: Int): String = {
    val e0 =
      s"""tk AS (SELECT ${toks("text")} AS tl FROM documents),
         |bgx AS (SELECT unnest([tl[i] || ' ' || tl[i+1]
         |                       for i in generate_series(1, greatest(len(tl) - 1, 0))]) AS bg
         |        FROM tk),
         |cw AS (SELECT split_part(bg, ' ', 1) AS w1,
         |              split_part(bg, ' ', 2) AS w2, count(*) AS c
         |       FROM bgx
         |       WHERE split_part(bg, ' ', 1) != split_part(bg, ' ', 2)
         |       GROUP BY 1, 2),
         |e0 AS (SELECT src, dst, CAST(sum(c) AS BIGINT) AS w FROM (
         |         SELECT w1 AS src, w2 AS dst, c FROM cw
         |         UNION ALL SELECT w2, w1, c FROM cw)
         |       GROUP BY 1, 2 HAVING sum(c) >= 3)""".stripMargin
    pageRankBodySql(iters, e0, "word")
  }

  private def pageRankBodySql(iters: Int, e0Cte: String,
                              outCol: String): String = {
    val base =
      s"""WITH $e0Cte,
         |ow AS (SELECT src, sum(w) AS outw FROM e0 GROUP BY src),
         |ew AS (SELECT e0.src, e0.dst, CAST(e0.w AS DOUBLE) / CAST(ow.outw AS DOUBLE) AS frac
         |       FROM e0 JOIN ow ON e0.src = ow.src),
         |nd AS (SELECT src AS node FROM e0 UNION SELECT dst AS node FROM e0),
         |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nd),
         |snk AS (SELECT node FROM nd WHERE node NOT IN (SELECT src FROM e0)),
         |r0 AS (SELECT node, CAST(round(CAST(1.0 AS DOUBLE) / n, 12) AS DECIMAL(26,12)) AS rank
         |       FROM nd, nn)""".stripMargin
    val rounds = (1 to iters).map { k =>
      val prev = s"r${k - 1}"
      s"""c$k AS (SELECT ew.dst AS node,
         |        CAST(round(CAST(r.rank AS DOUBLE) * ew.frac, 12) AS DECIMAL(26,12)) AS c
         |        FROM ew JOIN $prev r ON ew.src = r.node),
         |is$k AS (SELECT node, sum(c) AS insum FROM c$k GROUP BY node),
         |dg$k AS (SELECT coalesce(sum(r.rank), CAST(0 AS DECIMAL(26,12))) AS dang
         |         FROM snk JOIN $prev r ON snk.node = r.node),
         |r$k AS (SELECT nd.node,
         |        CAST(round((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / n
         |                   + CAST(0.85 AS DOUBLE) *
         |                     (CAST(coalesce(is$k.insum, CAST(0 AS DECIMAL(38,12))) AS DOUBLE)
         |                      + CAST(dg$k.dang AS DOUBLE) / n), 12) AS DECIMAL(26,12)) AS rank
         |        FROM nd LEFT JOIN is$k ON nd.node = is$k.node
         |        CROSS JOIN dg$k CROSS JOIN nn)""".stripMargin
    }.mkString(",\n", ",\n", "")
    s"""$base$rounds
       |SELECT node AS $outCol, round(CAST(rank AS DOUBLE), 9) AS rank
       |FROM r$iters ORDER BY rank DESC, $outCol ASC LIMIT 20""".stripMargin
  }

  /** [[pageRankSql]]'s personalized variant: teleport and dangling
    * mass return to the nation-3 supplier seed set (CASE on is_seed,
    * divisor = |present seeds| as DOUBLE), mirroring
    * Graph.personalizedPageRank's expression shape term for term.
    */
  private def pprSql(iters: Int): String = {
    val base =
      s"""WITH $shipmentEdgesCte,
         |ow AS (SELECT src, sum(w) AS outw FROM e0 GROUP BY src),
         |ew AS (SELECT e0.src, e0.dst, CAST(e0.w AS DOUBLE) / CAST(ow.outw AS DOUBLE) AS frac
         |       FROM e0 JOIN ow ON e0.src = ow.src),
         |nd0 AS (SELECT src AS node FROM e0 UNION SELECT dst AS node FROM e0),
         |sd AS (SELECT DISTINCT concat('s', s_suppkey) AS node
         |       FROM supplier WHERE s_nationkey = 3),
         |nd AS (SELECT nd0.node, sd.node IS NOT NULL AS is_seed
         |       FROM nd0 LEFT JOIN sd ON nd0.node = sd.node),
         |ns AS (SELECT CAST(count(*) AS DOUBLE) AS s FROM nd WHERE is_seed),
         |snk AS (SELECT node FROM nd0 WHERE node NOT IN (SELECT src FROM e0)),
         |r0 AS (SELECT node,
         |         CASE WHEN is_seed
         |              THEN CAST(round(CAST(1.0 AS DOUBLE) / s, 12) AS DECIMAL(26,12))
         |              ELSE CAST(0 AS DECIMAL(26,12)) END AS rank
         |       FROM nd, ns)""".stripMargin
    val rounds = (1 to iters).map { k =>
      val prev = s"r${k - 1}"
      s"""c$k AS (SELECT ew.dst AS node,
         |        CAST(round(CAST(r.rank AS DOUBLE) * ew.frac, 12) AS DECIMAL(26,12)) AS c
         |        FROM ew JOIN $prev r ON ew.src = r.node),
         |is$k AS (SELECT node, sum(c) AS insum FROM c$k GROUP BY node),
         |dg$k AS (SELECT coalesce(sum(r.rank), CAST(0 AS DECIMAL(26,12))) AS dang
         |         FROM snk JOIN $prev r ON snk.node = r.node),
         |r$k AS (SELECT nd.node,
         |        CAST(round(CASE WHEN nd.is_seed
         |                        THEN (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / s
         |                        ELSE CAST(0 AS DOUBLE) END
         |                   + CAST(0.85 AS DOUBLE) *
         |                     (CAST(coalesce(is$k.insum, CAST(0 AS DECIMAL(38,12))) AS DOUBLE)
         |                      + CASE WHEN nd.is_seed
         |                             THEN CAST(dg$k.dang AS DOUBLE) / s
         |                             ELSE CAST(0 AS DOUBLE) END), 12) AS DECIMAL(26,12)) AS rank
         |        FROM nd LEFT JOIN is$k ON nd.node = is$k.node
         |        CROSS JOIN dg$k CROSS JOIN ns)""".stripMargin
    }.mkString(",\n", ",\n", "")
    s"""$base$rounds
       |SELECT node, round(CAST(rank AS DOUBLE), 9) AS rank
       |FROM r$iters ORDER BY rank DESC, node ASC LIMIT 20""".stripMargin
  }
}
