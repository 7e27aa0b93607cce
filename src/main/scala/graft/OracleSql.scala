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

  val all: Map[String, String] = Map(

    "preview_domain" ->
      """SELECT lang AS value_name, count(*) AS n FROM documents
        |GROUP BY lang ORDER BY value_name""".stripMargin,

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
    // SF fails parity loudly and attributes it to cap pressure
    "dedup_cap_report" ->
      s"""WITH tk AS (SELECT doc_id, ${toks("text")} AS tl FROM documents),
         |sh AS (SELECT DISTINCT doc_id,
         |         unnest([tl[i] || ' ' || tl[i+1] || ' ' || tl[i+2]
         |                 for i in generate_series(1, greatest(len(tl) - 2, 0))]) AS sh
         |       FROM tk),
         |dfq AS (SELECT sh, count(*) AS df FROM sh GROUP BY sh),
         |over AS (SELECT CAST(count(*) AS BIGINT) AS c,
         |                CAST(coalesce(sum(df), 0) AS BIGINT) AS s
         |         FROM dfq WHERE df > 200)
         |SELECT metric, value FROM (
         |  SELECT 'jaccard_shingles_over_dfcap' AS metric, c AS value FROM over
         |  UNION ALL SELECT 'jaccard_postings_dropped', s FROM over
         |  UNION ALL SELECT 'minhash_buckets_over_cap', CAST(0 AS BIGINT)
         |  UNION ALL SELECT 'minhash_band_entries_dropped', CAST(0 AS BIGINT)
         |  UNION ALL SELECT 'embedding_buckets_over_cap', CAST(0 AS BIGINT)
         |  UNION ALL SELECT 'embedding_band_entries_dropped', CAST(0 AS BIGINT)
         |  UNION ALL SELECT 'embedding_hi_buckets_over_cap', CAST(0 AS BIGINT)
         |  UNION ALL SELECT 'embedding_hi_band_entries_dropped', CAST(0 AS BIGINT))
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

    "curate_take" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
        |    ORDER BY CAST((doc_id * 2654435761) % 1000000 AS DOUBLE) / 1000000.0 ASC,
        |             doc_id ASC) AS rk
        |  FROM documents)
        |WHERE rk <= 20 ORDER BY doc_id""".stripMargin,

    "curate_pack" ->
      s"""WITH tk AS (SELECT doc_id,
         |  CAST(floor(CAST((doc_id * 2654435761) % 1000000 AS DOUBLE)
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
         |    CAST(floor(CAST((doc_id * 2654435761) % 1000000 AS DOUBLE)
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

    "events_json" ->
      """SELECT event_type, count(*) AS n_events,
        |       CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
        |       CAST(min(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS min_k,
        |       CAST(max(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

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

    // batch-touching subset of the exact near-dup pairs: the wired
    // query generates candidates by band-joining ONLY the incoming
    // batch's signatures, so parity against the full exact computation
    // restricted to batch pairs is the incremental path's recall gate
    "dedup_incremental_near" -> (jaccardPairsCte +
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

    "dedup_components" ->
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
         |FROM closure GROUP BY a ORDER BY id""".stripMargin,

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

    "ann_topk" ->
      """SELECT query_id, neighbor_id, "rank", round(sim, 6) AS similarity FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS sim,
        |         CAST(row_number() OVER (PARTITION BY q.vec_id
        |                ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) DESC,
        |                         c.vec_id ASC) AS BIGINT) AS "rank"
        |  FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND c.vec_id <> q.vec_id)
        |WHERE "rank" <= 5 ORDER BY query_id, "rank"""".stripMargin,

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
        |WHERE CAST((doc_id * 2654435761) % 1000000 AS DOUBLE) / 1000000.0 <
        |      CASE WHEN lang = 'en' THEN 0.2 ELSE 1.0 END
        |ORDER BY doc_id""".stripMargin,

    "curate_shards" ->
      """SELECT CAST(floor(CAST((doc_id * 2654435761) % 1000000 AS DOUBLE)
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
         |       round(sum(logp) / count(*), 6) AS avg_logprob
         |FROM ex JOIN pr USING (tok)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

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
    // string order == code-point order)
    "text_entropy" ->
      """WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
        |cnt AS (SELECT doc_id, c, CAST(count(*) AS DOUBLE) AS n FROM ch GROUP BY 1, 2),
        |g AS (SELECT doc_id, list(n ORDER BY c) AS l, sum(n) AS t FROM cnt GROUP BY 1)
        |SELECT d.doc_id,
        |       -- + 0.0 normalizes the IEEE -0.0 a negated zero-entropy
        |       -- sum produces (single-char-class docs); Spark's kernel
        |       -- always yields +0.0 there
        |       coalesce(round(-list_sum(list_transform(g.l, n -> (n / g.t) * ln(n / g.t))), 6), 0.0) + 0.0 AS char_entropy
        |FROM documents d LEFT JOIN g USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

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

    "events_window_agg" ->
      """SELECT epoch_us(ts) - epoch_us(ts) % 3600000000 AS hour_start_us, event_type,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
        |       count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

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
    "multimodal_meta" ->
      """SELECT doc_id,
        |       CAST(CASE doc_id % 3 WHEN 0 THEN 33 WHEN 1 THEN 41 ELSE 13 END AS BIGINT) AS n_bytes,
        |       CAST(doc_id % 640 + 1 AS INTEGER) AS width,
        |       CAST(doc_id % 480 + 1 AS INTEGER) AS height,
        |       CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'gif' END AS format
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
