package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Distributed graph analytics over edge-list DataFrames — the
  * Pregel-style iterate-as-joins shape (Malewicz et al. SIGMOD'10;
  * GraphX's Spark formulation, Gonzalez et al. OSDI'14) expressed
  * directly in the SQL engine so Catalyst/AQE own every shuffle.
  * Complements Dedup.components (connected components): PageRank for
  * influence/centrality over weighted digraphs, degree distributions
  * for shape profiling, triangle counting for local density.
  *
  * Scale: every iteration is (edges ⋈ ranks → groupBy dst) — the
  * canonical message-passing join. Edges persist once (at cluster
  * scale, pre-bucketed by src so the rank join co-locates); ranks are
  * |V| narrow rows re-shuffled per round; nothing node-sized ever
  * reaches the driver (the only driver scalar is |V|).
  */
object Graph {

  /** Weighted PageRank with a FIXED iteration count and deterministic
    * arithmetic (PageRank: Brin & Page '98; fixed rounds rather than
    * convergence detection keep the job count static and the result a
    * pure function of the input — the twin replays the same rounds).
    *
    * edges: (src, dst, w) — string node ids, long weights; parallel
    * edges are pre-summed. Per round, every node's new rank is
    *
    *   (1−d)/N + d·(Σ_{(u,v)∈E} rank(u)·w(u,v)/outw(u) + dang/N)
    *
    * where dang = Σ ranks of sink nodes (no out-edges) — the standard
    * uniform redistribution of dangling mass, computed as a one-row
    * aggregate broadcast into the update (never a driver round-trip).
    *
    * Numeric policy (SURVEY §5): per-edge contributions round to 12dp
    * and accumulate as DECIMAL(26,12) — addition-order-free, so the
    * groupBy(dst) sum is reproducible cross-engine; the affine update
    * evaluates in double from those exact sums with a fixed expression
    * shape, then re-rounds to 12dp for the next round.
    *
    * Each round's ranks are PINNED — lineage truncated via a reliable
    * checkpoint when the session has a checkpoint dir (cluster
    * deployments), else an eager localCheckpoint. Plain persist() is
    * NOT enough for an iterative frame referenced twice per round
    * (contribution join + dangling aggregate): the logical plan
    * doubles every iteration even though execution reads the cache,
    * and by round 5 the DRIVER's analyze/optimize pass costs multiples
    * of the actual cluster work (measured: rounds of 1.2 s execution
    * ballooning to 8-9 s of planning at sf0.1). Truncation keeps every
    * round's plan constant-size, and lets the previous round's blocks
    * free immediately. Returns (node, rank DECIMAL(26,12)) — |V|
    * rows, unordered.
    */
  def pageRank(edges: DataFrame, iters: Int = 5,
               damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "at least one iteration")
    def pin(df: DataFrame): DataFrame =
      if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
      else df.localCheckpoint(true)
    val e = edges.select(F.col("src"), F.col("dst"), F.col("w").cast("long").as("w"))
      .persist()
    val outw = e.groupBy("src").agg(F.sum("w").as("outw"))
    val ew = e.join(outw, "src")
      .select(F.col("src"), F.col("dst"),
        (F.col("w").cast("double") / F.col("outw").cast("double")).as("frac"))
      .persist()
    // node table carries its sink flag (no out-edges) so the per-round
    // dangling-mass aggregate is a filter over the rank frame itself,
    // not an extra join
    val nodes = e.select(F.col("src").as("node"))
      .unionAll(e.select(F.col("dst").as("node")))
      .distinct()
      .join(outw.select(F.col("src").as("node"), F.lit(false).as("__src")),
        Seq("node"), "left")
      .select(F.col("node"), F.coalesce(F.col("__src"), F.lit(true)).as("is_sink"))
      .persist()
    val n = nodes.count() // the one driver scalar — |V| as a long
    require(n > 0, "pageRank: empty edge list")
    var ranks = pin(nodes.select(F.col("node"), F.col("is_sink"),
      F.round(F.lit(1.0 / n), 12).cast("decimal(26,12)").as("rank")))
    for (_ <- 1 to iters) {
      val contrib = ew.join(
          ranks.select(F.col("node").as("src"), F.col("rank")), "src")
        .select(F.col("dst").as("node"),
          F.round(F.col("rank").cast("double") * F.col("frac"), 12)
            .cast("decimal(26,12)").as("c"))
      val inSum = contrib.groupBy("node").agg(F.sum("c").as("insum"))
      val dang = ranks.where(F.col("is_sink"))
        .agg(F.coalesce(F.sum("rank"), F.lit(0).cast("decimal(26,12)"))
          .as("dang"))
      val next = pin(nodes.join(inSum, Seq("node"), "left")
        .crossJoin(F.broadcast(dang))
        .select(F.col("node"), F.col("is_sink"),
          F.round(F.lit((1.0 - damping) / n) + F.lit(damping) *
            (F.coalesce(F.col("insum"), F.lit(0).cast("decimal(36,12)")).cast("double")
              + F.col("dang").cast("double") / F.lit(n.toDouble)), 12)
            .cast("decimal(26,12)").as("rank")))
      ranks.unpersist()
      ranks = next
    }
    e.unpersist(); ew.unpersist(); nodes.unpersist()
    ranks.select("node", "rank")
  }

  /** Degree distribution of a directed edge list: for each side
    * (out = per-src, in = per-dst), how many nodes have each degree.
    * Two narrow aggregations — degree per node, then node count per
    * degree; output (side, degree, n_nodes).
    */
  def degreeDistribution(edges: DataFrame): DataFrame = {
    def side(col: String, name: String) = edges
      .groupBy(F.col(col).as("node"))
      .agg(F.count(F.lit(1)).as("degree"))
      .groupBy("degree").agg(F.count(F.lit(1)).as("n_nodes"))
      .select(F.lit(name).as("side"), F.col("degree"), F.col("n_nodes"))
    side("src", "out").unionAll(side("dst", "in"))
  }

  /** Per-node triangle participation over an UNDIRECTED edge list
    * given as canonical pairs (a < b, deduplicated). The standard
    * distributed formulation (Suri & Vassilvitskii WWW'11): each
    * triangle {x < y < z} is found exactly once by joining
    * (x,y)⋈(y,z) on the middle vertex and closing with (x,z) — three
    * equi-joins, no enumeration of 2-paths beyond what the join
    * produces. Returns (node, n_triangles) for nodes in ≥1 triangle.
    *
    * Scale: the 2-path join's output is Σ_v deg(v)² — the known cost
    * of exact triangle counting; heavy hubs are the skew point, and
    * the mitigations (degree-ordered orientation, AQE skew split)
    * apply at the edge-building call site by filtering low-support
    * edges first (the wired query keeps co-occurrence ≥ 2).
    */
  def triangleParticipation(pairs: DataFrame): DataFrame = {
    val e = pairs.select(F.col("a"), F.col("b")).persist()
    val tri = e.as("e1")
      .join(e.as("e2"), F.col("e1.b") === F.col("e2.a"))
      .join(e.as("e3"),
        F.col("e1.a") === F.col("e3.a") && F.col("e2.b") === F.col("e3.b"))
      .select(F.col("e1.a").as("x"), F.col("e1.b").as("y"), F.col("e2.b").as("z"))
      .persist()
    val out = tri.select(F.col("x").as("node"))
      .unionAll(tri.select(F.col("y").as("node")))
      .unionAll(tri.select(F.col("z").as("node")))
      .groupBy("node").agg(F.count(F.lit(1)).as("n_triangles"))
    out
  }
}
