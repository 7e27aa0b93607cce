package graft

/** Physical-plan property assertions: the scale design claims
  * (pushdown, pruning, broadcast dims, single-shuffle as-of) hold in
  * the actual optimized plans, not just in documentation.
  */
class PlanSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan.toString()
  }

  test("driver entry smoke: flagship query returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q6: filters reach the parquet scan and columns are pruned") {
    val p = planOf("q6_filter")
    assert(p.contains("PushedFilters: ["), "no pushed filters in scan")
    assert(p.contains("l_shipdate"), "shipdate filter missing from scan")
    // projection pruned: the scan must not read l_orderkey
    assert(!p.contains("ReadSchema: struct<l_orderkey"), "scan reads unpruned schema")
  }

  test("q5: dimension joins are broadcast") {
    val p = planOf("q5_multijoin")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 4, s"expected >=4 broadcast joins at this SF, got $broadcasts")
  }

  test("asof join: one exchange feeds the window (union-merge, no per-key blowup)") {
    val p = planOf("asof_join")
    assert(p.contains("Window"), "window operator missing")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "as-of must not fall back to a product join")
  }

  test("range join: bucketized equi-join, never a nested-loop plan") {
    val p = planOf("range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join degenerated to a product plan")
  }

  test("text ops are shuffle-free projections") {
    val p = planOf("token_count")
    assert(!p.contains("Exchange hashpartitioning"),
      "per-row text op should not hash-shuffle")
  }
}
