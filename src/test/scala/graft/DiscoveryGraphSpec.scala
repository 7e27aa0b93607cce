package graft

import org.apache.spark.sql.{functions => F}
import graft.harmonize.{Discovery, Profile}
import graft.operators.Graph

/** Unit specs for the r13 discovery (IND/FD/correlation/histogram)
  * and graph (pagerank/degree/triangles) operators on hand-built
  * inputs with closed-form expected outputs.
  */
class DiscoveryGraphSpec extends SparkSpec {
  import spark.implicits._

  test("inclusion: containment direction, full INDs, zero-overlap pairs") {
    val fk = Seq(1L, 2L, 2L, 3L).toDF("fk") // distinct {1,2,3}
    val pk = Seq(1L, 2L, 3L, 4L).toDF("pk") // distinct {1,2,3,4}
    val other = Seq(99L).toDF("o")
    val out = Discovery.inclusion(Seq(
      ("a.fk", fk, "fk"), ("b.pk", pk, "pk"), ("c.o", other, "o")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getInt(5))).toMap
    assert(out(("a.fk", "b.pk")) == ((3L, 3L, 1.0, 1)))    // fk ⊆ pk
    assert(out(("b.pk", "a.fk")) == ((4L, 3L, 0.75, 0)))   // not the reverse
    assert(out(("a.fk", "c.o")) == ((3L, 0L, 0.0, 0)))     // disjoint preserved
    assert(out.size == 6) // all ordered pairs present
  }

  test("AMS sketch: join size within tolerance, near-zero for disjoint keys") {
    import graft.functions.AmsSketchAgg.{amsSketchAgg, joinSizeEstimate}
    val a = (1 to 100).flatMap(i => Seq(i, i)).toDF("k")     // 100 keys x2
    val b = (1 to 50).flatMap(i => Seq(i, i, i)).toDF("k")   // 50 keys x3
    val c = (1000 to 1050).toDF("k")                         // disjoint
    def sk(df: org.apache.spark.sql.DataFrame) =
      df.agg(amsSketchAgg(F.col("k").cast("string"), 5, 4096).as("s"))
    def est(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
      sk(x).crossJoin(sk(y).withColumnRenamed("s", "t"))
        .select(joinSizeEstimate(F.col("s"), F.col("t"), 5, 4096))
        .as[Long].head()
    val e = est(a, b) // exact join size: 50 keys x 2 x 3 = 300
    assert(math.abs(e - 300L) <= 45, s"est=$e want ~300")
    assert(math.abs(est(a, c)) < 50, "disjoint keys must estimate ~0")
    assert(est(a, b) == e) // deterministic: no RNG state
  }

  test("fdAudit: held and violated dependencies with branching counts") {
    val df = Seq(
      (1, "x", "p"), (1, "x", "q"), // det=1: dep1 fine, dep2 branches 2
      (2, "y", "r"), (2, "y", "r"),
      (3, "z", "s")).toDF("k", "d1", "d2")
    val rows = Discovery.fdAudit("t", df, "k", Seq("d1", "d2"))
      .collect().map(r => r.getString(2) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getInt(6))).toMap
    assert(rows("d1") == ((3L, 0L, 1L, 1)))  // k -> d1 holds
    assert(rows("d2") == ((3L, 1L, 2L, 0)))  // k -> d2: 1 group branches
  }

  test("keySkew: heavy key, share, and deterministic tie-break") {
    val df = Seq(("a", "0"), ("a", "1"), ("a", "0"),
      ("b", "1"), ("b", "0"), ("c", "1")).toDF("k", "u")
    val s = Profile.keySkew(df, Seq("k", "u"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getString(5))).toMap
    assert(s("k") == ((3L, 6L, 3L, 0.5, "a")))
    // u: two keys x3 each — tie broken on the LARGER key string
    assert(s("u")._3 == 3L && s("u")._5 == "1")
  }

  test("distinctSketch: per-group and UNION-merged estimates track exact counts; overlap not double-counted") {
    // groups overlap by 500 values: the merged row must estimate the
    // UNION's 1500 (a per-group sum would claim 2000) — the property
    // that makes sketches mergeable where exact counts are not
    val df = ((0 until 1000).map(v => ("a", s"v$v")) ++
      (500 until 1500).map(v => ("b", s"v$v"))).toDF("g", "v")
    val got = Profile.distinctSketch(df, "g", "v")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got("a") == ((1000L, true)) && got("b") == ((1000L, true)), s"$got")
    assert(got("*ALL*") == ((1500L, true)), s"merged: ${got("*ALL*")}")
  }

  test("numericOutliers: hand-computed quartiles, interpolation, duplicates, constant column, fence boundary") {
    val df = Seq(
      (1.0, 10.0, 5.0, 1.0),
      (2.0, 20.0, 5.0, 1.0),
      (3.0, 30.0, 5.0, 1.0),
      (4.0, 40.0, 5.0, 2.0),
      (100.0, 40.0, 5.0, 50.0)).toDF("x", "y", "c", "z")
    val got = Profile.numericOutliers(df, Seq("x", "y", "c", "z"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getLong(6), r.getLong(7))).toMap
    // x = [1,2,3,4,100]: exact ranks (no interpolation) q1=2, q3=4,
    // fences [-1, 7] -> 100 flagged above
    assert(got("x") == ((5L, 2.0, 4.0, -1.0, 7.0, 0L, 1L)), s"x: ${got("x")}")
    // y = [10,20,30,40,40] (dup at the top): n=5 -> q1 = 20, q3 = 40;
    // iqr=20 -> fences [-10, 70] -> none out
    assert(got("y") == ((5L, 20.0, 40.0, -10.0, 70.0, 0L, 0L)), s"y: ${got("y")}")
    // constant column: q1=q3=5, fences collapse ON the value — the
    // boundary itself is NOT an outlier (strict inequality)
    assert(got("c") == ((5L, 5.0, 5.0, 5.0, 5.0, 0L, 0L)), s"c: ${got("c")}")
    // z = [1,1,1,2,50]: duplicate-heavy low end exercises the cumsum
    // rank pick (rank 2 inside the v=1 run); q1=1, q3=2, hi fence 3.5
    assert(got("z") == ((5L, 1.0, 2.0, -0.5, 3.5, 0L, 1L)), s"z: ${got("z")}")
    // interpolated quartiles: n=4 -> h=0.75/2.25 -> q1=17.5, q3=32.5
    val interp = Profile.numericOutliers(
      Seq(10.0, 20.0, 30.0, 40.0).toDF("y"), Seq("y"))
      .collect().head
    assert(interp.getDouble(2) == 17.5 && interp.getDouble(3) == 32.5,
      s"interpolated: $interp")
  }

  test("correlation: perfect linear, anti-linear, and constant columns") {
    val df = Seq((1.0, 2.0, -1.0, 5.0), (2.0, 4.0, -2.0, 5.0),
      (3.0, 6.0, -3.0, 5.0)).toDF("x", "y", "z", "c")
    val rows = Profile.correlation(df, Seq("x", "y", "z", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(rows(("x", "y")).contains(1.0))
    assert(rows(("x", "z")).contains(-1.0))
    assert(rows(("x", "c")).isEmpty) // zero variance -> null, not NaN
  }

  test("histogram: bucket boundaries, max in last bucket, constant column") {
    val df = (0 to 100).map(_.toDouble).toDF("v")
      .withColumn("k", F.lit(7.0))
    val h = Profile.histogram(df, Seq("v", "k"), nBins = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    // v in [0,100], 10 buckets of width 10; bucket 9 takes [90,100]
    assert(h(("v", 0L)) == ((0.0, 10.0, 10L)))
    assert(h(("v", 9L)) == ((90.0, 100.0, 11L))) // 90..100 incl. max
    assert(h.keys.count(_._1 == "v") == 10)
    assert(h(("k", 0L))._3 == 101L) // constant column: one bucket, all rows
  }

  test("pageRank: mass conserved, hub ranks highest, deterministic") {
    // star + chain: everyone links to h; h links to t
    val edges = Seq(("a", "h", 1L), ("b", "h", 1L), ("c", "h", 2L),
      ("h", "t", 1L)).toDF("src", "dst", "w")
    val pr = Graph.pageRank(edges, iters = 5)
    val ranks = pr.collect().map(r => r.getString(0) ->
      r.getDecimal(1).doubleValue()).toMap
    assert(ranks.size == 5)
    // dangling redistribution keeps total mass ~1 every round
    assert(math.abs(ranks.values.sum - 1.0) < 1e-6,
      s"mass leaked: ${ranks.values.sum}")
    // t receives all of h's (large) rank: highest; h next
    assert(ranks("t") > ranks("h") && ranks("h") > ranks("a"))
    assert(ranks("a") == ranks("b") && ranks("b") == ranks("c"))
    val again = Graph.pageRank(edges, iters = 5).collect()
      .map(r => r.getString(0) -> r.getDecimal(1).doubleValue()).toMap
    assert(again == ranks) // bit-identical across runs
  }

  test("degreeDistribution: in/out sides with node counts per degree") {
    val edges = Seq(("a", "x"), ("a", "y"), ("b", "x")).toDF("src", "dst")
    val d = Graph.degreeDistribution(edges)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(d(("out", 2L)) == 1L) // a
    assert(d(("out", 1L)) == 1L) // b
    assert(d(("in", 2L)) == 1L)  // x
    assert(d(("in", 1L)) == 1L)  // y
  }

  test("triangleParticipation: counts per node, open triads excluded") {
    // triangle {1,2,3} + pendant edge (3,4): 4 is in no triangle
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val t = Graph.triangleParticipation(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
