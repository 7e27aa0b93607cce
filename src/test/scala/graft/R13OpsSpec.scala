package graft

import org.apache.spark.sql.{functions => F}
import graft.operators.Scd
import graft.text.{Curate, TextOps}
import graft.streaming.Events

/** Unit specs for the r13b pipeline operators: SCD2 dimension merge,
  * weighted sampling, TF-IDF keywords, CUSUM changepoints, and
  * z-order clustering (value + file-level locality).
  */
class R13OpsSpec extends SparkSpec {
  import spark.implicits._

  test("scd2Apply: change closes + versions, no-op passes, new key inserts") {
    val dim = Scd.scd2Init(
      Seq((1L, "A"), (2L, "B"), (3L, "C")).toDF("k", "seg"), "k", Seq("seg"))
    val changes = Seq(
      (1L, "X", 100L),  // real change
      (2L, "B", 100L),  // no-op: same value
      (9L, "N", 100L))  // brand-new key
      .toDF("k", "seg", "change_ts_us")
    val out = Scd.scd2Apply(dim, changes, "k", Seq("seg"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getBoolean(4))).toSet
    assert(out == Set(
      (1L, "A", 0L, Some(100L), false), // closed
      (1L, "X", 100L, None, true),      // new version
      (2L, "B", 0L, None, true),        // no-op untouched
      (3L, "C", 0L, None, true),        // unmentioned untouched
      (9L, "N", 100L, None, true)))     // novel insert
  }

  test("scd2Lookup: facts resolve the version valid AT their timestamp") {
    val dim = Scd.scd2Apply(
      Scd.scd2Init(Seq((1L, "A")).toDF("k", "seg"), "k", Seq("seg")),
      Seq((1L, "X", 100L)).toDF("k", "seg", "change_ts_us"), "k", Seq("seg"))
    val facts = Seq((10L, 1L, 50L),   // before the change -> A
      (11L, 1L, 100L),                // at the boundary -> X (half-open)
      (12L, 1L, 999L),                // after -> X
      (13L, 7L, 50L))                 // unknown key -> null
      .toDF("fid", "k", "at_us")
    val out = Scd.scd2Lookup(facts, "k", "at_us", dim, "k", Seq("seg"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getString(3)))).toMap
    assert(out == Map(10L -> Some("A"), 11L -> Some("X"),
      12L -> Some("X"), 13L -> None))
  }

  test("weightedSample: deterministic, size-k, heavy weights dominate") {
    val df = (1 to 200).map(i => (i.toLong, if (i <= 10) 1000000.0 else 0.001))
      .toDF("id", "w")
    val s1 = Curate.weightedSample(df, "id", "w", k = 10)
      .select("id").as[Long].collect().toSet
    // with a 10^9 weight ratio the ten heavy rows win any draw
    assert(s1 == (1L to 10L).toSet)
    val s2 = Curate.weightedSample(df, "id", "w", k = 10)
      .select("id").as[Long].collect().toSet
    assert(s2 == s1) // no RNG state: reproducible
    assert(Curate.weightedSample(df, "id", "w", k = 500).count() == 200)
  }

  test("keywords: tf-idf scores and per-doc ranks on a closed-form corpus") {
    val docs = Seq((1L, "apple apple banana"), (2L, "banana cherry"))
      .toDF("doc_id", "text")
    val kw = TextOps.keywords(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getDouble(2), r.getInt(3))).toMap
    val idf1 = math.log(3.0 / 2.0) // df=1 terms: ln((2+1)/(1+1))
    def r9(x: Double) = BigDecimal(x).setScale(9,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(kw((1L, "apple")) == ((r9(2 * idf1), 1)))
    assert(kw((1L, "banana")) == ((0.0, 2)))   // df=2: ln(3/3) = 0
    assert(kw((2L, "cherry")) == ((r9(idf1), 1)))
    assert(kw((2L, "banana")) == ((0.0, 2)))
  }

  test("changepoint: CUSUM peaks at the mean shift; flat series stays tiny") {
    val day = 24L * 3600 * 1000 * 1000
    def at(d: Int, i: Int) = new java.sql.Timestamp((d * day + i) / 1000)
    // type B: 2,2,9,9 events/day (shift after day 1); type A: 2/day flat
    val rows =
      (0 until 4).flatMap(d => (0 until 2).map(i => (at(d, i), "A"))) ++
      (0 until 2).map(i => (at(0, i), "B")) ++
      (0 until 2).map(i => (at(1, i), "B")) ++
      (0 until 9).map(i => (at(2, i), "B")) ++
      (0 until 9).map(i => (at(3, i), "B"))
    val ev = rows.toDF("ts", "event_type")
      .withColumn("user_id", F.lit(1L)).withColumn("value", F.lit(0.0))
    val cp = Events.changepoint(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // B: mean 5.5, devs -3.5,-3.5,+3.5,+3.5 -> S = -3.5,-7,-3.5,0:
    // peak |S| = 7 on day 1, the last pre-shift day
    assert(cp("B") == ((1L * day, 7.0)))
    assert(cp("A")._2 == 0.0) // flat series: no evidence
  }

  test("zValue: closed-form interleave; curve order clusters both dims") {
    val z = Seq((3L, 1L)).toDF("a", "b")
      .select(graft.sources.Sources.zValue(F.col("a"), F.col("b")).as("z"))
      .as[Long].head()
    assert(z == 7L) // a bits 1,1 -> 1+4; b bit 1 -> 2
  }

  test("Versioned: atomic snapshot commits, time travel, vacuum") {
    import graft.sources.Versioned
    val root = java.nio.file.Files.createTempDirectory("vtab").toString + "/t"
    assert(Versioned.currentVersion(spark, root).isEmpty)
    val v1 = Versioned.commit(Seq((1L, "a")).toDF("k", "s"), root)
    assert(v1 == 1L)
    // a reader resolves its snapshot now...
    val oldReader = Versioned.read(spark, root)
    val v2 = Versioned.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), root)
    assert(v2 == 2L && Versioned.currentVersion(spark, root).contains(2L))
    // ...new reads see v2, the in-flight reader still scans v1 files
    assert(Versioned.read(spark, root).count() == 2)
    assert(oldReader.count() == 1)
    // time travel inside the un-vacuumed window
    assert(Versioned.read(spark, root, version = Some(1L)).count() == 1)
    assert(Versioned.vacuum(spark, root) == Seq(1L))
    // vacuumed: only the current version remains on disk
    assert(Versioned.currentVersion(spark, root).contains(2L))
    intercept[Exception](Versioned.read(spark, root, version = Some(1L)).count())
  }

  test("scd2Ingest: streaming batches version the dimension through commits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.sources.Versioned
    implicit val sq = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("scd2s").toString + "/dim"
    Versioned.commit(Scd.scd2Init(
      Seq((1L, "A"), (2L, "B")).toDF("k", "seg"), "k", Seq("seg")), root)
    val versions = scala.collection.mutable.Map[Long, Long]()
    val stream = MemoryStream[(Long, String, Long)]
    val q = Scd.scd2Ingest(
      stream.toDF().toDF("k", "seg", "change_ts_us"), root, "k", Seq("seg"),
      checkpointDir = Some(java.nio.file.Files
        .createTempDirectory("scd2s_ckpt").toString)) { (b, v) =>
      versions.synchronized { versions(b) = v }
    }
    try {
      stream.addData((1L, "X", 100L), (1L, "Y", 200L)) // latest-per-key: Y wins
      q.processAllAvailable()
      stream.addData((9L, "N", 300L))
      q.processAllAvailable()
    } finally q.stop()
    assert(versions.toMap == Map(0L -> 2L, 1L -> 3L))
    val fin = Versioned.read(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getBoolean(4))).toSet
    assert(fin == Set(
      (1L, "A", 0L, Some(200L), false),
      (1L, "Y", 200L, None, true),
      (2L, "B", 0L, None, true),
      (9L, "N", 300L, None, true)))
  }

  test("writeZOrdered: per-file ranges tighten on BOTH dims vs linear sort") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    graft.sources.Sources.writeZOrdered(grid, s"$dir/z", "x", "y", parts = 16)
    grid.repartitionByRange(16, F.col("x"), F.col("y"))
      .sortWithinPartitions("x", "y")
      .write.mode("overwrite").parquet(s"$dir/linear")
    def avgYRange(path: String): Double = {
      val perFile = spark.read.parquet(path)
        .groupBy(F.input_file_name())
        .agg((F.max("y") - F.min("y")).as("rng"))
        .agg(F.avg("rng")).as[Double].head()
      perFile
    }
    val zr = avgYRange(s"$dir/z")
    val lr = avgYRange(s"$dir/linear")
    // x-major linear sort leaves each file spanning ~the full y domain
    // (range 63); the z-curve tiles the plane, so files cover a narrow
    // y band as well — the file-skipping win for y-predicates
    assert(lr > 55.0, s"linear baseline unexpectedly tight: $lr")
    assert(zr < lr / 2, s"z-order files not tighter on y: z=$zr linear=$lr")
  }
}
