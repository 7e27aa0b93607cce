package graft

import org.apache.spark.sql.{functions => F}

/** Round-20 specs: the r19 VERDICT closes — WET/WAT container
  * readers, Fellegi-Sunter three-way decision bands, and the
  * round's other additions.
  */
class R20OpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------ WET / WAT

  test("Warc.writeWet/readWet round-trip: conversion records carry text") {
    import graft.sources.Warc
    val dir = java.nio.file.Files.createTempDirectory("r20wet").toString
    val rows = spark.range(6).selectExpr(
      "concat('http://ex.org/d/', cast(id as string)) as target_uri",
      "concat('text of doc ', cast(id as string), ' — é ✓') as text")
    Warc.writeWet(rows, dir)
    val back = Warc.readWet(spark, dir)
      .select("target_uri", "text").as[(String, String)].collect().toMap
    assert(back.size == 6)
    assert(back("http://ex.org/d/3") == "text of doc 3 — é ✓",
      "UTF-8 payload must decode byte-exact")
    // WET rows are conversion-type: the generic reader sees them too,
    // and readWet must not admit response records
    val types = Warc.readWarc(spark, dir)
      .select("warc_type").distinct().as[String].collect().toSeq
    assert(types == Seq("conversion"))
  }

  test("Warc.writeWat/readWat round-trip: metadata JSON envelopes") {
    import graft.sources.Warc
    val dir = java.nio.file.Files.createTempDirectory("r20wat").toString
    val rows = spark.range(4).selectExpr(
      "concat('http://ex.org/d/', cast(id as string)) as target_uri",
      "to_json(named_struct('uri', concat('http://ex.org/d/', " +
        "cast(id as string)), 'n', id * 10)) as json")
    Warc.writeWat(rows, dir)
    val back = Warc.readWat(spark, dir)
      .select(F.col("target_uri"),
        F.get_json_object(F.col("json"), "$.n").cast("long").as("n"))
      .as[(String, Long)].collect().toMap
    assert(back.size == 4 && back("http://ex.org/d/2") == 20L)
  }

  test("readWet on a mixed WARC ignores response records; readWat ignores both") {
    import graft.sources.Warc
    val dir = java.nio.file.Files.createTempDirectory("r20mix").toString
    // response-type records only — neither WET nor WAT rows exist
    val rows = spark.range(3).selectExpr(
      "concat('http://ex.org/r/', cast(id as string)) as target_uri",
      "'text/html' as content_type",
      "encode('HTTP/1.1 200 OK\r\n\r\nhi', 'UTF-8') as payload")
    Warc.writeWarc(rows, dir)
    assert(Warc.readWet(spark, dir).count() == 0)
    assert(Warc.readWat(spark, dir).count() == 0)
    assert(Warc.readWarc(spark, dir).count() == 3)
  }

  // ------------------------------------- Fellegi-Sunter decision bands

  private def fsFrames() = {
    val a = spark.range(40).selectExpr("id as id_a",
      "concat('rec-', lpad(cast(id as string), 4, '0')) as name_a",
      "cast(id % 4 as int) as blk", "id * 7 as code_a")
    // 30 dirty twins (name perturbed, code intact), 10 unmatched rows
    // (everything disagrees) — three posterior strata by construction
    val b = spark.range(40).selectExpr(
      "id + 1000 as id_b",
      "case when id < 30 then concat('rec-', lpad(cast(id as string), 4, '0'), 'x') " +
        "else concat('zzz-', cast(id as string)) end as name_b",
      "cast(id % 4 as int) as blk",
      "case when id < 30 then id * 7 else -id end as code_b")
    (a, b)
  }

  test("linkFellegiSunterBands: three-way decision + weight columns") {
    import graft.harmonize.Linkage
    import graft.harmonize.Linkage.FsAttr
    val (a, b) = fsFrames()
    val attrs = Seq(
      FsAttr("prefix", "name_a", "name_b",
        (x, y) => F.substring(x, 1, 8) === F.substring(y, 1, 8)),
      FsAttr("code", "code_a", "code_b", (x, y) => x === y))
    val out = Linkage.linkFellegiSunterBands(a, b, Seq("blk"),
      "id_a", "id_b", attrs, nIter = 15,
      upperPpm = 900000L, lowerPpm = 100L)
    val cols = out.columns.toSeq
    assert(cols == Seq("id_b", "id_a", "pid", "post_ppm", "band",
      "n_candidates", "agree_prefix", "wt_prefix", "agree_code", "wt_code"))
    val rows = out.collect()
    // every B record is banded — non_match is a decision, not a drop
    assert(rows.length == 40)
    val bands = rows.groupBy(_.getAs[String]("band")).view.mapValues(_.length).toMap
    assert(bands.getOrElse("match", 0) == 30, s"bands: $bands")
    assert(bands.getOrElse("non_match", 0) + bands.getOrElse("possible", 0) == 10)
    // matched rows agree on both attributes (pid = 3) and carry the
    // positive agreement weights; unmatched rows the disagreement ones
    val m = rows.filter(_.getAs[String]("band") == "match")
    assert(m.forall(_.getAs[Int]("pid") == 3))
    assert(m.forall(r => r.getAs[Int]("agree_prefix") == 1 &&
      r.getAs[Int]("agree_code") == 1))
    val wAgree = m.head.getAs[Double]("wt_code")
    assert(wAgree > 0.0, "log2(m/u) of a discriminating attribute is positive")
    val nm = rows.filter(_.getAs[String]("band") != "match")
    assert(nm.forall(r => r.getAs[Double]("wt_code") < 0.0),
      "disagreement weight log2((1-m)/(1-u)) must be negative")
    // band thresholds are on the posterior: monotone consistency
    rows.foreach { r =>
      val p = r.getAs[Long]("post_ppm")
      val band = r.getAs[String]("band")
      if (p >= 900000L) assert(band == "match")
      else if (p >= 100L) assert(band == "possible")
      else assert(band == "non_match")
    }
  }

  test("linkFellegiSunterBands rejects inverted thresholds") {
    import graft.harmonize.Linkage
    import graft.harmonize.Linkage.FsAttr
    val (a, b) = fsFrames()
    intercept[IllegalArgumentException] {
      Linkage.linkFellegiSunterBands(a, b, Seq("blk"), "id_a", "id_b",
        Seq(FsAttr("code", "code_a", "code_b", (x, y) => x === y)),
        upperPpm = 100L, lowerPpm = 900000L)
    }
  }

  // ------------------------------------------ KN-scored CCNet buckets

  test("qualityBucketsKn: equal populations, KN score ranks fluency, sub-trigram docs drop") {
    import graft.text.Curate
    // 9 scorable docs: 3 fluent (repeat the corpus-dominant trigram),
    // 3 mid, 3 shuffled-salad; plus one 2-token doc that carries no
    // trigram and must vanish from the ranking entirely
    val fluent = (1 to 3).map(i => (i.toLong, "the quick fox jumps over the quick fox"))
    val mid = (4 to 6).map(i => (i.toLong, s"the quick fox item$i runs home today"))
    val salad = (7 to 9).map(i => (i.toLong, s"fox the item$i quick jumps zz$i the"))
    val short = Seq((10L, "too short"))
    val docs = (fluent ++ mid ++ salad ++ short).toDF("doc_id", "text")
    val out = Curate.qualityBucketsKn(docs, "doc_id", "text", buckets = 3)
      .collect().map(r => (r.getAs[Long]("id"),
        r.getAs[Long]("bucket"), r.getAs[String]("bucket_name"))).toSeq
    assert(out.size == 9, "the 2-token doc has no trigram and must drop out")
    assert(!out.exists(_._1 == 10L))
    val byBucket = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byBucket.values.forall(_.size == 3), "equal-population thirds")
    assert(byBucket(1) == Set(1L, 2L, 3L),
      "the fluent docs must tier head under the KN scorer")
    assert(out.filter(_._2 == 1L).forall(_._3 == "head"))
    assert(out.filter(_._2 == 3L).forall(_._3 == "tail"))
  }
}
