package graft

import graft.sources.Sources
import org.apache.spark.sql.{functions => F}

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def sample = Seq(
    (1L, "alpha", 1.5, "A"), (2L, "beta", 2.5, "B"), (3L, "gamma", 3.5, "A")
  ).toDF("id", "name", "score", "grp")

  test("csv and json roundtrip with imposed schema equals the source rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_src").toString
    sample.write.option("header", "true").csv(s"$dir/csv")
    sample.write.json(s"$dir/json")
    val schema = sample.schema
    val csv = Sources.read(spark, s"$dir/csv", "csv", Some(schema))
    val json = Sources.read(spark, s"$dir/json", "json", Some(schema))
    val want = sample.collect().map(_.toSeq).toSet
    assert(csv.collect().map(_.toSeq).toSet == want)
    assert(json.collect().map(_.toSeq).toSet == want)
    // text formats impose nullable=true; compare names + types
    def nt(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name, f.dataType)).toSeq
    assert(nt(csv.schema) == nt(schema) && nt(json.schema) == nt(schema))
  }

  test("orc roundtrip: self-describing schema validated, wrong schema rejected") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString + "/orc"
    Sources.writePartitioned(sample, dir, format = "orc")
    val back = Sources.read(spark, dir, "orc", Some(sample.schema))
    assert(back.collect().map(_.toSeq).toSet == sample.collect().map(_.toSeq).toSet)
    val bad = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.StringType)))
    intercept[IllegalArgumentException] {
      Sources.read(spark, dir, "orc", Some(bad))
    }
  }

  test("text format reads raw corpus lines into a single string column") {
    val dir = java.nio.file.Files.createTempDirectory("graft_txt").toString + "/t"
    Seq("first line", "second line", "third").toDF("value").write.text(dir)
    val back = Sources.read(spark, dir, "text")
    assert(back.columns.toSeq == Seq("value"))
    assert(back.as[String].collect().toSet ==
      Set("first line", "second line", "third"))
  }

  test("partitioned write produces prunable directories and roundtrips") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString + "/out"
    Sources.writePartitioned(sample, dir, partitionBy = Seq("grp"))
    assert(new java.io.File(dir).list().exists(_.startsWith("grp=")),
      "expected hive-style partition directories")
    val back = Sources.read(spark, dir, "parquet")
    assert(back.count() == 3)
    // partition pruning: only the grp=A directory is scanned
    val pruned = back.where(F.col("grp") === "A")
    val scan = pruned.queryExecution.executedPlan.toString()
    assert(pruned.count() == 2)
    assert(scan.contains("PartitionFilters") || !scan.contains("grp=B"))
  }

  test("parquet reader rejects wrong expected schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_schema").toString + "/p"
    sample.write.parquet(dir)
    val bad = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.StringType)))
    intercept[IllegalArgumentException] {
      Sources.read(spark, dir, "parquet", Some(bad))
    }
  }

  test("compact: many tiny files collapse to the byte-derived count; data identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val in = s"$dir/in"
    val out = s"$dir/out"
    // 40 partitions of a small table -> 40 tiny parquet files
    spark.range(0, 4000).selectExpr("id", "id * 3 AS v")
      .repartition(40).write.parquet(in)
    val (before, after, bytes) = Sources.compact(spark, in, out,
      targetFileBytes = 1L * 1024 * 1024)
    assert(before == 40L, s"expected 40 input files, got $before")
    assert(after < before && after >= 1, s"compaction must reduce file count, got $after")
    assert(bytes > 0)
    // ceil(bytes / target) with these sizes is 1 file
    assert(after == math.max(1L, (bytes + (1L << 20) - 1) / (1L << 20)))
    val a = spark.read.parquet(in).orderBy("id").collect().toSeq
    val b = spark.read.parquet(out).orderBy("id").collect().toSeq
    assert(a == b, "compaction must preserve the data exactly")
    // refuses to clobber its own input — including equivalent
    // spellings that raw string equality would let through
    intercept[IllegalArgumentException] {
      Sources.compact(spark, in, in)
    }
    intercept[IllegalArgumentException] {
      Sources.compact(spark, in, in + "/")
    }
    intercept[IllegalArgumentException] {
      Sources.compact(spark, in, "file:" + in)
    }
  }

  test("parseJsonColumn: typed extraction, malformed and missing keys go null") {
    import spark.implicits._
    import org.apache.spark.sql.{functions => F}
    val df = Seq(
      (1L, """{"k": 42, "extra": "x"}"""), // extra keys ignored
      (2L, """{"other": 1}"""),            // missing key -> null field
      (3L, """not json at all"""),         // malformed -> null field
      (4L, """{"k": -7}""")
    ).toDF("id", "props")
    val out = graft.sources.Sources.parseJsonColumn(df, "props", "k BIGINT")
      .select($"id", F.col("parsed").getField("k").as("k"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out(1L).contains(42L) && out(4L).contains(-7L))
    assert(out(2L).isEmpty && out(3L).isEmpty,
      "missing/malformed must be null, not a thrown parse error")
  }
}
