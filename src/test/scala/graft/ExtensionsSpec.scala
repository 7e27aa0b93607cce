package graft

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft expressions are callable from SQL after extension injection") {
    GraftExtensions.register(spark)

    Seq(("a b c d e f", 1L)).toDF("text", "id").createOrReplaceTempView("sql_docs")
    val row = spark.sql(
      """SELECT simhash64(filter(split(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS sh,
        |       size(minhash_sig(shingle_strings(
        |         filter(split(lower(text), '[^a-z0-9]+'), t -> t <> ''), 3), 32)) AS n_sig,
        |       cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cs,
        |       sorted_intersect_count(array(1L, 2L, 3L), array(2L, 3L, 9L)) AS ic,
        |       indel_sim('Red Apple', 'apple') AS isim,
        |       char_entropy('abcd') AS ent,
        |       jaro_winkler_ppm('martha', 'marhta') AS jw
        |FROM sql_docs""".stripMargin).collect().head
    assert(row.getAs[Int]("n_sig") == 32)
    assert(math.abs(row.getAs[Double]("cs") - 1.0) < 1e-12)
    assert(row.getAs[Long]("ic") == 2L)
    assert(math.abs(row.getAs[Double]("isim") - 8.0 / 14) < 1e-12)
    assert(row.getAs[Long]("sh") != 0L)
    assert(math.abs(row.getAs[Double]("ent") - math.log(4)) < 1e-12)
    // the Winkler textbook pair: jaro 944444 ppm, prefix 3 -> 961111
    assert(row.getAs[Long]("jw") == 961111L)

    // aggregate function path: one sketch per group
    Seq((1L, "x"), (1L, "y"), (2L, "x")).toDF("g", "v").createOrReplaceTempView("sql_vals")
    val sigs = spark.sql(
      "SELECT g, minhash_agg(v, 16) AS sig FROM sql_vals GROUP BY g ORDER BY g")
      .as[(Long, Seq[Long])].collect()
    assert(sigs.length == 2 && sigs.forall(_._2.length == 16))
    assert(sigs(0)._2 != sigs(1)._2, "different value sets give different sketches")

    // bounded top-k aggregate from SQL (finalized counts in, best first)
    Seq(("x", 5L), ("y", 9L), ("z", 2L)).toDF("k", "n")
      .createOrReplaceTempView("sql_counts")
    val tk = spark.sql(
      "SELECT topk_by_count(n, k, 2) AS tk FROM sql_counts")
      .selectExpr("transform(tk, e -> e.key) AS keys").as[Seq[String]]
      .collect().head
    assert(tk == Seq("y", "x"), s"got $tk")
  }
}
