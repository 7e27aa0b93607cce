package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Each query is fully
  * materialized through the noop sink (count() would let Catalyst
  * prune the computed columns away and under-report).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build(appName = "graft-bench")
    // Warm-up: JVM/codegen classloading, parquet footers + page cache,
    // and the shared text/shingle pipeline — so per-query numbers
    // measure steady-state work, not whichever query runs first.
    spark.range(1000000).selectExpr("sum(id)").collect()
    locally {
      import org.apache.spark.sql.{functions => F}
      val t = Tables(spark, sfDir)
      Seq(t.region, t.nation, t.customer, t.supplier, t.part,
        t.orders, t.lineitem, t.events, t.documents, t.embeddings)
        .foreach(_.count())
      val warmed = t.documents.limit(64)
        .select(F.explode(graft.text.TextOps.shingles(
          graft.text.TextOps.tokens(F.col("text")), 3)).as("s"))
        .groupBy("s").count().count()
      require(warmed >= 0)
    }

    // optional arg: comma-separated query names (iteration aid)
    val only: Option[Set[String]] =
      if (args.nonEmpty) Some(args(0).split(",").toSet) else None
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // cache hygiene between queries: pipelines that legitimately
      // persist intermediates (pair tables, vocabularies) must not
      // accumulate across the run — leftover cached frames shift later
      // queries' numbers via storage/GC pressure, not plan quality
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
