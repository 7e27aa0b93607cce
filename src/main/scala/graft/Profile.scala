package graft

import graft.dedup.Dedup
import graft.text.TextOps
import org.apache.spark.sql.{functions => F}

/** Scratch profiling main: stage-by-stage timings for the jaccard
  * dedup pipeline (dev aid, not part of the driver contract).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build(appName = "graft-profile")
    val t = Tables(spark, sfDir)
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = t.documents
    time("warm-docs")(docs.count())
    val tok = Dedup.docShingles(docs, "doc_id", "text", 3)
    time("docShingles")(tok.count())
    val tokC = tok.cache()
    time("cache-mat")(tokC.count())
    val sets = Dedup.docShingleSets(docs, "doc_id", "text", 3)
    time("shingleSets")(sets.count())
    val sizes = sets.select(F.col("id"), F.col("sz"))
    val dfreq = tokC.groupBy("sh").agg(F.count(F.lit(1)).as("df"))
    time("dfreq")(dfreq.count())
    val ranked = tokC.join(dfreq, "sh")
      .withColumn("rk", F.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("id")
          .orderBy(F.col("df").asc, F.col("sh").asc)))
    time("ranked")(ranked.count())
    val prefix = ranked.join(sizes, "id")
      .where(F.col("rk") <= F.col("sz") - F.ceil(F.lit(0.5) * F.col("sz")) + 1)
      .select("id", "sh")
    time("prefix")(prefix.count())
    val cands = prefix.as("a").join(prefix.as("b"), Seq("sh"))
      .where(F.col("a.id") < F.col("b.id"))
      .select(F.col("a.id").as("id1"), F.col("b.id").as("id2"))
      .distinct()
    time("cands")(cands.count())
    val full = Dedup.jaccardPairs(docs, "doc_id", "text", k = 3, threshold = 0.5)
    time("full-jaccard")(full.write.format("noop").mode("overwrite").save())
    time("full-again")(full.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
