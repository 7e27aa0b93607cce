package graft

import graft.text.Curate
import org.apache.spark.sql.{functions => F}

class CurateSpec extends SparkSpec {
  import spark.implicits._

  test("hashSample is deterministic and close to the nominal rate") {
    val df = spark.range(10000).toDF("id")
    val a = Curate.hashSample(df, "id", 0.3).as[Long].collect().toSet
    val b = Curate.hashSample(df, "id", 0.3).as[Long].collect().toSet
    assert(a == b, "same rows kept on every run")
    assert(math.abs(a.size / 10000.0 - 0.3) < 0.02, s"kept ${a.size}")
    // a lower rate keeps a subset of a higher rate (nested samples)
    val c = Curate.hashSample(df, "id", 0.1).as[Long].collect().toSet
    assert(c.subsetOf(a), "rate-nested sampling")
  }

  test("stratifiedSample downsamples only the targeted stratum") {
    val df = spark.range(4000).toDF("id")
      .withColumn("lang", F.when(F.col("id") % 2 === 0, "en").otherwise("fi"))
    val kept = Curate.stratifiedSample(df, "id", "lang", Map("en" -> 0.1), 1.0)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(kept("fi") == 2000L, "default rate 1.0 keeps everything")
    assert(kept("en") < 400L, s"en downsampled to ~10%, got ${kept("en")}")
  }

  test("qualityVerdict flags each failure mode with its first reason") {
    val docs = Seq(
      (1L, "the cat sat on the mat with a dog"),                  // clean
      (2L, "tiny"),                                               // too_short
      (3L, "spam spam spam spam spam the and is of it"),          // repetitive
      (4L, "the!!! and??? is### of$$$ it%%% on^^^ in&&& for***"), // symbol_heavy
      (5L, "zzz qqq www eee rrr ttt yyy uuu")                     // no_stopwords
    ).toDF("doc_id", "text")
    val v = Curate.qualityVerdict(F.col("text"))
    val out = docs.select(F.col("doc_id") +: v.map { case (n, c) => c.as(n) }: _*)
      .as[(Long, Boolean, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((true, None)), s"got ${out(1L)}")
    assert(out(2L) == ((false, Some("too_short"))))
    assert(out(3L) == ((false, Some("repetitive"))))
    assert(out(4L) == ((false, Some("symbol_heavy"))))
    assert(out(5L) == ((false, Some("no_stopwords"))))
  }

  test("unigramLogProb matches the hand-computed add-one model") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = Curate.unigramLogProb(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // counts: a=2 b=2 c=1, total=5, vocab=3 -> p(a)=p(b)=3/8, p(c)=2/8
    val (pa, pb, pc) = (3.0 / 8, 3.0 / 8, 2.0 / 8)
    assert(out(1L)._1 == 3L)
    assert(math.abs(out(1L)._2 - (math.log(pa) * 2 + math.log(pb)) / 3) < 1e-12)
    assert(out(2L)._1 == 2L)
    assert(math.abs(out(2L)._2 - (math.log(pb) + math.log(pc)) / 2) < 1e-12)
  }
}
