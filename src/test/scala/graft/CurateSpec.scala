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

  test("shardKey: deterministic across partitionings, balanced, complete") {
    val ids = (1L to 1000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    def assign(df: org.apache.spark.sql.DataFrame) =
      df.select(F.col("doc_id"), Curate.shardKey(F.col("doc_id"), 8).as("shard"))
        .as[(Long, Long)].collect().toMap
    val a = assign(ids)
    val b = assign(ids.repartition(13))
    assert(a == b, "membership is a pure function of the id")
    assert(a.values.toSet.subsetOf((0L until 8L).toSet))
    val sizes = a.values.groupBy(identity).view.mapValues(_.size)
    assert(sizes.size == 8 && sizes.values.min > 60,
      s"multiplicative hash balances sequential ids, got $sizes")
  }

  test("writeShuffledShards: reproducible sharded layout, roundtrip complete") {
    val ids = (1L to 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    Curate.writeShuffledShards(ids, "doc_id", nShards = 4, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 200L, "no rows lost")
    // on-disk shard dirs match the declared assignment
    val got = back.select("doc_id", "shard").as[(Long, Long)].collect().toMap
    val want = ids.select(F.col("doc_id"),
      Curate.shardKey(F.col("doc_id"), 4).as("s")).as[(Long, Long)].collect().toMap
    assert(got == want)
    assert(new java.io.File(dir).listFiles().count(_.getName.startsWith("shard=")) == 4)
  }

  test("writeShuffledShards: intra-shard order survives input repartitioning") {
    // the sort key is (shard, __ord, id) — with only the 1e6-granular
    // __ord, key ties would leave intra-tie order to the input layout
    val ids = (1L to 300L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    def writtenOrder(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] = {
      val dir = java.nio.file.Files.createTempDirectory("shardord").toString
      Curate.writeShuffledShards(df, "doc_id", nShards = 3, dir)
      (0L until 3L).map { s =>
        s -> spark.read.parquet(s"$dir/shard=$s").coalesce(1)
          .select("doc_id").as[Long].collect().toSeq
      }.toMap
    }
    val a = writtenOrder(ids.repartition(7))
    val b = writtenOrder(ids.repartition(2))
    assert(a == b, "written order must not depend on input partitioning")
  }

  test("unigramLogProb: head/tail skew split equals the plain shuffle join") {
    // Zipf-ish corpus: 'the' dominates (the head token a plain shuffle
    // join would funnel to one reducer); split path must be a pure
    // execution-strategy change, not a semantic one
    val docs = (1L to 60L).map { i =>
      (i, ("the " * 20) + s"rare$i word${i % 7}")
    }.toDF("doc_id", "text")
    def collect(headK: Int) =
      Curate.unigramLogProb(docs, "doc_id", "text", headK = headK)
        .select(F.col("id"), F.col("n_tokens"), F.round(F.col("avg_logprob"), 9))
        .as[(Long, Long, Double)].collect().toSet
    val split = collect(3)     // 'the' + two more in the broadcast head
    val shuffleOnly = collect(0) // empty head: every token takes the tail join
    assert(split == shuffleOnly)
    assert(split.size == 60)
  }

  test("unigramLogProb leaves no cache behind; count shuffle reused in-plan") {
    val docs = (1L to 40L).map(i => (i, s"alpha beta tok$i")).toDF("doc_id", "text")
    spark.catalog.clearCache()
    // delta-based: the shared test session may legitimately carry
    // OTHER suites' process-memo checkpoints (fixture corpora, cap
    // frames) — this test gates only what unigramLogProb itself pins
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = Curate.unigramLogProb(docs, "doc_id", "text", headK = 2)
    out.collect()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      "scoring must not pin a vocabulary cache for the session")
    // the token-count aggregation feeds head/tail/totals inside ONE
    // plan; ReuseExchange must dedupe the count shuffle, not re-run the
    // corpus tokenize per consumer
    val executed = out.queryExecution.executedPlan.toString
    assert(executed.contains("ReusedExchange"),
      "token-count exchange must be reused across its in-plan consumers")
  }

  test("unigramLogProb matches the hand-computed add-one model") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = Curate.unigramLogProb(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // counts: a=2 b=2 c=1, total=5, vocab=3 -> p(a)=p(b)=3/8, p(c)=2/8
    val (pa, pb, pc) = (3.0 / 8, 3.0 / 8, 2.0 / 8)
    assert(out(1L)._1 == 3L)
    // tolerance covers the §5 decimal accumulation (r9): each addend
    // is round(logp, 9) — quantization <= 5e-10/token, never a model
    // error (a wrong probability shifts the score by >= 1e-3)
    assert(math.abs(out(1L)._2 - (math.log(pa) * 2 + math.log(pb)) / 3) < 1e-8)
    assert(out(2L)._1 == 2L)
    assert(math.abs(out(2L)._2 - (math.log(pb) + math.log(pc)) / 2) < 1e-8)
  }

  test("corpusStats: exact per-group counts/volumes, one partial-agg shuffle") {
    val docs = Seq(
      ("web", "en", "one two three"),
      ("web", "en", "four five"),
      ("web", "de", "sechs"),
      ("books", "en", "a b c d")).toDF("source", "lang", "text")
    val out = Curate.corpusStats(docs, Seq("source", "lang"), "text")
      .orderBy("source", "lang")
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("books", "en", 1L, 7L, 7L, 7L, 4L),
      ("web", "de", 1L, 5L, 5L, 5L, 1L),
      ("web", "en", 2L, 22L, 9L, 13L, 5L)))
    // map-side combine before the exchange: the shuffle carries one row
    // per (source, lang), not one per document
    val p = Curate.corpusStats(docs, Seq("source", "lang"), "text")
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_"), "no map-side partial aggregation")
  }

  test("lengthQuantiles: ANSI linear interpolation on a known distribution") {
    // token counts 1..4 in one group: p50 = 2.5 (interpolated),
    // p90 = 1 + 0.9*3 = 3.7, p99 = 3.97
    val docs = Seq(("en", "a"), ("en", "a b"), ("en", "a b c"), ("en", "a b c d"))
      .toDF("lang", "text")
    val out = Curate.lengthQuantiles(docs, "lang", "text")
      .as[(String, Double, Double, Double)].collect().toSeq
    assert(out == Seq(("en", 2.5, 3.7, 3.97)), s"got $out")
  }

  test("takePerStratum: exact N per stratum, stable across partitionings") {
    val docs = (1L to 50L).map(i => (i, if (i % 3 == 0) "de" else "en"))
      .toDF("doc_id", "lang")
    val take = Curate.takePerStratum(docs, "doc_id", "lang", n = 5)
      .as[(Long, String)].collect().toSet
    assert(take.count(_._2 == "en") == 5 && take.count(_._2 == "de") == 5)
    val repart = Curate.takePerStratum(docs.repartition(7), "doc_id", "lang", n = 5)
      .as[(Long, String)].collect().toSet
    assert(repart == take, "membership must be a pure function of the ids")
    // strata smaller than n are kept whole, not padded
    val tiny = Curate.takePerStratum(docs.where($"doc_id" <= 2), "doc_id", "lang", n = 5)
    assert(tiny.count() == 2)
  }

  test("gopherProfile: hand-computed repetition measures and verdicts") {
    val docs = Seq(
      // 5 lines, "same line" twice: dup_line_frac exactly 0.2 (at the
      // threshold, not over), dup chars 9/62, top-2gram 2/12 — passes
      (1L, "same line\nother wordy words\nsame line\nmore here also now\nand extra"),
      // degenerate bigram repetition on one line -> top_2gram = 1.0
      (2L, "ab ab ab ab ab"),
      // numeric tokens, mean length inside the window -> alpha floor
      (3L, "123 456 789 1011 1213 1415 1617 1819"),
      // 11 distinct very long words: every earlier rule passes, mean
      // word length blows the [3, 10] window
      (4L, "extraordinarily incomprehensibilities floccinaucinihilipilification" +
        " antidisestablishmentarianism hippopotomonstrosesquippedaliophobia" +
        " pseudopseudohypoparathyroidism supercalifragilisticexpialidocious" +
        " pneumonoultramicroscopicsilicovolcanoconiosis electroencephalographically" +
        " otorhinolaryngological uncharacteristically"),
      (5L, "")).toDF("doc_id", "text")
    val got = Curate.gopherProfile(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val byId = got.map(r => r.getLong(0) -> r).toMap
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d1 = byId(1L)
    assert(d1.getAs[Int]("n_lines") == 5)
    assert(d1.getAs[Double]("dup_line_frac") == 0.2)
    assert(d1.getAs[Double]("dup_line_char_frac") == r6(9.0 / 62.0))
    assert(d1.getAs[Double]("top_2gram_share") == r6(2.0 / 12.0))
    assert(d1.getAs[Boolean]("keep"), s"doc1 should pass: $d1")
    val d2 = byId(2L)
    assert(d2.getAs[Double]("top_2gram_share") == 1.0)
    assert(d2.getAs[String]("reason") == "top_2gram", s"got $d2")
    assert(byId(3L).getAs[String]("reason") == "non_alpha",
      s"got ${byId(3L)}")
    assert(byId(4L).getAs[String]("reason") == "word_length",
      s"got ${byId(4L)}")
    // empty text: one empty line, zero tokens -> mean length 0 fails
    // the word-length window (never keep-able garbage)
    assert(!byId(5L).getAs[Boolean]("keep"))
    // narrow: profiling itself must not shuffle
    val plan = Curate.gopherProfile(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"gopherProfile must not shuffle:\n$plan")
  }

  test("leakageFreeSplit: clusters stay whole; unpaired docs self-assign") {
    val df = spark.range(2000).toDF("id")
    // chain 10<->11<->12 plus pair 100<->200 (cross-"split" ids)
    val pairs = Seq((10L, 11L), (11L, 12L), (100L, 200L)).toDF("id1", "id2")
    val got = Curate.leakageFreeSplit(df, "id", pairs,
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      .as[(Long, Long, String)].collect()
    val byId = got.map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.length == 2000, "every document assigned")
    // every cluster member carries the min-id group and ONE split
    assert(Seq(10L, 11L, 12L).map(byId(_)._1).distinct == Seq(10L))
    assert(Seq(10L, 11L, 12L).map(byId(_)._2).distinct.length == 1)
    assert(byId(100L) == byId(200L))
    // unpaired docs represent themselves
    assert(byId(42L)._1 == 42L)
    // split proportions track the weights (deterministic hash, so
    // exact counts are stable — just bound them loosely here)
    val counts = got.groupBy(_._3).view.mapValues(_.length).toMap
    assert(counts("train") > 1600 && counts("val") > 40 && counts("test") > 40,
      s"proportions off: $counts")
    // deterministic across invocations
    val again = Curate.leakageFreeSplit(df, "id", pairs,
      Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      .as[(Long, Long, String)].collect()
    assert(got.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("chunkTokens: overlapping windows, short tails, empty docs dropped") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks, 2 chunks
      (2L, (1 to 4).map(i => s"s$i").mkString(" ")),  // fits one window
      (3L, (1 to 13).map(i => s"u$i").mkString(" ")), // exact last window
      (4L, ""),                                       // empty: no chunks
      (5L, "solo")).toDF("doc_id", "text")
    val got = Curate.chunkTokens(docs, "doc_id", "text",
        chunkSize = 7, stride = 6)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Int, Int, Int, String)].collect()
    assert(got.map(_._1).toSet == Set(1L, 2L, 3L, 5L), "empty doc yields none")
    // doc 1: [t1..t7] then [t7..t10] (1-token overlap, short tail)
    val d1 = got.filter(_._1 == 1L)
    assert(d1.map(r => (r._2, r._3, r._4)).toSeq == Seq((0, 0, 7), (1, 6, 4)))
    assert(d1(0)._5 == (1 to 7).map(i => s"t$i").mkString(" "))
    assert(d1(1)._5 == (7 to 10).map(i => s"t$i").mkString(" "))
    // doc 3: 13 toks = 7 + stride 6 exactly -> chunks at 0 and 6, full
    assert(got.filter(_._1 == 3L).map(r => (r._2, r._4)).toSeq ==
      Seq((0, 7), (1, 7)))
    // single-word and sub-window docs give exactly one chunk
    assert(got.filter(_._1 == 2L).map(_._4).toSeq == Seq(4))
    assert(got.filter(_._1 == 5L).map(_._5).toSeq == Seq("solo"))
    // narrow plan: no exchange anywhere in the chunking itself
    val plan = Curate.chunkTokens(docs, "doc_id", "text", 7, 6)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("packSequences: exclusive-cumsum packing, straddlers to start pack") {
    // one shard (nShards = 1): token counts 3, 2, 4 in id order with
    // budget 5 -> start offsets 0, 3, 5 -> packs 0, 0, 1; doc 2 (start
    // 3, ends at 5) straddles the boundary and stays in pack 0
    val docs = Seq((1L, "a b c"), (2L, "d e"), (3L, "f g h i"))
      .toDF("doc_id", "text")
    val out = Curate.packSequences(docs, "doc_id", "text", budget = 5, nShards = 1)
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L), s"got $out")
    // reproducible under any input partitioning (the window re-sorts)
    val repart = Curate.packSequences(docs.repartition(3), "doc_id", "text",
      budget = 5, nShards = 1)
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
    assert(repart == out)
  }

  test("topTokens: vocabulary-sized window input, deterministic tie-break") {
    val docs = Seq(("en", "b b a a c"), ("en", "a"), ("de", "x y y"))
      .toDF("lang", "text")
    val out = Curate.topTokens(docs, "lang", "text", k = 2)
      .orderBy("lang", "rank")
      .as[(String, String, Long, Long)].collect().toSeq
    // en: a=3, b=2; de: y=2, x=1 — 'a' beats 'b' on count, not alpha luck
    assert(out == Seq(("de", "y", 2L, 1L), ("de", "x", 1L, 2L),
      ("en", "a", 3L, 1L), ("en", "b", 2L, 2L)), s"got $out")
    // scale shape: counts combine map-side, the top-k is the bounded
    // topk_by_count aggregate — NO rank window (whose exchange would
    // ship the whole per-group vocabulary into one partition)
    val p = Curate.topTokens(docs, "lang", "text", k = 2)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_count"), "token counts must combine map-side")
    assert(p.contains("partial_topk_by_count"),
      "top-k must partial-aggregate map-side")
    assert(!p.contains("Window"), "top-k must not use a rank window")
  }

  test("topTokens bounded aggregate equals the rank-window formulation") {
    import org.apache.spark.sql.{functions => F}
    // adversarial distribution: many ties at the k boundary, tokens
    // spread across partitions so partial buffers must merge correctly
    val docs = (1 to 400).map { i =>
      val lang = if (i % 2 == 0) "en" else "de"
      (lang, s"t${i % 23} t${i % 7} t${i % 23} common")
    }.toDF("lang", "text").repartition(13)
    val fast = Curate.topTokens(docs, "lang", "text", k = 8)
      .as[(String, String, Long, Long)].collect().toSet
    val counts = docs
      .select($"lang", F.explode(graft.text.TextOps.tokens($"text")).as("tok"))
      .groupBy("lang", "tok").agg(F.count(F.lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(F.col("n").desc, F.col("tok").asc)
    val slow = counts.withColumn("rank", F.row_number().over(w).cast("long"))
      .where($"rank" <= 8)
      .as[(String, String, Long, Long)].collect().toSet
    assert(fast == slow, s"missing=${slow -- fast} extra=${fast -- slow}")
  }

  test("qualityBuckets: equal populations, head gets the best scores, id tie-break") {
    // 9 docs over a tiny shared vocabulary; rare-token docs score lower
    val docs = (1L to 9L).map { i =>
      val body = if (i <= 3) "common common common common"
      else if (i <= 6) "common common rare common"
      else "rare rarer common rarest"
      (i, body)
    }.toDF("doc_id", "text")
    val out = Curate.qualityBuckets(docs, "doc_id", "text", buckets = 3)
      .as[(Long, Double, Long, String)].collect()
    assert(out.length == 9)
    val byBucket = out.groupBy(_._3).view.mapValues(_.map(_._1).toSet).toMap
    assert(byBucket(1L) == Set(1L, 2L, 3L), s"head: ${byBucket(1L)}")
    assert(byBucket(2L) == Set(4L, 5L, 6L), s"middle: ${byBucket(2L)}")
    assert(byBucket(3L) == Set(7L, 8L, 9L), s"tail: ${byBucket(3L)}")
    val names = out.map(r => r._3 -> r._4).toSet
    assert(names == Set(1L -> "head", 2L -> "middle", 3L -> "tail"))
    // within a bucket of identical scores, assignment came from the id
    // tie-break — re-running must reproduce it exactly
    val again = Curate.qualityBuckets(docs, "doc_id", "text", buckets = 3)
      .as[(Long, Double, Long, String)].collect().toSet
    assert(again == out.toSet, "bucket assignment must be deterministic")
  }

  test("qualityBuckets: uneven split puts the remainder in the leading buckets") {
    val docs = (1L to 7L).map(i => (i, s"tok$i common words here"))
      .toDF("doc_id", "text")
    val sizes = Curate.qualityBuckets(docs, "doc_id", "text", buckets = 3)
      .groupBy("bucket").count()
      .as[(Long, Long)].collect().toMap
    assert(sizes == Map(1L -> 3L, 2L -> 2L, 3L -> 2L), s"got $sizes")
  }

  test("bigramLogProb: add-one conditional bigram scores, hand-computed") {
    val docs = Seq(
      (1L, "a b a b"), // bigrams: "a b" x2, "b a"
      (2L, "a b"),
      (3L, "b b"),
      (4L, "c")        // single token -> no bigrams, no row
    ).toDF("doc_id", "text")
    // unigram counts: a=3, b=5, c=1; V=3
    // P(b|a) = (3+1)/(3+3), P(a|b) = (1+1)/(5+3), P(b|b) = (1+1)/(5+3)
    val pAB = math.log(4.0 / 6.0)
    val pBA = math.log(2.0 / 8.0)
    val pBB = math.log(2.0 / 8.0)
    val got = Curate.bigramLogProb(docs, "doc_id", "text")
      .orderBy("id").as[(Long, Long, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 3L), s"got $got")
    assert(got.map(_._2) == Seq(3L, 1L, 1L), s"got $got")
    val want = Seq((2 * pAB + pBA) / 3, pAB, pBB)
    // 1e-8 tolerance: the §5 decimal accumulation (r9) rounds each
    // addend to 9 decimals — see the unigram spec's note
    got.map(_._3).zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-8, s"got $got want $want")
    }
  }

  test("lengthQuantilesApproxGate: sketch lands in the exact rank window; sketch agg in-plan") {
    // heavy-tailed lengths across two groups; with accuracy 10000 and
    // these group sizes the sketch must sit inside the rank window
    val docs = ((1 to 400).map(i => ("en", ("w " * (i % 37 + 1)).trim)) ++
      (1 to 300).map(i => ("de", ("w " * (i * i % 97 + 1)).trim))).toDF("lang", "text")
    val out = Curate.lengthQuantilesApproxGate(docs, "lang", "text")
    val got = out.orderBy("lang").as[(String, Boolean, Boolean, Boolean)].collect().toSeq
    assert(got == Seq(("de", true, true, true), ("en", true, true, true)), s"got $got")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("approx_percentile"),
      "the gate must exercise the SKETCH aggregate, not exact percentile only")
  }

  test("bpeTrain learns the hand-computed Sennrich merges in order") {
    // the classic example corpus: low x7 (5+2 as 'lower' prefix...
    // spelled out), newest x6, widest x3. Hand-computed:
    //   step 1: pairs e-s (6+3=9) and s-t (9) tie -> 'e s' wins asc
    //   step 2: es-t = 9 beats l-o/o-w = 7 -> 'es t'
    //   step 3: l-o (7) ties o-w (7) -> 'l o' wins asc
    val docs = Seq(
      (1L, Array.fill(5)("low").mkString(" ")),
      (2L, Array.fill(2)("lower").mkString(" ")),
      (3L, Array.fill(6)("newest").mkString(" ")),
      (4L, Array.fill(3)("widest").mkString(" "))).toDF("doc_id", "text")
    val got = Curate.bpeTrain(docs, "text", nMerges = 3)
      .orderBy("step").as[(Long, String, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "e s", "es", 9L),
      (2L, "es t", "est", 9L),
      (3L, "l o", "lo", 7L)), s"got $got")
  }

  test("bpeSubwordCounts applies merges in step order, shuffle-free") {
    val docs = Seq((1L, "low newest"), (2L, "widest"), (3L, "")).toDF("doc_id", "text")
    // merges from the spec above: low -> 'lo w' (2), newest ->
    // 'n e w est' (4), widest -> 'w i d est' (4)
    val out = Curate.bpeSubwordCounts(docs, "doc_id", "text",
      Seq("e s", "es t", "l o"))
    val got = out.orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 6L), (2L, 1L, 4L), (3L, 0L, 0L)), s"got $got")
    // apply is a pure per-row projection: no exchange anywhere
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"apply pass must be shuffle-free:\n$plan")
  }

  test("bpeTrain is partitioning-invariant and exhausts gracefully") {
    val docs = (1L to 40L).map(i => (i, "ab" * (i % 3 + 1).toInt)).toDF("doc_id", "text")
    val a = Curate.bpeTrain(docs, "text", 4)
      .orderBy("step").as[(Long, String, String, Long)].collect().toSeq
    val b = Curate.bpeTrain(docs.repartition(7), "text", 4)
      .orderBy("step").as[(Long, String, String, Long)].collect().toSeq
    assert(a == b, "merge table must be a pure function of the corpus")
    // single-char vocabulary exhausts: 'z' has no pairs at all
    val tiny = Seq((1L, "z z z")).toDF("doc_id", "text")
    assert(Curate.bpeTrain(tiny, "text", 5).count() == 0,
      "no adjacent pairs -> empty merge table, not a failure")
  }

  test("mixtureRates: allocations, under-supply pinning, default weight") {
    // srcA: 10 tokens available; srcB: 4; srcC: 6 (default weight)
    val docs = Seq(
      ("srcA", "one two three four five six seven eight nine ten"),
      ("srcB", "just four tokens here"),
      ("srcC", "six more tokens live in here")
    ).toDF("source", "text")
    val out = Curate.mixtureRates(docs, "source", "text",
        weights = Map("srcA" -> 0.5, "srcB" -> 1.0), defaultWeight = 0.25,
        budgetTokens = 8)
      .orderBy("source")
      .as[(String, Long, Long, Double)].collect().toSeq
    // srcA: target floor(0.5*8)=4 of 10 -> 0.4; srcB: floor(1.0*8)=8 of
    // 4 -> pinned at 1.0 (under-supplied); srcC: floor(0.25*8)=2 of 6
    assert(out == Seq(
      ("srcA", 10L, 4L, 0.4),
      ("srcB", 4L, 8L, 1.0),
      ("srcC", 6L, 2L, math.rint(2.0 / 6.0 * 1e6) / 1e6)), s"got $out")
  }

  test("temperatureRates: alpha=1 reproduces natural shares, alpha<1 flattens toward uniform") {
    // three groups with 8:2:1 token skew ("w" repeated per doc)
    val docs = Seq.tabulate(11)(i =>
      (i.toLong, if (i < 8) "g0" else if (i < 10) "g1" else "g2", "w w w w"))
      .toDF("id", "grp", "text")
    val at1 = Curate.temperatureRates(docs, "grp", "text", alpha = 1.0,
        budgetTokens = 22)
      .select("group", "natural_share", "temp_share")
      .as[(String, Double, Double)].collect().sortBy(_._1)
    at1.foreach { case (g, p, q) =>
      assert(math.abs(p - q) < 1e-6, s"$g: alpha=1 must leave shares unchanged") }
    val at3 = Curate.temperatureRates(docs, "grp", "text", alpha = 0.3,
        budgetTokens = 22)
      .select("group", "natural_share", "temp_share", "epochs")
      .as[(String, Double, Double, Double)].collect().sortBy(_._1).toSeq
    val byG = at3.map(r => r._1 -> r).toMap
    // the head compresses, the tail expands, ordering is preserved
    assert(byG("g0")._3 < byG("g0")._2, "high-resource share must shrink")
    assert(byG("g2")._3 > byG("g2")._2, "low-resource share must grow")
    assert(byG("g0")._3 > byG("g1")._3 && byG("g1")._3 > byG("g2")._3,
      "flattening must not reorder groups")
    // low-resource upsampling: g2's effective epochs exceed the head's
    assert(byG("g2")._4 > byG("g0")._4)
  }
}
