package graft

import graft.similarity.Ann
import org.apache.spark.sql.{functions => F}
import scala.util.Random

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // deterministic clustered vectors: 4 well-separated centers + noise
  private def corpus = {
    val rnd = new Random(42)
    val centers = Seq.fill(4)(Array.fill(16)(rnd.nextGaussian()))
    (0 until 200).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => (x + 0.05 * rnd.nextGaussian()).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("cosinePairsLsh: banded candidates + exact verify equal the exact pair join") {
    // clustered corpus: every within-cluster pair sits far above the
    // threshold, cross-cluster pairs far below — the regime the banded
    // path targets. Exact verification makes precision 1.0 by
    // construction; this asserts recall is complete here too.
    val exact = Ann.cosinePairs(corpus, "vec_id", "embedding", threshold = 0.9)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val lsh = Ann.cosinePairsLsh(corpus, "vec_id", "embedding", threshold = 0.9)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "test corpus must contain near-dup pairs")
    assert(lsh == exact, s"missed=${(exact -- lsh).size} extra=${(lsh -- exact).size}")
  }

  test("STRESS (spec-only since r8): low-threshold full-width config still matches exact") {
    // tau=0.4 on the weakly-correlated full-width vectors — the regime
    // where fixed-bit-width banding's own cost model concedes MORE
    // candidates than brute force (LSH theory), so it is deliberately
    // NOT a wired driver query; recall completeness is still asserted
    // here (deterministic signatures: holds or fails, no variance)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Ann.cosinePairs(emb, "vec_id", "embedding", threshold = 0.4)
      .select("id1", "id2", "similarity").as[(Long, Long, Double)].collect().toSet
    val lsh = Ann.cosinePairsLsh(emb, "vec_id", "embedding", threshold = 0.4,
      bucketCap = Some(1000L))
      .select("id1", "id2", "similarity").as[(Long, Long, Double)].collect().toSet
    assert(lsh.subsetOf(exact), "exact verify forbids false positives")
    assert(lsh == exact,
      s"recall ${lsh.size}/${exact.size} — retune bands/probes if this ever drops")
  }

  test("cosinePairsLsh matches exact at the wired MID threshold with the cap ON") {
    // the EXACT wired dedup_embedding_lsh configuration since r8
    // (tau=0.65 on the clustered 8-dim coarse prefix, 15 bands x 4
    // bits, bucketCap on) replayed at sf0.001 — the driver gate's
    // parity check in miniature
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", F.slice($"embedding", 1, 8).as("embedding"))
    val exact = Ann.cosinePairs(emb, "vec_id", "embedding", threshold = 0.65)
      .select("id1", "id2", "similarity").as[(Long, Long, Double)].collect().toSet
    val lsh = Ann.cosinePairsLsh(emb, "vec_id", "embedding", threshold = 0.65,
      nPlanes = 60, bands = 15, bucketCap = Some(1000L))
      .select("id1", "id2", "similarity").as[(Long, Long, Double)].collect().toSet
    assert(exact.nonEmpty, "prefix-projected corpus must contain pairs above 0.65")
    assert(lsh == exact,
      s"recall ${lsh.size}/${exact.size} — retune bands/probes or cap if this drops")
  }

  test("cosinePairsLsh matches exact at the wired production threshold with the cap ON") {
    // the EXACT wired dedup_embedding_lsh_hi configuration (tau=0.8 on
    // the 8-dim coarse prefix, bucketCap on) replayed at sf0.001 — the
    // driver gate's sf0.01 parity check, in miniature, every test run
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", F.slice($"embedding", 1, 8).as("embedding"))
    val exact = Ann.cosinePairs(emb, "vec_id", "embedding", threshold = 0.8)
      .select("id1", "id2", "similarity").as[(Long, Long, Double)].collect().toSet
    val lsh = Ann.cosinePairsLsh(emb, "vec_id", "embedding", threshold = 0.8,
      bucketCap = Some(1000L))
      .select("id1", "id2", "similarity").as[(Long, Long, Double)].collect().toSet
    assert(exact.nonEmpty, "prefix-projected corpus must contain pairs above 0.8")
    assert(lsh == exact,
      s"recall ${lsh.size}/${exact.size} — retune bands/probes or cap if this drops")
  }

  test("bucketCap bounds the degenerate-bucket blowup; capped output is a subset") {
    // degenerate corpus: 150 near-identical vectors collapse into one
    // band key per band — the O(n^2) case the cap exists for — plus a
    // handful of distinct clustered vectors that still pair up normally
    val rnd = new Random(7)
    val base = Array.fill(16)(rnd.nextGaussian())
    val degen = (0 until 150).map { i =>
      (i.toLong, base.map(x => (x + 1e-4 * rnd.nextGaussian()).toFloat).toSeq)
    }
    val other = corpus.where($"vec_id" < 40)
      .select($"vec_id" + 1000, $"embedding").as[(Long, Seq[Float])].collect().toSeq
    val df = (degen ++ other).toDF("vec_id", "embedding")
    val uncapped = Ann.cosinePairsLsh(df, "vec_id", "embedding", threshold = 0.9)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val capped = Ann.cosinePairsLsh(df, "vec_id", "embedding", threshold = 0.9,
      bucketCap = Some(100L))
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(capped.subsetOf(uncapped), "capping only ever drops pairs")
    // the degenerate cluster's C(150,2) pairs ride only on over-cap
    // buckets and are dropped; the normal clusters' pairs survive
    assert(capped.nonEmpty, "under-cap buckets keep their pairs")
    // (145 not 150: the 1e-4 noise can flip a near-zero plane for a
    // couple of rows, splitting them off the degenerate bucket)
    assert(uncapped.size - capped.size >= 145 * 144 / 2,
      "the documented recall tradeoff: over-cap buckets are skipped")
    // and the counters see exactly that pressure
    val rep = Ann.capReport(df, "vec_id", "embedding",
        nPlanes = 60, bands = 12, bucketCap = 100L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep("embedding_buckets_over_cap") >= 12,
      "one over-cap bucket per band from the degenerate cluster")
    assert(rep("embedding_band_entries_dropped") >= 12L * 145,
      "nearly every degenerate row sits in an over-cap bucket in every band")
  }

  test("SCALE: adaptive layout + cap keep banded candidate volume ~linear across 4x corpus growth") {
    // r8 verdict #8: assert the candidate-volume bound IN-PLAN, not
    // just via the SF-pinned parity gate. Replays the capped path's
    // exact candidate construction (banded -> over-cap anti-join ->
    // band self-join with flip probes) at n and 4n under the
    // size-derived layout and counts candidate rows BEFORE the
    // distinct/verify — the number that must not go quadratic. A
    // regression in the cap/adaptive logic (fixed bits, dropped
    // anti-join, cap ignored) sends the ratio toward 16x.
    def corpus(n: Int, seed: Int) = {
      val rnd = new Random(seed)
      (0 until n).map(i =>
        (i.toLong, Seq.fill(8)((rnd.nextGaussian() * 0.5).toFloat)))
        .toDF("vec_id", "embedding").repartition(8)
    }
    val cap = 64L
    def candidates(n: Int): Long = {
      val df = corpus(n, 7).persist()
      df.count()
      val (bands, bits) = Ann.lshLayout(n, threshold = 0.8, bucketCap = cap)
      val banded = Ann.bandedSignatures(df, "vec_id", "embedding",
        nPlanes = bands * bits, bands = bands).persist()
      banded.count()
      val over = banded.groupBy("band", "key")
        .agg(F.count(F.lit(1)).as("bn")).where(F.col("bn") > cap)
        .select("band", "key")
      val kept = banded.join(over, Seq("band", "key"), "left_anti")
      val c = kept.as("a")
        .join(Ann.withFlipProbes(kept, bits).as("b"), Seq("band", "key"))
        .where(F.col("a.id") < F.col("b.id")).count()
      banded.unpersist(); df.unpersist()
      c
    }
    val c1 = candidates(4000)
    val c2 = candidates(16000)
    assert(c1 > 0 && c2 > 0, s"candidate stream must be non-empty: $c1, $c2")
    // quadratic would be 16x; the adaptive layout widens bits with n so
    // typical buckets track cap/4 and growth stays ~linear (bands can
    // grow a little with the widened bits — hence 6x headroom, not 4x)
    assert(c2 <= 6 * c1,
      s"candidate volume must stay ~linear under the cap: $c1 -> $c2 " +
        s"(${c2.toDouble / c1}x for a 4x corpus)")
    // and the per-row formula bound the cost model documents:
    // candidates <= n * bands * (bits+1) * cap for each size
    val (b2, w2) = Ann.lshLayout(16000, threshold = 0.8, bucketCap = cap)
    assert(c2 <= 16000L * b2 * (w2 + 1) * cap,
      "the documented O(n * bands * probes * cap) bound must hold")
  }

  test("knnLabelEval: hand-computed majority vote with both tie-breaks") {
    // two clean clusters on the axes plus a bridge point; k=2 forces a
    // vote tie for the axis-1 queries (nearest = own cluster, second =
    // the label-0 bridge), exercising the (votes desc, label asc) rule
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f), 0),
      (2L, Seq(0.9f, 0.1f), 0),
      (3L, Seq(0.0f, 1.0f), 1),
      (4L, Seq(0.1f, 0.9f), 1),
      (5L, Seq(0.6f, 0.5f), 0)).toDF("vec_id", "embedding", "label")
    val got = Ann.knnLabelEval(emb, "vec_id", "embedding", "label", emb, k = 2)
      .orderBy("vec_id").as[(Long, Int, Int, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, 0, 0, true),
      (2L, 0, 0, true),
      (3L, 1, 0, false), // 2-NN = {id4 (label 1), id5 (label 0)} -> tie -> label asc
      (4L, 1, 0, false),
      (5L, 0, 0, true)), s"got $got")
  }

  test("LshBandKeys generalizes the single-long signature bit-for-bit") {
    // band b's key from the array kernel must equal extracting bits
    // [b*bits, (b+1)*bits) from LshSig's 60-plane signature — the
    // compatibility contract that keeps every pre-r10 wired layout
    // (and its parity-gated output) byte-identical while lifting the
    // 63-plane total ceiling for the size-derived layouts
    val df = corpus.limit(50)
    val bands = 12; val bits = 5
    val viaSig = df.select($"vec_id",
        Ann.lshSignature($"embedding", nPlanes = bands * bits).as("sig"),
        F.explode(F.lit((0 until bands).toArray)).as("band"))
      .select($"vec_id", $"band",
        F.expr(s"shiftright(sig, band * $bits) & ${(1L << bits) - 1}L").as("key"))
      .as[(Long, Int, Long)].collect().toSet
    val viaBands = df.select($"vec_id",
        F.posexplode(graft.functions.HashExprs.lshBandKeys($"embedding", bands, bits))
          .as(Seq("band", "key")))
      .as[(Long, Int, Long)].collect().toSet
    assert(viaBands == viaSig, "band-key kernel diverged from the signature layout")
  }

  test("lshLayout: gate floors hold; bits widens with corpus size") {
    // at gate scale the floors pin the measured-complete layouts, so
    // the wired queries' plans (and their parity baselines) are
    // unchanged by the adaptive chooser
    assert(Ann.lshLayout(2000, 0.65, 1000, minBands = 15, minBits = 4) == (15, 4))
    assert(Ann.lshLayout(200, 0.8, 1000, minBands = 12, minBits = 5) == (12, 5))
    // the r8 cliff scale: at n ~ cap * 2^bits the fixed 4-bit layout's
    // AVERAGE bucket crosses the cap; the chooser must have widened
    // well before that
    val (bandsCliff, bitsCliff) = Ann.lshLayout(16000, 0.65, 1000, minBands = 15, minBits = 4)
    assert(bitsCliff > 4, s"bits must widen by n=16k, got $bitsCliff")
    assert(bandsCliff >= 15, "bands never drop below the measured floor")
    // 100x further: bits tracks log(n), bands tracks the recall formula
    val (bands1m, bits1m) = Ann.lshLayout(1600000, 0.65, 1000, minBands = 15, minBits = 4)
    assert(bits1m > bitsCliff && bands1m >= bandsCliff,
      s"layout must keep widening: ($bands1m, $bits1m) vs ($bandsCliff, $bitsCliff)")
    // avg bucket stays at cap/4: n / 2^bits <= cap/4 (up to ceil)
    assert(1600000.0 / (1L << bits1m) <= 250.0,
      "average bucket must track a quarter of the cap")
  }

  test("SCALE: adaptive layout keeps recall >= 0.9 at 52k vectors where the fixed layout collapses") {
    // The r8 recall cliff, reproduced and removed. 25k planted twin
    // pairs (cosine ~0.93) + a 2000-row identical blob. At n=52k the
    // OLD fixed 15x4 layout puts n/16 ~ 3250 rows in the AVERAGE
    // bucket — every bucket crosses any sane cap, the kept side
    // empties, recall -> 0. The size-derived layout widens bits so
    // typical buckets sit at ~cap/4 and only the genuinely degenerate
    // blob crosses the cap (the documented tradeoff).
    val d = 16
    val rnd = new Random(1234)
    val rows = new scala.collection.mutable.ArrayBuffer[(Long, Seq[Float])](52000)
    var i = 0
    while (i < 25000) {
      val base = Array.fill(d)(rnd.nextGaussian())
      // twin = base + 0.38*noise: E[cos] = 1/sqrt(1+0.38^2) ~ 0.935
      val twin = base.map(x => x + 0.38 * rnd.nextGaussian())
      rows += ((i.toLong * 2, base.map(_.toFloat).toSeq))
      rows += ((i.toLong * 2 + 1, twin.map(_.toFloat).toSeq))
      i += 1
    }
    val blobBase = Array.fill(d)(rnd.nextGaussian()).map(_.toFloat).toSeq
    (0 until 2000).foreach(j => rows += ((100000L + j, blobBase)))
    val df = rows.toSeq.toDF("vec_id", "embedding")
      .repartition(32).persist()
    df.count()
    val cap = 8L
    val tau = 0.8
    // recallTarget 0.95 keeps the test-sized band count; planted pairs
    // sit at ~0.93 >> tau, so their per-band hit rate is far above the
    // at-threshold worst case the formula budgets for
    val (bands, bits) = Ann.lshLayout(52000, tau, cap,
      recallTarget = 0.95, minBands = 12, minBits = 4)
    assert(bits >= 12, s"52k vectors at cap=$cap must widen well past 4 bits, got $bits")
    val found = Ann.cosinePairsLsh(df, "vec_id", "embedding", threshold = tau,
        nPlanes = bands * bits, bands = bands, bucketCap = Some(cap))
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // ground truth for the planted population only (exact all-pairs at
    // 52k is O(n^2) — the planted ids make slice recall exact): a twin
    // pair is IN the truth set iff its true cosine clears tau
    val truth = df.where($"vec_id" < 100000L && $"vec_id" % 2 === 0)
      .select($"vec_id".as("id1"), $"embedding".as("v1"))
      .join(df.where($"vec_id" < 100000L && $"vec_id" % 2 === 1)
        .select($"vec_id".as("id2"), $"embedding".as("v2")),
        F.col("id2") === F.col("id1") + 1)
      .where(graft.functions.HashExprs.cosineSim($"v1", $"v2") >= tau)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(truth.size > 15000, s"planted population too small: ${truth.size}")
    val recall = (found & truth).size.toDouble / truth.size
    assert(recall >= 0.9, s"adaptive recall $recall < 0.9 (${(found & truth).size}/${truth.size})")
    // the cap genuinely binds on this corpus: the blob's bucket is
    // over cap in every band
    val rep = Ann.capReport(df, "vec_id", "embedding",
        nPlanes = bands * bits, bands = bands, bucketCap = cap)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep("embedding_buckets_over_cap") >= bands,
      s"blob must cross the cap in every band: ${rep("embedding_buckets_over_cap")}")
    // and the OLD fixed layout on the same corpus: every bucket over
    // cap -> kept side empties -> recall collapses (the cliff)
    val fixedFound = Ann.cosinePairsLsh(df, "vec_id", "embedding", threshold = tau,
        nPlanes = 60, bands = 15, bucketCap = Some(cap))
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val fixedRecall = (fixedFound & truth).size.toDouble / truth.size
    assert(fixedRecall < 0.1,
      s"fixed 15x4 should collapse at this scale (got $fixedRecall) — if this " +
        "starts passing the corpus no longer reproduces the cliff")
    df.unpersist()
  }

  test("ivfTopK probing all cells equals brute-force topK exactly") {
    val q = corpus.where($"vec_id" < 5)
    val brute = Ann.cosineTopK(q, "vec_id", "embedding", corpus, "vec_id", "embedding", k = 3)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Long)].collect().toSet
    val ivf = Ann.ivfTopK(q, "vec_id", "embedding", corpus, "vec_id", "embedding",
      k = 3, nCells = 8, nProbe = 8, iters = 2)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Long)].collect().toSet
    assert(ivf == brute)
  }

  test("ivfTopK with few probes keeps high recall on clustered data") {
    val q = corpus.where($"vec_id" < 20)
    val brute = Ann.cosineTopK(q, "vec_id", "embedding", corpus, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Ann.ivfTopK(q, "vec_id", "embedding", corpus, "vec_id", "embedding",
      k = 5, nCells = 8, nProbe = 2, iters = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall below 0.9")
  }

  test("pqTopK: rerank covering the corpus equals brute force exactly") {
    val q = corpus.where($"vec_id" < 5)
    val brute = Ann.cosineTopK(q, "vec_id", "embedding",
      corpus, "vec_id", "embedding", k = 3)
      .as[(Long, Long, Long, Double)].collect().toSet
    // rerank * k >= corpus size: every row survives the ADC cut, so
    // the exact re-rank IS brute force — proves encode/reconstruct/
    // rerank plumbing loses nothing
    val pq = Ann.pqTopK(q, "vec_id", "embedding",
      corpus, "vec_id", "embedding", k = 3, m = 4, ksub = 8, rerank = 100,
      iters = 2)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(pq == brute)
  }

  test("pqTopK: bounded rerank budget keeps high recall on clustered data") {
    // rerank = 10 -> 50 ADC candidates out of 200: within a tight
    // cluster the reconstruction distortion dominates the tiny true
    // sim differences (classic PQ behavior), so the budget must cover
    // the cluster; cross-cluster confusion is what PQ excludes
    val q = corpus.where($"vec_id" < 20)
    val brute = Ann.cosineTopK(q, "vec_id", "embedding",
      corpus, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val pq = Ann.pqTopK(q, "vec_id", "embedding",
      corpus, "vec_id", "embedding", k = 5, m = 4, ksub = 16, rerank = 10,
      iters = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = pq.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall below 0.9")
    // returned similarities are EXACT (re-ranked from the original
    // vectors), so each returned pair's sim matches brute force where
    // the pair appears in both
    val bsim = Ann.cosineTopK(q, "vec_id", "embedding",
      corpus, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id", "similarity")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val psim = Ann.pqTopK(q, "vec_id", "embedding",
      corpus, "vec_id", "embedding", k = 5, m = 4, ksub = 16, rerank = 10,
      iters = 3)
      .select("query_id", "neighbor_id", "similarity")
      .as[(Long, Long, Double)].collect()
    psim.foreach { case (qid, nid, s) =>
      bsim.get((qid, nid)).foreach(b => assert(b == s, s"sim drift ($qid,$nid)"))
    }
  }

  test("pqTopK is deterministic across input partitionings") {
    val q = corpus.where($"vec_id" < 5)
    def run(c: org.apache.spark.sql.DataFrame) =
      Ann.pqTopK(q, "vec_id", "embedding", c, "vec_id", "embedding",
        k = 3, m = 4, ksub = 8, rerank = 4, iters = 2)
        .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._3))
    assert(run(corpus).sameElements(run(corpus.repartition(13))),
      "codebooks and codes must be partitioning-invariant")
  }

  test("persisted PQ index: query equals inline pqTopK; scan reads codes only") {
    val dir = java.nio.file.Files.createTempDirectory("pq").toString
    Ann.pqBuild(corpus, "vec_id", "embedding", dir, m = 4, ksub = 8, iters = 2)
    val q = corpus.where($"vec_id" < 5)
    val inline = Ann.pqTopK(q, "vec_id", "embedding",
      corpus, "vec_id", "embedding", k = 3, m = 4, ksub = 8, rerank = 4,
      iters = 2)
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._3))
    val idx = Ann.pqQueryIndex(spark, dir, q, "vec_id", "embedding",
      corpus, "vec_id", "embedding", k = 3, rerank = 4)
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._3))
    assert(idx.sameElements(inline),
      "deterministic training: the persisted path must reproduce inline PQ")
    // the codes table is the compact artifact: m small ints per vector
    val codes = spark.read.parquet(s"$dir/codes")
    assert(codes.columns.toSet == Set("neighbor_id", "codes"))
    assert(codes.select(F.max(F.size($"codes"))).head().getInt(0) == 4)
  }

  test("persisted IVF index: pruned query equals inline ivfTopK; scan prunes cells") {
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString
    Ann.ivfBuild(corpus, "vec_id", "embedding", dir, nCells = 8, iters = 2)
    val q = corpus.where($"vec_id" < 5)
    // probing every cell reproduces brute force, proving the persisted
    // assignment is complete and the rerank is exact
    val brute = Ann.cosineTopK(q, "vec_id", "embedding", corpus, "vec_id", "embedding", k = 3)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Long)].collect().toSet
    val full = Ann.ivfQueryIndex(spark, dir, q, "vec_id", "embedding", k = 3, nProbe = 8)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Long)].collect().toSet
    assert(full == brute)
    // few probes: the index scan must carry a partition filter on cell
    val few = Ann.ivfQueryIndex(spark, dir, q, "vec_id", "embedding", k = 3, nProbe = 2)
    few.collect()
    val p = few.queryExecution.executedPlan.toString
    assert("""PartitionFilters: \[[^\]]*cell#\d+L? IN """.r.findFirstIn(p).isDefined,
      s"probed-cell isin predicate must prune index partitions; plan:\n$p")
  }

  test("IVFPQ: full probes + covering rerank equal brute force; index equals inline; codes scan prunes cells") {
    val q = corpus.where($"vec_id" < 5)
    // probing every cell with a corpus-covering rerank budget makes
    // the composed path lossless: cell pruning excludes nothing and
    // every ADC candidate survives to the exact re-rank
    val brute = Ann.cosineTopK(q, "vec_id", "embedding",
      corpus, "vec_id", "embedding", k = 3)
      .as[(Long, Long, Long, Double)].collect().toSet
    val full = Ann.ivfpqTopK(q, "vec_id", "embedding",
      corpus, "vec_id", "embedding", k = 3, nCells = 8, nProbe = 8,
      m = 4, ksub = 8, rerank = 100, iters = 2)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(full == brute,
      "all-cells + covering-rerank IVFPQ must equal brute force")
    // persisted index with identical parameters reproduces inline
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString
    Ann.ivfpqBuild(corpus, "vec_id", "embedding", dir,
      nCells = 8, m = 4, ksub = 8, iters = 2)
    val inline = Ann.ivfpqTopK(q, "vec_id", "embedding",
      corpus, "vec_id", "embedding", k = 3, nCells = 8, nProbe = 2,
      m = 4, ksub = 8, rerank = 4, iters = 2)
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._3))
    val idx = Ann.ivfpqQueryIndex(spark, dir, q, "vec_id", "embedding",
      corpus, "vec_id", "embedding", k = 3, nProbe = 2, rerank = 4)
    val idxRows = idx.as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._3))
    assert(idxRows.sameElements(inline),
      "deterministic training: the persisted IVFPQ path must reproduce inline")
    // the probed-cell isin predicate prunes codes-table partitions —
    // the storage half of the composition
    val p = idx.queryExecution.executedPlan.toString
    assert("""PartitionFilters: \[[^\]]*cell#\d+L? IN """.r.findFirstIn(p).isDefined,
      s"probed-cell isin predicate must prune codes partitions; plan:\n$p")
    // and the scanned table is the COMPACT one: m small ints + the
    // cell partition column + ingest lineage, no vector payload
    val codes = spark.read.parquet(s"$dir/codes")
    assert(codes.columns.toSet == Set("neighbor_id", "codes", "cell", "ingest_batch"))
    assert(codes.select(F.max(F.size($"codes"))).head().getInt(0) == 4)
  }

  test("ivfIndexAppend: build+append equals one-shot frozen-train build; lineage stamped") {
    val even = corpus.where($"vec_id" % 2 === 0)
    val odd = corpus.where($"vec_id" % 2 =!= 0)
    val q = corpus.where($"vec_id" < 5)
    def query(dir: String) =
      Ann.ivfQueryIndex(spark, dir, q, "vec_id", "embedding", k = 3, nProbe = 3)
        .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._3)).toSeq
    val ref = java.nio.file.Files.createTempDirectory("ivffz").toString
    Ann.ivfBuild(corpus, "vec_id", "embedding", ref,
      nCells = 8, iters = 2, trainCorpus = Some(even))
    val inc = java.nio.file.Files.createTempDirectory("ivfinc").toString
    Ann.ivfBuild(even, "vec_id", "embedding", inc, nCells = 8, iters = 2)
    Ann.ivfIndexAppend(spark, inc, odd, "vec_id", "embedding", batchId = 1L)
    assert(query(inc).nonEmpty && query(inc) == query(ref),
      "IVF append under the frozen coarse quantizer must equal the one-shot frozen-train build")
    assert(spark.read.parquet(s"$inc/index").select("ingest_batch")
      .as[Long].collect().toSet == Set(-1L, 1L))
  }

  test("ivfpqIndexAppend: build+append equals one-shot frozen-train build; lineage cleans a replayed batch") {
    val even = corpus.where($"vec_id" % 2 === 0)
    val odd = corpus.where($"vec_id" % 2 =!= 0)
    val q = corpus.where($"vec_id" < 5)
    def query(dir: String) =
      Ann.ivfpqQueryIndex(spark, dir, q, "vec_id", "embedding",
        corpus, "vec_id", "embedding", k = 3, nProbe = 2, rerank = 4)
        .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._3)).toSeq
    // reference arm: one-shot build over the union, quantizers trained
    // on the even slice only (the state append reaches)
    val ref = java.nio.file.Files.createTempDirectory("ivfpqfz").toString
    Ann.ivfpqBuild(corpus, "vec_id", "embedding", ref,
      nCells = 8, m = 4, ksub = 8, iters = 2, trainCorpus = Some(even))
    // ingest arm: build on the even slice, append the odd batch under
    // the persisted FROZEN quantizers (only the batch is encoded)
    val inc = java.nio.file.Files.createTempDirectory("ivfpqinc").toString
    Ann.ivfpqBuild(even, "vec_id", "embedding", inc,
      nCells = 8, m = 4, ksub = 8, iters = 2)
    Ann.ivfpqIndexAppend(spark, inc, odd, "vec_id", "embedding", batchId = 1L)
    assert(query(inc) == query(ref),
      "append under frozen quantizers must equal the one-shot frozen-train build")
    // frozen quantizers really are frozen: both index dirs persist the
    // identical centroid matrix and codebooks
    val c1 = spark.read.parquet(s"$ref/centroids").orderBy("cell")
      .as[(Int, Seq[Double])].collect().toSeq
    val c2 = spark.read.parquet(s"$inc/centroids").orderBy("cell")
      .as[(Int, Seq[Double])].collect().toSeq
    assert(c1 == c2, "coarse quantizer must be identical across the two arms")
    // crash/replay recovery: duplicate the batch append (the
    // at-least-once failure mode), then clean by the lineage column —
    // the documented partition-filter rewrite — and the result returns
    Ann.ivfpqIndexAppend(spark, inc, odd, "vec_id", "embedding", batchId = 2L)
    val dup = spark.read.parquet(s"$inc/codes")
    assert(dup.where($"ingest_batch" === 2L).count() == odd.count(),
      "replayed batch rows must be identifiable by lineage")
    val cleaned = dup.where($"ingest_batch" =!= 2L)
    val tmp = java.nio.file.Files.createTempDirectory("ivfpqclean").toString
    cleaned.write.partitionBy("cell").parquet(s"$tmp/codes")
    for (part <- Seq("centroids", "codebooks", "pca")) {
      val src = java.nio.file.Paths.get(inc, part)
      if (java.nio.file.Files.exists(src)) {
        val dst = java.nio.file.Paths.get(tmp, part)
        org.apache.commons.io.FileUtils.copyDirectory(src.toFile, dst.toFile)
      }
    }
    assert(query(tmp) == query(ref),
      "lineage cleanup must restore the pre-replay result")
  }

  test("indexReport: per-cell counts sum to the corpus; appends raise counts and batch lineage") {
    val dir = java.nio.file.Files.createTempDirectory("ivfpqrep").toString
    val even = corpus.where($"vec_id" % 2 === 0)
    val odd = corpus.where($"vec_id" % 2 =!= 0)
    Ann.ivfpqBuild(even, "vec_id", "embedding", dir,
      nCells = 8, m = 4, ksub = 8, iters = 2)
    val before = Ann.indexReport(spark, dir)
      .as[(Int, Long, Long, Double)].collect()
    assert(before.map(_._2).sum == even.count(), "counts must sum to the corpus")
    assert(before.forall(_._3 == 1L), "initial build is one lineage batch")
    assert(math.abs(before.map(_._4).sum - 1.0) < 1e-4, "shares sum to 1")
    Ann.ivfpqIndexAppend(spark, dir, odd, "vec_id", "embedding", batchId = 7L)
    val after = Ann.indexReport(spark, dir)
      .as[(Int, Long, Long, Double)].collect()
    assert(after.map(_._2).sum == corpus.count(), "append must raise the total")
    assert(after.exists(_._3 == 2L), "appended cells must show two lineage batches")
  }

  test("compactPartitioned: appended codes collapse to few files, queries unchanged, partition pruning survives") {
    import graft.sources.Sources
    val dir = java.nio.file.Files.createTempDirectory("ivfpqcmp").toString
    val third = corpus.count() / 3
    Ann.ivfpqBuild(corpus.where($"vec_id" < third), "vec_id", "embedding",
      dir, nCells = 8, m = 4, ksub = 8, iters = 2)
    // two appended batches leave one small file per (batch, cell)
    Ann.ivfpqIndexAppend(spark, dir,
      corpus.where($"vec_id" >= third && $"vec_id" < 2 * third),
      "vec_id", "embedding", batchId = 1L)
    Ann.ivfpqIndexAppend(spark, dir, corpus.where($"vec_id" >= 2 * third),
      "vec_id", "embedding", batchId = 2L)
    val q = corpus.where($"vec_id" < 5)
    def res(p: String) =
      Ann.ivfpqQueryIndex(spark, p, q, "vec_id", "embedding",
        corpus, "vec_id", "embedding", k = 3, nProbe = 2, rerank = 4)
    val beforeRows = res(dir).as[(Long, Long, Long, Double)]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    val out = java.nio.file.Files.createTempDirectory("ivfpqcmpo").toString
    val (nBefore, nAfter, _) = Sources.compactPartitioned(
      spark, s"$dir/codes", s"$out/codes", Seq("cell"))
    assert(nAfter < nBefore,
      s"compaction must reduce file count ($nBefore -> $nAfter)")
    for (part <- Seq("centroids", "codebooks"))
      org.apache.commons.io.FileUtils.copyDirectory(
        java.nio.file.Paths.get(dir, part).toFile,
        java.nio.file.Paths.get(out, part).toFile)
    val after = res(out)
    assert(after.as[(Long, Long, Long, Double)]
      .collect().sortBy(r => (r._1, r._3)).toSeq == beforeRows,
      "compaction must not change query results")
    // the layout survived: probed-cell partition filters still prune
    after.collect()
    val p = after.queryExecution.executedPlan.toString
    assert("""PartitionFilters: \[[^\]]*cell#\d+L? IN """.r.findFirstIn(p).isDefined,
      s"compacted codes must keep cell partition pruning; plan:\n$p")
  }

  test("PCA-composed IVFPQ: lossless config equals brute force; index reproducible; codes scan prunes cells in the projected space") {
    import graft.similarity.Pca
    val q = corpus.where($"vec_id" < 5)
    val dir = java.nio.file.Files.createTempDirectory("pcaivfpq").toString
    // kDim = full dim: the projection is a rotation (lossless), and
    // all cells + covering rerank make the composed path exact
    Pca.pcaIvfpqBuild(corpus, "vec_id", "embedding", dir,
      kDim = 8, nCells = 8, m = 4, ksub = 8, iters = 2)
    val got = Pca.pcaIvfpqQueryIndex(spark, dir, q, "vec_id", "embedding",
      corpus, "vec_id", "embedding", k = 3, nProbe = 8, rerank = 100)
      .as[(Long, Long, Long, Double)].collect().toSet
    val brute = Ann.cosineTopK(q, "vec_id", "embedding",
      corpus, "vec_id", "embedding", k = 3)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == brute,
      "full-rotation + all-cells + covering-rerank PCA-IVFPQ must equal brute force")
    // deterministic end-to-end: a rebuild with identical parameters
    // reproduces the pruned query exactly
    val dir2 = java.nio.file.Files.createTempDirectory("pcaivfpq2").toString
    Pca.pcaIvfpqBuild(corpus, "vec_id", "embedding", dir2,
      kDim = 8, nCells = 8, m = 4, ksub = 8, iters = 2)
    def pruned(d: String) =
      Pca.pcaIvfpqQueryIndex(spark, d, q, "vec_id", "embedding",
        corpus, "vec_id", "embedding", k = 3, nProbe = 2, rerank = 4)
    assert(pruned(dir).as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._3)).toSeq ==
      pruned(dir2).as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._3)).toSeq,
      "identical parameters must reproduce the index")
    // the storage lever survives the composition: probed-cell
    // partition pruning on the PROJECTED codes table
    val few = pruned(dir)
    few.collect()
    val p = few.queryExecution.executedPlan.toString
    assert("""PartitionFilters: \[[^\]]*cell#\d+L? IN """.r.findFirstIn(p).isDefined,
      s"probed-cell isin must prune projected-codes partitions; plan:\n$p")
    // re-rank reads ORIGINAL vectors: similarities in the output are
    // full-width cosines, not projected-space ones (already implied by
    // the brute-force equality above — this pins the column source)
    val sims = got.map(_._4)
    val bruteSims = brute.map(_._4)
    assert(sims == bruteSims)
  }

  test("PCA-IVFPQ filtered + append: metadata filter exact in lossless config; projected append equals frozen-train rebuild") {
    import graft.similarity.Pca
    val labeled = corpus.withColumn("label", (F.col("vec_id") % 5).cast("int"))
    val q = labeled.where($"vec_id" < 5)
    // filtered, lossless config (rotation + all cells + covering
    // rerank): must equal the exact pre-filter top-k over the slice
    val dir = java.nio.file.Files.createTempDirectory("pcaivfpqf").toString
    Pca.pcaIvfpqBuild(labeled, "vec_id", "embedding", dir,
      kDim = 8, nCells = 8, m = 4, ksub = 8, iters = 2,
      extraCols = Seq("label"))
    val got = Pca.pcaIvfpqQueryIndex(spark, dir, q, "vec_id", "embedding",
      labeled, "vec_id", "embedding", k = 3, nProbe = 8, rerank = 100,
      filter = Some(F.col("label") === 2))
      .as[(Long, Long, Long, Double)].collect().toSet
    val brute = Ann.cosineTopKFiltered(q, "vec_id", "embedding",
      labeled, "vec_id", "embedding", predicate = F.col("label") === 2, k = 3)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == brute, "lossless filtered PCA-IVFPQ must equal exact filtered top-k")
    // projected append: build on the even slice, pcaIvfpqIndexAppend
    // the odd batch (projects through the PERSISTED params first) —
    // equals a one-shot build over the union with BOTH trainings
    // frozen to the even slice
    val even = corpus.where($"vec_id" % 2 === 0)
    val odd = corpus.where($"vec_id" % 2 =!= 0)
    def pruned(p: String) =
      Pca.pcaIvfpqQueryIndex(spark, p, corpus.where($"vec_id" < 5),
        "vec_id", "embedding", corpus, "vec_id", "embedding",
        k = 3, nProbe = 2, rerank = 4)
        .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._3)).toSeq
    val inc = java.nio.file.Files.createTempDirectory("pcaivfpqi").toString
    Pca.pcaIvfpqBuild(even, "vec_id", "embedding", inc,
      kDim = 8, nCells = 8, m = 4, ksub = 8, iters = 2)
    Pca.pcaIvfpqIndexAppend(spark, inc, odd, "vec_id", "embedding", batchId = 1L)
    // reference arm: PCA params from the even slice, then the
    // frozen-train ivfpq build over the even-trained projection of
    // the UNION (mirrors what build+append reaches)
    val ref = java.nio.file.Files.createTempDirectory("pcaivfpqr2").toString
    val (mu, comps, _) = Pca.pcaTrain(even, "vec_id", "embedding", k = 8)
    Pca.writePcaParams(spark, mu, comps, s"$ref/pca")
    Ann.ivfpqBuild(Pca.pcaProject(corpus, "vec_id", "embedding", mu, comps),
      "vec_id", "proj", ref, nCells = 8, m = 4, ksub = 8, iters = 2,
      trainCorpus = Some(Pca.pcaProject(even, "vec_id", "embedding", mu, comps)))
    assert(pruned(inc).nonEmpty && pruned(inc) == pruned(ref),
      "projected append must equal the all-frozen one-shot build")
  }

  test("SQ-ANN: covering rerank equals brute force; persisted index equals inline; ADC scan reads codes only") {
    import graft.similarity.ScalarQuant
    val q = corpus.where($"vec_id" < 5)
    // rerank covering the corpus: every row survives the ADC cut, so
    // the exact re-rank IS brute force
    val brute = Ann.cosineTopK(q, "vec_id", "embedding",
      corpus, "vec_id", "embedding", k = 3)
      .as[(Long, Long, Long, Double)].collect().toSet
    val full = ScalarQuant.sqTopK(q, "vec_id", "embedding",
      corpus, "vec_id", "embedding", k = 3, rerank = 100)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(full == brute, "covering-rerank SQ must equal brute force")
    // persisted index reproduces inline exactly (deterministic bounds)
    val dir = java.nio.file.Files.createTempDirectory("sqann").toString
    ScalarQuant.sqBuild(corpus, "vec_id", "embedding", dir)
    val inline = ScalarQuant.sqTopK(q, "vec_id", "embedding",
      corpus, "vec_id", "embedding", k = 3, rerank = 4)
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._3))
    val idx = ScalarQuant.sqQueryIndex(spark, dir, q, "vec_id", "embedding",
      corpus, "vec_id", "embedding", k = 3, rerank = 4)
    val idxRows = idx.as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._3))
    assert(idxRows.sameElements(inline), "persisted SQ path must reproduce inline")
    // the approximate scan reads the COMPACT codes table; raw vectors
    // appear only behind the candidate re-rank join (i.e. the plan's
    // corpus scans are joined post-candidates, codes feed the ADC)
    val p = idx.queryExecution.executedPlan.toString
    assert(p.contains(s"$dir/codes"), s"ADC scan must read the codes table:\n$p")
    val codes = spark.read.parquet(s"$dir/codes")
    assert(codes.columns.toSet == Set("neighbor_id", "codes"))
  }

  test("PCA: Jacobi recovers a hand spectrum; trained components find the planted dominant direction") {
    import graft.similarity.Pca
    // hand 2x2: [[2,1],[1,2]] -> eigenvalues {3,1}, vectors (1,1)/sqrt2, (1,-1)/sqrt2
    val (ev, v) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val byVal = ev.indices.sortBy(i => -ev(i))
    assert(math.abs(ev(byVal(0)) - 3.0) < 1e-12 && math.abs(ev(byVal(1)) - 1.0) < 1e-12)
    val top = Array(v(0)(byVal(0)), v(1)(byVal(0)))
    assert(math.abs(math.abs(top(0)) - math.sqrt(0.5)) < 1e-12 &&
      math.abs(top(0) - top(1)) < 1e-12, "top eigenvector must be (1,1)/sqrt(2) up to sign")
    // planted data: dim 2 carries 20x the variance of the rest — the
    // first trained component must align with e_2 and training must be
    // partitioning-invariant
    val data = (0 until 300).map { i =>
      val r = new scala.util.Random(i) // per-row seed: deterministic data
      (i.toLong, Seq.tabulate(6)(j =>
        (if (j == 2) 20.0 * (r.nextDouble() - 0.5) else r.nextDouble() - 0.5).toFloat))
    }.toDF("vec_id", "embedding")
    val (mu1, c1, e1) = Pca.pcaTrain(data, "vec_id", "embedding", k = 2)
    val (mu2, c2, e2) = Pca.pcaTrain(data.repartition(7), "vec_id", "embedding", k = 2)
    assert(mu1 == mu2 && c1 == c2 && e1 == e2, "training must be partitioning-invariant")
    assert(math.abs(c1.head(2)) > 0.99, s"first component must align with the planted axis: ${c1.head}")
    assert(e1.head > 10 * e1(1), "planted variance must dominate the spectrum")
  }

  test("scalar quantization: codes in range, reconstruction within half a grid step, constant dims exact, shuffle-free encode") {
    import graft.similarity.ScalarQuant
    // 8-dim vectors with a CONSTANT dim (3) and mixed ranges
    val vecs = (0 until 50).map { i =>
      (i.toLong, Seq.tabulate(8)(j =>
        if (j == 3) 4.25f else ((i * (j + 7) * 31) % 997 - 498) / 37.0f))
    }.toDF("vec_id", "embedding")
    val (lo, hi) = ScalarQuant.sqTrain(vecs, "embedding")
    assert(lo.length == 8 && lo(3) == 4.25 && hi(3) == 4.25)
    val enc = ScalarQuant.sqEncode(vecs, "vec_id", "embedding", lo, hi)
    val codes = enc.select(F.explode($"codes")).as[Long].collect()
    assert(codes.forall(c => c >= 0 && c <= 255), "codes must fit a byte")
    // round-trip error bound: half a grid step per dimension; the
    // constant dim reconstructs exactly
    val err = ScalarQuant.sqDecode(enc, "vec_id", "codes", lo, hi)
      .join(vecs, "vec_id")
      .select(F.posexplode(F.zip_with($"recon",
        F.transform($"embedding", x => x.cast("double")),
        (r, x) => F.abs(r - x))).as(Seq("pos", "e")))
      .groupBy("pos").agg(F.max("e").as("maxe"))
      .as[(Int, Double)].collect().toMap
    for (j <- 0 until 8) {
      val bound = if (hi(j) == lo(j)) 0.0 else (hi(j) - lo(j)) / 255.0 / 2.0
      assert(err(j) <= bound + 1e-12, s"dim $j error ${err(j)} > $bound")
    }
    // encode is a shuffle-free projection against literal bounds
    val p = enc.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"encode must not shuffle:\n$p")
  }

  test("filtered IVFPQ: predicate cuts inside the cell-pruned codes scan; lossless config equals exact filtered top-k") {
    val labeled = corpus.withColumn("label", (F.col("vec_id") % 5).cast("int"))
    val dir = java.nio.file.Files.createTempDirectory("ivfpqf").toString
    Ann.ivfpqBuild(labeled, "vec_id", "embedding", dir,
      nCells = 8, m = 4, ksub = 8, iters = 2, extraCols = Seq("label"))
    val q = labeled.where($"vec_id" < 5)
    // all cells + covering rerank: the composed filtered path must
    // equal the exact pre-filter top-k over the label slice
    val res = Ann.ivfpqQueryIndex(spark, dir, q, "vec_id", "embedding",
      labeled, "vec_id", "embedding", k = 3, nProbe = 8, rerank = 100,
      filter = Some(F.col("label") === 2))
    val got = res.as[(Long, Long, Long, Double)].collect().toSet
    val brute = Ann.cosineTopKFiltered(q, "vec_id", "embedding",
      labeled, "vec_id", "embedding", predicate = F.col("label") === 2, k = 3)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == brute,
      "lossless filtered IVFPQ must equal exact pre-filter top-k")
    // both storage levers in ONE scan: probed-cell partition filters
    // AND the pushed label predicate on the compact codes table
    val few = Ann.ivfpqQueryIndex(spark, dir, q, "vec_id", "embedding",
      labeled, "vec_id", "embedding", k = 3, nProbe = 2, rerank = 4,
      filter = Some(F.col("label") === 2))
    few.collect()
    val p = few.queryExecution.executedPlan.toString
    assert("""PartitionFilters: \[[^\]]*cell#\d+L? IN """.r.findFirstIn(p).isDefined,
      s"probed-cell isin must prune codes partitions; plan:\n$p")
    assert("""PushedFilters: \[[^\]]*EqualTo\(label,2\)""".r.findFirstIn(p).isDefined,
      s"label predicate must push into the codes scan; plan:\n$p")
  }

  test("filtered search: pre-filter returns full-k from the slice; filtered IVF prunes cells AND pushes the predicate") {
    // label striped mod 5 — DELIBERATELY coprime with the 4 clusters,
    // so every cluster mixes all labels: a query's unfiltered top-3
    // (same-cluster) rarely holds 3 label-2 rows, while the label-2
    // slice still spans every cluster
    val labeled = corpus.withColumn("label", (F.col("vec_id") % 5).cast("int"))
    val q = labeled.where($"vec_id" < 5)
    // exact filtered top-k == brute force over the pre-filtered slice
    val filtered = Ann.cosineTopKFiltered(q, "vec_id", "embedding",
      labeled, "vec_id", "embedding", predicate = $"label" === 2, k = 3)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Long)].collect()
    val slice = Ann.cosineTopK(q, "vec_id", "embedding",
      labeled.where($"label" === 2), "vec_id", "embedding", k = 3)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Long)].collect()
    assert(filtered.toSet == slice.toSet)
    assert(filtered.groupBy(_._1).forall(_._2.length == 3),
      "pre-filter semantics must return full-k lists from the slice")
    assert(filtered.forall { case (_, n, _) => n % 5 == 2 })
    // post-filtering the UNFILTERED top-3 would truncate: with labels
    // striped 0-3, an unfiltered top-3 rarely holds 3 label-2 rows
    val post = Ann.cosineTopK(q, "vec_id", "embedding",
        labeled, "vec_id", "embedding", k = 3)
      .join(labeled.select($"vec_id".as("neighbor_id"), $"label"), "neighbor_id")
      .where($"label" === 2)
    val postCounts = post.select("query_id").as[Long].collect()
    assert((0L until 5L).map(qid => postCounts.count(_ == qid)).min < 3,
      "fixture must demonstrate the post-filter truncation failure mode")
    // filtered persisted-IVF: metadata rides the index; the probe scan
    // carries BOTH the cell partition filter and the pushed label
    // predicate, and full-probe equals the exact filtered answer
    val dir = java.nio.file.Files.createTempDirectory("ivf_filt").toString
    Ann.ivfBuild(labeled, "vec_id", "embedding", dir, nCells = 8, iters = 2,
      extraCols = Seq("label"))
    val ivfFull = Ann.ivfQueryIndex(spark, dir, q, "vec_id", "embedding",
      k = 3, nProbe = 8, filter = Some($"label" === 2))
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Long)].collect()
    assert(ivfFull.toSet == slice.toSet,
      "full-probe filtered IVF must equal the exact filtered answer")
    val few = Ann.ivfQueryIndex(spark, dir, q, "vec_id", "embedding",
      k = 3, nProbe = 2, filter = Some($"label" === 2))
    few.collect()
    val p = few.queryExecution.executedPlan.toString
    assert("""PartitionFilters: \[[^\]]*cell#\d+L? IN """.r.findFirstIn(p).isDefined,
      s"probed-cell isin predicate must prune index partitions; plan:\n$p")
    assert("""PushedFilters: \[[^\]]*EqualTo\(label,2\)""".r.findFirstIn(p).isDefined,
      s"label predicate must push into the index scan; plan:\n$p")
  }

  test("semanticPairs: full-probe recall is exact; clustered single-probe finds within-cluster pairs") {
    val exact = Ann.cosinePairs(corpus, "vec_id", "embedding", threshold = 0.9)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    // probing EVERY cell degenerates to the exact join (any pair
    // shares a cell) — recall 1.0, precision 1.0 by construction
    val full = Ann.semanticPairs(corpus, "vec_id", "embedding", threshold = 0.9,
      nCells = 8, nProbe = 8)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(full == exact, s"missed=${(exact -- full).size} extra=${(full -- exact).size}")
    // the paper's regime: on a WELL-clustered corpus a single probe
    // already catches every within-cluster near-dup — 4 tight
    // clusters, 4 cells (ids 0-3 land one per cluster, so the
    // deterministic lowest-id init seeds each cluster once and Lloyd
    // converges one centroid per cluster; MORE cells than clusters
    // would split a cluster across cells and shed its boundary pairs,
    // which is exactly what nProbe > 1 is for)
    val single = Ann.semanticPairs(corpus, "vec_id", "embedding", threshold = 0.9,
      nCells = 4, nProbe = 1)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(single == exact, s"missed=${(exact -- single).size}")
  }

  test("semanticPairs cellCap excludes over-cap cells from pair generation") {
    // cap below every cell's occupancy -> no candidate survives
    val capped = Ann.semanticPairs(corpus, "vec_id", "embedding", threshold = 0.9,
      nCells = 8, nProbe = 1, cellCap = Some(1L))
    assert(capped.isEmpty, "cap=1 must drop every multi-member cell")
    // a loose cap changes nothing
    val loose = Ann.semanticPairs(corpus, "vec_id", "embedding", threshold = 0.9,
      nCells = 8, nProbe = 1, cellCap = Some(100000L))
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val uncapped = Ann.semanticPairs(corpus, "vec_id", "embedding", threshold = 0.9,
      nCells = 8, nProbe = 1)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(loose == uncapped)
  }

  test("semanticIngestPairs equals the frozen-quantizer inline join on batch-touching pairs") {
    val batch = corpus.where($"vec_id" < 40)
    val existing = corpus.where($"vec_id" >= 40)
    // frozen quantizer: trained on EXISTING only, like the index build
    val cents = Ann.trainQuantizer(existing, "vec_id", "embedding", nCells = 8)
    val cells = Ann.semanticCellsWith(corpus, "vec_id", "embedding", cents, nProbe = 2)
    val inline = Ann.semanticPairsFromCells(corpus, "vec_id", "embedding",
      cells, threshold = 0.9)
      .where($"id1" < 40) // id1 = pair minimum, so this is "touching"
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val ingest = Ann.semanticIngestPairs(batch, existing,
      Ann.semanticCellsWith(existing, "vec_id", "embedding", cents, nProbe = 2),
      cents, "vec_id", "embedding", threshold = 0.9, nProbe = 2)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(inline.nonEmpty, "split must produce batch-touching pairs")
    assert(ingest == inline,
      s"missed=${(inline -- ingest).size} extra=${(ingest -- inline).size}")
    // re-appending the batch (at-least-once replay) must not change
    // the verified pair set: duplicate corpus rows are absorbed
    val replay = Ann.semanticIngestPairs(batch, existing.unionAll(batch),
      Ann.semanticCellsWith(existing, "vec_id", "embedding", cents, nProbe = 2),
      cents, "vec_id", "embedding", threshold = 0.9, nProbe = 2)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(replay == inline)
  }

  test("persisted semantic cell index: bucketed read, probe-only exchange, equals direct cells") {
    val existing = corpus.where($"vec_id" >= 40)
    val batch = corpus.where($"vec_id" < 40)
    spark.sql("DROP TABLE IF EXISTS sem_cell_idx")
    val loc = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "sem_cell_idx")
    if (java.nio.file.Files.exists(loc))
      java.nio.file.Files.walk(loc).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.delete(p); () })
    val dir = java.nio.file.Files.createTempDirectory("semidx").toString
    val cents = Ann.semanticIndexBuild(existing, "vec_id", "embedding",
      "sem_cell_idx", s"$dir/centroids", nCells = 8, nProbe = 2, nBuckets = 4)
    val loaded = spark.table("sem_cell_idx")
    // stored cells equal a direct assignment under the same centroids
    val direct = Ann.semanticCellsWith(existing, "vec_id", "embedding", cents, 2)
      .as[(Long, Int)].collect().toSet
    assert(loaded.as[(Long, Int)].collect().toSet == direct)
    // the at-scale plan shape: with broadcast off, the cell join reads
    // the index bucketed and exchanges only the batch side
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = loaded.join(
        Ann.semanticCellsWith(batch, "vec_id", "embedding", cents, 2)
          .withColumnRenamed("id", "bid"), Seq("cell"))
        .queryExecution.executedPlan.toString
      assert(p.contains("Bucketed: true"), s"index scan not bucket-aware:\n$p")
      assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
        s"expected exactly one exchange (probe side only):\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // ingest through the TABLE equals ingest through the direct cells
    val viaTable = Ann.semanticIngestPairs(batch, existing, loaded, cents,
      "vec_id", "embedding", threshold = 0.9, nProbe = 2)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val viaDirect = Ann.semanticIngestPairs(batch, existing,
      Ann.semanticCellsWith(existing, "vec_id", "embedding", cents, 2), cents,
      "vec_id", "embedding", threshold = 0.9, nProbe = 2)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(viaTable == viaDirect && viaTable.nonEmpty)
    spark.sql("DROP TABLE sem_cell_idx")
  }

  test("lshTopK returns ranked exact-cosine results from probed buckets") {
    val q = corpus.where($"vec_id" < 5)
    val out = Ann.lshTopK(q, "vec_id", "embedding", corpus, "vec_id", "embedding",
      k = 3, nPlanes = 8, bands = 2)
      .as[(Long, Long, Long, Double)].collect()
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (_, rows) =>
      val ranks = rows.map(_._3).sorted.toSeq
      assert(ranks == (1L to ranks.length), "ranks contiguous from 1")
      val sims = rows.sortBy(_._3).map(_._4).toSeq
      assert(sims == sims.sorted.reverse, "similarity non-increasing in rank")
    }
  }
}
