package graft

import org.apache.spark.sql.{functions => F}

/** Round-17 operator specs: JW-scored sorted-neighborhood linkage,
  * jaro_winkler value matching (facade + prune soundness), and the
  * one-pass block-pair guard's unchanged refusal contract.
  */
class R17OpsSpec extends SparkSpec {
  import spark.implicits._

  private def jwA = Seq(
    (1L, "alpha corporation", "k1"),
    (2L, "betta incorporated", "k1"),
    (3L, "gamma analytics llc", "k2"),
    (4L, "delta gmbh", "k2")).toDF("id_a", "name_a", "blk")
    .withColumn("skey", F.col("name_a"))
  private def jwB = Seq(
    (11L, "alpha corporatoin", "k1"), // transposition — JW territory
    (13L, "gamma analytics lcc", "k2")).toDF("id_b", "name_b", "blk")
    .withColumn("skey", F.col("name_b"))

  test("linkSortedNeighborhoodJw: same links as blocked JW linkage on small blocks") {
    import graft.harmonize.Linkage
    val blocked = Linkage.linkByNameJw(jwA, jwB, Seq("blk"),
      "id_a", "name_a", "id_b", "name_b", minPpm = 900000L)
      .select("id_b", "id_a", "jw_ppm").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sorted = Linkage.linkSortedNeighborhoodJw(jwA, jwB,
      "skey", "skey", "id_a", "name_a", "id_b", "name_b",
      window = 4, minPpm = 900000L)
      .select("id_b", "id_a", "jw_ppm").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(blocked.map(t => (t._1, t._2)) == Set((11L, 1L), (13L, 3L)))
    assert(sorted == blocked,
      "JW window linkage must find the same links as JW blocking here")
  }

  test("linkSortedNeighborhoodJw: candidate count window-bounded on an oversized key group") {
    import graft.harmonize.Linkage
    // 60 A records sharing one sort key — blocking on that key would
    // generate 60 candidates per B record; the window caps it
    val bigA = (1 to 60).map(i => (i.toLong, f"acme corp $i%02d", "K"))
      .toDF("id_a", "name_a", "skey")
    val bigB = Seq((999L, "acme corp 30", "K")).toDF("id_b", "name_b", "skey")
    val out = Linkage.linkSortedNeighborhoodJw(bigA, bigB,
      "skey", "skey", "id_a", "name_a", "id_b", "name_b",
      window = 5, minPpm = 0L).collect()
    assert(out.length == 1)
    assert(out.head.getLong(3) <= 4L,
      s"candidates must be <= window-1, got ${out.head.getLong(3)}")
  }

  test("linkSortedNeighborhoodJwMulti: reverse-key pass adds prefix-dirty links, dedup holds") {
    import graft.harmonize.Linkage
    // B's name is prefix-corrupted: ascending sort on the name puts it
    // far from its true A partner; the reversed key keeps the shared
    // suffix adjacent
    val a = (1 to 30).map(i => (i.toLong, f"customer $i%04d"))
      .toDF("id_a", "name_a")
      .withColumn("k1", F.col("name_a"))
      .withColumn("k2", F.reverse(F.col("name_a")))
    val b = Seq((501L, "Xustomer 0007")).toDF("id_b", "name_b")
      .withColumn("k1", F.col("name_b"))
      .withColumn("k2", F.reverse(F.col("name_b")))
    val single = Linkage.linkSortedNeighborhoodJw(a, b, "k1", "k1",
      "id_a", "name_a", "id_b", "name_b", window = 3, minPpm = 850000L)
      .collect()
    val multi = Linkage.linkSortedNeighborhoodJwMulti(a, b,
      Seq("k1" -> "k1", "k2" -> "k2"),
      "id_a", "name_a", "id_b", "name_b", window = 3, minPpm = 850000L)
      .collect()
    assert(!single.exists(r => r.getLong(1) == 7L),
      "ascending pass alone must miss the prefix-dirty match")
    assert(multi.exists(r => r.getLong(1) == 7L),
      s"reverse pass must recover it: ${multi.mkString(",")}")
  }

  test("jaroWinklerMatch: argmax, threshold keep, unmatched nulls, deterministic tie") {
    import graft.harmonize.ValueMatcher
    val src = Seq("martha", "zzzzqq", "dixon", "abcd0").toDF("v")
    val tgt = Seq("marhta", "dicksonx", "abcd1", "abcd2").toDF("v")
    val got = ValueMatcher.jaroWinklerMatch(src, "v", tgt, "v", threshold = 0.9)
      .orderBy("source").collect()
    val bySrc = got.map(r => r.getString(0) ->
      (Option(r.get(1)), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    // abcd0 ties between abcd1/abcd2 at 920000 -> target asc wins
    assert(bySrc("abcd0") == (Some("abcd1"), 920000L), s"$bySrc")
    // martha/marhta = 961111 (hand-computed, matches the kernel spec)
    assert(bySrc("martha") == (Some("marhta"), 961111L))
    // dixon's best (dicksonx, 813333) is below 0.9 -> unmatched null
    assert(bySrc("dixon") == (None, -1L))
    assert(bySrc("zzzzqq") == (None, -1L))
    // similarity column = ppm / 1e6 exactly
    val sim = got.find(_.getString(0) == "martha").get.getDouble(3)
    assert(sim == 961111L.toDouble / 1e6)
  }

  test("jaroWinklerMatch: topK ranks descend through ties deterministically") {
    import graft.harmonize.ValueMatcher
    val src = Seq("abcd0").toDF("v")
    val tgt = Seq("abcd1", "abcd2", "abcd9").toDF("v")
    val got = ValueMatcher.jaroWinklerMatch(src, "v", tgt, "v",
      threshold = 0.9, topK = 3).orderBy("rank").collect()
    assert(got.map(_.getString(1)).toSeq == Seq("abcd1", "abcd2", "abcd9"))
    assert(got.map(_.getLong(4)).toSeq == Seq(1L, 2L, 3L))
  }

  test("jaroWinklerMatch: the 5t-4 length-band prune is result-identical") {
    import graft.harmonize.ValueMatcher
    // adversarial lengths around the band edge: at t = 0.9 the band
    // drops pairs with min/max < 0.5 — verify against the prune-free
    // run (t = 0.8 makes bandPpm <= 0, i.e. no prune) re-filtered
    val src = Seq("ab", "abcd", "abcdefgh", "abcdefghijklmnop").toDF("v")
    val tgt = Seq("ab", "abce", "abcdefghx", "abcdefghijklmnopqrst",
      "abcdefghijklmnopqrstuvwxyzzzzzzzzzzz").toDF("v")
    def rows(t: Double, keepPpm: Long) =
      ValueMatcher.jaroWinklerMatch(src, "v", tgt, "v", threshold = t)
        .where(F.col("jw_ppm") >= keepPpm)
        .select("source", "target", "jw_ppm").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(rows(0.9, 900000L) == rows(0.8, 900000L),
      "pruned matches must equal the prune-free argmax above the threshold")
  }

  test("Graft.matchValues dispatches jaro_winkler; unknown methods still name it") {
    val src = Seq("martha").toDF("v")
    val tgt = Seq("marhta").toDF("v")
    val got = Graft.matchValues(src, "v", tgt, "v",
      method = "jaro_winkler", threshold = 0.9).collect()
    assert(got.length == 1 && got.head.getString(1) == "marhta")
    val ex = intercept[IllegalArgumentException] {
      Graft.matchValues(src, "v", tgt, "v", method = "nope")
    }
    assert(ex.getMessage.contains("jaro_winkler"))
  }

  // ---- perceptual image hashing (dHash) ----

  test("ImageHash.dhash64: monotone gradients hit the all-ones / all-zeros fixtures") {
    import graft.multimodal.{ImageHash, PngCodec}
    // 18x16 gray, luma strictly DECREASING left->right: every cell is
    // brighter than its right neighbor -> all 64 bits set -> -1L
    val dec = PngCodec.encode(18, 16, 1, s => 250 - (s % 18).toInt * 10)
    assert(ImageHash.dhash64(dec) == -1L)
    // strictly increasing -> no bit set -> 0L
    val inc = PngCodec.encode(18, 16, 1, s => (s % 18).toInt * 10)
    assert(ImageHash.dhash64(inc) == 0L)
    // flat image: equal means, strict > never fires -> 0L
    val flat = PngCodec.encode(18, 16, 1, _ => 128)
    assert(ImageHash.dhash64(flat) == 0L)
  }

  test("ImageHash.dhash64: container-invariant across PNG gray/RGB, BMP, GIF") {
    import graft.multimodal.{BmpCodec, GifCodec, ImageHash, PngCodec}
    val (w, h) = (20, 17)
    def g(s: Long): Int = ((s * 53 + 11) % 229).toInt
    val png = PngCodec.encode(w, h, 1, g)
    val pngRgb = PngCodec.encode(w, h, 3, s => g(s / 3)) // r=g=b replicate
    val bmp = BmpCodec.encode(w, h, (x, y, _) => g(y.toLong * w + x), topDown = true)
    val gif = GifCodec.encode(w, h, (s: Int) => g(s.toLong))
    val base = ImageHash.dhash64(png)
    assert(base != null && base != 0L)
    assert(ImageHash.dhash64(pngRgb) == base, "gray->RGB replicate")
    assert(ImageHash.dhash64(bmp) == base, "BMP (top-down)")
    assert(ImageHash.dhash64(gif) == base, "GIF")
  }

  test("ImageHash.dhash64: JPEG raster hashes like the equivalent PNG raster") {
    import graft.multimodal.{ImageHash, JpegCodec, PngCodec}
    // DC-only baseline JPEG decodes block-constant values exactly; the
    // PNG of the SAME block-constant raster must hash identically
    val (w, h) = (24, 18) // 3x3 block grid, partial edge blocks
    def blockGray(b: Int): Int = (b * 37 + 90) % 200
    val jpeg = JpegCodec.encode(w, h, blockGray)
    val bw = (w + 7) / 8
    val png = PngCodec.encode(w, h, 1, { s =>
      val x = (s % w).toInt; val y = (s / w).toInt
      blockGray((y / 8) * bw + x / 8)
    })
    val jh = ImageHash.dhash64(jpeg)
    assert(jh != null, "JPEG must decode")
    assert(jh == ImageHash.dhash64(png))
  }

  test("ImageHash.dhash64: one-pooled-cell perturbation flips at most 2 bits; undecodable null") {
    import graft.multimodal.{ImageHash, PngCodec}
    for (d <- 0L until 24L) {
      val w = (d % 24 + 16).toInt
      val h = (d % 16 + 16).toInt
      def g(s: Long): Int = ((s * 31 + d * 7) % 191).toInt
      val base = ImageHash.dhash64(PngCodec.encode(w, h, 1, g))
      val pert = ImageHash.dhash64(PngCodec.encode(w, h, 1, { s =>
        val x = (s % w).toInt; val y = (s / w).toInt
        if (y * 8 / h == 3 && x * 9 / w == 4) g(s) + 64 else g(s)
      }))
      val hamming = java.lang.Long.bitCount(base ^ pert)
      assert(hamming <= 2, s"d=$d hamming=$hamming")
    }
    assert(ImageHash.dhash64("not an image".getBytes) == null)
    assert(ImageHash.dhash64(Array.emptyByteArray) == null)
  }

  test("ImageHash.dhashDf/dhashPairs: codegen'd kernel, re-encode twins at hamming 0") {
    import graft.multimodal.{BinaryMeta, ImageHash}
    val ids = (0L until 12L).toDF("doc_id")
    val corpus = BinaryMeta.syntheticImageCorpus(ids, "doc_id")
    val sigs = ImageHash.dhashDf(corpus, "id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs.size == 48, "every fixture image must decode")
    for (d <- 0L until 12L)
      assert(sigs(4 * d) == sigs(4 * d + 1), s"re-encode twin of $d")
    val pairs = ImageHash.dhashPairs(corpus, "id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (d <- 0L until 12L) {
      assert(pairs.contains((4 * d, 4 * d + 1)), s"re-encode pair of $d")
      assert(pairs.contains((4 * d, 4 * d + 2)), s"near-dup pair of $d")
    }
  }

  test("dhashIndexProbe: asymmetric probe keeps pairs whose batch id is the LARGER one") {
    import graft.dedup.Dedup
    // index ids {10, 500}, batch id 100: the pair (100, 500) has the
    // batch id smaller, (10, 100) has it larger — BOTH must surface
    // (the a.id < b.id formulation would drop (10, 100))
    val idx = Seq((10L, 0x0FL), (500L, 0x0FL)).toDF("id", "dhash")
    val batch = Seq((100L, 0x0FL)).toDF("id", "dhash")
    val got = Dedup.hammingPairsFromBanded(
      Dedup.hammingBanded(batch, "dhash", 3),
      Dedup.hammingBanded(idx, "dhash", 3).unionByName(
        Dedup.hammingBanded(batch, "dhash", 3)),
      "dhash", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 100L), (100L, 500L)), s"$got")
  }

  test("dhashIndexBuild/Probe: served pairs equal the direct pairs touching the batch") {
    import graft.multimodal.{BinaryMeta, ImageHash}
    import org.apache.spark.sql.functions.{col => c}
    val ids = (0L until 10L).toDF("doc_id")
    val corpus = BinaryMeta.syntheticImageCorpus(ids, "doc_id")
    val sigs = ImageHash.dhashDf(corpus, "id")
    val existing = sigs.where(c("id") % 4 =!= 3)
    val batch = sigs.where(c("id") % 4 === 3)
    val table = "graft_img_idx_spec"
    ImageHash.dhashIndexBuild(existing, table, maxHamming = 3, nBuckets = 4)
    val served = ImageHash.dhashIndexProbe(batch, spark.table(table), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val direct = ImageHash.dhashPairs(corpus, "id", maxHamming = 3)
      .where(c("id1") % 4 === 3 || c("id2") % 4 === 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(served == direct && served.nonEmpty,
      s"served=${served.size} direct=${direct.size}")
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("one-pass block guard: quadratic blocks still refuse, one-sided blocks don't trip") {
    import graft.harmonize.Linkage
    // a block key present ONLY on side A must contribute zero pairs
    // (the union formulation counts it as na*0) — linkage proceeds
    val a = ((1 to 40).map(i => (i.toLong, s"n$i", "onlyA")) ++
      Seq((99L, "x", "shared"))).toDF("id_a", "name_a", "blk")
    val b = Seq((201L, "x", "shared")).toDF("id_b", "name_b", "blk")
    val ok = Linkage.linkByName(a, b, Seq("blk"),
      "id_a", "name_a", "id_b", "name_b", maxDist = 1,
      maxBlockPairs = 10L).collect()
    assert(ok.length == 1 && ok.head.getLong(1) == 99L)
    // and a genuinely quadratic shared block still refuses loudly
    val bigB = (1 to 40).map(i => (200L + i, s"m$i", "onlyA"))
      .toDF("id_b", "name_b", "blk")
    val ex = intercept[IllegalArgumentException] {
      Linkage.linkByName(a, bigB, Seq("blk"),
        "id_a", "name_a", "id_b", "name_b", maxDist = 1,
        maxBlockPairs = 1000L)
    }
    assert(ex.getMessage.contains("quadratic"), ex.getMessage)
  }

  // ------------------------------------------------ audio energy hash

  test("AudioHash: volume and channel-replication invariance are bit-exact; boost flips <= 2") {
    import graft.multimodal.{AudioHash, WavCodec}
    val frames = 130
    def v(f: Long): Int = ((f * 37 + 11) % 4001 - 2000).toInt
    val base = AudioHash.audioHash64(WavCodec.encode(8000, 1, frames, v))
    assert(base != null && base != 0L)
    // x2 volume (no clipping at <=4000): both cross-multiply sides
    // scale by 2 -> identical hash
    assert(AudioHash.audioHash64(
      WavCodec.encode(8000, 1, frames, f => 2 * v(f))) == base)
    // mono -> stereo duplicate: sumAbs and nSamples both double
    assert(AudioHash.audioHash64(
      WavCodec.encode(8000, 2, frames, s => v(s / 2))) == base)
    // raising |v| by 500 in bin 32 touches only comparisons 31 and 32
    val boosted = AudioHash.audioHash64(WavCodec.encode(8000, 1, frames, { f =>
      val x = v(f)
      if (f * 65 / frames == 32) { if (x >= 0) x + 500 else x - 500 } else x
    }))
    assert(java.lang.Long.bitCount(base ^ boosted) <= 2)
    // different material is far; garbage is null
    val other = AudioHash.audioHash64(
      WavCodec.encode(8000, 1, frames, f => ((f * 97 + 5) % 3001 - 1500).toInt))
    assert(other != base)
    assert(AudioHash.audioHash64("nope".getBytes("UTF-8")) == null)
  }

  test("audioHashDf/audioHashPairs: codegen'd; remaster twins pair at hamming 0") {
    import graft.multimodal.{AudioHash, BinaryMeta}
    val corpus = BinaryMeta.syntheticAudioCorpus(
      (0L until 6L).toDF("doc_id"), "doc_id")
    val sigs = AudioHash.audioHashDf(corpus, "id")
    assert(!sigs.queryExecution.executedPlan.toString.contains("CodegenFallback"))
    val pairs = AudioHash.audioHashPairs(corpus, "id", maxHamming = 3)
      .as[(Long, Long, Int)].collect()
    (0L until 6L).foreach { d =>
      assert(pairs.exists(p => p._1 == 4 * d && p._2 == 4 * d + 1 && p._3 == 0),
        s"volume twin missing for d=$d")
      assert(pairs.exists(p => p._1 == 4 * d && p._2 == 4 * d + 3 && p._3 == 0),
        s"stereo twin missing for d=$d")
      assert(pairs.exists(p => p._1 == 4 * d && p._2 == 4 * d + 2 && p._3 <= 2),
        s"boosted near-dup missing for d=$d")
    }
  }

  test("hash-kernel fuzz: random/truncated/bit-flipped payloads never throw across all four kernels") {
    import graft.multimodal.{AudioHash, AviCodec, ImageHash, PngCodec, VideoHash, WavCodec}
    val rnd = new scala.util.Random(171717)
    def valid(i: Int): Array[Byte] = (i % 3) match {
      case 0 => PngCodec.encode(9, 7, 1, s => (s % 211).toInt)
      case 1 => WavCodec.encode(8000, 1, 70, f => ((f * 13) % 801 - 400).toInt)
      case _ => AviCodec.encode(4, 3, 70, 33333L, (f, s) => ((s + f) % 199).toInt)
    }
    (0 until 200).foreach { i =>
      val payload = (i % 4) match {
        case 0 => // pure garbage
          val b = new Array[Byte](rnd.nextInt(300)); rnd.nextBytes(b); b
        case 1 => // truncated valid container
          val v = valid(i); java.util.Arrays.copyOf(v, rnd.nextInt(v.length + 1))
        case 2 => // valid container with flipped bytes
          val v = valid(i)
          (0 until 5).foreach(_ => v(rnd.nextInt(v.length)) = rnd.nextInt(256).toByte)
          v
        case _ => valid(i)
      }
      // must return null or a value, never throw
      ImageHash.dhash64(payload)
      ImageHash.phash64(payload)
      AudioHash.audioHash64(payload)
      VideoHash.videoHash64(payload)
    }
  }

  // --------------------------------------------- video temporal hash

  test("VideoHash: brightness-shift and 2x-upscale invariance are bit-exact; boost <= 2") {
    import graft.multimodal.{AviCodec, VideoHash}
    val (w, h, nf) = (8, 3, 130)
    def env(bin: Long): Int = {
      val hh = (65 + bin + 1) * 2654435761L % 999983
      (hh * hh / 1000 % 7).toInt
    }
    def v(f: Int, s: Long): Int =
      ((s * 31 + 7) % 97).toInt + 20 * env(f.toLong * 65 / nf)
    val base = VideoHash.videoHash64(AviCodec.encode(w, h, nf, 33333L, v))
    assert(base != null && base != 0L)
    // +39 on every pixel (no clipping): both cross-multiply sides gain
    // the same 39*n(i)*n(i+1) term
    assert(VideoHash.videoHash64(AviCodec.encode(w, h, nf, 33333L,
      (f, s) => v(f, s) + 39)) == base)
    // 2x nearest upscale: every pixel appears exactly 4 times
    val up = AviCodec.encode(2 * w, 2 * h, nf, 33333L, { (f, s) =>
      val c = (s % 3).toInt
      val pix = s / 3
      v(f, ((pix / (2 * w) / 2) * w + (pix % (2 * w)) / 2) * 3 + c)
    })
    assert(VideoHash.videoHash64(up) == base)
    // +25 on bin-32 frames flips at most the two touching comparisons
    val boosted = VideoHash.videoHash64(AviCodec.encode(w, h, nf, 33333L,
      (f, s) => v(f, s) + (if (f.toLong * 65 / nf == 32) 25 else 0)))
    assert(java.lang.Long.bitCount(base ^ boosted) <= 2)
    // different material differs; garbage null
    assert(VideoHash.videoHash64(AviCodec.encode(w, h, nf, 33333L,
      (f, s) => ((s * 53 + f * 13 + 5) % 211).toInt)) != base)
    assert(VideoHash.videoHash64("nope".getBytes("UTF-8")) == null)
  }

  test("videoHashDf/videoHashPairs: codegen'd; remaster twins pair at hamming 0") {
    import graft.multimodal.{BinaryMeta, VideoHash}
    val corpus = BinaryMeta.syntheticVideoCorpus(
      (0L until 6L).toDF("doc_id"), "doc_id")
    assert(!VideoHash.videoHashDf(corpus, "id")
      .queryExecution.executedPlan.toString.contains("CodegenFallback"))
    val pairs = VideoHash.videoHashPairs(corpus, "id", maxHamming = 3)
      .as[(Long, Long, Int)].collect()
    (0L until 6L).foreach { d =>
      assert(pairs.exists(p => p._1 == 4 * d && p._2 == 4 * d + 1 && p._3 == 0),
        s"graded twin missing for d=$d")
      assert(pairs.exists(p => p._1 == 4 * d && p._2 == 4 * d + 3 && p._3 == 0),
        s"upscale twin missing for d=$d")
      assert(pairs.exists(p => p._1 == 4 * d && p._2 == 4 * d + 2 && p._3 <= 2),
        s"boosted near-dup missing for d=$d")
    }
  }

  // ------------------------------------------ fuzzy decontamination

  test("fuzzyOverlap: finds paraphrased eval leaks exact shingle-count scoring underweights") {
    import graft.dedup.Decontaminate
    val eval = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"),
      (101L, "completely unrelated benchmark prompt about chemistry"))
      .toDF("eid", "etext")
    val train = Seq(
      // light edit of eval 100 — a fuzzy leak (high Jaccard)
      (1L, "the quick brown fox jumps over the lazy dog today"),
      // shares only one scattered 3-gram with eval 100 — not a leak
      (2L, "a quick brown fox appears in many corpora worldwide"),
      (3L, "clean training document with no benchmark overlap at all"))
      .toDF("id", "text")
    val hits = Decontaminate.fuzzyOverlap(train, "id", "text",
      eval, "eid", "etext", k = 3, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(hits.map(h => (h._1, h._2)).toSet == Set((1L, 100L)),
      s"only the light edit clears 0.5: ${hits.toSeq}")
    assert(hits.head._3 > 0.5 && hits.head._3 < 1.0)
    val clean = Decontaminate.fuzzyClean(train, "id", "text",
      eval, "eid", "etext", k = 3, threshold = 0.5)
      .select("id").as[Long].collect().toSet
    assert(clean == Set(2L, 3L))
    // the eval side broadcasts — the corpus never shuffles on content
    val plan = Decontaminate.fuzzyOverlap(train, "id", "text",
      eval, "eid", "etext", k = 3, threshold = 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  // ------------------------------------------------ pHash (DCT hash)

  test("ImageHash.dctBasis: every non-DC row sums to exactly zero (the invariance lemma)") {
    import graft.multimodal.ImageHash
    assert(ImageHash.dctBasis(0).map(_.toLong).sum == 32L * 16384)
    (1 to 7).foreach { u =>
      assert(ImageHash.dctBasis(u).map(_.toLong).sum == 0L,
        s"basis row $u must cancel exactly")
    }
  }

  test("ImageHash.phash64: flat raster hashes to 0; brightness shift is bit-exact invariant") {
    import graft.multimodal.{ImageHash, PngCodec}
    // flat: all 63 non-DC coefficients provably zero -> hash 0
    assert(ImageHash.phash64(PngCodec.encode(33, 21, 1, _ => 137)) == 0L)
    // uniform +50 (no clipping: g <= 190) moves only the excluded DC
    val (w, h) = (37, 29)
    def g(s: Long): Int = ((s * 31 + 7) % 191).toInt
    val base = ImageHash.phash64(PngCodec.encode(w, h, 1, g))
    val bright = ImageHash.phash64(PngCodec.encode(w, h, 1, s => g(s) + 50))
    assert(base != null && base != 0L)
    assert(bright == base, "uniform brightness shift must be exact-invariant")
  }

  test("ImageHash.phash64: container-invariant, distinct images differ, undecodable null") {
    import graft.multimodal.{BmpCodec, GifCodec, ImageHash, PngCodec}
    val (w, h) = (20, 17)
    def g(s: Long): Int = ((s * 53 + 11) % 229).toInt
    val base = ImageHash.phash64(PngCodec.encode(w, h, 1, g))
    assert(base != null && base != 0L)
    assert(ImageHash.phash64(PngCodec.encode(w, h, 3, s => g(s / 3))) == base)
    assert(ImageHash.phash64(BmpCodec.encode(w, h,
      (x, y, _) => g(y.toLong * w + x), topDown = true)) == base)
    assert(ImageHash.phash64(GifCodec.encode(w, h, (s: Int) => g(s.toLong))) == base)
    val other = ImageHash.phash64(
      PngCodec.encode(w, h, 1, s => ((s * 97 + 151) % 217).toInt))
    assert(other != base, "structurally different images must differ")
    assert(ImageHash.phash64("not an image".getBytes("UTF-8")) == null)
    assert(ImageHash.phash64(null) == null)
  }

  test("phashDf/phashPairs: codegen'd kernel; re-encode twins pair at hamming 0") {
    import graft.multimodal.{BinaryMeta, ImageHash}
    val corpus = BinaryMeta.syntheticImageCorpus(
      (0L until 6L).toDF("doc_id"), "doc_id")
    val sigs = ImageHash.phashDf(corpus, "id")
    val plan = sigs.queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"), plan)
    val pairs = ImageHash.phashPairs(corpus, "id", maxHamming = 3)
      .as[(Long, Long, Int)].collect()
    // the re-encode twin (4d, 4d+1) carries the SAME raster -> exact
    // collision, present for every d
    (0L until 6L).foreach { d =>
      assert(pairs.exists(p => p._1 == 4 * d && p._2 == 4 * d + 1 && p._3 == 0),
        s"re-encode twin pair missing for d=$d: ${pairs.toSeq}")
    }
  }

  test("htmlMainText is a pure scalar op: streaming micro-batches == the batch result") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val pages = Seq(
      (1L, "<html><body><nav><a>Home</a> <a>About</a></nav>" +
        "<p>first real article body</p><footer>c 2024</footer></body></html>"),
      (2L, "<html><head><title>t</title><body><h1>Second doc heading</h1>" +
        "<p>second body paragraph text</p>"),
      (3L, "<p><a>all</a> <a>links</a></p>"))
    def extract(df: org.apache.spark.sql.DataFrame) =
      df.select(F.col("id"),
        graft.text.HtmlMainExtract.htmlMainText(
          F.encode(F.col("html"), "UTF-8"),
          F.lit("text/html; charset=utf-8")).as("main_text"))
    val batch = extract(pages.toDF("id", "html"))
      .as[(Long, String)].collect().toMap
    val stream = MemoryStream[(Long, String)]
    val q = extract(stream.toDF().toDF("id", "html"))
      .writeStream.format("memory").queryName("main_text_stream")
      .outputMode("append").start()
    try {
      stream.addData(pages.head)
      q.processAllAvailable()
      stream.addData(pages.tail: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("main_text_stream")
      .as[(Long, String)].collect().toMap
    assert(got == batch, s"streaming $got != batch $batch")
    assert(batch(3L) == "") // the link farm drops in both paths
  }

  // -------------------------------------------- URL host / domain keys

  test("Urls.hostOf/registrableDomain: hand cases cover every rule") {
    import graft.functions.Urls
    // host: lowercase, www./trailing-dot strip, port excluded
    assert(Urls.hostOf("http://WWW.News.Example.COM:80/x") == "news.example.com")
    assert(Urls.hostOf("https://example.net./p#f") == "example.net")
    assert(Urls.hostOf("http://cdn3.media.example.org:8080/img") ==
      "cdn3.media.example.org")
    assert(Urls.hostOf("not a url") == null)
    assert(Urls.hostOf("ftp://example.com/x") == null)
    // domain: 2 labels, 3 under a ccSLD, short hosts as themselves,
    // IP literals as themselves
    assert(Urls.registrableDomain("http://a.b.example.com/") == "example.com")
    assert(Urls.registrableDomain("https://blog.shop.example.co.uk/") ==
      "example.co.uk")
    assert(Urls.registrableDomain("http://example.co.uk/") == "example.co.uk")
    assert(Urls.registrableDomain("http://example.net/") == "example.net")
    assert(Urls.registrableDomain("http://localhost/") == "localhost")
    assert(Urls.registrableDomain("http://10.2.3.4:8080/") == "10.2.3.4")
    assert(Urls.registrableDomain("nope") == null)
    // the domain key is stable under canonicalization (same host rules)
    val u = "http://WWW.CDN7.Media.Example.ORG:80/a/../b?q=1#f"
    assert(Urls.registrableDomain(Urls.canonicalize(u)) ==
      Urls.registrableDomain(u))
  }

  test("url host/domain columns: codegen'd, null-safe, compose with takePerStratum") {
    import graft.functions.Urls
    import graft.text.Curate
    val df = Seq(
      (1L, "http://a.x.example.com/1"), (2L, "http://b.x.example.com/2"),
      (3L, "http://c.y.example.org/3"), (4L, null.asInstanceOf[String]),
      (5L, "garbage")).toDF("id", "url")
      .select(F.col("id"), Urls.host(F.col("url")).as("host"),
        Urls.domain(F.col("url")).as("domain"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"), plan)
    val rows = df.collect().map(r =>
      (r.getLong(0), Option(r.getString(1)), Option(r.getString(2)))).toSet
    assert(rows == Set(
      (1L, Some("a.x.example.com"), Some("example.com")),
      (2L, Some("b.x.example.com"), Some("example.com")),
      (3L, Some("c.y.example.org"), Some("example.org")),
      (4L, None, None), (5L, None, None)))
    // per-domain quota: 2 example.com docs capped to 1
    val capped = Curate.takePerStratum(
      df.where(F.col("domain").isNotNull), "id", "domain", n = 1)
    assert(capped.count() == 2)
    assert(capped.select("domain").distinct().count() == 2)
  }

  // ------------------------------------- learned-encoder plug-in seam

  test("FeatureEncoder seam: a swapped encoder rides the identical plumbing end to end") {
    import graft.multimodal.BinaryMeta
    import graft.similarity.Ann
    val df = BinaryMeta.attachBlob(Seq(
      (1L, "identical multimodal payload bytes"),
      (2L, "identical multimodal payload bytes"),
      (3L, "completely different content here zzz qqq")).toDF("doc_id", "text"),
      "text")
    // a "model" with entirely different semantics than the stand-in:
    // [len, first byte, last byte] L2-normalized, batch-shaped like a
    // real forward pass
    val custom = new BinaryMeta.FeatureEncoder {
      val dim = 3
      def encodeBatch(ps: Array[Array[Byte]]): Array[Array[Float]] =
        ps.map { b =>
          val raw = Array[Float](b.length.toFloat,
            (b.headOption.getOrElse(0: Byte) & 0xff).toFloat,
            (b.lastOption.getOrElse(0: Byte) & 0xff).toFloat)
          val n = math.sqrt(raw.map(x => x.toDouble * x).sum).toFloat
          raw.map(_ / n)
        }
    }
    val feats = BinaryMeta.extractFeatures(df, "doc_id", custom, batchSize = 2)
    // same schema, same row contract as the stand-in path
    val stub = BinaryMeta.extractFeaturesStub(df, "doc_id", dim = 16)
    assert(feats.schema == stub.schema)
    assert(feats.count() == stub.count())
    // and the swapped encoder's column feeds the similarity suite
    // through the SAME composition the stand-in does
    val pairs = Ann.cosinePairs(feats, "id", "feature", threshold = 0.999)
      .as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)),
      s"identical payloads must pair under any encoder: ${pairs.toSeq}")
    // dim-contract violations refuse loudly instead of corrupting rows
    val bad = new BinaryMeta.FeatureEncoder {
      val dim = 3
      def encodeBatch(ps: Array[Array[Byte]]): Array[Array[Float]] =
        ps.map(_ => Array(1f, 2f)) // wrong width
    }
    val ex = intercept[org.apache.spark.SparkException] {
      BinaryMeta.extractFeatures(df, "doc_id", bad).collect()
    }
    assert(ex.getMessage != null)
  }

  // ------------------------------------------------------- KMV sketch

  test("KmvAgg.Sketch: keeps the k smallest distinct values, O(1)-rejects the rest") {
    val s = new graft.functions.KmvAgg.Sketch(4)
    Seq(50L, 10L, 30L, 20L, 40L, 10L, 30L, 5L).foreach(s.offer)
    assert(s.sortedValues.toSeq == Seq(5L, 10L, 20L, 30L))
    // duplicates never stack, MinValue (the set's empty marker) included
    val m = new graft.functions.KmvAgg.Sketch(3)
    Seq(Long.MinValue, 7L, Long.MinValue, 7L, 3L, 9L).foreach(m.offer)
    assert(m.sortedValues.toSeq == Seq(Long.MinValue, 3L, 7L))
  }

  test("kmvAgg: sub-k columns carry their EXACT distinct hash sets (KMV exactness)") {
    import graft.functions.KmvAgg.kmvAgg
    // distinct counts 30 and 20 with 10 shared values, k = 1024 >> n:
    // the sketches are the exact hash sets, so |A∩B| and |A∪B| from
    // array set ops are exact
    val a = (1 to 30).map(i => s"v$i").toDF("v")
    val b = (21 to 40).map(i => s"v$i").toDF("v")
    val sa = a.agg(kmvAgg(F.col("v"), 1024).as("s")).collect()
      .head.getSeq[Long](0).toSet
    val sb = b.agg(kmvAgg(F.col("v"), 1024).as("s")).collect()
      .head.getSeq[Long](0).toSet
    assert(sa.size == 30 && sb.size == 20)
    assert((sa intersect sb).size == 10)
    assert((sa union sb).size == 40)
  }

  test("inclusionSketchGate: KMV estimator within tolerance on over-k cardinalities") {
    import graft.harmonize.Discovery
    // 8000 vs 6000 distinct with 4000 shared — well above k=1024, so
    // this exercises the ESTIMATOR, not the exactness fallback;
    // containment(A→B) = 0.5, (B→A) = 2/3, ratio 8/6 within maxRatio
    val a = (1 to 8000).map(i => s"k$i").toDF("x")
    val b = (4001 to 10000).map(i => s"k$i").toDF("y")
    val out = Discovery.inclusionSketchGate(
      Seq(("a.x", a, "x"), ("b.y", b, "y"))).collect()
    assert(out.length == 2)
    assert(out.forall(_.getBoolean(2)),
      out.map(r => s"${r.getString(0)}->${r.getString(1)}").mkString(","))
  }

  // ------------------------------------------- main-content extraction

  import graft.text.{HtmlExtract, HtmlMainExtract}

  test("extractMain: semantic containers, link farms and word-starved blocks drop; content keeps") {
    val html =
      """<html><head><title>Site title</title><style>nav { a > b; }</style>
        |<script>if (1 < 2) { alert("</b>"); }</script></head>
        |<body><nav><a href="/">Home</a> <a href="/a">About</a></nav>
        |<header><div>Site logo</div></header>
        |<h1 data-x="a>b">Real heading</h1>
        |<p>Body text with an inline <a href="/x">link</a> inside a long paragraph.</p>
        |<div><a href="/r">related</a> <a href="/m">more links</a> x</div>
        |<p>short</p>
        |<footer>Copyright 2024 Example Corp</footer>
        |<aside>Sidebar <a href="/p">promo</a></aside></body></html>""".stripMargin
    val out = HtmlMainExtract.extractMain(html)
    assert(out ==
      "Real heading\nBody text with an inline link inside a long paragraph.")
  }

  test("extractMain: link density boundary is the exact integer test 3*link <= total") {
    // "abcdef ghijkl xx" with "abcdef" in an anchor: link=6, total=14,
    // 3*6=18 > 14 -> drop; add two plain chars -> total=16... still
    // drop; make link exactly 1/3: link=6 total=18 -> keep
    assert(HtmlMainExtract.extractMain(
      "<p><a>abcdef</a> ghijkl xx</p>") == "")
    assert(HtmlMainExtract.extractMain(
      "<p><a>abcdef</a> ghijkl abcdef</p>") == "abcdef ghijkl abcdef")
    // minWords kills one-word blocks regardless of links
    assert(HtmlMainExtract.extractMain("<p>loneword</p>") == "")
    assert(HtmlMainExtract.extractMain("<p>two words</p>") == "two words")
  }

  test("extractMain: unclosed head swallows until <body>; unclosed nav swallows the tail") {
    // the body escape hatch: real crawls omit </head> constantly
    assert(HtmlMainExtract.extractMain(
      "<html><head><title>t</title><body><p>kept body text</p>") ==
      "kept body text")
    // an unclosed pruned container swallows to EOF (documented)
    assert(HtmlMainExtract.extractMain(
      "<p>kept before nav</p><nav><a>Home</a> trailing text") ==
      "kept before nav")
    // self-closing pruned tags prune nothing
    assert(HtmlMainExtract.extractMain(
      "<nav/><p>kept after empty nav</p>") == "kept after empty nav")
  }

  test("extractMain: entities, NBSP collapse and nested anchors share HtmlExtract semantics") {
    assert(HtmlMainExtract.extractMain(
      "<p>fin&nbsp;&lt;7&gt; &#233; twin</p>") == "fin <7> é twin")
    // nested anchor depth: all chars inside count as link chars once
    assert(HtmlMainExtract.extractMain(
      "<p><a>out <a>in</a> out</a></p>") == "")
    // inline tags split words but not blocks
    assert(HtmlMainExtract.extractMain(
      "<p>fan<i>tastic</i> stuff here</p>") == "fan tastic stuff here")
  }

  test("extractMain property: never throws, and output tokens are a subset of the WET tokens") {
    val rnd = new scala.util.Random(170217)
    val frags = Array("<p>", "</p>", "<div>", "</div>", "<a href='x>y'>",
      "</a>", "<nav>", "</nav>", "<body>", "&amp;", "&#65;", "&bogus;",
      "<!-- c -->", "<script>a<b</script>", "<![CDATA[x]]>", "word",
      "two words", "<", ">", "&", " ", " ", "<footer>", "</footer>",
      "<h2>", "</h2>", "é", "<!doctype html>", "<?pi?>", "<head>", "</head>")
    (1 to 300).foreach { _ =>
      val doc = (1 to rnd.nextInt(40))
        .map(_ => frags(rnd.nextInt(frags.length))).mkString
      val main = HtmlMainExtract.extractMain(doc) // must not throw
      val wet = HtmlExtract.extract(doc)
      val wetToks = wet.split("\\s+").filter(_.nonEmpty)
        .groupBy(identity).map { case (k, v) => k -> v.length }
      val mainToks = main.split("\\s+").filter(_.nonEmpty)
        .groupBy(identity).map { case (k, v) => k -> v.length }
      mainToks.foreach { case (tok, n) =>
        assert(wetToks.getOrElse(tok, 0) >= n,
          s"main token '$tok' x$n not within WET tokens of: $doc")
      }
    }
  }

  test("htmlMainText column: codegen'd expression, WARC main-text bridge drops chrome") {
    val df = Seq((1L,
      "<html><body><nav><a>Home</a> <a>About</a></nav>" +
        "<p>real article body text</p>" +
        "<footer>Copyright 2024</footer></body></html>"))
      .toDF("id", "html")
      .select(F.col("id"),
        graft.text.HtmlMainExtract.htmlMainText(
          F.encode(F.col("html"), "UTF-8"),
          F.lit("text/html; charset=utf-8")).as("main_text"))
    // stays codegen'd: no CodegenFallback in the executed plan
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"), plan)
    assert(df.collect().head.getString(1) == "real article body text")
  }
}
