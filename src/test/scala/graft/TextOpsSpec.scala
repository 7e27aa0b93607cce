package graft

import graft.text.TextOps
import graft.multimodal.BinaryMeta
import org.apache.spark.sql.{functions => F}

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens: lowercase, splits on non-alphanumerics, drops empties") {
    val got = Seq("Hello, World!  42x ").toDF("t")
      .select(TextOps.tokens($"t").as("tk")).as[Seq[String]].head()
    assert(got == Seq("hello", "world", "42x"))
  }

  test("bm25TopK: hand-computed scores, idf ordering, tie/rank contract") {
    // corpus: apple appears only in d1 (rare -> high idf), cherry in
    // d2 and d3. N=3, dl = 3/2/4, avgdl = 3 exactly.
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry cherry")).toDF("doc_id", "text")
    val got = graft.text.Search.bm25TopK(docs, "doc_id", "text",
        Seq(0 -> "apple cherry"), k = 10)
      .orderBy("rank").as[(Int, Long, Double, Int)].collect()
    def bm25(tf: Long, df: Long, dl: Int, n: Long, avgdl: Double): Double = {
      val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
      val c = idf * (tf * (1.2 + 1)) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
      math.rint(c * 1e9) / 1e9 // HALF_EVEN is fine away from ties
    }
    val exp = Seq(
      (1L, bm25(2, 1, 3, 3, 3.0)), // d1: apple only
      (3L, bm25(4, 2, 4, 3, 3.0)), // d3: cherry, high tf
      (2L, bm25(1, 2, 2, 3, 3.0))) // d2: cherry once
    assert(got.map(_._2).toSeq == exp.map(_._1), s"ranking order: $got")
    got.zip(exp).foreach { case ((_, id, score, _), (eid, escore)) =>
      assert(id == eid && math.abs(score - escore) < 1e-6, s"doc $id: $score vs $escore")
    }
    assert(got.map(_._4).toSeq == Seq(1, 2, 3), "dense ranks from 1")
    assert(got.forall(_._1 == 0))
    // duplicate query terms count once: "apple apple" == "apple"
    val dup = graft.text.Search.bm25TopK(docs, "doc_id", "text",
      Seq(0 -> "apple apple"), k = 10).as[(Int, Long, Double, Int)].collect()
    val single = graft.text.Search.bm25TopK(docs, "doc_id", "text",
      Seq(0 -> "apple"), k = 10).as[(Int, Long, Double, Int)].collect()
    assert(dup.toSeq == single.toSeq)
    // k truncates: only the top-1 row survives
    val top1 = graft.text.Search.bm25TopK(docs, "doc_id", "text",
      Seq(0 -> "apple cherry"), k = 1).as[(Int, Long, Double, Int)].collect()
    assert(top1.length == 1 && top1.head._2 == 1L)
  }

  test("bm25 meta-grouped index: filtered query scores the sub-corpus exactly; unfiltered recovers global; append refuses grouped stats") {
    import graft.text.Search
    // two langs; the en slice is docs 1+2 (N=2, avgdl=(3+2)/2)
    val docs = Seq(
      (1L, "apple banana apple", "en"),
      (2L, "banana cherry", "en"),
      (3L, "cherry cherry cherry cherry", "de")).toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("bm25meta").toString
    val table = "graft_bm25_meta_" + java.lang.Long.toHexString(System.nanoTime())
    Search.bm25Build(docs, "doc_id", "text", table, s"$dir/stats",
      nBuckets = 2, metaCols = Seq("lang"))
    val queries = Seq(0 -> "apple cherry")
    // pre-filter semantics: identical to inline BM25 over the slice —
    // slice N, avgdl, AND df (cherry's en df is 1, not 2)
    val filtered = Search.bm25QueryIndex(spark, table, s"$dir/stats",
        queries, k = 10, filter = Some(F.col("lang") === "en"))
      .as[(Int, Long, Double, Int)].collect().sortBy(_._4).toSeq
    val sliceInline = Search.bm25TopK(docs.where($"lang" === "en"),
        "doc_id", "text", queries, k = 10)
      .as[(Int, Long, Double, Int)].collect().sortBy(_._4).toSeq
    assert(filtered == sliceInline && filtered.map(_._2) == Seq(1L, 2L),
      s"filtered=$filtered slice=$sliceInline")
    // the unfiltered query over the SAME grouped index sums the stats
    // rows back to the global corpus — equal to plain inline BM25
    val unfiltered = Search.bm25QueryIndex(spark, table, s"$dir/stats",
        queries, k = 10)
      .as[(Int, Long, Double, Int)].collect().sortBy(_._4).toSeq
    val globalInline = Search.bm25TopK(docs, "doc_id", "text", queries, k = 10)
      .as[(Int, Long, Double, Int)].collect().sortBy(_._4).toSeq
    assert(unfiltered == globalInline)
    // append over a meta-grouped index must refuse loudly (per-group
    // stats cannot be additively overwritten by the plain append)
    val e = intercept[IllegalArgumentException] {
      Search.bm25IndexAppend(docs.limit(0), "doc_id", "text",
        table, s"$dir/stats", nBuckets = 2)
    }
    assert(e.getMessage.contains("metaCols"))
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("rrfFuse: hand-computed fusion, agreement beats single-arm, rank contract") {
    // arm A ranks docs 10,11,12; arm B ranks 11,13. Doc 11 appears in
    // both arms (rank 2 + rank 1) and must outrank every single-arm
    // doc: 1/62 + 1/61 > 1/61 (doc 10, A rank 1 only).
    val armA = Seq((0, 10L, 1L), (0, 11L, 2L), (0, 12L, 3L)).toDF("query_id", "doc_id", "rank")
    val armB = Seq((0, 11L, 1L), (0, 13L, 2L)).toDF("query_id", "doc_id", "rank")
    val got = graft.text.Search.rrfFuse(Seq(armA, armB), k = 10)
      .orderBy("rank").as[(Int, Long, Double, Long, Int)].collect()
    // HALF_UP like Spark's F.round on doubles (math.rint is half-even
    // and could diverge on exact-half 9dp/6dp values)
    def rUp(x: Double, dp: Int): Double =
      BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble
    def rrf(ranks: Long*) =
      rUp(ranks.map(r => rUp(1.0 / (60.0 + r), 9)).sum, 6)
    assert(got.map(_._2).toSeq == Seq(11L, 10L, 13L, 12L), s"fusion order: ${got.toSeq}")
    val expScore = Map(11L -> rrf(2, 1), 10L -> rrf(1), 13L -> rrf(2), 12L -> rrf(3))
    got.foreach { case (_, id, score, nArms, _) =>
      assert(math.abs(score - expScore(id)) < 1e-9, s"doc $id: $score")
      assert(nArms == (if (id == 11L) 2L else 1L), s"n_arms for $id")
    }
    assert(got.map(_._5).toSeq == Seq(1, 2, 3, 4), "dense ranks from 1")
    // k truncates the fused list
    val top2 = graft.text.Search.rrfFuse(Seq(armA, armB), k = 2).count()
    assert(top2 == 2)
    // single arm: fusion is a monotone transform — order preserved
    val solo = graft.text.Search.rrfFuse(Seq(armA), k = 10)
      .orderBy("rank").as[(Int, Long, Double, Long, Int)].collect()
    assert(solo.map(_._2).toSeq == Seq(10L, 11L, 12L))
  }

  test("naiveBayes: hand-computed posteriors, smoothing, OOV fallback") {
    // train: class a sees {x x y}, class b sees {y z}; V = 3
    val train = Seq(
      (1L, "x x y", "a"),
      (2L, "y z", "b")).toDF("doc_id", "text", "lang")
    // t10 = "x": P(x|a)=(2+1)/(3+3)=1/2 vs P(x|b)=(0+1)/(2+3)=1/5 -> a
    // t11 = "z z": (0+1)/6 squared vs (1+1)/5 squared -> b
    // t12 = "q" (OOV): falls back to the argmax-prior class; priors
    //       tie at 1/2 -> label-asc tiebreak -> a
    val test = Seq(
      (10L, "x", "a"),
      (11L, "z z", "b"),
      (12L, "q", "b")).toDF("doc_id", "text", "lang")
    val got = graft.text.Classify.naiveBayes(train, test, "doc_id", "text", "lang")
      .orderBy("id").as[(Long, String, String, Int)].collect()
    assert(got.toSeq == Seq(
      (10L, "a", "a", 1),
      (11L, "b", "b", 1),
      (12L, "b", "a", 0)), s"got ${got.toSeq}")
    // exact posterior check for t10: score(a) = ln(1/2) + ln(3/6),
    // score(b) = ln(1/2) + ln(1/5), each addend rounded to 9dp
    def r9(x: Double) = math.rint(x * 1e9) / 1e9
    val sa = r9(math.log(0.5)) + r9(math.log(3.0 / 6))
    val sb = r9(math.log(0.5)) + r9(math.log(1.0 / 5))
    assert(sa > sb) // the margin the argmax rests on
  }

  test("shingles: k-grams, short docs give empty") {
    val df = Seq("a b c d", "a b").toDF("t")
      .select(TextOps.shingles(TextOps.tokens($"t"), 3).as("sh"))
    val got = df.as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1).isEmpty)
  }

  test("langId picks the stopword-dominant language; und when none") {
    val df = Seq(
      "the cat is on the mat and it is happy",
      "el gato es un animal y no es feliz",
      "zzz kkk qqq").toDF("t")
      .select(TextOps.langId($"t").as("l")).as[String].collect()
    assert(df.toSeq == Seq("en", "es", "und"))
  }

  test("bpeTokenCount counts alpha runs, digit runs, and symbols") {
    val got = Seq("ab12 cd! e").toDF("t")
      .select(TextOps.bpeTokenCount($"t").as("n")).as[Int].head()
    // ab | 12 | cd | ! | e
    assert(got == 5)
  }

  test("qualityStats: exact counts on a known string") {
    val stats = TextOps.qualityStats($"t", Seq("the", "a"))
    val row = Seq("The cat, a hat.").toDF("t")
      .select(stats.map { case (n, c) => c.as(n) }: _*)
      .collect().head
    assert(row.getAs[Long]("n_chars") == 15)
    assert(row.getAs[Long]("n_tokens") == 4)
    assert(row.getAs[Long]("n_punct") == 2) // comma and period
    assert(row.getAs[Long]("n_upper") == 1)
    assert(row.getAs[Long]("n_stopwords") == 2) // "the", "a"
  }

  test("scrub masks emails and urls; topTokenShare flags repetition") {
    val scrubbed = Seq("mail me at jane.doe+x@example.org or see https://ex.org/a?b=1 now")
      .toDF("t").select(TextOps.scrub($"t").as("s")).as[String].head()
    assert(scrubbed == "mail me at <EMAIL> or see <URL> now")
    val pii = Seq("ring 555-123-4567 or 555.123.4567, ssh 192.168.001.1; v2.1.3 stays")
      .toDF("t").select(TextOps.scrubPii($"t").as("s")).as[String].head()
    assert(pii == "ring <PHONE> or <PHONE>, ssh <IP>; v2.1.3 stays",
      s"got: $pii")
    val shares = Seq("spam spam spam spam unique", "all words here differ", "")
      .toDF("t").select(TextOps.tokens($"t").as("toks"))
      .select(TextOps.topTokenShare($"toks").as("r")).as[Double].collect()
    assert(math.abs(shares(0) - 0.8) < 1e-12)
    assert(math.abs(shares(1) - 0.25) < 1e-12)
    assert(shares(2) == 0.0)
  }

  test("multimodal resize/frame-sample stubs keep schema and determinism") {
    val df = BinaryMeta.attachBlob(
      Seq((1L, "some fairly long payload standing in for image bytes")).toDF("doc_id", "text"), "text")
    val resized = BinaryMeta.resizeStub(df, 64, 48)
    val r = resized.select("resized_w", "resized_h", "orig_bytes").collect().head
    assert(r.getInt(0) == 64 && r.getInt(1) == 48 && r.getLong(2) > 0)
    val frames = BinaryMeta.frameSampleStub(df, "doc_id", k = 3)
    assert(frames.columns.toSeq == Seq("doc_id", "frame_no", "frame_blob"))
    assert(frames.count() == 3)
    assert(frames.select("frame_no").as[Int].collect().sorted.toSeq == Seq(0, 1, 2))
  }

  test("ImageHeaders parses hand-written PNG/GIF/JPEG headers and rejects garbage") {
    import graft.multimodal.ImageHeaders
    // fixtures written out byte-by-byte from the public specs —
    // independent of the Spark-side blob builder
    def hex(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // PNG, 2x3: sig, IHDR len 13, "IHDR", w=2, h=3, depth/color/etc, crc
    val png = hex("89504E470D0A1A0A" + "0000000D" + "49484452" +
      "00000002" + "00000003" + "0806000000" + "DEADBEEF")
    assert(ImageHeaders.decode(png).contains((2, 3, "png")))
    // GIF89a, 320x200 little-endian: 0x140 -> 40 01, 0xC8 -> C8 00
    val gif = hex("474946383961" + "4001" + "C800" + "F70000")
    assert(ImageHeaders.decode(gif).contains((320, 200, "gif")))
    // JPEG: SOI, COM segment (skipped), SOF2 (progressive), h=16 w=17
    val jpg = hex("FFD8" + "FFFE0004ABCD" + "FFC2000B08" + "0010" + "0011" +
      "01012200" + "FFD9")
    assert(ImageHeaders.decode(jpg).contains((17, 16, "jpeg")))
    // garbage, truncation, and a JPEG that ends before any SOF
    assert(ImageHeaders.decode(null).isEmpty)
    assert(ImageHeaders.decode("not an image at all".getBytes).isEmpty)
    assert(ImageHeaders.decode(png.take(20)).isEmpty)
    assert(ImageHeaders.decode(hex("FFD8FFD9")).isEmpty)
    assert(ImageHeaders.decode(hex("FFD8FFFE0004ABCD")).isEmpty)
    // WebP, all three first-chunk layouts (public container spec):
    // lossy VP8: frame tag x3, start code 9D012A, w=160 h=120 (14-bit LE)
    val vp8 = hex("52494646" + "24000000" + "57454250" + "56503820" + "18000000" +
      "000000" + "9D012A" + "A000" + "7800" + "0000000000000000")
    assert(ImageHeaders.decode(vp8).contains((160, 120, "webp")))
    // lossless VP8L: 0x2F then (w-1)=29, (h-1)=16 packed 14+14 LSB-first:
    // bits = 29 | 16<<14 = 0x04001D -> bytes 1D 00 04 00
    val vp8l = hex("52494646" + "20000000" + "57454250" + "5650384C" + "10000000" +
      "2F" + "1D000400" + "00000000000000000000")
    assert(ImageHeaders.decode(vp8l).contains((30, 17, "webp")))
    // extended VP8X: canvas (w-1)=639, (h-1)=479 as 24-bit LE at +4/+7
    val vp8x = hex("52494646" + "20000000" + "57454250" + "56503858" + "0A000000" +
      "00" + "000000" + "7F0200" + "DF0100" + "000000000000")
    assert(ImageHeaders.decode(vp8x).contains((640, 480, "webp")))
    // truncated / wrong-signature RIFF stays unknown
    assert(ImageHeaders.decode(vp8.take(24)).isEmpty)
    assert(ImageHeaders.decode(hex("52494646" + "10000000" + "57415645" + "64617461")).isEmpty)
  }

  test("PngCodec round-trips real deflate+filtered pixels to exact integer stats") {
    import graft.multimodal.PngCodec
    // every (dims, channels) shape hits all five filter types (height
    // >= 5 rows cycles the full set) plus the degenerate single-column
    // and single-row edges where Sub/Up have no left/up neighbor
    for ((w, h, ch) <- Seq((7, 6, 1), (7, 6, 3), (1, 9, 3), (9, 1, 1), (16, 12, 3))) {
      val value: Long => Int = s => ((s * 31 + 5) % 256).toInt
      val blob = PngCodec.encode(w, h, ch, value)
      // the blob is ALSO a valid container for the header parser
      assert(graft.multimodal.ImageHeaders.decode(blob).contains((w, h, "png")))
      val n = w.toLong * h * ch
      val expSum = (0L until n).map(s => value(s).toLong).sum
      val expSq = (0L until n).map(s => { val v = value(s).toLong; v * v }).sum
      val got = PngCodec.decodeStats(blob)
      assert(got.contains(PngCodec.PixelStats(w, h, ch, n, expSum, expSq)),
        s"($w x $h x $ch) got $got want sums ($expSum, $expSq)")
    }
  }

  test("GifCodec round-trips real LZW streams to exact palette-expanded stats") {
    import graft.multimodal.GifCodec
    for ((w, h) <- Seq((7, 6), (1, 9), (9, 1), (14, 10), (16, 12))) {
      val value: Int => Int = s => (s * 37 + 5) % 256
      val blob = GifCodec.encode(w, h, value)
      assert(graft.multimodal.ImageHeaders.decode(blob).contains((w, h, "gif")))
      val n = w * h
      // grayscale palette: every pixel contributes its index 3 times
      val expSum = 3L * (0 until n).map(s => value(s).toLong).sum
      val expSq = 3L * (0 until n).map(s => { val v = value(s).toLong; v * v }).sum
      val got = GifCodec.decodeStats(blob)
      assert(got.contains(graft.multimodal.PngCodec.PixelStats(
        w, h, 3, 3L * n, expSum, expSq)), s"($w x $h) got $got")
    }
  }

  test("GifCodec decodes GENUINELY compressed LZW (table growth, width bumps, KwKwK)") {
    import graft.multimodal.GifCodec
    // independent test-side LZW compressor with a REAL string table —
    // it emits multi-symbol codes, grows the dictionary, and widens
    // the code exactly when a decoder's table would overflow the
    // current width, so the decoder's general path (not just the
    // encoder's root-code regime) is what this exercises
    def compress(indices: Array[Int], minCode: Int): Array[Byte] = {
      val clear = 1 << minCode
      var width = minCode + 1
      var encNext = clear + 2
      var decNext = clear + 2 // the decoder's table-size simulation
      var emitted = 0
      val dict = scala.collection.mutable.HashMap[Vector[Int], Int]()
      val out = new java.io.ByteArrayOutputStream()
      var acc = 0L; var bits = 0
      def put(code: Int): Unit = {
        acc |= code.toLong << bits; bits += width
        while (bits >= 8) { out.write((acc & 0xff).toInt); acc >>>= 8; bits -= 8 }
        emitted += 1
        // the decoder defines an entry from the 2nd DATA code on (the
        // first after a clear has no prev); widths must track ITS table
        if (emitted >= 2 && decNext < 4096) {
          decNext += 1
          if (decNext < 4096 && decNext == (1 << width) && width < 12) width += 1
        }
      }
      def codeOf(s: Vector[Int]): Int = if (s.length == 1) s(0) else dict(s)
      put(clear); emitted = 0 // data-code count restarts after a clear
      var cur = Vector(indices(0))
      for (k <- 1 until indices.length) {
        val ext = cur :+ indices(k)
        if (ext.length == 1 || dict.contains(ext)) cur = ext
        else {
          put(codeOf(cur))
          if (encNext < 4096) { dict(ext) = encNext; encNext += 1 }
          cur = Vector(indices(k))
        }
      }
      put(codeOf(cur))
      put(clear + 1) // EOI
      if (bits > 0) out.write((acc & 0xff).toInt)
      out.toByteArray
    }
    def container(w: Int, h: Int, minCode: Int, lzw: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      def w8(v: Int): Unit = bos.write(v & 0xff)
      def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
      bos.write("GIF89a".getBytes("US-ASCII"))
      w16(w); w16(h); w8(0x80 | (minCode - 1)); w8(0); w8(0)
      val n = 1 << minCode
      for (i <- 0 until n) { w8(i * 17 % 256); w8(i * 17 % 256); w8(i * 17 % 256) }
      w8(0x2c); w16(0); w16(0); w16(w); w16(h); w8(0)
      w8(minCode)
      var off = 0
      while (off < lzw.length) {
        val len = math.min(255, lzw.length - off)
        w8(len); bos.write(lzw, off, len); off += len
      }
      w8(0); w8(0x3b)
      bos.toByteArray
    }
    // KwKwK on its own: [1,1,1,1] compresses to (clear, 1, NEXT, 1, eoi)
    // where NEXT is a code the decoder has not defined yet
    val kw = Array(1, 1, 1, 1)
    val kwBlob = container(2, 2, 2, compress(kw, 2))
    val kwStats = GifCodec.decodeStats(kwBlob)
    val kwVal = 17L // palette entry 1
    assert(kwStats.contains(graft.multimodal.PngCodec.PixelStats(
      2, 2, 3, 12, 12 * kwVal, 12 * kwVal * kwVal)), s"got $kwStats")
    // a long repetitive stream: the dictionary grows through several
    // width bumps (3 -> 8 bits) before the pixels run out
    val reps = Array.tabulate(40 * 25)(i => (i / 7) % 4)
    val repBlob = container(40, 25, 2, compress(reps, 2))
    val expVals = reps.map(i => (i * 17 % 256).toLong)
    val repStats = GifCodec.decodeStats(repBlob)
    assert(repStats.contains(graft.multimodal.PngCodec.PixelStats(
      40, 25, 3, 3L * 1000, 3L * expVals.sum, 3L * expVals.map(v => v * v).sum)),
      s"got $repStats")
  }

  test("JpegCodec round-trips DC-only baseline JFIF through the real entropy layer") {
    import graft.multimodal.JpegCodec
    // dims spanning 1 block to a 4x3 block grid with ragged edges —
    // multi-block images exercise the differential DC predictor chain
    for ((w, h) <- Seq((8, 8), (1, 1), (28, 20), (17, 9), (8, 24), (25, 1))) {
      val bw = (w + 7) / 8
      val bh = (h + 7) / 8
      val value: Int => Int = b => (b * 53 + 11) % 256
      val blob = JpegCodec.encode(w, h, value)
      assert(graft.multimodal.ImageHeaders.decode(blob).contains((w, h, "jpeg")),
        s"($w x $h): header walk must see the SOF0 dims")
      // expected: every pixel takes its block's closed-form gray level
      var expSum = 0L
      var expSq = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val v = value((y / 8) * bw + (x / 8)).toLong
        expSum += v; expSq += v * v
      }
      val got = JpegCodec.decodeStats(blob)
      assert(got.contains(graft.multimodal.PngCodec.PixelStats(
        w, h, 1, w.toLong * h, expSum, expSq)), s"($w x $h) got $got")
      assert(bw * bh >= 1 && (bw > 1 || bh > 1 || (w <= 8 && h <= 8)))
    }
  }

  test("JpegCodec builds Huffman tables FROM the stream and walks unknown segments") {
    import graft.multimodal.JpegCodec
    // splice an APPn comment segment after SOI: the marker walk must
    // skip it; decode must be unchanged (tables still come from DHT)
    val blob = JpegCodec.encode(10, 6, b => 40 + b * 10)
    val app = Array[Byte](0xff.toByte, 0xe7.toByte, 0, 9) ++ "graft!!".getBytes
    val spliced = blob.take(2) ++ app ++ blob.drop(2)
    assert(JpegCodec.decodeStats(spliced) == JpegCodec.decodeStats(blob))
    // progressive SOF2 must be declined, not mis-decoded
    val prog = blob.clone()
    val sof = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sof + 1) = 0xc2.toByte
    assert(JpegCodec.decodeStats(prog).isEmpty)
  }

  // ----- independent test-side FULL baseline JPEG encoder: forward
  // DCT + quantization + zigzag + run-length Huffman (its own tables,
  // written into DHT) — the GifCodec compressing-encoder pattern, so
  // the decoder's general AC path is exercised by genuinely
  // independent math (fDCT here, iDCT there)
  private object TestJpegEncoder {
    val zig: Array[Int] = Array(
      0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
      12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
      35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
      58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)
    private val basis = Array.tabulate(8, 8) { (x, u) =>
      val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
      0.5 * c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
    }
    // DC: categories 0..11 at 4 bits; AC: EOB, ZRL and every (run
    // 0-15, size 1-10) symbol at 8 bits — canonical, all-ones unused
    private def codes(bits: Array[Int], vals: Seq[Int]): Map[Int, (Int, Int)] = {
      var code = 0; var vi = 0
      val out = Map.newBuilder[Int, (Int, Int)]
      for (l <- 1 to 16) {
        for (_ <- 0 until bits(l - 1)) {
          out += vals(vi) -> ((code, l)); code += 1; vi += 1
        }
        code <<= 1
      }
      out.result()
    }
    private val dcVals = (0 to 11)
    private val acVals = Seq(0x00, 0xf0) ++
      (for (r <- 0 to 15; s <- 1 to 10) yield (r << 4) | s)
    private val dcBits = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    private val acBits = Array(0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0)
    private val dcC = codes(dcBits, dcVals)
    private val acC = codes(acBits, acVals)

    def encode(w: Int, h: Int, pixel: (Int, Int) => Int,
               qdc: Int, qac: Int, restartInterval: Int = 0): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      def w8(v: Int): Unit = bos.write(v & 0xff)
      def w16(v: Int): Unit = { w8(v >> 8); w8(v) }
      def seg(m: Int, body: Array[Byte]): Unit = {
        w8(0xff); w8(m); w16(body.length + 2); bos.write(body)
      }
      w8(0xff); w8(0xd8)
      seg(0xdb, Array.tabulate[Byte](65)(i =>
        if (i == 0) 0 else if (i == 1) qdc.toByte else qac.toByte))
      seg(0xc0, Array[Byte](8, (h >> 8).toByte, h.toByte,
        (w >> 8).toByte, w.toByte, 1, 1, 0x11, 0))
      seg(0xc4, Array[Byte](0x00) ++ dcBits.map(_.toByte) ++ dcVals.map(_.toByte))
      seg(0xc4, Array[Byte](0x11) ++ acBits.map(_.toByte) ++ acVals.map(_.toByte))
      if (restartInterval > 0)
        seg(0xdd, Array[Byte]((restartInterval >> 8).toByte,
          (restartInterval & 0xff).toByte))
      seg(0xda, Array[Byte](1, 1, 0x01, 0, 63, 0))
      var acc = 0L; var nb = 0
      def put(code: Int, len: Int): Unit = {
        acc = (acc << len) | (code & ((1L << len) - 1)); nb += len
        while (nb >= 8) {
          val b = ((acc >>> (nb - 8)) & 0xff).toInt
          w8(b); if (b == 0xff) w8(0); nb -= 8
        }
      }
      val bw = (w + 7) / 8; val bh = (h + 7) / 8
      var pred = 0
      var nBlk = 0
      var rstN = 0
      for (by <- 0 until bh; bx <- 0 until bw) {
        if (restartInterval > 0 && nBlk > 0 && nBlk % restartInterval == 0) {
          // T.81 E.2.4: pad to the byte boundary, emit RSTn, reset DC
          if (nb > 0) { val pad = 8 - nb; put((1 << pad) - 1, pad) }
          w8(0xff); w8(0xd0 + (rstN & 7)); rstN += 1
          pred = 0
        }
        nBlk += 1
        pred = fdctAndEmit(pixel, bx * 8, by * 8, w, h, qdc, qac, pred, put)
      }
      if (nb > 0) { val pad = 8 - nb; put((1 << pad) - 1, pad) }
      w8(0xff); w8(0xd9)
      bos.toByteArray
    }

    /** Forward-DCT, quantize, and entropy-emit ONE 8x8 block sampled
      * from `pixel` at origin (ox, oy) with edge replication against
      * (maxW, maxH); returns the new DC predictor. Shared by the
      * grayscale and color test encoders.
      */
    private def fdctAndEmit(pixel: (Int, Int) => Int, ox: Int, oy: Int,
                            maxW: Int, maxH: Int, qdc: Int, qac: Int,
                            pred: Int, put: (Int, Int) => Unit): Int = {
      val f = Array.tabulate(8, 8) { (y, x) =>
        pixel(math.min(ox + x, maxW - 1), math.min(oy + y, maxH - 1)) - 128.0
      }
      val q = new Array[Int](64)
      for (u <- 0 until 8; v <- 0 until 8) {
        var s = 0.0
        for (x <- 0 until 8; y <- 0 until 8)
          s += basis(x)(u) * basis(y)(v) * f(y)(x)
        val qq = if (u == 0 && v == 0) qdc else qac
        q(v * 8 + u) = Math.round(s / qq).toInt
      }
      // DC diff
      val dc = q(0); val diff = dc - pred
      val sz = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      val (c, cl) = dcC(sz); put(c, cl)
      if (sz > 0) put(if (diff >= 0) diff else diff - 1 + (1 << sz), sz)
      // AC run-length over zigzag order
      var run = 0
      var lastNz = 0
      for (k <- 1 to 63) if (q(zig(k)) != 0) lastNz = k
      for (k <- 1 to lastNz) {
        val v = q(zig(k))
        if (v == 0) run += 1
        else {
          while (run > 15) { val (z, zl) = acC(0xf0); put(z, zl); run -= 16 }
          val asz = 32 - Integer.numberOfLeadingZeros(math.abs(v))
          assert(asz <= 10, s"test encoder AC size $asz out of table")
          val (ac, al) = acC((run << 4) | asz); put(ac, al)
          put(if (v >= 0) v else v - 1 + (1 << asz), asz)
          run = 0
        }
      }
      if (lastNz < 63) { val (e, el) = acC(0x00); put(e, el) }
      dc
    }

    /** Full AC-bearing baseline COLOR encoder: three planes (Y at
      * full resolution, Cb/Cr at the subsampled grid when sub420),
      * interleaved MCUs in SOF order, per-component DC predictors,
      * restart intervals counted in MCUs — the independent fDCT
      * counterpart of JpegCodec.decodeColorPixels' interleaved scan.
      * One shared quant table (q everywhere) and one shared DC/AC
      * Huffman table pair serve all three components.
      */
    def encodeColor(w: Int, h: Int,
                    yPix: (Int, Int) => Int,
                    cbPix: (Int, Int) => Int,
                    crPix: (Int, Int) => Int,
                    sub420: Boolean, q: Int = 1,
                    restartInterval: Int = 0): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      def w8(v: Int): Unit = bos.write(v & 0xff)
      def w16(v: Int): Unit = { w8(v >> 8); w8(v) }
      def seg(m: Int, body: Array[Byte]): Unit = {
        w8(0xff); w8(m); w16(body.length + 2); bos.write(body)
      }
      val hs = if (sub420) 2 else 1
      w8(0xff); w8(0xd8)
      seg(0xdb, Array.tabulate[Byte](65)(i => if (i == 0) 0 else q.toByte))
      seg(0xc0, Array[Byte](8, (h >> 8).toByte, h.toByte,
        (w >> 8).toByte, w.toByte, 3,
        1, ((hs << 4) | hs).toByte, 0, 2, 0x11, 0, 3, 0x11, 0))
      seg(0xc4, Array[Byte](0x00) ++ dcBits.map(_.toByte) ++ dcVals.map(_.toByte))
      seg(0xc4, Array[Byte](0x11) ++ acBits.map(_.toByte) ++ acVals.map(_.toByte))
      if (restartInterval > 0)
        seg(0xdd, Array[Byte]((restartInterval >> 8).toByte,
          (restartInterval & 0xff).toByte))
      // Td=0 / Ta=1 per component (the AC table is written with id 1)
      seg(0xda, Array[Byte](3, 1, 0x01, 2, 0x01, 3, 0x01, 0, 63, 0))
      var acc = 0L; var nb = 0
      def put(code: Int, len: Int): Unit = {
        acc = (acc << len) | (code & ((1L << len) - 1)); nb += len
        while (nb >= 8) {
          val b = ((acc >>> (nb - 8)) & 0xff).toInt
          w8(b); if (b == 0xff) w8(0); nb -= 8
        }
      }
      val mcuW = 8 * hs; val mcuH = 8 * hs
      val mcusX = (w + mcuW - 1) / mcuW
      val mcusY = (h + mcuH - 1) / mcuH
      val cw = (w + hs - 1) / hs
      val ch = (h + hs - 1) / hs
      val preds = Array(0, 0, 0)
      var nMcu = 0; var rstN = 0
      for (my <- 0 until mcusY; mx <- 0 until mcusX) {
        if (restartInterval > 0 && nMcu > 0 && nMcu % restartInterval == 0) {
          if (nb > 0) { val pad = 8 - nb; put((1 << pad) - 1, pad) }
          w8(0xff); w8(0xd0 + (rstN & 7)); rstN += 1
          preds(0) = 0; preds(1) = 0; preds(2) = 0
        }
        nMcu += 1
        for (vy <- 0 until hs; vx <- 0 until hs)
          preds(0) = fdctAndEmit(yPix, mx * mcuW + vx * 8, my * mcuH + vy * 8,
            w, h, q, q, preds(0), put)
        preds(1) = fdctAndEmit(cbPix, mx * 8, my * 8, cw, ch, q, q, preds(1), put)
        preds(2) = fdctAndEmit(crPix, mx * 8, my * 8, cw, ch, q, q, preds(2), put)
      }
      if (nb > 0) { val pad = 8 - nb; put((1 << pad) - 1, pad) }
      w8(0xff); w8(0xd9)
      bos.toByteArray
    }

    /** Baseline 4:2:2: luma 2x1, chroma 1x1 — MCU = 16x8, two luma
      * blocks then one of each chroma per MCU (T.81 interleave order).
      */
    def encodeColor422(w: Int, h: Int,
                       yPix: (Int, Int) => Int,
                       cbPix: (Int, Int) => Int,
                       crPix: (Int, Int) => Int,
                       q: Int = 1,
                       restartInterval: Int = 0): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      def w8(v: Int): Unit = bos.write(v & 0xff)
      def w16(v: Int): Unit = { w8(v >> 8); w8(v) }
      def seg(m: Int, body: Array[Byte]): Unit = {
        w8(0xff); w8(m); w16(body.length + 2); bos.write(body)
      }
      w8(0xff); w8(0xd8)
      seg(0xdb, Array.tabulate[Byte](65)(i => if (i == 0) 0 else q.toByte))
      seg(0xc0, Array[Byte](8, (h >> 8).toByte, h.toByte,
        (w >> 8).toByte, w.toByte, 3,
        1, 0x21, 0, 2, 0x11, 0, 3, 0x11, 0))
      seg(0xc4, Array[Byte](0x00) ++ dcBits.map(_.toByte) ++ dcVals.map(_.toByte))
      seg(0xc4, Array[Byte](0x11) ++ acBits.map(_.toByte) ++ acVals.map(_.toByte))
      if (restartInterval > 0)
        seg(0xdd, Array[Byte]((restartInterval >> 8).toByte,
          (restartInterval & 0xff).toByte))
      seg(0xda, Array[Byte](3, 1, 0x01, 2, 0x01, 3, 0x01, 0, 63, 0))
      var acc = 0L; var nb = 0
      def put(code: Int, len: Int): Unit = {
        acc = (acc << len) | (code & ((1L << len) - 1)); nb += len
        while (nb >= 8) {
          val b = ((acc >>> (nb - 8)) & 0xff).toInt
          w8(b); if (b == 0xff) w8(0); nb -= 8
        }
      }
      val mcusX = (w + 15) / 16
      val mcusY = (h + 7) / 8
      val cw = (w + 1) / 2
      val preds = Array(0, 0, 0)
      var nMcu = 0; var rstN = 0
      for (my <- 0 until mcusY; mx <- 0 until mcusX) {
        if (restartInterval > 0 && nMcu > 0 && nMcu % restartInterval == 0) {
          if (nb > 0) { val pad = 8 - nb; put((1 << pad) - 1, pad) }
          w8(0xff); w8(0xd0 + (rstN & 7)); rstN += 1
          preds(0) = 0; preds(1) = 0; preds(2) = 0
        }
        nMcu += 1
        preds(0) = fdctAndEmit(yPix, mx * 16, my * 8, w, h, q, q, preds(0), put)
        preds(0) = fdctAndEmit(yPix, mx * 16 + 8, my * 8, w, h, q, q, preds(0), put)
        preds(1) = fdctAndEmit(cbPix, mx * 8, my * 8, cw, h, q, q, preds(1), put)
        preds(2) = fdctAndEmit(crPix, mx * 8, my * 8, cw, h, q, q, preds(2), put)
      }
      if (nb > 0) { val pad = 8 - nb; put((1 << pad) - 1, pad) }
      w8(0xff); w8(0xd9)
      bos.toByteArray
    }
  }



  test("JpegCodec decodes AC-bearing baseline streams: fDCT round-trip within rounding bounds") {
    import graft.multimodal.JpegCodec
    // q=1 everywhere: coefficients are rounded exact-DCT values, so
    // |decoded - original| per pixel is bounded by the accumulated
    // coefficient rounding (~4 gray levels) — any zigzag, dequant,
    // run-length, or IDCT bug produces wild errors instead
    val rnd = new scala.util.Random(17)
    for (trial <- 0 until 6) {
      val w = 1 + rnd.nextInt(30)
      val h = 1 + rnd.nextInt(22)
      val img = Array.fill(h, w)(64 + rnd.nextInt(128))
      val blob = TestJpegEncoder.encode(w, h, (x, y) => img(y)(x), qdc = 1, qac = 1)
      val (dw, dh, px) = JpegCodec.decodeRaster(blob).getOrElse(
        fail(s"trial $trial ($w x $h): general decode returned None"))
      assert((dw, dh) == ((w, h)))
      var maxErr = 0
      for (y <- 0 until h; x <- 0 until w)
        maxErr = math.max(maxErr, math.abs(px(y * w + x) - img(y)(x)))
      assert(maxErr <= 4, s"trial $trial ($w x $h): max pixel error $maxErr")
      // and the streaming stats agree with the raster
      val st = JpegCodec.decodeStats(blob).get
      assert(st.sumVal == px.map(_.toLong).sum && st.nSamples == w.toLong * h)
    }
  }

  test("JpegCodec progressive == baseline: identical quantized image, identical decode") {
    import graft.multimodal.JpegCodec
    // both encoders quantize with the SAME fDCT+round, so the decoder
    // must reconstruct the IDENTICAL raster from the sequential and
    // the 6-scan progressive framings — any spectral-selection,
    // successive-approximation, EOB-run, or refinement bug breaks
    // byte equality, not a tolerance
    val rnd = new scala.util.Random(23)
    for (trial <- 0 until 6) {
      val w = 1 + rnd.nextInt(30)
      val h = 1 + rnd.nextInt(22)
      val img = Array.fill(h, w)(rnd.nextInt(256))
      val base = TestJpegEncoder.encode(w, h, (x, y) => img(y)(x),
        qdc = 1, qac = 1)
      val ssSplit = 1 + rnd.nextInt(20)
      val prog = ProgJpegEncoder.encode(w, h, (x, y) => img(y)(x),
        qdc = 1, qac = 1, ssSplit = ssSplit)
      val (bw1, bh1, p1) = JpegCodec.decodeRaster(base).getOrElse(
        fail(s"trial $trial: baseline None"))
      val (bw2, bh2, p2) = JpegCodec.decodeRaster(prog).getOrElse(
        fail(s"trial $trial ($w x $h split $ssSplit): progressive None"))
      assert((bw1, bh1) == ((bw2, bh2)))
      assert(p1.sameElements(p2),
        s"trial $trial ($w x $h split $ssSplit): rasters differ")
      val s1 = JpegCodec.decodeStats(base).get
      val s2 = JpegCodec.decodeStats(prog).get
      assert(s1 == s2, s"$s1 vs $s2")
    }
  }

  test("JpegCodec progressive: DC-only closed form, EOB-run aggregation, restarts") {
    import graft.multimodal.JpegCodec
    // flat 8x8 blocks: every AC band is empty, so the AC-first scans
    // are pure aggregated EOB runs and the decode lands on the exact
    // DC-only closed form the oracle replays
    val (w, h) = (40, 24) // 5x3 = 15 blocks
    def bval(bi: Int): Int = 32 + (bi * 13) % 200
    def pixel(x: Int, y: Int): Int = bval((y / 8) * 5 + x / 8)
    for (ri <- Seq(0, 1, 4, 15)) {
      val prog = ProgJpegEncoder.encode(w, h, pixel, qdc = 8, qac = 8,
        restartInterval = ri)
      val st = JpegCodec.decodeStats(prog).getOrElse(
        fail(s"ri=$ri: progressive DC-only decode returned None"))
      var sum = 0L; var sq = 0L
      for (bi <- 0 until 15) {
        val v = bval(bi).toLong
        sum += v * 64; sq += v * v * 64
      }
      assert(st == graft.multimodal.PngCodec.PixelStats(w, h, 1,
        w.toLong * h, sum, sq), s"ri=$ri: $st")
    }
  }

  test("JpegCodec progressive color 4:4:4 == baseline color of the same quantized image") {
    import graft.multimodal.JpegCodec
    val rnd = new scala.util.Random(29)
    for (trial <- 0 until 4) {
      val w = 1 + rnd.nextInt(26)
      val h = 1 + rnd.nextInt(20)
      val yP = Array.fill(h, w)(rnd.nextInt(256))
      val cbP = Array.fill(h, w)(rnd.nextInt(256))
      val crP = Array.fill(h, w)(rnd.nextInt(256))
      val base = TestJpegEncoder.encodeColor(w, h,
        (x, y) => yP(y)(x), (x, y) => cbP(y)(x), (x, y) => crP(y)(x),
        sub420 = false)
      val ssSplit = 1 + rnd.nextInt(20)
      val prog = ProgJpegEncoder.encodeColor(w, h,
        (x, y) => yP(y)(x), (x, y) => cbP(y)(x), (x, y) => crP(y)(x),
        ssSplit = ssSplit)
      val (w1, h1, p1) = JpegCodec.decodeColorRaster(base).getOrElse(
        fail(s"trial $trial: baseline color None"))
      val (w2, h2, p2) = JpegCodec.decodeColorRaster(prog).getOrElse(
        fail(s"trial $trial ($w x $h split $ssSplit): progressive color None"))
      assert((w1, h1) == ((w2, h2)))
      assert(p1.sameElements(p2),
        s"trial $trial ($w x $h split $ssSplit): color rasters differ")
      // stats sniff the SOF2 stream through the same chain
      val s1 = JpegCodec.decodeStats(base).get
      val s2 = JpegCodec.decodeStats(prog).get
      assert(s1 == s2 && s2.channels == 3, s"$s1 vs $s2")
    }
    // interleaved DC restart: flat color blocks, closed-form exact
    val flat = ProgJpegEncoder.encodeColor(32, 16,
      (x, _) => 40 + (x / 8) * 7, (_, _) => 100, (_, _) => 200,
      q = 8, restartInterval = 3)
    assert(JpegCodec.decodeStats(flat).isDefined,
      "restarting interleaved DC scan must decode")
  }

  test("JpegCodec progressive 4:2:0 == baseline 4:2:0 of the same quantized image") {
    import graft.multimodal.JpegCodec
    // subsampled progressive: luma 2x2 on the MCU-padded interleaved
    // grid (the DC chain runs through padding blocks; AC scans skip
    // them), chroma on the half-resolution grid; decode must equal
    // the baseline 4:2:0 framing of the SAME quantized components —
    // non-MCU-aligned dims exercise the padding-block rules
    val rnd = new scala.util.Random(31)
    for (trial <- 0 until 4) {
      val w = 1 + rnd.nextInt(40) // frequently not 16-aligned
      val h = 1 + rnd.nextInt(36)
      val yP = Array.fill(h, w)(rnd.nextInt(256))
      val cw = (w + 1) / 2; val ch = (h + 1) / 2
      val cbP = Array.fill(ch, cw)(rnd.nextInt(256))
      val crP = Array.fill(ch, cw)(rnd.nextInt(256))
      val base = TestJpegEncoder.encodeColor(w, h,
        (x, y) => yP(y)(x), (x, y) => cbP(y)(x), (x, y) => crP(y)(x),
        sub420 = true)
      val ssSplit = 1 + rnd.nextInt(20)
      val prog = ProgJpegEncoder.encodeColor(w, h,
        (x, y) => yP(y)(x), (x, y) => cbP(y)(x), (x, y) => crP(y)(x),
        ssSplit = ssSplit, sub420 = true)
      val (w1, h1, p1) = JpegCodec.decodeColorRaster(base).getOrElse(
        fail(s"trial $trial: baseline 420 None"))
      val (w2, h2, p2) = JpegCodec.decodeColorRaster(prog).getOrElse(
        fail(s"trial $trial ($w x $h split $ssSplit): progressive 420 None"))
      assert((w1, h1) == ((w2, h2)))
      assert(p1.sameElements(p2),
        s"trial $trial ($w x $h split $ssSplit): 4:2:0 rasters differ")
      assert(JpegCodec.decodeStats(prog) == JpegCodec.decodeStats(base))
    }
  }

  test("JpegCodec progressive 4:2:2 == baseline 4:2:2 of the same quantized image") {
    import graft.multimodal.JpegCodec
    // the codec matrix's last untested sampling geometry (r19; VERDICT
    // r18 #5/#8): luma 2x1, chroma at half HORIZONTAL resolution only.
    // Anchor 1: banded block-constant chroma at q=1 quantizes
    // losslessly, so the 4:2:2 decode must EQUAL the 4:4:4 decode of
    // the nearest-replicated full-res chroma — and the band geometry
    // (16-px horizontal, 8-px vertical periods) distinguishes the
    // correct (x/2, y) chroma mapping from a 2x2-path mixup, which
    // would misplace the vertical band boundary.
    locally {
      val w = 64; val h = 16
      def cbH(x: Int, y: Int) = 40 + 30 * ((x / 8) % 2) + 50 * ((y / 8) % 2)
      def crH(x: Int, y: Int) = 200 - 60 * ((x / 8) % 2)
      val base422 = TestJpegEncoder.encodeColor422(w, h,
        (_, _) => 90, cbH, crH)
      val base444 = TestJpegEncoder.encodeColor(w, h,
        (_, _) => 90, (x, y) => cbH(x / 2, y), (x, y) => crH(x / 2, y),
        sub420 = false)
      val (w1, h1, p1) = JpegCodec.decodeColorRaster(base422).getOrElse(
        fail("banded baseline 4:2:2 did not decode"))
      val (w4, h4, p4) = JpegCodec.decodeColorRaster(base444).getOrElse(
        fail("banded baseline 4:4:4 did not decode"))
      assert((w1, h1) == ((w, h)) && (w4, h4) == ((w, h)))
      assert(p1.sameElements(p4),
        "4:2:2 decode must equal the replicated-chroma 4:4:4 decode")
    }
    // Anchor 2: progressive framing equals the baseline framing of
    // the SAME quantized components, across non-MCU-aligned dims and
    // spectral splits
    val rnd = new scala.util.Random(37)
    for (trial <- 0 until 4) {
      val w = 1 + rnd.nextInt(40) // frequently not 16-aligned
      val h = 1 + rnd.nextInt(28)
      val yP = Array.fill(h, w)(rnd.nextInt(256))
      val cw = (w + 1) / 2
      val cbP = Array.fill(h, cw)(rnd.nextInt(256))
      val crP = Array.fill(h, cw)(rnd.nextInt(256))
      val base = TestJpegEncoder.encodeColor422(w, h,
        (x, y) => yP(y)(x), (x, y) => cbP(y)(x), (x, y) => crP(y)(x))
      val ssSplit = 1 + rnd.nextInt(20)
      val prog = ProgJpegEncoder.encodeColor422(w, h,
        (x, y) => yP(y)(x), (x, y) => cbP(y)(x), (x, y) => crP(y)(x),
        ssSplit = ssSplit)
      val (w1, h1, p1) = JpegCodec.decodeColorRaster(base).getOrElse(
        fail(s"trial $trial ($w x $h): baseline 422 None"))
      val (w2, h2, p2) = JpegCodec.decodeColorRaster(prog).getOrElse(
        fail(s"trial $trial ($w x $h split $ssSplit): progressive 422 None"))
      assert((w1, h1) == ((w, h)) && (w2, h2) == ((w, h)))
      assert(p1.sameElements(p2),
        s"trial $trial ($w x $h split $ssSplit): 4:2:2 rasters differ")
      assert(JpegCodec.decodeStats(prog) == JpegCodec.decodeStats(base))
    }
    // restart markers through the 2x1 interleave
    val rst = TestJpegEncoder.encodeColor422(48, 8,
      (x, _) => (x * 5) % 256, (_, _) => 30, (_, _) => 220,
      restartInterval = 2)
    assert(JpegCodec.decodeColorRaster(rst).isDefined,
      "4:2:2 with restart markers must decode")
  }

  test("JpegCodec progressive: garbage, truncation, and fuzz never throw") {
    import graft.multimodal.JpegCodec
    val prog = ProgJpegEncoder.encode(24, 16,
      (x, y) => (x * 7 + y * 11) % 256, qdc = 1, qac = 1)
    assert(JpegCodec.decodeStats(prog).isDefined)
    // truncations at every growth point: None or a well-formed result,
    // never a throw
    var i = 4
    while (i < prog.length) {
      JpegCodec.decodeStats(java.util.Arrays.copyOf(prog, i))
      i += math.max(1, prog.length / 37)
    }
    assert(JpegCodec.decodeStats(java.util.Arrays.copyOf(prog,
      prog.length - 3)).isEmpty, "missing EOI must refuse")
    // bit flips across the scan data
    val rnd = new scala.util.Random(41)
    for (_ <- 0 until 200) {
      val fz = prog.clone()
      val at = rnd.nextInt(fz.length - 4) + 4
      fz(at) = (fz(at) ^ (1 << rnd.nextInt(8))).toByte
      JpegCodec.decodeStats(fz) // may be Some or None; must not throw
    }
  }

  test("JpegCodec DRI: DC-only restart streams round-trip exactly at every interval") {
    import graft.multimodal.{JpegCodec, PngCodec}
    // a 4x3-block gradient (distinct per-block values) so a predictor
    // that fails to reset, or a reader that drops pre-marker bits or
    // misaligns after the marker, corrupts later blocks loudly
    val (w, h) = (32, 24)
    val bw = (w + 7) / 8
    val value: Int => Int = b => (17 + b * 19) % 256
    for (interval <- Seq(1, 2, 3, 5, 7, 11, 12)) {
      val blob = JpegCodec.encode(w, h, value, restartInterval = interval)
      val (dw, dh, px) = JpegCodec.decodeRaster(blob).getOrElse(
        fail(s"interval=$interval: decode returned None"))
      assert((dw, dh) == ((w, h)))
      for (y <- 0 until h; x <- 0 until w)
        assert(px(y * w + x) == value((y / 8) * bw + (x / 8)),
          s"interval=$interval pixel ($x,$y)")
      var s = 0L; var sq = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val v = value((y / 8) * bw + (x / 8)).toLong; s += v; sq += v * v
      }
      assert(JpegCodec.decodeStats(blob)
        .contains(PngCodec.PixelStats(w, h, 1, w.toLong * h, s, sq)))
    }
    // a declared DRI whose markers are absent must fail cleanly, not
    // decode garbage: splice the no-restart scan after a DRI header
    val withDri = JpegCodec.encode(w, h, value, restartInterval = 2)
    val noRst = JpegCodec.encode(w, h, value)
    // find both SOS offsets and graft plain scan onto DRI headers
    def sosOff(b: Array[Byte]): Int = {
      var i = 2
      while (!((b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0xda)) i += 1
      i
    }
    val spliced = withDri.take(sosOff(withDri)) ++ noRst.drop(sosOff(noRst))
    assert(JpegCodec.decodeStats(spliced).isEmpty,
      "mis-declared DRI (no markers in scan) must return None")
  }

  // -------------------------- progressive JPEG restarts (DRI/RSTn)

  test("JpegCodec progressive DRI: AC-bearing restart streams == the baseline twin") {
    import graft.multimodal.JpegCodec
    // real crawl JPEGs carry restart intervals; the r17 matrix gated
    // restarts only on DC-only progressive fixtures. Here every scan
    // family restarts mid-stream on AC-BEARING content: random
    // images, 6-scan progressive (DC first/refine, split AC
    // first/refine bands — EOB runs MUST terminate at each restart
    // boundary) vs the independent baseline encoder's framing of the
    // SAME quantized coefficients, rasters byte-identical.
    val rnd = new scala.util.Random(37)
    for (trial <- 0 until 6) {
      val w = 9 + rnd.nextInt(28)
      val h = 9 + rnd.nextInt(20)
      val interval = 1 + rnd.nextInt(5)
      val ssSplit = 1 + rnd.nextInt(20)
      val img = Array.fill(h, w)(rnd.nextInt(256))
      val base = TestJpegEncoder.encode(w, h, (x, y) => img(y)(x),
        qdc = 1, qac = 1)
      val prog = ProgJpegEncoder.encode(w, h, (x, y) => img(y)(x),
        qdc = 1, qac = 1, ssSplit = ssSplit, restartInterval = interval)
      val (w1, h1, p1) = JpegCodec.decodeRaster(base).getOrElse(
        fail(s"trial $trial: baseline None"))
      val (w2, h2, p2) = JpegCodec.decodeRaster(prog).getOrElse(fail(
        s"trial $trial (${w}x$h dri=$interval split=$ssSplit): prog None"))
      assert((w1, h1) == ((w2, h2)))
      assert(p1.sameElements(p2),
        s"trial $trial (${w}x$h dri=$interval split=$ssSplit): diverged")
      assert(JpegCodec.decodeStats(prog).get == JpegCodec.decodeStats(base).get)
    }
  }

  test("JpegCodec progressive color DRI: 4:4:4 and 4:2:0 restart streams == baseline") {
    import graft.multimodal.JpegCodec
    val rnd = new scala.util.Random(41)
    for (sub420 <- Seq(false, true); interval <- Seq(1, 3)) {
      val w = 17 + rnd.nextInt(20)
      val h = 11 + rnd.nextInt(14)
      val yP = Array.fill(h, w)(rnd.nextInt(256))
      val cw = if (sub420) (w + 1) / 2 else w
      val ch = if (sub420) (h + 1) / 2 else h
      val cbP = Array.fill(ch, cw)(rnd.nextInt(256))
      val crP = Array.fill(ch, cw)(rnd.nextInt(256))
      val base = TestJpegEncoder.encodeColor(w, h,
        (x, y) => yP(y)(x), (x, y) => cbP(y)(x), (x, y) => crP(y)(x),
        sub420 = sub420)
      val prog = ProgJpegEncoder.encodeColor(w, h,
        (x, y) => yP(y)(x), (x, y) => cbP(y)(x), (x, y) => crP(y)(x),
        ssSplit = 1 + rnd.nextInt(20), restartInterval = interval,
        sub420 = sub420)
      val a = JpegCodec.decodeColorRaster(base).getOrElse(
        fail(s"sub420=$sub420 dri=$interval: baseline None"))
      val b = JpegCodec.decodeColorRaster(prog).getOrElse(
        fail(s"sub420=$sub420 dri=$interval: progressive None"))
      assert(a._1 == b._1 && a._2 == b._2 && a._3.sameElements(b._3),
        s"sub420=$sub420 dri=$interval (${w}x$h): color rasters diverged")
    }
  }


  test("JpegCodec DRI: AC-bearing restart streams from the independent fDCT encoder") {
    import graft.multimodal.JpegCodec
    val rnd = new scala.util.Random(23)
    for (trial <- 0 until 4) {
      val w = 9 + rnd.nextInt(24)
      val h = 9 + rnd.nextInt(16)
      val interval = 1 + rnd.nextInt(4)
      val img = Array.fill(h, w)(64 + rnd.nextInt(128))
      val blob = TestJpegEncoder.encode(w, h, (x, y) => img(y)(x),
        qdc = 1, qac = 1, restartInterval = interval)
      val (dw, dh, px) = JpegCodec.decodeRaster(blob).getOrElse(
        fail(s"trial $trial ($w x $h interval=$interval): decode returned None"))
      assert((dw, dh) == ((w, h)))
      var maxErr = 0
      for (y <- 0 until h; x <- 0 until w)
        maxErr = math.max(maxErr, math.abs(px(y * w + x) - img(y)(x)))
      assert(maxErr <= 4,
        s"trial $trial ($w x $h interval=$interval): max pixel error $maxErr")
    }
  }

  test("JpegCodec color: DC-only 4:4:4 / 4:2:0 round-trips the exact fixed-point transform") {
    import graft.multimodal.JpegCodec
    // independent replay of the documented closed form: per-plane
    // block value -> fixed-point JFIF YCbCr->RGB (floorDiv keeps it
    // pure integer — the same arithmetic the SQL twin uses)
    def xform(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
      def cl(v: Long) = math.max(0L, math.min(255L, v)).toInt
      (cl(Math.floorDiv(65536L * y + 91881L * (cr - 128) + 32768L, 65536L)),
        cl(Math.floorDiv(65536L * y - 22554L * (cb - 128) - 46802L * (cr - 128) + 32768L, 65536L)),
        cl(Math.floorDiv(65536L * y + 116130L * (cb - 128) + 32768L, 65536L)))
    }
    val yF: Int => Int = b => (13 + 29 * b) % 256
    val cbF: Int => Int = b => (211 + 17 * b) % 256
    val crF: Int => Int = b => (97 + 23 * b) % 256
    for (sub420 <- Seq(false, true);
         (w, h) <- Seq((1, 1), (8, 8), (17, 9), (24, 20), (33, 18))) {
      val blob = JpegCodec.encodeColor(w, h, yF, cbF, crF, sub420)
      val (dw, dh, px) = JpegCodec.decodeColorRaster(blob).getOrElse(
        fail(s"color decode None: sub420=$sub420 ${w}x$h"))
      assert((dw, dh) == ((w, h)))
      var s = 0L; var sq = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val (yv, cbv, crv) =
          if (sub420) {
            val mcusX = (w + 15) / 16
            (yF((y / 8) * (2 * mcusX) + (x / 8)),
              cbF((y / 16) * mcusX + (x / 16)), crF((y / 16) * mcusX + (x / 16)))
          } else {
            val bw = (w + 7) / 8
            val i = (y / 8) * bw + (x / 8)
            (yF(i), cbF(i), crF(i))
          }
        val (er, eg, eb) = xform(yv, cbv, crv)
        val i = (y * w + x) * 3
        assert(px(i) == er && px(i + 1) == eg && px(i + 2) == eb,
          s"pixel ($x,$y) sub420=$sub420 ${w}x$h: got (${px(i)},${px(i + 1)},${px(i + 2)}) want ($er,$eg,$eb)")
        s += er.toLong + eg + eb
        sq += er.toLong * er + eg.toLong * eg + eb.toLong * eb
      }
      // streaming stats agree with the raster: 3 channels, 3wh samples
      val st = JpegCodec.decodeStats(blob).get
      assert(st.channels == 3 && st.nSamples == 3L * w * h &&
        st.sumVal == s && st.sumSq == sq, s"stats sub420=$sub420 ${w}x$h: $st")
    }
  }

  test("JpegCodec color AC: independent-fDCT 4:4:4 / 4:2:0 streams decode within rounding bounds") {
    import graft.multimodal.JpegCodec
    // q=1 color streams from the test-side forward-DCT encoder: every
    // coefficient (DC and AC, all three planes) flows through the real
    // interleaved entropy layer, so a zigzag, dequant, predictor-chain,
    // upsampling, or IDCT bug in the color path produces wild errors.
    // Per-plane reconstruction error is bounded by coefficient
    // rounding (~4 levels, the grayscale AC bound); the fixed-point
    // transform amplifies chroma error by <= 1.772, so per-channel
    // RGB error stays under ~4 + 1.772*4 + 1 — asserted at 12.
    def xform(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
      def cl(v: Long) = math.max(0L, math.min(255L, v)).toInt
      (cl(Math.floorDiv(65536L * y + 91881L * (cr - 128) + 32768L, 65536L)),
        cl(Math.floorDiv(65536L * y - 22554L * (cb - 128) - 46802L * (cr - 128) + 32768L, 65536L)),
        cl(Math.floorDiv(65536L * y + 116130L * (cb - 128) + 32768L, 65536L)))
    }
    val rnd = new scala.util.Random(29)
    for (sub420 <- Seq(false, true); trial <- 0 until 3) {
      val w = 1 + rnd.nextInt(34)
      val h = 1 + rnd.nextInt(26)
      val hs = if (sub420) 2 else 1
      val cw = (w + hs - 1) / hs
      val ch = (h + hs - 1) / hs
      // amplitudes bounded so every coefficient fits the test table's
      // size-10 AC categories (|sample-128| <= 50 -> |coef| <= 400)
      val yP = Array.fill(h, w)(78 + rnd.nextInt(101))
      val cbP = Array.fill(ch, cw)(78 + rnd.nextInt(101))
      val crP = Array.fill(ch, cw)(78 + rnd.nextInt(101))
      val blob = TestJpegEncoder.encodeColor(w, h,
        (x, y) => yP(y)(x), (x, y) => cbP(y)(x), (x, y) => crP(y)(x), sub420)
      val (dw, dh, px) = JpegCodec.decodeColorRaster(blob).getOrElse(
        fail(s"color AC decode None: sub420=$sub420 trial=$trial ${w}x$h"))
      assert((dw, dh) == ((w, h)))
      var maxErr = 0
      for (y <- 0 until h; x <- 0 until w) {
        val (er, eg, eb) = xform(yP(y)(x), cbP(y / hs)(x / hs), crP(y / hs)(x / hs))
        val i = (y * w + x) * 3
        maxErr = math.max(maxErr, math.max(math.abs(px(i) - er),
          math.max(math.abs(px(i + 1) - eg), math.abs(px(i + 2) - eb))))
      }
      assert(maxErr <= 12,
        s"sub420=$sub420 trial=$trial ${w}x$h: max channel error $maxErr")
      // streaming stats agree with the raster
      val st = JpegCodec.decodeStats(blob).get
      assert(st.channels == 3 && st.nSamples == 3L * w * h)
      var s = 0L
      for (i <- px.indices) s += px(i)
      assert(st.sumVal == s, s"stats/raster sum drift sub420=$sub420")
    }
    // AC-bearing color DRI: the restart stream must decode identically
    // to the plain stream at several intervals (predictor resets and
    // MCU-counted markers on the full interleaved AC path)
    val w = 33; val h = 18
    val yP = Array.fill(h, w)(78 + rnd.nextInt(101))
    val cbP = Array.fill(h, w)(78 + rnd.nextInt(101))
    val crP = Array.fill(h, w)(78 + rnd.nextInt(101))
    for (sub420 <- Seq(false, true); interval <- Seq(1, 2, 3)) {
      val hs = if (sub420) 2 else 1
      def cp(p: Array[Array[Int]]): (Int, Int) => Int = (x, y) => p(y)(x)
      val plain = TestJpegEncoder.encodeColor(w, h, cp(yP), cp(cbP), cp(crP), sub420)
      val rst = TestJpegEncoder.encodeColor(w, h, cp(yP), cp(cbP), cp(crP),
        sub420, restartInterval = interval)
      require(hs >= 1)
      val a = JpegCodec.decodeColorRaster(plain).get
      val b = JpegCodec.decodeColorRaster(rst).getOrElse(
        fail(s"AC color DRI decode None: sub420=$sub420 interval=$interval"))
      assert(a._1 == b._1 && a._2 == b._2 && a._3.sameElements(b._3),
        s"sub420=$sub420 interval=$interval: AC restart stream diverged")
    }
  }

  test("JpegCodec color DRI: restart streams decode identically; fuzz never throws") {
    import graft.multimodal.JpegCodec
    val yF: Int => Int = b => (7 + 31 * b) % 256
    val cbF: Int => Int = b => (151 + 13 * b) % 256
    val crF: Int => Int = b => (61 + 41 * b) % 256
    for (sub420 <- Seq(false, true); interval <- Seq(1, 2, 3)) {
      val (w, h) = (33, 18)
      val plain = JpegCodec.encodeColor(w, h, yF, cbF, crF, sub420)
      val rst = JpegCodec.encodeColor(w, h, yF, cbF, crF, sub420,
        restartInterval = interval)
      val a = JpegCodec.decodeColorRaster(plain).get
      val b = JpegCodec.decodeColorRaster(rst).getOrElse(
        fail(s"DRI color decode None: sub420=$sub420 interval=$interval"))
      assert(a._1 == b._1 && a._2 == b._2 && a._3.sameElements(b._3),
        s"sub420=$sub420 interval=$interval: restart stream diverged")
    }
    val good = JpegCodec.encodeColor(17, 9, yF, cbF, crF, subsample420 = true)
    for (cut <- 1 until good.length by 7) JpegCodec.decodeStats(good.take(cut))
    val rnd = new scala.util.Random(71)
    for (_ <- 1 to 200) {
      val m = good.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      JpegCodec.decodeStats(m) // any result, never a throw
    }
  }

  test("JpegCodec general path: coarse quantization still decodes consistently") {
    import graft.multimodal.JpegCodec
    // a smooth gradient under q=8: reconstruction error is bounded by
    // ~half the quant step per coefficient; the mean must survive
    val (w, h) = (24, 16)
    def pix(x: Int, y: Int): Int = 60 + 4 * x + 3 * y
    val blob = TestJpegEncoder.encode(w, h, pix, qdc = 8, qac = 8)
    val (_, _, px) = JpegCodec.decodeRaster(blob).get
    val origMean = (for (y <- 0 until h; x <- 0 until w) yield pix(x, y)).sum.toDouble / (w * h)
    val decMean = px.map(_.toDouble).sum / (w * h)
    assert(math.abs(decMean - origMean) < 2.0,
      s"mean drifted: $decMean vs $origMean")
    var maxErr = 0
    for (y <- 0 until h; x <- 0 until w)
      maxErr = math.max(maxErr, math.abs(px(y * w + x) - pix(x, y)))
    assert(maxErr <= 24, s"max error $maxErr exceeds the q=8 bound")
  }

  test("JpegCodec.decodeStats rejects garbage, truncation, and fuzzed payloads") {
    import graft.multimodal.JpegCodec
    val good = JpegCodec.encode(12, 10, b => (b * 77) % 256)
    assert(JpegCodec.decodeStats(good).isDefined)
    assert(JpegCodec.decodeStats(null).isEmpty)
    assert(JpegCodec.decodeStats(Array.emptyByteArray).isEmpty)
    assert(JpegCodec.decodeStats("definitely not a jpeg".getBytes).isEmpty)
    for (cut <- 1 until good.length by 5) {
      JpegCodec.decodeStats(good.take(cut)) // must not throw
    }
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val m = good.clone()
      m(rnd.nextInt(m.length)) = (rnd.nextInt(256)).toByte
      JpegCodec.decodeStats(m) // any result, but never a throw
    }
  }

  test("decodePixelStats sniffs JPEG alongside PNG and GIF") {
    import graft.multimodal.{BinaryMeta, GifCodec, JpegCodec, PngCodec}
    import spark.implicits._
    val blobs = Seq(
      (1L, PngCodec.encode(4, 3, 1, s => ((s * 7) % 256).toInt)),
      (2L, GifCodec.encode(3, 2, s => (s * 5) % 256)),
      (3L, JpegCodec.encode(9, 9, b => 100 + b))).toDF("id", "blob")
    val out = BinaryMeta.decodePixelStats(blobs, "id")
      .orderBy("id")
      .select("id", "channels", "n_samples")
      .as[(Long, Int, Long)].collect().toSeq
    assert(out == Seq((1L, 1, 12L), (2L, 3, 18L), (3L, 1, 81L)))
  }

  test("GifCodec.decodeStats rejects garbage, truncation, and fuzzed payloads") {
    import graft.multimodal.GifCodec
    val good = GifCodec.encode(9, 7, s => (s * 13) % 256)
    assert(GifCodec.decodeStats(good).isDefined)
    assert(GifCodec.decodeStats(null).isEmpty)
    assert(GifCodec.decodeStats(Array.emptyByteArray).isEmpty)
    assert(GifCodec.decodeStats("not a gif at all".getBytes).isEmpty)
    // every truncation point either fails cleanly or (before the image
    // data) never returns stats — no throw, no hang
    for (cut <- 1 until good.length by 7) {
      GifCodec.decodeStats(good.take(cut)) // must not throw
    }
    // deterministic byte-flip fuzz across the whole payload
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val m = good.clone()
      m(rnd.nextInt(m.length)) = (rnd.nextInt(256)).toByte
      GifCodec.decodeStats(m) // any result, but never a throw
    }
  }

  test("pooled features: cell sums reconcile with whole-image stats; vectors feed ANN") {
    import graft.multimodal.{BinaryMeta, PngCodec}
    val ids = (0L until 24L).toDF("doc_id")
    val blobs = BinaryMeta.syntheticPngBlobs(ids, "doc_id").persist()
    val pooled = BinaryMeta.extractPooledFeatures(blobs, "id", gy = 2, gx = 2).persist()
    // per image: cell pixel counts sum to w*h and cell sums to the
    // whole-image sample sum (the decodeStats cross-check)
    val byImage = pooled.groupBy("id")
      .agg(F.sum("n_px").as("n"), F.sum("sum_val").as("s"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    blobs.collect().foreach { r =>
      val id = r.getLong(0)
      val st = PngCodec.decodeStats(r.getAs[Array[Byte]](1)).get
      assert(byImage(id)._1 == st.width.toLong * st.height, s"pixel count for $id")
      assert(byImage(id)._2 == st.sumVal, s"sample sum for $id")
    }
    // the dense vector form is ANN-ready: identical images (same dims,
    // same closed form) give cosine-1 self-similar top matches
    val vecs = BinaryMeta.pooledVector(pooled, gy = 2, gx = 2)
    assert(vecs.count() == 24)
    val top = graft.similarity.Ann.cosineTopK(
      vecs.where(F.col("id") < 2).withColumnRenamed("feature", "embedding"),
      "id", "embedding",
      vecs.withColumnRenamed("feature", "embedding"), "id", "embedding", k = 3)
    assert(top.where(F.col("rank") === 1).count() == 2)
    blobs.unpersist(); pooled.unpersist()
  }

  test("audio time bins reconcile with whole-clip stats; binning is duration-proportional") {
    import graft.multimodal.WavCodec
    val blob = WavCodec.encode(8000, 2, nFrames = 103, s => ((s * 13) % 400 - 200).toInt)
    val bins = WavCodec.decodeTimeBins(blob, nBins = 4).get
    val stats = WavCodec.decodeStats(blob).get
    assert(bins.map(_.nFrames).sum == stats.nFrames)
    assert(bins.map(_.nSamples).sum == stats.nSamples)
    assert(bins.map(_.sumVal).sum == stats.sumVal)
    // proportional grid: 103 frames over 4 bins -> 26/26/26/25 (floor
    // binning f*4/103), order preserved
    assert(bins.map(b => (b.bin, b.nFrames)) == Seq((0, 26L), (1, 26L), (2, 26L), (3, 25L)),
      s"got ${bins.map(b => (b.bin, b.nFrames))}")
    // clip shorter than the grid still maps onto it (empty bins skipped)
    val tiny = WavCodec.encode(8000, 1, nFrames = 2, _ => 5)
    val tb = WavCodec.decodeTimeBins(tiny, nBins = 4).get
    assert(tb.map(_.bin) == Seq(0, 2) && tb.forall(_.nFrames == 1))
  }

  test("video frame pooling reconciles with whole-frame stats and inverts DIB row order") {
    import graft.multimodal.AviCodec
    // asymmetric value function: top row bright, bottom dark — a
    // decoder that forgets the bottom-up DIB inversion puts the bright
    // mass in the wrong grid cell
    val w = 4; val h = 4
    val blob = AviCodec.encode(w, h, nFrames = 3, usPerFrame = 1000L,
      (f, s) => { val y = (s / 3) / w; if (y < 2) 200 + f else 10 + f })
    val pooled = AviCodec.decodeFramePooled(blob, stride = 1, gy = 2, gx = 2).get
    val stats = AviCodec.decodeFrameStats(blob, stride = 1).get
    for (f <- 0 until 3) {
      val cells = pooled.filter(_.frameNo == f)
      assert(cells.map(_.nSamples).sum == stats(f).nSamples)
      assert(cells.map(_.sumVal).sum == stats(f).sumVal)
      // canonical top rows (cy=0) carry the bright samples
      val bright = cells.filter(_.cy == 0).map(_.sumVal).sum
      val dark = cells.filter(_.cy == 1).map(_.sumVal).sum
      assert(bright == (200L + f) * 2 * w * 3 && dark == (10L + f) * 2 * w * 3,
        s"frame $f: DIB bottom-up rows not mapped to canonical coords")
    }
  }

  test("PngCodec.decodeStats rejects garbage, truncation, and unsupported layouts") {
    import graft.multimodal.PngCodec
    val good = PngCodec.encode(5, 5, 3, s => (s % 251).toInt)
    assert(PngCodec.decodeStats(good).isDefined)
    assert(PngCodec.decodeStats(null).isEmpty)
    assert(PngCodec.decodeStats(Array.emptyByteArray).isEmpty)
    assert(PngCodec.decodeStats("not a png".getBytes).isEmpty)
    // truncate inside IDAT: chunk layout breaks -> None, no throw
    assert(PngCodec.decodeStats(good.take(good.length - 13)).isEmpty)
    // corrupt the zlib stream body (flip a byte INSIDE the deflate
    // data, located via the IDAT tag — not the unvalidated chunk CRC)
    val idatAt = good.sliding(4).indexWhere(_.sameElements("IDAT".getBytes))
    val corrupt = good.clone()
    corrupt(idatAt + 10) = (corrupt(idatAt + 10) ^ 0x5a).toByte
    assert(PngCodec.decodeStats(corrupt).isEmpty ||
      PngCodec.decodeStats(corrupt) != PngCodec.decodeStats(good))
    // 16-bit depth and interlace are declared unsupported -> None
    val deep = good.clone(); deep(24) = 16 // IHDR bit-depth byte
    assert(PngCodec.decodeStats(deep).isEmpty)
    val inter = good.clone(); inter(28) = 1 // IHDR interlace byte
    assert(PngCodec.decodeStats(inter).isEmpty)
    // FDICT zlib header (0x78 0x20 — valid FCHECK, preset-dictionary
    // bit set): the inflater can never progress without a dictionary
    // we will never feed; must return None promptly, NOT spin forever
    // (this hung the decode loop before the n==0 && !finished guard)
    val fdict = good.clone()
    fdict(idatAt + 4) = 0x78.toByte; fdict(idatAt + 5) = 0x20.toByte
    assert(PngCodec.decodeStats(fdict).isEmpty)
    // over-long inflate: shrink the claimed IHDR height so the stream
    // inflates to MORE than height*(1+stride) — the doc contract says
    // None, never plausible stats over a prefix
    val shrunk = good.clone(); shrunk(23) = 4 // height 5 -> 4
    assert(PngCodec.decodeStats(shrunk).isEmpty)
  }

  test("PngCodec.resizeStats: nearest-neighbor on the real decoded raster") {
    import graft.multimodal.PngCodec
    val value: Long => Int = s => ((s * 31 + 7) % 256).toInt
    for ((w, h, ch, tw, th) <- Seq((8, 6, 3, 4, 3), (16, 12, 1, 4, 4),
                                   (3, 2, 3, 7, 5), (5, 5, 1, 5, 5))) {
      val blob = PngCodec.encode(w, h, ch, value)
      // independent reference: sample the closed form at the
      // nearest-neighbor source indices, no codec involved
      val vals = for {
        y <- 0 until th; x <- 0 until tw; c <- 0 until ch
      } yield value(((y.toLong * h / th) * w + (x.toLong * w / tw)) * ch + c).toLong
      val got = PngCodec.resizeStats(blob, tw, th)
      assert(got.contains(PngCodec.PixelStats(tw, th, ch,
        tw.toLong * th * ch, vals.sum, vals.map(v => v * v).sum)),
        s"($w x $h x $ch -> $tw x $th) got $got")
    }
    // identity resize must agree exactly with the streaming stats path
    val blob = PngCodec.encode(9, 4, 3, value)
    assert(PngCodec.resizeStats(blob, 9, 4) == PngCodec.decodeStats(blob))
    // same garbage contract as the other decodes
    assert(PngCodec.resizeStats("not a png".getBytes, 4, 4).isEmpty)
    assert(PngCodec.decodePixels(blob.take(30)).isEmpty)
  }

  test("WavCodec round-trips real RIFF/PCM bytes to exact integer stats") {
    import graft.multimodal.WavCodec
    for ((rate, ch, frames) <- Seq((8000, 1, 240), (16000, 2, 100),
                                   (44100, 2, 1), (12000, 1, 0))) {
      val value: Long => Int = s => ((s * 37 + 11) % 4001 - 2000).toInt
      val blob = WavCodec.encode(rate, ch, frames, value)
      val n = frames.toLong * ch
      val vals = (0L until n).map(s => value(s).toLong)
      val got = WavCodec.decodeStats(blob)
      assert(got.contains(WavCodec.AudioStats(rate, ch, 16, frames, n,
        vals.sum, vals.map(v => v * v).sum,
        if (vals.isEmpty) 0 else vals.map(math.abs).max.toInt,
        frames.toLong * 1000000L / rate)),
        s"($rate Hz x $ch ch x $frames frames) got $got")
    }
    // sample clamping: out-of-range generator values store as s16 rails
    val railed = WavCodec.decodeStats(WavCodec.encode(8000, 1, 2,
      s => if (s == 0) 99999 else -99999)).get
    assert(railed.peakAbs == 32768 && railed.sumVal == 32767L - 32768L)
  }

  test("WavCodec.decodeSegments: fixed windows, short tail, garbage-safe") {
    import graft.multimodal.WavCodec
    val value: Long => Int = s => ((s * 13 + 5) % 3001 - 1500).toInt
    val blob = WavCodec.encode(8000, 2, 70, value) // 70 frames, 2 ch
    val segs = WavCodec.decodeSegments(blob, windowFrames = 32).get
    assert(segs.map(s => (s.segment, s.startFrame, s.nFrames)) ==
      Seq((0, 0L, 32L), (1, 32L, 32L), (2, 64L, 6L)))
    // window sums/peaks recompute from the closed form; they also sum
    // to the whole-clip aggregate
    val whole = WavCodec.decodeStats(blob).get
    assert(segs.map(_.sumVal).sum == whole.sumVal)
    assert(segs.map(_.peakAbs).max == whole.peakAbs)
    val s1 = (32L * 2 until 64L * 2).map(i => value(i).toLong)
    assert(segs(1).sumVal == s1.sum && segs(1).peakAbs == s1.map(math.abs).max)
    assert(WavCodec.decodeSegments("garbage".getBytes, 32).isEmpty)
    assert(WavCodec.decodeSegments(blob.take(50), 32).isEmpty)
  }

  test("WavCodec.decodeStats rejects garbage and honours RIFF layout rules") {
    import graft.multimodal.WavCodec
    val good = WavCodec.encode(8000, 2, 50, s => (s % 997).toInt)
    val base = WavCodec.decodeStats(good)
    assert(base.isDefined)
    assert(WavCodec.decodeStats(null).isEmpty)
    assert(WavCodec.decodeStats(Array.emptyByteArray).isEmpty)
    assert(WavCodec.decodeStats("RIFFnot really a wav".getBytes).isEmpty)
    // truncation inside data: chunk overruns payload -> None, no throw
    assert(WavCodec.decodeStats(good.take(good.length - 7)).isEmpty)
    // non-PCM audioFormat -> None (compressed WAVs need a codec)
    val alaw = good.clone(); alaw(20) = 6
    assert(WavCodec.decodeStats(alaw).isEmpty)
    // ragged data (not a whole number of frames) -> None
    val ragged = WavCodec.encode(8000, 2, 50, _ => 1).clone()
    ragged(40) = (((ragged(40) & 0xff) - 2) & 0xff).toByte // dataLen -= 2
    assert(WavCodec.decodeStats(ragged.take(ragged.length - 2)).isEmpty)
    // an odd-length ancillary chunk before fmt must be skipped with
    // its RIFF pad byte — real encoders emit LIST/fact chunks freely
    val extra = {
      val tag = "LIST".getBytes
      val payload = Array[Byte](1, 2, 3) // odd length -> 1 pad byte
      val lenLe = Array[Byte](3, 0, 0, 0)
      good.take(12) ++ tag ++ lenLe ++ payload ++ Array[Byte](0) ++ good.drop(12)
    }
    assert(WavCodec.decodeStats(extra) == base)
    // seeded fuzz: arbitrary bytes (including RIFF-prefixed garbage)
    // must never throw or hang — a 100 TB crawl contains everything
    val rnd = new scala.util.Random(4321)
    for (_ <- 1 to 200) {
      val b = new Array[Byte](rnd.nextInt(120))
      rnd.nextBytes(b)
      val prefixed =
        if (b.length >= 12 && rnd.nextBoolean()) {
          System.arraycopy("RIFF".getBytes, 0, b, 0, 4)
          System.arraycopy("WAVE".getBytes, 0, b, 8, 4)
          b
        } else b
      WavCodec.decodeStats(prefixed)
    }
  }

  test("ImageHeaders never throws on arbitrary bytes") {
    import graft.multimodal.ImageHeaders
    // a 100 TB crawl contains every possible byte garbage; the parser
    // must return None (or a parse), never raise. Deterministic seeded
    // fuzz, including format-prefixed garbage that enters each branch.
    val rnd = new scala.util.Random(1234)
    val prefixes = Seq[Array[Byte]](
      Array.empty,
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte),
      "GIF89a".getBytes,
      Array(0xff, 0xd8).map(_.toByte))
    for (i <- 0 until 500) {
      val body = Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte)
      val bytes = prefixes(i % prefixes.length) ++ body
      ImageHeaders.decode(bytes) match {
        case Some((w, h, fmt)) =>
          assert(w > 0 && h > 0 && Seq("png", "gif", "jpeg").contains(fmt))
        case None => ()
      }
    }
  }

  test("synthetic blobs round-trip through the real header decoder") {
    val docs = Seq((0L, ""), (1L, ""), (2L, ""), (3L, "")).toDF("doc_id", "text")
    val blobs = docs.select($"doc_id",
      BinaryMeta.syntheticImageBlob(
        ($"doc_id" % 640 + 101).cast("int"),
        ($"doc_id" % 480 + 57).cast("int"),
        ($"doc_id" % 3).cast("int")).as("blob"))
    val got = BinaryMeta.decodeMeta(blobs, "doc_id")
      .orderBy("id")
      .select("id", "n_bytes", "width", "height", "format")
      .as[(Long, Long, Int, Int, String)].collect().toSeq
    assert(got == Seq(
      (0L, 33L, 101, 57, "png"), (1L, 41L, 102, 58, "jpeg"),
      (2L, 13L, 103, 59, "gif"), (3L, 33L, 104, 60, "png")))
    // unknown bytes surface as an explicit row, not a task failure
    val junk = Seq((9L, "")).toDF("doc_id", "text")
      .select($"doc_id", F.lit("junk".getBytes).as("blob"))
    val u = BinaryMeta.decodeMeta(junk, "doc_id").collect().head
    assert(u.getString(4) == "unknown" && u.isNullAt(2) && u.isNullAt(3))
    // uint16-overflow dims null the blob (lpad would otherwise keep the
    // HIGH hex digits — a structurally valid header with garbage dims)
    val over = Seq((5L, "")).toDF("doc_id", "text")
      .select($"doc_id", BinaryMeta.syntheticImageBlob(
        F.lit(70000), F.lit(10), F.lit(1)).as("blob"))
    assert(over.where($"blob".isNull).count() == 1)
  }

  test("topKByCount rejects fractional counts at analysis time") {
    import graft.functions.TopKCountAgg
    val df = Seq(("a", 1.5), ("b", 2.9)).toDF("tok", "w")
    val e = intercept[Exception] {
      df.agg(TopKCountAgg.topKByCount(F.col("w"), F.col("tok"), 2)).collect()
    }
    assert(e.getMessage.contains("integral"),
      s"expected the floored-count analysis error, got: ${e.getMessage}")
  }

  test("docProfile fuses the per-doc ops into one scan and matches them") {
    val docs = Seq(
      (1L, "The quick brown Fox! jumps over the lazy dog, twice."),
      (2L, "el gato es un animal y no es feliz"),
      (3L, "word word word word word"),
      (4L, "")).toDF("doc_id", "text")
    val en = TextOps.stopwords.toMap.apply("en")
    val prof = TextOps.docProfile(docs, "doc_id", "text", en)
    // one source scan: everything derives from a single projection
    assert("LocalTableScan".r.findAllIn(
      prof.queryExecution.executedPlan.toString).length == 1)
    val p = prof.orderBy("doc_id").collect()
    // column-by-column parity with the standalone operators
    val stats = docs.select($"doc_id" +:
      TextOps.qualityStats($"text", en).map { case (n, c) => c.as(n) }: _*)
      .orderBy("doc_id").collect()
    val langs = docs.select(TextOps.langId($"text")).orderBy("doc_id")
    p.zip(stats.zip(langs.collect())).foreach { case (got, (st, lg)) =>
      Seq("n_chars", "n_tokens", "n_punct", "n_upper", "n_stopwords",
        "punct_ratio", "stopword_ratio", "avg_token_len").foreach { c =>
        assert(got.getAs[Any](c) == st.getAs[Any](c), s"col $c")
      }
      assert(got.getAs[String]("predicted_lang") == lg.getString(0))
    }
    val byId = p.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(3L).getAs[Double]("top_token_share") == 1.0)
    assert(byId(4L).getAs[Long]("n_fp") == 0L)
    assert(byId(4L).isNullAt(byId(4L).fieldIndex("simhash")),
      "empty doc has no simhash")
    assert(byId(1L).getAs[Long]("simhash") ==
      docs.where($"doc_id" === 1L)
        .select(graft.functions.HashExprs.simhash64(TextOps.tokens($"text")))
        .head().getLong(0))
  }

  test("multimodal feature extraction feeds the similarity suite end to end") {
    import graft.similarity.Ann
    // duplicate payloads (1,2), a distinct one (3): the extracted
    // embedding column plugs straight into the pair/search operators
    val df = BinaryMeta.attachBlob(Seq(
      (1L, "identical multimodal payload bytes"),
      (2L, "identical multimodal payload bytes"),
      (3L, "completely different content here zzz qqq")).toDF("doc_id", "text"), "text")
    val feats = BinaryMeta.extractFeaturesStub(df, "doc_id", dim = 16)
    assert(feats.columns.toSeq == Seq("id", "feature"))
    // unit-normalized, deterministic
    val v1 = feats.where($"id" === 1L).select("feature").as[Seq[Float]].head()
    assert(math.abs(v1.map(x => x.toDouble * x).sum - 1.0) < 1e-6)
    val pairs = Ann.cosinePairs(feats, "id", "feature", threshold = 0.999)
      .as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)),
      s"identical payloads must pair, distinct must not: ${pairs.toSeq}")
  }

  test("multimodal decode stub: columnar and mapPartitions paths agree") {
    val df = BinaryMeta.attachBlob(
      Seq((1L, "hello"), (2L, "a much longer text payload")).toDF("doc_id", "text"), "text")
    val colPath = BinaryMeta.decodeStubColumns(df)
      .select($"doc_id".as("id"), $"n_bytes", $"width", $"height", $"format")
    val mpPath = BinaryMeta.decodeStubPartitions(df, "doc_id")
    assert(colPath.as[(Long, Long, Int, Int, String)].collect().toSet ==
      mpPath.as[(Long, Long, Int, Int, String)].collect().toSet)
  }

  test("AviCodec round-trips real RIFF/DIB video to exact per-frame stats") {
    import graft.multimodal.AviCodec
    // width 5 -> rowBytes 16 (padding on every row); width 4 -> none
    for ((w, h, nf) <- Seq((5, 3, 4), (4, 2, 1), (1, 1, 7), (6, 4, 0))) {
      val value: (Int, Long) => Int = (f, s) => ((s * 31 + f * 7 + 3) % 256).toInt
      val blob = AviCodec.encode(w, h, nf, usPerFrame = 40000L, value)
      val meta = AviCodec.decodeMeta(blob)
      assert(meta.contains(AviCodec.VideoMeta(w, h, nf, 40000L, nf * 40000L)),
        s"(${w}x$h x$nf) got $meta")
      val frames = AviCodec.decodeFrameStats(blob).get
      assert(frames.map(_.frameNo) == (0 until nf))
      for (fr <- frames) {
        val vals = (0L until w.toLong * h * 3).map(s => value(fr.frameNo, s).toLong)
        assert(fr.nSamples == vals.length.toLong)
        assert(fr.sumVal == vals.sum, s"frame ${fr.frameNo} of ${w}x$h")
        assert(fr.sumSq == vals.map(v => v * v).sum)
      }
      // stride 2 keeps exactly the even frames with identical stats
      val sampled = AviCodec.decodeFrameStats(blob, stride = 2).get
      assert(sampled == frames.filter(_.frameNo % 2 == 0))
    }
  }

  test("AviCodec rejects garbage and honours the nested RIFF layout") {
    import graft.multimodal.AviCodec
    val good = AviCodec.encode(5, 3, 4, 33333L, (f, s) => (s + f).toInt)
    assert(AviCodec.decodeMeta(good).isDefined)
    assert(AviCodec.decodeMeta(null).isEmpty)
    assert(AviCodec.decodeMeta(Array.emptyByteArray).isEmpty)
    assert(AviCodec.decodeMeta("RIFFnot an avi at all".getBytes).isEmpty)
    // truncation anywhere -> None, no throw (chunk overruns payload)
    assert(AviCodec.decodeMeta(good.take(good.length - 5)).isEmpty)
    assert(AviCodec.decodeFrameStats(good.take(good.length - 5)).isEmpty)
    // compressed stream (biCompression != BI_RGB) -> unsupported
    val compressed = good.clone()
    // strf data starts after RIFF(12) + LIST hdrl hdr(8) + 'hdrl'... locate it
    val strfOff = {
      var i = 0
      var found = -1
      while (found < 0 && i + 4 <= compressed.length) {
        if (compressed(i) == 's' && compressed(i + 1) == 't' &&
          compressed(i + 2) == 'r' && compressed(i + 3) == 'f') found = i
        i += 1
      }
      found
    }
    compressed(strfOff + 8 + 16) = 1 // biCompression = BI_RLE8
    assert(AviCodec.decodeMeta(compressed).isEmpty)
    // header-vs-frame disagreement: avih claims height 4, every '00db'
    // chunk carries a height-3 DIB -> expected-length mismatch -> None
    val wrongH = good.clone()
    val avihOff0 = {
      var i = 0
      var found = -1
      while (found < 0 && i + 4 <= wrongH.length) {
        if (wrongH(i) == 'a' && wrongH(i + 1) == 'v' &&
          wrongH(i + 2) == 'i' && wrongH(i + 3) == 'h') found = i
        i += 1
      }
      found
    }
    wrongH(avihOff0 + 8 + 36) = 4 // dwHeight (strf still says 3 -> it's
    // avih the layout trusts for frame sizing)
    assert(AviCodec.decodeFrameStats(wrongH).isEmpty)
    // header claims 5 frames but movi carries 4 -> count mismatch
    val miscount = good.clone()
    val avihOff = {
      var i = 0
      var found = -1
      while (found < 0 && i + 4 <= miscount.length) {
        if (miscount(i) == 'a' && miscount(i + 1) == 'v' &&
          miscount(i + 2) == 'i' && miscount(i + 3) == 'h') found = i
        i += 1
      }
      found
    }
    miscount(avihOff + 8 + 16) = 5 // dwTotalFrames
    assert(AviCodec.decodeFrameStats(miscount).isEmpty)
    // seeded fuzz: arbitrary bytes must never throw or hang
    val rnd = new scala.util.Random(8642)
    for (_ <- 1 to 200) {
      val b = new Array[Byte](rnd.nextInt(160))
      rnd.nextBytes(b)
      AviCodec.decodeMeta(b)
      AviCodec.decodeFrameStats(b)
      val prefixed = "RIFF".getBytes ++ b
      AviCodec.decodeMeta(prefixed)
      AviCodec.decodeFrameStats(prefixed)
    }
  }
}

  // ----- independent test-side PROGRESSIVE JPEG encoder (SOF2):
  // forward DCT + quantization shared with the baseline test encoder
  // idea, then the T.81 Annex G scan progression — DC first/refine
  // (point transform = arithmetic shift), spectral-selection AC bands
  // with aggregated EOB runs, AC refinement with correction bits and
  // newly-nonzero ±1 placements. Genuinely independent math from the
  // decoder (fDCT here, iDCT there).
private[graft] object ProgJpegEncoder {
    private val zig: Array[Int] = Array(
      0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
      12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
      35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
      58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)
    private val basis = Array.tabulate(8, 8) { (x, u) =>
      val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
      0.5 * c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
    }
    private def codes(bits: Array[Int], vals: Seq[Int]): Map[Int, (Int, Int)] = {
      var code = 0; var vi = 0
      val out = Map.newBuilder[Int, (Int, Int)]
      for (l <- 1 to 16) {
        for (_ <- 0 until bits(l - 1)) {
          out += vals(vi) -> ((code, l)); code += 1; vi += 1
        }
        code <<= 1
      }
      out.result()
    }
    private val dcVals = (0 to 11)
    private val dcBits = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    // EOBn (r 0..14), ZRL, and every (run, size 1..10) at 8 bits
    private val acVals = (0 to 14).map(_ << 4) ++ Seq(0xf0) ++
      (for (r <- 0 to 15; s <- 1 to 10) yield (r << 4) | s)
    private val acBits = Array(0, 0, 0, 0, 0, 0, 0, acVals.length,
      0, 0, 0, 0, 0, 0, 0, 0)
    private val dcC = codes(dcBits, dcVals)
    private val acC = codes(acBits, acVals)

    /** One scan component for [[assemble]]: quantized zigzag blocks on
      * the INTERLEAVED (MCU-aligned) grid plus the geometry the scan
      * writers need.
      */
    private case class PComp(blocks: Array[Array[Int]], h: Int, v: Int,
                             bwI: Int, bwN: Int, bhN: Int)

    /** Quantized zigzag coefficient blocks on an explicit bwI x bhI
      * grid, sampled with edge replication against (cw, ch).
      */
    private def coefBlocksGrid(bwI: Int, bhI: Int, cw: Int, ch: Int,
                               pixel: (Int, Int) => Int,
                               qdc: Int, qac: Int): Array[Array[Int]] =
      Array.tabulate(bhI * bwI) { bi =>
        val ox = (bi % bwI) * 8; val oy = (bi / bwI) * 8
        val f = Array.tabulate(8, 8) { (y, x) =>
          pixel(math.min(ox + x, cw - 1), math.min(oy + y, ch - 1)) - 128.0
        }
        val q = new Array[Int](64)
        for (u <- 0 until 8; v <- 0 until 8) {
          var s = 0.0
          for (x <- 0 until 8; y <- 0 until 8)
            s += basis(x)(u) * basis(y)(v) * f(y)(x)
          val qq = if (u == 0 && v == 0) qdc else qac
          q(v * 8 + u) = Math.round(s / qq).toInt
        }
        Array.tabulate(64)(k => q(zig(k)))
      }

    private def pcomp11(w: Int, h: Int, pixel: (Int, Int) => Int,
                        qdc: Int, qac: Int): PComp = {
      val bw = (w + 7) / 8; val bh = (h + 7) / 8
      PComp(coefBlocksGrid(bw, bh, w, h, pixel, qdc, qac),
        1, 1, bw, bw, bh)
    }

    /** Encode `pixel` as a 6-scan progressive grayscale JFIF stream:
      * DC first (Al=1), two AC-first bands split at `ssSplit` (Al=1),
      * DC refine, two AC-refine bands (Al=0). `restartInterval`
      * applies to every scan when > 0.
      */
    def encode(w: Int, h: Int, pixel: (Int, Int) => Int,
               qdc: Int, qac: Int, ssSplit: Int = 5,
               restartInterval: Int = 0): Array[Byte] =
      assemble(w, h, qdc, qac,
        Array(pcomp11(w, h, pixel, qdc, qac)), ssSplit, restartInterval)

    /** The color twin: interleaved DC scans over all three
      * components, per-component AC band scans over each component's
      * own non-interleaved sub-grid. `sub420` switches luma to 2x2
      * sampling (chroma sampled on the half-resolution grid, luma's
      * interleaved grid gains the MCU padding blocks the DC chain
      * runs through while AC scans skip them).
      */
    def encodeColor(w: Int, h: Int,
                    yPix: (Int, Int) => Int,
                    cbPix: (Int, Int) => Int,
                    crPix: (Int, Int) => Int,
                    q: Int = 1, ssSplit: Int = 5,
                    restartInterval: Int = 0,
                    sub420: Boolean = false): Array[Byte] = {
      if (!sub420)
        assemble(w, h, q, q,
          Array(pcomp11(w, h, yPix, q, q),
            pcomp11(w, h, cbPix, q, q),
            pcomp11(w, h, crPix, q, q)), ssSplit, restartInterval)
      else {
        val hs = 2
        val mcusX = (w + 8 * hs - 1) / (8 * hs)
        val mcusY = (h + 8 * hs - 1) / (8 * hs)
        val cw = (w + hs - 1) / hs
        val ch = (h + hs - 1) / hs
        val luma = PComp(
          coefBlocksGrid(mcusX * hs, mcusY * hs, w, h, yPix, q, q),
          hs, hs, mcusX * hs, (w + 7) / 8, (h + 7) / 8)
        def chroma(pix: (Int, Int) => Int) = PComp(
          coefBlocksGrid(mcusX, mcusY, cw, ch, pix, q, q),
          1, 1, mcusX, mcusX, mcusY)
        assemble(w, h, q, q, Array(luma, chroma(cbPix), chroma(crPix)),
          ssSplit, restartInterval)
      }
    }

    /** Progressive 4:2:2 (luma h=2,v=1; chroma 1x1 at half horizontal
      * resolution) — the one sampling geometry the sibling tests left
      * to "covered by construction". Rides the generic [[assemble]].
      */
    def encodeColor422(w: Int, h: Int,
                       yPix: (Int, Int) => Int,
                       cbPix: (Int, Int) => Int,
                       crPix: (Int, Int) => Int,
                       q: Int = 1, ssSplit: Int = 5,
                       restartInterval: Int = 0): Array[Byte] = {
      val mcusX = (w + 15) / 16
      val mcusY = (h + 7) / 8
      val cw = (w + 1) / 2
      val luma = PComp(
        coefBlocksGrid(mcusX * 2, mcusY, w, h, yPix, q, q),
        2, 1, mcusX * 2, (w + 7) / 8, (h + 7) / 8)
      def chroma(pix: (Int, Int) => Int) = PComp(
        coefBlocksGrid(mcusX, mcusY, cw, h, pix, q, q),
        1, 1, mcusX, mcusX, mcusY)
      assemble(w, h, q, q, Array(luma, chroma(cbPix), chroma(crPix)),
        ssSplit, restartInterval)
    }

    private def assemble(w: Int, h: Int, qdc: Int, qac: Int,
                         comps: Array[PComp],
                         ssSplit: Int, restartInterval: Int): Array[Byte] = {
      val nc = comps.length
      val hMax = comps.map(_.h).max
      val vMax = comps.map(_.v).max
      val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
      val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
      val bos = new java.io.ByteArrayOutputStream()
      def w8(v: Int): Unit = bos.write(v & 0xff)
      def w16(v: Int): Unit = { w8(v >> 8); w8(v) }
      def seg(m: Int, body: Array[Byte]): Unit = {
        w8(0xff); w8(m); w16(body.length + 2); bos.write(body)
      }
      w8(0xff); w8(0xd8)
      seg(0xdb, Array.tabulate[Byte](65)(i =>
        if (i == 0) 0 else if (i == 1) qdc.toByte else qac.toByte))
      seg(0xc2, Array[Byte](8, (h >> 8).toByte, h.toByte,
        (w >> 8).toByte, w.toByte, nc.toByte) ++
        (0 until nc).flatMap(ci => Seq((ci + 1).toByte,
          ((comps(ci).h << 4) | comps(ci).v).toByte, 0.toByte)))
      seg(0xc4, Array[Byte](0x00) ++ dcBits.map(_.toByte) ++ dcVals.map(_.toByte))
      seg(0xc4, Array[Byte](0x11) ++ acBits.map(_.toByte) ++
        acVals.map(_.toByte))
      if (restartInterval > 0)
        seg(0xdd, Array[Byte]((restartInterval >> 8).toByte,
          (restartInterval & 0xff).toByte))

      // bit emitter shared by all scans (reset per scan via pad)
      var acc = 0L; var nb = 0
      def put(code: Int, len: Int): Unit = {
        acc = (acc << len) | (code & ((1L << len) - 1)); nb += len
        while (nb >= 8) {
          val b = ((acc >>> (nb - 8)) & 0xff).toInt
          w8(b); if (b == 0xff) w8(0); nb -= 8
        }
      }
      def pad(): Unit = if (nb > 0) { val p = 8 - nb; put((1 << p) - 1, p) }
      def putSym(t: Map[Int, (Int, Int)], sym: Int): Unit = {
        val (c, l) = t(sym); put(c, l)
      }
      // truncation-toward-zero point transform for AC (T.81 G.1.2.2)
      def pt(v: Int, al: Int): Int =
        if (v < 0) -((-v) >> al) else v >> al

      /** interleaved DC scan over all components (first or refine):
        * MCU order, h x v blocks per component from the interleaved
        * grid, restart counted in MCUs */
      def dcScan(ah: Int, al: Int): Unit = {
        seg(0xda, Array[Byte](nc.toByte) ++
          (1 to nc).flatMap(ci => Seq(ci.toByte, 0x01.toByte)) ++
          Seq(0.toByte, 0.toByte, ((ah << 4) | al).toByte))
        val preds = new Array[Int](nc)
        var rstN = 0
        for (m <- 0 until (mcusX * mcusY)) {
          if (restartInterval > 0 && m > 0 && m % restartInterval == 0) {
            pad()
            w8(0xff); w8(0xd0 + (rstN & 7)); rstN += 1
            java.util.Arrays.fill(preds, 0)
          }
          val mx = m % mcusX; val my = m / mcusX
          for (ci <- 0 until nc; vy <- 0 until comps(ci).v;
               vx <- 0 until comps(ci).h) {
            val bi = (my * comps(ci).v + vy) * comps(ci).bwI +
              (mx * comps(ci).h + vx)
            val dc = comps(ci).blocks(bi)(0)
            if (ah == 0) { // arithmetic-shift point transform, diff
              val v = dc >> al
              val diff = v - preds(ci)
              preds(ci) = v
              val sz = if (diff == 0) 0
                else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
              putSym(dcC, sz)
              if (sz > 0)
                put(if (diff >= 0) diff else diff - 1 + (1 << sz), sz)
            } else put((dc >> al) & 1, 1)
          }
        }
        pad()
      }

      /** single-component AC scan (first or refine) over one band */
      def acScan(ci: Int, ss: Int, se: Int, ah: Int, al: Int): Unit = {
        seg(0xda, Array[Byte](1, (ci + 1).toByte, 0x01,
          ss.toByte, se.toByte, ((ah << 4) | al).toByte))
        var eobrun = 0
        var rstN = 0
        def flushEob(): Unit = if (eobrun > 0) {
          var r = 0
          while ((2 << r) <= eobrun) r += 1
          putSym(acC, r << 4)
          if (r > 0) put(eobrun - (1 << r), r)
          eobrun = 0
        }
        val nBlocks = comps(ci).bwN * comps(ci).bhN
        for (b <- 0 until nBlocks) {
          if (restartInterval > 0 && b > 0 && b % restartInterval == 0) {
            flushEob()
            pad()
            w8(0xff); w8(0xd0 + (rstN & 7)); rstN += 1
          }
          val c = comps(ci).blocks(
            (b / comps(ci).bwN) * comps(ci).bwI + (b % comps(ci).bwN))
          if (ah == 0) { // AC first over the band
            val hi = (ss to se).map(k => pt(c(k), al))
            val lastNz = (ss to se).reverse.find(k => pt(c(k), al) != 0)
            if (lastNz.isEmpty) eobrun += 1
            else {
              flushEob()
              var run = 0
              for (k <- ss to lastNz.get) {
                val v = hi(k - ss)
                if (v == 0) run += 1
                else {
                  while (run > 15) { putSym(acC, 0xf0); run -= 16 }
                  val sz = 32 - Integer.numberOfLeadingZeros(math.abs(v))
                  putSym(acC, (run << 4) | sz)
                  put(if (v >= 0) v else v - 1 + (1 << sz), sz)
                  run = 0
                }
              }
              if (lastNz.get < se) eobrun += 1
            }
            if (eobrun == 16383) flushEob() // EOBn cap 2^14-1
          } else { // AC refine: mirror the decoder walk exactly —
            // correction bits interleave positionally with ZRL runs
            val hiOf = (k: Int) => pt(c(k), ah)
            val placements = (ss to se).filter(k => hiOf(k) == 0 && c(k) != 0)
            var k = ss
            def corrAt(j: Int): Unit = put((math.abs(c(j)) >> al) & 1, 1)
            for (p <- placements) {
              var z = (k until p).count(j => hiOf(j) == 0)
              while (z > 15) { // ZRL: exactly 16 zero-history slots
                putSym(acC, 0xf0)
                var consumed = 0
                while (consumed < 16) {
                  if (hiOf(k) != 0) corrAt(k) else consumed += 1
                  k += 1
                }
                z -= 16
              }
              putSym(acC, (z << 4) | 1)
              put(if (c(p) > 0) 1 else 0, 1)
              while (k < p) { if (hiOf(k) != 0) corrAt(k); k += 1 }
              k = p + 1
            }
            if (k <= se) { // EOB (r=0) + remaining correction bits
              putSym(acC, 0x00)
              while (k <= se) { if (hiOf(k) != 0) corrAt(k); k += 1 }
            }
          }
        }
        if (ah == 0) flushEob()
        pad()
      }

      dcScan(0, 1)
      for (ci <- 0 until nc) {
        acScan(ci, 1, ssSplit, 0, 1)
        acScan(ci, ssSplit + 1, 63, 0, 1)
      }
      dcScan(1, 0)
      for (ci <- 0 until nc) {
        acScan(ci, 1, ssSplit, 1, 0)
        acScan(ci, ssSplit + 1, 63, 1, 0)
      }
      w8(0xff); w8(0xd9)
      bos.toByteArray
    }
  }

