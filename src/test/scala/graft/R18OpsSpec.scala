package graft

import org.apache.spark.sql.{functions => F}

/** Round-18 specs: the r17 ADVICE closes — IPv6 URL hosts, RFC 3986
  * port validity, the fixture envelope hash's overflow-free form, and
  * block-spanning anchors in main-content extraction.
  */
class R18OpsSpec extends SparkSpec {
  import spark.implicits._

  test("Urls: bracketed IPv6 hosts survive canonicalize/hostOf/registrableDomain") {
    import graft.functions.Urls
    // canonicalize preserves the bracketed literal (lowercased), and
    // hostOf must scan to the matching ']' instead of truncating at
    // the first ':' of the address
    assert(Urls.canonicalize("https://[2001:DB8::1]/x") ==
      "https://[2001:db8::1]/x")
    assert(Urls.hostOf("https://[2001:db8::1]/x") == "[2001:db8::1]")
    // non-default port kept, still not part of the host
    assert(Urls.canonicalize("https://[2001:db8::1]:8443/x") ==
      "https://[2001:db8::1]:8443/x")
    assert(Urls.hostOf("https://[2001:db8::1]:8443/x") == "[2001:db8::1]")
    // default port stripped for v6 hosts too
    assert(Urls.hostOf("http://[::1]:80/") == "[::1]")
    // registrable domain: a bracketed literal groups as itself — a
    // v4-mapped form contains dots and must NOT be label-split
    assert(Urls.registrableDomain("http://[::ffff:192.0.2.1]/p") ==
      "[::ffff:192.0.2.1]")
    assert(Urls.registrableDomain("https://[2001:db8::1]:8443/x") ==
      "[2001:db8::1]")
  }

  test("Urls.canonicalize: ports outside 1..65535 are not URLs (NULL contract)") {
    import graft.functions.Urls
    assert(Urls.canonicalize("http://x.org:0/") == null)
    assert(Urls.canonicalize("http://x.org:00/") == null)
    assert(Urls.canonicalize("http://x.org:65536/") == null)
    assert(Urls.canonicalize("http://x.org:99999999/") == null)
    // valid boundaries still canonicalize, leading zeros stripped
    assert(Urls.canonicalize("http://x.org:1/") == "http://x.org:1/")
    assert(Urls.canonicalize("http://x.org:065535/") == "http://x.org:65535/")
    // zero-padded DEFAULT port still strips (the r15 contract)
    assert(Urls.canonicalize("http://x.org:080/") == "http://x.org/")
  }

  test("envelopeHash: reduced-first multiply matches exact modular arithmetic at any doc id") {
    import graft.multimodal.BinaryMeta
    // the unreduced form (d*65+bin+1)*K wraps Long past d ~ 5.3e7 —
    // where DuckDB's BIGINT twin would instead raise an overflow
    // error. The reduced-first form must equal TRUE modular
    // arithmetic (BigInt reference) everywhere, including far past
    // the wrap point, and stay identical to the old form below it.
    val k = BigInt(2654435761L)
    for (d <- Seq(0L, 7L, 3199L, 31999L, 52999999L, 60000000L,
        9876543210L, Long.MaxValue / 65 - 2); bin <- Seq(0L, 32L, 64L)) {
      val want = ((BigInt(d) * 65 + bin + 1) * k).mod(BigInt(999983)).toLong
      assert(BinaryMeta.envelopeHash(d, bin) == want,
        s"envelopeHash($d, $bin)")
      if (d < 50000000L) {
        // below the wrap point the pre-fix formula agreed — gate
        // corpora values are unchanged by this round's rewrite
        val old = (d * 65 + bin + 1) * 2654435761L % 999983
        assert(BinaryMeta.envelopeHash(d, bin) == old, s"old form d=$d")
      }
    }
  }

  test("syntheticAudioCorpus/syntheticVideoCorpus: ids past the Long-wrap ceiling still encode") {
    import graft.multimodal.{AudioHash, BinaryMeta, VideoHash}
    val big = Seq(60000000L, 9876543210L).toDF("doc_id")
    val audio = BinaryMeta.syntheticAudioCorpus(big, "doc_id")
    assert(audio.count() == 8)
    // the scaling/replication invariances hold out here too: base,
    // volume-doubled and stereo variants hash identically per doc
    val ah = audio
      .select((F.col("id") / 4).cast("long").as("d"),
        F.pmod(F.col("id"), F.lit(4)).as("kind"),
        AudioHash.audioHash64Col(F.col("blob")).as("hash64"))
      .where(F.col("kind").isin(0, 1, 3))
      .groupBy("d").agg(F.countDistinct("hash64").as("n"))
      .collect()
    assert(ah.forall(_.getLong(1) == 1L), ah.mkString(","))
    val video = BinaryMeta.syntheticVideoCorpus(big, "doc_id")
    assert(video.count() == 8)
    val vh = video
      .select((F.col("id") / 4).cast("long").as("d"),
        F.pmod(F.col("id"), F.lit(4)).as("kind"),
        VideoHash.videoHash64Col(F.col("blob")).as("hash64"))
      .where(F.col("kind").isin(0, 1, 3))
      .groupBy("d").agg(F.countDistinct("hash64").as("n"))
      .collect()
    assert(vh.forall(_.getLong(1) == 1L), vh.mkString(","))
  }

  // ------------------------------------------ spatial video near-dup

  test("videoSpatialHash64: invariances + the temporal hash's blind spots") {
    import graft.multimodal.{AviCodec, VideoHash}
    // h = 8: grid rows align 1:1, so the 2x-upscale cell map commutes
    // (the documented condition for spatial upscale invariance)
    val w = 36; val h = 8; val nf = 16
    // ramp profile: its descent pattern is NOT reversal-symmetric,
    // so the mirror genuinely flips gradient bits
    def m(c: Int) = Array(0, 1, 2, 3, 4, 5, 6, 5, 4)(c)
    def base(f: Int, s: Long): Int = {
      val x = ((s % (w * 3)) / 3).toInt
      10 + 20 * m(x / 4) + (if (f % 2 == 0) 15 else 0)
    }
    val clip = AviCodec.encode(w, h, nf, 33333L, base)
    // brightness shift and 2x nearest upscale: spatial hash identical
    val bright = AviCodec.encode(w, h, nf, 33333L, (f, s) => base(f, s) + 30)
    val up = AviCodec.encode(2 * w, 2 * h, nf, 33333L, { (f, s) =>
      val x2 = ((s % (2 * w * 3)) / 3).toInt
      val y2 = (s / (2 * w * 3)).toInt
      base(f, (y2 / 2).toLong * w * 3 + (x2 / 2) * 3 + s % 3)
    })
    val sBase = VideoHash.videoSpatialHash64(clip)
    assert(sBase != null)
    assert(VideoHash.videoSpatialHash64(bright) == sBase)
    assert(VideoHash.videoSpatialHash64(up) == sBase)
    // mirrored material: SAME per-frame sums (temporal hash equal),
    // DIFFERENT spatial hash — the collision the temporal arm misses
    val mir = AviCodec.encode(w, h, nf, 33333L, { (f, s) =>
      val x = ((s % (w * 3)) / 3).toInt
      10 + 20 * m(8 - x / 4) + (if (f % 2 == 0) 15 else 0)
    })
    assert(VideoHash.videoHash64(mir) == VideoHash.videoHash64(clip))
    val sMir = VideoHash.videoSpatialHash64(mir)
    assert(sMir != sBase, "mirror must change the spatial hash")
    assert(java.lang.Long.bitCount(sBase ^ sMir) > 3,
      s"mirror should be far: ${java.lang.Long.bitCount(sBase ^ sMir)}")
  }

  test("videoNearDupPairs: spatial edits caught, temporal-only collisions split") {
    import graft.multimodal.{BinaryMeta, VideoHash}
    val corpus = BinaryMeta.syntheticVideoSpatialCorpus(
      spark.range(40).toDF("doc_id"), "doc_id")
    val sigs = VideoHash.videoDualHashDf(corpus, "id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(sigs.size == 120)
    for (d <- 0L until 40L) {
      // all three arms share one brightness curve -> temporal equal
      assert(sigs(3 * d)._1 == sigs(3 * d + 1)._1, s"d=$d edit thash")
      assert(sigs(3 * d)._1 == sigs(3 * d + 2)._1, s"d=$d mirror thash")
      // the spatial edit flips at most one bit
      assert(java.lang.Long.bitCount(sigs(3 * d)._2 ^ sigs(3 * d + 1)._2) <= 1,
        s"d=$d edit shash")
    }
    // the dual rule: edits caught, mirrors overwhelmingly split
    val pairs = VideoHash.videoNearDupPairs(corpus, "id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (d <- 0L until 40L)
      assert(pairs.contains((3 * d, 3 * d + 1)), s"d=$d edit pair missing")
    val mirrorCaught = (0L until 40L).count(d =>
      pairs.contains((3 * d, 3 * d + 2)))
    assert(mirrorCaught <= 4,
      s"mirrors should split (non-palindromic M): caught $mirrorCaught/40")
    // and a temporal-only pass WOULD have reported every mirror pair
    val temporalOnly = VideoHash.videoHashPairs(corpus, "id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (d <- 0L until 40L)
      assert(temporalOnly.contains((3 * d, 3 * d + 2)),
        s"d=$d mirror invisible to the temporal arm — fixture broken")
  }

  // -------------------------------------- incremental domain curation

  private def urlRows(n: Int) = spark.range(n).selectExpr(
    "id as doc_id",
    """concat('https://', CASE CAST(id % 3 AS INT)
         WHEN 0 THEN concat('cdn', id % 5, '.assets.example.org')
         WHEN 1 THEN 'www.example.co.uk'
         ELSE 'news.example.net' END, '/p/', id) as url""",
    "10 + id % 7 as n_chars")

  test("domainStats: per-batch partials merge back to the exact batch recompute") {
    import graft.text.Curate
    val urls = urlRows(300)
    val table = "r18_domstats_spec"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val b = F.pmod(F.col("doc_id"), F.lit(3))
    Curate.domainStatsBuild(urls.where(b === 0), "url", "n_chars", table, 4)
    Curate.domainStatsAppend(urls.where(b === 1), "url", "n_chars", table, 1L, 4)
    Curate.domainStatsAppend(urls.where(b === 2), "url", "n_chars", table, 2L, 4)
    val incr = Curate.domainStats(spark.table(table))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val batch = Curate.domainStats(
        Curate.domainHostPartials(urls, "url", "n_chars"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(incr == batch, s"incr=$incr batch=$batch")
    // host spread survives the merge: 5 cdnN hosts pool under one domain
    assert(incr("example.org")._2 == 5L, incr.toString)
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("domainQuotaAdmit: chained batches equal the (batch, sampleKey, id) global prefix") {
    import graft.text.Curate
    val urls = urlRows(300).select(F.col("doc_id"),
      graft.functions.Urls.domain(F.col("url")).as("domain"))
    val cap = 20
    var admitted: org.apache.spark.sql.DataFrame = null
    for (i <- 0 to 2) {
      val prior = Curate.admittedCounts(
        if (admitted == null) urls.where(F.lit(false)) else admitted, "domain")
      val a = Curate.domainQuotaAdmit(
        urls.where(F.pmod(F.col("doc_id"), F.lit(3)) === i),
        "doc_id", "domain", prior, cap)
      admitted = if (admitted == null) a else admitted.unionByName(a)
    }
    val got = admitted.select("doc_id").as[Long].collect().toSet
    // closed form: first `cap` per domain in (batch, sampleKey, id) order
    val w = org.apache.spark.sql.expressions.Window.partitionBy("domain")
      .orderBy(F.pmod(F.col("doc_id"), F.lit(3)).asc,
        Curate.sampleKey(F.col("doc_id")).asc, F.col("doc_id").asc)
    val want = urls.withColumn("rk", F.row_number().over(w))
      .where(F.col("rk") <= cap).select("doc_id").as[Long].collect().toSet
    assert(got == want, s"got ${got.size} want ${want.size}")
    assert(got.size == 3 * cap) // 3 domains, every quota filled
  }

  test("domainStatsIngest: streaming micro-batches equal the batch recompute") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingStats
    import graft.text.Curate
    implicit val sq = spark.sqlContext
    val table = "r18_domstats_stream"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val stream = MemoryStream[(Long, String, Long)]
    val q = StreamingStats.domainStatsIngest(
      stream.toDF().toDF("doc_id", "url", "n_chars"),
      "url", "n_chars", table, nBuckets = 4,
      checkpointDir = Some(java.nio.file.Files
        .createTempDirectory("doms_ckpt").toString))()
    val all = urlRows(150).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    try {
      for (g <- all.grouped(50)) { stream.addData(g.toSeq: _*); q.processAllAvailable() }
    } finally q.stop()
    val incr = Curate.domainStats(spark.table(table))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val batch = Curate.domainStats(Curate.domainHostPartials(
        urlRows(150), "url", "n_chars"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(incr == batch, s"incr=$incr batch=$batch")
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("extractMain: block-level link farms cannot evade the density kill") {
    import graft.text.HtmlMainExtract
    // card-link pattern: the anchor wraps a div, so its text lands in
    // a NEW block after the boundary — anchor state must survive the
    // flush for the 3*link<=total test to see it
    val html = "<body><p>real text here with words</p>" +
      "<a href=\"/promo\"><div>promo card text block</div></a>" +
      "<p>more real closing words</p></body>"
    assert(HtmlMainExtract.extractMain(html) ==
      "real text here with words\nmore real closing words")
    // control: same div text WITHOUT the wrapping anchor is kept
    val ctl = html.replace("<a href=\"/promo\">", "").replace("</a>", "")
    assert(HtmlMainExtract.extractMain(ctl) ==
      "real text here with words\npromo card text block\nmore real closing words")
  }

  test("JaroWinklerPpm: byte-wise scoring matches DuckDB on non-ASCII names") {
    import graft.functions.HashExprs
    // expected ppms = floor(1e6 * jaro_winkler_similarity) probed
    // directly against DuckDB this round — the kernel must reproduce
    // rapidfuzz's UTF-8 BYTE semantics (2-byte Latin/Greek/Cyrillic
    // and 3-byte CJK sequences), not code-point scoring (which would
    // say e.g. 883333 for café/cafe instead of the byte-wise 848333)
    val cases = Seq(
      ("café", "cafe", 848333L),
      ("José García", "Jose Garcia", 885780L),
      ("Müller", "Mueller", 828571L),
      ("Søren", "Soren", 840000L),
      ("Дмитрий", "Дмитрии", 971428L),
      ("martha", "marhta", 961111L), // ASCII classic: unchanged
      ("田中太郎", "田中次郎", 900000L))
    val got = cases.map(c => (c._1, c._2)).toDF("a", "b")
      .withColumn("jw", HashExprs.jaroWinklerPpm(F.col("a"), F.col("b")))
      .select("jw").as[Long].collect().toSeq
    for (((a, b, want), g) <- cases.zip(got))
      assert(g == want, s"$a/$b: got $g want $want")
  }

  test("editDistanceJoin: digit-only domains refuse loudly before generating candidates") {
    import graft.harmonize.ValueMatcher
    // the SURVEY row-2a blowup, mechanized: 15k digit-only ids keep
    // every gram hot, so Σ df(signature grams) goes quadratic — the
    // guard must refuse under a caller budget without ever running
    // the candidate join
    val ids = spark.range(15000)
      .selectExpr("concat('ID', lpad(cast(id as string), 9, '0')) as v")
    val e = intercept[IllegalArgumentException] {
      ValueMatcher.editDistanceJoin(ids, "v", ids, "v", k = 2,
        maxCandidates = 1000000L)
    }
    assert(e.getMessage.contains("candidate budget exceeded"), e.getMessage)
    assert(e.getMessage.contains("maxCandidates"), e.getMessage)
    // a Zipfian-alphabet domain of the wired gate's shape stays under
    // the default budget and returns exact results
    val names = spark.range(200)
      .selectExpr("concat('Supplier#', lpad(cast(id as string), 9, '0')) as v")
    val got = ValueMatcher.editDistanceJoin(names, "v", names, "v", k = 1)
      .where(F.col("source") < F.col("target"))
    assert(got.count() > 0)
    // spot-exactness: every returned pair verifies lev <= 1
    assert(got.where(F.levenshtein(F.col("source"), F.col("target")) > 1)
      .count() == 0)
  }

  // ------------------------------------------------ TextEncoder seam

  test("HashingProfileEncoder: encoder path agrees with the expression path") {
    import graft.harmonize.{HashingProfileEncoder, ValueMatcher}
    val src = Seq("lung adenocarcinoma", "lung adenocarcinma",
      "breast carcinoma", "melanoma of skin", "xy").toDF("v")
    val tgt = Seq("Lung Adenocarcinoma", "Breast Carcinoma",
      "Skin Melanoma", "Glioblastoma").toDF("v")
    val expr = ValueMatcher.profileEmbeddingMatch(src, "v", tgt, "v",
        dim = 64, threshold = 0.3)
      .collect().map(r => (r.getString(0), Option(r.getString(1)),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
    val enc = ValueMatcher.encoderMatch(src, "v", tgt, "v",
        new HashingProfileEncoder(64), threshold = 0.3)
      .collect().map(r => (r.getString(0), Option(r.getString(1)),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
    // same sources, same best targets; similarities equal to 1e-5
    // (the encoder carries float32 components, the expression path
    // doubles — same grams, same xxhash64 seeds)
    assert(expr.map(t => (t._1, t._2)) == enc.map(t => (t._1, t._2)),
      s"expr=$expr enc=$enc")
    val bySrcE = expr.map(t => t._1 -> t._3).toMap
    val bySrcN = enc.map(t => t._1 -> t._3).toMap
    for ((k, ve) <- bySrcE; vn = bySrcN(k)) (ve, vn) match {
      case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-5, s"$k: $a vs $b")
      case (None, None) => ()
      case other => fail(s"$k: $other")
    }
    // the sub-3-char value is unmatched on both paths
    assert(bySrcE("xy").isEmpty && bySrcN("xy").isEmpty)
  }

  test("TextEncoder: a custom encoder rides matchValues end-to-end") {
    import graft.harmonize.TextEncoder
    // a 'model' that knows its vocabulary: orthogonal axes per concept
    // — deterministic expected matches regardless of string distance
    val concept = Map(
      "aspirin" -> 0, "acetylsalicylic acid" -> 0,
      "paracetamol" -> 1, "acetaminophen" -> 1,
      "ibuprofen" -> 2)
    val custom = new TextEncoder {
      override def dim: Int = 4
      override def encodeBatch(values: Array[String]): Array[Array[Float]] =
        values.map { v =>
          val out = new Array[Float](4)
          concept.get(v.toLowerCase(java.util.Locale.ROOT))
            .foreach(i => out(i) = 1f)
          out
        }
    }
    val src = Seq("Aspirin", "Paracetamol", "naproxen").toDF("drug")
    val tgt = Seq("acetylsalicylic acid", "acetaminophen", "ibuprofen")
      .toDF("name")
    val got = Graft.matchValues(src, "drug", tgt, "name", custom)
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got == Map(
      "Aspirin" -> Some("acetylsalicylic acid"),
      "Paracetamol" -> Some("acetaminophen"),
      "naproxen" -> None), got.toString) // unknown value: kept, unmatched
  }

  test("TextEncoder: dim violations refuse loudly, never pad or truncate") {
    import graft.harmonize.{TextEncoder, ValueMatcher}
    val bad = new TextEncoder {
      override def dim: Int = 8
      override def encodeBatch(values: Array[String]): Array[Array[Float]] =
        values.map(_ => new Array[Float](5)) // violates its own contract
    }
    val df = Seq("alpha", "beta").toDF("v")
    val e = intercept[Exception] {
      ValueMatcher.encoderMatch(df, "v", df, "v", bad, 0.1).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("contract says 8")),
      e.toString)
  }

  test("matchSchema(encoder): pooled column profiles match columns by vocabulary") {
    import graft.harmonize.HashingProfileEncoder
    val src = Seq(
      ("lung adenocarcinoma", "albuterol"),
      ("breast carcinoma", "aspirin"),
      ("skin melanoma", "ibuprofen")).toDF("diagnosis", "medication")
    val tgt = Seq(
      ("Aspirin", "Lung Adenocarcinoma"),
      ("Ibuprofen", "Breast Carcinoma"),
      ("Albuterol", "Melanoma of Skin")).toDF("drug_name", "primary_dx")
    val got = Graft.matchSchema(src, tgt, new HashingProfileEncoder(64))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("diagnosis" -> "primary_dx",
      "medication" -> "drug_name"), got.toString)
  }

  test("ct_learning/gpt errors point at the TextEncoder seam") {
    val df = Seq(("a", "b")).toDF("x", "y")
    val e1 = intercept[UnsupportedOperationException](
      Graft.matchSchema(df, df, method = "ct_learning"))
    assert(e1.getMessage.contains("TextEncoder"), e1.getMessage)
    val e2 = intercept[UnsupportedOperationException](
      Graft.matchValues(df, "x", df, "y", method = "gpt"))
    assert(e2.getMessage.contains("TextEncoder"), e2.getMessage)
  }

  test("extractMain: a new <a> auto-closes an unclosed one (no document-wide poisoning)") {
    import graft.text.HtmlMainExtract
    // the first anchor is never closed; the second anchor's open tag
    // must supersede it (browsers forbid nested anchors), and its
    // real </a> returns to non-link state — the final paragraph is
    // plain text and must be kept
    val html = "<body><div><a href=\"/x\">dangling" +
      "<a href=\"/y\">second</a> trailing plain words add up</div>" +
      "<p>clean paragraph kept intact here</p></body>"
    val got = HtmlMainExtract.extractMain(html)
    assert(got.contains("clean paragraph kept intact here"), got)
    // the first block dies on density alone: 'danglingsecond' links
    // 14 of 37 non-space chars, 3*14 = 42 > 37 — bounded poisoning,
    // not document-wide (the kept paragraph above proves that)
    assert(got == "clean paragraph kept intact here", got)
  }

  test("CovUpperSumAgg: one-pass Gram equals the hand computation; partition-order invariant; overflow refuses") {
    import graft.functions.CovUpperSumAgg
    // 5 centered 3-vectors with exact decimal coordinates
    val rows = Seq(
      Seq(0.5, -1.25, 2.0), Seq(-0.5, 0.75, -1.0), Seq(1.5, 0.25, 0.0),
      Seq(-2.0, 1.0, 0.5), Seq(0.5, -0.75, -1.5)).map(v => Tuple1(v))
    val df = rows.toDF("cv0")
    def run(d: org.apache.spark.sql.DataFrame): Seq[Long] =
      d.agg(CovUpperSumAgg.covUpperSumAgg(F.col("cv0"), 3).as("s"))
        .head().getSeq[Long](0)
    val got = run(df)
    // hand Gram: sum over rows of round(x_i*x_j*1e12), i <= j row-major
    val vecs = rows.map(_._1)
    val want = for (i <- 0 until 3; j <- i until 3) yield
      vecs.map(v => Math.round(v(i) * v(j) * 1e12)).sum
    assert(got == want, s"gram cells: $got vs $want")
    // partition-order invariance: exact long sums commute
    assert(run(df.repartition(7)) == want, "repartitioned gram must be identical")
    // nulls are skipped, dim mismatch refuses loudly
    val withNull = df.unionAll(Seq(Tuple1(null.asInstanceOf[Seq[Double]])).toDF("cv0"))
    assert(run(withNull) == want, "null vectors must not contribute")
    val bad = intercept[Exception] {
      Seq(Tuple1(Seq(1.0, 2.0))).toDF("cv0")
        .agg(CovUpperSumAgg.covUpperSumAgg(F.col("cv0"), 3)).head()
    }
    assert(bad.getMessage != null)
    // per-product magnitude guard: a 1e7-scale coordinate blows the
    // 1e-12 fixed-point range and must refuse, not wrap
    val huge = intercept[Exception] {
      Seq(Tuple1(Seq(3.0e6, 0.0, 0.0))).toDF("cv0")
        .agg(CovUpperSumAgg.covUpperSumAgg(F.col("cv0"), 3)).head()
    }
    assert(huge.getMessage.contains("fixed-point") ||
      (huge.getCause != null && huge.getCause.getMessage.contains("fixed-point")),
      s"overflow must name the guard: ${huge.getMessage}")
  }

  test("PcaProjectExpr: kernel equals the declarative round9/decimal9 fold bit-for-bit") {
    import graft.functions.PcaProjectExpr
    // adversarial coordinates: exact decimals, 9dp rounding-boundary
    // values (t*1e9 lands on .5), negatives, tiny magnitudes
    val vecs = (0 until 200).map { i =>
      (i.toLong, Seq.tabulate(8) { j =>
        val r = new scala.util.Random(i * 31 + j)
        r.nextInt(5) match {
          case 0 => (r.nextInt(2001) - 1000) / 1000.0f          // exact 3dp
          case 1 => ((r.nextInt(2001) - 1000) + 0.5f) / 1e9.toFloat // .5 boundary at 9dp
          case 2 => r.nextFloat() * 2e-9f - 1e-9f               // sub-grid tiny
          case 3 => (r.nextFloat() - 0.5f) * 200f               // large
          case _ => r.nextFloat() - 0.5f
        }
      })
    }.toDF("vec_id", "embedding")
    val mu = Seq.tabulate(8)(j => j * 0.0625 - 0.25)
    val comps = Seq.tabulate(3)(c => Seq.tabulate(8)(j =>
      math.cos(c + j * 0.7) * (if ((c + j) % 3 == 0) 1e-4 else 1.0)))
    // the declarative chain PcaProjectExpr replaced (the oracle's
    // arithmetic): per-term round9 -> decimal(28,9), exact decimal
    // fold, cast double, round 6
    val muL = F.typedlit(mu)
    val declCols = comps.map { w =>
      val wL = F.typedlit(w)
      val terms = F.zip_with(
        F.transform(F.col("embedding"), x => x.cast("double")),
        F.sequence(F.lit(0), F.lit(7)),
        (x, i) => F.round(F.element_at(wL, i + 1) * (x - F.element_at(muL, i + 1)), 9)
          .cast("decimal(28,9)"))
      F.round(F.aggregate(terms,
          F.lit(BigDecimal(0)).cast("decimal(30,9)"),
          (acc, t) => (acc + t).cast("decimal(30,9)")).cast("double"), 6)
    }
    val decl = vecs.select(F.col("vec_id"), F.array(declCols: _*).as("proj"))
      .orderBy("vec_id").collect().map(_.getSeq[Double](1))
    val kern = vecs.select(F.col("vec_id"),
        PcaProjectExpr.pcaProject(F.col("embedding"), mu, comps).as("proj"))
      .orderBy("vec_id").collect().map(_.getSeq[Double](1))
    decl.zip(kern).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a == b, s"row $i: declarative $a != kernel $b")
    }
  }

  test("semanticOverlap: planted cross-split twin flagged at 1.0, orthogonal not, report total") {
    import graft.dedup.Decontaminate
    // 4-dim toy corpus: train 1 duplicates eval 10's embedding
    // exactly (the paraphrased-leak stand-in), train 2 is orthogonal
    // to every eval vector, train 3 is a near-copy (cos ~ 0.9999)
    val rows = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 1.0f)),
      (3L, Seq(1.0f, 0.01f, 0.0f, 0.0f)),
      (10L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (20L, Seq(0.0f, 1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Decontaminate.semanticOverlap(
        rows.where($"vec_id" < 10), "vec_id", "embedding",
        rows.where($"vec_id" >= 10), "embedding", tau = 0.8)
      .orderBy("vec_id")
      .as[(Long, Double, Boolean)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 3L), s"one row per TRAIN vector: $got")
    assert(got(0) == ((1L, 1.0, true)), s"exact twin must flag at 1.0: ${got(0)}")
    assert(!got(1)._3 && got(1)._2 == 0.0, s"orthogonal must not flag: ${got(1)}")
    assert(got(2)._3 && got(2)._2 > 0.999, s"near-copy must flag: ${got(2)}")
    // the flag compares the ROUNDED sim — a value that rounds to
    // exactly tau is contaminated on both engines
    val edge = Decontaminate.semanticOverlap(
        Seq((1L, Seq(0.8f, math.sqrt(1 - 0.64).toFloat, 0.0f, 0.0f)))
          .toDF("vec_id", "embedding"), "vec_id", "embedding",
        Seq(Tuple1(Seq(1.0f, 0.0f, 0.0f, 0.0f))).toDF("embedding"),
        "embedding", tau = 0.8)
      .as[(Long, Double, Boolean)].head()
    assert(edge._3 == (edge._2 >= 0.8), s"flag must follow the rounded sim: $edge")
  }
}
