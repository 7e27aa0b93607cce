package graft

import graft.operators.AsOfJoin
import graft.streaming.Events
import org.apache.spark.sql.{functions => F}

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("asof join attaches latest right row at or before left time, per key") {
    val left = Seq(
      (1L, "u1", 100L), (2L, "u1", 205L), (3L, "u2", 50L), (4L, "u3", 10L)
    ).toDF("event_id", "user_id", "ts_us")
    val right = Seq(
      ("u1", 100L, "a"), ("u1", 200L, "b"), ("u2", 60L, "c")
    ).toDF("user_id", "r_ts", "payload")
    val out = AsOfJoin(left, right, key = "user_id",
      leftTime = "ts_us", rightTime = "r_ts", payload = Seq("payload"))
      .select("event_id", "payload").as[(Long, Option[String])]
      .collect().toMap
    assert(out(1L).contains("a"), "equal timestamps match (<= semantics)")
    assert(out(2L).contains("b"), "latest right row before left time wins")
    assert(out(3L).isEmpty, "right row after left time is invisible")
    assert(out(4L).isEmpty, "key with no right rows stays null")
    // FORWARD direction on the same data: the mirror-image contract
    val fwd = AsOfJoin(left, right, key = "user_id",
      leftTime = "ts_us", rightTime = "r_ts", payload = Seq("payload"),
      direction = "forward")
      .select("event_id", "payload").as[(Long, Option[String])]
      .collect().toMap
    assert(fwd(1L).contains("a"), "equal timestamps match (>= semantics)")
    assert(fwd(2L).isEmpty, "no right row at or after 205")
    assert(fwd(3L).contains("c"), "next right row after left time wins")
    assert(fwd(4L).isEmpty, "key with no right rows stays null")
  }

  test("bucketized range join equals the naive inequality join") {
    val rnd = new scala.util.Random(3)
    val left = (0 until 80).map(i =>
      (i.toLong, (i % 5).toLong, rnd.nextInt(100000).toLong)).toDF("lid", "k", "lt")
    val right = (0 until 120).map(i =>
      (i.toLong, (i % 5).toLong, rnd.nextInt(100000).toLong)).toDF("rid", "k", "rt")
    val (before, after) = (7000L, 3000L)
    val naive = left.join(right, left("k") === right("k") &&
        right("rt") >= left("lt") - before && right("rt") <= left("lt") + after)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val bucketized = graft.operators.RangeJoin
      .timeRange(left, right, "k", "lt", "rt", before, after)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(bucketized == naive)
  }

  test("sessionize splits on gap, aggregates per session") {
    val us = 60L * 1000 * 1000 // 1 minute
    val events = Seq(
      (1L, "2024-01-01 00:00:00", 7L, "click"),
      (2L, "2024-01-01 00:10:00", 7L, "view"),
      (3L, "2024-01-01 01:00:00", 7L, "click"), // 50-min gap → new session
      (4L, "2024-01-01 00:00:00", 8L, "click")
    ).map { case (id, t, u, ty) => (id, java.sql.Timestamp.valueOf(t), u, ty) }
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = Events.sessionize(events, gapMinutes = 30)
      .orderBy("user_id", "session_start_us")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.length == 3)
    val (u7a, u7b, u8) = (out(0), out(1), out(2))
    assert(u7a._4 == 2 && u7a._5 == 2, "first session: 2 events, 2 types")
    assert(u7b._4 == 1)
    assert(u8._1 == 8L && u8._4 == 1)
    assert(u7a._3 - u7a._2 == 10 * us, "session span = first..last event")
  }

  test("streaming sessionize equals batch sessionize (flatMapGroupsWithState)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val data = Seq(
      (1L, "2024-01-01 00:00:00", 7L, "click"),
      (2L, "2024-01-01 00:10:00", 7L, "view"),
      (3L, "2024-01-01 01:00:00", 7L, "click"), // 50-min gap → session 2
      (4L, "2024-01-01 00:00:00", 8L, "click")
    ).map { case (id, t, u, ty) => (id, java.sql.Timestamp.valueOf(t), u, ty) }

    val stream = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    stream.addData(data: _*)
    val streamed = Events.streamingSessionize(
      stream.toDF().toDF("event_id", "ts", "user_id", "event_type"),
      gapMinutes = 30, watermark = "0 seconds")
    val q = streamed.writeStream.format("memory")
      .queryName("sessions").outputMode("append").start()
    try {
      q.processAllAvailable()
      // push watermark far past every session end + gap → timeouts fire
      stream.addData((99L, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"), 999L, "sentinel"))
      q.processAllAvailable()
      stream.addData((100L, java.sql.Timestamp.valueOf("2024-01-03 00:00:00"), 999L, "sentinel"))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sessions")
      .where($"user_id" =!= 999L)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val batch = Events.sessionize(
      data.toDF("event_id", "ts", "user_id", "event_type"), gapMinutes = 30)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == batch, s"streaming $got != batch $batch")
  }

  test("stream-static enrichment attaches dimension attributes per batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val dim = Seq((7L, "gold"), (8L, "basic")).toDF("user_id", "tier")
    val stream = MemoryStream[(Long, Long)]
    val enriched = Events.streamingEnrich(
      stream.toDF().toDF("event_id", "user_id"), dim, "user_id", Seq("tier"))
    val q = enriched.writeStream.format("memory")
      .queryName("enriched").outputMode("append").start()
    try {
      stream.addData((1L, 7L), (2L, 8L), (3L, 99L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("enriched").select("event_id", "tier")
      .as[(Long, Option[String])].collect().toMap
    assert(got == Map(1L -> Some("gold"), 2L -> Some("basic"), 3L -> None))
  }

  test("streaming near-dup ingest: each batch probes all PRIOR batches via the persisted index") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.dedup.Dedup
    import graft.streaming.StreamingDedup
    implicit val sq = spark.sqlContext
    // bootstrap: empty corpus + signature index tables (clear leftovers
    // from a crashed previous run first — catalog entry AND location)
    for (t <- Seq("stream_nd_corpus", "stream_nd_idx")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (java.nio.file.Files.exists(loc))
        java.nio.file.Files.walk(loc).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { java.nio.file.Files.delete(p); () })
    }
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    StreamingDedup.bootstrap(empty, "stream_nd_corpus", "stream_nd_idx",
      "doc_id", "text", k = 3, numHashes = 64, bands = 16, nBuckets = 4)
    val perBatch = scala.collection.mutable.Map[Long, Set[(Long, Long)]]()
    val stream = MemoryStream[(Long, String)]
    val q = StreamingDedup.nearDupIngest(
      stream.toDF().toDF("doc_id", "text"),
      "stream_nd_corpus", "stream_nd_idx",
      "doc_id", "text", k = 3, numHashes = 64, bands = 16,
      threshold = 0.4, nBuckets = 4,
      // the checkpoint is a hard correctness requirement across
      // restarts (monotone batch ids) — exercised here even though a
      // single-run MemoryStream test never restarts
      checkpointDir = Some(java.nio.file.Files
        .createTempDirectory("stream_nd_ckpt").toString)) { (pairs, batchId) =>
      perBatch.synchronized {
        perBatch(batchId) = pairs.select("id1", "id2")
          .as[(Long, Long)].collect().toSet
      }
    }
    try {
      stream.addData(
        (1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "the quick brown fox jumps over the lazy dog"))
      q.processAllAvailable()
      stream.addData(
        (10L, "the quick brown fox jumps over the sleepy dog"),
        (11L, "completely different words entirely unrelated text here"))
      q.processAllAvailable()
    } finally q.stop()
    // batch 0: only the within-batch exact pair
    assert(perBatch(0L) == Set((1L, 2L)), s"batch0=${perBatch.get(0L)}")
    // batch 1: cross-batch near-dups found through the APPENDED index;
    // prior existing x existing pairs are not re-emitted
    assert(perBatch(1L) == Set((1L, 10L), (2L, 10L)), s"batch1=${perBatch.get(1L)}")
    // and the state tables now hold the whole history, each row tagged
    // with its ingest batch (the at-least-once idempotence lineage)
    assert(spark.table("stream_nd_corpus").count() == 4)
    assert(spark.table("stream_nd_idx").select("id").distinct().count() == 4)
    assert(spark.table("stream_nd_corpus").select("ingest_batch")
      .as[Long].collect().toSet == Set(0L, 1L))
    for (t <- Seq("stream_nd_corpus", "stream_nd_idx"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("at-least-once replay: duplicated appends do not corrupt later batches") {
    // simulate a crashed-and-retried ingest: batch A's corpus rows and
    // index rows exist TWICE; a later batch B must still compute each
    // near-dup pair exactly once with the correct jaccard (candidate
    // distinct + candidate-sized id dedup absorb the duplicates)
    import graft.dedup.Dedup
    val batchA = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different words entirely unrelated text here")
    ).toDF("doc_id", "text")
    val batchB = Seq(
      (10L, "the quick brown fox jumps over the sleepy dog")
    ).toDF("doc_id", "text")
    val dupCorpus = batchA.unionAll(batchA) // replayed append
    val dupBanded = Dedup.minhashBanded(dupCorpus, "doc_id", "text", 3, 64, 16)
    val got = Dedup.incrementalNearDupPairs(batchB, dupCorpus, dupBanded,
        "doc_id", "text", k = 3, numHashes = 64, bands = 16, threshold = 0.4)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    val clean = Dedup.incrementalNearDupPairs(batchB, batchA,
        Dedup.minhashBanded(batchA, "doc_id", "text", 3, 64, 16),
        "doc_id", "text", k = 3, numHashes = 64, bands = 16, threshold = 0.4)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(got == clean && got.map(p => (p._1, p._2)) == Seq((1L, 10L)),
      s"duplicated state changed the result: got=$got clean=$clean")
  }

  test("streaming curation: stateless quality filter equals its batch twin") {
    // the whole per-row curation suite (quality verdicts, sampling,
    // scrubbing, profile kernels) is stateless, so it composes onto a
    // stream UNCHANGED — the ingest-time filtering shape of a
    // training-data pipeline; no watermark, no state store
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.text.Curate
    implicit val sq = spark.sqlContext
    val docs = Seq(
      (1L, "the cat sat on the mat with a dog"),
      (2L, "tiny"),
      (3L, "spam spam spam spam spam the and is of it"),
      (4L, "a second clean document is here for it"))
    def curateCols(df: org.apache.spark.sql.DataFrame) = {
      val v = Curate.qualityVerdict(F.col("text")).toMap
      df.select(F.col("doc_id"), v("keep").as("keep"), v("reason").as("reason"))
        .where(F.col("keep"))
        .select("doc_id")
    }
    val batch = curateCols(docs.toDF("doc_id", "text")).as[Long].collect().toSet
    val stream = MemoryStream[(Long, String)]
    val q = curateCols(stream.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("stream_curate")
      .outputMode("append").start()
    try {
      stream.addData(docs.take(2): _*)
      stream.addData(docs.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("stream_curate").as[Long].collect().toSet
    assert(got == batch && got == Set(1L, 4L), s"stream $got != batch $batch")
  }

  test("funnel: greedy earliest completion, gap cutoffs, order sensitivity") {
    def ev(u: Long, t: Long, typ: String) =
      (u * 1000 + t, new java.sql.Timestamp(t * 60000L), u, typ)
    val events = Seq(
      // user 1 completes all three in order within the gap
      ev(1, 0, "view"), ev(1, 10, "click"), ev(1, 20, "purchase"),
      // user 2: click BEFORE the first view never counts; the later
      // click is past the 30-min gap -> depth 1
      ev(2, 0, "click"), ev(2, 5, "view"), ev(2, 40, "click"),
      // user 3: click in gap, purchase too late after it -> depth 2
      ev(3, 0, "view"), ev(3, 29, "click"), ev(3, 65, "purchase"),
      // user 4: no view at all -> absent from the funnel
      ev(4, 0, "click"), ev(4, 1, "purchase"),
      // user 5: GREEDY earliest click (t=5) is binding even though
      // the later click (t=25) would let the purchase (t=50) land
      ev(5, 0, "view"), ev(5, 5, "click"), ev(5, 25, "click"),
      ev(5, 50, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = Events.funnel(events, Seq("view", "click", "purchase"),
        maxGapMinutes = 30)
      .orderBy("user_id")
      .select("user_id", "steps_completed").as[(Long, Int)].collect()
    assert(got.toSeq == Seq((1L, 3), (2L, 1), (3L, 2), (5L, 2)), got.toSeq)
  }

  test("retention: cohort by first-event period, offsets counted once") {
    val day = 24L * 3600 * 1000
    def ev(u: Long, d: Long, i: Long) =
      (u * 100 + i, new java.sql.Timestamp(d * day + i * 60000), u, "view")
    val events = Seq(
      // user 1: cohort day 0, active days 0, 1, 3 (two events day 1
      // must count once)
      ev(1, 0, 1), ev(1, 1, 2), ev(1, 1, 3), ev(1, 3, 4),
      // user 2: cohort day 1, active days 1, 2
      ev(2, 1, 1), ev(2, 2, 2),
      // user 3: cohort day 0, active day 0 only
      ev(3, 0, 1))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = Events.retention(events, periodDays = 1, maxPeriods = 8)
      .orderBy("cohort_period_us", "period_offset")
      .select("period_offset", "n_users")
      .as[(Int, Long)].collect().toSeq
    // day-0 cohort: offsets 0 (u1+u3), 1 (u1), 3 (u1);
    // day-1 cohort: offsets 0 (u2), 1 (u2)
    assert(got == Seq((0, 2L), (1, 1L), (3, 1L), (0, 1L), (1, 1L)), got)
  }

  test("valueOutliers: per-type exact-percentile cutoff, strict exceedance") {
    // type A: values 1..100 -> p90 cutoff interpolates to 90.1; only
    // 91..100 exceed it. type B: constant values -> cutoff == value,
    // strict > keeps nothing.
    val events = ((1 to 100).map(i =>
      (i.toLong, new java.sql.Timestamp(i * 1000L), 1L, "A", i.toDouble, "")) ++
      (1 to 10).map(i =>
        (1000L + i, new java.sql.Timestamp(i * 1000L), 2L, "B", 5.0, "")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.valueOutliers(events, q = 0.9)
      .orderBy("event_id")
      .as[(Long, String, Double, Double)].collect().toSeq
    assert(got.map(_._1) == (91L to 100L), s"got $got")
    assert(got.forall(r => r._2 == "A" && r._4 == 90.1), s"got $got")
  }

  test("streaming chunking: the narrow chunk op equals its batch twin") {
    // chunkTokens is a pure narrow transformation (tokenize, sequence
    // explode, slice) — it composes onto a stream unchanged, the
    // ingest-time chunking pass of a RAG indexing pipeline; no
    // watermark, no state store
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.text.Curate
    implicit val sq = spark.sqlContext
    val docs = Seq(
      (1L, (1 to 19).map(i => s"w$i").mkString(" ")),
      (2L, "short doc"),
      (3L, ""))
    def chunks(df: org.apache.spark.sql.DataFrame) =
      Curate.chunkTokens(df, "doc_id", "text", chunkSize = 8, stride = 6)
    val batch = chunks(docs.toDF("doc_id", "text"))
      .as[(Long, Int, Int, Int, String)].collect().toSet
    val stream = MemoryStream[(Long, String)]
    val q = chunks(stream.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("stream_chunks")
      .outputMode("append").start()
    try {
      stream.addData(docs.take(1): _*)
      stream.addData(docs.drop(1): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("stream_chunks")
      .as[(Long, Int, Int, Int, String)].collect().toSet
    assert(got == batch, s"stream $got != batch $batch")
    assert(batch.count(_._1 == 1L) == 3 && batch.count(_._1 == 2L) == 1)
  }

  test("streaming dedup drops repeated content within the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val deduped = Events.streamingDedup(
      stream.toDF().toDF("event_id", "ts", "content_hash"),
      hashCols = Seq("content_hash"), watermark = "1 hour")
    val q = deduped.writeStream.format("memory")
      .queryName("stream_dedup").outputMode("append").start()
    try {
      stream.addData(
        (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "h1"),
        (2L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), "h1"), // dup
        (3L, java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), "h2"))
      q.processAllAvailable()
      stream.addData(
        (4L, java.sql.Timestamp.valueOf("2024-01-01 00:30:00"), "h1")) // dup, within horizon
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.table("stream_dedup").select("content_hash")
      .as[String].collect().sorted.toSeq
    assert(kept == Seq("h1", "h2"), s"got $kept")
  }

  test("streaming incremental ingest: in-stream dups and corpus-seen texts dropped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val existing = Seq((1L, "seen text here")).toDF("doc_id", "text")
    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = Events.streamingIncrementalNew(
      stream.toDF().toDF("doc_id", "ts", "text"), existing, "text",
      watermark = "1 hour")
    val q = out.writeStream.format("memory")
      .queryName("stream_incr").outputMode("append").start()
    try {
      stream.addData(
        (10L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "seen text here"),
        (11L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), "brand new text"),
        (12L, java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), "brand new text"))
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.table("stream_incr").select("doc_id").as[Long].collect().toSet
    assert(kept == Set(11L), s"got $kept")
  }

  test("streaming SEMANTIC ingest: batches probe prior batches under the frozen quantizer") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingDedup
    implicit val sq = spark.sqlContext
    for (t <- Seq("stream_sem_corpus", "stream_sem_cells")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (java.nio.file.Files.exists(loc))
        java.nio.file.Files.walk(loc).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { java.nio.file.Files.delete(p); () })
    }
    def vec(seed: Int): Seq[Float] =
      Seq.tabulate(8)(j => (seed * 10 + j).toFloat)
    // initial corpus: two well-separated directions
    val initial = Seq((100L, vec(1)), (101L, vec(5))).toDF("vec_id", "embedding")
    val cdir = java.nio.file.Files.createTempDirectory("sem_cents").toString
    StreamingDedup.semanticBootstrap(initial, "stream_sem_corpus",
      "stream_sem_cells", s"$cdir/centroids", "vec_id", "embedding",
      nCells = 2, nProbe = 2, nBuckets = 2)
    val perBatch = scala.collection.mutable.Map[Long, Set[(Long, Long)]]()
    val stream = MemoryStream[(Long, Seq[Float])]
    val q = StreamingDedup.semanticIngest(
      stream.toDF().toDF("vec_id", "embedding"),
      "stream_sem_corpus", "stream_sem_cells", s"$cdir/centroids",
      "vec_id", "embedding", threshold = 0.999, nProbe = 2, nBuckets = 2,
      checkpointDir = Some(java.nio.file.Files
        .createTempDirectory("stream_sem_ckpt").toString)) { (pairs, batchId) =>
      perBatch.synchronized {
        perBatch(batchId) = pairs.select("id1", "id2")
          .as[(Long, Long)].collect().toSet
      }
    }
    try {
      // batch 0: one vector parallel to corpus doc 100, one orthogonal-ish
      stream.addData((10L, vec(1).map(_ * 2)), (11L, vec(9)))
      q.processAllAvailable()
      // batch 1: parallel to batch 0's 11 — found via the APPENDED cells
      stream.addData((20L, vec(9).map(_ * 3)))
      q.processAllAvailable()
    } finally q.stop()
    assert(perBatch(0L).contains((10L, 100L)),
      s"batch0 must pair with the bootstrap corpus: ${perBatch.get(0L)}")
    assert(perBatch(1L).contains((11L, 20L)),
      s"batch1 must pair with batch0 via the appended cells: ${perBatch.get(1L)}")
    assert(!perBatch(1L).contains((10L, 100L)),
      "prior existing pairs are not re-emitted")
    assert(spark.table("stream_sem_corpus").count() == 5)
    assert(spark.table("stream_sem_cells").select("ingest_batch")
      .as[Long].collect().toSet == Set(-1L, 0L, 1L))
    for (t <- Seq("stream_sem_corpus", "stream_sem_cells"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("streaming SEARCH ingest: live index equals the batch scorer; stats roll-up replay-idempotent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingSearch
    implicit val sq = spark.sqlContext
    for (t <- Seq("stream_bm25_post", "stream_bm25_stats"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
    val initial = Seq((1L, "apple banana apple"), (2L, "banana cherry"))
      .toDF("doc_id", "text")
    StreamingSearch.bootstrap(initial, "stream_bm25_post",
      "stream_bm25_stats", "doc_id", "text", nBuckets = 2)
    val stream = MemoryStream[(Long, String)]
    val q = StreamingSearch.ingest(stream.toDF().toDF("doc_id", "text"),
      "stream_bm25_post", "stream_bm25_stats", "doc_id", "text", nBuckets = 2)
    try {
      stream.addData((3L, "apple date date"), (4L, ""))
      q.processAllAvailable()
      stream.addData((5L, "cherry apple banana"))
      q.processAllAvailable()
    } finally q.stop()
    // the live index must score exactly like the inline batch operator
    // over the same (initial + streamed) corpus
    val corpus = initial.unionAll(Seq((3L, "apple date date"), (4L, ""),
      (5L, "cherry apple banana")).toDF("doc_id", "text"))
    val queries = Seq(0 -> "apple cherry", 1 -> "date")
    val live = StreamingSearch.query(spark, "stream_bm25_post",
        "stream_bm25_stats", queries, k = 10)
      .as[(Int, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    val inline = graft.text.Search.bm25TopK(corpus, "doc_id", "text",
        queries, k = 10)
      .as[(Int, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    assert(live == inline && live.nonEmpty, s"live=$live inline=$inline")
    // replay idempotence of the stats roll-up: a duplicated per-batch
    // stats row (foreachBatch at-least-once) must not change scores
    spark.table("stream_bm25_stats").where(F.col("ingest_batch") === 1L)
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .saveAsTable("stream_bm25_stats")
    val replayed = StreamingSearch.query(spark, "stream_bm25_post",
        "stream_bm25_stats", queries, k = 10)
      .as[(Int, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    assert(replayed == inline, "duplicate stats row must collapse")
    // lineage column present on the postings for partition-filter
    // cleanup of a crashed batch
    assert(spark.table("stream_bm25_post").select("ingest_batch")
      .as[Long].collect().toSet == Set(-1L, 0L, 1L))
    for (t <- Seq("stream_bm25_post", "stream_bm25_stats"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("streaming ANN ingest: live composed index equals the one-shot frozen-train build; lineage stamped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingSearch
    import graft.similarity.Ann
    implicit val sq = spark.sqlContext
    def vec(i: Long): Seq[Float] =
      Seq.tabulate(8)(j => ((i * (j + 3) * 37) % 101) / 50.0f - 1.0f)
    val initial = (0L until 12L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val b1 = (12L until 18L).map(i => (i, vec(i)))
    val b2 = (18L until 24L).map(i => (i, vec(i)))
    val path = java.nio.file.Files.createTempDirectory("annstream").toString
    Ann.ivfpqBuild(initial, "vec_id", "embedding", path,
      nCells = 4, m = 4, ksub = 4, iters = 2)
    val stream = MemoryStream[(Long, Seq[Float])]
    val q = StreamingSearch.annIngest(
      stream.toDF().toDF("vec_id", "embedding"), path, "vec_id", "embedding")
    try {
      stream.addData(b1: _*)
      q.processAllAvailable()
      stream.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    // the live index must answer exactly like a one-shot build over
    // the unioned corpus under the same (slice-trained) quantizers —
    // the streamed batches were encoded frozen, never re-trained
    val union = initial.unionAll((b1 ++ b2).toDF("vec_id", "embedding"))
    val ref = java.nio.file.Files.createTempDirectory("annstreamref").toString
    Ann.ivfpqBuild(union, "vec_id", "embedding", ref,
      nCells = 4, m = 4, ksub = 4, iters = 2, trainCorpus = Some(initial))
    val queries = union.where($"vec_id" < 3)
    def res(p: String) =
      Ann.ivfpqQueryIndex(spark, p, queries, "vec_id", "embedding",
        union, "vec_id", "embedding", k = 3, nProbe = 2, rerank = 4)
        .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._3)).toSeq
    val live = res(path)
    assert(live.nonEmpty && live == res(ref),
      "live streamed index must equal the one-shot frozen-train build")
    // per-batch lineage for the crash/replay cleanup contract
    assert(spark.read.parquet(s"$path/codes").select("ingest_batch")
      .as[Long].collect().toSet == Set(-1L, 0L, 1L))
  }

  test("stream-stream attribution join: watermarked pairs equal the batch join; last-touch argmax hand-checked") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.Events
    implicit val sq = spark.sqlContext
    // timestamps far from the epoch: an event AT the epoch sits
    // exactly on the initial watermark and gets dropped as late input
    val base = 1700000000000L
    def t(min: Long) = new java.sql.Timestamp(base + min * 60000L)
    // user 1: two clicks inside the 6 h window of its conversion;
    // user 2: click 490 min before the conversion — outside; user 3
    // converts with no click at all
    val clicks = Seq((1L, t(0), 100L), (1L, t(50), 101L), (2L, t(10), 102L))
    val convs = Seq((1L, t(60), 200L), (2L, t(500), 201L), (3L, t(30), 202L))
    val cb = clicks.toDF("user_id", "ts", "event_id")
    val pb = convs.toDF("user_id", "ts", "event_id")
    val batch = Events.attributionPairs(cb, pb)
      .select("click_id", "conv_id").as[(Long, Long)].collect().toSet
    assert(batch == Set((100L, 200L), (101L, 200L)), s"batch $batch")
    // the SAME join as a stream-stream inner join: both sides
    // unbounded, watermarks + the event-time bound let state expire
    val cs = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val ps = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val out = Events.streamAttributionPairs(
      cs.toDF().toDF("user_id", "ts", "event_id"),
      ps.toDF().toDF("user_id", "ts", "event_id"))
    val q = out.select("click_id", "conv_id").writeStream.format("memory")
      .queryName("stream_attr").outputMode("append").start()
    try {
      cs.addData(clicks: _*)
      q.processAllAvailable()
      ps.addData(convs: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("stream_attr").as[(Long, Long)].collect().toSet
    assert(got == batch, s"stream $got != batch $batch")
    // last-touch: conversion 200 credits the LATER click (101), with
    // both candidates counted; gap = 10 min in exact microseconds
    val lt = Events.lastTouchAttribution(Events.attributionPairs(cb, pb))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(lt == Seq((200L, 1L, base * 1000L + 60L * 60000000L, 101L,
      base * 1000L + 50L * 60000000L, 10L * 60000000L, 2L)), s"last-touch $lt")
  }

  test("seasonalAnomalies: hand-computed dow baseline, integer z-test, single-sample dow never flags") {
    import graft.streaming.Events
    def rows(day: Long, n: Int): Seq[(String, java.sql.Timestamp)] =
      (1 to n).map(_ => ("click", new java.sql.Timestamp(day * 86400000L)))
    // dow 0 over three weeks: counts 10, 10, 22 -> S=42, Q=684,
    // nQ-S^2=288; c=22: (3*22-42)^2=576 > 1*288 -> flagged at 1 sigma,
    // c=10: 144 < 288 -> not; dow 1 has ONE sample -> lhs=rhs=0 ->
    // never flagged (strict inequality)
    val events = (rows(0, 10) ++ rows(7, 10) ++ rows(14, 22) ++ rows(1, 5))
      .toDF("event_type", "ts")
    val got = Events.seasonalAnomalies(events, sigmas = 1)
      .orderBy("day_us")
      .as[(String, Long, Int, Long, Long, Double, Boolean)].collect().toSeq
    assert(got.map(r => (r._2 / 86400000000L, r._4, r._7)) ==
      Seq((0L, 10L, false), (1L, 5L, false), (7L, 10L, false), (14L, 22L, true)),
      s"got $got")
    // baseline columns: dow-0 rows carry n_dow=3, mean 14.0
    val d0 = got.filter(_._3 == 0)
    assert(d0.forall(r => r._5 == 3L && r._6 == 14.0))
    // at 2 sigma the same spike is inside the band: 576 < 4*288
    val g2 = Events.seasonalAnomalies(events, sigmas = 2)
      .as[(String, Long, Int, Long, Long, Double, Boolean)].collect()
    assert(g2.forall(!_._7))
  }

  test("lateArrivals: hand-computed disorder — running max, lateness gaps, per-type rollup") {
    import graft.streaming.Events
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // user 1 'click': arrival order carries times 100, 50, 120, 110 —
    // arrivals 2/4 are late by 50 s and 10 s; user 2 'click' is in
    // order; user 3 'view' has one late event by 5 s
    val events = Seq(
      ("click", 1L, 1L, ts(100)),
      ("click", 1L, 2L, ts(50)),
      ("click", 1L, 3L, ts(120)),
      ("click", 1L, 4L, ts(110)),
      ("click", 2L, 1L, ts(10)),
      ("click", 2L, 2L, ts(20)),
      ("view", 3L, 1L, ts(7)),
      ("view", 3L, 2L, ts(2))).toDF("event_type", "user_id", "arrival", "ts")
    val got = Events.lateArrivals(events, "event_type", "user_id", "arrival", "ts")
      .orderBy("event_type")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("click", 6L, 2L, 2L, 1L, 60000000L, 50000000L),
      ("view", 2L, 1L, 1L, 1L, 5000000L, 5000000L)), s"got $got")
  }

  test("streaming window agg equals batch window agg (MemoryStream)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val data = Seq(
      ("2024-01-01 00:05:00", "click", 1.0, 7L),
      ("2024-01-01 00:55:00", "click", 2.0, 8L),
      ("2024-01-01 01:05:00", "view", 4.0, 7L),
      ("2024-01-01 02:10:00", "click", 8.0, 9L)
    ).map { case (t, ty, v, u) => (java.sql.Timestamp.valueOf(t), ty, v, u) }

    val stream = MemoryStream[(java.sql.Timestamp, String, Double, Long)]
    stream.addData(data: _*)
    // watermark 0s: after each batch the watermark jumps to max seen
    // event time, finalizing every window that has ended by then
    val streamed = Events.streamingWindowAgg(
      stream.toDF().toDF("ts", "event_type", "value", "user_id"),
      watermark = "0 seconds")
    val q = streamed.writeStream.format("memory")
      .queryName("win_agg").outputMode("append").start()
    try {
      q.processAllAvailable()
      // sentinel far in the future closes the last real window; its own
      // (still-open) window is never emitted
      stream.addData((java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), "sentinel", 0.0, 0L))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("win_agg")
      .select("hour_start_us", "event_type", "n_events", "sum_value")
      .as[(Long, String, Long, Double)].collect().toSet

    val batch = Events.windowAgg(
      data.toDF("ts", "event_type", "value", "user_id"))
      .select("hour_start_us", "event_type", "n_events", "sum_value")
      .as[(Long, String, Long, Double)].collect().toSet

    assert(got == batch, s"streaming $got != batch $batch")
  }

  test("streaming SLIDING window agg equals batch slidingAgg (MemoryStream)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val data = Seq(
      ("2024-01-01 00:05:00", "click", 1.0, 7L),
      ("2024-01-01 00:20:00", "click", 2.0, 8L),
      ("2024-01-01 00:55:00", "view", 4.0, 7L),
      ("2024-01-01 01:40:00", "click", 8.0, 9L)
    ).map { case (t, ty, v, u) => (java.sql.Timestamp.valueOf(t), ty, v, u) }

    val stream = MemoryStream[(java.sql.Timestamp, String, Double, Long)]
    stream.addData(data: _*)
    val streamed = Events.streamingSlidingAgg(
      stream.toDF().toDF("ts", "event_type", "value", "user_id"),
      watermark = "0 seconds")
    val q = streamed.writeStream.format("memory")
      .queryName("slide_agg").outputMode("append").start()
    try {
      q.processAllAvailable()
      stream.addData((java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), "sentinel", 0.0, 0L))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("slide_agg")
      .select("window_start_us", "event_type", "n_events", "sum_value")
      .as[(Long, String, Long, Double)].collect().toSet

    val batch = Events.slidingAgg(
      data.toDF("ts", "event_type", "value", "user_id"))
      .select("window_start_us", "event_type", "n_events", "sum_value")
      .as[(Long, String, Long, Double)].collect().toSet

    assert(got == batch, s"streaming $got != batch $batch")
    // every event must appear in exactly window/slide = 4 windows
    val n = batch.toSeq.map(_._3).sum
    assert(n == 4L * data.length, s"overlap factor: $n != ${4 * data.length}")
  }
}
