package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Pure-JVM WARC (ISO 28500) reader — the container format web crawls
  * actually arrive in (Common Crawl ships ~1 GB `.warc.gz` chunks), so
  * a 100 TB training-data pipeline's first operator is "frame these
  * bytes into records". Same design stance as the image/audio codecs
  * (PngCodec etc.): byte-level framing is not Catalyst-expressible, so
  * it runs as a garbage-safe JVM parser behind `binaryFile` +
  * flatMap, and everything AFTER framing (filtering, dedup, text
  * extraction) is ordinary declarative Spark on the emitted columns.
  *
  * Scale contract: one WARC chunk file = one Spark partition (the
  * crawl's own ~1 GB chunking convention IS the parallelism unit;
  * `binaryFile` keeps a file in one task). Per-record-gzipped
  * `.warc.gz` members concatenate into one gzip stream — JDK
  * GZIPInputStream consumes multi-member streams natively, so both
  * whole-file and per-record compression decode through the same
  * inflate-then-frame path.
  *
  * Garbage safety: framing never throws on malformed input — a record
  * with a bad version line, unparsable Content-Length, or a payload
  * running past EOF ends the iteration (everything already framed is
  * kept); `malformed_tail` reports whether trailing bytes were
  * dropped.
  */
object Warc {

  /** One framed WARC record: protocol headers of interest + payload. */
  final case class WarcRecord(
      warcType: String, targetUri: String, date: String,
      recordId: String, contentType: String, payload: Array[Byte])

  private val CRLF = "\r\n".getBytes("US-ASCII")

  def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xFF) == 0x1F && (b(1) & 0xFF) == 0x8B

  /** Inflate a (possibly multi-member) gzip buffer; raw bytes pass
    * through untouched. Truncated gzip yields the bytes inflated so
    * far (garbage-safe, never throws).
    */
  def gunzipAll(b: Array[Byte]): Array[Byte] = {
    if (!isGzip(b)) return b
    val out = new java.io.ByteArrayOutputStream(math.max(64, b.length * 4))
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b))
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    } catch { case _: java.io.IOException => () /* keep prefix */ }
    out.toByteArray
  }

  /** Frame raw (already-inflated) WARC bytes into records. Returns
    * (records, malformedTail) — malformedTail is true when parsing
    * stopped before consuming all non-whitespace input.
    */
  def parseRecords(bytes: Array[Byte]): (Seq[WarcRecord], Boolean) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var pos = 0
    def lineEnd(from: Int): Int = {
      var i = from
      while (i + 1 < bytes.length &&
        !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 < bytes.length) i else -1
    }
    var ok = true
    while (ok && pos < bytes.length) {
      // skip inter-record CRLFs
      while (pos + 1 < bytes.length && bytes(pos) == '\r' &&
        bytes(pos + 1) == '\n') pos += 2
      if (pos >= bytes.length) { ok = false }
      else {
        val e0 = lineEnd(pos)
        val version = if (e0 < 0) ""
          else new String(bytes, pos, e0 - pos, "US-ASCII")
        if (!version.startsWith("WARC/")) ok = false
        else {
          var p = e0 + 2
          val hdrs = scala.collection.mutable.Map.empty[String, String]
          var open = true
          while (open) {
            val e = lineEnd(p)
            if (e < 0) { open = false; ok = false }
            else if (e == p) { p = e + 2; open = false } // empty line
            else {
              val line = new String(bytes, p, e - p, "US-ASCII")
              val c = line.indexOf(':')
              if (c > 0) hdrs(line.substring(0, c).trim.toLowerCase) =
                line.substring(c + 1).trim
              p = e + 2
            }
          }
          val len = hdrs.get("content-length").flatMap(s =>
            scala.util.Try(s.toLong).toOption).getOrElse(-1L)
          if (!ok || len < 0 || p + len > bytes.length) ok = false
          else {
            out += WarcRecord(
              hdrs.getOrElse("warc-type", ""),
              hdrs.getOrElse("warc-target-uri", ""),
              hdrs.getOrElse("warc-date", ""),
              hdrs.getOrElse("warc-record-id", ""),
              hdrs.getOrElse("content-type", ""),
              java.util.Arrays.copyOfRange(bytes, p, p + len.toInt))
            pos = p + len.toInt
          }
        }
      }
    }
    // any bytes left beyond pure CRLF padding were dropped
    var t = pos
    while (t + 1 < bytes.length && bytes(t) == '\r' && bytes(t + 1) == '\n')
      t += 2
    (out.toSeq, t < bytes.length)
  }

  private val schema = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("record_idx", LongType, nullable = false),
    StructField("warc_type", StringType, nullable = false),
    StructField("target_uri", StringType, nullable = false),
    StructField("warc_date", StringType, nullable = false),
    StructField("record_id", StringType, nullable = false),
    StructField("content_type", StringType, nullable = false),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("malformed_tail", BooleanType, nullable = false)))

  /** Read a directory/glob of `.warc` / `.warc.gz` files into one row
    * per record. One file = one task (binaryFile) = the crawl chunk
    * convention; rasters of work downstream are plain DataFrame ops.
    */
  def readWarc(spark: SparkSession, path: String): DataFrame = {
    val bin = spark.read.format("binaryFile").load(path)
      .select("path", "content")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    bin.flatMap { r =>
      val file = r.getString(0)
      val (recs, bad) = parseRecords(gunzipAll(r.getAs[Array[Byte]](1)))
      recs.iterator.zipWithIndex.map { case (w, i) =>
        Row(file, i.toLong, w.warcType, w.targetUri, w.date, w.recordId,
          w.contentType, w.payload.length.toLong, w.payload, bad)
      }
    }(enc)
  }

  /** WET reader (r20; VERDICT r19 #4): Common Crawl's CONVERSION
    * container — WARC-framed records of `WARC-Type: conversion`
    * whose payload is the page's extracted plain text (UTF-8),
    * one `.wet(.gz)` per crawl chunk. WET is WARC framing with a
    * different record type, so this rides [[readWarc]]'s parser
    * unchanged: filter to conversion records and decode the payload
    * — everything after framing is one codegen'd projection.
    * Returns (file, record_idx, target_uri, warc_date, record_id,
    * text, malformed_tail).
    */
  def readWet(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.{functions => F}
    readWarc(spark, path)
      .where(F.col("warc_type") === "conversion")
      .select(F.col("file"), F.col("record_idx"), F.col("target_uri"),
        F.col("warc_date"), F.col("record_id"),
        F.col("payload").cast("string").as("text"),
        F.col("malformed_tail"))
  }

  /** WAT reader (r20): Common Crawl's METADATA container — WARC-
    * framed `WARC-Type: metadata` records whose payload is a JSON
    * envelope describing the original record. Same framing parser;
    * the payload surfaces as a raw `json` STRING column — schema
    * projection is the caller's choice via
    * [[Sources.parseJsonColumn]] (WAT envelopes are deeply nested
    * and crawl-version-dependent; a fixed schema here would lie).
    */
  def readWat(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.{functions => F}
    readWarc(spark, path)
      .where(F.col("warc_type") === "metadata")
      .select(F.col("file"), F.col("record_idx"), F.col("target_uri"),
        F.col("warc_date"), F.col("record_id"),
        F.col("payload").cast("string").as("json"),
        F.col("malformed_tail"))
  }

  /** WET SINK: (target_uri, text) rows → `part-*.warc.gz` files of
    * conversion records with `text/plain` payloads — the shape
    * [[readWet]] reads back. Thin wrapper over [[writeWarc]]'s
    * commit-protocol writer.
    */
  def writeWet(df: DataFrame, dir: String,
               date: String = "2024-01-01T00:00:00Z"): Unit = {
    import org.apache.spark.sql.{functions => F}
    writeWarc(df.select(F.col("target_uri"),
        F.lit("text/plain").as("content_type"),
        F.encode(F.col("text"), "UTF-8").as("payload")),
      dir, date, warcType = "conversion")
  }

  /** WAT SINK: (target_uri, json) rows → metadata records with
    * `application/json` payloads — the shape [[readWat]] reads back.
    */
  def writeWat(df: DataFrame, dir: String,
               date: String = "2024-01-01T00:00:00Z"): Unit = {
    import org.apache.spark.sql.{functions => F}
    writeWarc(df.select(F.col("target_uri"),
        F.lit("application/json").as("content_type"),
        F.encode(F.col("json"), "UTF-8").as("payload")),
      dir, date, warcType = "metadata")
  }

  /** Distributed WARC SINK: write (target_uri, content_type, payload)
    * rows as `part-NNNNN.warc.gz` files under `dir` — one file per
    * partition, each record its own gzip member (the Common Crawl
    * convention, so any member is independently seekable and
    * [[gunzipAll]]'s multi-member inflate reads the file back). Rows
    * become `response`-type records with a caller-fixed WARC-Date and
    * a record id derived from the URI (deterministic output for a
    * deterministic input — fixture replay depends on it). Executors
    * write through the Hadoop FileSystem of `dir` (fresh default
    * Configuration per partition — custom FS conf callers should
    * write parquet instead; this sink exists for WARC interchange).
    *
    * Task-commit protocol: each attempt writes to a private
    * `_tmp-part-NNNNN-attempt-K` path and RENAMEs into place only on
    * success, so a retried or speculative duplicate attempt can never
    * interleave bytes into the final file; the first attempt to
    * commit wins (a later attempt sees the committed part and
    * discards its temp; on local FS — where rename overwrites with
    * POSIX semantics — the residual exists->rename window is
    * byte-transparent because both attempts wrote identical bytes
    * for a deterministic input). Failed-attempt temps are cleaned
    * best-effort on the failure path and are ignored by [[readWarc]]
    * callers globbing `part-*.warc.gz`.
    */
  def writeWarc(df: DataFrame, dir: String,
                date: String = "2024-01-01T00:00:00Z",
                warcType: String = "response"): Unit = {
    val uIdx = df.schema.fieldIndex("target_uri")
    val cIdx = df.schema.fieldIndex("content_type")
    val pIdx = df.schema.fieldIndex("payload")
    val root = new org.apache.hadoop.fs.Path(dir)
    val rootFs = root.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    if (rootFs.exists(root)) rootFs.delete(root, true)
    rootFs.mkdirs(root)
    df.rdd.foreachPartition { rows =>
      if (rows.hasNext) {
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val fs = root.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val finalPath = new org.apache.hadoop.fs.Path(root,
          f"part-$pid%05d.warc.gz")
        val tmpPath = new org.apache.hadoop.fs.Path(root,
          f"_tmp-part-$pid%05d-attempt-${tc.taskAttemptId()}%d.warc.gz")
        val out = fs.create(tmpPath, true)
        var committed = false
        try {
          rows.foreach { r =>
            val uri = r.getString(uIdx)
            val ct = r.getString(cIdx)
            val payload = r.getAs[Array[Byte]](pIdx)
            val id = java.util.UUID.nameUUIDFromBytes(
              uri.getBytes("UTF-8")).toString
            val h = new StringBuilder("WARC/1.0\r\n")
            h ++= s"WARC-Type: $warcType\r\n"
            h ++= s"WARC-Target-URI: $uri\r\n"
            h ++= s"WARC-Date: $date\r\n"
            h ++= s"WARC-Record-ID: <urn:uuid:$id>\r\n"
            h ++= s"Content-Type: $ct\r\n"
            h ++= s"Content-Length: ${payload.length}\r\n\r\n"
            // one gzip member per record, buffered so the Deflater is
            // closed per member (no native-memory debt on long tasks)
            val bo = new java.io.ByteArrayOutputStream(
              payload.length / 2 + 256)
            val gz = new java.util.zip.GZIPOutputStream(bo)
            gz.write(h.toString.getBytes("US-ASCII"))
            gz.write(payload)
            gz.write(CRLF); gz.write(CRLF)
            gz.close()
            bo.writeTo(out)
          }
          out.close()
          // commit: rename into place. HDFS rename refuses an existing
          // destination (true first-wins); RawLocalFileSystem renames
          // with POSIX overwrite semantics, so a late duplicate attempt
          // would silently REPLACE the committed part and a reader
          // racing the overwrite could see a torn file. The exists()
          // check narrows that window to the exists->rename gap (and
          // both attempts wrote identical bytes for a deterministic
          // input, so even the residual race is byte-transparent).
          if (fs.exists(finalPath)) {
            fs.delete(tmpPath, false) // lost the commit race: discard
          } else if (!fs.rename(tmpPath, finalPath)) {
            if (fs.exists(finalPath))
              fs.delete(tmpPath, false) // lost the commit race: discard
            else
              throw new java.io.IOException(s"writeWarc: commit rename " +
                s"failed for $tmpPath -> $finalPath")
          }
          committed = true
        } finally {
          if (!committed) {
            try out.close() catch { case _: Exception => () }
            try fs.delete(tmpPath, false) catch { case _: Exception => () }
          }
        }
      }
    }
  }

  /** The WET step: [[httpResponses]] rows with the body decoded under
    * the HTTP Content-Type charset and reduced to extracted text
    * ([[graft.text.HtmlExtract]] — script/style/comment drop, tag
    * strip, entity decode, whitespace collapse). A codegen'd scalar
    * projection — the scan, this column, and any downstream filter
    * stay in one WholeStageCodegen span.
    */
  def extractText(responses: DataFrame): DataFrame = {
    import org.apache.spark.sql.{functions => F}
    responses.withColumn("text",
      graft.text.HtmlExtract.htmlText(F.col("body"),
        F.col("http_content_type"))).drop("body")
  }

  /** The MAIN-CONTENT variant of [[extractText]]: boilerplate
    * containers (nav/header/footer/aside/form/head) pruned and
    * link-dense / word-starved blocks classified out
    * ([[graft.text.HtmlMainExtract]] — the jusText/Boilerpipe
    * heuristic as a codegen'd expression). This is the extraction a
    * training-data crawl should feed dedup and quality scoring: the
    * WET-style full text glues every page of a site together on its
    * shared chrome.
    */
  def extractMainText(responses: DataFrame, minWords: Int = 2): DataFrame = {
    import org.apache.spark.sql.{functions => F}
    responses.withColumn("main_text",
      graft.text.HtmlMainExtract.htmlMainText(F.col("body"),
        F.col("http_content_type"), minWords)).drop("body")
  }

  /** Split an HTTP response payload (a `response`-type record body)
    * into (status, http content-type, body bytes). Garbage-safe:
    * a payload that is not an HTTP message yields status -1 and the
    * whole payload as body.
    */
  def httpSplit(payload: Array[Byte]): (Int, String, Array[Byte]) = {
    def find2crlf(b: Array[Byte]): Int = {
      var i = 0
      while (i + 3 < b.length) {
        if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' &&
          b(i + 3) == '\n') return i
        i += 1
      }
      -1
    }
    val he = find2crlf(payload)
    val head = new String(payload, 0,
      if (he < 0) math.min(payload.length, 8192) else he, "US-ASCII")
    if (!head.startsWith("HTTP/")) return (-1, "", payload)
    val lines = head.split("\r\n")
    val status = lines.head.split(" ") match {
      case a if a.length >= 2 => scala.util.Try(a(1).toInt).getOrElse(-1)
      case _ => -1
    }
    val ct = lines.tail.collectFirst {
      case l if l.toLowerCase.startsWith("content-type:") =>
        l.substring(l.indexOf(':') + 1).trim
    }.getOrElse("")
    val body = if (he < 0) Array.empty[Byte]
      else java.util.Arrays.copyOfRange(payload, he + 4, payload.length)
    (status, ct, body)
  }

  /** `readWarc` rows filtered to HTTP responses with the payload split
    * into (http_status, http_content_type, body) — the row shape the
    * text-extraction / dedup pipeline starts from.
    */
  def httpResponses(warc: DataFrame): DataFrame = {
    val outSchema = StructType(warc.schema.fields.filterNot(_.name == "payload") ++ Seq(
      StructField("http_status", IntegerType, nullable = false),
      StructField("http_content_type", StringType, nullable = false),
      StructField("body", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    val pIdx = warc.schema.fieldIndex("payload")
    val tIdx = warc.schema.fieldIndex("warc_type")
    warc.flatMap { r =>
      if (r.getString(tIdx) != "response") Iterator.empty
      else {
        val (st, ct, body) = httpSplit(r.getAs[Array[Byte]](pIdx))
        val kept = r.toSeq.zipWithIndex.filterNot(_._2 == pIdx).map(_._1)
        Iterator.single(Row.fromSeq(kept ++ Seq(st, ct, body)))
      }
    }(enc)
  }
}
