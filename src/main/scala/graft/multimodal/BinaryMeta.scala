package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{functions => F}

/** Multimodal column plumbing: images/audio/video ride through the
  * engine as opaque `binary` columns plus typed metadata, exactly as a
  * 100 TB training-data pipeline would carry them (decode happens in
  * partition-local batches; the bytes are never shuffled unless the
  * user asks).
  *
  * The actual codec is STUBBED (this container has no image/audio
  * libraries): `decodeStub` derives deterministic fake (width, height,
  * format) metadata from the payload. The Spark-side plumbing — binary
  * schema, partition-local mapPartitions batching, typed output — is
  * real and is what gets exercised/tested.
  */
object BinaryMeta {

  /** Attach an opaque binary payload column (here: utf-8 bytes of the
    * text — a deterministic stand-in for real image bytes).
    */
  def attachBlob(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("blob", F.col(textCol).cast("binary"))

  /** Columnar decode-stub: width/height/format derived deterministically
    * from payload size. Pure expressions — codegen'd, no shuffle.
    */
  def decodeStubColumns(df: DataFrame): DataFrame = {
    val n = F.length(F.col("blob"))
    df.withColumn("n_bytes", n.cast("long"))
      .withColumn("width", (F.pmod(n, F.lit(640)) + 1).cast("int"))
      .withColumn("height", (F.pmod(n, F.lit(480)) + 1).cast("int"))
      .withColumn("format",
        F.when(F.pmod(n, F.lit(3)) === 0, "png")
          .when(F.pmod(n, F.lit(3)) === 1, "jpeg")
          .otherwise("webp"))
  }

  /** Resize stub: deterministic fake of an image resize — real codecs
    * plug in at the marked line. Output schema and partition-local
    * execution are the real plumbing a 100 TB image pipeline needs
    * (bytes never shuffle; the transform is per-row).
    */
  def resizeStub(df: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val n = F.length(F.col("blob"))
    df.withColumn("resized_blob",
        // real impl: decode(blob) |> resize(targetW, targetH) |> encode
        F.substring(F.col("blob"), 0, targetW * targetH % 1024 + 1))
      .withColumn("resized_w", F.lit(targetW))
      .withColumn("resized_h", F.lit(targetH))
      .withColumn("orig_bytes", n.cast("long"))
  }

  /** Frame-sample stub: emit k pseudo-frames per video payload —
    * deterministic slices standing in for decoded frames. The explode
    * shape (one row per frame, frame_no column) is what a real
    * video-frame extraction produces.
    */
  def frameSampleStub(df: DataFrame, idCol: String, k: Int): DataFrame =
    df.select(F.col(idCol), F.posexplode(F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        i => F.col("blob").substr(i * 16 + 1, F.lit(16)))).as(Seq("frame_no", "frame_blob")))

  /** THE LEARNED-ENCODER PLUG-IN CONTRACT (SURVEY §6): the one seam a
    * real model implementation slots into. An encoder is pure
    * bytes→vectors over a BATCH (the unit a vision/audio model is
    * actually invoked at — one forward pass per batch, not per row),
    * serializable (it ships to executors once per task, so weights
    * should load lazily inside the first encodeBatch, not in the
    * constructor), and deterministic for a given payload (the dedup /
    * index paths downstream assume re-encoding is stable). Everything
    * Spark-side — batching, null hygiene, output schema, how the
    * column feeds the ANN/pair suite — lives in [[extractFeatures]]
    * and is IDENTICAL for the stand-in and a real model: swapping the
    * encoder cannot change the plumbing (spec-gated).
    */
  trait FeatureEncoder extends Serializable {
    /** Output dimensionality — constant per encoder; every returned
      * vector must have exactly this length.
      */
    def dim: Int

    /** Encode one batch of payloads; must return exactly one
      * `dim`-length vector per input, in input order. Payloads are
      * non-null (extractFeatures drops null ids/blobs before
      * batching).
      */
    def encodeBatch(payloads: Array[Array[Byte]]): Array[Array[Float]]
  }

  /** The deterministic stand-in encoder (no external weights in this
    * environment): byte histogram folded into `dim` buckets,
    * L2-normalized — direction depends only on content, so re-encode
    * twins collide exactly like a frozen model's would.
    */
  final class HistogramEncoder(val dim: Int) extends FeatureEncoder {
    override def encodeBatch(payloads: Array[Array[Byte]]): Array[Array[Float]] =
      payloads.map { bytes =>
        val acc = new Array[Float](dim)
        var i = 0
        while (i < bytes.length) { acc((bytes(i) & 0xff) % dim) += 1f; i += 1 }
        val norm = math.sqrt(acc.map(x => x.toDouble * x).sum)
        if (norm > 0) acc.map(x => (x / norm).toFloat) else acc
      }
  }

  /** Batched feature extraction behind ANY [[FeatureEncoder]]:
    * partition-local mapPartitions, payloads batched per model
    * invocation (`batchSize`), output (id, array<float>) — the
    * extracted column feeds the similarity suite directly:
    * attachBlob |> extractFeatures |> Ann.cosinePairsLsh / ivfBuild
    * is the end-to-end multimodal dedup/search composition.
    */
  def extractFeatures(df: DataFrame, idCol: String,
                      encoder: FeatureEncoder,
                      batchSize: Int = 64): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("feature", ArrayType(FloatType, containsNull = false))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    df.select(F.col(idCol).cast("long").as("id"), F.col("blob"))
      // null ids/payloads carry nothing to encode — dropped, not NPE'd
      .where(F.col("id").isNotNull && F.col("blob").isNotNull)
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { chunk =>
          val ids = chunk.map(_.getLong(0))
          val vecs = encoder.encodeBatch(
            chunk.map(_.getAs[Array[Byte]]("blob")).toArray)
          require(vecs.length == ids.length,
            s"encoder returned ${vecs.length} vectors for ${ids.length} payloads")
          ids.lazyZip(vecs).map { (id, v) =>
            require(v.length == encoder.dim,
              s"encoder returned a ${v.length}-dim vector, contract says ${encoder.dim}")
            Row(id, v.toSeq)
          }
        }
      }(enc)
  }

  /** Feature-extract stand-in: [[extractFeatures]] behind the
    * [[HistogramEncoder]] — the same plumbing a real model rides.
    */
  def extractFeaturesStub(df: DataFrame, idCol: String, dim: Int = 16): DataFrame =
    extractFeatures(df, idCol, new HistogramEncoder(dim))

  /** REAL image feature extraction from the DECODED raster (PNG or
    * GIF via the sniffing decode): the image is mean-pooled onto a
    * gy x gx grid — pixel (x, y) lands in cell (y*gy/h, x*gx/w),
    * integer floor — and each non-empty cell emits its EXACT integer
    * pixel count and channel-sample sum, the pre-normalization form
    * of the pooled feature vector (mean = sum / (n_px * channels)).
    * Integer sums make the arithmetic oracle exact; [[pooledVector]]
    * turns the same rows into the array<float> the ANN suite eats.
    * This replaces the hashed-byte stand-in for every format the
    * pixel codecs cover — the learned-encoder path (a model) is the
    * part that genuinely needs external weights.
    */
  def extractPooledFeatures(df: DataFrame, idCol: String,
                            gy: Int = 4, gx: Int = 4): DataFrame = {
    require(gy >= 1 && gx >= 1, "grid dims >= 1")
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("cy", IntegerType),
      StructField("cx", IntegerType),
      StructField("n_px", LongType),
      StructField("n_samples", LongType),
      StructField("sum_val", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    df.select(F.col(idCol).cast("long").as("id"), F.col("blob"))
      .mapPartitions { rows =>
        rows.grouped(64).flatMap(_.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val isGif = bytes != null && bytes.length >= 3 &&
            bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F'
          val raster: Option[PngCodec.Pixels] =
            if (isGif) GifCodec.decodeIndexed(bytes).map { case (w, h, pal, idx) =>
              // palette-expand to an RGB raster so both formats share
              // the pooling path
              val data = new Array[Byte](idx.length * 3)
              var i = 0
              while (i < idx.length) {
                val p = (idx(i) & 0xff) * 3
                data(i * 3) = pal(p); data(i * 3 + 1) = pal(p + 1)
                data(i * 3 + 2) = pal(p + 2)
                i += 1
              }
              PngCodec.Pixels(w, h, 3, data)
            }
            else if (bytes != null && bytes.length >= 2 &&
              bytes(0) == 'B' && bytes(1) == 'M') BmpCodec.decodePixels(bytes)
            else PngCodec.decodePixels(bytes)
          raster match {
            case None => Seq.empty[Row]
            case Some(px) =>
              val n = new Array[Long](gy * gx)
              val s = new Array[Long](gy * gx)
              var y = 0
              while (y < px.height) {
                val cy = y * gy / px.height
                var x = 0
                while (x < px.width) {
                  val cell = cy * gx + x * gx / px.width
                  n(cell) += 1
                  var c = 0
                  while (c < px.channels) {
                    s(cell) += px.sample(x, y, c); c += 1
                  }
                  x += 1
                }
                y += 1
              }
              (0 until gy * gx).filter(n(_) > 0).map(cell =>
                Row(id, cell / gx, cell % gx, n(cell),
                  n(cell) * px.channels, s(cell)))
          }
        })
      }(enc)
  }

  /** The [[extractPooledFeatures]] rows folded into one dense
    * array<float> per image (cells in (cy, cx) row-major order, mean
    * sample value per cell, empty cells 0f) — the real-feature drop-in
    * for [[extractFeaturesStub]]'s output shape, ready for the ANN /
    * pair suite. Channel-count-free: the mean divides by the emitted
    * sample count, so gray and RGB images mix in one corpus.
    */
  def pooledVector(pooled: DataFrame, gy: Int = 4, gx: Int = 4): DataFrame =
    pooled
      .select(F.col("id"), (F.col("cy") * gx + F.col("cx")).as("cell"),
        (F.col("sum_val").cast("double") /
          F.col("n_samples").cast("double")).as("mean"))
      .groupBy("id")
      .agg(F.map_from_entries(F.collect_list(F.struct(F.col("cell"), F.col("mean"))))
        .as("__m"))
      .select(F.col("id"),
        F.transform(F.sequence(F.lit(0), F.lit(gy * gx - 1)),
          i => F.coalesce(F.element_at(F.col("__m"), i), F.lit(0.0)).cast("float"))
          .as("feature"))

  /** Synthetic image blob with REAL container headers: (width, height)
    * encoded into a minimal PNG (signature + IHDR), GIF89a (logical
    * screen descriptor), or JPEG (SOI + JFIF APP0 + SOF0 + EOI) byte
    * stream, built from pure Spark expressions (hex/unhex/concat — all
    * codegen'd, no UDF). fmt: 0=png (33 bytes), 1=jpeg (41), 2=gif
    * (13). This is the test-data generator for the REAL header parser
    * ([[ImageHeaders]] / [[decodeMeta]]): the bytes are genuine format
    * headers, so the decode path is exercised end-to-end without any
    * image library in the container.
    */
  def syntheticImageBlob(width: org.apache.spark.sql.Column,
                         height: org.apache.spark.sql.Column,
                         fmt: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def hexLit(h: String) = F.unhex(F.lit(h))
    // JPEG/GIF dimensions are uint16 on the wire; lpad TRUNCATES hex
    // strings longer than 4 chars (keeping the HIGH digits — silent
    // garbage), so over-range dims null the field and, via concat null
    // propagation, the whole blob — an explicit "cannot encode" row
    // instead of a structurally-valid header with wrong dimensions
    def be16(c: org.apache.spark.sql.Column) =
      F.when(c.between(0, 65535), F.unhex(F.lpad(F.hex(c), 4, "0")))
    def be32(c: org.apache.spark.sql.Column) = F.unhex(F.lpad(F.hex(c), 8, "0"))
    def le16(c: org.apache.spark.sql.Column) = {
      val h = F.lpad(F.hex(c), 4, "0")
      F.when(c.between(0, 65535),
        F.unhex(F.concat(F.substring(h, 3, 2), F.substring(h, 1, 2))))
    }
    // PNG: signature, IHDR length=13, "IHDR", w, h, bit depth 8, color
    // type 6, compression/filter/interlace 0, CRC placeholder (the
    // header parser reads dimensions, not pixel data, so the CRC is
    // not validated — as with every header-only metadata pass)
    val png = F.concat(hexLit("89504E470D0A1A0A" + "0000000D" + "49484452"),
      be32(width), be32(height), hexLit("080600000000000000"))
    // JPEG: SOI, APP0/JFIF (len 16), SOF0 (len 17: precision 8, h, w,
    // 3 components), EOI
    val jpeg = F.concat(hexLit("FFD8" + "FFE000104A46494600010100000100010000" + "FFC0001108"),
      be16(height), be16(width), hexLit("03012200021101031101" + "FFD9"))
    // GIF89a: signature, w, h (little-endian), packed F7, bg 0, aspect 0
    val gif = F.concat(hexLit("474946383961"), le16(width), le16(height),
      hexLit("F70000"))
    F.when(fmt === 0, png).when(fmt === 1, jpeg).otherwise(gif)
  }

  /** REAL batched header decode via mapPartitions: PNG / GIF / JPEG
    * container headers parsed in pure JVM ([[ImageHeaders]]);
    * unrecognized or malformed payloads yield format "unknown" with
    * null dimensions instead of failing the task — a 100 TB crawl WILL
    * contain garbage bytes. Same partition-local batching shape as the
    * stub path (pixel CODECS still need a native library; header
    * metadata does not).
    */
  def decodeMeta(df: DataFrame, idCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("n_bytes", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("format", StringType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    df.select(F.col(idCol).cast("long").as("id"), F.col("blob"))
      .mapPartitions { rows =>
        // real codec integrations batch here (e.g. 64 payloads/call)
        rows.grouped(64).flatMap(_.map { r =>
          val bytes = r.getAs[Array[Byte]]("blob")
          val n = if (bytes == null) 0L else bytes.length.toLong
          ImageHeaders.decode(bytes) match {
            case Some((w, h, fmt)) => Row(r.getLong(0), n, w, h, fmt)
            case None => Row(r.getLong(0), n, null, null, "unknown")
          }
        })
      }(enc)
  }

  /** EXIF-JPEG fixture blobs (r19 — [[Exif.encodeFixture]]'s closed-
    * form orientation/GPS parameters; the syntheticPngBlobs
    * discipline: bytes are input, parse/scrub are measured).
    */
  def syntheticExifBlobs(df: DataFrame, idCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("blob", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    df.select(F.col(idCol).cast("long").as("id"))
      .where(F.col("id").isNotNull && F.col("id") >= 0)
      .mapPartitions { rows =>
        rows.map(r => Row(r.getLong(0), Exif.encodeFixture(r.getLong(0))))
      }(enc)
  }

  /** REAL batched EXIF decode via mapPartitions ([[Exif.parse]]):
    * orientation, GPS presence, and signed integer micro-degree
    * coordinates; malformed/garbage payloads yield nulls with
    * has_gps=false instead of failing the task.
    */
  def decodeExif(df: DataFrame, idCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("n_bytes", LongType),
      StructField("orientation", IntegerType),
      StructField("has_gps", BooleanType),
      StructField("gps_lat_micro", LongType),
      StructField("gps_lon_micro", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    df.select(F.col(idCol).cast("long").as("id"), F.col("blob"))
      .mapPartitions { rows =>
        rows.grouped(64).flatMap(_.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val n = if (bytes == null) 0L else bytes.length.toLong
          Exif.parse(bytes) match {
            case Some(m) => Row(r.getLong(0), n, m.orientation.orNull,
              m.hasGps, m.latMicro.orNull, m.lonMicro.orNull)
            case None => Row(r.getLong(0), n, null, false, null, null)
          }
        })
      }(enc)
  }

  /** GPS-PII scrub gate ([[Exif.scrubGps]] then RE-PARSE): per image,
    * whether GPS was present, whether any GPS survives the scrub
    * (must be false), and whether orientation + payload length
    * survived untouched (must be true — the length-preserving-zeroing
    * contract).
    */
  def scrubGpsReport(df: DataFrame, idCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("had_gps", BooleanType),
      StructField("gps_after_scrub", BooleanType),
      StructField("orientation_preserved", BooleanType),
      StructField("length_preserved", BooleanType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    df.select(F.col(idCol).cast("long").as("id"), F.col("blob"))
      .mapPartitions { rows =>
        rows.grouped(64).flatMap(_.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val before = Exif.parse(bytes)
          val (scrubbed, did) = Exif.scrubGps(bytes)
          val after = Exif.parse(scrubbed)
          Row(r.getLong(0),
            before.exists(_.hasGps),
            after.exists(_.hasGps),
            before.map(_.orientation) == after.map(_.orientation),
            (bytes == null && scrubbed == null) ||
              (bytes != null && scrubbed != null &&
                bytes.length == scrubbed.length))
        })
      }(enc)
  }

  /** EXIF-orientation NORMALIZATION over real decoded rasters (r19 —
    * the transform a pipeline runs between [[decodeExif]] and any
    * geometry-dependent stage): per image, decode, remap every sample
    * through [[Exif.orientSource]] for the row's `orientCol` value,
    * and emit position-weighted integer checksums of the UPRIGHT
    * raster — Σ v·(flat+1) pins every sample to its output position,
    * so a wrong mapping (or the right mapping for the wrong
    * orientation) breaks the hash. Partition-local; only fixed-size
    * stats move.
    */
  def orientStats(df: DataFrame, idCol: String, orientCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("orientation", IntegerType),
      StructField("out_w", IntegerType),
      StructField("out_h", IntegerType),
      StructField("channels", IntegerType),
      StructField("sum_val", LongType),
      StructField("checksum", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    df.select(F.col(idCol).cast("long").as("id"), F.col("blob"),
        F.col(orientCol).cast("int").as("o"))
      .mapPartitions { rows =>
        rows.grouped(64).flatMap(_.map { r =>
          val o = r.getInt(2)
          PngCodec.decodePixels(r.getAs[Array[Byte]](1)) match {
            case Some(px) if o >= 1 && o <= 8 =>
              val (ow, oh) = Exif.orientDims(px.width, px.height, o)
              var sum = 0L; var chk = 0L; var j = 0L
              var y = 0
              while (y < oh) {
                var x = 0
                while (x < ow) {
                  val (sx, sy) = Exif.orientSource(px.width, px.height, o, x, y)
                  var c = 0
                  while (c < px.channels) {
                    val v = px.sample(sx, sy, c)
                    sum += v; chk += v.toLong * (j + 1); j += 1
                    c += 1
                  }
                  x += 1
                }
                y += 1
              }
              Row(r.getLong(0), o, ow, oh, px.channels, sum, chk)
            case _ => Row(r.getLong(0), o, null, null, null, null, null)
          }
        })
      }(enc)
  }

  /** Synthetic REAL-PNG test blobs for the pixel-decode parity gate:
    * per id, an actual deflate-compressed, scanline-filtered PNG
    * ([[PngCodec.encode]], filter type cycling per row so every
    * unfilter is exercised) whose dimensions, channel count, and
    * sample values are closed-form functions of the id —
    * width = id%16+1, height = id%12+1, gray/RGB by id parity, sample
    * s valued (s*31 + id) % 256. An oracle can recompute the decoded
    * statistics arithmetically without any codec, so hash parity
    * proves genuine DEFLATE + unfilter inversion.
    */
  def syntheticPngBlobs(df: DataFrame, idCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("blob", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    df.select(F.col(idCol).cast("long").as("id"))
      .where(F.col("id").isNotNull && F.col("id") >= 0)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val (w, h) = ((id % 16 + 1).toInt, (id % 12 + 1).toInt)
          val ch = if (id % 2 == 0) 1 else 3
          Row(id, PngCodec.encode(w, h, ch, s => ((s * 31 + id) % 256).toInt))
        }
      }(enc)
  }

  /** Deterministic real GIF payloads: per-id dimensions and a
    * closed-form palette-index stream — the GIF twin of
    * [[syntheticPngBlobs]]. [[GifCodec.encode]] emits genuine GIF89a
    * bytes (grayscale global palette, real LZW stream) any GIF reader
    * accepts.
    */
  def syntheticGifBlobs(df: DataFrame, idCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("blob", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    df.select(F.col(idCol).cast("long").as("id"))
      .where(F.col("id").isNotNull && F.col("id") >= 0)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val (w, h) = ((id % 14 + 1).toInt, (id % 10 + 1).toInt)
          Row(id, GifCodec.encode(w, h, s => ((s * 37 + id) % 256).toInt))
        }
      }(enc)
  }

  /** Deterministic real BMP payloads (the [[syntheticGifBlobs]] role
    * for the DIB path): per-id dimensions, a closed-form RGB sample
    * function the oracle replays codec-free, and id-parity alternation
    * between bottom-up and top-down (negative height) row order so the
    * wired query exercises BOTH layout branches — the aggregates are
    * position-free, so the twin is row-order-blind by construction.
    */
  def syntheticBmpBlobs(df: DataFrame, idCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("blob", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    df.select(F.col(idCol).cast("long").as("id"))
      .where(F.col("id").isNotNull && F.col("id") >= 0)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val (w, h) = ((id % 14 + 1).toInt, (id % 10 + 1).toInt)
          Row(id, BmpCodec.encode(w, h,
            (x, y, c) => ((x * 83 + y * 29 + c * 7 + id) % 256).toInt,
            topDown = id % 2 == 0))
        }
      }(enc)
  }

  /** Deterministic real JPEG payloads: per-id dimensions and a
    * closed-form per-block gray level — the JPEG twin of
    * [[syntheticGifBlobs]]. [[JpegCodec.encode]] emits genuine
    * DC-only baseline JFIF bytes (real DQT/DHT/SOF0/SOS segments,
    * Huffman-coded differential DC chain, FF-stuffed scan) any JPEG
    * reader accepts. Dimensions span multiple 8x8 blocks so the DC
    * predictor chain is genuinely exercised.
    */
  def syntheticJpegBlobs(df: DataFrame, idCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("blob", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    df.select(F.col(idCol).cast("long").as("id"))
      .where(F.col("id").isNotNull && F.col("id") >= 0)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val (w, h) = ((id % 28 + 1).toInt, (id % 20 + 1).toInt)
          Row(id, JpegCodec.encode(w, h, b => ((b * 53 + id * 7) % 256).toInt))
        }
      }(enc)
  }

  /** Deterministic real COLOR JPEG payloads: per-id dimensions, a
    * per-id subsampling choice (even ids 4:2:0, odd 4:4:4), and
    * closed-form per-block Y/Cb/Cr levels over each plane's padded
    * block grid — see [[JpegCodec.encodeColor]] for the exact grid
    * indexing the oracle twin replays. Dimensions span multiple MCUs
    * in both modes so the interleaved per-component DC predictor
    * chains are genuinely exercised.
    */
  def syntheticColorJpegBlobs(df: DataFrame, idCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("blob", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    df.select(F.col(idCol).cast("long").as("id"))
      .where(F.col("id").isNotNull && F.col("id") >= 0)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val (w, h) = ((id % 24 + 9).toInt, (id % 18 + 5).toInt)
          Row(id, JpegCodec.encodeColor(w, h,
            b => ((b * 29 + id * 5) % 256).toInt,
            b => ((b * 17 + id * 3) % 256).toInt,
            b => ((b * 23 + id * 11) % 256).toInt,
            subsample420 = id % 2 == 0))
        }
      }(enc)
  }

  /** Near-dup IMAGE fixture corpus (r17, for perceptual dedup): FOUR
    * real encoded images per input id `d`, every raster closed-form so
    * a SQL twin can recompute the dHash pipeline codec-free —
    *  - 4d   base: gray PNG, w = d%24+16, h = d%16+16,
    *         g(s) = (s·31 + d·7) % 191 (capped < 191: +64 headroom)
    *  - 4d+1 re-encode twin: the SAME raster in a different container
    *         (BMP for even d — gray replicated to RGB, luma equal by
    *         the 299+587+114 = 1000 weighting; GIF for odd d — gray
    *         palette), so dHash(4d) == dHash(4d+1) by construction
    *  - 4d+2 near-dup: one pooled cell (r=3, c=4) brightened by +64 —
    *         only the two comparisons touching that cell can flip, so
    *         hamming(4d, 4d+2) ≤ 2 BY CONSTRUCTION
    *  - 4d+3 2× nearest-neighbor upscale as gray PNG (the resized-twin
    *         case; gradient signs mostly survive, no hard bound)
    * Cross-id images use unrelated sample phases — far in hash space.
    */
  def syntheticImageCorpus(df: DataFrame, idCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("blob", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    df.select(F.col(idCol).cast("long").as("id"))
      .where(F.col("id").isNotNull && F.col("id") >= 0)
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val d = r.getLong(0)
          val w = (d % 24 + 16).toInt
          val h = (d % 16 + 16).toInt
          def g(s: Long): Int = ((s * 31 + d * 7) % 191).toInt
          val base = PngCodec.encode(w, h, 1, g)
          val reenc =
            if (d % 2 == 0) BmpCodec.encode(w, h, (x, y, _) => g(y.toLong * w + x),
              topDown = false)
            else GifCodec.encode(w, h, (s: Int) => g(s.toLong))
          val nearDup = PngCodec.encode(w, h, 1, { s =>
            val x = (s % w).toInt
            val y = (s / w).toInt
            if (y * 8 / h == 3 && x * 9 / w == 4) g(s) + 64 else g(s)
          })
          val upscale = PngCodec.encode(2 * w, 2 * h, 1, { s =>
            val x = (s % (2 * w)).toInt
            val y = (s / (2 * w)).toInt
            g((y / 2).toLong * w + (x / 2))
          })
          Seq(Row(4 * d, base), Row(4 * d + 1, reenc),
            Row(4 * d + 2, nearDup), Row(4 * d + 3, upscale))
        }
      }(enc)
  }

  /** REAL batched pixel decode via mapPartitions, format-sniffed per
    * payload: PNG takes inflate + per-scanline unfilter
    * ([[PngCodec.decodeStats]]), GIF takes the variable-width LZW
    * engine + palette expansion ([[GifCodec.decodeStats]]), JPEG
    * takes the full baseline grayscale decoder
    * ([[JpegCodec.decodeStats]] — real marker walk, stream-defined
    * DHT Huffman tables, differential DC chain, zigzag dequant, and
    * a real 2-D IDCT for AC-bearing blocks; DC-only blocks keep the
    * exact-integer closed form the parity oracle replays). All emit per-image exact
    * integer aggregates (n_samples, sum_val, sum_sq) — the
    * metadata/quality-pass shape (stats, never a raster shuffle).
    * Undecodable payloads yield null stats instead of failing the
    * task.
    */
  def decodePixelStats(df: DataFrame, idCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("n_samples", LongType),
      StructField("sum_val", LongType),
      StructField("sum_sq", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    df.select(F.col(idCol).cast("long").as("id"), F.col("blob"))
      .mapPartitions { rows =>
        // real codec integrations batch here (e.g. 64 payloads/call).
        // positional access: when this chains directly onto another
        // mapPartitions (blob generator), Catalyst elides the
        // serializer round-trip and the incoming rows carry no schema
        rows.grouped(64).flatMap(_.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val isGif = bytes != null && bytes.length >= 3 &&
            bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F'
          val isJpeg = bytes != null && bytes.length >= 2 &&
            (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8
          val isBmp = bytes != null && bytes.length >= 2 &&
            bytes(0) == 'B' && bytes(1) == 'M'
          val stats =
            if (isGif) GifCodec.decodeStats(bytes)
            else if (isJpeg) JpegCodec.decodeStats(bytes)
            else if (isBmp) BmpCodec.decodeStats(bytes)
            else PngCodec.decodeStats(bytes)
          stats match {
            case Some(s) => Row(r.getLong(0), s.width, s.height, s.channels,
              s.nSamples, s.sumVal, s.sumSq)
            case None => Row(r.getLong(0), null, null, null, null, null, null)
          }
        })
      }(enc)
  }

  /** REAL batched PNG resize via mapPartitions ([[PngCodec
    * .resizeStats]]): full raster decode + nearest-neighbor resample
    * to (targetW, targetH), emitting the resized image's exact
    * integer aggregates — the thumbnail pass shape (decode and
    * resize partition-local, stats out, rasters never shuffled).
    * Undecodable payloads yield null stats.
    */
  def resizePixelStats(df: DataFrame, idCol: String,
                       targetW: Int, targetH: Int): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("n_samples", LongType),
      StructField("sum_val", LongType),
      StructField("sum_sq", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    df.select(F.col(idCol).cast("long").as("id"), F.col("blob"))
      .mapPartitions { rows =>
        // positional access: chained mapPartitions rows carry no schema
        rows.grouped(64).flatMap(_.map { r =>
          PngCodec.resizeStats(r.getAs[Array[Byte]](1), targetW, targetH) match {
            case Some(s) => Row(r.getLong(0), s.width, s.height, s.channels,
              s.nSamples, s.sumVal, s.sumSq)
            case None => Row(r.getLong(0), null, null, null, null, null, null)
          }
        })
      }(enc)
  }

  /** Deterministic real WAV payloads: frames / channels / sample rate
    * derived from the id, samples from a closed form — the audio twin
    * of [[syntheticPngBlobs]]. [[WavCodec.encode]] emits genuine
    * RIFF/PCM bytes any decoder accepts.
    */
  def syntheticWavBlobs(df: DataFrame, idCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("blob", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    df.select(F.col(idCol).cast("long").as("id"))
      .where(F.col("id").isNotNull && F.col("id") >= 0)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val rate = (8000 + (id % 4) * 4000).toInt
          val ch = (id % 2 + 1).toInt
          val frames = (id % 200 + 20).toInt
          Row(id, WavCodec.encode(rate, ch, frames,
            s => ((s * 37 + id * 11) % 4001 - 2000).toInt))
        }
      }(enc)
  }

  /** Per-(doc, bin) fixture envelope hash shared by the audio and
    * video near-dup corpora and replayed closed-form by their SQL
    * twins: reduce mod 999983 BEFORE the Knuth multiply, so the
    * product stays < 2^52 and the Scala Long agrees with the DuckDB
    * BIGINT twin at ANY doc id (an unreduced multiply wraps Long
    * silently here but raises an overflow error in DuckDB once
    * doc_id exceeds ~5.3e7 — an undocumented scale ceiling).
    */
  private[graft] def envelopeHash(d: Long, bin: Long): Long =
    (d * 65 + bin + 1) % 999983 * 2654435761L % 999983

  /** Near-dup AUDIO fixture corpus (r17, for perceptual clip dedup —
    * the [[syntheticImageCorpus]] pattern in one dimension): FOUR real
    * 16-bit PCM WAV clips per input id `d`, every waveform closed-form
    * so a SQL twin replays the whole [[AudioHash]] pipeline —
    *  - 4d   base: mono 8 kHz, frames = d%200+65 (≥ 65: no empty
    *         bins), v(f) = raw(f) · m(d, bin(f)) — raw = (f·37 +
    *         d·11) % 4001 − 2000 and m = 1 + (h²/1000) % 7 with
    *         h = ((d·65 + bin + 1) % 999983)·2654435761 % 999983 — a
    *         per-(doc, bin) ENERGY ENVELOPE in 1..7; the SQUARED-hash
    *         mix decorrelates envelopes across docs (an affine-in-bin
    *         envelope makes every doc a shifted copy of one
    *         quasi-periodic sequence and near-collisions degenerate
    *         the pair space); |v| ≤ 14000
    *  - 4d+1 volume-doubled remaster: 2·v (≤ ±28000, no clipping) —
    *         hash EQUAL by the provable scaling invariance
    *  - 4d+2 near-dup: frames pooling into bin 32 get |v| raised by
    *         exactly 500 (v ≥ 0 → +500, else −500) — only the two
    *         comparisons touching bin 32 can flip, hamming ≤ 2 BY
    *         CONSTRUCTION
    *  - 4d+3 stereo remaster: each frame's sample duplicated to two
    *         channels — hash EQUAL by the replication invariance
    * Cross-id clips use unrelated phases — far in hash space.
    */
  def syntheticAudioCorpus(df: DataFrame, idCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("blob", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    df.select(F.col(idCol).cast("long").as("id"))
      .where(F.col("id").isNotNull && F.col("id") >= 0)
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val d = r.getLong(0)
          val frames = (d % 200 + 65).toInt
          def m(bin: Long): Int =
            (1 + { val hh = envelopeHash(d, bin); hh * hh / 1000 % 7 }).toInt
          def v(f: Long): Int =
            (((f * 37 + d * 11) % 4001 - 2000) * m(f * 65 / frames)).toInt
          val base = WavCodec.encode(8000, 1, frames, v)
          val loud = WavCodec.encode(8000, 1, frames, f => 2 * v(f))
          val nearDup = WavCodec.encode(8000, 1, frames, { f =>
            val x = v(f)
            if (f * 65 / frames == 32) { if (x >= 0) x + 500 else x - 500 }
            else x
          })
          val stereo = WavCodec.encode(8000, 2, frames, s => v(s / 2))
          Seq(Row(4 * d, base), Row(4 * d + 1, loud),
            Row(4 * d + 2, nearDup), Row(4 * d + 3, stereo))
        }
      }(enc)
  }

  /** Near-dup VIDEO fixture corpus (r17 — the [[syntheticAudioCorpus]]
    * pattern for the temporal hash): FOUR real AVI clips per input id
    * `d`, every raster closed-form so a SQL twin replays the whole
    * [[VideoHash]] pipeline —
    *  - 4d   base: w = 4 (multiple of 4 — no DIB row padding, so the
    *         canonical sample index is dense), h = d%4+2,
    *         nf = d%80+65 frames (≥ 65: no empty bins);
    *         v(f, s) = tex(s) + 20·env(d, bin(f)) with
    *         tex = (s·31 + d·7) % 97 and env = (hsh²/1000) % 7,
    *         hsh = ((d·65 + bin + 1) % 999983)·2654435761 % 999983 — the
    *         squared-hash per-(doc, bin) LUMINANCE ENVELOPE
    *         (decorrelated across docs, the audio-fixture lesson);
    *         values ≤ 216
    *  - 4d+1 graded remaster: +39 brightness on every pixel (≤ 255,
    *         no clipping) — hash EQUAL by the provable shift
    *         invariance
    *  - 4d+2 near-dup: frames pooling into bin 32 get +25 per pixel —
    *         only the two comparisons touching bin 32 can flip,
    *         hamming ≤ 2 BY CONSTRUCTION
    *  - 4d+3 2× nearest spatial upscale (2w × 2h, same frames) — hash
    *         EQUAL by the provable ×4 (sum, n) scaling invariance
    */
  def syntheticVideoCorpus(df: DataFrame, idCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("blob", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    df.select(F.col(idCol).cast("long").as("id"))
      .where(F.col("id").isNotNull && F.col("id") >= 0)
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val d = r.getLong(0)
          val w = 4
          val h = (d % 4 + 2).toInt
          val nf = (d % 80 + 65).toInt
          def env(bin: Long): Int =
            { val hh = envelopeHash(d, bin); hh * hh / 1000 % 7 }.toInt
          // per-frame envelope memo: the encoder calls value() once per
          // SAMPLE, and recomputing bin/hash arithmetic 3wh times per
          // frame tripled the fixture cost at sf0.1
          val envByFrame = Array.tabulate(nf)(f => 20 * env(f.toLong * 65 / nf))
          def v(f: Int, s: Long): Int =
            ((s * 31 + d * 7) % 97).toInt + envByFrame(f)
          val base = AviCodec.encode(w, h, nf, 33333L, v)
          val graded = AviCodec.encode(w, h, nf, 33333L,
            (f, s) => v(f, s) + 39)
          val nearDup = AviCodec.encode(w, h, nf, 33333L, { (f, s) =>
            v(f, s) + (if (f.toLong * 65 / nf == 32) 25 else 0)
          })
          val w2 = 2 * w
          val upscale = AviCodec.encode(w2, 2 * h, nf, 33333L, { (f, s) =>
            val c = (s % 3).toInt
            val pix = s / 3
            val x2 = pix % w2
            val y2 = pix / w2
            v(f, ((y2 / 2) * w + x2 / 2) * 3 + c)
          })
          Seq(Row(4 * d, base), Row(4 * d + 1, graded),
            Row(4 * d + 2, nearDup), Row(4 * d + 3, upscale))
        }
      }(enc)
  }

  /** SPATIAL-vs-TEMPORAL video fixture corpus (r18 — for the dual-arm
    * near-dup gate): THREE real AVI clips per input id `d`, designed
    * so all three share an IDENTICAL per-frame brightness curve
    * (temporal hash equal BY CONSTRUCTION) while their spatial
    * content tells them apart —
    *  - 3d   base: w = 36 (9 uniform 4-px dHash columns, no DIB row
    *         padding), h = 4 (grid rows 0/2/4/6 occupied, odd rows
    *         empty — a legal dHash shape), nf = d%16+65 frames (≥ 65
    *         so every temporal bin is occupied);
    *         v(f, x, y) = 10 + 20·M(d, cy·9 + x/4) + 15·E(d, bin(f))
    *         with cy = 2y, M(d, c) = (eh²/1000) % 7 over
    *         eh = [[envelopeHash]](d, 200 + c) (the squared-hash
    *         decorrelation rule; the 200 offset keeps the spatial
    *         mix distinct from the temporal one) and E the standard
    *         temporal envelope. v is CONSTANT within a grid cell, so
    *         every spatial bit is the pure integer comparison
    *         M(cell) > M(cell+1) — frame-count independent, E
    *         cancels (proportional sums) — and the SQL twin needs no
    *         frame dimension for the spatial hash at all.
    *  - 3d+1 spatial near-dup: +10 on cell (0,0)'s pixels, −10 on
    *         cell (0,1)'s — every frame's TOTAL is unchanged
    *         (temporal hash EQUAL), and at most ONE spatial bit can
    *         flip (bit(0,0), iff M₀ = M₁; bit(0,1) needs a 20-step
    *         to cross, the ±10 shift cannot) — hamming ≤ 1 BY
    *         CONSTRUCTION: the bounded spatial edit the dual rule
    *         must CATCH.
    *  - 3d+2 impostor: column-mirrored material (cell c reads
    *         M(8−c)) — uniform cell widths make the pixel multiset,
    *         hence every frame sum, identical (temporal hash EQUAL:
    *         the collision the temporal-only pass cannot see) while
    *         the spatial gradients reverse — the dual rule must
    *         SPLIT it (spatial hamming large unless M is
    *         palindromic, which the twin replays identically).
    */
  def syntheticVideoSpatialCorpus(df: DataFrame, idCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("blob", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    df.select(F.col(idCol).cast("long").as("id"))
      .where(F.col("id").isNotNull && F.col("id") >= 0)
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val d = r.getLong(0)
          val w = 36
          val h = 4
          // >= 65 frames: every temporal bin occupied, so adjacent-bin
          // comparisons are live and thash stays decorrelated across
          // docs — sparser clips would all hash to 0 temporally and
          // the band join would degenerate to all-pairs (the r17
          // fixture lesson); callers budget corpus size instead
          val nf = (d % 16 + 65).toInt
          def mix(bin: Long): Int =
            { val hh = envelopeHash(d, bin); hh * hh / 1000 % 7 }.toInt
          // memoized per-cell and per-frame terms (the r17 lesson:
          // never recompute hash arithmetic inside the per-sample
          // closure)
          val mCell = Array.tabulate(8, 9)((cy, cx) =>
            if (cy % 2 == 0) 20 * mix(200L + cy * 9 + cx) else 0)
          val envByFrame = Array.tabulate(nf)(f => 15 * mix(f.toLong * 65 / nf))
          def vAt(f: Int, cy: Int, cx: Int): Int =
            10 + mCell(cy)(cx) + envByFrame(f)
          def xy(s: Long): (Int, Int) = {
            val y = (s / (w * 3)).toInt
            val x = ((s % (w * 3)) / 3).toInt
            (x, y)
          }
          val base = AviCodec.encode(w, h, nf, 33333L, { (f, s) =>
            val (x, y) = xy(s); vAt(f, 2 * y, x / 4)
          })
          val edited = AviCodec.encode(w, h, nf, 33333L, { (f, s) =>
            val (x, y) = xy(s)
            val delta = if (y == 0 && x < 4) 10
              else if (y == 0 && x < 8) -10 else 0
            vAt(f, 2 * y, x / 4) + delta
          })
          val mirrored = AviCodec.encode(w, h, nf, 33333L, { (f, s) =>
            val (x, y) = xy(s); vAt(f, 2 * y, 8 - x / 4)
          })
          Seq(Row(3 * d, base), Row(3 * d + 1, edited),
            Row(3 * d + 2, mirrored))
        }
      }(enc)
  }

  /** REAL batched WAV PCM decode via mapPartitions ([[WavCodec
    * .decodeStats]]): container chunk walk + sample scan emitting
    * per-clip exact integer aggregates — the metadata/quality-pass
    * shape (stats, never a waveform shuffle). Undecodable payloads
    * yield null stats instead of failing the task.
    */
  def decodeAudioStats(df: DataFrame, idCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("n_frames", LongType),
      StructField("n_samples", LongType),
      StructField("sum_val", LongType),
      StructField("sum_sq", LongType),
      StructField("peak_abs", IntegerType),
      StructField("duration_us", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    df.select(F.col(idCol).cast("long").as("id"), F.col("blob"))
      .mapPartitions { rows =>
        // positional access: chained mapPartitions rows carry no schema
        rows.grouped(64).flatMap(_.map { r =>
          WavCodec.decodeStats(r.getAs[Array[Byte]](1)) match {
            case Some(s) => Row(r.getLong(0), s.sampleRate, s.channels,
              s.nFrames, s.nSamples, s.sumVal, s.sumSq, s.peakAbs, s.durationUs)
            case None => Row(r.getLong(0), null, null, null, null, null, null,
              null, null)
          }
        })
      }(enc)
  }

  /** REAL audio frame-sampling via mapPartitions + flatMap
    * ([[WavCodec.decodeSegments]]): each clip explodes into fixed
    * frame-window rows with per-segment aggregates — the explode
    * shape video frame-sampling takes, fully real for audio (PCM
    * needs no codec). Undecodable payloads yield zero rows (their
    * absence is the signal; the per-clip null-stats row lives in
    * [[decodeAudioStats]]).
    */
  def decodeAudioSegments(df: DataFrame, idCol: String,
                          windowFrames: Int): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("segment", IntegerType),
      StructField("start_frame", LongType),
      StructField("n_frames", LongType),
      StructField("sum_val", LongType),
      StructField("peak_abs", IntegerType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    df.select(F.col(idCol).cast("long").as("id"), F.col("blob"))
      .mapPartitions { rows =>
        rows.grouped(64).flatMap(_.flatMap { r =>
          val id = r.getLong(0)
          WavCodec.decodeSegments(r.getAs[Array[Byte]](1), windowFrames)
            .getOrElse(Seq.empty)
            .map(s => Row(id, s.segment, s.startFrame, s.nFrames,
              s.sumVal, s.peakAbs))
        })
      }(enc)
  }

  /** Deterministic real AVI payloads: dimensions / frame count from
    * the id, per-frame samples from a closed form — the video twin of
    * [[syntheticPngBlobs]] / [[syntheticWavBlobs]]. [[AviCodec
    * .encode]] emits a genuine RIFF('AVI ') container with
    * uncompressed 24-bit DIB frames.
    */
  def syntheticAviBlobs(df: DataFrame, idCol: String): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("blob", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    df.select(F.col(idCol).cast("long").as("id"))
      .where(F.col("id").isNotNull && F.col("id") >= 0)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val w = (id % 6 + 2).toInt
          val h = (id % 4 + 2).toInt
          val nf = (id % 5 + 2).toInt
          Row(id, AviCodec.encode(w, h, nf, usPerFrame = 33333L,
            (f, s) => ((s * 31 + f * 7 + id) % 256).toInt))
        }
      }(enc)
  }

  /** REAL batched video frame sampling via mapPartitions ([[AviCodec
    * .decodeFrameStats]]): RIFF walk + every `stride`-th frame's DIB
    * decoded to exact integer aggregates — the "one frame per second,
    * not thirty" pass (skipped frames cost a chunk-header hop, rasters
    * never shuffle). Undecodable payloads contribute no rows.
    */
  def decodeVideoFrames(df: DataFrame, idCol: String, stride: Int): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("frame_no", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_samples", LongType),
      StructField("sum_val", LongType),
      StructField("sum_sq", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    df.select(F.col(idCol).cast("long").as("id"), F.col("blob"))
      .mapPartitions { rows =>
        rows.grouped(64).flatMap(_.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          AviCodec.decodeMeta(bytes) match {
            case Some(m) =>
              AviCodec.decodeFrameStats(bytes, stride).getOrElse(Seq.empty)
                .map(s => Row(id, s.frameNo, m.width, m.height,
                  s.nSamples, s.sumVal, s.sumSq))
            case None => Seq.empty
          }
        })
      }(enc)
  }

  /** REAL audio time-bin features ([[WavCodec.decodeTimeBins]]): each
    * clip pooled onto a fixed nBins time grid (duration-independent —
    * the fingerprint shape) with exact integer counts, signed sums,
    * and energy sums per bin. Undecodable payloads contribute no rows.
    */
  def decodeAudioFeatures(df: DataFrame, idCol: String,
                          nBins: Int = 4): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("bin", IntegerType),
      StructField("n_frames", LongType),
      StructField("n_samples", LongType),
      StructField("sum_val", LongType),
      StructField("sum_abs", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    df.select(F.col(idCol).cast("long").as("id"), F.col("blob"))
      .mapPartitions { rows =>
        rows.grouped(64).flatMap(_.flatMap { r =>
          val id = r.getLong(0)
          WavCodec.decodeTimeBins(r.getAs[Array[Byte]](1), nBins)
            .getOrElse(Seq.empty)
            .map(b => Row(id, b.bin, b.nFrames, b.nSamples, b.sumVal, b.sumAbs))
        })
      }(enc)
  }

  /** REAL per-frame video features ([[AviCodec.decodeFramePooled]]):
    * every `stride`-th frame mean-pooled onto a gy x gx grid, emitted
    * in the exact-integer pre-normalization form — the frame-level
    * feature pass a video near-dup pipeline runs (frame vectors feed
    * the same similarity machinery as image features; rasters never
    * leave the partition). Undecodable payloads contribute no rows.
    */
  def decodeVideoFrameFeatures(df: DataFrame, idCol: String, stride: Int,
                               gy: Int = 2, gx: Int = 2): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("frame_no", IntegerType),
      StructField("cy", IntegerType),
      StructField("cx", IntegerType),
      StructField("n_px", LongType),
      StructField("n_samples", LongType),
      StructField("sum_val", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    df.select(F.col(idCol).cast("long").as("id"), F.col("blob"))
      .mapPartitions { rows =>
        rows.grouped(64).flatMap(_.flatMap { r =>
          val id = r.getLong(0)
          AviCodec.decodeFramePooled(r.getAs[Array[Byte]](1), stride, gy, gx)
            .getOrElse(Seq.empty)
            .map(p => Row(id, p.frameNo, p.cy, p.cx, p.nPx, p.nSamples, p.sumVal))
        })
      }(enc)
  }

  /** Partition-local batched decode via mapPartitions — the shape a
    * real codec integration takes (batch the payloads, call the
    * native decoder once per batch). The decoder here is the same
    * deterministic stub; swap `fakeDecode` for the real library call.
    */
  def decodeStubPartitions(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("n_bytes", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("format", StringType)))
    def fakeDecode(bytes: Array[Byte]): (Int, Int, String) = {
      val n = bytes.length
      (n % 640 + 1, n % 480 + 1, Seq("png", "jpeg", "webp")(n % 3))
    }
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    df.select(F.col(idCol).cast("long").as("id"), F.col("blob"))
      .mapPartitions { rows =>
        // real integrations batch here (e.g. 64 payloads per codec call)
        rows.grouped(64).flatMap(_.map { r =>
          val bytes = r.getAs[Array[Byte]]("blob")
          val (w, h, fmt) = fakeDecode(bytes)
          Row(r.getLong(0), bytes.length.toLong, w, h, fmt)
        })
      }(enc)
  }
}
