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

  /** Feature-extract stub: a deterministic pseudo-embedding per
    * payload, standing in for a batched vision/audio encoder call. The
    * shape is the real integration point — partition-local
    * mapPartitions, payloads batched per model invocation, output
    * (id, array<float>) — so the extracted column feeds the similarity
    * suite directly: attachBlob |> extractFeaturesStub |>
    * Ann.cosinePairsLsh / ivfBuild is the end-to-end multimodal
    * dedup/search composition. Swap `fakeEncode` for the real encoder.
    */
  def extractFeaturesStub(df: DataFrame, idCol: String, dim: Int = 16): DataFrame = {
    val out = StructType(Seq(
      StructField("id", LongType),
      StructField("feature", ArrayType(FloatType, containsNull = false))))
    def fakeEncode(bytes: Array[Byte]): Array[Float] = {
      // deterministic pseudo-embedding: byte histogram folded into dim
      // buckets, L2-normalized — direction depends only on content
      val acc = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) { acc((bytes(i) & 0xff) % dim) += 1f; i += 1 }
      val norm = math.sqrt(acc.map(x => x.toDouble * x).sum)
      if (norm > 0) acc.map(x => (x / norm).toFloat) else acc
    }
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(out)
    df.select(F.col(idCol).cast("long").as("id"), F.col("blob"))
      // null ids/payloads carry nothing to encode — dropped, not NPE'd
      .where(F.col("id").isNotNull && F.col("blob").isNotNull)
      .mapPartitions { rows =>
        // real integrations batch here (one encoder call per 64 payloads)
        rows.grouped(64).flatMap(_.map { r =>
          Row(r.getLong(0), fakeEncode(r.getAs[Array[Byte]]("blob")).toSeq)
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
