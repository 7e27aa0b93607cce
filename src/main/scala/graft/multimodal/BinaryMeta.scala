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
