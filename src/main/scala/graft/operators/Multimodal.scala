package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.TextFns

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, plus batch "decode"
  * over mapPartitions.
  *
  * The decode internals are STUBBED (no image/audio libraries in this
  * environment): `decodeStub` derives deterministic fake features from
  * the bytes. Everything Spark-side — schema, partitioning, the
  * per-partition batch loop, the feature struct — is real; swapping the
  * stub for an actual codec is a one-function change inside
  * `decodePartition`.
  */
object Multimodal {

  /** Metadata schema carried alongside every media payload. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("n_bytes", LongType)))

  val FeatureSchema: StructType = StructType(Seq(
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("checksum", LongType)))

  /** Attach a binary payload column + metadata struct. `format` cycles
    * deterministically from the content hash — stand-in for a real
    * container sniff of magic bytes.
    */
  def withMedia(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("media", col(textCol).cast("binary"))
      .withColumn("meta", struct(
        element_at(array(lit("jpeg"), lit("png"), lit("webp")),
          (TextFns.hash32(col(textCol)) % 3 + 1).cast("int")).as("format"),
        length(col("media")).cast("long").as("n_bytes")))

  /** Expression-only stub decode (oracle-friendly): fake dims + checksum
    * derived from content hash and first byte. A real decoder cannot be
    * an expression — see `decodePartition` for the batch path.
    */
  def decodeStubExpr(media: Column, textCol: Column): Column = struct(
    (TextFns.hash32(textCol) % 128 + 16).as("width"),
    (TextFns.hash32(concat(lit("h:"), textCol)) % 128 + 16).as("height"),
    (ascii(substring(textCol, 1, 1)) + length(media)).cast("long").as("checksum"))

  /** Batch decode over mapPartitions — the real plumbing a native codec
    * would plug into: rows stream per partition, the codec is initialized
    * once per partition (like a broadcast mmdb reader), features come
    * back as a struct column. The per-row body is the stub.
    */
  def decodePartition(df: DataFrame, mediaCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("features", FeatureSchema)))
    val idIdx = df.schema.fieldIndex(idCol)
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val rdd = df.rdd.mapPartitions { rows =>
      // a real implementation opens the codec/library handle here, once
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](mediaIdx)
        val feats = decodeBytesStub(bytes)
        Row(r.get(idIdx), Row(feats._1, feats._2, feats._3))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** The stub a real codec replaces: deterministic fake (width, height,
    * checksum) from the raw bytes.
    */
  def decodeBytesStub(bytes: Array[Byte]): (Long, Long, Long) = {
    val sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
    (sum % 128 + 16, (sum / 7) % 128 + 16, bytes.length.toLong)
  }

  /** Batch resize over mapPartitions: same plumbing as decodePartition
    * (codec handle once per partition, rows stream through), emitting
    * the resized payload plus its new metadata. The "resize" is a
    * deterministic stub — keep every `stride`-th byte up to `maxBytes`
    * (a real image scaler slots into `resizeBytesStub` unchanged).
    */
  def resizePartition(df: DataFrame, mediaCol: String, idCol: String,
                      maxBytes: Int): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("media_resized", BinaryType),
      StructField("meta_resized", MetaSchema)))
    val idIdx = df.schema.fieldIndex(idCol)
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val rdd = df.rdd.mapPartitions { rows =>
      // a real implementation opens the scaler/codec here, once
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](mediaIdx)
        val out = resizeBytesStub(bytes, maxBytes)
        Row(r.get(idIdx), out, Row("raw", out.length.toLong))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Deterministic stand-in for a scaler: stride-sample the payload down
    * to at most `maxBytes` (stride = ceil(len/maxBytes)).
    */
  def resizeBytesStub(bytes: Array[Byte], maxBytes: Int): Array[Byte] = {
    if (bytes.length <= maxBytes) bytes
    else {
      val stride = (bytes.length + maxBytes - 1) / maxBytes
      Array.tabulate((bytes.length + stride - 1) / stride)(i => bytes(i * stride))
    }
  }

  /** Frame sampling: every `stride`-th window of `frameLen` bytes.
    * Expressed on the string side (binary slicing is engine-specific);
    * emits (frame_no, frame) rows. Payloads shorter than one frame yield
    * zero rows (without the guard, sequence(0, negative) would infer a
    * -1 step and emit descending bogus frame numbers).
    */
  def frameSample(df: DataFrame, textCol: String, frameLen: Int, stride: Int): DataFrame =
    df.where(length(col(textCol)) >= frameLen)
      .withColumn("frame_no",
        explode(sequence(lit(0), floor((length(col(textCol)) - frameLen).cast("double") / stride).cast("int"))))
      .withColumn("frame", col(textCol).substr(col("frame_no") * stride + 1, lit(frameLen)))
}
