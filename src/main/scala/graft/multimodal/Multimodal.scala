package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Decoded-image record: typed metadata + (stubbed) pixel payload size. */
case class DecodedImage(
    id: Long, width: Int, height: Int, channels: Int, n_pixels: Long)

/** Sampled video frame record (stub). */
case class SampledFrame(id: Long, frame_index: Int, byte_offset: Long)

/** Multimodal-column plumbing: image/audio/video travel as opaque `binary`
  * columns with typed metadata structs. The per-record decode runs in
  * `mapPartitions` — the JVM analog of a batched pandas UDF: one iterator
  * per partition, constant memory, partitioning preserved, schema enforced
  * by case-class Encoders.
  *
  * DECODE IS A STUB: no image/audio codec libraries exist in this
  * environment, so dimensions are derived deterministically from the byte
  * payload (`len % 512` etc.). The Spark-side contract — binary column in,
  * typed struct out, batch iterator shape — is the real, tested part; swap
  * `fakeDecode` for a JNI/javax.imageio call in production.
  */
object Multimodal {

  /** Deterministic fake decode (see object doc). */
  private[multimodal] def fakeDecode(id: Long, bytes: Array[Byte]): DecodedImage = {
    val len = if (bytes == null) 0 else bytes.length
    val w = 1 + (len % 512)
    val h = 1 + ((len * 7) % 512)
    DecodedImage(id, w, h, 3, w.toLong * h * 3)
  }

  /** Attach a demo binary payload column derived from a string column (the
    * testdata tables carry no real blobs). */
  def withBlob(df: DataFrame, textCol: String, blobCol: String): DataFrame =
    df.withColumn(blobCol, col(textCol).cast("binary"))

  /** Decode a binary image column to typed metadata, batch-wise per
    * partition. */
  def decodeImages(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val in = df.select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    in.mapPartitions(it => it.map { case (id, bytes) => fakeDecode(id, bytes) })(
      Encoders.product[DecodedImage])
      .toDF()
  }

  /** Resize metadata transform (pure column math over the decoded struct —
    * the pixel transform itself would live in the decode kernel). */
  def resizePlan(decoded: DataFrame, targetW: Int, targetH: Int): DataFrame =
    decoded
      .withColumn("scale_x", col("width").cast("double") / lit(targetW.toDouble))
      .withColumn("scale_y", col("height").cast("double") / lit(targetH.toDouble))
      .withColumn("out_pixels", lit(targetW.toLong * targetH * 3))

  /** Frame sampling stub for video blobs: every `stride`-th "frame",
    * emitted as (id, frame_index, byte_offset) rows — a flatMap shape, so
    * one input row fans out to many; the offsets are where a real demuxer
    * would seek. */
  def sampleFrames(
      df: DataFrame, idCol: String, binCol: String,
      frameBytes: Int = 1024, stride: Int = 10): DataFrame = {
    val in = df.select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    in.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        val len = if (bytes == null) 0 else bytes.length
        val nFrames = len / frameBytes
        (0 until nFrames by stride).iterator.map(f =>
          SampledFrame(id, f, f.toLong * frameBytes))
      }
    }(Encoders.product[SampledFrame]).toDF()
  }
}
