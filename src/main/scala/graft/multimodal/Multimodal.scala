package graft.multimodal

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Decoded-image record: typed metadata + pixel payload size. */
case class DecodedImage(
    id: Long, width: Int, height: Int, channels: Int, n_pixels: Long)

/** Fully-decoded image features (pixels read, not just headers). */
case class ImageFeatures(
    id: Long, width: Int, height: Int, channels: Int, mean_luma: Double)

/** Sampled video frame record (stub). */
case class SampledFrame(id: Long, frame_index: Int, byte_offset: Long)

/** Multimodal-column plumbing: image/audio/video travel as opaque `binary`
  * columns with typed metadata structs. The per-record decode runs in
  * `mapPartitions` — the JVM analog of a batched pandas UDF: one iterator
  * per partition, constant memory, partitioning preserved, schema enforced
  * by case-class Encoders.
  *
  * Two image codecs behind the same contract:
  *  - [[decodeImagesIO]] / [[imageFeatures]] are REAL decodes via
  *    `javax.imageio` (JVM-builtin: PNG/JPEG/GIF/BMP) — header-only for
  *    metadata, full pixel read for features;
  *  - [[decodeImages]] keeps the deterministic STUB (`len % 512`
  *    arithmetic) for the synthetic testdata tables, whose blobs are not
  *    real image bytes.
  * Video demux ([[sampleFrames]]) stays a stub — no container parser ships
  * with the JVM — but the flatMap fan-out shape is the real contract.
  */
object Multimodal {

  /** Deterministic fake decode (see object doc). */
  private[multimodal] def fakeDecode(id: Long, bytes: Array[Byte]): DecodedImage = {
    val len = if (bytes == null) 0 else bytes.length
    val w = 1 + (len % 512)
    val h = 1 + ((len * 7) % 512)
    DecodedImage(id, w, h, 3, w.toLong * h * 3)
  }

  /** Real header-only decode via javax.imageio: width/height/bands without
    * reading pixel data (the reader parses just the image header — cheap
    * even for large payloads). Undecodable/empty payloads → None. */
  private[multimodal] def imageioDecode(
      id: Long, bytes: Array[Byte]): Option[DecodedImage] = {
    if (bytes == null || bytes.isEmpty) return None
    val stream = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(stream)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(stream, true, true)
          val w = r.getWidth(0)
          val h = r.getHeight(0)
          val types = r.getImageTypes(0)
          val channels =
            if (types.hasNext) types.next().getNumComponents else 3
          Some(DecodedImage(id, w, h, channels, w.toLong * h * channels))
        } finally r.dispose()
      }
    } catch {
      case _: Exception => None // corrupt payload: skip, don't fail the task
    } finally stream.close()
  }

  /** Real full decode + feature extraction: mean luminance over all pixels
    * (ITU-R BT.601 weights on the ARGB raster). The shape of every real
    * per-image kernel — bounded memory per record, one pass. */
  private[multimodal] def imageioFeatures(
      id: Long, bytes: Array[Byte]): Option[ImageFeatures] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        // bulk row grabs into a reused buffer: per-pixel getRGB(x, y) pays
        // a ColorModel conversion + dispatch per PIXEL — on megapixel
        // images that dominates the whole decode
        val row = new Array[Int](w)
        var sum = 0.0
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          var x = 0
          while (x < w) {
            val rgb = row(x)
            val r = (rgb >> 16) & 0xFF
            val g = (rgb >> 8) & 0xFF
            val b = rgb & 0xFF
            sum += 0.299 * r + 0.587 * g + 0.114 * b
            x += 1
          }
          y += 1
        }
        Some(ImageFeatures(id, w, h, img.getColorModel.getNumComponents,
          sum / (w.toLong * h)))
      }
    } catch {
      case _: Exception => None
    }
  }

  /** Decode a binary image column with javax.imageio (real codec, header
    * only); undecodable rows are dropped. */
  def decodeImagesIO(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val in = df.select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    in.mapPartitions(it => it.flatMap { case (id, bytes) =>
      imageioDecode(id, bytes)
    })(Encoders.product[DecodedImage]).toDF()
  }

  /** Full pixel decode + per-image features (real codec); undecodable rows
    * are dropped. */
  def imageFeatures(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val in = df.select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    in.mapPartitions(it => it.flatMap { case (id, bytes) =>
      imageioFeatures(id, bytes)
    })(Encoders.product[ImageFeatures]).toDF()
  }

  /** Attach a demo binary payload column derived from a string column (the
    * testdata tables carry no real blobs). */
  def withBlob(df: DataFrame, textCol: String, blobCol: String): DataFrame =
    df.withColumn(blobCol, col(textCol).cast("binary"))

  /** Deterministic REAL PNG per id (solid gray; `w = 1 + id % 64`,
    * `h = 1 + 3·id % 64`, `gray = 5·id % 256`). The testdata tables carry no
    * image bytes, so this generates genuine PNG payloads in-flight — the
    * imageio codec then round-trips them end-to-end and an oracle can check
    * the decoded metadata arithmetically. */
  def syntheticImages(df: DataFrame, idCol: String): DataFrame = {
    val in = df.select(col(idCol).cast("long")).as(Encoders.scalaLong)
    in.mapPartitions { it =>
      it.map { id =>
        val w = (1 + id % 64).toInt
        val h = (1 + (id * 3) % 64).toInt
        val g = ((id * 5) % 256).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rgb = (g << 16) | (g << 8) | g
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        ImageIO.write(img, "png", bos)
        (id, bos.toByteArray)
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF(idCol, "blob")
  }

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
