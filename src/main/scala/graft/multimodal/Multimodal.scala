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

/** Perceptual-hash record: point-sampled 64-bit aHash over the decoded
  * image ([[Multimodal.aHashOf]]). */
case class ImageHash(id: Long, width: Int, height: Int, ahash: Long)

/** Audio fingerprint record: 64-bit energy-envelope signature over the
  * decoded PCM ([[Multimodal.fingerprintOf]]). */
case class AudioFingerprint(id: Long, n_samples: Long, fp: Long)

/** Decoded-audio record: format metadata + duration + signal RMS (raw
  * PCM units). */
case class AudioFeatures(
    id: Long, sample_rate: Int, channels: Int, bits: Int,
    n_samples: Long, duration_ms: Double, rms: Double)

/** Demuxed video frame: absolute byte location of a stream-0 chunk inside
  * the container, plus the container's header metadata. */
case class VideoFrame(
    id: Long, frame_index: Int, byte_offset: Long, frame_bytes: Int,
    width: Int, height: Int, n_frames: Int)

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
  * Audio is REAL too: [[audioFeatures]] decodes WAV/AIFF/AU via
  * javax.sound (JVM-builtin) — header metadata + full-PCM RMS — with
  * [[syntheticWavs]] generating genuine RIFF payloads for the round-trip
  * oracle. And so is video: [[demuxFrames]] walks the RIFF/AVI chunk
  * tree ([[parseAvi]] — LIST descent, even-byte alignment, avih header,
  * 00dc/00db stream chunks) against [[syntheticAvis]]' canonical
  * containers; [[sampleFrames]] keeps the codec-free stride stub for
  * blobs that aren't real containers.
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

  /** Deterministic REAL gradient PNG per id, for the perceptual-hash path
    * ([[imageAHash]] needs intra-image structure; [[syntheticImages]]'
    * solid fills hash to all-zeros). Grayscale raster, written and read as
    * raw single-band samples (no ColorModel conversion — `getRGB` on
    * TYPE_BYTE_GRAY applies a gray→sRGB gamma that would break integer
    * replay): `w = 8 + id % 57`, `h = 8 + (3·id) % 57`,
    * `pixel(x,y) = (3x + 7y) % 200 + id % 56` (≤ 254). The id-dependent
    * term is a pure brightness offset, so ids sharing (w, h) — id ≡ id′
    * (mod 57) — are planted perceptual duplicates with different
    * brightness, and every quantity is replayable arithmetically by a SQL
    * oracle. */
  def syntheticGradientImages(df: DataFrame, idCol: String): DataFrame = {
    val in = df.select(col(idCol).cast("long")).as(Encoders.scalaLong)
    in.mapPartitions { it =>
      it.map { id =>
        val w = (8 + id % 57).toInt
        val h = (8 + (id * 3) % 57).toInt
        val off = (id % 56).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            raster.setSample(x, y, 0, (3 * x + 7 * y) % 200 + off)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        ImageIO.write(img, "png", bos)
        (id, bos.toByteArray)
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF(idCol, "blob")
  }

  /** Point-sampled average hash of a decoded image: luminance at the 8×8
    * grid `(⌊i·w/8⌋, ⌊j·h/8⌋)`, bit `j·8+i` set iff the sample exceeds
    * the 64-sample mean — compared as `64·s > Σs` so the decision is pure
    * INTEGER arithmetic (bit-replayable by any engine; a double mean
    * could flip boundary bits per evaluation order). Point sampling is
    * the nearest-neighbor-resize aHash variant: unlike block averaging it
    * reads 64 pixels regardless of image size, and the hash is invariant
    * to uniform brightness shifts (the offset cancels in the
    * comparison). Single-band rasters read raw samples; multi-band fall
    * back to the green channel (exact integer; r=g=b for gray content). */
  private[multimodal] def aHashOf(
      id: Long, bytes: Array[Byte]): Option[ImageHash] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null || img.getWidth < 8 || img.getHeight < 8) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        val gray = raster.getNumBands == 1
        val s = new Array[Int](64)
        var j = 0
        while (j < 8) {
          var i = 0
          while (i < 8) {
            val x = i * w / 8
            val y = j * h / 8
            s(j * 8 + i) =
              if (gray) raster.getSample(x, y, 0)
              else (img.getRGB(x, y) >> 8) & 0xFF
            i += 1
          }
          j += 1
        }
        var tot = 0L
        var k = 0
        while (k < 64) { tot += s(k); k += 1 }
        var hash = 0L
        k = 0
        while (k < 64) {
          if (64L * s(k) > tot) hash |= (1L << k)
          k += 1
        }
        Some(ImageHash(id, w, h, hash))
      }
    } catch { case _: Exception => None }
  }

  /** Perceptual hash per image (real codec decode); undecodable or
    * sub-8×8 rows are dropped. Output: (id, width, height, ahash). */
  def imageAHash(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val in = df.select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    in.mapPartitions(it => it.flatMap { case (id, bytes) =>
      aHashOf(id, bytes)
    })(Encoders.product[ImageHash]).toDF()
  }

  /** Image near-duplicate pairs: [[imageAHash]] signatures through the
    * banded Hamming engine ([[graft.text.Dedup.hammingNearDup]] — 4×16-bit
    * bands, pigeonhole-exact to Hamming ≤ 3, hot-bucket caps with logged
    * drops). The cross-modal reuse is the point: image dedup at 100 TB is
    * the same bounded-bucket join as text simhash dedup, with the decode
    * kernel swapped in front. Output (id_a, id_b, hamming). */
  def imageNearDup(
      df: DataFrame, idCol: String, binCol: String,
      maxHamming: Int = 3, maxBucket: Int = 1000): DataFrame =
    graft.text.Dedup.hammingNearDup(
      imageAHash(df, idCol, binCol).select(col("id"), col("ahash")),
      "id", "ahash", maxHamming, maxBucket, "imageNearDup")

  /** REAL audio decode via javax.sound (JVM-builtin WAV/AIFF/AU parsing):
    * format metadata from the RIFF header, full PCM read for the RMS.
    * RMS is computed in RAW 16-bit sample units (not normalized), so for
    * deterministic fixtures it is integer-exact and oracle-checkable;
    * non-16-bit payloads report rms = 0 (metadata still real).
    * Undecodable/empty payloads are dropped. */
  private[multimodal] def wavFeatures(
      id: Long, bytes: Array[Byte]): Option[AudioFeatures] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      val ais = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        val bits = fmt.getSampleSizeInBits
        val sr = fmt.getSampleRate.toInt
        val frameBytes = fmt.getFrameSize
        val data = ais.readAllBytes()
        val nFrames = if (frameBytes > 0) data.length / frameBytes else 0
        val rms =
          if (bits == 16 && data.length >= 2) {
            val bb = java.nio.ByteBuffer.wrap(data)
              .order(if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
                     else java.nio.ByteOrder.LITTLE_ENDIAN)
            val n = data.length / 2
            var sum = 0.0
            var i = 0
            while (i < n) { val s = bb.getShort(i * 2).toDouble; sum += s * s; i += 1 }
            math.sqrt(sum / n)
          } else 0.0
        Some(AudioFeatures(id, sr, fmt.getChannels, bits, nFrames.toLong,
          if (sr > 0) nFrames * 1000.0 / sr else 0.0, rms))
      } finally ais.close()
    } catch {
      case _: Exception => None // corrupt payload: skip, don't fail the task
    }
  }

  /** Decode a binary audio column (real javax.sound codec); undecodable
    * rows are dropped. Same mapPartitions contract as the image path. */
  def audioFeatures(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val in = df.select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    in.mapPartitions(it => it.flatMap { case (id, bytes) =>
      wavFeatures(id, bytes)
    })(Encoders.product[AudioFeatures]).toDF()
  }

  /** Deterministic REAL WAV per id (PCM16 mono 8 kHz; `n = 1 + id % 500`
    * samples of an alternating-sign square wave with amplitude
    * `A = 1 + 7·id % 10000`). Every |sample| = A, so RMS = A EXACTLY in
    * double arithmetic (A² ≤ 2³⁰ exact, the mean of n equal values is
    * exact, and sqrt of an exact square is exact) — which is what lets the
    * q_audio oracle check a full codec round trip arithmetically. */
  def syntheticWavs(df: DataFrame, idCol: String): DataFrame = {
    val in = df.select(col(idCol).cast("long")).as(Encoders.scalaLong)
    in.mapPartitions { it =>
      it.map { id =>
        val n = (1 + id % 500).toInt
        val amp = (1 + (id * 7) % 10000).toShort
        val samples = Array.tabulate[Short](n)(i =>
          if (i % 2 == 0) amp else (-amp).toShort)
        (id, wavBytes(samples, 8000))
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF(idCol, "blob")
  }

  /** Deterministic REAL WAV per id with a time-varying loudness envelope,
    * for the fingerprint path ([[audioFingerprint]] needs intra-signal
    * structure; [[syntheticWavs]]' constant-amplitude squares fingerprint
    * to all-zeros). PCM16 mono 8 kHz: `n = 2080 + (id % 13)·64` samples,
    * `sample(t) = sign(t) · (100 + (t·r) % 900)` with envelope rate
    * `r = 3 + id % 5` and a square carrier of period `8 + id % 8`. The
    * carrier sign squares away in window energies, so ids sharing
    * (n, r) — id ≡ id′ (mod 65) — are planted perceptual duplicates with
    * DIFFERENT carriers (same loudness contour, different timbre), and
    * every energy is integer-replayable by a SQL oracle. */
  def syntheticToneWavs(df: DataFrame, idCol: String): DataFrame = {
    val in = df.select(col(idCol).cast("long")).as(Encoders.scalaLong)
    in.mapPartitions { it =>
      it.map { id =>
        val n = (2080 + (id % 13) * 64).toInt
        val r = (3 + id % 5).toInt
        val p = (8 + id % 8).toInt
        val samples = Array.tabulate[Short](n) { t =>
          val a = 100 + (t.toLong * r % 900).toInt
          (if (t % p < (p + 1) / 2) a else -a).toShort
        }
        (id, wavBytes(samples, 8000))
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF(idCol, "blob")
  }

  /** Energy-envelope fingerprint of a decoded PCM16 signal (the
    * Chromaprint-shaped primitive, reduced to the loudness contour): the
    * signal splits into 65 windows (`window(t) = ⌊t·65/n⌋`), per-window
    * ENERGY `E(w) = Σ sample²` (integer — sign and carrier square away),
    * and bit `k` of the 64-bit fingerprint is set iff window `k+1` is
    * louder than window `k` per sample: `E(k+1)·L(k) > E(k)·L(k+1)`
    * (cross-multiplied — pure integer, no float mean, bit-replayable by
    * any engine; L is the window length, windows differ by ±1 sample).
    * Invariant to uniform gain (scales both sides) and to carrier/timbre
    * changes. Non-16-bit, empty, or undecodable payloads are dropped;
    * signals shorter than 65 samples are dropped (windows would be
    * empty). */
  private[multimodal] def fingerprintOf(
      id: Long, bytes: Array[Byte]): Option[AudioFingerprint] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      val ais = javax.sound.sampled.AudioSystem
        .getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) None
        else {
          val data = ais.readAllBytes()
          val n = data.length / 2
          if (n < 65) None
          else {
            val bb = java.nio.ByteBuffer.wrap(data)
              .order(if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
                     else java.nio.ByteOrder.LITTLE_ENDIAN)
            val e = new Array[Long](65)
            val l = new Array[Long](65)
            var t = 0
            while (t < n) {
              val w = (t.toLong * 65 / n).toInt
              val s = bb.getShort(t * 2).toLong
              e(w) += s * s
              l(w) += 1
              t += 1
            }
            var fp = 0L
            var k = 0
            while (k < 64) {
              if (e(k + 1) * l(k) > e(k) * l(k + 1)) fp |= (1L << k)
              k += 1
            }
            Some(AudioFingerprint(id, n.toLong, fp))
          }
        }
      } finally ais.close()
    } catch { case _: Exception => None }
  }

  /** Fingerprint per audio payload (real javax.sound decode). Output:
    * (id, n_samples, fp). */
  def audioFingerprint(
      df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val in = df.select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    in.mapPartitions(it => it.flatMap { case (id, bytes) =>
      fingerprintOf(id, bytes)
    })(Encoders.product[AudioFingerprint]).toDF()
  }

  /** Audio near-duplicate pairs: [[audioFingerprint]] signatures through
    * the same banded Hamming engine as text simhash and image aHash
    * ([[graft.text.Dedup.hammingNearDup]]) — the third modality on one
    * bounded-bucket dedup engine. Output (id_a, id_b, hamming). */
  def audioNearDup(
      df: DataFrame, idCol: String, binCol: String,
      maxHamming: Int = 3, maxBucket: Int = 1000): DataFrame =
    graft.text.Dedup.hammingNearDup(
      audioFingerprint(df, idCol, binCol).select(col("id"), col("fp")),
      "id", "fp", maxHamming, maxBucket, "audioNearDup")

  /** Canonical 44-byte RIFF/WAVE header + little-endian PCM16 mono data. */
  private[multimodal] def wavBytes(
      samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1) // PCM
    bb.putShort(1) // mono
    bb.putInt(sampleRate)
    bb.putInt(sampleRate * 2) // byte rate
    bb.putShort(2) // block align
    bb.putShort(16) // bits
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
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

  /** REAL RIFF/AVI container parse: walks the chunk tree (LIST descent,
    * even-byte chunk padding), reads `dwWidth`/`dwHeight` from the `avih`
    * header, and locates every stream-0 video chunk (`00dc`/`00db`) —
    * absolute data offset + payload size. Returns None for anything that
    * is not a well-formed AVI; a truncated tail stops the walk rather
    * than failing the task. */
  private[graft] def parseAvi(
      bytes: Array[Byte]): Option[(Int, Int, Vector[(Long, Int)])] = {
    if (bytes == null || bytes.length < 12) return None
    def fourcc(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var width = 0
    var height = 0
    val frames = Vector.newBuilder[(Long, Int)]
    def walk(start: Int, end: Int): Unit = {
      var p = start
      var ok = true
      while (ok && p + 8 <= end) {
        val tag = fourcc(p)
        val size = bb.getInt(p + 4)
        // Long math: a corrupt 32-bit size must not overflow the cursor
        val next = p.toLong + 8 + size + (size & 1) // chunks align to even
        if (size < 0 || next > Int.MaxValue) ok = false
        else if (tag == "LIST" && size >= 4 && p + 12 <= end) {
          // descend even into a truncated LIST tail (real demuxer behavior
          // for a cut-off file): clamp the inner walk at the data we have
          walk(p + 12, math.min(next, end.toLong).toInt)
          p = next.toInt
        } else if (next > end) ok = false // truncated data chunk: stop
        else {
          if (tag == "avih" && size >= 40) {
            width = bb.getInt(p + 8 + 32)
            height = bb.getInt(p + 8 + 36)
          } else if (tag == "00dc" || tag == "00db")
            frames += (((p + 8).toLong, size))
          p = next.toInt
        }
      }
    }
    walk(12, bytes.length)
    Some((width, height, frames.result()))
  }

  /** Demux a binary AVI column with the real container parser and emit
    * every `stride`-th stream-0 frame as
    * (id, frame_index, byte_offset, frame_bytes, width, height, n_frames)
    * — the seekable locations a GPU decode stage would read, without ever
    * shipping pixel data through the shuffle. Non-AVI payloads are
    * dropped. flatMap fan-out, same contract as [[sampleFrames]]. */
  def demuxFrames(
      df: DataFrame, idCol: String, binCol: String,
      stride: Int = 1): DataFrame = {
    require(stride >= 1, s"need stride >= 1, got $stride")
    val in = df.select(col(idCol).cast("long"), col(binCol))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    in.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        parseAvi(bytes).iterator.flatMap { case (w, h, frames) =>
          (0 until frames.length by stride).iterator.map { f =>
            val (off, sz) = frames(f)
            VideoFrame(id, f, off, sz, w, h, frames.length)
          }
        }
      }
    }(Encoders.product[VideoFrame]).toDF()
  }

  /** Deterministic REAL AVI per id: `n = 1 + id % 24` frames of
    * `fsz = 16 + 2·((3·id) % 33)` bytes each (even — no pad chunks),
    * `width = 32·(1 + id % 8)`, `height = 24·(1 + id % 6)`, in a
    * canonical RIFF layout (12-byte RIFF header, 200-byte hdrl LIST,
    * movi LIST at 212). Frame k's data therefore sits at EXACTLY
    * `232 + k·(8 + fsz)` — which is what lets the q_video oracle replay
    * the whole demux arithmetically. */
  def syntheticAvis(df: DataFrame, idCol: String): DataFrame = {
    val in = df.select(col(idCol).cast("long")).as(Encoders.scalaLong)
    in.mapPartitions { it =>
      it.map { id =>
        val n = (1 + id % 24).toInt
        val fsz = (16 + 2 * ((3 * id) % 33)).toInt
        val w = (32 * (1 + id % 8)).toInt
        val h = (24 * (1 + id % 6)).toInt
        (id, aviBytes(n, fsz, w, h))
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF(idCol, "blob")
  }

  /** Canonical minimal AVI: RIFF(12) + LIST hdrl(200: avih 64 + LIST strl
    * 124(strh 64 + strf 48)) + LIST movi(12 + n·(8+fsz)); all sizes
    * little-endian, frame payloads even-sized so no alignment padding. */
  private[graft] def aviBytes(
      nFrames: Int, frameBytes: Int, width: Int, height: Int): Array[Byte] = {
    val moviContent = nFrames * (8 + frameBytes)
    val total = 12 + 200 + 12 + moviContent
    val bb = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def cc(s: String): Unit = bb.put(s.getBytes("US-ASCII"))
    cc("RIFF"); bb.putInt(total - 8); cc("AVI ")
    cc("LIST"); bb.putInt(192); cc("hdrl")
    cc("avih"); bb.putInt(56)
    bb.putInt(33366) // dwMicroSecPerFrame (~30 fps)
    bb.putInt(0); bb.putInt(0); bb.putInt(0)
    bb.putInt(nFrames) // dwTotalFrames
    bb.putInt(0)
    bb.putInt(1) // dwStreams
    bb.putInt(frameBytes)
    bb.putInt(width); bb.putInt(height)
    bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
    cc("LIST"); bb.putInt(116); cc("strl")
    cc("strh"); bb.putInt(56)
    cc("vids"); cc("DIB ") // fccType / fccHandler (uncompressed)
    bb.putInt(0); bb.putInt(0); bb.putInt(0)
    bb.putInt(1); bb.putInt(30) // dwScale / dwRate = 30 fps
    bb.putInt(0); bb.putInt(nFrames) // dwStart / dwLength
    bb.putInt(frameBytes); bb.putInt(0); bb.putInt(0)
    bb.putShort(0); bb.putShort(0); bb.putShort(width.toShort)
    bb.putShort(height.toShort) // rcFrame
    cc("strf"); bb.putInt(40)
    bb.putInt(40) // biSize
    bb.putInt(width); bb.putInt(height)
    bb.putShort(1); bb.putShort(24) // planes / bpp
    bb.putInt(0); bb.putInt(frameBytes)
    bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0)
    cc("LIST"); bb.putInt(4 + moviContent); cc("movi")
    var k = 0
    while (k < nFrames) {
      cc("00dc"); bb.putInt(frameBytes)
      var i = 0
      while (i < frameBytes) { bb.put(((k + i) & 0xff).toByte); i += 1 }
      k += 1
    }
    bb.array()
  }

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
