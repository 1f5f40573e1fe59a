package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Audio energy-envelope fingerprinting + near-dup: gain and carrier
  * invariance, planted duplicate recovery, drop semantics — the third
  * modality on the shared banded Hamming dedup engine. */
class AudioFingerprintSpec extends SparkSpec {
  import spark.implicits._

  private def wav(samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1); bb.putInt(8000); bb.putInt(16000)
    bb.putShort(2); bb.putShort(16)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  private def fpOf(rows: (Long, Array[Byte])*): Map[Long, Long] =
    Multimodal.audioFingerprint(rows.toDF("doc_id", "blob"),
        "doc_id", "blob")
      .select("id", "fp").as[(Long, Long)].collect().toMap

  test("fingerprint is invariant to uniform gain") {
    val base = Array.tabulate[Short](650)(t => ((t % 130) + 10).toShort)
    val loud = base.map(s => (s * 3).toShort)
    val got = fpOf(1L -> wav(base), 2L -> wav(loud))
    assert(got(1L) == got(2L))
    assert(got(1L) != 0L) // the envelope actually varies
  }

  test("fingerprint is invariant to the carrier (sign pattern)") {
    // same loudness contour, different square periods -> same fp
    val got = Multimodal.audioFingerprint(
        Multimodal.syntheticToneWavs(Seq(3L, 68L, 133L).toDF("doc_id"),
          "doc_id"),
        "doc_id", "blob")
      .select("id", "fp").as[(Long, Long)].collect().toMap
    // 3, 68, 133 are congruent mod 65: same (n, r), carriers differ
    assert(got(3L) == got(68L) && got(68L) == got(133L))
  }

  test("audioNearDup recovers the planted mod-65 pairs at hamming 0") {
    val pairs = Multimodal.audioNearDup(
        Multimodal.syntheticToneWavs((0L to 129L).toDF("doc_id"), "doc_id"),
        "doc_id", "blob", maxBucket = 100000)
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Int)].collect()
    val zero = pairs.filter(_._3 == 0).map(p => (p._1, p._2)).toSet
    (0L to 64L).foreach(i =>
      assert(zero((i, i + 65)), s"missing planted pair ($i, ${i + 65})"))
  }

  test("short, stereo-incompatible, or undecodable payloads are dropped") {
    val got = fpOf(
      1L -> wav(Array.tabulate[Short](64)(_.toShort)), // < 65 samples
      2L -> Array[Byte](1, 2, 3), // not a WAV
      3L -> null)
    assert(got.isEmpty)
  }
}
