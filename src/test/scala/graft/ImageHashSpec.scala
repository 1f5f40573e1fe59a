package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Perceptual image hashing + cross-modal near-dup: real PNG round trip
  * through the point-sampled integer aHash, brightness invariance, and
  * the banded Hamming pair path shared with text simhash. */
class ImageHashSpec extends SparkSpec {
  import spark.implicits._

  private def gradients(ids: Long*) =
    Multimodal.syntheticGradientImages(ids.toDF("doc_id"), "doc_id")

  /** The generator's arithmetic, replicated independently: the codec
    * round trip must reproduce these exact integer samples. */
  private def expectedHash(id: Long): Long = {
    val w = (8 + id % 57).toInt
    val h = (8 + id * 3 % 57).toInt
    val s = for (j <- 0 until 8; i <- 0 until 8)
      yield (3 * (i * w / 8) + 7 * (j * h / 8)) % 200 + (id % 56).toInt
    val tot = s.map(_.toLong).sum
    s.zipWithIndex.foldLeft(0L) { case (acc, (v, k)) =>
      if (64L * v > tot) acc | (1L << k) else acc
    }
  }

  test("aHash through the real PNG codec equals the integer formula") {
    val got = Multimodal.imageAHash(gradients(0L, 7L, 13L, 100L, 3001L),
        "doc_id", "blob")
      .select("id", "ahash").as[(Long, Long)].collect().toMap
    for (id <- Seq(0L, 7L, 13L, 100L, 3001L))
      assert(got(id) == expectedHash(id), s"id $id")
  }

  test("hash is invariant to uniform brightness (offset cancels)") {
    // ids 5 and 5+57 share (w, h); their pixels differ by a constant
    // brightness offset (5 % 56 = 5 vs 62 % 56 = 6) — same hash
    val got = Multimodal.imageAHash(gradients(5L, 62L), "doc_id", "blob")
      .select("id", "ahash").as[(Long, Long)].collect().toMap
    assert(got(5L) == got(62L))
  }

  test("imageNearDup finds the planted same-shape pairs at hamming 0") {
    // 0..99: ids congruent mod 57 share (w, h) → exact hash duplicates
    val pairs = Multimodal.imageNearDup(
        gradients(0L to 99L: _*), "doc_id", "blob", maxBucket = 100000)
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Int)].collect()
    val planted = (0L to 42L).map(i => (i, i + 57))
    val zeroPairs = pairs.filter(_._3 == 0).map(p => (p._1, p._2)).toSet
    planted.foreach(p => assert(zeroPairs(p), s"missing planted pair $p"))
    assert(pairs.forall(_._3 <= 3))
  }

  test("sub-8x8 and undecodable payloads are dropped, not failed") {
    val blobs = Seq(
      (1L, Array[Byte](1, 2, 3)), // not a PNG
      (2L, null.asInstanceOf[Array[Byte]])
    ).toDF("doc_id", "blob")
    assert(Multimodal.imageAHash(blobs, "doc_id", "blob").count() == 0)
  }
}
