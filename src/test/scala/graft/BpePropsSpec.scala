package graft

import graft.text.Bpe
import org.apache.spark.sql.functions.col

/** Property check for the distributed BPE fit: a from-scratch driver-side
  * reference implementation (pair counting over the word-frequency map,
  * (count DESC, pair ASC) winner, greedy left-to-right non-overlapping
  * application) must produce the IDENTICAL merge table on randomized
  * corpora. This is an independent second implementation — it shares no
  * code with the Spark path (no wrapped-string trick, no `replace`), so
  * agreement pins the algorithm itself, not the encoding. Corpora are
  * seeded (fixed RNG), so the suite is deterministic. */
class BpePropsSpec extends SparkSpec {
  import spark.implicits._

  // ---- reference implementation (plain Scala, no Spark) -----------------

  private def refApply(toks: Vector[String], l: String, r: String)
      : Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
        b += (l + r); i += 2
      } else { b += toks(i); i += 1 }
    }
    b.result()
  }

  private def refBpe(wordCounts: Map[String, Long], nMerges: Int)
      : Seq[(String, String, Long)] = {
    var segs: Seq[(Vector[String], Long)] = wordCounts.toSeq
      .map { case (w, c) => (w.map(_.toString).toVector, c) }
    val out = Seq.newBuilder[(String, String, Long)]
    var round = 0
    var done = false
    while (round < nMerges && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      segs.foreach { case (toks, c) =>
        var i = 0
        while (i + 1 < toks.length) {
          val k = (toks(i), toks(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // (count DESC, pair-string ASC) — the exact Spark tie-break
        val ((l, r), n) = counts.minBy { case ((a, b), c) =>
          (-c, a + " " + b)
        }
        out += ((l, r, n))
        segs = segs.map { case (toks, c) => (refApply(toks, l, r), c) }
        round += 1
      }
    }
    out.result()
  }

  test("distributed fit == independent reference BPE on seeded random " +
      "corpora (merge pairs, order, and counts)") {
    val rng = new scala.util.Random(0xB9E5EED)
    (1 to 6).foreach { trial =>
      val alphabet = "abc"
      val nDocs = 3 + rng.nextInt(5)
      val docs = (1 to nDocs).map { _ =>
        val nWords = 1 + rng.nextInt(8)
        (1 to nWords).map { _ =>
          val len = 1 + rng.nextInt(6)
          (1 to len).map(_ => alphabet(rng.nextInt(alphabet.length)))
            .mkString
        }.mkString(" ")
      }
      val wordCounts = docs.flatMap(_.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, o) => w -> o.size.toLong }
      val nMerges = 1 + rng.nextInt(10)
      val got = Bpe.fitBpe(docs.toDF("text"), "text", nMerges)
        .map(m => (m.lhs, m.rhs, m.n_pairs))
      val want = refBpe(wordCounts, nMerges)
      assert(got == want, s"trial $trial (docs=$docs, merges=$nMerges)")
    }
  }

  test("pieceTokens count invariants on a seeded random corpus: " +
      "n_words <= n_tokens <= n_chars, and monotone in merge count") {
    val rng = new scala.util.Random(0xC0FFEE)
    val docs = (1 to 8).map { i =>
      (i.toLong, (1 to (2 + rng.nextInt(6))).map { _ =>
        (1 to (1 + rng.nextInt(7)))
          .map(_ => "ab".charAt(rng.nextInt(2))).mkString
      }.mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    val all = Bpe.fitBpe(df, "text", 8)
    var prev = Long.MaxValue
    (0 to all.size).foreach { k =>
      val enc = Bpe.encodeBpe(df, "text", "doc_id", all.take(k))
        .agg(org.apache.spark.sql.functions.sum("n_tokens"),
          org.apache.spark.sql.functions.sum("n_words")).head()
      val toks = enc.getLong(0); val words = enc.getLong(1)
      val chars = docs.map(_._2.count(_ != ' ')).sum
      assert(words <= toks && toks <= chars, s"k=$k: $words/$toks/$chars")
      assert(toks <= prev, s"more merges must never add tokens (k=$k)")
      prev = toks
    }
    // sanity on the zero-merge end: tokens == chars exactly
    val enc0 = Bpe.encodeBpe(df, "text", "doc_id", Nil)
      .agg(org.apache.spark.sql.functions.sum("n_tokens")).head().getLong(0)
    assert(enc0 == docs.map(_._2.count(_ != ' ')).sum)
  }
}
