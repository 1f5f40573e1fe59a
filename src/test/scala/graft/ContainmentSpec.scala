package graft

import graft.text.Dedup
import org.apache.spark.sql.functions._

/** Asymmetric (containment) near-dup: the quote-detection primitive —
  * shared/min(|A|,|B|) catches a short doc embedded in a long one where
  * Jaccard is near zero. */
class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  private val quote = (1 to 12).map(i => s"q$i").mkString(" ")
  private val longDoc =
    ((1 to 200).map(i => s"w$i") ++ quote.split(" ") ++
      (201 to 400).map(i => s"w$i")).mkString(" ")

  test("a short doc quoted inside a long one scores containment 1.0") {
    val docs = Seq(
      (1L, longDoc),
      (2L, quote), // 12 tokens -> 8 distinct 5-grams, all inside doc 1
      (3L, (1 to 50).map(i => s"z$i").mkString(" ")) // unrelated
    ).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, "text", "doc_id",
        shingleK = 5, threshold = 0.5, maxPostings = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(4), r.getDouble(5)))
    assert(pairs.length == 1)
    val (a, b, shared, c) = pairs.head
    assert((a, b) == (1L, 2L))
    assert(shared == 8) // 12 tokens, k=5 -> 8 grams
    assert(c == 1.0)
    // the same pair under symmetric Jaccard: 8 shared / (397+8-8) -> ~0.02,
    // far below any useful dedup threshold — the asymmetric score is the
    // only one that surfaces it
  }

  test("hot grams over the posting cap undercount, never blow up") {
    // one gram shared by every doc; cap excludes it from the counts
    val common = "a b c d e"
    val docs = (1L to 20L).map(i => (i, s"$common x$i y$i z$i w$i v$i"))
      .toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, "text", "doc_id",
      shingleK = 5, threshold = 0.1, maxPostings = 5)
    // every pair's only shared gram has df=20 > cap 5 -> no pairs at all
    assert(pairs.count() == 0)
    val uncapped = Dedup.containmentPairs(docs, "text", "doc_id",
      shingleK = 5, threshold = 0.1, maxPostings = 1000)
    assert(uncapped.count() == 20L * 19 / 2)
  }

  test("df=1 grams never pair; empty/short docs emit nothing") {
    val docs = Seq(
      (1L, "a b c"), // shorter than k=5 -> no grams
      (2L, ""),
      (3L, (1 to 30).map(i => s"u$i").mkString(" "))
    ).toDF("doc_id", "text")
    assert(Dedup.containmentPairs(docs, "text", "doc_id",
      shingleK = 5, threshold = 0.0).count() == 0)
  }
}
