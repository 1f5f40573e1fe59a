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

  test("sourceOverlap: exact hand-computed matrix, zero pairs included, " +
      "cross-doc gram dedup within a source") {
    val seg = (n: Int, p: String) => (1 to n).map(i => s"$p$i").mkString(" ")
    val common = seg(12, "c") // 12 tokens -> 8 distinct 5-grams
    val docs = Seq(
      // source A: the common run + own tail; the SAME common run twice
      // across two docs (must dedupe to one gram set per source)
      (1L, "A", common + " " + seg(8, "a")),
      (2L, "A", common),
      // source B shares the common run
      (3L, "B", common + " " + seg(8, "b")),
      // source C disjoint
      (4L, "C", seg(20, "z"))
    ).toDF("doc_id", "source", "text")
    val got = Dedup.sourceOverlap(docs, "text", "source", shingleK = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6)))).toMap
    // A: doc1 has 16 grams (20 tokens), doc2's 8 grams are a subset ->
    // 16 distinct. B: 16. C: 16.
    // A∩B: the 8 common-run grams plus... doc1's grams crossing
    // common->a* differ from doc3's common->b* -> shared = 8.
    assert(got.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")))
    assert(got(("A", "B")) ==
      ((16L, 16L, 8L, 8.0 / 24.0, 8.0 / 16.0)))
    assert(got(("A", "C")) == ((16L, 16L, 0L, 0.0, 0.0)))
    assert(got(("B", "C")) == ((16L, 16L, 0L, 0.0, 0.0)))
  }
}
