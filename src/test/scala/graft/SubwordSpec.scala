package graft

import graft.text.Subword

/** Greedy longest-match subword tokenizer: fit ranks grams by (count desc,
  * piece asc), encode takes the longest vocabulary prefix at each position
  * and collapses unmatched words to a single [UNK]. */
class SubwordSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "hello hello world"),
    (2L, "low lowlow hell"),
    (3L, "  "),
    (4L, "xq hello")
  ).toDF("doc_id", "text")

  test("fitVocab ranks by count desc then piece asc with dense ids") {
    val v = Subword.fitVocab(docs, "text", size = 8, maxLen = 3)
      .orderBy("piece_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(v.length == 8)
    // 'l' is the most frequent single char (hello×3, low, lowlow, hell)
    assert(v.head._1 == "l" && v.head._2 == 0L)
    // ids are dense 0..7 and counts are non-increasing
    assert(v.map(_._2).toSeq == (0L to 7L))
    assert(v.sliding(2).forall(p => p(0)._3 >= p(1)._3))
  }

  test("encode is greedy longest-match with [UNK] word collapse") {
    val vocab = Seq("hell", "hello", "o", "low", "lowl", "ow", "w", "l",
      "rld")
      .zipWithIndex.map { case (p, i) => (p, i.toLong, 1L) }
      .toDF("piece", "piece_id", "n_occurrences")
    val got = Subword.encode(docs, "text", "doc_id", vocab, maxLen = 5)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    // "hello" -> whole-word piece (longest at pos 1 wins over "hell"+"o");
    // "world" has no piece at pos 1 ('w' yes — w o rld)
    assert(got(1L) == ((3L, 5L, 0L, "hello hello w o rld")))
    // "lowlow" -> greedy takes "lowl" then "ow" (not "low low")
    assert(got(2L) == ((3L, 4L, 0L, "low lowl ow hell")))
    // blank text -> zero words, empty encoding
    assert(got(3L) == ((0L, 0L, 0L, "")))
    // "xq" matches nothing -> the whole word is one [UNK] piece
    assert(got(4L) == ((2L, 2L, 1L, "[UNK] hello")))
  }

  test("partially-matched words roll back to a single [UNK]") {
    val vocab = Seq(("he", 0L, 1L)).toDF("piece", "piece_id",
      "n_occurrences")
    val got = Subword.encode(Seq((9L, "hexq he")).toDF("doc_id", "text"),
      "text", "doc_id", vocab, maxLen = 2).collect().head
    // "hexq" matches "he" then gets stuck at 'x' -> [UNK], pieces reset
    assert((got.getLong(1), got.getLong(2), got.getLong(3),
      got.getString(4)) == ((2L, 2L, 1L, "[UNK] he")))
  }
}
