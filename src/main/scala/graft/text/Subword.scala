package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Subword tokenization: fit a character-n-gram piece vocabulary, then
  * encode every document with greedy longest-match — the two halves of a
  * WordPiece-style tokenizer re-expressed Spark-first. The reference's
  * pipelines stop at whitespace token counts (dfpipeline has no subword
  * layer); a training-data pipeline needs real token counts for budget
  * sampling, packing, and contamination windows, so this is north-star
  * surface like the rest of graft.text.
  *
  * Shape at 100 TB: [[fitVocab]]'s corpus-sized work is one count
  * aggregate per extraction path (binary-sliced ASCII words + string
  * fallback, round 11) whose map sides combine grams per partition, so
  * each exchange carries DISTINCT grams (bounded by alphabet^maxLen in
  * the worst case, far less in practice); the paths merge in a
  * distinct-gram-sized re-aggregate, then a global top-`size` planned
  * as TakeOrderedAndProject. [[encode]] ships the ≤`size`-piece vocabulary
  * inside the plan (a HashSet reference in one codegen'd expression —
  * [[graft.functions.SubwordEncode]]) and runs at scan speed: no join, no
  * shuffle, no per-word allocation beyond the emitted pieces.
  */
object Subword {

  private def words(textCol: String): Column =
    filter(TextFunctions.tokensLower(coalesce(col(textCol), lit(""))),
      w => w =!= "")

  /** All character n-grams (lengths 1..`maxLen`) of every word occurrence,
    * counted corpus-wide; the top `size` by (count desc, piece asc) become
    * the vocabulary with dense rank ids (piece_id 0 = most frequent).
    * Single chars usually make the cut by frequency; rare codepoints that
    * miss it are what exercises [[graft.functions.SubwordEncode]]'s
    * `[UNK]` path. The gram explode multiplies rows ~`maxLen`× the corpus
    * codepoint count — project away other columns before calling at scale
    * (this selects only the text column). Output:
    * (piece, piece_id, n_occurrences). */
  def fitVocab(
      df: DataFrame, textCol: String, size: Int, maxLen: Int = 4)
      : DataFrame = {
    require(size >= 1, s"need size >= 1, got $size")
    require(maxLen >= 1, s"need maxLen >= 1, got $maxLen")
    val w = col("__w")
    val allWords = df.select(explode(words(textCol)).as("__w"))
    // BINARY gram extraction for ASCII words (round 11, guide §1.2
    // per-task work — the round-10 deferred "packed keys" lever,
    // REDESIGNED after measurement): a string `substr(s, l)` must SCAN
    // the UTF-8 bytes from position 0 to find codepoint boundaries, so
    // the per-word gram explode cost O(Σ s+l) = O(len²) byte scanning;
    // on a `binary` column the same substr is a direct O(l) byte-offset
    // copy. Words whose byte count equals their char count are pure
    // ASCII — byte positions ARE char positions — so their grams are cut
    // from the binary form and decoded back to strings only AFTER the
    // count aggregate (distinct-gram-sized, off the corpus hot path;
    // decode(…, 'UTF-8') of a byte-slice of ASCII is bit-exact).
    // Non-ASCII words keep the exact string path; an ASCII gram that
    // also occurs inside a non-ASCII word is counted on both paths, so
    // the two relations re-aggregate by piece. (A first cut packed
    // grams into (len, bits) longs via per-gram slice+aggregate
    // lambdas — measured 2–2.5× SLOWER at sf0.1: higher-order-function
    // packing is interpreted and cost more per gram than the
    // fixed-width-key savings returned. This variant strictly reduces
    // per-gram work instead.) Results pinned by the q_subword_vocab /
    // q_subword oracles.
    val ascii = length(w) === octet_length(w)
    val wb = col("__wb")
    val binGrams = allWords.filter(ascii)
      .select(w.cast("binary").as("__wb"))
      .select(explode(flatten(transform(
        sequence(lit(1), length(wb)),
        s => transform(
          sequence(lit(1), least(lit(maxLen), length(wb) - s + lit(1))),
          l => wb.substr(s, l))))).as("__gb"))
      .groupBy("__gb").agg(count(lit(1)).as("__c"))
      .select(expr("decode(__gb, 'UTF-8')").as("piece"), col("__c"))
    val strGrams = allWords.filter(!ascii)
      .select(explode(flatten(transform(
        sequence(lit(1), length(w)),
        s => transform(
          sequence(lit(1), least(lit(maxLen), length(w) - s + lit(1))),
          l => w.substr(s, l))))).as("piece"))
      .groupBy("piece").agg(count(lit(1)).as("__c"))
    val top = binGrams.unionByName(strGrams)
      .groupBy("piece").agg(sum("__c").as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("piece").asc)
      .limit(size)
    // ranked AFTER limit(size): ≤ `size` rows — bounded by construction
    top.withColumn("piece_id",
        row_number().over(graft.util.BoundedWindow
          .global(col("n_occurrences").desc, col("piece").asc)) - 1)
      .select(col("piece"), col("piece_id").cast("long").as("piece_id"),
        col("n_occurrences"))
  }

  /** Greedy longest-match encoding of every document against a fitted
    * [[fitVocab]] vocabulary (see [[graft.functions.SubwordEncode]] for
    * the per-word algorithm and the `[UNK]` rule). The vocabulary is
    * bounded by fit-time construction, so it collects into the expression
    * once; encoding is a pure per-row projection. Output per document:
    * (idCol, n_words, n_pieces, n_unk, encoded) where `encoded` is every
    * emitted piece space-joined in order. */
  def encode(
      df: DataFrame, textCol: String, idCol: String, vocab: DataFrame,
      maxLen: Int = 4): DataFrame = {
    val pieces = vocab.select("piece").collect().map(_.getString(0)).toSeq
    val e = graft.functions.GraftFunctions
      .subword_encode(words(textCol), pieces, maxLen)
    df.select(col(idCol), e.as("__e"))
      .select(col(idCol), col("__e.n_words"), col("__e.n_pieces"),
        col("__e.n_unk"), col("__e.encoded"))
  }
}
