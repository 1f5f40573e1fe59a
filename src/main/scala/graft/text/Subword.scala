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
  * Shape at 100 TB: [[fitVocab]] is the only shuffle — one count aggregate
  * whose map side combines grams per partition, so the exchange carries
  * DISTINCT grams (bounded by alphabet^maxLen in the worst case, far less
  * in practice), then a global top-`size` planned as
  * TakeOrderedAndProject. [[encode]] ships the ≤`size`-piece vocabulary
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
    // PACKED gram keys (round 11, guide §2.3 narrower types / §1.2
    // per-task work — the round-10 deferred lever): the corpus-sized
    // hash aggregate keys on (len, bits) long pairs instead of gram
    // STRINGS. Codepoints are extracted once per word; each gram of a
    // BMP-only word (maxLen ≤ 4 ⇒ ≤ 4 codepoints × 16 bits) packs its
    // codepoints base-65536 into one long via shiftleft (bitwise — no
    // ANSI overflow; l = 4 uses the full 64 bits, two's-complement wrap
    // is still a bijection per length). Fixed-width keys hash/compare
    // without touching variable-length bytes and shrink the partial-map
    // state and shuffle rows to 16 bytes + count. Words with any
    // supplementary (> 0xFFFF) codepoint — or maxLen > 4, where grams
    // exceed 64 bits — keep the exact string path; a BMP gram that also
    // occurs inside such a word is counted on BOTH paths, so the two
    // count relations are re-aggregated after the packed side decodes
    // its keys (distinct-gram-sized — off the corpus hot path).
    // Decoding inverts packing exactly: the base-65536 digits ARE the
    // gram's UTF-16BE code units (BMP ⇒ one unit per codepoint; valid
    // UTF-8 input has no lone surrogates), so
    // decode(unhex(lpad(hex(bits))), 'UTF-16BE') reproduces the piece
    // bit-for-bit. Results are pinned by the q_subword_vocab /
    // q_subword oracles.
    val counted: DataFrame = if (maxLen <= 4) {
      val cp = col("__cp")
      // `size` the function is shadowed by the `size` parameter here
      val nCp = org.apache.spark.sql.functions.size(cp)
      val withCp = allWords.select(w,
        transform(sequence(lit(1), length(w)),
          i => ascii(w.substr(i, lit(1)))).as("__cp"))
      val bmp = array_max(cp) <= lit(65535)
      val packed = withCp.filter(bmp)
        .select(explode(flatten(transform(
          sequence(lit(1), nCp),
          s => transform(
            sequence(lit(1), least(lit(maxLen), nCp - s + lit(1))),
            l => struct(l.cast("long").as("l"),
              aggregate(slice(cp, s, l), lit(0L),
                (acc, c) => shiftleft(acc, 16) + c).as("v"))))))
          .as("__g"))
        .groupBy(col("__g.l").as("__l"), col("__g.v").as("__v"))
        .agg(count(lit(1)).as("__c"))
        .select(expr("decode(unhex(lpad(hex(__v), " +
          "cast(__l * 4 as int), '0')), 'UTF-16BE')").as("piece"),
          col("__c"))
      val strings = withCp.filter(!bmp)
        .select(explode(flatten(transform(
          sequence(lit(1), length(w)),
          s => transform(
            sequence(lit(1), least(lit(maxLen), length(w) - s + lit(1))),
            l => w.substr(s, l))))).as("piece"))
        .groupBy("piece").agg(count(lit(1)).as("__c"))
      packed.unionByName(strings)
        .groupBy("piece").agg(sum("__c").as("n_occurrences"))
    } else {
      allWords.select(explode(flatten(transform(
          sequence(lit(1), length(w)),
          s => transform(
            sequence(lit(1), least(lit(maxLen), length(w) - s + lit(1))),
            l => w.substr(s, l))))).as("piece"))
        .groupBy("piece").agg(count(lit(1)).as("n_occurrences"))
    }
    val top = counted
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
