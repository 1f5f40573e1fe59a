package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fitted n-gram-profile language identification (Cavnar-Trenkle style:
  * "N-Gram-Based Text Categorization", SDAIR '94): fit a top-K character
  * n-gram profile per labeled language, then classify text by profile
  * overlap. Complements the fixed marker-word heuristic
  * ([[TextFunctions.languageId]]) with a TRAINED variant — the reference
  * has no language ops at all (dfpipeline/__init__.py:17-38); this is
  * north-star surface for corpus curation.
  *
  * Everything is integer counting with total tie-break orders
  * (count DESC, gram ASC; score DESC, lang ASC), so results are exactly
  * reproducible in any engine — the DuckDB oracle replays the identical
  * computation.
  *
  * Shape at 100 TB: the fit aggregates (lang, gram) counts — the relation
  * shrinks to at most |alphabet|^n rows per language BEFORE the top-K
  * window runs (trigrams over lowercased bytes: bounded, corpus-size-
  * independent), so the per-lang rank window never sees corpus-scale
  * input. The fitted profile is (#langs x topK) rows — broadcast state.
  * Classification is scan-shaped: explode distinct per-doc grams, one
  * broadcast join against the profile, one aggregation keyed by doc id,
  * and a per-doc argmax over <= #langs rows.
  */
object LangId {

  /** Character n-grams of `lower(c)` as an array column; empty array when
    * the text is shorter than `n` (a bare `sequence(1, len-n+1)` would
    * otherwise count DOWN and fabricate grams). */
  def charGrams(c: Column, n: Int): Column = {
    val lc = lower(c)
    when(length(lc) >= n,
      transform(sequence(lit(1), length(lc) - (n - 1)),
        i => lc.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))
  }

  /** Fit per-language profiles: the `topK` most frequent character
    * `n`-grams per language over the labeled corpus (ties broken by gram
    * string ascending). Returns (`langCol`, gram, rank). */
  def fitProfiles(
      docs: DataFrame, textCol: String, langCol: String,
      n: Int = 3, topK: Int = 64): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val counts = docs
      .select(col(langCol), explode(charGrams(col(textCol), n)).as("gram"))
      .groupBy(langCol, "gram").agg(count(lit(1)).as("__c"))
    // bounded window: the partition is the DISTINCT gram space of one
    // language (<= |alphabet|^n rows), not the corpus
    val w = Window.partitionBy(langCol)
      .orderBy(col("__c").desc, col("gram"))
    counts
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col(langCol), col("gram"), col("rank").cast("long"))
  }

  /** Winner rows only — (idCol, pred_lang, score) for docs with ≥1
    * profile overlap; zero-overlap docs are absent (the public entry
    * points join a doc spine back and default them to ("und", 0)). */
  private def classifyBest(
      docs: DataFrame, idCol: String, textCol: String,
      profiles: DataFrame, n: Int): DataFrame = {
    val langCol = profiles.columns.head
    val docGrams = docs
      .select(col(idCol), explode(array_distinct(
        charGrams(col(textCol), n))).as("__g"))
    val scores = docGrams
      .join(broadcast(profiles.select(col(langCol).as("__lang"),
        col("gram").as("__pg"))), col("__g") === col("__pg"))
      .groupBy(col(idCol), col("__lang"))
      .agg(count(lit(1)).as("__score"))
    // per-doc argmax over <= #langs rows — bounded window by construction
    val w = Window.partitionBy(idCol)
      .orderBy(col("__score").desc, col("__lang"))
    scores
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("__lang").as("pred_lang"),
        col("__score").as("score"))
  }

  /** Classify each document as the language whose profile shares the most
    * DISTINCT n-grams with it (score DESC, lang ASC tie-break); documents
    * overlapping no profile get ("und", 0). Returns
    * (`idCol`, pred_lang, score). */
  def classify(
      docs: DataFrame, idCol: String, textCol: String,
      profiles: DataFrame, n: Int = 3): DataFrame =
    docs.select(col(idCol))
      .join(classifyBest(docs, idCol, textCol, profiles, n), Seq(idCol),
        "left_outer")
      .select(col(idCol),
        coalesce(col("pred_lang"), lit("und")).as("pred_lang"),
        coalesce(col("score"), lit(0L)).as("score"))

  /** Fit on the labeled corpus and classify the same corpus, flagging
    * agreement with the given label — the self-consistency report a
    * curation pipeline runs before trusting upstream language tags.
    * (The label rides the one spine join — the corpus is not joined a
    * second time for it.) */
  def selfCheck(
      docs: DataFrame, idCol: String, textCol: String, langCol: String,
      n: Int = 3, topK: Int = 64): DataFrame = {
    val profiles = fitProfiles(docs, textCol, langCol, n, topK)
    val pred = coalesce(col("pred_lang"), lit("und"))
    docs.select(col(idCol), col(langCol))
      .join(classifyBest(docs, idCol, textCol, profiles, n), Seq(idCol),
        "left_outer")
      .select(col(idCol), pred.as("pred_lang"),
        coalesce(col("score"), lit(0L)).as("score"),
        (pred === col(langCol)).as("agrees"))
  }
}
