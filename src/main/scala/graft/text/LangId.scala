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
  * input. The fitted profile is (#langs x topK) rows — bounded fitted
  * state, same contract as the encoder dictionaries. Classification is
  * dual-path: profiles up to [[LangId.MaxLiteralProfile]] entries inline
  * as plan literals and score every language with `array_intersect`
  * inside ONE projection — scan-shaped, ZERO exchanges (round 7; the
  * join path cost two doc-scale shuffles: the (id, lang) score aggregate
  * plus the per-doc argmax window). Oversized profiles fall back to the
  * explode + broadcast-join + bounded-argmax path, which never
  * materializes the profile on the driver.
  */
object LangId {

  /** Profile entries (#langs x topK) at or under this inline as plan
    * literals for the scan-shaped classify; larger profiles take the
    * broadcast-join path (a plan literal of ~10^5 short strings is the
    * same budget [[Corpus.encodeDocs]] documents for its vocab map). */
  val MaxLiteralProfile = 65536

  /** Character n-grams of `lower(c)` as an array column; empty array when
    * the text is shorter than `n` (a bare `sequence(1, len-n+1)` would
    * otherwise count DOWN and fabricate grams). `lower(c)` is bound ONCE
    * per row via [[TextFunctions.bindOnce]]: referenced directly inside
    * the per-gram lambda it re-evaluates per element — O(len²) character
    * work per document (guide §1.2 per-task work; measured in round 10 on
    * the q_langid family). */
  def charGrams(c: Column, n: Int): Column =
    graft.text.TextFunctions.bindOnce(lower(c), lc =>
      when(length(lc) >= n,
        transform(sequence(lit(1), length(lc) - (n - 1)),
          i => lc.substr(i, lit(n))))
        .otherwise(array().cast("array<string>")))

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

  /** The profile as driver-local (lang, grams) pairs sorted lang ASC —
    * or None when it exceeds `maxEntries` (the limit+1 collect bounds
    * driver memory regardless of profile size; content is deterministic
    * when within budget because <= limit returns ALL rows). */
  private def literalProfile(profiles: DataFrame,
      maxEntries: Int): Option[Seq[(String, Seq[String])]] = {
    // maxEntries <= 0 forces the join path: skip the probe entirely —
    // even limit(1) can't push through the fit's rank window, so the
    // probe would execute most of the fit just to throw it away
    if (maxEntries <= 0) return None
    val langCol = profiles.columns.head
    val rows = profiles
      .select(col(langCol).cast("string").as("l"), col("gram"))
      .limit(maxEntries + 1).collect()
    if (rows.length > maxEntries)
      None
    else
      Some(rows.groupBy(_.getString(0)).toSeq
        .map { case (l, rs) => (l, rs.map(_.getString(1)).toSeq) }
        .sortBy(_._1))
  }

  /** (pred_lang, score) columns over a `__gd` gram-array column for the
    * literal path: one struct per language holding (overlap, -langIndex),
    * `array_max` argmaxes by struct order — max score first, then max
    * NEGATED index = lang ASC, exactly the join path's (score DESC,
    * lang ASC) tie-break. `array_intersect` dedups both sides, so the
    * overlap counts DISTINCT shared grams like the join path's
    * array_distinct + count. */
  private def literalBest(
      prof: Seq[(String, Seq[String])]): (Column, Column, Column) = {
    val scored = prof.zipWithIndex.map { case ((_, grams), i) =>
      struct(
        size(array_intersect(col("__gd"), lit(grams.toArray)))
          .cast("long").as("s"),
        lit(-i).as("nr"))
    }
    val langs = lit(prof.map(_._1).toArray)
    // the argmax struct is returned SEPARATELY so callers materialize it
    // as its own `__b` column: pred/score then read cheap field extracts
    // instead of re-evaluating the N-intersect argmax per output column
    // (CollapseProject duplicates non-cheap producers referenced from
    // several consumers — the ngramDiversity lesson)
    val best = array_max(array(scored: _*))
    val hit = col("__b").getField("s") > 0
    (best,
      when(hit, element_at(langs, (-col("__b").getField("nr")).cast("int")
        + 1)).otherwise(lit("und")),
      when(hit, col("__b").getField("s")).otherwise(lit(0L)))
  }

  /** Winner rows only — (idCol, pred_lang, score) for docs with ≥1
    * profile overlap; zero-overlap docs are absent (the public entry
    * points join a doc spine back and default them to ("und", 0)).
    * Join-path fallback for profiles too large to inline. */
  private def classifyBestJoin(
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
      profiles: DataFrame, n: Int = 3,
      maxLiteralEntries: Int = MaxLiteralProfile): DataFrame =
    literalProfile(profiles, maxLiteralEntries) match {
      case Some(prof) if prof.isEmpty =>
        docs.select(col(idCol), lit("und").as("pred_lang"),
          lit(0L).as("score"))
      case Some(prof) =>
        val (best, pred, score) = literalBest(prof)
        docs.select(col(idCol), charGrams(col(textCol), n).as("__gd"))
          .select(col(idCol), best.as("__b"))
          .select(col(idCol), pred.as("pred_lang"), score.as("score"))
      case None =>
        docs.select(col(idCol))
          .join(classifyBestJoin(docs, idCol, textCol, profiles, n),
            Seq(idCol), "left_outer")
          .select(col(idCol),
            coalesce(col("pred_lang"), lit("und")).as("pred_lang"),
            coalesce(col("score"), lit(0L)).as("score"))
    }

  /** Fit on the labeled corpus and classify the same corpus, flagging
    * agreement with the given label — the self-consistency report a
    * curation pipeline runs before trusting upstream language tags.
    * On the literal path the label comparison rides the SAME projection
    * as the score (no join at all); the join fallback carries it on the
    * one spine join. */
  def selfCheck(
      docs: DataFrame, idCol: String, textCol: String, langCol: String,
      n: Int = 3, topK: Int = 64,
      maxLiteralEntries: Int = MaxLiteralProfile): DataFrame =
    selfCheckWith(docs, idCol, textCol, langCol,
      fitProfiles(docs, textCol, langCol, n, topK), n, maxLiteralEntries)

  /** [[selfCheck]] against an ALREADY-FITTED profile relation (the
    * output shape of [[fitProfiles]]: langCol first, then gram, rank) —
    * the fit-once-classify-many entry point. A production curation run
    * fits the profile once and serves it to every classify pass;
    * re-fitting per call re-pays the corpus-scale trigram explode each
    * time (the q_langid family paid it 3× per bench iteration before
    * this split — VERDICT r7 #6). */
  def selfCheckWith(
      docs: DataFrame, idCol: String, textCol: String, langCol: String,
      profiles: DataFrame, n: Int = 3,
      maxLiteralEntries: Int = MaxLiteralProfile): DataFrame = {
    literalProfile(profiles, maxLiteralEntries) match {
      case Some(prof) if prof.isEmpty =>
        docs.select(col(idCol), lit("und").as("pred_lang"),
          lit(0L).as("score"), (lit("und") === col(langCol)).as("agrees"))
      case Some(prof) =>
        val (best, pred, score) = literalBest(prof)
        docs
          .select(col(idCol), col(langCol),
            charGrams(col(textCol), n).as("__gd"))
          .select(col(idCol), col(langCol), best.as("__b"))
          .select(col(idCol), pred.as("pred_lang"), score.as("score"),
            (pred === col(langCol)).as("agrees"))
      case None =>
        val pred = coalesce(col("pred_lang"), lit("und"))
        docs.select(col(idCol), col(langCol))
          .join(classifyBestJoin(docs, idCol, textCol, profiles, n),
            Seq(idCol), "left_outer")
          .select(col(idCol), pred.as("pred_lang"),
            coalesce(col("score"), lit(0L)).as("score"),
            (pred === col(langCol)).as("agrees"))
    }
  }
}
