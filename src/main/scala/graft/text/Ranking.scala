package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level relevance scoring for retrieval-style curation (pick the
  * documents most relevant to a topic before mixing them into training
  * data). BM25 (Robertson–Spärck Jones, public formula) over whitespace
  * tokens.
  */
object Ranking {

  /** Corpus-statistical quality score: each document's mean unigram
    * log-probability under the corpus's own unigram distribution — the
    * workable unigram reduction of CCNet-style LM-perplexity filtering
    * (documents full of corpus-typical words score high; token-salad and
    * boilerplate-free gibberish score low). No smoothing needed: scoring
    * the fit corpus means every token has count ≥ 1.
    *
    * Shape at 100 TB: one token explode feeds the vocabulary count
    * (shuffle bounded by vocabulary after map-side combine); the scoring
    * join brings the frequency relation to the token stream (AQE
    * broadcasts typical vocabularies) and one per-doc aggregate finishes.
    * Output: (idCol, n_tokens, avg_logprob). */
  def unigramLogProb(
      df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tk = df.select(col(idCol),
      explode(TextFunctions.tokensLower(col(textCol))).as("__t"))
      .persist()
    val freq = tk.groupBy("__t").agg(count(lit(1)).as("__c"))
    val total = tk.count().toDouble
    val result = tk.join(freq, "__t")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        avg(log(col("__c").cast("double") / lit(total)))
          .as("avg_logprob"))
      .persist()
    result.count() // materialize, then release the token explode
    tk.unpersist(blocking = false)
    result
  }

  /** BM25 score of every document against a fixed bag of query `terms`.
    *
    * One aggregate pass collects the corpus statistics (N, average doc
    * length, per-term document frequency — all driver-side constants
    * afterwards, like a fitted encoder); the scoring pass is then a pure
    * per-row expression (term frequency via array filters over the token
    * array), so the corpus is scanned exactly twice and never shuffled.
    * IDF uses the standard `ln(1 + (N − df + 0.5)/(df + 0.5))` form
    * (always ≥ 0). Output: input columns + `out` (double). */
  def bm25(
      df: DataFrame, textCol: String, idCol: String, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75, out: String = "bm25"): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    require(!df.columns.contains("__toks"), "__toks is reserved by bm25")
    val toks = TextFunctions.tokensLower(col(textCol))
    // the scoring expressions read the ONE materialized token array
    val dl = size(col("__toks")).cast("double")

    val statAggs =
      Seq(count(lit(1)), avg(size(toks))) ++
        terms.map(t => sum(when(array_contains(toks, t), 1L).otherwise(0L)))
    val row = df.agg(statAggs.head, statAggs.tail: _*).head()
    val n = row.getLong(0).toDouble
    // sums/avg over ZERO rows are null — guard each (count alone is 0)
    val avgdl = Option(row.get(1)).fold(0.0)(_.asInstanceOf[Double])
    val dfs = terms.indices.map(i =>
      Option(row.get(2 + i)).fold(0.0)(_.asInstanceOf[Long].toDouble))

    val score = terms.zip(dfs).map { case (t, dft) =>
      val idf = math.log(1.0 + (n - dft + 0.5) / (dft + 0.5))
      val tf = size(filter(col("__toks"), x => x === t)).cast("double")
      lit(idf) * (tf * (k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / lit(avgdl)))
    }.reduce(_ + _)

    // token array materialized once; each term's tf reads it
    df.withColumn("__toks", toks)
      .withColumn(out, if (avgdl == 0.0) lit(0.0) else score)
      .drop("__toks")
  }
}
