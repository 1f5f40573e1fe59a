package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 query module (built in round 9; the DpqTag value keeps its
  * historical "r9dpq" literal because it seeds the released noise —
  * changing it would be a new DP release): distributed BPE merge-rule
  * learning (VERDICT r8
  * #3) — true iterative pair merges over the distinct-word table,
  * completing the tokenizer story next to [[graft.text.Subword]]'s
  * WordPiece-style vocabulary — with the generated unrolled-round
  * DuckDB replay oracle (the k-means discipline: both engines execute
  * identical string/integer arithmetic, so the merge table and the
  * per-document encodings hash-match bit for bit); packing by the
  * learned piece stream (q_pack_bpe — context budgets in REAL
  * tokenizer counts); within-doc repeated-span stats (q_span_selfrep,
  * closing the gap the round-9 span-accuracy measurement documented);
  * and the DP quantile releases (q_dp_quantiles / q_dp_quantiles_by) —
  * discrete noisy-max whose geometric noise decodes from a 60-bit md5
  * uniform through a pure INTEGER threshold cascade, so even the
  * randomized mechanism replays bit-for-bit in the oracle.
  */
object Round10Queries {
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Merge-rule count for the oracled queries: enough rounds that real
    * multi-char pieces emerge at sf0.01 (the top English digraphs and a
    * trigraph land in the first dozen), small enough that the unrolled
    * oracle SQL stays readable. */
  private val BpeMerges = 12

  /** Fit-once memo (the langid/PQ discipline, via the bounded
    * mtime-keyed [[graft.util.FitMemo]]): q_subword_bpe and
    * q_subword_bpe_encode fit the IDENTICAL merge table — same corpus,
    * same rounds — and the merge table is bounded driver state
    * (BpeMerges rows). Fit cost is reported in the bench artifact's
    * fit_sec. */
  private val bpeMemo =
    new graft.util.FitMemo[Seq[graft.text.Bpe.Merge]]("bpe_merges")
  private def bpeMerges(s: SparkSession, d: String)
      : Seq[graft.text.Bpe.Merge] =
    bpeMemo.getOrFit(d)(
      graft.text.Bpe.fitBpe(t(s, d, "documents"), "text", BpeMerges))

  // ---- generated BPE replay oracle ---------------------------------------
  // Both queries share the fit chain: seg0 is the distinct-word frequency
  // table with all-chars segmentation; each round computes weighted pair
  // counts, picks the (count DESC, pair ASC) winner, and applies it as a
  // plain left-to-right non-overlapping replace over the wrapped-token
  // form (see graft.text.Bpe scaladoc for why replace IS greedy BPE
  // application under that representation).

  /** The normalized word stream: lowercased whitespace tokens restricted
    * to `[a-z0-9]+` — identical semantics to [[graft.text.Bpe.bpeWords]].
    * `cols` lets the encode oracle keep doc_id alongside. */
  private def bpeWordsSql(cols: String): String =
    s"""SELECT $cols unnest(list_filter(
          string_split_regex(trim(lower(coalesce(text, ''))), '\\s+'),
          x -> regexp_full_match(x, '[a-z0-9]+'))) AS word
        FROM documents"""

  /** One merge round's three CTEs, reading seg$prev / writing seg$r. */
  private def bpeRoundSql(r: Int): String = {
    val prev = r - 1
    s"""pairs$r AS MATERIALIZED (
          SELECT p AS pair, CAST(sum(cnt) AS BIGINT) AS n FROM (
            SELECT cnt, unnest(list_transform(range(1, len(toks)),
              i -> toks[i] || ' ' || toks[i + 1])) AS p
            FROM (SELECT cnt,
                    list_filter(string_split(seg, '|'), x -> x <> '') AS toks
                  FROM seg$prev))
          GROUP BY 1),
        best$r AS MATERIALIZED (SELECT pair, n FROM pairs$r ORDER BY n DESC, pair LIMIT 1),
        seg$r AS MATERIALIZED (
          SELECT cnt, replace(seg,
            '|' || split_part((SELECT pair FROM best$r), ' ', 1) || '||' ||
              split_part((SELECT pair FROM best$r), ' ', 2) || '|',
            '|' || replace((SELECT pair FROM best$r), ' ', '') || '|') AS seg
          FROM seg$prev)"""
  }

  private def bpeFitPrefixSql(nMerges: Int): String = {
    val rounds = (1 to nMerges).map(bpeRoundSql).mkString(",\n")
    s"""WITH
        bw AS MATERIALIZED (${bpeWordsSql("")}),
        seg0 AS MATERIALIZED (
          SELECT CAST(count(*) AS BIGINT) AS cnt,
                 regexp_replace(word, '(.)', '|\\1|', 'g') AS seg
          FROM bw GROUP BY word),
        $rounds"""
  }

  private def bpeFitSql(nMerges: Int): String = {
    val union = (1 to nMerges)
      .map(r => s"SELECT $r AS r, pair, n FROM best$r")
      .mkString("\n UNION ALL ")
    s"""${bpeFitPrefixSql(nMerges)}
        SELECT CAST(r AS INTEGER) AS merge_rank,
               split_part(pair, ' ', 1) AS lhs,
               split_part(pair, ' ', 2) AS rhs,
               n AS n_pairs
        FROM ($union)"""
  }

  private def bpeEncodeSql(nMerges: Int): String = {
    val encRounds = (1 to nMerges).map { r =>
      val prev = r - 1
      s"""enc$r AS MATERIALIZED (
            SELECT doc_id, replace(seg,
              '|' || split_part((SELECT pair FROM best$r), ' ', 1) || '||' ||
                split_part((SELECT pair FROM best$r), ' ', 2) || '|',
              '|' || replace((SELECT pair FROM best$r), ' ', '') || '|') AS seg
            FROM enc$prev)"""
    }.mkString(",\n")
    s"""${bpeFitPrefixSql(nMerges)},
        dw AS MATERIALIZED (${bpeWordsSql("doc_id,")}),
        enc0 AS MATERIALIZED (
          SELECT doc_id, regexp_replace(word, '(.)', '|\\1|', 'g') AS seg
          FROM dw),
        $encRounds,
        encagg AS MATERIALIZED (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
                 CAST(sum(len(list_filter(string_split(seg, '|'),
                   x -> x <> ''))) AS BIGINT) AS n_tokens
          FROM enc$nMerges GROUP BY doc_id)
        SELECT d.doc_id,
               CAST(coalesce(e.n_words, 0) AS BIGINT) AS n_words,
               CAST(coalesce(e.n_tokens, 0) AS BIGINT) AS n_tokens
        FROM documents d LEFT JOIN encagg e ON d.doc_id = e.doc_id"""
  }

  private val PackBpeCtx = 32
  private val PackBpeShards = 4

  /** Pack-by-BPE-tokens oracle: the fit prefix's best1..bestN pairs land
    * in a one-row merge-table CTE (lambda bodies can reference row
    * columns but not scalar subqueries), each word segments through the
    * nested-replace chain inside a list_transform, and the pack replay
    * is the q_pack arithmetic over the BPE piece stream. */
  private def packBpeSql(nMerges: Int): String = {
    val mtCols = (1 to nMerges)
      .map(r => s"(SELECT pair FROM best$r) AS p$r").mkString(", ")
    val chain = (1 to nMerges).foldLeft(
      "regexp_replace(w, '(.)', '|\\1|', 'g')") { (cur, r) =>
      s"""replace($cur, '|' || split_part(p$r, ' ', 1) || '||' ||
            split_part(p$r, ' ', 2) || '|',
          '|' || replace(p$r, ' ', '') || '|')"""
    }
    val ctx = PackBpeCtx
    s"""${bpeFitPrefixSql(nMerges)},
        mt AS MATERIALIZED (SELECT $mtCols),
        dwords AS MATERIALIZED (
          SELECT doc_id, list_filter(
            string_split_regex(trim(lower(coalesce(text, ''))), '\\s+'),
            x -> regexp_full_match(x, '[a-z0-9]+')) AS words
          FROM documents),
        dtoks AS MATERIALIZED (
          SELECT doc_id, flatten(list_transform(words,
            w -> list_filter(string_split($chain, '|'), x -> x <> '')))
            AS toks
          FROM dwords, mt),
        d AS MATERIALIZED (
          SELECT doc_id, toks,
            CAST(floor(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                               1, 15)) AS BIGINT)
                       / 1152921504606846976.0 * $PackBpeShards)
              AS INTEGER) AS shard_id,
            CAST(('0x' || substr(md5('shuffle:' ||
                                     CAST(doc_id AS VARCHAR)), 1, 15))
                   AS BIGINT) / 1152921504606846976.0 AS shard_rank
          FROM dtoks),
        c AS MATERIALIZED (
          SELECT doc_id, toks, shard_id,
            CAST(len(toks) AS BIGINT) AS n,
            CAST(sum(len(toks)) OVER (PARTITION BY shard_id
                   ORDER BY shard_rank, doc_id
                   ROWS UNBOUNDED PRECEDING) - len(toks) AS BIGINT) AS strt
          FROM d WHERE len(toks) >= 1),
        e AS MATERIALIZED (
          SELECT doc_id, toks, shard_id, n, strt,
            CAST(u AS BIGINT) AS seq_index
          FROM c, LATERAL (SELECT unnest(range(strt // $ctx,
                                    (strt + n - 1) // $ctx + 1)) AS u))
        SELECT shard_id, seq_index, doc_id,
          greatest(strt, seq_index * $ctx) - strt AS doc_offset,
          greatest(strt, seq_index * $ctx) - seq_index * $ctx AS seq_offset,
          least(strt + n, (seq_index + 1) * $ctx)
            - greatest(strt, seq_index * $ctx) AS n_tokens,
          array_to_string(
            toks[CAST(greatest(strt, seq_index * $ctx) - strt + 1
                   AS INTEGER)
                 :CAST(least(strt + n, (seq_index + 1) * $ctx) - strt
                       AS INTEGER)], ' ') AS slice_text
        FROM e"""
  }

  // ---- DP quantile release (generated noisy-max replay oracle) ----------
  private val DpqTag = "r9dpq"
  private val DpqQs = Seq(0.25, 0.5, 0.9, 0.99)
  private val DpqLo = -1000.0
  private val DpqHi = 10000.0
  private val DpqBins = 256
  private val DpqP = 0.5
  private val DpqMaxNoise = 24

  /** The exponential-mechanism-analog quantile release replayed in SQL:
    * same bin arithmetic, same md5-uniform, same INTEGER threshold
    * cascade (literals generated from the identical
    * [[graft.relational.Privacy.geometricThresholds]] call), same
    * integer argmax — the k-means/BPE generated-oracle discipline
    * applied to a randomized mechanism. */
  private def dpQuantilesSql(): String = {
    val w = DpqHi - DpqLo
    val cascade = dpqCascadeSql()
    val qvals = DpqQs.zipWithIndex.map { case (q, i) =>
      s"($i, CAST($q AS DOUBLE))" }.mkString(", ")
    s"""WITH bc AS MATERIALIZED (
          SELECT CAST(least(greatest(floor((CAST(c_acctbal AS DOUBLE) -
                   ($DpqLo)) / $w * ${DpqBins.toDouble}), 0.0),
                 ${DpqBins - 1}.0) AS BIGINT) AS idx,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM customer
          WHERE c_acctbal IS NOT NULL
            AND NOT isnan(CAST(c_acctbal AS DOUBLE))
          GROUP BY 1),
        edges AS MATERIALIZED (SELECT unnest(range(1, ${DpqBins + 1})) AS i),
        cumt AS MATERIALIZED (
          SELECT e.i,
            sum(coalesce(bc.cnt, 0)) OVER (ORDER BY e.i
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM edges e LEFT JOIN bc ON bc.idx = e.i - 1),
        tot AS MATERIALIZED (
          SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) AS n FROM bc),
        qst(qi, q) AS (VALUES $qvals),
        sc AS MATERIALIZED (
          SELECT q, qi, i, cum, n,
            CAST(('0x' || substr(md5('$DpqTag:' || CAST(qi AS VARCHAR) ||
              ':' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) AS u60
          FROM cumt, qst, tot),
        sc2 AS MATERIALIZED (
          SELECT q, qi, i,
            -abs(cum - CAST(floor(q * n) AS BIGINT)) +
              (CASE $cascade END) AS score
          FROM sc)
        SELECT q, round(($DpqLo) + CAST(i AS DOUBLE) * $w /
            ${DpqBins.toDouble}, 6) AS value_released
        FROM (SELECT q, i, row_number() OVER (PARTITION BY qi
                ORDER BY score DESC, i) AS rn FROM sc2)
        WHERE rn = 1"""
  }

  private def dpqCascadeSql(): String = {
    val ts = graft.relational.Privacy.geometricThresholds(DpqP, DpqMaxNoise)
    ts.init.map { case (t, k) =>
      s"WHEN u60 < $t THEN $k" }.mkString(" ") + s" ELSE ${ts.last._2}"
  }

  /** Per-group replay: identical arithmetic with the group value spliced
    * into the bin key, the windows, and the md5 noise key. */
  private def dpQuantilesBySql(): String = {
    val w = DpqHi - DpqLo
    val qvals = DpqQs.take(2).zipWithIndex.map { case (q, i) =>
      s"($i, CAST($q AS DOUBLE))" }.mkString(", ")
    s"""WITH bc AS MATERIALIZED (
          SELECT c_mktsegment AS g,
                 CAST(least(greatest(floor((CAST(c_acctbal AS DOUBLE) -
                   ($DpqLo)) / $w * ${DpqBins.toDouble}), 0.0),
                 ${DpqBins - 1}.0) AS BIGINT) AS idx,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM customer
          WHERE c_acctbal IS NOT NULL
            AND NOT isnan(CAST(c_acctbal AS DOUBLE))
          GROUP BY 1, 2),
        edges AS MATERIALIZED (SELECT unnest(range(1, ${DpqBins + 1})) AS i),
        cand AS MATERIALIZED (
          SELECT gs.g AS g, e.i AS i, coalesce(bc.cnt, 0) AS cnt
          FROM (SELECT DISTINCT g FROM bc) gs
          CROSS JOIN edges e
          LEFT JOIN bc ON bc.g IS NOT DISTINCT FROM gs.g
            AND bc.idx = e.i - 1),
        cumt AS MATERIALIZED (
          SELECT g, i, cnt,
            sum(cnt) OVER (PARTITION BY g ORDER BY i
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
            sum(cnt) OVER (PARTITION BY g) AS n
          FROM cand),
        qst(qi, q) AS (VALUES $qvals),
        sc AS MATERIALIZED (
          SELECT g, q, qi, i, cum, n,
            CAST(('0x' || substr(md5('$DpqTag:' ||
              coalesce(CAST(g AS VARCHAR), '') || ':' ||
              CAST(qi AS VARCHAR) || ':' ||
              CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) AS u60
          FROM cumt, qst),
        sc2 AS MATERIALIZED (
          SELECT g, q, qi, i,
            -abs(cum - CAST(floor(q * n) AS BIGINT)) +
              (CASE ${dpqCascadeSql()} END) AS score
          FROM sc)
        SELECT g AS c_mktsegment, q,
          round(($DpqLo) + CAST(i AS DOUBLE) * $w / ${DpqBins.toDouble}, 6)
            AS value_released
        FROM (SELECT g, q, i, row_number() OVER (PARTITION BY g, qi
                ORDER BY score DESC, i) AS rn FROM sc2)
        WHERE rn = 1"""
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // the learned merge table itself: rank, pair, weighted count
    "q_subword_bpe" -> ((s, d) =>
      graft.text.Bpe.mergesDF(s, bpeMerges(s, d))),

    // every document encoded with the learned rules (rank-order greedy
    // application — the exact fit-time semantics): word + token counts
    "q_subword_bpe_encode" -> ((s, d) =>
      graft.text.Bpe.encodeBpe(t(s, d, "documents"), "text", "doc_id",
        bpeMerges(s, d))),

    // within-doc repeated spans (the self-repetition counterpart to
    // q_span_dedup — the looping-text quality gate): zero-shuffle
    // projection, k = 5 matching the cross-doc query's gram arity.
    // The corpus has no naturally looping docs, so every 10th doc is
    // deterministically self-doubled (text || ' ' || text, identical in
    // the oracle) — the repeated-gram path is exercised on ~10% of rows,
    // never vacuous (the r7 #5 discipline)
    "q_span_selfrep" -> ((s, d) =>
      graft.text.Dedup.selfRepeatedSpans(
        t(s, d, "documents").withColumn("text",
          when(col("doc_id") % 10 === 0,
            concat(col("text"), lit(" "), col("text")))
            .otherwise(col("text"))),
        "text", "doc_id", k = 5)),

    // DP quantile release: exponential-mechanism analog with integer
    // threshold-cascade geometric noise — extends the privacy ladder
    // past counts/sums to the canonical order-statistic release
    "q_dp_quantiles" -> ((s, d) =>
      graft.relational.Privacy.dpQuantiles(
        t(s, d, "customer"), "c_acctbal", DpqQs, DpqLo, DpqHi, DpqBins,
        DpqTag, DpqP, DpqMaxNoise)),

    // GPT-style packing by REAL tokenizer counts: the learned BPE piece
    // stream feeds the shard/cumsum/chop arithmetic — the composition a
    // training-data pipeline actually runs (fit tokenizer -> encode ->
    // pack into fixed context windows)
    "q_pack_bpe" -> ((s, d) =>
      graft.text.Corpus.packSequencesTokens(
        t(s, d, "documents"),
        graft.text.Bpe.pieceTokens(col("text"), bpeMerges(s, d)),
        "doc_id", ctxTokens = PackBpeCtx, nShards = PackBpeShards)),

    // per-cohort DP quantiles: one release per market segment, each its
    // own deterministic draw (parallel composition over disjoint groups)
    "q_dp_quantiles_by" -> ((s, d) =>
      graft.relational.Privacy.dpQuantilesBy(
        t(s, d, "customer"), Seq("c_mktsegment"), "c_acctbal",
        DpqQs.take(2), DpqLo, DpqHi, DpqBins, DpqTag, DpqP, DpqMaxNoise))
  )

  def oracleSql: Map[String, String] = Map(
    "q_subword_bpe" -> bpeFitSql(BpeMerges),
    "q_subword_bpe_encode" -> bpeEncodeSql(BpeMerges),

    // exact gram strings (md5 identity — the q_span_dedup collision
    // argument); n_rep = total occurrences minus distinct
    "q_span_selfrep" ->
      """WITH g AS (
           SELECT doc_id, list_transform(
             range(1, len(ws) - 3),
             i -> md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||
                      ws[i+3] || ' ' || ws[i+4])) AS grams
           FROM (SELECT doc_id,
                   regexp_split_to_array(trim(lower(
                     CASE WHEN doc_id % 10 = 0 THEN text || ' ' || text
                          ELSE text END)), '\s+') AS ws
                 FROM documents))
         SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
           CAST(len(grams) - len(list_distinct(grams)) AS BIGINT)
             AS n_rep_grams,
           CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE) /
             len(grams) AS rep_frac
         FROM g WHERE len(grams) >= 1""",

    "q_dp_quantiles" -> dpQuantilesSql(),
    "q_dp_quantiles_by" -> dpQuantilesBySql(),
    "q_pack_bpe" -> packBpeSql(BpeMerges)
  )
}
