package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable HyperLogLog sketches (Flajolet et al. 2007) as PLAIN RELATIONS
  * — the 100-TB distinct-counting shape Spark's `approx_count_distinct`
  * can't give you: that aggregate is one-shot, its sketch is opaque plan
  * state. Here the registers are rows `(group…, bucket, rho)`, so they can
  * be WRITTEN (a daily distinct-user sketch table), MERGED across groups
  * (month = max over its days' registers — without rescanning the raw
  * corpus), and ESTIMATED at read time. Sketching a 100-TB day is one
  * map-side-combined aggregate; everything downstream touches only
  * `groups × ≤256` register rows.
  *
  * Engine-portable by the repo's md5 discipline ([[graft.sim.Similarity
  * .portablePlanes]] convention): bucket = first 2 md5 hex chars (m = 256,
  * p = 8), the rank field = the next 13 hex chars (52 bits), rho = leading
  * zeros + 1 via an integer `>=`-chain (no float log), clamped at
  * [[Sketches.RhoCap]]. The estimator's indicator sum is EXACT integer
  * arithmetic — Σ 2^(RhoCap−rho) ≤ 256·2^39 < 2^53 — so an external SQL
  * engine replays bucket, rho, and estimate bit-for-bit (the one `ln` in
  * the linear-counting branch is rounded to 6 dp on both sides).
  */
object Sketches {
  /** Register count m = 2^P. 256 registers ≈ 6.5 % standard error —
    * right for per-group telemetry; the formulas below derive from P. */
  val P = 8
  val M: Int = 1 << P
  /** rho clamp: keeps the indicator sum exact-integer. At rho = 40 the
    * register's indicator term is 1 — the truncation error is ≤ 2^-40
    * of one register, far below the estimator's own variance, and both
    * engines clamp identically. */
  val RhoCap = 40

  private val Alpha: Double = 0.7213 / (1.0 + 1.079 / M)
  /** alpha · m² · 2^RhoCap, the numerator of the scaled estimator. */
  private val AlphaNum: Double =
    Alpha * M.toDouble * M.toDouble * (1L << RhoCap).toDouble

  /** md5-derived bucket in [0, m). */
  private def bucketCol(key: Column): Column =
    conv(substring(md5(key.cast("binary")), 1, 2), 16, 10).cast("int")

  /** 52-bit rank field (next 13 md5 hex chars). */
  private def rankCol(key: Column): Column =
    conv(substring(md5(key.cast("binary")), 3, 13), 16, 10).cast("long")

  /** rho = leading zeros of the 52-bit field + 1, clamped — a pure
    * integer comparison cascade both engines evaluate identically. */
  private def rhoCol(v: Column): Column =
    (1 until RhoCap).foldRight(lit(RhoCap)) { (r, rest) =>
      when(v >= lit(1L << (52 - r)), lit(r)).otherwise(rest)
    }

  /** Driver/executor-side Scala twin of ([[bucketCol]], [[rhoCol]]∘
    * [[rankCol]]): identical md5-hex derivation, so streaming state code
    * ([[graft.streaming.Streaming.hllStream]]) produces registers
    * bit-identical to the SQL expressions (pinned by HllStreamSpec). */
  private[graft] def bucketRho(key: String): (Int, Int) = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    val bucket = Integer.parseInt(hex.substring(0, 2), 16)
    val rank = java.lang.Long.parseLong(hex.substring(2, 15), 16)
    var r = 1
    while (r < RhoCap && rank < (1L << (52 - r))) r += 1
    (bucket, r)
  }

  /** Sparse HLL registers per group: `(groupCols…, bucket, rho)` — max rho
    * per touched bucket; untouched buckets are implicit rho = 0. ONE
    * aggregate over the corpus; the shuffle carries ≤ m partial rows per
    * (partition, group). */
  def hllSketch(df: DataFrame, groupCols: Seq[String], keyCol: String)
      : DataFrame = {
    val key = col(keyCol).cast("string")
    df.select(groupCols.map(col) :+ bucketCol(key).as("bucket") :+
        rhoCol(rankCol(key)).as("__rho"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("__rho")).as("rho"))
  }

  /** Merge registers to a coarser grouping (the caller derives the coarser
    * key column first — e.g. `month → year`): max is associative, so
    * merged registers are IDENTICAL to sketching the coarser groups from
    * raw — without the raw scan. */
  def hllMerge(registers: DataFrame, groupCols: Seq[String]): DataFrame =
    registers
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("rho")).as("rho"))

  /** ROLLING-window merge: each period's registers contribute to the
    * `window` trailing windows ending at `period … period + window − 1`,
    * then one max-merge per window — rolling distinct counts (the
    * "7-day uniques per day" question) computed ENTIRELY from the daily
    * register relation: the corpus is never rescanned and no
    * count-distinct-over-window funnel exists anywhere. Register rows
    * explode ×window (registers are ≤ m per period — bounded state, not
    * data), so the shuffle carries ≤ m·window rows per period.
    * `periodCol` must be integral (epoch-day, epoch-week…). Edge
    * handling: windows at the LEFT edge estimate over the periods that
    * exist (a window-3 label at the first period covers one period);
    * labels past the RIGHT edge (`> max observed period`, which would
    * cover only partial trailing data — phantom "future" windows a
    * dashboard would misread as real) are FILTERED OUT via a one-row
    * broadcast of the max period (ADVICE r6). */
  def hllRolling(registers: DataFrame, periodCol: String, window: Int)
      : DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val maxP = registers.agg(max(col(periodCol)).as("__maxp"))
    hllMerge(
      registers
        .withColumn("__win", explode(sequence(col(periodCol),
          col(periodCol) + (window - 1))))
        .drop(periodCol)
        .withColumnRenamed("__win", periodCol)
        .crossJoin(broadcast(maxP))
        .filter(col(periodCol) <= col("__maxp"))
        .drop("__maxp"),
      Seq(periodCol))
  }

  /** HLL estimate per group from registers: `(groupCols…, est)` (6 dp).
    * Scaled-integer indicator sum (exact), linear-counting correction for
    * the small range (raw ≤ 2.5 m with empty registers). */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String]): DataFrame = {
    val s = (sum(expr(s"shiftleft(CAST(1 AS BIGINT), $RhoCap - rho)")) +
      (lit(M.toLong) - count(lit(1))) * lit(1L << RhoCap)).as("__s")
    val zeros = (lit(M.toLong) - count(lit(1))).as("__zeros")
    registers.groupBy(groupCols.map(col): _*).agg(s, zeros)
      .withColumn("__raw", lit(AlphaNum) / col("__s").cast("double"))
      .select(groupCols.map(col) :+
        round(
          when(col("__raw") <= lit(2.5 * M) && col("__zeros") > 0,
            lit(M.toDouble) *
              log(lit(M.toDouble) / col("__zeros").cast("double")))
            .otherwise(col("__raw")), 6).as("est"): _*)
  }

  /** Convenience: sketch + estimate in one call (still one corpus pass). */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], keyCol: String)
      : DataFrame =
    hllEstimate(hllSketch(df, groupCols, keyCol), groupCols)

  /** HLL set algebra from registers alone: per group, the distinct-count
    * estimates of A, B, A ∪ B (max-merged registers — exact union
    * semantics at the register level), and the inclusion-exclusion
    * intersection estimate `max(0, est_a + est_b − est_union)` (clamped:
    * estimator noise can push a near-empty intersection negative). Groups
    * are matched INNER — callers align group domains first. Nothing here
    * rescans raw data; the audience-overlap question at 100 TB ("how many
    * users did both X and Y") reads two bounded register relations. */
  def hllIntersect(regA: DataFrame, regB: DataFrame,
      groupCols: Seq[String]): DataFrame = {
    val estA = hllEstimate(regA, groupCols)
      .withColumnRenamed("est", "est_a")
    val estB = hllEstimate(regB, groupCols)
      .withColumnRenamed("est", "est_b")
    val estU = hllEstimate(hllMerge(regA.unionByName(regB), groupCols),
      groupCols).withColumnRenamed("est", "est_union")
    estA.join(estB, groupCols).join(estU, groupCols)
      .withColumn("est_intersect",
        round(greatest(col("est_a") + col("est_b") - col("est_union"),
          lit(0.0)), 6))
  }

  /** The rho `>=`-cascade as oracle SQL over a bigint expression `v`. */
  private[graft] def rhoSql(v: String): String = {
    val cases = (1 until RhoCap)
      .map(r => s"WHEN $v >= ${1L << (52 - r)} THEN $r").mkString(" ")
    s"CASE $cases ELSE $RhoCap END"
  }

  /** Full estimate oracle SQL: registers → estimate, given a source CTE
    * `src(grp, k)` where k is the string key. Generated from the SAME
    * constants the Spark path uses, so the two sides cannot drift. */
  private[graft] def estimateSql(srcCte: String, grpName: String): String = {
    // the alpha numerator spelled as the same left-assoc literal chain
    // Scala evaluates for AlphaNum (bit-identical in both engines)
    val alphaNum =
      s"0.7213 / (1.0 + 1.079 / $M.0) * $M.0 * $M.0 * ${1L << RhoCap}.0"
    s"""WITH src AS ($srcCte),
       h AS (SELECT grp,
               ('0x' || substr(md5(k), 1, 2))::BIGINT AS bucket,
               ('0x' || substr(md5(k), 3, 13))::BIGINT AS v
             FROM src),
       r AS (SELECT grp, bucket, max(${rhoSql("v")}) AS rho
             FROM h GROUP BY grp, bucket),
       e AS (SELECT grp,
               sum(1::BIGINT << ($RhoCap - rho))
                 + ($M - count(*)) * ${1L << RhoCap} AS s,
               $M - count(*) AS zeros
             FROM r GROUP BY grp)
       SELECT grp AS $grpName,
         round(CASE WHEN raw <= ${2.5 * M} AND zeros > 0
                 THEN $M.0 * ln($M.0 / zeros) ELSE raw END, 6) AS est
       FROM (SELECT grp, zeros, $alphaNum / s AS raw FROM e)"""
  }

  /** Set-algebra oracle SQL from the same constants: the two source CTEs
    * must each yield keyed rows `(grp, k)`; the whole estimator chain
    * (buckets, rho, indicator sum, linear-counting branch) replays for
    * A, B, and the max-merged union. */
  private[graft] def hllIntersectSql(srcACte: String, srcBCte: String,
      grpName: String): String = {
    val alphaNum =
      s"0.7213 / (1.0 + 1.079 / $M.0) * $M.0 * $M.0 * ${1L << RhoCap}.0"
    def regs(p: String, srcName: String) =
      s"""h$p AS (SELECT grp,
           ('0x' || substr(md5(k), 1, 2))::BIGINT AS bucket,
           ('0x' || substr(md5(k), 3, 13))::BIGINT AS v
         FROM $srcName),
         r$p AS (SELECT grp, bucket, max(${rhoSql("v")}) AS rho
                 FROM h$p GROUP BY grp, bucket)"""
    def est(p: String, regName: String) =
      s"""e$p AS (SELECT grp,
             sum(1::BIGINT << ($RhoCap - rho))
               + ($M - count(*)) * ${1L << RhoCap} AS s,
             $M - count(*) AS zeros
           FROM $regName GROUP BY grp),
         est$p AS (SELECT grp,
             round(CASE WHEN raw <= ${2.5 * M} AND zeros > 0
               THEN $M.0 * ln($M.0 / zeros) ELSE raw END, 6) AS est
           FROM (SELECT grp, zeros, $alphaNum / s AS raw FROM e$p))"""
    s"""WITH sa AS ($srcACte),
       sb AS ($srcBCte),
       ${regs("a", "sa")},
       ${regs("b", "sb")},
       ru AS (SELECT grp, bucket, max(rho) AS rho
              FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb)
              GROUP BY 1, 2),
       ${est("a", "ra")},
       ${est("b", "rb")},
       ${est("u", "ru")}
       SELECT esta.grp AS $grpName,
         esta.est AS est_a, estb.est AS est_b, estu.est AS est_union,
         round(greatest(esta.est + estb.est - estu.est, 0.0), 6)
           AS est_intersect
       FROM esta
       JOIN estb ON esta.grp = estb.grp
       JOIN estu ON esta.grp = estu.grp"""
  }

  // ---- Count-Min sketch (Cormode & Muthukrishnan 2005) ----------------

  /** CMS depth (hash rows) and width (counters per row). d=4, w=1024 →
    * ε ≈ e/w ≈ 0.27 % of the stream mass, δ ≈ e^-4; the register
    * relation is ≤ groups × 4096 rows regardless of corpus size. */
  val CmsD = 4
  val CmsW = 1024

  /** Row-`j` counter index for a key — md5-derived like the HLL fields
    * (engine-portable: `('0x' || substr(md5(j || ':' || k), 1, 15))
    * ::BIGINT % w` in DuckDB), 60 bits of hash before the mod so the
    * `% w` bias is negligible. */
  private def cmsCol(j: Int, key: Column, w: Int): Column =
    pmod(conv(substring(md5(
        concat(lit(j.toString), lit(":"), key).cast("binary")), 1, 15),
      16, 10).cast("long"), lit(w.toLong))

  /** JVM replay of [[cmsCol]] for the streaming twin
    * ([[graft.streaming.Streaming.cmsStream]]): md5 over the UTF-8
    * bytes of "j:key", top 15 hex digits (60 bits — non-negative as a
    * long), mod w. Bit-identical to the SQL expression by construction
    * (same byte stream, same hex prefix, same mod). */
  private[graft] def cmsIndex(j: Int, key: String, w: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$j:$key".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % w
  }

  /** Count-Min registers per group as rows `(groupCols…, row_j, col,
    * cnt)` — the frequency-sketch sibling of [[hllSketch]]: WRITABLE
    * (a daily per-key-frequency sketch table), MERGEABLE (sum is
    * associative, so month = Σ its days' registers, no raw rescan), and
    * point-queryable via [[cmsEstimate]]. ONE corpus aggregate; the
    * explode multiplies rows d× but carries only (j, col) ints, and the
    * shuffle is capped at d·w partial rows per (partition, group). */
  def cmsSketch(df: DataFrame, groupCols: Seq[String], keyCol: String,
      d: Int = CmsD, w: Int = CmsW): DataFrame = {
    require(d >= 1 && w >= 2, s"need d >= 1, w >= 2, got d=$d w=$w")
    val key = col(keyCol).cast("string")
    df.select(groupCols.map(col) :+ explode(array((0 until d).map(j =>
        struct(lit(j).as("row_j"), cmsCol(j, key, w).as("col"))): _*))
        .as("__rc"): _*)
      .select(groupCols.map(col) :+ col("__rc.row_j").as("row_j") :+
        col("__rc.col").as("col"): _*)
      .groupBy((groupCols :+ "row_j" :+ "col").map(col): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge registers to a coarser grouping (caller derives the coarser
    * key first, as in [[hllMerge]]): counter-wise sum — merged registers
    * are IDENTICAL to sketching the coarser groups from raw. */
  def cmsMerge(registers: DataFrame, groupCols: Seq[String]): DataFrame =
    registers
      .groupBy((groupCols :+ "row_j" :+ "col").map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Point-query estimates: for each probe row (groupCols… + keyCol),
    * est = min over the d rows of that key's counter (0 when the bucket
    * was never touched) — an upper bound on the true count, within
    * ε·mass with probability 1−δ. The probe side explodes d×, joins the
    * bounded register relation (groups × d·w rows — broadcast-eligible),
    * and min-aggregates back: the corpus is never rescanned. */
  def cmsEstimate(registers: DataFrame, probes: DataFrame,
      groupCols: Seq[String], keyCol: String,
      d: Int = CmsD, w: Int = CmsW): DataFrame = {
    val key = col(keyCol).cast("string")
    val pe = probes.select(groupCols.map(col) :+ col(keyCol) :+
        explode(array((0 until d).map(j =>
          struct(lit(j).as("row_j"), cmsCol(j, key, w).as("col"))): _*))
          .as("__rc"): _*)
      .select(groupCols.map(col) :+ col(keyCol) :+
        col("__rc.row_j").as("row_j") :+ col("__rc.col").as("col"): _*)
    pe.join(registers, groupCols :+ "row_j" :+ "col", "left")
      .groupBy((groupCols :+ keyCol).map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  // ---- Bloom filter (Bloom 1970) as a position-set relation ------------

  /** Bloom geometry: k=4 md5-derived positions over m=8192 bits. The
    * register relation holds the SET bit positions as rows `(group…,
    * pos)` — ≤ m rows per group however large the keyed corpus — so like
    * [[hllSketch]]/[[cmsSketch]] it can be written, OR-merged (distinct
    * union), and probed without the original data. ~1% false-positive
    * rate at n ≈ m/10 keys; never a false negative. */
  val BloomK = 4
  val BloomM = 8192

  private def bloomPos(j: Int, key: Column, m: Int): Column =
    pmod(conv(substring(md5(
        concat(lit("b" + j), lit(":"), key).cast("binary")), 1, 15),
      16, 10).cast("long"), lit(m.toLong))

  /** Membership registers per group: the distinct bit positions set by
    * the group's keys. ONE aggregate (the distinct is map-side
    * combined); the k× explode carries only (j-th position) longs. */
  def bloomSketch(df: DataFrame, groupCols: Seq[String], keyCol: String,
      k: Int = BloomK, m: Int = BloomM): DataFrame = {
    require(k >= 1 && m >= 2, s"need k >= 1, m >= 2, got k=$k m=$m")
    val key = col(keyCol).cast("string")
    df.select(groupCols.map(col) :+ explode(array((0 until k).map(j =>
        bloomPos(j, key, m)): _*)).as("pos"): _*)
      .distinct()
  }

  /** OR-merge to a coarser grouping: distinct union of position rows —
    * identical to sketching the coarser groups from raw. */
  def bloomMerge(registers: DataFrame, groupCols: Seq[String]): DataFrame =
    registers.select((groupCols :+ "pos").map(col): _*).distinct()

  /** Membership probe: `maybe_present` = all k positions of the probe key
    * are set in its group's register (false → DEFINITELY absent; true →
    * present up to the documented false-positive rate). Probes explode
    * k×, left-join the bounded register relation, and count matches —
    * the keyed corpus is never rescanned. */
  def bloomContains(registers: DataFrame, probes: DataFrame,
      groupCols: Seq[String], keyCol: String,
      k: Int = BloomK, m: Int = BloomM): DataFrame = {
    val key = col(keyCol).cast("string")
    val pe = probes.select(groupCols.map(col) :+ col(keyCol) :+
        explode(array((0 until k).map(j =>
          bloomPos(j, key, m)): _*)).as("pos"): _*)
    pe.join(registers.withColumn("__hit", lit(1)),
        groupCols :+ "pos", "left")
      .groupBy((groupCols :+ keyCol).map(col): _*)
      .agg((sum(coalesce(col("__hit"), lit(0))) === lit(k.toLong))
        .as("maybe_present"))
  }

  /** Equi-join CARDINALITY estimate from two CMS register relations
    * (Alon-Matias-Szegedy inner product, the CMS §4.2 application):
    * |A ⋈ B| on the sketched key = Σ_k fA(k)·fB(k), estimated per hash
    * row as the counter inner product and finished with min over the d
    * rows — an upper bound within ε·‖fA‖₁‖fB‖₁ whp. With A = B this is
    * the F₂ self-join moment, THE skew indicator for join planning. The
    * whole estimate touches only the two ≤ d·w register relations: at
    * 100 TB you price a join (and catch a skew blow-up) without running
    * it. Missing buckets contribute 0 (inner join). */
  def cmsJoinSize(regA: DataFrame, regB: DataFrame,
      groupCols: Seq[String]): DataFrame =
    regA.join(regB.withColumnRenamed("cnt", "__cntB"),
        groupCols :+ "row_j" :+ "col")
      .groupBy((groupCols :+ "row_j").map(col): _*)
      .agg(sum(col("cnt") * col("__cntB")).as("__ip"))
      .groupBy(groupCols.map(col): _*)
      .agg(min(col("__ip")).as("join_size_est"))

  /** Join-size oracle SQL from the same constants: the two source CTEs
    * must each yield keyed rows `(grp, k)`. */
  private[graft] def cmsJoinSizeSql(srcACte: String, srcBCte: String,
      grpName: String, d: Int = CmsD, w: Int = CmsW): String = {
    val colExpr =
      s"('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || k), 1, 15))" +
        s"::BIGINT % $w"
    def reg(name: String, src: String) =
      s"""$name AS (SELECT grp, j AS row_j, $colExpr AS col,
         CAST(count(*) AS BIGINT) AS cnt
         FROM ($src) s, LATERAL (SELECT unnest(range(0, $d)) AS j)
         GROUP BY 1, 2, 3)"""
    s"""WITH ${reg("ra", srcACte)},
       ${reg("rb", srcBCte)},
       ip AS (SELECT ra.grp, ra.row_j,
                CAST(sum(ra.cnt * rb.cnt) AS BIGINT) AS ip
              FROM ra JOIN rb USING (grp, row_j, col)
              GROUP BY 1, 2)
       SELECT grp AS $grpName,
         CAST(min(ip) AS BIGINT) AS join_size_est
       FROM ip GROUP BY 1"""
  }

  /** Probe oracle SQL from the same constants: source CTE must yield the
    * keyed rows `(grp, k)`; probe CTE the probe rows `(grp, k, $outKey)`.
    * OR-merge needs no separate oracle (distinct union is associative). */
  private[graft] def bloomContainsSql(srcCte: String, probeCte: String,
      grpName: String, outKey: String,
      k: Int = BloomK, m: Int = BloomM): String = {
    val posExpr = (j: String) =>
      s"('0x' || substr(md5('b' || $j || ':' || k), 1, 15))::BIGINT % $m"
    s"""WITH src AS ($srcCte),
       reg AS (SELECT DISTINCT grp, ${posExpr("j")} AS pos
               FROM src, LATERAL (SELECT unnest(range(0, $k)) AS j)),
       pr AS ($probeCte),
       pe AS (SELECT grp, k, $outKey, ${posExpr("j")} AS pos
              FROM pr, LATERAL (SELECT unnest(range(0, $k)) AS j))
       SELECT pe.grp AS $grpName, pe.$outKey,
         count(r.pos) = $k AS maybe_present
       FROM pe LEFT JOIN reg r ON r.grp = pe.grp AND r.pos = pe.pos
       GROUP BY 1, 2"""
  }

  /** Estimate oracle SQL, generated from the same constants: source CTE
    * must yield `(grp, k, $outKey)` with k the string hash key; the
    * merge path needs no separate oracle because counter-wise sum is
    * associative — sketching the coarse groups directly is identical. */
  private[graft] def cmsEstimateSql(srcCte: String, grpName: String,
      outKey: String, d: Int = CmsD, w: Int = CmsW): String = {
    val colExpr =
      s"('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || k), 1, 15))" +
        s"::BIGINT % $w"
    s"""WITH src AS ($srcCte),
       reg AS (SELECT grp, j AS row_j, $colExpr AS col,
                 CAST(count(*) AS BIGINT) AS cnt
               FROM src, LATERAL (SELECT unnest(range(0, $d)) AS j)
               GROUP BY 1, 2, 3),
       probes AS (SELECT DISTINCT grp, k, $outKey FROM src),
       pe AS (SELECT grp, k, $outKey, j AS row_j, $colExpr AS col
              FROM probes, LATERAL (SELECT unnest(range(0, $d)) AS j))
       SELECT pe.grp AS $grpName, pe.$outKey,
         CAST(min(coalesce(r.cnt, 0)) AS BIGINT) AS est
       FROM pe LEFT JOIN reg r USING (grp, row_j, col)
       GROUP BY 1, 2"""
  }

  // --------------------------------------------------------------------
  // Quantile sketch: binned ECDF registers — completes the mergeable
  // suite (HLL distinct / CMS frequency / Bloom membership / quantiles).
  // --------------------------------------------------------------------

  /** Default bin count: 4096 bins bound the quantile error at
    * (hi-lo)/4096 of the range — and the register relation at ≤ 4096
    * rows per group whatever the corpus size. */
  val QBins = 4096

  /** Binned quantile registers per group: `(groupCols…, bin, cnt)` with
    * bin = clamp(floor((v - lo) / (hi - lo) * bins), 0, bins-1) — the
    * caller fixes the [lo, hi) range as part of the sketch identity
    * (out-of-range values clamp to the edge bins; nulls drop). ONE
    * map-side-combined aggregate over the corpus; everything downstream
    * touches only `groups × ≤ bins` rows. The bin index is per-row IEEE
    * float-then-floor, identical in any engine. */
  def qSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lo: Double, hi: Double, bins: Int = QBins): DataFrame = {
    require(hi > lo, s"empty sketch range [$lo, $hi)")
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val v = col(valueCol).cast("double")
    val raw = floor((v - lit(lo)) / lit(hi - lo) * lit(bins)).cast("long")
    val bin = least(greatest(raw, lit(0L)), lit(bins - 1L))
    df.filter(v.isNotNull)
      .select((groupCols.map(col) :+ bin.as("bin")): _*)
      .groupBy((groupCols :+ "bin").map(col): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** WEIGHTED quantile registers: identical bin geometry to [[qSketch]],
    * counters = the summed integral weight instead of the row count — so
    * [[qMerge]] and [[qQuantile]] work unchanged (a register is a
    * register; the rank target just ranges over total weight). The
    * weighted-median / weighted-percentile primitive: token-weighted
    * document stats, revenue-weighted price quantiles. Weights MUST be
    * integral (integer counters are what make merge bit-exact) — a
    * fractional weight raises at execution time rather than silently
    * truncating (Spark's double→long cast truncates while SQL engines
    * round, so a quiet cast would diverge from any replaying engine;
    * ADVICE r6). Quantize fractional weights upstream (e.g.
    * `round(w * 1000)`). Null values and null/non-positive weights are
    * dropped. Same 100-TB shape: ONE map-side-combined aggregate,
    * registers ≤ bins rows per group. */
  def qSketchWeighted(df: DataFrame, groupCols: Seq[String],
      valueCol: String, weightCol: String, lo: Double, hi: Double,
      bins: Int = QBins): DataFrame = {
    require(hi > lo, s"empty sketch range [$lo, $hi)")
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val v = col(valueCol).cast("double")
    val wd = col(weightCol).cast("double")
    val w = when(wd =!= floor(wd), raise_error(concat(
        lit(s"qSketchWeighted: fractional weight in '$weightCol' ("),
        wd, lit(") — quantize to integers upstream"))))
      .otherwise(col(weightCol).cast("long"))
    val raw = floor((v - lit(lo)) / lit(hi - lo) * lit(bins)).cast("long")
    val bin = least(greatest(raw, lit(0L)), lit(bins - 1L))
    df.filter(v.isNotNull && w.isNotNull && w > 0)
      .select((groupCols.map(col) :+ bin.as("bin") :+ w.as("__w")): _*)
      .groupBy((groupCols :+ "bin").map(col): _*)
      .agg(sum(col("__w")).as("cnt"))
  }

  /** Merge registers to a coarser grouping (caller derives the coarser
    * columns first): counter-wise sum — associative, so merged registers
    * are identical to sketching the coarse groups directly. */
  def qMerge(registers: DataFrame, groupCols: Seq[String]): DataFrame =
    registers.groupBy((groupCols :+ "bin").map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Quantile estimates from registers alone: for each (group, q) with
    * q = q_num/q_den, the upper edge of the smallest bin whose
    * cumulative count reaches ceil(q · total) — integer rank target
    * (total·q_num + q_den − 1) div q_den, so bin selection is exact in
    * any engine; the returned edge `lo + (bin+1)·(hi−lo)/bins` is within
    * one bin width above the true quantile. */
  def qQuantile(registers: DataFrame, groupCols: Seq[String],
      quantiles: Seq[(Int, Int)], lo: Double, hi: Double,
      bins: Int = QBins): DataFrame = {
    require(quantiles.nonEmpty, "no quantiles requested")
    quantiles.foreach { case (n, dd) =>
      require(dd >= 1 && n >= 0 && n <= dd, s"bad quantile $n/$dd") }
    val spark = registers.sparkSession
    import spark.implicits._
    val qs = broadcast(quantiles.toDF("q_num", "q_den"))
    val totals = registers.groupBy(groupCols.map(col): _*)
      .agg(sum(col("cnt")).as("__total"))
    val targets = totals.crossJoin(qs)
      // integral `div`, not float `/` + floor: the ceil-division target
      // must be exact at any total
      .withColumn("__target", expr(
        "CAST((__total * q_num + q_den - 1) div q_den AS BIGINT)"))
    // per-group cumulative counts: a window over ≤ bins register rows —
    // bounded by the sketch geometry, never by the corpus
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(col("bin"))
    registers.withColumn("__cum", sum(col("cnt")).over(w))
      .join(targets, groupCols)
      .filter(col("__cum") >= col("__target"))
      .groupBy((groupCols ++ Seq("q_num", "q_den")).map(col): _*)
      .agg(min(col("bin")).as("__bin"))
      .withColumn("est",
        lit(lo) + (col("__bin") + 1) * lit(hi - lo) / lit(bins))
      .drop("__bin")
  }

  // --------------------------------------------------------------------
  // Heavy-hitter registers: mergeable Misra-Gries / SpaceSaving summaries
  // (Misra & Gries 1982; Agarwal et al., "Mergeable Summaries", PODS'12)
  // as plain relations — the top-item sibling of the HLL / CMS / Bloom /
  // quantile registers above.
  // --------------------------------------------------------------------

  /** Heavy-hitter registers per group: `(groupCols…, item, cnt)` — the
    * top-`k` items by exact count, plus ONE floor row per group
    * (`item = NULL`, cnt = the (k+1)-th largest count, 0 when fewer than
    * k+1 distinct items). Invariant carried by the relation (and
    * preserved by [[hhMerge]]): for EVERY item,
    * `stored cnt ≤ true count ≤ stored cnt + floor` (absent → cnt 0) —
    * so `cnt` is a certain lower bound and `floor` prices the truncation.
    *
    * Shape at 100 TB: ONE map-side-combined count aggregate (the
    * distinct-item shuffle — unavoidable for exact base counts), then
    * the bounded [[graft.functions.CollectTopCounts]] heap truncates to
    * k+1 rows per group map-side — never a per-group window over every
    * distinct item. The register relation is ≤ (k+1) rows per group
    * whatever the corpus size: write daily, merge monthly. */
  def hhSketch(df: DataFrame, groupCols: Seq[String], keyCol: String,
      k: Int = 16): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(groupCols.map(col) :+
        col(keyCol).cast("string").as("item"): _*)
      .agg(count(lit(1)).as("cnt"))
    truncate(counts, groupCols, k, floors = None)
  }

  /** One-shot n-way merge to a coarser grouping (caller derives the
    * coarser key first, as in [[hllMerge]]): item-wise count sum over the
    * sub-sketches, floors sum, then ONE re-truncation to k (the (k+1)-th
    * summed count joins the floor). Order-independent BY CONSTRUCTION —
    * all sub-sketches merge in one call, like a single groupBy. (Iterated
    * pairwise merges are also sound but accumulate a floor per round —
    * prefer one n-way merge.) The invariant survives: a kept item's sum
    * misses at most floorᵢ in each sub-sketch that dropped it, and a
    * dropped item's total is ≤ the new floor. */
  def hhMerge(registers: DataFrame, groupCols: Seq[String],
      k: Int = 16): DataFrame = {
    val summed = registers
      .groupBy((groupCols :+ "item").map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))
    val floors = summed.filter(col("item").isNull)
      .select(groupCols.map(col) :+ col("cnt").as("__floor"): _*)
    truncate(summed.filter(col("item").isNotNull), groupCols, k,
      Some(floors))
  }

  /** Shared truncation: keep the top-k items per group via the bounded
    * heap, emit the (k+1)-th count (+ carried floor) as the group's
    * `item = NULL` floor row. `floors` is None (base sketch — floor
    * starts at 0) or a per-group `(groupCols…, __floor)` relation
    * (merge — the summed sub-sketch floors). */
  private def truncate(counts: DataFrame, groupCols: Seq[String], k: Int,
      floors: Option[DataFrame]): DataFrame = {
    val heads = counts.groupBy(groupCols.map(col): _*)
      .agg(graft.functions.TopK.collect_top_counts(
        struct(col("cnt"), col("item")), k + 1).as("__top"))
    val withFloor0 = floors match {
      case None => heads.withColumn("__floor", lit(0L))
      case Some(f) =>
        heads.join(f, groupCols, "left")
          .withColumn("__floor", coalesce(col("__floor"), lit(0L)))
    }
    // kept + floorRows both read this relation: materialize it once
    // (groups × one array row — bounded by construction) so the union's
    // two branches don't each re-run the upstream count aggregate —
    // without this the BASE sketch scans the corpus twice
    val withFloor = withFloor0.localCheckpoint(eager = true)
    val kept = withFloor.select(groupCols.map(col) :+
        posexplode(col("__top")).as(Seq("__pos", "__t")): _*)
      .filter(col("__pos") < k)
      .select(groupCols.map(col) :+ col("__t.item").as("item") :+
        col("__t.cnt").as("cnt"): _*)
    val floorRows = withFloor.select(groupCols.map(col) :+
        lit(null).cast("string").as("item") :+
        // get() is 0-indexed and null on out-of-bounds (ANSI-safe)
        (coalesce(get(col("__top"), lit(k)).getField("cnt"),
          lit(0L)) + col("__floor")).as("cnt"): _*)
    kept.unionByName(floorRows)
  }

  /** Heavy hitters with bounds, from registers alone: per group the kept
    * items as `(groupCols…, item, cnt_lo, cnt_hi)` with
    * `cnt_lo ≤ true ≤ cnt_hi = cnt_lo + floor`. Filter `cnt_lo ≥ t` for
    * certified hitters; items whose true count exceeds `floor` are
    * guaranteed present. Touches only the ≤ (k+1)-rows-per-group
    * register relation. */
  def hhTopK(registers: DataFrame, groupCols: Seq[String]): DataFrame = {
    val floors = registers.filter(col("item").isNull)
      .select(groupCols.map(col) :+ col("cnt").as("__floor"): _*)
    registers.filter(col("item").isNotNull)
      .join(floors, groupCols, "left")
      .select(groupCols.map(col) :+ col("item") :+
        col("cnt").as("cnt_lo") :+
        (col("cnt") + coalesce(col("__floor"), lit(0L))).as("cnt_hi"): _*)
  }

  /** Full sketch→merge→top-k oracle SQL: `srcCte` must yield rows
    * `(grp, sub, k)` — fine-grained sketches are built per (grp, sub),
    * merged to grp, and read with bounds. The rank replay uses
    * `row_number() ORDER BY cnt DESC, item` — the same (cnt desc,
    * byte-wise item asc) total order the heap maintains. */
  private[graft] def hhTopKSql(srcCte: String, grpName: String,
      k: Int): String =
    s"""WITH src AS ($srcCte),
       c AS (SELECT grp, sub, k AS item, count(*) AS cnt
             FROM src WHERE k IS NOT NULL GROUP BY 1, 2, 3),
       r AS (SELECT grp, sub, item, cnt,
               row_number() OVER (PARTITION BY grp, sub
                 ORDER BY cnt DESC, item) AS rn
             FROM c),
       flo AS (SELECT grp, coalesce(sum(CASE WHEN rn = ${k + 1}
                 THEN cnt END), 0) AS floor_sum
               FROM r GROUP BY 1),
       m AS (SELECT grp, item, sum(cnt) AS cnt
             FROM r WHERE rn <= $k GROUP BY 1, 2),
       r2 AS (SELECT grp, item, cnt,
                row_number() OVER (PARTITION BY grp
                  ORDER BY cnt DESC, item) AS rn
              FROM m),
       flo2 AS (SELECT r2.grp,
                  flo.floor_sum + coalesce(sum(CASE WHEN rn = ${k + 1}
                    THEN cnt END), 0) AS flr
                FROM r2 JOIN flo ON r2.grp = flo.grp
                GROUP BY 1, flo.floor_sum)
       SELECT r2.grp AS $grpName, r2.item,
         CAST(r2.cnt AS BIGINT) AS cnt_lo,
         CAST(r2.cnt + flo2.flr AS BIGINT) AS cnt_hi
       FROM r2 JOIN flo2 ON r2.grp = flo2.grp
       WHERE r2.rn <= $k"""

  /** Quantile oracle SQL from the same constants: source CTE must yield
    * rows `(grp, v)`; quantiles arrive as literal (q_num, q_den) pairs.
    * The merge path needs no separate oracle (counter sum is
    * associative — sketching the coarse groups directly is identical). */
  private[graft] def qQuantileSql(srcCte: String, grpName: String,
      quantiles: Seq[(Int, Int)], lo: Double, hi: Double,
      bins: Int = QBins): String = {
    val qRows = quantiles
      .map { case (n, d) => s"($n, $d)" }.mkString(", ")
    s"""WITH src AS ($srcCte),
       reg AS (SELECT grp,
                 least(greatest(CAST(floor((CAST(v AS DOUBLE) - ($lo))
                   / (${hi - lo}) * $bins) AS BIGINT), 0),
                   ${bins - 1}) AS bin,
                 count(*) AS cnt
               FROM src WHERE v IS NOT NULL GROUP BY 1, 2),
       cum AS (SELECT grp, bin, sum(cnt) OVER (PARTITION BY grp
                 ORDER BY bin) AS cum,
                 sum(cnt) OVER (PARTITION BY grp) AS total
               FROM reg),
       qs(q_num, q_den) AS (VALUES $qRows)
       SELECT cum.grp AS $grpName, qs.q_num, qs.q_den,
         ($lo) + (min(cum.bin) + 1) * (${hi - lo}) / $bins AS est
       FROM cum CROSS JOIN qs
       WHERE cum.cum >= (cum.total * qs.q_num + qs.q_den - 1)
         // qs.q_den
       GROUP BY 1, 2, 3"""
  }

  /** [[qQuantileSql]] for the weighted sketch: `srcCte` must yield rows
    * `(grp, v, w)`; counters are `sum(CAST(w AS BIGINT))` over the same
    * bin geometry, with the same null/non-positive-weight drops as
    * [[qSketchWeighted]]. */
  private[graft] def qQuantileWeightedSql(srcCte: String, grpName: String,
      quantiles: Seq[(Int, Int)], lo: Double, hi: Double,
      bins: Int = QBins): String = {
    val qRows = quantiles
      .map { case (n, d) => s"($n, $d)" }.mkString(", ")
    s"""WITH src AS ($srcCte),
       reg AS (SELECT grp,
                 least(greatest(CAST(floor((CAST(v AS DOUBLE) - ($lo))
                   / (${hi - lo}) * $bins) AS BIGINT), 0),
                   ${bins - 1}) AS bin,
                 sum(CAST(w AS BIGINT)) AS cnt
               FROM src WHERE v IS NOT NULL AND w IS NOT NULL
                 AND CAST(w AS BIGINT) > 0
               GROUP BY 1, 2),
       cum AS (SELECT grp, bin, sum(cnt) OVER (PARTITION BY grp
                 ORDER BY bin) AS cum,
                 sum(cnt) OVER (PARTITION BY grp) AS total
               FROM reg),
       qs(q_num, q_den) AS (VALUES $qRows)
       SELECT cum.grp AS $grpName, qs.q_num, qs.q_den,
         ($lo) + (min(cum.bin) + 1) * (${hi - lo}) / $bins AS est
       FROM cum CROSS JOIN qs
       WHERE cum.cum >= (cum.total * qs.q_num + qs.q_den - 1)
         // qs.q_den
       GROUP BY 1, 2, 3"""
  }
}
