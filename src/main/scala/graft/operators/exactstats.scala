package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed EXACT median / quantiles without per-partition value
  * buffering.
  *
  * Spark's sort-based `percentile` is exact but accumulates a value→count
  * table per aggregation buffer — memory grows with column cardinality,
  * which is the wrong shape at 100 TB (SCALE.md known-limit #2). This is
  * histogram-narrowing selection instead: each round ONE scan histograms
  * every still-active target into `buckets` ranges (batched across columns
  * via posexplode like the encoder fits) and also collects each bucket's
  * count/min/max, so the chosen bucket's stats seed the next round with no
  * extra pass. The bucket containing the target rank refines a MEMBERSHIP
  * PREDICATE (the same floor expression that bucketed — no float-boundary
  * drift between "counted in bucket b" and "selected next round"); once few
  * enough values remain they are collected and selected exactly. Rounds are
  * O(log_buckets(n)); per-task memory is O(buckets × columns).
  *
  * Semantics are pandas `median`: mean of the two middle order statistics
  * for even counts, NaN and null EXCLUDED (skipna — note Spark's
  * `percentile` instead orders NaN largest; the engine's null discipline
  * normalizes NaN→null on ingest, so the difference only shows on frames
  * that bypassed ingest). ±Infinity participates in the ordering like any
  * value (resolved by direct counting, not bucketing).
  */
object ExactStats {

  private val NegInf = Double.NegativeInfinity
  private val PosInf = Double.PositiveInfinity

  private case class Target(
      colName: String, idx: Int, rank: Long, // 0-indexed rank wanted
      member: Column, below: Long,
      cnt: Long, mn: Double, mx: Double)

  def medians(
      df: DataFrame,
      cols: Seq[String],
      buckets: Int = 4096,
      collectThreshold: Long = 100000L): Seq[Option[Double]] = {
    val (ns, resolved) = selectRanks(df, cols, buckets, collectThreshold,
      n => Seq((n - 1) / 2, n / 2).distinct)
    cols.indices.map { i =>
      if (ns(i) == 0) None
      else {
        val lo = resolved((i, (ns(i) - 1) / 2))
        val hi = resolved((i, ns(i) / 2))
        // halves are exact in binary (exponent decrement); (lo+hi)/2 would
        // overflow to Infinity near Double.MaxValue
        Some(if (lo == hi) lo else lo / 2 + hi / 2)
      }
    }
  }

  /** Exact linear-interpolated quantiles (Spark `percentile` / DuckDB
    * `quantile_cont` semantics: position `p·(n−1)` between the two
    * surrounding order statistics) for every (column, p) pair — same
    * histogram-narrowing machinery as [[medians]], all columns' and
    * percentiles' ranks narrowed in the same shared scans. Returns one
    * `Seq[Option[Double]]` (aligned with `ps`) per column. */
  def quantiles(
      df: DataFrame,
      cols: Seq[String],
      ps: Seq[Double],
      buckets: Int = 4096,
      collectThreshold: Long = 100000L): Seq[Seq[Option[Double]]] = {
    require(ps.forall(p => p >= 0.0 && p <= 1.0), "percentiles in [0,1]")
    def ranksFor(n: Long): Seq[Long] = ps.flatMap { p =>
      val pos = p * (n - 1)
      Seq(math.floor(pos).toLong, math.ceil(pos).toLong)
    }.distinct
    val (ns, resolved) = selectRanks(df, cols, buckets, collectThreshold,
      ranksFor)
    cols.indices.map { i =>
      val n = ns(i)
      if (n == 0) ps.map(_ => None)
      else ps.map { p =>
        val pos = p * (n - 1)
        val (lo, hi) = (math.floor(pos).toLong, math.ceil(pos).toLong)
        val (vLo, vHi) = (resolved((i, lo)), resolved((i, hi)))
        Some(if (lo == hi) vLo else vLo + (pos - lo) * (vHi - vLo))
      }
    }
  }

  /** Resolve the wanted 0-indexed order statistics (`ranksOf(n)` per
    * column) to exact values; returns (non-null counts, (colIdx, rank) →
    * value). */
  private def selectRanks(
      df: DataFrame,
      cols: Seq[String],
      buckets: Int,
      collectThreshold: Long,
      ranksOf: Long => Seq[Long])
      : (IndexedSeq[Long], scala.collection.Map[(Int, Long), Double]) = {
    val clean = cols.map(c =>
      when(isnan(col(c).cast("double")), lit(null))
        .otherwise(col(c).cast("double")).as(c))
    val base = df.select(clean: _*)

    // round 0: one scan for count/min/max (+ infinity counts) per column
    val aggs = cols.flatMap(c => Seq(
      count(col(c)), min(col(c)), max(col(c)),
      count(when(col(c) === NegInf, 1)), count(when(col(c) === PosInf, 1))))
    val row = base.agg(aggs.head, aggs.tail: _*).head()
    val ns = cols.indices.map(i => row.getLong(i * 5))

    val resolved = scala.collection.mutable.Map.empty[(Int, Long), Double]
    var targets: Seq[Target] = cols.indices.flatMap { i =>
      val n = ns(i)
      if (n == 0) Nil
      else {
        val (mn, mx) = (row.getDouble(i * 5 + 1), row.getDouble(i * 5 + 2))
        val (nNeg, nPos) = (row.getLong(i * 5 + 3), row.getLong(i * 5 + 4))
        ranksOf(n).flatMap { r =>
          // ±Infinity can't be bucketed (w would be Inf) — resolve by rank
          // position against the infinity counts, else narrow to finite
          if (r < nNeg) { resolved((i, r)) = NegInf; Nil }
          else if (r >= n - nPos) { resolved((i, r)) = PosInf; Nil }
          else {
            val member = col(cols(i)).isNotNull &&
              col(cols(i)) > NegInf && col(cols(i)) < PosInf
            Seq(Target(cols(i), i, r, member, nNeg,
              n - nNeg - nPos,
              if (nNeg > 0) NegInf else mn, // refreshed by a measured pass
              if (nPos > 0) PosInf else mx))
          }
        }
      }
    }
    // refresh finite min/max where infinities polluted the global ones
    val needStats = targets.filter(t => t.mn == NegInf || t.mx == PosInf)
    if (needStats.nonEmpty) {
      val sAggs = needStats.flatMap(t => Seq(
        min(when(t.member, col(t.colName))),
        max(when(t.member, col(t.colName)))))
      val sRow = base.agg(sAggs.head, sAggs.tail: _*).head()
      val fixed = needStats.zipWithIndex.map { case (t, j) =>
        (t.idx, t.rank) -> t.copy(mn = sRow.getDouble(j * 2),
          mx = sRow.getDouble(j * 2 + 1))
      }.toMap
      targets = targets.map(t => fixed.getOrElse((t.idx, t.rank), t))
    }

    var guard = 0
    while (targets.nonEmpty && guard < 64) {
      guard += 1
      val next = scala.collection.mutable.ArrayBuffer.empty[Target]
      targets.foreach { t =>
        if (t.mn == t.mx) resolved((t.idx, t.rank)) = t.mn
        else if (t.cnt <= collectThreshold) {
          val vals = base.filter(t.member).select(col(t.colName))
            .collect().map(_.getDouble(0)).sorted
          resolved((t.idx, t.rank)) = vals((t.rank - t.below).toInt)
        } else next += t
      }

      // one scan: histogram with per-bucket count/min/max for all targets;
      // the chosen bucket's stats seed the next round
      targets =
        if (next.isEmpty) Nil
        else {
          val acts = next.toSeq
          val bucketOf = acts.map { t =>
            val w = (t.mx - t.mn) / buckets
            least(floor((col(t.colName) - lit(t.mn)) / lit(w)),
              lit(buckets - 1)).cast("int")
          }
          val hist = base
            .select(posexplode(array(acts.zip(bucketOf).map {
              case (t, b) =>
                when(t.member, struct(b.as("b"),
                  col(t.colName).as("v")))
            }: _*)).as(Seq("__t", "__s")))
            .filter(col("__s").isNotNull)
            .groupBy(col("__t"), col("__s.b").as("__b"))
            .agg(count(lit(1)).as("c"), min("__s.v").as("mn"),
              max("__s.v").as("mx"))
            .collect()
            .groupBy(_.getInt(0))
          acts.zip(bucketOf).zipWithIndex.map {
            case ((t, bExpr), j) =>
              val byBucket = hist.getOrElse(j, Array.empty)
                .map(r => r.getInt(1) -> (r.getLong(2), r.getDouble(3),
                  r.getDouble(4))).toMap
              var cum = t.below
              var b = 0
              while (b < buckets &&
                cum + byBucket.get(b).fold(0L)(_._1) <= t.rank) {
                cum += byBucket.get(b).fold(0L)(_._1); b += 1
              }
              val (bc, bmn, bmx) = byBucket(b)
              // refine with the SAME bucketing expression that produced the
              // counts — cum stays exactly consistent
              t.copy(member = t.member && bExpr === lit(b), below = cum,
                cnt = bc, mn = bmn, mx = bmx)
          }
        }
    }

    (ns, resolved)
  }
}
