package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed EXACT median without per-partition value buffering.
  *
  * Spark's sort-based `percentile` is exact but accumulates a value→count
  * table per aggregation buffer — memory grows with column cardinality,
  * which is the wrong shape at 100 TB (SCALE.md known-limit #2). This is
  * histogram-narrowing selection instead: each round ONE scan histograms
  * every still-active target into `buckets` ranges (batched across columns
  * via posexplode like the encoder fits), the bucket containing the target
  * rank refines a MEMBERSHIP PREDICATE (the same floor expression that
  * bucketed — no float-boundary drift between "counted in bucket b" and
  * "selected next round"), and once few enough values remain they are
  * collected and selected exactly. Rounds are O(log_buckets(n)); per-task
  * memory is O(buckets × columns).
  *
  * Median matches pandas: mean of the two middle order statistics for even
  * counts; NaN/null excluded (skipna).
  */
object ExactStats {

  private case class Target(
      colName: String, idx: Int, rank: Long, // 0-indexed rank wanted
      member: Column, below: Long)

  def medians(
      df: DataFrame,
      cols: Seq[String],
      buckets: Int = 4096,
      collectThreshold: Long = 100000L): Seq[Option[Double]] = {
    val clean = cols.map(c =>
      when(isnan(col(c).cast("double")), lit(null))
        .otherwise(col(c).cast("double")).as(c))
    val base = df.select(clean: _*)

    val nRow = base.agg(count(col(cols.head)),
      cols.tail.map(c => count(col(c))): _*).head()
    val ns = cols.indices.map(nRow.getLong)

    var targets: Seq[Target] = cols.indices.flatMap { i =>
      val n = ns(i)
      if (n == 0) Nil
      else Seq((n - 1) / 2, n / 2).distinct.map(r =>
        Target(cols(i), i, r, col(cols(i)).isNotNull, 0L))
    }
    val resolved = scala.collection.mutable.Map.empty[(Int, Long), Double]

    var guard = 0
    while (targets.nonEmpty && guard < 64) {
      guard += 1
      // one scan: count/min/max of each target's member set
      val aggs = targets.flatMap(t => Seq(
        count(when(t.member, col(t.colName))),
        min(when(t.member, col(t.colName))),
        max(when(t.member, col(t.colName)))))
      val row = base.agg(aggs.head, aggs.tail: _*).head()
      val stats = targets.indices.map(j =>
        (row.getLong(j * 3), row.getDouble(j * 3 + 1),
          row.getDouble(j * 3 + 2)))

      val next = scala.collection.mutable.ArrayBuffer.empty[(Target, Double, Double)]
      targets.zip(stats).foreach { case (t, (cnt, mn, mx)) =>
        if (mn == mx) resolved((t.idx, t.rank)) = mn
        else if (cnt <= collectThreshold) {
          val vals = base.filter(t.member).select(col(t.colName))
            .collect().map(_.getDouble(0)).sorted
          resolved((t.idx, t.rank)) = vals((t.rank - t.below).toInt)
        } else next += ((t, mn, mx))
      }

      // histogram round for the rest — one scan for all remaining targets
      targets =
        if (next.isEmpty) Nil
        else {
          val bucketOf = next.toSeq.map { case (t, mn, mx) =>
            val w = (mx - mn) / buckets
            least(floor((col(t.colName) - lit(mn)) / lit(w)),
              lit(buckets - 1)).cast("int")
          }
          val hist = base
            .select(posexplode(array(next.toSeq.zip(bucketOf).map {
              case ((t, _, _), b) => when(t.member, b)
            }: _*)).as(Seq("__t", "__b")))
            .filter(col("__b").isNotNull)
            .groupBy("__t", "__b").count().collect()
            .groupBy(_.getInt(0))
          next.toSeq.zip(bucketOf).zipWithIndex.map {
            case (((t, _, _), bExpr), j) =>
              val byBucket = hist.getOrElse(j, Array.empty)
                .map(r => r.getInt(1) -> r.getLong(2)).toMap
              var cum = t.below
              var b = 0
              while (b < buckets &&
                cum + byBucket.getOrElse(b, 0L) <= t.rank) {
                cum += byBucket.getOrElse(b, 0L); b += 1
              }
              // refine membership with the SAME bucketing expression that
              // produced the counts — cum stays exactly consistent
              t.copy(member = t.member && bExpr === lit(b), below = cum)
          }
        }
    }

    cols.indices.map { i =>
      if (ns(i) == 0) None
      else Some((resolved((i, (ns(i) - 1) / 2)) +
        resolved((i, ns(i) / 2))) / 2)
    }
  }
}
