package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators for 100 TB tables: multi-dimensional
  * clustering via Z-order (Morton) keys. Range-partitioning and sorting a
  * table by the interleaved key co-locates rows that are close in EVERY
  * clustered dimension, so min/max footer stats prune files for
  * predicates on ANY of them — the lakehouse data-skipping recipe
  * (public: Databricks OPTIMIZE ZORDER BY, Delta/Iceberg clustering),
  * expressed here as plain Spark `repartitionByRange` +
  * `sortWithinPartitions` over a pure codegen'd key expression.
  */
object Layout {

  /** Morton (Z-order) key over up to ~6 dimensions. Each input is
    * linearly quantized into `2^bits` cells over its `[min, max]` range
    * (values outside clamp to the edge cells; nulls clamp low — they
    * cluster together at the origin instead of scattering), then the
    * per-dimension cell bits interleave: output bit `b*n + i` is bit `b`
    * of dimension `i`. Pure integer arithmetic — shift/mask/or terms the
    * codegen inlines — and engine-portable: any SQL dialect replays the
    * key bit-for-bit. `bits * n` must fit a signed long (≤ 62). */
  def mortonKey(dims: Seq[(Column, Double, Double)], bits: Int): Column = {
    val n = dims.size
    require(n >= 1, "need at least one dimension")
    require(bits >= 1 && bits * n <= 62,
      s"bits * dims must be in [1, 62], got ${bits * n}")
    val cells = (1L << bits) - 1
    val quantized = dims.map { case (c, lo, hi) =>
      require(hi > lo, s"need max > min, got [$lo, $hi]")
      least(greatest(
          floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(1L << bits))
            .cast("long"),
          lit(0L)),
        lit(cells))
    }
    val terms = for {
      b <- 0 until bits
      (q, i) <- quantized.zipWithIndex
    } yield shiftleft(shiftrightunsigned(q, b).bitwiseAND(lit(1L)),
      b * n + i)
    terms.reduce((a, c) => a.bitwiseOR(c))
  }

  /** Cluster a table for data skipping: range-partition on `keyCol` into
    * `numPartitions` output files and sort rows within each — after a
    * parquet write, every file owns a tight `keyCol` interval and
    * near-disjoint per-dimension min/max ranges. One shuffle (the range
    * exchange samples the key distribution, so skew self-balances);
    * the sort is partition-local. */
  def clusterByKey(
      df: DataFrame, keyCol: Column, numPartitions: Int): DataFrame =
    df.repartitionByRange(numPartitions, keyCol)
      .sortWithinPartitions(keyCol)

  /** Hive-layout partitioned parquet write (`path/col=value/...`): reads
    * filtered on the partition columns prune whole directories at
    * planning time — the other half of the skipping story next to
    * [[clusterByKey]] (partition columns prune coarsely by value, the
    * Z-order sort prunes within a partition by footer stats).
    *
    * The pre-write `repartition` on the partition columns is the part
    * everyone forgets: without it every task writes a file into every
    * partition directory — tasks × partitions small files, the classic
    * 100 TB table killer. With it, each partition's rows coalesce into
    * a bounded number of writers; `maxRecordsPerFile` (0 = unlimited)
    * re-splits oversized partitions. */
  def writePartitioned(
      df: DataFrame, path: String, partitionCols: Seq[String],
      maxRecordsPerFile: Long = 0L): Unit = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    df.repartition(partitionCols.map(col): _*)
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(path)
  }

  /** Compact a parquet directory into ~`targetBytes`-sized files — the
    * maintenance pass every long-lived table needs after streaming or
    * per-batch appends accumulate small files (each file costs a task,
    * a footer read, and an open per scan; 10⁶ × 1 MB files make a table
    * unreadable long before 1 TB of actual data does). The target file
    * count comes from the file index's on-disk byte total (no data
    * scan), and the rewrite is ONE round-robin repartition — balanced
    * output sizes regardless of input skew. Returns the file count
    * written. Output goes to a NEW path: compaction must never rewrite
    * in place (a failed overwrite of the live path loses the table). */
  def compact(
      spark: org.apache.spark.sql.SparkSession, inPath: String,
      outPath: String, targetBytes: Long = 128L << 20): Int = {
    require(targetBytes > 0, s"need targetBytes > 0, got $targetBytes")
    require(new org.apache.hadoop.fs.Path(inPath).toUri.getPath !=
      new org.apache.hadoop.fs.Path(outPath).toUri.getPath,
      "compact writes to a NEW path — in-place rewrite loses the table on failure")
    val df = spark.read.parquet(inPath)
    val onDisk = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val n = ((onDisk + targetBytes - 1) / targetBytes)
      .max(1).min(1 << 20).toInt
    df.repartition(n).write.mode("errorifexists").parquet(outPath)
    n
  }
}
