package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DoubleType, FloatType, StructType}

/** Sources & sinks. The reference's only ingestion path is `pd.read_csv`
  * in its benchmarks (FraudDetection1.py:92-93 etc.) with dtype maps and
  * NaN-string missing markers; parquet is the engine's native format.
  * At 100 TB: always pass an explicit schema (schema inference is a full
  * extra scan), and land CSV into partitioned parquet before iterating.
  */
object Sources {

  /** ORC with explicit schema — Spark's other first-class columnar format
    * (predicate pushdown + column pruning like parquet); useful when
    * landing data from Hive-era pipelines. */
  def readOrc(
      spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Binary-file ingestion — the multimodal landing path (image/audio/video
    * shards on disk → one row per file: path, modificationTime, length,
    * content). `glob` pushes the extension filter into the FILE LISTING
    * (pathGlobFilter), so non-matching files are never opened; cap
    * per-task memory via `spark.sql.files.maxPartitionBytes` since each
    * row materializes a whole file. Feed the result to
    * [[graft.multimodal.Multimodal]] decoders. */
  def readBinaryFiles(
      spark: SparkSession, path: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)

  /** CSV with explicit schema (no inference scan); `"NaN"` and empty cells
    * become null, matching pandas' default missing markers. */
  def readCsv(
      spark: SparkSession,
      path: String,
      schema: StructType,
      header: Boolean = true,
      delimiter: String = ","): DataFrame = {
    val raw = spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("nullValue", "")
      .option("nanValue", "NaN")
      .option("mode", "PERMISSIVE")
      .csv(path)
    // null discipline (SURVEY §1.2): pandas NaN ⇔ Spark null — the csv
    // reader parses "NaN" into an IEEE NaN value; normalize it to null
    schema.fields.filter(f =>
      f.dataType == DoubleType || f.dataType == FloatType)
      .foldLeft(raw) { (d, f) =>
        d.withColumn(f.name,
          org.apache.spark.sql.functions.when(
            org.apache.spark.sql.functions.isnan(
              org.apache.spark.sql.functions.col(f.name)), null)
            .otherwise(org.apache.spark.sql.functions.col(f.name)))
      }
  }

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** JSON-Lines with explicit schema — the interchange format most raw
    * training-data drops arrive in. Schema mandatory for the same reason as
    * CSV (inference is a full extra scan of 100 TB); malformed lines land in
    * a `_corrupt_record` column when the schema carries one, else the read
    * is PERMISSIVE (fields null out). */
  def readJsonl(
      spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)

  /** JSON-Lines sink (one object per line, gzip-friendly at scale). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Hive-style partitioned parquet sink — the layout that makes partition
    * pruning (and therefore 100 TB interactivity) possible downstream. */
  def writePartitioned(
      df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
}
