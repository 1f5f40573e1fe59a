package graft.operators

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Projection: keep (`drop=false`) or drop (`drop=true`) the given columns.
  * Reference: dfpipeline/ColumnSelector.py:45-65. Maps to a Catalyst
  * projection, so column pruning reaches the parquet scan for free. */
class ColumnSelector(val columns: Seq[String], val drop: Boolean = false)
    extends GraftTransformer {
  override def transformDF(df: DataFrame): DataFrame =
    if (drop) df.drop(columns: _*)
    else df.select(columns.map(col): _*)
}

/** Cast columns to a target type. Reference: dfpipeline/TypeConverter.py:43-63
  * (`astype`). Nulls survive the cast (pandas NaN ⇔ Spark null). */
class TypeConverter(val columns: Seq[String], val to: DataType)
    extends GraftTransformer {
  override def transformDF(df: DataFrame): DataFrame =
    columns.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast(to)))
}

/** Drop rows whose value in any of `columns` is in `dropValues`; rows with
  * null in those columns are KEPT (pandas `isin` is false for NaN).
  * Reference: dfpipeline/RowTransformer.py:44-58 — the only
  * row-cardinality-changing operator in the surface; a plain Catalyst filter
  * which pushes down to the scan. */
class RowTransformer(val columns: Seq[String], val dropValues: Seq[Any])
    extends GraftTransformer {
  override def transformDF(df: DataFrame): DataFrame = {
    val keep = columns
      .map(c => col(c).isNull || !col(c).isin(dropValues: _*))
      .reduce(_ && _)
    df.filter(keep)
  }
}

/** Value remapping. Reference: dfpipeline/MapTransformer.py:64-116.
  *
  *  - exact mode: `df[out] = df[in].replace(dict)` — equality match per
  *    value, unmatched values keep the original; a null key matches null
  *    (the reference maps `np.nan` keys, MapTransformer.py:52-54).
  *  - regex mode: sequential `regexp_replace` per (pattern, replacement) in
  *    entry order (pandas substring-replace semantics).
  *  - defaultValue: after mapping, any value not among the mapping's values
  *    (including null) becomes `defaultValue` (MapTransformer.py:84-88).
  *  - dtype: optional final cast.
  *
  * Entry order is load-bearing (SURVEY §2.5.4) → `mapping` is an ordered Seq.
  * Everything is a codegen'd `when`-chain; no UDFs.
  */
class MapTransformer(
    val inputs: Seq[String],
    val outputs: Seq[String],
    val mapping: Seq[(Any, Any)],
    val regex: Boolean = false,
    val defaultValue: Option[Any] = None,
    val dtype: Option[DataType] = None)
    extends GraftTransformer {
  require(inputs.length == outputs.length)

  private def mapped(c: Column): Column =
    if (regex) {
      mapping.foldLeft(c.cast(StringType)) { case (acc, (k, v)) =>
        regexp_replace(acc, k.toString, v.toString)
      }
    } else {
      val chain = mapping.foldLeft(Option.empty[Column]) {
        case (acc, (k, v)) =>
          val cond = if (k == null) c.isNull else c === lit(k)
          Some(acc.fold(when(cond, lit(v)))(_.when(cond, lit(v))))
      }
      chain.fold(c)(_.otherwise(c))
    }

  override def transformDF(df: DataFrame): DataFrame =
    inputs.zip(outputs).foldLeft(df) { case (d, (in, out)) =>
      var e = mapped(col(in))
      defaultValue.foreach { dv =>
        val vals = mapping.map(_._2).filter(_ != null)
        e = when(e.isin(vals: _*), e).otherwise(lit(dv))
      }
      dtype.foreach(t => e = e.cast(t))
      d.withColumn(out, e)
    }
}

/** Token/prefix extraction. Reference: dfpipeline/StringSplitter.py:71-101.
  *  - separator mode: literal split, `str(x).split(sep)[keep]` with ANY
  *    Python list index (0 first, -1 last, arbitrary positive/negative —
  *    StringSplitter.py:89 doesn't restrict it). An out-of-range index
  *    yields null where pandas raises IndexError — the Spark-native analog
  *    of a per-row crash.
  *  - index mode: Python slice `x[:index]` (`keep=0`) or `x[index:]`
  *    (`keep = -1`), `index` may be negative with Python semantics
  *    (`x[:-2]` drops the last 2 chars, `x[-2:]` keeps them); other `keep`
  *    values are rejected exactly like the reference's assert
  *    (StringSplitter.py:98).
  */
class StringSplitter(
    val inputs: Seq[String],
    val outputs: Seq[String],
    val separator: Option[String] = None,
    val index: Option[Int] = None,
    val keep: Int = 0)
    extends GraftTransformer {
  require(inputs.length == outputs.length)
  require(separator.nonEmpty || index.nonEmpty)
  require(separator.nonEmpty || keep == 0 || keep == -1,
    "keep can be set only to 0 or -1") // index mode, StringSplitter.py:98

  private def piece(c: Column): Column = separator match {
    case Some(sep) =>
      val parts = split(c.cast(StringType), Pattern.quote(sep), -1)
      // try_element_at is 1-based from the front, negative from the back —
      // Python's list indexing shifted by one on the positive side; the
      // `try_` form nulls out-of-range instead of throwing (ANSI mode)
      try_element_at(parts, lit(if (keep >= 0) keep + 1 else keep))
    case None =>
      val i = index.get
      val s = c.cast(StringType)
      val len = length(s)
      if (keep == 0) {
        if (i >= 0) substring(s, 1, i)
        else s.substr(lit(1), greatest(len + lit(i), lit(0))) // x[:-n]
      } else {
        if (i >= 0) s.substr(lit(i + 1), len)
        else s.substr(greatest(len + lit(i), lit(0)) + lit(1), len) // x[-n:]
      }
  }

  override def transformDF(df: DataFrame): DataFrame =
    inputs.zip(outputs).foldLeft(df) { case (d, (in, out)) =>
      d.withColumn(out, piece(col(in)))
    }
}

/** Composite-key builder. Reference: dfpipeline/StringConcatenator.py:49-65.
  *
  * Left fold over each input tuple:
  * `out = strip(str(out)) + sep + strip(str(next))` where
  * `strip = rstrip('0').rstrip('.')` — numeric-looking strings lose trailing
  * zeros then trailing dots, so `"100.0" → "100"` and (the documented quirk)
  * `"100" → "1"`. A 1-element tuple is a plain column copy with no strip.
  * Divergence from pandas: null stays null (pandas `astype(str)` would
  * produce the literal `"nan"`).
  */
class StringConcatenator(
    val inputs: Seq[Seq[String]],
    val outputs: Seq[String],
    val separator: String)
    extends GraftTransformer {
  require(inputs.length == outputs.length)

  private def strip(c: Column): Column =
    regexp_replace(regexp_replace(c, "0+$", ""), "\\.+$", "")

  override def transformDF(df: DataFrame): DataFrame =
    inputs.zip(outputs).foldLeft(df) { case (d, (tuple, out)) =>
      val e =
        if (tuple.lengthCompare(1) == 0) col(tuple.head)
        else
          tuple.tail.foldLeft(col(tuple.head).cast(StringType)) { (acc, c) =>
            concat(strip(acc), lit(separator),
              strip(col(c).cast(StringType)))
          }
      d.withColumn(out, e)
    }
}

/** Date-field extraction. Reference: dfpipeline/DateTransformer.py:48-79.
  *
  * Parses `column` (string dates, or epoch seconds relative to `origin`) —
  * replacing it with the parsed timestamp like the reference does — and
  * derives six long columns:
  * `_MY` month, `_WY` ISO week, `_DY` day-of-year, `_DM` day-of-month,
  * `_DW` day-of-week with Monday=0 (Spark `dayofweek` is Sunday=1 →
  * `(dow+5) % 7`), `_HD` hour.
  */
class DateTransformer(val column: String, val origin: Option[String] = None)
    extends GraftTransformer {
  override def transformDF(df: DataFrame): DataFrame = {
    val ts = origin match {
      case Some(o) =>
        timestamp_seconds(
          unix_timestamp(to_timestamp(lit(o))) + col(column).cast(LongType))
      case None => to_timestamp(col(column))
    }
    val d = df.withColumn(column, ts)
    val t = col(column)
    val fields = Seq(
      "MY" -> month(t), "WY" -> weekofyear(t), "DY" -> dayofyear(t),
      "DM" -> dayofmonth(t), "DW" -> (dayofweek(t) + lit(5)) % lit(7),
      "HD" -> hour(t))
    fields.foldLeft(d) { case (acc, (suffix, e)) =>
      acc.withColumn(s"${column}_$suffix", e.cast(LongType))
    }
  }
}

/** The scalar-UDF surface. Reference: dfpipeline/FunctionTransformer.py:53-93
  * compiles Python lambdas to an ONNX dataflow via CPython bytecode walking
  * (dfpipeline/walkBytecode.py). On Spark the compiler is Catalyst itself:
  * the user supplies a `Seq[Column] => Column` expression lambda (SURVEY
  * §2.3) and gets whole-stage codegen; an opaque JVM closure via
  * `org.apache.spark.sql.functions.udf` is the documented slow path.
  */
class FunctionTransformer(
    val inputs: Seq[Seq[String]],
    val outputs: Seq[String],
    fn: Seq[Column] => Column,
    val op: Option[Op] = None)
    extends GraftTransformer {
  require(inputs.length == outputs.length)
  override def transformDF(df: DataFrame): DataFrame =
    inputs.zip(outputs).foldLeft(df) { case (d, (ins, out)) =>
      d.withColumn(out, fn(ins.map(col)))
    }
}

object FunctionTransformer {
  def apply(inputs: Seq[String], outputs: Seq[String], fn: Column => Column) =
    new FunctionTransformer(inputs.map(Seq(_)), outputs,
      (cs: Seq[Column]) => fn(cs.head))
  def apply2(
      inputs: Seq[(String, String)],
      outputs: Seq[String],
      fn: (Column, Column) => Column) =
    new FunctionTransformer(inputs.map(t => Seq(t._1, t._2)), outputs,
      (cs: Seq[Column]) => fn(cs(0), cs(1)))

  /** The persistable form: the expression is an [[Op]] tree (data, not a
    * closure), so [[GraftPersistence]] can round-trip the stage — the role
    * the reference's bytecode→ONNX export plays for lambda stages
    * (FunctionTransformer.py:68-87). Same tree applied per input tuple. */
  def fromOp(inputs: Seq[Seq[String]], outputs: Seq[String], op: Op) =
    new FunctionTransformer(inputs, outputs, cs => op.toColumn(cs), Some(op))
}

/** The hashing trick (Weinberger et al. 2009): project arbitrary-cardinality
  * categorical (and optionally numeric) features into a FIXED-width vector
  * with no fitted vocabulary at all — the encoder for feature spaces whose
  * dictionary would not fit anywhere (user ids, URLs, n-grams) and the only
  * encoder family that needs NO fit pass, so it scores unbounded streams
  * with zero state. This is the signed VECTOR form;
  * [[graft.operators.HashingEncoder]] is the scalar sibling (one ordinal
  * bucket id per column) for tree-model pipelines. Each categorical column contributes `sign(h) · 1` at index
  * `h mod nBuckets` of `outputCol`, where `h = md5₆₀("col=value")`; a
  * numeric column contributes `sign · value` at `h = md5₆₀("col")` (the
  * feature NAME owns the slot, the value rides it). Null inputs contribute
  * nothing (the all-zeros row is the all-null row). The sign bit
  * (`(h div nBuckets) mod 2`, independent of the bucket bits) makes
  * collisions cancel in expectation — the variance argument of the paper.
  *
  * Determinism / engine portability: the hash is the md5-prefix integer
  * every portable path here uses (never a JVM-private hash), contributions
  * accumulate as LONGS in `scale` units (value·scale floor-quantized), and
  * the output doubles divide by a power-of-two `scale` — integer sums are
  * order-free and the division is exact in binary, so the vector replays
  * bit-for-bit in any engine, collisions included.
  *
  * Shape at 100 TB: a pure per-row projection — no fit, no shuffle, no
  * state; cost is O(nBuckets · nFeatures) per row (dense output), so keep
  * `nBuckets` ≤ ~1024 here and use an exploded (row, bucket, value)
  * relation for wider spaces. */
class FeatureHasher(
    val catCols: Seq[String],
    val numCols: Seq[String],
    val outputCol: String,
    val nBuckets: Int,
    val scale: Long = 1L << 20)
    extends GraftTransformer {
  require(catCols.nonEmpty || numCols.nonEmpty, "need at least one input")
  require(nBuckets >= 2 && nBuckets <= 1024,
    s"need 2 <= nBuckets <= 1024 (dense output), got $nBuckets")
  require(scale >= 1 && (scale & (scale - 1)) == 0,
    s"scale must be a power of two for exact output division, got $scale")

  private def hash(s: Column): Column =
    graft.functions.GraftFunctions.md5_hash60(s)

  // sign from an INDEPENDENT md5 ("s:" domain-separated), not from the
  // bucket hash's high bits — Column `/` is double division and 60-bit
  // hashes lose exactness past 2^53, so high-bit extraction would not
  // replay; a second md5 is portable arithmetic in every engine
  private def signOf(s: Column): Column =
    when(hash(concat(lit("s:"), s)) % 2 === 0, 1L).otherwise(-1L)

  override def transformDF(df: DataFrame): DataFrame = {
    // categorical hash keys go through cast("string") at both fit and
    // transform, so ANY input type is self-consistent batch-side — no
    // type restriction here (ADVICE r8: the r7 require broke batch-only
    // pipelines and already-persisted models for double/timestamp
    // categoricals). The online==batch parity contract only bites when a
    // model is served through OnlineScorer, whose castStr refuses the
    // types whose JVM rendering diverges from Spark's string cast
    // (doubles render 1.0E7 vs 10000000.0, timestamps differ entirely) —
    // enforcement lives there, at the serving boundary.
    // per-feature (bucket, contribution-in-scale-units) structs; null
    // features yield a null struct, skipped by the fold below
    val feats: Seq[Column] =
      catCols.map { c =>
        val key = concat(lit(c + "="), col(c).cast("string"))
        when(col(c).isNotNull,
          struct((hash(key) % nBuckets).cast("int").as("b"),
            (signOf(key) * scale).as("u")))
      } ++ numCols.map { c =>
        val key = lit(c)
        when(col(c).isNotNull && !isnan(col(c).cast("double")),
          struct((hash(key) % nBuckets).cast("int").as("b"),
            (signOf(key) * floor(col(c).cast("double") * scale)
              .cast("long")).as("u")))
      }
    // the md5 buckets/signs above are codegen'd COLUMNS (portable
    // hashing); the scatter into the fixed-width vector is an O(F)
    // JVM fold — a Catalyst HOF formulation (transform×aggregate) is
    // interpreted at O(nBuckets·F) per row and measured ~14× slower
    // at a ×16 stress; the fold is exact integer arithmetic with no
    // engine-variant operation (the Eval.ewma justification)
    val n = nBuckets
    val sc = scale
    val scatter = udf((arr: Seq[org.apache.spark.sql.Row]) => {
      val units = new Array[Long](n)
      arr.foreach { r =>
        if (r != null) units(r.getInt(0)) += r.getLong(1)
      }
      units.map(_.toDouble / sc)
    })
    df.withColumn(outputCol, scatter(array(feats: _*)))
  }
}
