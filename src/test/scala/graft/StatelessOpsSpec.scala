package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Golden tests ported from the reference's pytest suite (SURVEY §5):
  * stateless operators. Each cites its source fixture. */
class ColumnSelectorSpec extends SparkSpec {
  import spark.implicits._
  // tests/test_select.py:25-49
  lazy val df = Seq((1L, "A", "L", "X"), (2L, "B", "M", "Y"), (3L, "C", "N", "Z"))
    .toDF("row_id", "col1", "col2", "col3")

  test("keep list") {
    val out = new ColumnSelector(Seq("row_id", "col1", "col2")).transform(df)
    assert(out.columns.toSeq == Seq("row_id", "col1", "col2"))
    assertCol(out, "col1", Seq("A", "B", "C"))
  }
  test("drop list") {
    val out = new ColumnSelector(Seq("col1"), drop = true).transform(df)
    assert(out.columns.toSeq == Seq("row_id", "col2", "col3"))
  }
}

class TypeConverterSpec extends SparkSpec {
  import spark.implicits._
  // tests/test_typeconv.py:25-36
  test("int to double, null survives") {
    val df = Seq((1L, Some(3)), (2L, None), (3L, Some(17)))
      .toDF("row_id", "C2")
    val out = new TypeConverter(Seq("C2"),
      org.apache.spark.sql.types.DoubleType).transform(df)
    assert(dtypeOf(out, "C2") == "double")
    assertCol(out, "C2", Seq(3.0, null, 17.0))
  }
}

class RowTransformerSpec extends SparkSpec {
  import spark.implicits._
  // tests/test_row.py:25-51
  lazy val df = Seq(
    (1L, "male", "sales", 30), (2L, "p", "engineer", 22),
    (3L, "female", "N/A", 25), (4L, "p", "service", 44))
    .toDF("row_id", "Gender", "Job", "Age")

  test("drop by one column") {
    val out = new RowTransformer(Seq("Gender"), Seq("p")).transform(df)
    assertCol(out, "Gender", Seq("male", "female"))
    assertCol(out, "Age", Seq(30, 25))
  }
  test("drop by two columns") {
    val out = new RowTransformer(Seq("Gender", "Job"), Seq("p", "N/A"))
      .transform(df)
    assertCol(out, "Gender", Seq("male"))
  }
  test("nulls are kept") {
    val d = Seq((1L, Some("p")), (2L, None), (3L, Some("x")))
      .toDF("row_id", "Gender")
    val out = new RowTransformer(Seq("Gender"), Seq("p")).transform(d)
    assertCol(out, "Gender", Seq(null, "x"))
  }
}

class MapTransformerSpec extends SparkSpec {
  import spark.implicits._
  // tests/test_map.py:25-72
  lazy val nanDf = Seq(
    (1L, Some("device-1"), Some("device-2")),
    (2L, None, Some("device-3")),
    (3L, None, None)).toDF("row_id", "col1", "col2")
  lazy val df = Seq(
    (1L, "device-1", "device-2"), (2L, "missing", "device-3"),
    (3L, "missing", "missing")).toDF("row_id", "col1", "col2")

  test("null key maps nulls") {
    val out = new MapTransformer(Seq("col1", "col2"), Seq("col1", "col2"),
      Seq((null, "missing"))).transform(nanDf)
    assertCol(out, "col1", Seq("device-1", "missing", "missing"))
    assertCol(out, "col2", Seq("device-2", "device-3", "missing"))
  }
  test("exact match keeps unmatched") {
    val out = new MapTransformer(Seq("col1", "col2"), Seq("col1", "col2"),
      Seq(("device-1", "device"))).transform(df)
    assertCol(out, "col1", Seq("device", "missing", "missing"))
    assertCol(out, "col2", Seq("device-2", "device-3", "missing"))
  }
  test("default value replaces everything not in dict values") {
    val out = new MapTransformer(Seq("col1", "col2"), Seq("col1", "col2"),
      Seq(("device-1", "device")), defaultValue = Some("others"))
      .transform(df)
    assertCol(out, "col1", Seq("device", "others", "others"))
    assertCol(out, "col2", Seq("others", "others", "others"))
  }
  test("regex substring replace") {
    val out = new MapTransformer(Seq("col1", "col2"), Seq("col1", "col2"),
      Seq((".*device.*", "device")), regex = true).transform(df)
    assertCol(out, "col1", Seq("device", "missing", "missing"))
    assertCol(out, "col2", Seq("device", "device", "missing"))
  }
}

class StringSplitterSpec extends SparkSpec {
  import spark.implicits._
  // tests/test_strsplit.py:25-72
  lazy val df = Seq(
    (1L, "taro.jp.com", "abcd"), (2L, "alice.us.com", "klmn"),
    (3L, "bob.us", "wxyz")).toDF("row_id", "Email", "ID")

  test("separator keep=0 → first token") {
    val out = new StringSplitter(Seq("Email"), Seq("Email_prefix"),
      separator = Some("."), keep = 0).transform(df)
    assertCol(out, "Email_prefix", Seq("taro", "alice", "bob"))
  }
  test("separator keep=-1 → last token") {
    val out = new StringSplitter(Seq("Email"), Seq("Email_suffix"),
      separator = Some("."), keep = -1).transform(df)
    assertCol(out, "Email_suffix", Seq("com", "com", "us"))
  }
  test("index keep=0 → prefix") {
    val out = new StringSplitter(Seq("ID"), Seq("ID_prefix"),
      index = Some(2), keep = 0).transform(df)
    assertCol(out, "ID_prefix", Seq("ab", "kl", "wx"))
  }
  test("index keep=-1 → suffix") {
    val out = new StringSplitter(Seq("ID"), Seq("ID_suffix"),
      index = Some(2), keep = -1).transform(df)
    assertCol(out, "ID_suffix", Seq("cd", "mn", "yz"))
  }
  // StringSplitter.py:89 — keep is any Python list index
  test("separator keep=1 → second token; out of range → null") {
    val out = new StringSplitter(Seq("Email"), Seq("mid"),
      separator = Some("."), keep = 1).transform(df)
    assertCol(out, "mid", Seq("jp", "us", "us"))
    val far = new StringSplitter(Seq("Email"), Seq("far"),
      separator = Some("."), keep = 5).transform(df)
    assertCol(far, "far", Seq(null, null, null))
  }
  test("separator keep=-2 → second-to-last token") {
    val out = new StringSplitter(Seq("Email"), Seq("m2"),
      separator = Some("."), keep = -2).transform(df)
    assertCol(out, "m2", Seq("jp", "us", "bob"))
  }
  // Python slice semantics for negative index
  test("index negative: x[:-n] and x[-n:]") {
    val pre = new StringSplitter(Seq("ID"), Seq("p"),
      index = Some(-1), keep = 0).transform(df)
    assertCol(pre, "p", Seq("abc", "klm", "wxy"))
    val suf = new StringSplitter(Seq("ID"), Seq("s"),
      index = Some(-3), keep = -1).transform(df)
    assertCol(suf, "s", Seq("bcd", "lmn", "xyz"))
    // |index| > len → empty prefix / whole string suffix, like Python
    val over = new StringSplitter(Seq("ID"), Seq("o"),
      index = Some(-9), keep = 0).transform(df)
    assertCol(over, "o", Seq("", "", ""))
    val overS = new StringSplitter(Seq("ID"), Seq("os"),
      index = Some(-9), keep = -1).transform(df)
    assertCol(overS, "os", Seq("abcd", "klmn", "wxyz"))
  }
  test("index mode rejects keep outside {0,-1} like the reference assert") {
    intercept[IllegalArgumentException] {
      new StringSplitter(Seq("ID"), Seq("x"), index = Some(2), keep = 3)
    }
    ()
  }
}

class StringConcatenatorSpec extends SparkSpec {
  import spark.implicits._
  // tests/test_strconcat.py:25-65
  lazy val df = Seq((1L, "A", "L", "X"), (2L, "B", "M", "Y"), (3L, "C", "N", "Z"))
    .toDF("row_id", "col1", "col2", "col3")

  test("1-tuple = plain copy") {
    val out = new StringConcatenator(Seq(Seq("col1")), Seq("col4"), "_")
      .transform(df)
    assertCol(out, "col4", Seq("A", "B", "C"))
  }
  test("2-tuple") {
    val out = new StringConcatenator(Seq(Seq("col1", "col2")), Seq("col4"), "_")
      .transform(df)
    assertCol(out, "col4", Seq("A_L", "B_M", "C_N"))
  }
  test("3-tuple") {
    val out = new StringConcatenator(
      Seq(Seq("col1", "col2", "col3")), Seq("col4"), "_").transform(df)
    assertCol(out, "col4", Seq("A_L_X", "B_M_Y", "C_N_Z"))
  }
  test("rstrip normalization quirk (StringConcatenator.py:64)") {
    val d = Seq((1L, "100.0", "2.50"), (2L, "100", "0")).toDF("row_id", "a", "b")
    val out = new StringConcatenator(Seq(Seq("a", "b")), Seq("k"), "_")
      .transform(d)
    // str.rstrip('0').rstrip('.'): "100.0"→"100", "2.50"→"2.5",
    // "100"→"1" (the int-mangling quirk), "0"→""
    assertCol(out, "k", Seq("100_2.5", "1_"))
  }
}

class DateTransformerSpec extends SparkSpec {
  import spark.implicits._
  // tests/test_date.py:26-65
  lazy val df = Seq(
    (1L, 86401L, "2018-01-31"), (2L, 106401L, "2018-04-30"),
    (3L, 206400L, "2018-07-31"), (4L, 3064000L, "2018-10-31"))
    .toDF("row_id", "col1", "col2")

  test("epoch seconds + origin") {
    val out = new DateTransformer("col1", origin = Some("2017-11-30"))
      .transform(df)
    assertCol(out, "col1_WY", Seq(48L, 48L, 48L, 1L))
    assertCol(out, "col1_DY", Seq(335L, 335L, 336L, 4L))
    assertCol(out, "col1_DW", Seq(4L, 4L, 5L, 3L))
    assert(dtypeOf(out, "col1") == "timestamp")
  }
  test("string dates") {
    val out = new DateTransformer("col2").transform(df)
    assertCol(out, "col2_WY", Seq(5L, 18L, 31L, 44L))
    assertCol(out, "col2_DY", Seq(31L, 120L, 212L, 304L))
    assertCol(out, "col2_DW", Seq(2L, 0L, 1L, 2L))
    assertCol(out, "col2_MY", Seq(1L, 4L, 7L, 10L))
    assertCol(out, "col2_DM", Seq(31L, 30L, 31L, 31L))
    assertCol(out, "col2_HD", Seq(0L, 0L, 0L, 0L))
  }
}

class FunctionTransformerSpec extends SparkSpec {
  import spark.implicits._
  // tests/test_function.py:26-66
  lazy val df = Seq((1L, 1, 10, 1), (2L, 2, 20, 4), (3L, 3, 30, 9), (4L, 4, 40, 16))
    .toDF("row_id", "col1", "col2", "col3")

  test("x + 1") {
    val out = FunctionTransformer(Seq("col1"), Seq("col4"), x => x + 1)
      .transform(df)
    assertCol(out, "col4", Seq(2, 3, 4, 5))
  }
  test("x + y") {
    val out = FunctionTransformer.apply2(
      Seq(("col1", "col2")), Seq("col4"), (x, y) => x + y).transform(df)
    assertCol(out, "col4", Seq(11, 22, 33, 44))
  }
  test("sqrt") {
    val out = FunctionTransformer(Seq("col3"), Seq("col4"), sqrt(_))
      .transform(df)
    assertCol(out, "col4", Seq(1.0, 2.0, 3.0, 4.0))
  }
}
