package graft

import graft.operators._

/** Golden tests: transform-time-statistics operators (SURVEY §2.5.1). */
class ImputerSpec extends SparkSpec {
  import spark.implicits._
  // tests/test_impute.py:25-58
  lazy val df = Seq(
    (1L, Some(1.0), Some(1.0)), (2L, Some(2.0), Some(3.0)),
    (3L, Some(3.0), Some(5.0)), (4L, None, None))
    .toDF("row_id", "col1", "col2")

  test("mean at transform time") {
    val out = new Imputer(Seq("col1"), Seq("col1"), Some("mean")).transform(df)
    assertCol(out, "col1", Seq(1.0, 2.0, 3.0, 2.0))
    assertCol(out, "col2", Seq(1.0, 3.0, 5.0, null))
  }
  test("median at transform time") {
    val out = new Imputer(Seq("col2"), Seq("col2"), Some("median")).transform(df)
    assertCol(out, "col2", Seq(1.0, 3.0, 5.0, 3.0))
  }
  test("constant fill") {
    val out = new Imputer(Seq("col1", "col2"), Seq("col1", "col2"), None, 0)
      .transform(df)
    assertCol(out, "col1", Seq(1.0, 2.0, 3.0, 0.0))
    assertCol(out, "col2", Seq(1.0, 3.0, 5.0, 0.0))
  }
}

class MinorityTransformerSpec extends SparkSpec {
  import spark.implicits._
  // tests/test_minority.py:25-47
  lazy val df = Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "B"), (5L, "B"), (6L, "C"))
    .toDF("row_id", "col1")

  test("freq < 3 → others") {
    val out = new MinorityTransformer(Seq("col1"), Seq("col2"), 3, "others")
      .transform(df)
    assertCol(out, "col2", Seq("A", "A", "A", "others", "others", "others"))
  }
  test("freq < 2 → others") {
    val out = new MinorityTransformer(Seq("col1"), Seq("col2"), 2, "others")
      .transform(df)
    assertCol(out, "col2", Seq("A", "A", "A", "B", "B", "others"))
  }
  test("null → replaced") {
    val d = Seq((1L, Some("A")), (2L, Some("A")), (3L, None)).toDF("row_id", "col1")
    val out = new MinorityTransformer(Seq("col1"), Seq("col2"), 2, "others")
      .transform(d)
    assertCol(out, "col2", Seq("A", "A", "others"))
  }
}

class RangeTransformerSpec extends SparkSpec {
  import spark.implicits._
  // tests/test_range.py:25-62 — C2 = [3,4,6,6,9,None,17,17,20,100]
  lazy val df = Seq(
    (1L, "male", Some(3.0)), (2L, "female", Some(4.0)), (3L, "female", Some(6.0)),
    (4L, "female", Some(6.0)), (5L, "male", Some(9.0)), (6L, "female", None),
    (7L, "male", Some(17.0)), (8L, "male", Some(17.0)), (9L, "female", Some(20.0)),
    (10L, "female", Some(100.0))).toDF("row_id", "sex", "C2")

  val rules: Seq[((Option[Double], Option[Double]), Any)] = Seq(
    ((None, Some(20.0)), 1000),          // x >= 20 → 1000
    ((Some(6.0), None), -1000),          // x <= 6 → -1000
    ((Some(20.0), Some(9.0)), "median")) // 9 <= x <= 20 → median(matched)

  val expected =
    Seq(-1000.0, -1000.0, -1000.0, -1000.0, 17.0, null, 17.0, 17.0, 17.0, 1000.0)

  test("range rules, last-match-wins, median on matched subset") {
    val out = new RangeTransformer(Seq("C2"), Seq("C2_norm"), rules).transform(df)
    assertCol(out, "C2_norm", expected)
  }
  test("in-place output") {
    val out = new RangeTransformer(Seq("C2"), Seq("C2"), rules).transform(df)
    assertCol(out, "C2", expected)
  }
  test("(None,None) rule is ignored") {
    val out = new RangeTransformer(Seq("C2"), Seq("C2"),
      rules :+ (((Option.empty[Double], Option.empty[Double]), 0: Any)))
      .transform(df)
    assertCol(out, "C2", expected)
  }
  test("most_frequent") {
    val out = new RangeTransformer(Seq("C2"), Seq("C2"),
      rules.updated(2, ((Some(20.0), Some(9.0)), "most_frequent": Any)))
      .transform(df)
    assertCol(out, "C2", expected) // mode of [9,17,17,20] = 17
  }
  test("mean") {
    val out = new RangeTransformer(Seq("C2"), Seq("C2"),
      rules.updated(2, ((Some(20.0), Some(9.0)), "mean": Any))).transform(df)
    assertCol(out, "C2",
      Seq(-1000.0, -1000.0, -1000.0, -1000.0, 15.75, null, 15.75, 15.75, 15.75, 1000.0))
  }
  test("two columns, one aggregate pass") {
    // tests/test_range.py:55-62 — C3 = [300,200,100,20,17,17,None,9,6,6]
    val df2 = Seq(
      (1L, Some(3.0), Some(300.0)), (2L, Some(4.0), Some(200.0)),
      (3L, Some(6.0), Some(100.0)), (4L, Some(6.0), Some(20.0)),
      (5L, Some(9.0), Some(17.0)), (6L, None, Some(17.0)),
      (7L, Some(17.0), None), (8L, Some(17.0), Some(9.0)),
      (9L, Some(20.0), Some(6.0)), (10L, Some(100.0), Some(6.0)))
      .toDF("row_id", "C2", "C3")
    val out = new RangeTransformer(Seq("C2", "C3"), Seq("C2", "C3"),
      rules.updated(2, ((Some(20.0), Some(9.0)), "mean": Any))).transform(df2)
    assertCol(out, "C2",
      Seq(-1000.0, -1000.0, -1000.0, -1000.0, 15.75, null, 15.75, 15.75, 15.75, 1000.0))
    assertCol(out, "C3",
      Seq(1000.0, 1000.0, 1000.0, 15.75, 15.75, 15.75, null, 15.75, -1000.0, -1000.0))
  }
}

class SetTransformerSpec extends SparkSpec {
  import spark.implicits._
  // tests/test_setop.py:25-44
  lazy val df = Seq("male", "female", "female", "male", "female", "male",
    "female", "female").zipWithIndex.map { case (s, i) => (i.toLong, s) }
    .toDF("row_id", "sex")

  test("intersection") {
    var got: Seq[String] = Nil
    new SetTransformer(Left("sex"), Right(Seq("male")), "*",
      Some(r => got = r)).transform(df).count()
    assert(got == Seq("male"))
  }
  test("difference") {
    var got: Seq[String] = Nil
    new SetTransformer(Left("sex"), Right(Seq("male")), "-",
      Some(r => got = r)).transform(df).count()
    assert(got == Seq("female"))
  }

  // SetTransformer.py:84-89 — the None-padded positional output column,
  // deterministic here via orderCol
  test("padded output column: sorted elements on lowest-order rows") {
    val out = new SetTransformer(Left("sex"), Right(Seq("male", "female", "x")),
      "*", None, outputOperand = Some("set_out"), orderCol = Some("row_id"))
      .transform(df)
    assertCol(out, "set_out", Seq("female", "male",
      null, null, null, null, null, null))
    assert(out.columns.toSeq ==
      Seq("row_id", "sex", "set_out"))
  }

  test("padded output requires orderCol; oversized result throws") {
    intercept[IllegalArgumentException] {
      new SetTransformer(Left("sex"), Right(Seq("male")), "*", None,
        outputOperand = Some("o")).transform(df)
    }
    val tiny = df.limit(1)
    intercept[IllegalStateException] {
      new SetTransformer(Left("sex"), Right(Seq("a", "b", "c")), "|", None,
        outputOperand = Some("o"), orderCol = Some("row_id")).transform(tiny)
    }
  }
}
