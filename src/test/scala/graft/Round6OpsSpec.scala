package graft

import graft.functions.GraftFunctions
import graft.text.TextFunctions
import org.apache.spark.sql.functions._

/** Round-6 operators: heavy hitters (CMS pre-filter — covered in
  * RelationalSpec), accent stripping / text normalization. */
class NormalizeTextSpec extends SparkSpec {
  import spark.implicits._

  test("strip_accents removes composed and decomposed accents, keeps ASCII") {
    val df = Seq(
      "Caf\u00e9",              // composed e-acute
      "Cafe\u0301",             // decomposed e + combining acute
      "na\u00efve Z\u00fcrich",
      "\u00c0\u00c9\u00ce\u00d5\u00dc\u00e7\u00f1",
      "plain ascii stays",
      "\u0153uvre"              // oe ligature: NOT an accent, must survive
    ).toDF("s")
    val got = df.select(GraftFunctions.strip_accents(col("s")).as("o"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("Cafe", "Cafe", "naive Zurich", "AEIOUcn",
      "plain ascii stays", "\u0153uvre"))
  }

  test("strip_accents null and empty passthrough") {
    val df = Seq(Some(""), None).toDF("s")
    val got = df.select(GraftFunctions.strip_accents(col("s")).as("o"))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(got == Seq(Some(""), None))
  }

  test("normalizeText collapses whitespace, trims, lowercases") {
    val df = Seq("  Caf\u00e9   du\t\tMonde \n").toDF("s")
    assert(df.select(TextFunctions.normalizeText(col("s")).as("o"))
      .head().getString(0) == "cafe du monde")
    assert(df.select(
        TextFunctions.normalizeText(col("s"), lowercase = false).as("o"))
      .head().getString(0) == "Cafe du Monde")
  }

  test("normalizeText makes accent-variant duplicates exactly equal") {
    // the dedup motivation: same page crawled twice with different
    // Unicode normalization must collapse to one key
    val df = Seq(
      (1L, "R\u00e9sum\u00e9  writing\ttips"),
      (2L, "Re\u0301sume\u0301 writing tips")).toDF("id", "text")
    val keys = df.select(TextFunctions.normalizeText(col("text")).as("k"))
      .distinct().count()
    assert(keys == 1L)
  }
}
