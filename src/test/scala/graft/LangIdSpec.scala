package graft

import graft.text.LangId
import org.apache.spark.sql.functions._

class LangIdSpec extends SparkSpec {
  import spark.implicits._

  private val labeled = Seq(
    // "x-ish": words built from {za, zo, ki}
    (1L, "zaki zoza kiza zaza kizo", "x"),
    (2L, "zoza zaki kizo kiki zazo", "x"),
    (3L, "kiza zazo zoki zaza kizo", "x"),
    // "y-ish": words built from {mu, ne, tu}
    (4L, "mune tumu nemu tutu nemu", "y"),
    (5L, "nemu mune tune mune tumu", "y"),
    (6L, "tumu nene mutu nemu tune", "y")
  ).toDF("doc_id", "text", "lang")

  test("charGrams: sliding trigrams, lowercased; short text gives empty") {
    val df = Seq("AbCd", "ab", "", "xyz").toDF("s")
      .select(LangId.charGrams(col("s"), 3).as("g"))
    val got = df.collect().map(_.getSeq[String](0).toList).toList
    assert(got == List(List("abc", "bcd"), Nil, Nil, List("xyz")))
  }

  test("fitProfiles: topK cap, rank order by count desc then gram asc") {
    val prof = LangId.fitProfiles(labeled, "text", "lang", n = 3, topK = 5)
    val byLang = prof.collect()
      .groupBy(_.getString(0)).view.mapValues(_.sortBy(_.getLong(2))).toMap
    assert(byLang.keySet == Set("x", "y"))
    byLang.values.foreach { rows =>
      assert(rows.length == 5)
      assert(rows.map(_.getLong(2)).toList == List(1L, 2L, 3L, 4L, 5L))
    }
    // rank-1 gram of x must be a {z,a,o,k,i}-alphabet gram, never y's
    assert(!byLang("x").head.getString(1).exists("mnetu".contains(_)))
  }

  test("selfCheck recovers the labels on a separable corpus") {
    val got = LangId.selfCheck(labeled, "doc_id", "text", "lang",
      n = 3, topK = 16).orderBy("doc_id").collect()
    assert(got.length == 6)
    assert(got.forall(_.getBoolean(3)), "all docs should agree")
    assert(got.forall(_.getLong(2) > 0))
  }

  test("classify: zero-overlap docs get ('und', 0), not dropped") {
    val prof = LangId.fitProfiles(labeled, "text", "lang", n = 3, topK = 16)
    val alien = Seq((9L, "qqq www qqq")).toDF("doc_id", "text")
    val got = LangId.classify(alien, "doc_id", "text", prof, n = 3)
      .collect()
    assert(got.length == 1)
    assert(got(0).getString(1) == "und" && got(0).getLong(2) == 0L)
  }

  test("literal-intersect path == forced join path, row for row " +
      "(selfCheck and classify, including zero-overlap docs)") {
    def key(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    val lit = LangId.selfCheck(labeled, "doc_id", "text", "lang",
      n = 3, topK = 16)
    val joined = LangId.selfCheck(labeled, "doc_id", "text", "lang",
      n = 3, topK = 16, maxLiteralEntries = 0)
    assert(key(lit.collect()).toList == key(joined.collect()).toList)
    val prof = LangId.fitProfiles(labeled, "text", "lang", n = 3, topK = 16)
    val mixed = Seq((7L, "zaki mune"), (9L, "qqq www")).toDF("doc_id", "text")
    val cl = LangId.classify(mixed, "doc_id", "text", prof, n = 3)
    val cj = LangId.classify(mixed, "doc_id", "text", prof, n = 3,
      maxLiteralEntries = 0)
    assert(key(cl.collect()).toList == key(cj.collect()).toList)
  }

  test("literal classify plan is scan-shaped: ZERO exchanges, no join, " +
      "no window") {
    val prof = LangId.fitProfiles(labeled, "text", "lang", n = 3, topK = 16)
      .localCheckpoint(true)
    val p = LangId.classify(labeled, "doc_id", "text", prof, n = 3)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p.take(1200))
    assert(!p.contains("Join"), p.take(1200))
    assert(!p.contains("Window"), p.take(1200))
  }

  test("argmax tie-break is the lexicographically smallest language") {
    // one doc overlapping both profiles equally: tie -> "x" < "y"
    val prof = LangId.fitProfiles(labeled, "text", "lang", n = 3, topK = 16)
    // build a text whose distinct trigram overlap with x and y is equal:
    // take one full word from each vocabulary ("zaki", "mune" both give
    // trigram pairs present in the respective profiles)
    val mixed = Seq((7L, "zaki mune")).toDF("doc_id", "text")
    val scores = LangId.classify(mixed, "doc_id", "text", prof, n = 3)
      .collect()(0)
    // whatever the score, determinism requires a stable answer; if the
    // overlap is exactly tied the winner must be "x"
    val overlap = prof.select(col("lang"), col("gram"))
      .join(mixed.select(explode(array_distinct(
        LangId.charGrams(col("text"), 3))).as("gram")), Seq("gram"))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    if (overlap.getOrElse("x", 0L) == overlap.getOrElse("y", 0L))
      assert(scores.getString(1) == "x")
    else
      assert(scores.getString(1) ==
        overlap.maxBy { case (l, c) => (c, -l(0).toInt) }._1)
  }
}
