package graft

import graft.text.{Corpus, Dedup}
import org.apache.spark.sql.functions._

class DedupLinesInDocSpec extends SparkSpec {
  import spark.implicits._

  test("keeps first occurrence per doc, preserves order, keeps blanks") {
    val df = Seq(
      (1L, "a\nb\na\n\n\nc\nb"),
      (2L, "x\nx\nx"),
      (3L, "")
    ).toDF("doc_id", "text")
    val got = Dedup.dedupLinesInDoc(df, "text", "clean")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got(1L) == "a\nb\n\n\nc")
    assert(got(2L) == "x")
    assert(got(3L) == "")
  }

  test("is doc-local: identical lines in different docs both survive") {
    val df = Seq((1L, "dup\nother"), (2L, "dup\nmore")).toDF("doc_id", "text")
    val got = Dedup.dedupLinesInDoc(df, "text", "clean")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got(1L) == "dup\nother")
    assert(got(2L) == "dup\nmore")
  }
}

class SampleByBudgetSpec extends SparkSpec {
  import spark.implicits._

  test("admits docs in md5-rank order until each group's budget fills") {
    val df = (1L to 100L).map(i =>
      (i, if (i % 2 == 0) "a" else "b", 10L)).toDF("doc_id", "g", "cost")
    val got = Corpus.sampleByBudget(df, "doc_id", Seq("g"), "cost", 95L)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(3)))
    // 10 per group exactly (9×10 < 95 < 10×10 is false: 100 > 95 → 9 fit)
    val perGroup = got.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perGroup == Map("a" -> 9, "b" -> 9))
    // cum_cost strictly increasing within group, capped at the budget
    got.groupBy(_._1).values.foreach { rows =>
      val cums = rows.map(_._3).sorted.toSeq
      assert(cums == (1 to 9).map(_ * 10L))
    }
    // determinism: same keep set on a repartitioned input
    val again = Corpus.sampleByBudget(df.repartition(7), "doc_id",
        Seq("g"), "cost", 95L)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    assert(again == got.map(t => (t._1, t._2)).toSet)
  }

  test("rejects empty groupCols and non-positive budgets") {
    val df = Seq((1L, 5L)).toDF("doc_id", "cost")
    intercept[IllegalArgumentException] {
      Corpus.sampleByBudget(df, "doc_id", Nil, "cost", 10L)
    }
    intercept[IllegalArgumentException] {
      Corpus.sampleByBudget(df, "doc_id", Seq("doc_id"), "cost", 0L)
    }
  }
}

class CanonicalizeUrlSpec extends SparkSpec {
  import spark.implicits._

  test("lowercases scheme+host, strips www/query/fragment/trailing slash") {
    val got = Seq(
      "HTTPS://WWW.Host3.Example.COM/p/42/?ref=x#frag",
      "http://example.com/",
      "https://www.example.com",
      "ftp://Files.Example.com/a/b///",
      "not a url",
      "relative/path")
      .toDF("url")
      .select(Corpus.canonicalizeUrl(col("url")).as("c"))
      .collect().map(r => Option(r.getString(0)))
    assert(got(0).contains("https://host3.example.com/p/42"))
    assert(got(1).contains("http://example.com"))
    assert(got(2).contains("https://example.com"))
    assert(got(3).contains("ftp://files.example.com/a/b"))
    assert(got(4).isEmpty)
    assert(got(5).isEmpty)
  }

  test("null url stays null") {
    val got = Seq[Option[String]](None).toDF("url")
      .select(Corpus.canonicalizeUrl(col("url")).as("c"))
      .head()
    assert(got.isNullAt(0))
  }

  test("canonicalization is idempotent (canonical forms are fixed points)") {
    val urls = Seq(
      "HTTPS://WWW.Host3.Example.COM/p/42/?ref=x#frag",
      "http://example.com/",
      "ftp://Files.Example.com/a/b///",
      "https://www.example.com?q=1")
      .toDF("url")
    val once = urls.select(Corpus.canonicalizeUrl(col("url")).as("c"))
    val twice = once.select(Corpus.canonicalizeUrl(col("c")).as("c2"))
    assert(once.collect().map(_.getString(0)).toSeq ==
      twice.collect().map(_.getString(0)).toSeq)
  }
}

class NewOpsPropertySpec extends SparkSpec {
  import spark.implicits._

  test("dedupLinesInDoc is idempotent and only removes lines") {
    val texts = Seq(
      "a\nb\na\nb\nc", "x\nx", "", "one", "p\n\np\n\nq",
      "z\nz\nz\nz\nz\ny\nz")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val once = graft.text.Dedup.dedupLinesInDoc(df, "text", "clean")
      .select($"doc_id", $"clean".as("text"))
    val twice = graft.text.Dedup.dedupLinesInDoc(once, "text", "clean")
    val o = once.orderBy("doc_id").collect().map(_.getString(1)).toSeq
    val w = twice.orderBy("doc_id").collect().map(_.getString(2)).toSeq
    assert(o == w)
    // every kept non-blank line appeared in the input, multiset-bounded
    texts.zip(o).foreach { case (in, out) =>
      val inLines = in.split("\n", -1).toSeq
      val outLines = out.split("\n", -1).toSeq
      assert(outLines.filter(_.trim.nonEmpty).toSet subsetOf
        inLines.filter(_.trim.nonEmpty).toSet)
      assert(outLines.size <= inLines.size)
    }
  }

  test("sampleByBudget is monotone in budget and respects the cap") {
    val df = (1L to 60L).map(i => (i, s"g${i % 3}", 7L))
      .toDF("doc_id", "g", "cost")
    val small = graft.text.Corpus
      .sampleByBudget(df, "doc_id", Seq("g"), "cost", 50L)
      .collect().map(_.getLong(0)).toSet
    val big = graft.text.Corpus
      .sampleByBudget(df, "doc_id", Seq("g"), "cost", 120L)
      .collect().map(_.getLong(0)).toSet
    assert(small subsetOf big)
    val sums = graft.text.Corpus
      .sampleByBudget(df, "doc_id", Seq("g"), "cost", 50L)
      .groupBy("g").agg(sum("cost").as("s"))
      .collect().map(_.getLong(1))
    assert(sums.forall(_ <= 50L))
  }
}

/** Deterministic pseudonymization: equal values tokenize equally (stay
  * joinable), salts break linkage, the map relation round-trips. */
class PseudonymizeSpec extends SparkSpec {
  import spark.implicits._
  import graft.text.Corpus

  private val df = Seq((1L, "alice"), (2L, "bob"), (3L, "alice"),
    (4L, null)).toDF("id", "name")

  test("equal values get equal tokens; null stays null; salt matters") {
    val out = df.select(col("id"),
      Corpus.pseudonymize(col("name"), "name", "s1").as("t1"),
      Corpus.pseudonymize(col("name"), "name", "s2").as("t2")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(out(1L)._1 == out(3L)._1) // joinable
    assert(out(1L)._1 != out(2L)._1)
    assert(out(1L)._1 != out(1L)._2) // different salt, different token
    assert(out(4L)._1 == null)
    assert(out(1L)._1.matches("t_[0-9a-f]{16}"))
  }

  test("pseudonymMap round-trips tokens to values") {
    val m = Corpus.pseudonymMap(df, "name", "s1")
    assert(m.count() == 2) // distinct non-null values
    val joined = df.select(
        Corpus.pseudonymize(col("name"), "name", "s1").as("token"),
        col("name"))
      .join(m, "token")
    assert(joined.filter(col("name") =!= col("value")).isEmpty)
  }
}
