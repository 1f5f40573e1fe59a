package graft

import graft.text.Corpus
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("stratifiedSample keeps deterministic md5-based subsets per stratum") {
    val df = (0 until 2000).map(i => (i.toLong, if (i % 2 == 0) "en" else "zh"))
      .toDF("id", "lang")
    val s1 = Corpus.stratifiedSample(df, "id", "lang",
      Map("en" -> 0.5), 0.1).collect().map(r => r.getLong(0)).sorted.toSeq
    val s2 = Corpus.stratifiedSample(df, "id", "lang",
      Map("en" -> 0.5), 0.1).collect().map(r => r.getLong(0)).sorted.toSeq
    assert(s1 == s2, "sample must be reproducible run-to-run")
    val en = s1.count(_ % 2 == 0).toDouble / 1000
    val zh = s1.count(_ % 2 == 1).toDouble / 1000
    // md5 uniformity: binomial(1000, p) stays well within ±0.06 of p
    assert(math.abs(en - 0.5) < 0.06, s"en rate $en")
    assert(math.abs(zh - 0.1) < 0.06, s"zh rate $zh")
  }

  test("stratifiedSample of rate 0 and 1 strata") {
    val df = (0 until 100).map(i => (i.toLong, if (i < 50) "all" else "none"))
      .toDF("id", "lang")
    val out = Corpus.stratifiedSample(df, "id", "lang",
      Map("all" -> 1.0, "none" -> 0.0), 0.5).select("lang")
      .as[String].collect().toSeq
    assert(out.count(_ == "all") == 50 && !out.contains("none"))
  }

  test("trainTestSplit never splits a group across sides; partitions fully") {
    val df = (0 until 1000).map(i => (i.toLong, s"src${i % 40}"))
      .toDF("id", "src")
    val (train, test) = Corpus.trainTestSplit(df, "src", 0.25)
    val trainSrcs = train.select("src").distinct().as[String].collect().toSet
    val testSrcs = test.select("src").distinct().as[String].collect().toSet
    assert((trainSrcs & testSrcs).isEmpty, "a group straddles the split")
    assert(train.count() + test.count() == 1000)
    // label form agrees with the frame form
    val labeled = df.withColumn("split", Corpus.splitLabel(col("src"), 0.25))
    assert(labeled.filter(col("split") === "test").count() == test.count())
    // 40 groups at 0.25: the test side is populated (p(empty) ~ 1e-5)
    assert(testSrcs.nonEmpty && trainSrcs.nonEmpty)
  }

  test("null group keys land in train (not dropped), both split forms agree") {
    val df = Seq((1L, "a"), (2L, null.asInstanceOf[String]), (3L, "b"))
      .toDF("id", "src")
    val (train, test) = Corpus.trainTestSplit(df, "src", 0.5)
    assert(train.count() + test.count() == 3, "a null-keyed row was dropped")
    val labeled = df.withColumn("s", Corpus.splitLabel(col("src"), 0.5))
    assert(labeled.filter(col("src").isNull).select("s")
      .as[String].head() == "train")
    assert(train.filter(col("src").isNull).count() == 1)
  }

  test("chunk windows with overlap, short docs, and empty text") {
    val df = Seq(
      (1L, "a b c d e f g h i j"), // 10 tokens, chunk 4 overlap 1 → step 3
      (2L, "x y"),                 // shorter than one chunk
      (3L, "")                     // empty text → one empty chunk
    ).toDF("id", "text")
    val out = Corpus.chunk(df, "text", "id", chunkTokens = 4, overlap = 1)
      .orderBy("id", "chunk_index")
      .select("id", "chunk_index", "chunk_text", "chunk_tokens")
      .as[(Long, Int, String, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 0, "a b c d", 4L), (1L, 1, "d e f g", 4L), (1L, 2, "g h i j", 4L),
      (1L, 3, "j", 1L),
      (2L, 0, "x y", 2L),
      (3L, 0, "", 1L)))
  }

  test("chunk rejects overlap >= chunkTokens") {
    val df = Seq((1L, "a b")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      Corpus.chunk(df, "text", "id", chunkTokens = 3, overlap = 3)
    }
  }

  test("int8 quantize: bounded error, clamp range, zero-vector identity") {
    import graft.sim.Quantize._
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)), // zero vector
      (3L, Array(100.0f, -100.0f, 1.0f, 0.003f))
    ).toDF("id", "v")
      .withColumn("scale", int8Scale(col("v")))
      .withColumn("q", int8Quantize(col("v"), col("scale")))
      .withColumn("err", maxAbsError(col("v"), col("q"), col("scale")))
      .withColumn("back", int8Dequantize(col("q"), col("scale")))
    val rows = df.orderBy("id").collect()
    // row 1: scale = 1/127; q = round(x*127)
    assert(rows(0).getSeq[Byte](3) == Seq[Byte](64, -127, 32, 0))
    // zero vector: scale 0, all-zero q, zero error
    assert(rows(1).getDouble(2) == 0.0)
    assert(rows(1).getSeq[Byte](3).forall(_ == 0))
    assert(rows(1).getDouble(4) == 0.0)
    // error bound: |x - deq| <= scale/2 everywhere
    rows.foreach { r =>
      assert(r.getDouble(4) <= r.getDouble(2) / 2 + 1e-12,
        s"err ${r.getDouble(4)} vs scale ${r.getDouble(2)}")
    }
    // every quantized value within int8 symmetric range
    assert(rows.flatMap(_.getSeq[Byte](3)).forall(b => b >= -127 && b <= 127))
  }

  test("contamination finds shared-shingle pairs, counts distinct shingles") {
    val train = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"), // shares 5-grams w/ b1
      (101L, "totally unrelated words here nothing shared"),
      (102L, "alpha beta gamma delta epsilon")       // exactly one 5-gram
    ).toDF("id", "text")
    val bench = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "other eval content entirely")).toDF("id", "text")
    val out = Corpus.contamination(train, "text", "id", bench, "text", "id",
      k = 5).orderBy("id", "bench_id")
      .as[(Long, Long, Long)].collect().toSeq
    // 100 shares both 5-grams of b1; 102 shares the first one only
    assert(out == Seq((100L, 1L, 2L), (102L, 1L, 1L)))
  }

  test("redact replaces urls, emails, phones, and IPs in order") {
    val df = Seq(
      "mail me at first.last+tag@sub.example.co.uk today",
      "call (555) 123-4567 or 555-987-6543",
      "host 192.168.0.1 port 80",
      "see https://a.b/c?d=e@f and http://plain.example",
      "no pii here, just 1.5 and v2.0 and 1.2.3.4.5"
    ).toDF("t")
    val out = df.select(Corpus.redact(col("t")).as("r"))
      .as[String].collect().toSeq
    assert(out(0) == "mail me at [EMAIL] today")
    assert(out(1) == "call [PHONE] or [PHONE]")
    assert(out(2) == "host [IP] port 80")
    // URL pass runs first, so the @ inside the URL never becomes [EMAIL]
    assert(out(3) == "see [URL] and [URL]")
    // version-ish numbers survive; 5-part dotted quads: the first 4 parts
    // match the IPv4 pattern (documented greedy behavior)
    assert(out(4) == "no pii here, just 1.5 and v2.0 and [IP].5")
  }

  test("ngramDiversity: counts match the literal sliding-window sets; " +
      "a templated slice scores lower than a diverse one") {
    import spark.implicits._
    val docs = Seq(
      ("div", "the quick brown fox jumps over the lazy dog"),
      ("div", "pack my box with five dozen liquor jugs"),
      ("tpl", "click here click here click here click here"),
      ("tpl", "click here click here click here"))
    val got = graft.text.Corpus.ngramDiversity(
      docs.toDF("source", "text"), "text", "source")
      .collect()
      .map(r => ((r.getString(0), r.getInt(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    def grams(s: Seq[String], texts: Seq[String], n: Int) = {
      val all = texts.flatMap(t =>
        t.toLowerCase.trim.split("\\s+").toSeq.sliding(n).toSeq
          .filter(_.size == n).map(_.mkString(" ")))
      (all.size.toLong, all.distinct.size.toLong)
    }
    for (src <- Seq("div", "tpl"); n <- 1 to 3) {
      val texts = docs.filter(_._1 == src).map(_._2)
      val (tot, dist) = grams(Nil, texts, n)
      val (gt, gd, ratio) = got((src, n))
      assert(gt == tot && gd == dist, s"$src n=$n: ($gt,$gd) vs ($tot,$dist)")
      assert(ratio == BigDecimal(dist.toDouble / tot)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(got(("tpl", 2))._3 < 0.3 && got(("div", 2))._3 == 1.0)
  }

  test("ngramDiversity: the fast structural-hash default and the " +
      "portable md5 oracle variant count identical distinct sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(21)
    val docs = (1 to 60).map { i =>
      (s"s${i % 3}", (1 to 30).map(_ =>
        s"w${rnd.nextInt(40)}").mkString(" "))
    }
    val df = docs.toDF("source", "text")
    def rows(portable: Boolean) =
      graft.text.Corpus.ngramDiversity(df, "text", "source",
        portableHash = portable).collect()
        .map(r => ((r.getString(0), r.getInt(1)),
          (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(rows(portable = false) == rows(portable = true))
  }
}
