package graft

import org.apache.spark.sql.functions._

import graft.text.Corpus

class SampleWeightedSpec extends SparkSpec {
  import spark.implicits._

  test("exactly n rows; selection replays identically across runs") {
    val df = (1L to 500L).map(i => (i, (i % 7 + 1).toDouble))
      .toDF("id", "w")
    val a = Corpus.sampleWeighted(df, "id", "w", 50)
      .collect().map(_.getLong(0)).toSet
    val b = Corpus.sampleWeighted(df.repartition(7), "id", "w", 50)
      .collect().map(_.getLong(0)).toSet
    assert(a.size == 50 && a == b)
  }

  test("weight-proportional: heavy rows oversampled vs light rows") {
    // half the ids weight 100, half weight 1 -> the sample should be
    // dominated by heavy ids (E[heavy share] ~ 99%)
    val df = (1L to 2000L).map(i =>
        (i, if (i % 2 == 0) 100.0 else 1.0)).toDF("id", "w")
    val got = Corpus.sampleWeighted(df, "id", "w", 200)
      .collect().map(_.getLong(0))
    val heavy = got.count(_ % 2 == 0)
    assert(heavy > 170, s"heavy=$heavy of 200")
  }

  test("null / non-positive weights excluded; keeps all columns") {
    val df = Seq((1L, Some(2.0), "a"), (2L, None, "b"),
      (3L, Some(0.0), "c"), (4L, Some(-1.0), "d"), (5L, Some(1.0), "e"))
      .toDF("id", "w", "payload")
    val got = Corpus.sampleWeighted(df, "id", "w", 10)
    assert(got.columns.toSeq == Seq("id", "w", "payload"))
    assert(got.collect().map(_.getLong(0)).toSet == Set(1L, 5L))
  }
}

class TemperatureSampleSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = ((1L to 1000L).map(i => (i, "big")) ++
    (1001L to 1100L).map(i => (i, "small"))).toDF("id", "g")

  test("alpha=0.5: kept counts scale ~ sqrt; smallest group keeps all") {
    val got = Corpus.temperatureSample(corpus, "g", "id", 0.5)
      .groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("small") == 100L, "anchor group keeps everything")
    // expected big ~ 1000 * sqrt(100/1000) = 316; allow wide band
    assert(got("big") > 230 && got("big") < 410, s"big=${got("big")}")
  }

  test("alpha=1 keeps everything; alpha=0 equalizes toward n_min") {
    val all = Corpus.temperatureSample(corpus, "g", "id", 1.0).count()
    assert(all == 1100L)
    val eq = Corpus.temperatureSample(corpus, "g", "id", 0.0)
      .groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(eq("small") == 100L)
    // big keeps ~ n_min = 100 in expectation
    assert(eq("big") > 60 && eq("big") < 145, s"big=${eq("big")}")
  }

  test("deterministic under repartitioning") {
    val a = Corpus.temperatureSample(corpus, "g", "id", 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Corpus.temperatureSample(corpus.repartition(13), "g", "id", 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }
}

class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  test("df counts distinct docs; postings are lowest ids, capped, sorted") {
    val df = Seq(
      (3L, "apple banana apple"),   // apple counted once for doc 3
      (1L, "apple cherry"),
      (2L, "apple banana"),
      (4L, "Apple")                 // lowercased
    ).toDF("doc_id", "text")
    val got = Corpus.invertedIndex(df, "doc_id", "text",
        minDf = 1, maxPostings = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getString(2)))).toMap
    assert(got("apple") == ((4L, "1 2")), "capped at 2 lowest ids")
    assert(got("banana") == ((2L, "2 3")))
    assert(got("cherry") == ((1L, "1")))
  }

  test("minDf drops tail terms; empty text contributes nothing") {
    val df = Seq((1L, "x y"), (2L, "x"), (3L, "")).toDF("doc_id", "text")
    val got = Corpus.invertedIndex(df, "doc_id", "text",
        minDf = 2, maxPostings = 10)
      .collect().map(_.getString(0)).toSet
    assert(got == Set("x"))
  }
}
