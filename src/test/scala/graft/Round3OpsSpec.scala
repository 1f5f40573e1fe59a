package graft

import graft.relational.Relational
import graft.streaming.Streaming
import graft.text.{Corpus, Dedup, TextFunctions}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Round-3 operators: sessionization, interval (range) join, weighted
  * corpus mixing, repeated-span detection, duplicate-cluster components,
  * repetition-quality signals, and the streaming as-of join. */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("gap > 30 min opens a new session; ties never split") {
    val us = 1000000L
    val df = Seq(
      // user 1: events at 0s, 10s, same-ts tie, 2000s (gap>1800), 2100s
      (1L, 0L * us, 10L), (1L, 10L * us, 11L), (1L, 10L * us, 12L),
      (1L, 2000L * us, 13L), (1L, 2100L * us, 14L),
      // user 2: single event
      (2L, 5L * us, 20L))
      .toDF("user_id", "ts_us", "event_id")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val out = Relational.sessionize(df, Seq("user_id"), "ts", "event_id",
      gapSeconds = 1800L)
    val got = out.select("event_id", "session_index").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(10L -> 0L, 11L -> 0L, 12L -> 0L, 13L -> 1L,
      14L -> 1L, 20L -> 0L))
  }

  test("exactly-at-gap boundary stays in the session (strict >)") {
    val us = 1000000L
    val df = Seq((1L, 0L * us, 1L), (1L, 1800L * us, 2L))
      .toDF("user_id", "ts_us", "event_id")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val out = Relational.sessionize(df, Seq("user_id"), "ts", "event_id", 1800L)
    assert(out.select("session_index").collect().map(_.getLong(0)).toSet
      == Set(0L))
  }
}

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("binned interval join equals the brute-force inequality join") {
    val left = Seq((1L, 100L, 1000L), (1L, 101L, 5000L), (2L, 102L, 1000L))
      .toDF("user_id", "p_id", "p_ts_us")
    val right = Seq(
      (1L, 201L, 900L), (1L, 202L, 1000L), (1L, 203L, 4500L),
      (1L, 204L, 6000L), (2L, 205L, 100L), (3L, 206L, 1000L))
      .toDF("user_id", "c_id", "c_ts_us")
    val out = Relational.rangeJoin(left, right, "p_ts_us", "c_ts_us",
      Seq("user_id"), lowerUs = -500L, upperUs = 0L,
      rightCols = Seq("c_id"))
    val got = out.select("p_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: c_ts in [p_ts-500, p_ts], same user
    val expected = Set((100L, 201L), (100L, 202L), (101L, 203L))
    assert(got == expected)

    val brute = left.join(right, "user_id")
      .filter(col("c_ts_us").between(col("p_ts_us") - 500, col("p_ts_us")))
      .select("p_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute)
  }

  test("bin-boundary values match (exact long binning)") {
    // window width 1000; right ts exactly at left+upper and left+lower
    val left = Seq((1L, 1L, 10000L)).toDF("k", "p_id", "lts")
    val right = Seq((1L, 2L, 9000L), (1L, 3L, 10000L), (1L, 4L, 8999L),
      (1L, 5L, 10001L)).toDF("k", "c_id", "rts")
    val out = Relational.rangeJoin(left, right, "lts", "rts", Seq("k"),
      -1000L, 0L, Seq("c_id"))
    assert(out.select("c_id").collect().map(_.getLong(0)).toSet
      == Set(2L, 3L))
  }

  test("no broadcast-nested-loop in the plan") {
    val left = Seq((1L, 1L, 10000L)).toDF("k", "p_id", "lts")
    val right = Seq((1L, 2L, 9000L)).toDF("k", "c_id", "rts")
    val plan = Relational.rangeJoin(left, right, "lts", "rts", Seq("k"),
      -1000L, 0L, Seq("c_id")).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}

class MixSourcesSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (0L until 400L).map(i =>
    (i, if (i % 2 == 0) "en" else "de")).toDF("id", "src")

  test("integer weights repeat rows exactly") {
    val out = Corpus.mixSources(docs, "id", "src",
      Map("en" -> 3.0, "de" -> 1.0), 1.0)
    val bySrc = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc == Map("en" -> 600L, "de" -> 200L))
    // copy ids are 0..2 per en row
    assert(out.filter(col("src") === "en").groupBy("id").count()
      .select("count").distinct().collect().map(_.getLong(0)).toSeq
      == Seq(3L))
  }

  test("fractional weights land near the expectation, deterministically") {
    val out = Corpus.mixSources(docs, "id", "src",
      Map("en" -> 2.5, "de" -> 0.5), 1.0)
    val n = out.filter(col("src") === "en").count()
    // 200 en docs × 2.5 = 500 expected; md5 uniformity keeps it close
    assert(n > 450 && n < 550, s"en rows $n")
    val n2 = Corpus.mixSources(docs, "id", "src",
      Map("en" -> 2.5, "de" -> 0.5), 1.0)
      .filter(col("src") === "en").count()
    assert(n == n2, "mixing must be deterministic")
  }

  test("weight 0 drops the stratum") {
    val out = Corpus.mixSources(docs, "id", "src", Map("de" -> 0.0), 1.0)
    assert(out.filter(col("src") === "de").count() == 0)
    assert(out.filter(col("src") === "en").count() == 200)
  }
}

class ShardBySpec extends SparkSpec {
  import spark.implicits._

  test("shards are deterministic, in range, and roughly balanced") {
    val docs = (0L until 4000L).map(i => Tuple1(i)).toDF("id")
    val a = Corpus.shardBy(docs, "id", 8)
    val sizes = a.groupBy("shard_id").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == (0 until 8).toSet)
    // 4000/8 = 500 expected; md5 uniformity keeps each within ±25%
    sizes.values.foreach(n => assert(n > 375 && n < 625, s"shard size $n"))
    val b = Corpus.shardBy(docs, "id", 8)
    assert(a.exceptAll(b).isEmpty, "sharding must replay identically")
    // the within-shard rank is independent of the shard hash: ranks of
    // shard 0 span (0,1) rather than clustering in [0, 1/8)
    val ranks = a.filter($"shard_id" === 0).select("shard_rank")
      .collect().map(_.getDouble(0))
    assert(ranks.max > 0.8 && ranks.min < 0.2)
  }
}

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  test("shared 5-gram spans are found; unique docs score 0") {
    val boiler = "all rights reserved contact the publisher for details"
    val docs = Seq(
      (1L, s"alpha beta gamma delta epsilon zeta. $boiler"),
      (2L, s"one two three four five six seven. $boiler"),
      (3L, "completely unique text with no shared spans at all ok"),
      (4L, "tiny"))
      .toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(docs, "text", "doc_id", k = 5, minDocs = 2)
    val rows = out.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 4 has < 5 tokens → absent
    assert(!rows.contains(4L))
    assert(rows(3L)._2 == 0L)
    // the 8-token boilerplate yields 4 shared 5-grams... but sentence glue
    // creates grams spanning the '.'-joined boundary too — so assert ≥4
    assert(rows(1L)._2 >= 4L && rows(2L)._2 >= 4L)
    val fracs = out.filter(col("doc_id") === 3L)
      .select("dup_frac").head().getDouble(0)
    assert(fracs == 0.0)
  }
}

class SpanRemovalSpec extends SparkSpec {
  import spark.implicits._

  test("later docs lose spans the earliest doc owns; owner keeps its copy") {
    val boiler = "All Rights Reserved Contact The Publisher"  // 6 tokens
    val docs = Seq(
      (1L, s"alpha beta gamma. $boiler"),
      (2L, s"one two three four five. $boiler and more"),
      (3L, "totally unique text"))
      .toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(docs, "text", "doc_id", k = 5)
    val m = out.collect().map(r =>
      r.getLong(0) -> (r.getString(1), r.getLong(3))).toMap
    // doc 1 owns every gram it has → untouched
    assert(m(1L)._1 == s"alpha beta gamma. $boiler" && m(1L)._2 == 0L)
    // doc 3 shares nothing → untouched (and < 5 tokens anyway)
    assert(m(3L)._1 == "totally unique text" && m(3L)._2 == 0L)
    // doc 2 loses the boilerplate span (and overlapping-gram-covered
    // neighbors), keeps its own prefix
    assert(m(2L)._1.startsWith("one two three four five."))
    assert(m(2L)._1 == "one two three four five. and more")
    assert(m(2L)._2 == 6L)
  }

  test("case-insensitive matching, original case preserved") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over it"),
      (2L, "intro words THE QUICK BROWN FOX JUMPS tail"))
      .toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(docs, "text", "doc_id", k = 5)
    val m = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(2L) == "intro words tail")
    assert(m(1L) == "the quick brown fox jumps over it")
  }
}

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("transitive clusters collapse to min-id components") {
    // clusters {1,2,3} (chain), {7,8}, pair list never links 1-3 directly
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val got = Dedup.duplicateComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("long chain converges (diameter > 2 rounds)") {
    val pairs = (0L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.duplicateComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(0L) && got.size == 13)
  }

  test("self-pairs are ignored identically on both paths") {
    val pairs = Seq((5L, 5L), (1L, 2L)).toDF("id_a", "id_b")
    val small = Dedup.duplicateComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.duplicateComponents(pairs, maxCollect = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(small == Map(1L -> 1L, 2L -> 1L))
    assert(small == dist)
  }

  test("distributed path (maxCollect = 0) agrees with driver union-find") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L), (9L, 10L), (10L, 11L))
      .toDF("id_a", "id_b")
    val small = Dedup.duplicateComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.duplicateComponents(pairs, maxCollect = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(small == dist)
    assert(small == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L,
      9L -> 9L, 10L -> 9L, 11L -> 9L))
  }
}

class QualityRepSpec extends SparkSpec {
  import spark.implicits._

  test("repetition signals: ttr, top-token fraction, duplicate sentences") {
    val df = Seq(
      (1L, "spam spam spam spam"),
      (2L, "all words here are different okay"),
      (3L, "Buy now. Buy now. Totally new offer."),
      (4L, ""))
      .toDF("doc_id", "text")
      .withColumn("__t", TextFunctions.tokensLower(col("text")))
      .select(col("doc_id"),
        TextFunctions.typeTokenRatioT(col("__t")).as("ttr"),
        TextFunctions.topTokenFracT(col("__t")).as("ttf"),
        TextFunctions.dupSentenceFrac(col("text")).as("dsf"))
    val m = df.collect().map(r =>
      r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(m(1L)._1 == 0.25 && m(1L)._2 == 1.0)
    assert(m(2L)._1 == 1.0)
    assert(math.abs(m(2L)._2 - 1.0 / 6.0) < 1e-12)
    // "Buy now" duplicated: 3 sentences, 2 distinct → 1/3
    assert(math.abs(m(3L)._3 - 1.0 / 3.0) < 1e-12)
    // empty text: split yields [""] → filtered to empty → all zeros...
    // except ttr/ttf see one empty token from split("") = [""]
    assert(m(4L)._3 == 0.0)
  }
}

class RangeJoinStreamSpec extends SparkSpec {
  import spark.implicits._

  test("native stream-stream interval join equals the batch rangeJoin") {
    val us = 1000000L
    val rows = Seq(
      // user 1: clicks at 0s, 30s, purchase at 40s (lookback 60s: both),
      // click at 200s (outside any purchase window)
      (1L, 0L, "click", 10L), (1L, 30L, "click", 11L),
      (1L, 40L, "purchase", 12L), (1L, 200L, "click", 13L),
      // user 2: purchase with no prior click
      (2L, 50L, "purchase", 20L))
    val dir = "target/tmp/range_join_stream"
    rows.toDF("user_id", "sec", "event_type", "event_id")
      // modern base: second 0 would sit exactly on the initial watermark
      .withColumn("ts", timestamp_micros((col("sec") + 1000000000L) * us))
      .drop("sec")
      .write.mode("overwrite").parquet(dir)
    val batch = spark.read.parquet(dir)
    val stream = spark.readStream.schema(batch.schema).parquet(dir)

    def purchases(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"),
          col("event_id").as("p_id"))
    def clicks(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("c_ts"),
          col("event_id").as("c_id"))

    val q = Streaming.rangeJoinStream(
        purchases(stream), "p_ts", clicks(stream), "c_ts",
        Seq("user_id"), lookbackSec = 60L)
      .select("p_id", "c_id")
      .writeStream.outputMode("append").format("memory")
      .queryName("rj_out").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("rj_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((12L, 10L), (12L, 11L)))

    val b = relational.Relational.rangeJoin(
      purchases(batch).withColumn("p_us", unix_micros(col("p_ts"))),
      clicks(batch).withColumn("c_us", unix_micros(col("c_ts")))
        .drop("c_ts"),
      "p_us", "c_us", Seq("user_id"), -60L * us, 0L, Seq("c_id"))
      .select("p_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == b)
  }
}

class WinsorizerSpec extends SparkSpec {
  import spark.implicits._

  test("clips to exact percentiles; nulls pass through") {
    // 0..100: p10 = 10.0, p90 = 90.0 exactly (index = p*(n-1) integral)
    val df = ((0 to 100).map(i => (i.toLong, Some(i.toDouble))) :+
      (999L, Option.empty[Double]))
      .toDF("row_id", "v")
    val m = new operators.Winsorizer(Seq("v"), Seq("w"), 0.1, 0.9).fit(df)
    val out = m.transform(df)
    assert(colOf(out.filter($"row_id" === 0L), "w") == Seq(10.0))
    assert(colOf(out.filter($"row_id" === 100L), "w") == Seq(90.0))
    assert(colOf(out.filter($"row_id" === 50L), "w") == Seq(50.0))
    assert(colOf(out.filter($"row_id" === 999L), "w") == Seq(null))
  }

  test("persistence round trip") {
    val df = (0 to 100).map(i => (i.toLong, i.toDouble)).toDF("row_id", "v")
    val model = operators.DFPipeline(
      new operators.Winsorizer(Seq("v"), Seq("w"), 0.1, 0.9)).fit(df)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_winsor").toString
    operators.GraftPersistence.save(model, dir)
    val re = operators.GraftPersistence.load(spark, dir)
    assert(rowsOf(re.transform(df), "w") == rowsOf(model.transform(df), "w"))
  }

  test("fuses with Scaler into one scalar fit (results unchanged)") {
    val df = (0 to 100).map(i => (i.toLong, i.toDouble)).toDF("row_id", "v")
    val stages = () => Seq(
      new operators.Winsorizer(Seq("v"), Seq("w"), 0.1, 0.9),
      new operators.Scaler(Seq("v"), Seq("s"), "standard"))
    val fused = operators.DFPipeline(stages(): _*).fit(df).transform(df)
    val seq = stages().foldLeft(df)((d, e) => e.fit(d).transform(d))
    assert(rowsOf(fused, "w", "s") == rowsOf(seq, "w", "s"))
  }
}

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("histogram-narrowing quantiles == Spark exact percentile") {
    val rnd = new scala.util.Random(7L)
    // duplicates, negatives, a null, and skew — interpolation edges
    val vals = (1 to 3000).map(_ => math.floor(rnd.nextGaussian() * 50) / 7.0)
    val df = vals.zipWithIndex
      .map { case (v, i) => (i.toLong, Some(v)) }
      .++(Seq((99999L, Option.empty[Double])))
      .toDF("row_id", "v")
    val ps = Seq(0.0, 0.01, 0.25, 0.5, 0.9, 0.99, 1.0)
    val got = operators.ExactStats
      .quantiles(df, Seq("v"), ps, buckets = 16, collectThreshold = 10L)
      .head.map(_.get)
    val expected = df
      .agg(percentile(col("v"), typedlit(ps.toArray)))
      .head().getSeq[Double](0)
    got.zip(expected).zip(ps).foreach { case ((g, e), p) =>
      assert(math.abs(g - e) < 1e-12, s"p=$p: $g vs $e")
    }
  }

  test("distributed Winsorizer bounds == sort-based bounds, end to end") {
    val df = (1 to 500).map(i => (i.toLong, (i % 97).toDouble))
      .toDF("row_id", "v")
    val a = new operators.Winsorizer(Seq("v"), Seq("w"), 0.05, 0.95)
      .fit(df)
    val b = new operators.Winsorizer(Seq("v"), Seq("w"), 0.05, 0.95,
      distributedPercentiles = true).fit(df)
    assert(a.bounds == b.bounds)
    assert(rowsOf(a.transform(df), "w") == rowsOf(b.transform(df), "w"))
  }
}

class RollingAggSpec extends SparkSpec {
  import spark.implicits._

  test("rolling-3 mean per key, short prefixes use what exists") {
    val df = Seq((1L, 1L, 10.0), (1L, 2L, 20.0), (1L, 3L, 30.0),
      (1L, 4L, 40.0), (2L, 5L, 100.0))
      .toDF("k", "id", "v")
    val out = relational.Relational.rollingAgg(df, Seq("k"), "id", "id",
      "v", n = 3, func = "mean", out = "rm")
    val got = out.select("id", "rm").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 10.0, 2L -> 15.0, 3L -> 20.0, 4L -> 30.0,
      5L -> 100.0))
  }
}

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  test("term-bearing docs outrank term-free docs; rare terms outweigh") {
    val df = Seq(
      (1L, "data data data pipeline"),
      (2L, "the the the the"),
      (3L, "nothing relevant here at all"),
      (4L, "data model"))
      .toDF("doc_id", "text")
    val out = text.Ranking.bm25(df, "text", "doc_id", Seq("data", "model"))
    val s = out.select("doc_id", "bm25").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s(3L) == 0.0 && s(2L) == 0.0)
    assert(s(1L) > 0.0 && s(4L) > 0.0)
    // doc 4 carries the rarer 'model' term too → must outrank doc 1's
    // saturated tf on 'data' alone
    assert(s(4L) > s(1L))
  }

  test("empty corpus yields an empty scored frame (no NPE)") {
    val df = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(text.Ranking.bm25(df, "text", "doc_id", Seq("data")).count() == 0)
  }

  test("unigram log-prob: corpus-typical docs outscore rare-token docs") {
    val df = Seq(
      (1L, "common common common"),
      (2L, "common rare"),
      (3L, "unique1 unique2"))
      .toDF("doc_id", "text")
    val m = text.Ranking.unigramLogProb(df, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // corpus: common x4, rare x1, unique1 x1, unique2 x1; total 7
    val (p4, p1) = (math.log(4.0 / 7), math.log(1.0 / 7))
    assert(m(1L)._1 == 3L && math.abs(m(1L)._2 - p4) < 1e-12)
    assert(math.abs(m(2L)._2 - (p4 + p1) / 2) < 1e-12)
    assert(math.abs(m(3L)._2 - p1) < 1e-12)
    assert(m(1L)._2 > m(2L)._2 && m(2L)._2 > m(3L)._2)
  }
}

class SessionizeStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming sessionization matches batch across micro-batches") {
    implicit val ctx = spark.sqlContext
    val us = 1000000L
    val ms = MemoryStream[Streaming.SessionEvent]
    val q = Streaming.sessionizeStream(ms.toDS(), gapSeconds = 1800L)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_s").start()
    try {
      ms.addData(
        Streaming.SessionEvent(1L, 0L, 1L),
        Streaming.SessionEvent(1L, 10L * us, 2L))
      q.processAllAvailable()
      // session split lands ACROSS the batch boundary (state carries)
      ms.addData(
        Streaming.SessionEvent(1L, 2000L * us, 3L),
        Streaming.SessionEvent(2L, 0L, 4L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sess_s")
      .select("event_id", "session_index").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 0L))

    val batch = relational.Relational.sessionize(
      Seq((1L, 0L, 1L), (1L, 10L * us, 2L), (1L, 2000L * us, 3L),
        (2L, 0L, 4L))
        .toDF("user_id", "ts_us", "event_id")
        .withColumn("ts", timestamp_micros(col("ts_us"))),
      Seq("user_id"), "ts", "event_id", 1800L)
      .select("event_id", "session_index").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == batch)
  }
}

class AsofStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming as-of matches batch asofJoin when arrival follows time") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Streaming.TaggedEvent]
    val q = Streaming.asofStream(ms.toDS()).writeStream
      .outputMode("append").format("memory").queryName("asof_s").start()
    try {
      // batch 1: user 1 clicks at 100, 200; purchase at 150
      ms.addData(
        Streaming.TaggedEvent(1L, 100L, true, 10.0, 900L),
        Streaming.TaggedEvent(1L, 150L, false, 0.0, 1L),
        Streaming.TaggedEvent(1L, 200L, true, 20.0, 901L))
      q.processAllAvailable()
      // batch 2: purchase at 210 (matches click 200 from PREVIOUS batch —
      // state carried); user 2 purchase with no clicks at all
      ms.addData(
        Streaming.TaggedEvent(1L, 210L, false, 0.0, 2L),
        Streaming.TaggedEvent(2L, 500L, false, 0.0, 3L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("asof_s")
      .select("event_id", "right_value", "right_ts_us").collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Double]),
         Option(r.get(2)).map(_.asInstanceOf[Long]))).toMap
    assert(got == Map(
      1L -> (Some(10.0), Some(100L)),
      2L -> (Some(20.0), Some(200L)),
      3L -> (None, None)))
  }

  test("equal-ts right matches its left (ASOF tie rule)") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Streaming.TaggedEvent]
    val q = Streaming.asofStream(ms.toDS()).writeStream
      .outputMode("append").format("memory").queryName("asof_tie").start()
    try {
      ms.addData(
        Streaming.TaggedEvent(1L, 100L, false, 0.0, 1L),
        Streaming.TaggedEvent(1L, 100L, true, 42.0, 902L))
      q.processAllAvailable()
    } finally q.stop()
    val r = spark.table("asof_tie").select("right_value").head()
    assert(r.getDouble(0) == 42.0)
  }
}
