package graft

import graft.operators._
import graft.streaming.Streaming
import org.apache.spark.sql.functions._

/** Structured-Streaming behavior: the same fitted pipeline scores a stream,
  * and windowed aggregates match their batch equivalents (memory sink +
  * processAllAvailable drives parquet as a synchronous stream). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  // The driver's events.parquet carries TIMESTAMP(NANOS), which the batch
  // reader accepts but the streaming parquet source rejects — re-write with
  // µs timestamps for the streaming suite.
  private lazy val streamDir: String = {
    val out = "target/tmp/events_us"
    DataQueries.readEvents(spark, dir)
      .write.mode("overwrite").parquet(out)
    out
  }
  private lazy val batchEvents = spark.read.parquet(streamDir)

  test("windowed stats on a stream equal the batch plan") {
    val stream = spark.readStream.schema(batchEvents.schema)
      .parquet(streamDir)
    val q = Streaming.windowedStats(stream).writeStream
      .outputMode("complete").format("memory").queryName("win_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("win_out")
      .select("window_start", "event_type", "n_events")
    val batch = Streaming.windowedStats(batchEvents)
      .select("window_start", "event_type", "n_events")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    assert(batch.count() > 0)
  }

  test("Corpus ops (redact/chunk/sample) run unchanged on a stream") {
    // all three are stateless narrow expressions, so the same code drives
    // batch and streaming; md5 sampling is retry-stable by construction
    val docsDir = "target/tmp/docs_stream"
    spark.read.parquet(s"$dir/documents.parquet")
      .write.mode("overwrite").parquet(docsDir)
    val batchDocs = spark.read.parquet(docsDir)
    val stream = spark.readStream.schema(batchDocs.schema).parquet(docsDir)

    def pipe(df: org.apache.spark.sql.DataFrame) =
      graft.text.Corpus.chunk(
        graft.text.Corpus.stratifiedSample(df, "doc_id", "lang",
          Map("en" -> 0.5), 0.2)
          .withColumn("text", graft.text.Corpus.redact(col("text"))),
        "text", "doc_id", chunkTokens = 64, overlap = 0)

    val q = pipe(stream).writeStream.outputMode("append")
      .format("memory").queryName("corpus_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("corpus_out")
    val batch = pipe(batchDocs)
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty)
    assert(batch.count() > 0)
  }

  test("a fitted pipeline scores a stream statelessly") {
    val model = DFPipeline(
      new ComplementLabelEncoder(Seq("event_type"), Seq("type_code")),
      new FrequencyEncoder(Seq("event_type"), Seq("type_freq"),
        normalize = true)).fit(batchEvents)
    val stream = spark.readStream.schema(batchEvents.schema)
      .parquet(streamDir)
    val q = Streaming.score(model, stream).writeStream
      .outputMode("append").format("memory").queryName("score_out").start()
    try q.processAllAvailable() finally q.stop()
    val scored = spark.table("score_out")
    val batchScored = model.transform(batchEvents)
    assert(scored.count() == batchEvents.count())
    assert(scored.select("event_id", "type_code", "type_freq")
      .exceptAll(batchScored.select("event_id", "type_code", "type_freq"))
      .isEmpty)
  }

  test("frozen transform-time-stat operators score a stream") {
    import graft.operators.{Imputer, MinorityTransformer, RangeTransformer}
    val train = batchEvents
      .withColumn("v_n", when(col("value") < 0, lit(null))
        .otherwise(col("value")))
    val frozenImp = new Imputer(Seq("v_n"), Seq("v_filled"), Some("mean"))
      .freeze(train)
    val frozenMin = new MinorityTransformer(Seq("event_type"), Seq("et2"),
      2, "rare").freeze(train)
    val frozenRange = new RangeTransformer(Seq("value"), Seq("v_r"),
      Seq(((Some(100.0), Some(0.0)), "mean"))).freeze(train)
    val stream = spark.readStream.schema(batchEvents.schema)
      .parquet(streamDir)
      .withColumn("v_n", when(col("value") < 0, lit(null))
        .otherwise(col("value")))
    val scored = frozenRange.transform(
      frozenMin.transform(frozenImp.transform(stream)))
    val q = scored.writeStream.outputMode("append")
      .format("memory").queryName("frozen_out").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("frozen_out")
    val batchRef = frozenRange.transform(
      frozenMin.transform(frozenImp.transform(train)))
    assert(got.count() == batchEvents.count())
    assert(got.select("event_id", "v_filled", "et2", "v_r")
      .exceptAll(batchRef.select("event_id", "v_filled", "et2", "v_r"))
      .isEmpty)
  }

  test("streaming exact dedup matches the batch distinct set") {
    val stream = spark.readStream.schema(batchEvents.schema)
      .parquet(streamDir)
    val q = Streaming.dedupExact(stream, "props", "ts",
      watermark = "1 hour").writeStream
      .outputMode("append").format("memory").queryName("dedup_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("dedup_out")
    val batchKeys = batchEvents.select("props").distinct()
    // one survivor per distinct content, and each survivor is real content
    assert(streamed.count() == batchKeys.count())
    assert(streamed.select("props").exceptAll(batchKeys).isEmpty)
  }

  test("frozen-minhash candidates: stream-static join covers batch pairs") {
    val docsDir = {
      val out = "target/tmp/docs_stream"
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .write.mode("overwrite").parquet(out)
      out
    }
    val corpus = spark.read.parquet(docsDir)
    val frozen = Streaming.freezeNearDupCorpus(corpus, "text", "doc_id")
    val stream = spark.readStream.schema(corpus.schema).parquet(docsDir)
    val q = Streaming.nearDupCandidates(stream, "text", "doc_id", frozen)
      .writeStream
      .outputMode("append").format("memory").queryName("cand_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamedPairs = spark.table("cand_out")
      .select(least(col("doc_id"), col("corpus_id")).as("a"),
        greatest(col("doc_id"), col("corpus_id")).as("b"))
      .as[(Long, Long)].collect().toSet
    // every batch near-dup candidate pair is found by the streaming join
    val batchPairs = graft.text.Dedup
      .minHashLSH(corpus, "text", "doc_id")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(batchPairs.nonEmpty)
    assert(batchPairs.subsetOf(streamedPairs),
      s"missing ${(batchPairs -- streamedPairs).take(3)}")
    frozen.unpersist()
  }

  test("mapGroupsWithState running per-user totals") {
    val stream = spark.readStream.schema(batchEvents.schema)
      .parquet(streamDir)
      .select(col("user_id"), col("value")).as[Streaming.UserEvent]
    val q = Streaming.runningPerUser(stream).writeStream
      .outputMode("update").format("memory").queryName("state_out").start()
    try q.processAllAvailable() finally q.stop()
    // final state per user (last update) must equal the batch aggregate
    val last = spark.table("state_out")
      .groupBy("user_id").agg(max("n").as("n"))
    val batch = batchEvents.groupBy("user_id")
      .agg(count(lit(1)).as("n"))
    assert(last.exceptAll(batch).isEmpty)
  }
}
