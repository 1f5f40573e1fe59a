package graft.streaming

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming surface (SURVEY §2.10 / P6 extension — the reference
  * has no streaming; this is the natural serving path for fitted pipelines).
  *
  * A fitted `PipelineModel`'s state is frozen training statistics (encoder
  * dictionaries, group aggregates) applied as stateless Column expressions /
  * broadcast joins — so `model.transform` composes directly onto a streaming
  * DataFrame with no extra state store: scoring a stream IS the batch plan
  * over an unbounded source. Transform-time-statistics operators (Imputer
  * mean, MinorityTransformer, RangeTransformer stat rules) are the
  * exception: they aggregate the transform input and are rejected on
  * streams by Spark's unsupported-operation check — freeze them at fit time
  * into constants before streaming (SURVEY §7.4, flagged).
  */
object Streaming {

  /** Score an unbounded stream with a fitted pipeline (stateless). */
  def score(model: PipelineModel, stream: DataFrame): DataFrame =
    model.transform(stream)

  /** Watermarked tumbling-window aggregate over the events shape
    * (`ts: timestamp, event_type: string, value: double`). */
  def windowedStats(
      events: DataFrame,
      watermark: String = "10 minutes",
      windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Streaming exact dedup: fingerprint the content column and keep the
    * first arrival per fingerprint inside the watermark horizon.
    * `dropDuplicatesWithinWatermark` bounds the state store by event time —
    * a plain `dropDuplicates` would keep every fingerprint ever seen, which
    * at 100 TB/day of documents is an unbounded state store; dedup across a
    * longer horizon belongs in a periodic batch compaction over the sink. */
  def dedupExact(
      stream: DataFrame, textCol: String, tsCol: String,
      watermark: String = "10 minutes"): DataFrame =
    stream
      .withColumn("__fp", graft.text.TextFunctions.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Freeze a reference corpus into its MinHash band buckets — the STATIC
    * side of streaming near-dup detection, fitted once (persisted and
    * materialized; release with `unpersist()` when retired). Hot buckets
    * over `maxBucket` docs are dropped at freeze time with a logged
    * warning, same guard as the batch dedup paths: one degenerate
    * boilerplate bucket would otherwise multiply every matching stream row
    * by the bucket size on every micro-batch. */
  def freezeNearDupCorpus(
      corpus: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleK: Int = 3,
      maxBucket: Int = 10000): DataFrame = {
    // persisted BEFORE capBuckets: the shingle+minhash pass over the whole
    // corpus otherwise runs twice (once for the counts aggregate, once for
    // the surviving-buckets join) — same guard as lshTopK's dataBuckets
    val buckets = graft.text.Dedup
      .bandBuckets(corpus, textCol, idCol, numHashes, bands, shingleK)
      .withColumnRenamed(idCol, "corpus_id")
      .persist()
    val counts = buckets.groupBy("band", "bucket").count()
    val (ok, countsCached) = graft.text.Dedup.capBuckets(buckets, counts,
      maxBucket, "freezeNearDupCorpus")
    val frozen = ok.select("corpus_id", "band", "bucket").persist()
    frozen.count()
    buckets.unpersist()
    countsCached.unpersist()
    frozen
  }

  /** Near-duplicate candidates of a live stream against a frozen corpus:
    * the stream's band buckets stream-static-join the frozen bucket
    * relation — a stateless equi-join per micro-batch, no streaming state.
    * Emits `(idCol, corpus_id)` candidate pairs (one per agreeing band;
    * dedup/verify downstream — an in-stream `dropDuplicates` on the pair
    * would grow state unboundedly). */
  def nearDupCandidates(
      stream: DataFrame, textCol: String, idCol: String,
      frozenCorpus: DataFrame,
      numHashes: Int = 64, bands: Int = 16, shingleK: Int = 3): DataFrame =
    graft.text.Dedup
      .bandBuckets(stream, textCol, idCol, numHashes, bands, shingleK)
      .join(frozenCorpus, Seq("band", "bucket"))
      .filter(col(idCol) =!= col("corpus_id"))
      .select(col(idCol), col("corpus_id"))

  case class UserEvent(user_id: Long, value: Double)
  case class UserRunning(user_id: Long, n: Long, total: Double)

  /** Custom per-key state: running count/sum per user via
    * `mapGroupsWithState` — the KeyValueGroupedDataset state API the
    * reference has no analog for. */
  def runningPerUser(events: Dataset[UserEvent]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          val next = it.foldLeft(prev)((acc, e) =>
            UserRunning(uid, acc.n + 1, acc.total + e.value))
          state.update(next)
          next
      }
  }
}
