package graft

import java.util.concurrent.atomic.AtomicInteger

import graft.sim.{IvfIndex, Similarity}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** The fitted-ANN-index contract: fit once, query many — queries are pure
  * broadcast-probe joins with zero clustering work, the index round-trips
  * through save/load, and full probing is exact. */
class IndexSpec extends SparkSpec {
  import spark.implicits._

  lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  lazy val q = emb.filter(col("vec_id") < 10)
    .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))

  private def resultSet(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "vec_id").as[(Long, Long)].collect().toSet

  test("full probing (nProbe = nCentroids) is exact") {
    val index = IvfIndex.fit(emb, "vec_id", "embedding", nCentroids = 16)
    val exact = resultSet(Similarity.bruteForceTopK(
      emb, "vec_id", "embedding", q, "query_id", "qvec", k = 5))
    val full = resultSet(index.query(q, "query_id", "qvec", k = 5,
      nProbe = 16))
    assert(full == exact)
    index.release()
  }

  test("fit once / query many: no clustering work in the query path") {
    val index = IvfIndex.fit(emb, "vec_id", "embedding", nCentroids = 16)
    val jobs = new AtomicInteger
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val r1 = resultSet(index.query(q, "query_id", "qvec", 5, 4))
      val r2 = resultSet(index.query(q, "query_id", "qvec", 5, 4))
      assert(r1 == r2) // deterministic, no refit drift
      Thread.sleep(500) // listener bus is async
      // a spark.ml KMeans fit alone is ~10 driver-synchronized jobs; two
      // pure probe-join queries stay well under that
      assert(jobs.get() <= 8, s"query path ran ${jobs.get()} jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
    index.release()
  }

  test("save/load round trip serves identical results") {
    val index = IvfIndex.fit(emb, "vec_id", "embedding", nCentroids = 16)
    val dir = "target/tmp/ivf_index"
    index.save(dir)
    val loaded = IvfIndex.load(spark, dir)
    assert(loaded.centroids.map(_.toSeq).toSeq ==
      index.centroids.map(_.toSeq).toSeq)
    val a = index.query(q, "query_id", "qvec", 5, 4)
      .collect().map(_.toSeq).toSet
    val b = loaded.query(q, "query_id", "qvec", 5, 4)
      .collect().map(_.toSeq).toSet
    assert(a == b)
    index.release(); loaded.release()
  }

  test("scoreStream serves a query stream; full probe equals batch query") {
    // parquet-backed stream of the same 10 queries → stream-static join
    // against the fitted assignments; per-batch top-k downstream equals
    // the batch query() result
    val index = IvfIndex.fit(emb, "vec_id", "embedding", nCentroids = 16)
    val qDir = "target/tmp/ann_queries"
    q.write.mode("overwrite").parquet(qDir)
    val stream = spark.readStream.schema(q.schema).parquet(qDir)
    val scored = index.scoreStream(stream, "query_id", "qvec", nProbe = 16)
    val qry = scored.writeStream.outputMode("append")
      .format("memory").queryName("ann_serve").start()
    try qry.processAllAvailable() finally qry.stop()
    // downstream micro-batch cut: CollectTopK over the emitted candidates
    val top = spark.table("ann_serve")
      .groupBy("query_id")
      .agg(graft.functions.TopK.collect_top_k(
        struct(col("sim").as("score"),
          col("vec_id").cast("long").as("id")), 5).as("__top"))
      .select(col("query_id"), explode(col("__top.id")).as("vec_id"))
      .as[(Long, Long)].collect().toSet
    val batch = resultSet(index.query(q, "query_id", "qvec", k = 5,
      nProbe = 16))
    assert(top == batch)
    index.release()
  }

  test("partial probing trades recall, never correctness of returned sims") {
    val index = IvfIndex.fit(emb, "vec_id", "embedding", nCentroids = 16)
    val exact = Similarity.bruteForceTopK(
      emb, "vec_id", "embedding", q, "query_id", "qvec", k = 5)
      .select(col("query_id"), col("vec_id"), round(col("sim"), 9).as("sim"))
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val part = index.query(q, "query_id", "qvec", 5, 4)
      .select(col("query_id"), col("vec_id"), round(col("sim"), 9).as("sim"))
      .as[(Long, Long, Double)].collect()
    // every returned sim is the true cosine (ANN approximates the candidate
    // set, never the scores); recall floor asserted in DataOpsSpec
    val wrong = part.filter { case (qid, id, sim) =>
      exact.get((qid, id)).exists(e => math.abs(e - sim) > 1e-9)
    }
    assert(wrong.isEmpty, s"sims diverge: ${wrong.take(3).toSeq}")
    index.release()
  }

  test("knnJoin measured recall floors vs brute force at sf0.1 " +
      "(VERDICT r5 #8)") {
    // The measured quality/cost trade of the LSH-bucketed self-kNN on the
    // full sf0.1 corpus (2000 vectors, fixed data + fixed seed →
    // deterministic). Ground truth: brute-force top-(k+1) with the
    // self-match dropped — knnJoin never pairs a row with itself.
    //
    // Recall is set by bits-per-band r = nPlanes/bands (collision
    // selectivity) and the band count (number of chances). Measured curve
    // on this corpus: defaults 16/4 (r=4) → 0.49; 24/8 (r=3) → 0.89;
    // 32/16 (r=2) → 0.9997. Defaults favor throughput — global top-3
    // includes modest-cosine neighbors LSH legitimately misses, while the
    // near-dup pipelines knnJoin feeds care about high-cosine pairs. The
    // r=2 quality setting is for small/medium corpora only: 2^r = 4
    // buckets per band, so at large N every bucket hits the cap — scale
    // corpora must raise r AND bands together (e.g. 64/16 keeps r=4 with
    // 16× the collision chances).
    val big = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val k = 3
    val truth = Similarity.bruteForceTopK(
        big, "vec_id", "embedding",
        big.select(col("vec_id").as("query_id"),
          col("embedding").as("qvec")),
        "query_id", "qvec", k = k + 1)
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy(col("rank"))))
      .filter(col("rk") <= k)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    def recallAt(nPlanes: Int, bands: Int): Double = {
      val approx = Similarity.knnJoin(big, "vec_id", "embedding",
          k = k, dim = 64, nPlanes = nPlanes, bands = bands)
        .select(col("vec_id").as("query_id"), col("nbr_id").as("vec_id"))
        .as[(Long, Long)].collect().toSet
      (truth & approx).size.toDouble / truth.size
    }
    val atDefaults = recallAt(16, 4)
    val atQuality = recallAt(32, 16)
    info(f"recall: defaults(16/4)=$atDefaults%.4f  " +
      f"quality(32/16)=$atQuality%.4f  (${truth.size} truth pairs)")
    assert(atDefaults >= 0.45,
      f"default-knob recall $atDefaults%.4f regressed below measured floor")
    assert(atQuality >= 0.95,
      f"quality-knob recall $atQuality%.4f below the 0.95 floor")
    // AUTO knobs (VERDICT r6 #3): corpus-derived geometry must not leave
    // a user at the 0.49 fixed-default floor — on this corpus autoKnobs
    // resolves to r=3 x 21 bands and recall must clear 0.9
    val autoApprox = Similarity.knnJoinAuto(big, "vec_id", "embedding",
        k = k, dim = 64)
      .select(col("vec_id").as("query_id"), col("nbr_id").as("vec_id"))
      .as[(Long, Long)].collect().toSet
    val atAuto = (truth & autoApprox).size.toDouble / truth.size
    info(f"recall: auto=$atAuto%.4f")
    assert(atAuto >= 0.9,
      f"auto-knob recall $atAuto%.4f below the 0.9 floor")
  }

  test("autoKnobs geometry: bucket space grows with corpus/cap, the " +
      "64-bit signature budget is spent on bands, and r clamps at 16") {
    // small corpus: minimum bits, maximum bands
    assert(Similarity.autoKnobs(2000, 1000) == (63, 21))   // r=3
    // occupancy rule with 4x skew headroom: 2^r >= 4n/cap
    assert(Similarity.autoKnobs(16000, 1000) == (60, 10))  // r=6
    assert(Similarity.autoKnobs(1000000, 1000) == (60, 5)) // r=12
    // clamp: past 2^14 * cap the signature is out of bits — the knnJoin
    // coverage warning takes over
    assert(Similarity.autoKnobs(Long.MaxValue / 4, 1000) == (64, 4))
  }
}
