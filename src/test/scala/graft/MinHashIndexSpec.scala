package graft

import graft.text.{Dedup, MinHashIndex}
import org.apache.spark.sql.functions._

class MinHashIndexSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog again and again " +
      "while the cat watches from the warm windowsill every single day"

  // corpus: 20 distinct docs (even ids); batch: near-dup of doc 4 plus
  // two novel docs (odd ids)
  private lazy val corpus = (0 until 20).map(i =>
    (i * 2L, s"$base unique marker token number $i " +
      s"extra filler ${"pad " * i}")).toDF("doc_id", "text")
  private lazy val batch = Seq(
    (9991L, s"$base unique marker token number 4 extra filler " +
      ("pad " * 4)), // ~exact dup of doc 8 (i = 4)
    (9993L, "completely different content about ships and harbors and " +
      "the long grey horizon beyond the breakwater at dawn light"),
    (9995L, "another novel document mentioning telescopes nebulae and " +
      "the patient arithmetic of orbital mechanics overnight"))
    .toDF("new_id", "text")

  test("matchNew finds the planted cross-set near-dup and nothing novel") {
    val index = MinHashIndex.fit(corpus, "text", "doc_id")
    val got = index.matchNew(batch, "text", "new_id", maxBucket = 100000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.exists { case (n, c, est) => n == 9991L && c == 8L && est > 0.8 })
    assert(!got.exists { case (n, _, _) => n == 9993L || n == 9995L })
    index.release()
  }

  test("save -> load -> matchNew serves identical candidates; add grows " +
      "the index one batch scan at a time") {
    val fresh = MinHashIndex.fit(corpus, "text", "doc_id")
    val dir = "target/tmp/minhash_index_test"
    fresh.save(dir)
    val loaded = MinHashIndex.load(spark, dir)
    assert(loaded.numHashes == fresh.numHashes &&
      loaded.bands == fresh.bands && loaded.shingleK == fresh.shingleK)

    def res(ix: MinHashIndex) =
      ix.matchNew(batch, "text", "new_id", maxBucket = 100000)
        .orderBy("new_id", "doc_id").collect().toSeq
    assert(res(loaded) == res(fresh))

    // grow with the batch, then the batch's own dup (of itself) matches
    val grown = loaded.add(batch, "text", "new_id")
    val again = grown.matchNew(
        Seq((7777L, batch.filter($"new_id" === 9993L)
          .head().getString(1))).toDF("new_id", "text"),
        "text", "new_id", maxBucket = 100000)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(again.contains((7777L, 9993L)))
    fresh.release(); loaded.release()
  }

  test("add is idempotent and matchNew never self-pairs: re-ingesting an " +
      "already-indexed batch neither double-counts nor matches itself") {
    val index = MinHashIndex.fit(corpus, "text", "doc_id")
    val once = index.add(batch, "text", "new_id")
    val twice = once.add(batch, "text", "new_id")

    // idempotence: the second add contributes zero signature rows, so the
    // index is byte-identical (same ids, same signature count per id)
    assert(twice.signatures.count() == once.signatures.count())
    assert(twice.signatures.groupBy("doc_id").count()
      .filter($"count" > 1).count() == 0)

    // matchNew of the batch AGAINST an index containing the batch: the
    // planted near-dup (9991 ~ 8) must still surface, but no (x, x)
    // self-pair — and no duplicate result rows from a doubled signature
    val got = twice.matchNew(batch, "text", "new_id", maxBucket = 100000)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.exists { case (n, c) => n == 9991L && c == 8L })
    assert(!got.exists { case (n, c) => n == c })
    assert(got.length == got.distinct.length)
    twice.release()
  }

  test("frozenBuckets serves Streaming.nearDupCandidates from a loaded " +
      "index (one fit, both batch and streaming serving)") {
    val dir = "target/tmp/minhash_index_stream_test"
    MinHashIndex.fit(corpus, "text", "doc_id").save(dir)
    val loaded = MinHashIndex.load(spark, dir)
    val frozen = loaded.frozenBuckets()
    // nearDupCandidates is a stateless equi-join — identical plan on a
    // batch frame stands in for the micro-batch side
    val got = graft.streaming.Streaming.nearDupCandidates(
        batch, "text", "new_id", frozen,
        loaded.numHashes, loaded.bands, loaded.shingleK)
      .select("new_id", "corpus_id").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = loaded.matchNew(batch, "text", "new_id",
        maxBucket = 100000, withEstimate = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == direct)
    frozen.unpersist(); loaded.release()
  }

  test("keepBestPerComponent keeps the best-scored exemplar per cluster " +
      "and passes unclustered rows through") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "x", 10.0), (2L, "x", 30.0), (3L, "x", 30.0), // cluster {1,2,3}
      (4L, "y", 5.0), (5L, "y", 1.0), // cluster {4,5}
      (9L, "z", 0.0) // unclustered
    ).toDF("doc_id", "text", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val kept = Dedup.keepBestPerComponent(docs, "doc_id", pairs,
        docs.select("doc_id", "score"), "score")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    // {1,2,3}: max score 30 tie between 2 and 3 -> lower id 2
    // {4,5}: 4 wins; 9 untouched
    assert(kept == Set(2L, 4L, 9L))
  }

  test("agrees with the one-shot batch path on a shared corpus") {
    // fitting on all docs and matching the batch must produce the same
    // verified pairs as running minHashLSH over corpus+batch and keeping
    // cross-set pairs
    val all = corpus.unionByName(
      batch.select($"new_id".as("doc_id"), $"text"))
    val oneShot = Dedup.minHashLSH(all, "text", "doc_id",
        maxBucket = 100000, withEstimate = false)
      .filter(($"id_a" >= 9990L) =!= ($"id_b" >= 9990L))
      .collect().map(r => (r.getLong(0) max r.getLong(1),
        r.getLong(0) min r.getLong(1))).toSet
    val index = MinHashIndex.fit(corpus, "text", "doc_id")
    val incr = index.matchNew(batch, "text", "new_id",
        maxBucket = 100000, withEstimate = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(incr == oneShot)
    index.release()
  }
}
