package graft

import graft.multimodal.Multimodal
import graft.sim.Similarity
import graft.text.{Dedup, TextFunctions}
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("token count (empty string → 1 empty token, like str.split)") {
    val df = Seq((1L, "a b  c"), (2L, "  x "), (3L, "")).toDF("row_id", "t")
    val out = df.select(col("row_id"),
      TextFunctions.tokenCount(col("t")).as("n"))
    assertCol(out, "n", Seq(3L, 1L, 1L))
  }

  test("punct ratio") {
    val df = Seq((1L, "ab,."), (2L, "abcd")).toDF("row_id", "t")
    val out = df.select(col("row_id"),
      TextFunctions.punctRatio(col("t")).as("p"))
    assertCol(out, "p", Seq(0.5, 0.0))
  }

  test("language id heuristic on real sentences") {
    val df = Seq(
      (1L, "the cat is in the house and it is warm"),
      (2L, "der Hund ist nicht mit der Katze und das ist gut"),
      (3L, "le chat est dans une maison et il est pour les amis"),
      (4L, "el perro es grande y los gatos son para las casas"),
      (5L, "xyzzy plugh quux")).toDF("row_id", "t")
    val out = df.select(col("row_id"),
      TextFunctions.languageId(col("t")).as("lang"))
    assertCol(out, "lang", Seq("en", "de", "fr", "es", "und"))
  }

  test("fingerprint is whitespace/case insensitive") {
    val df = Seq((1L, "Hello   World"), (2L, "hello world"),
      (3L, "different doc")).toDF("row_id", "t")
    val fps = colOf(df.select(col("row_id"),
      TextFunctions.fingerprint(col("t")).as("fp")), "fp")
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }

  test("ngram jaccard: identical=1, disjoint=0, short-text=0") {
    val df = Seq(
      (1L, "a b c d e", "a b c d e"),
      (2L, "a b c d e", "v w x y z"),
      (3L, "a b", "a b")).toDF("row_id", "x", "y")
    val out = df.select(col("row_id"),
      TextFunctions.ngramJaccard(col("x"), col("y"), 3).as("j"))
    assertCol(out, "j", Seq(1.0, 0.0, 0.0))
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "spark table scan join filter group window sort merge " +
    "batch stream key value row column hash agg part order line data"
  lazy val docs = Seq(
    (10L, base + " alpha"),
    (11L, base + " alpha"),            // exact dup of 10
    (12L, base + " beta"),             // near dup of 10 (one word differs)
    (13L, "completely unrelated words about cooking pasta with tomato sauce"),
    (14L, base + " alpha"))            // second exact dup of 10
    .toDF("doc_id", "text")

  test("exact dedup keeps min-id row per text") {
    val out = Dedup.exact(docs, Seq("text"), "doc_id")
    assert(colOf(out.orderBy("doc_id"), "doc_id") == Seq(10L, 12L, 13L))
  }

  test("duplicateGroups reports count and keeper") {
    val out = Dedup.duplicateGroups(docs, Seq("text"), "doc_id")
    val r = out.collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("n_rows") == 3L)
    assert(r.head.getAs[Long]("keeper_id") == 10L)
  }

  test("minhash LSH finds exact and near dups, not unrelated docs") {
    val pairs = Dedup.minHashLSH(docs, "text", "doc_id")
      .filter(col("est_jaccard") >= 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((10L, 11L)))
    assert(pairs.contains((10L, 14L)))
    assert(pairs.contains((10L, 12L)) || pairs.contains((11L, 12L)))
    assert(!pairs.exists(p => p._1 == 13L || p._2 == 13L))
  }

  test("simhash near-dup finds exact dups at hamming 0") {
    val pairs = Dedup.simHashNearDup(docs, "text", "doc_id")
    val exact = pairs.filter(col("hamming") === 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.contains((10L, 11L)) && exact.contains((10L, 14L)))
  }

  test("jaccard verification scores the planted near-dup below the exact dup") {
    val cand = Seq((10L, 11L), (10L, 12L), (10L, 13L)).toDF("id_a", "id_b")
    for (restrict <- Seq(false, true)) {
      val out = Dedup.verifyJaccard(cand, docs, "text", "doc_id",
        threshold = 0.0, restrictToCandidates = restrict).orderBy("id_b")
      val j = colOf(out, "jaccard").map(_.asInstanceOf[Double])
      assert(j(0) == 1.0, s"restrict=$restrict") // exact dup
      assert(j(1) > 0.5 && j(1) < 1.0, s"restrict=$restrict") // near dup
      assert(j(2) == 0.0, s"restrict=$restrict") // unrelated
    }
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 1.0f)),
    (4L, Array(-1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")

  test("cosine: identical=1, orthogonal=0, opposite=-1") {
    val df = Seq((1L, Array(1.0f, 2.0f), Array(1.0f, 2.0f)),
      (2L, Array(1.0f, 0.0f), Array(0.0f, 3.0f)),
      (3L, Array(1.0f, 1.0f), Array(-1.0f, -1.0f))).toDF("row_id", "a", "b")
    val out = df.select(col("row_id"),
      Similarity.cosine(col("a"), col("b")).as("c"))
    assertColApprox(out, "c", Seq(Some(1.0), Some(0.0), Some(-1.0)))
  }

  test("brute-force top-k ranks by cosine") {
    val q = vecs.filter(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val out = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      q, "query_id", "qvec", k = 3)
    assert(colOf(out.orderBy("rank"), "vec_id") == Seq(0L, 1L, 2L))
  }

  test("LSH top-k returns a subset of true neighbors with exact sims") {
    val q = vecs.filter(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val lsh = Similarity.lshTopK(vecs, "vec_id", "embedding",
      q, "query_id", "qvec", k = 3, dim = 3).collect()
    assert(lsh.nonEmpty)
    // the query vector itself always collides with itself
    assert(lsh.exists(r => r.getAs[Long]("vec_id") == 0L &&
      math.abs(r.getAs[Double]("sim") - 1.0) < 1e-9))
  }

  test("IVF top-k probes the query's own cell (self at sim 1.0)") {
    val q = vecs.filter(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val out = Similarity.ivfTopK(vecs, "vec_id", "embedding",
      q, "query_id", "qvec", k = 3, nCentroids = 2, nProbe = 1).collect()
    assert(out.nonEmpty)
    assert(out.exists(r => r.getAs[Long]("vec_id") == 0L &&
      math.abs(r.getAs[Double]("sim") - 1.0) < 1e-9))
  }

  test("measured recall of LSH and IVF vs brute force on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    def resultSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val exact = resultSet(Similarity.bruteForceTopK(
      emb, "vec_id", "embedding", q, "query_id", "qvec", k = 5))
    val lsh = resultSet(Similarity.lshTopK(
      emb, "vec_id", "embedding", q, "query_id", "qvec", k = 5, dim = 64))
    val lshSingle = resultSet(Similarity.lshTopK(
      emb, "vec_id", "embedding", q, "query_id", "qvec", k = 5, dim = 64,
      multiProbe = false))
    val ivf = resultSet(Similarity.ivfTopK(
      emb, "vec_id", "embedding", q, "query_id", "qvec", k = 5))
    val lshRecall = (lsh & exact).size.toDouble / exact.size
    val lshSingleRecall = (lshSingle & exact).size.toDouble / exact.size
    val ivfRecall = (ivf & exact).size.toDouble / exact.size
    info(f"recall@5 — lsh(multiprobe): $lshRecall%.2f, " +
      f"lsh(single): $lshSingleRecall%.2f, ivf: $ivfRecall%.2f")
    // every method must at least find each query itself (sim 1.0)
    assert((0L until 20L).forall(i => lsh.contains((i, i))))
    assert((0L until 20L).forall(i => ivf.contains((i, i))))
    // default knobs must not hand a user coin-flip recall: uniform random
    // 64-d embeddings are the worst case. Multi-probe (the default) probes
    // r extra query-side buckets per band and must clear 0.9; the
    // single-probe floor stays 0.8.
    assert(lshRecall >= 0.9, s"lsh recall@5 $lshRecall below 0.9 floor")
    assert(lshSingleRecall >= 0.8,
      s"single-probe lsh recall@5 $lshSingleRecall below 0.8 floor")
    assert(ivfRecall >= 0.6, s"ivf recall@5 $ivfRecall below 0.6 floor")
  }

  test("custom expressions registered for SQL") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
                simhash64(array(0L)) AS s""").head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getLong(1) == 0L)
  }

  test("embedding near-dup finds the identical-direction pair") {
    val out = Similarity.embeddingNearDup(vecs, "vec_id", "embedding",
      dim = 3, threshold = 0.9)
    val pairs = out.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Seq((1L, "x" * 100), (2L, "y" * 600), (3L, ""))
    .toDF("doc_id", "text")

  test("decode stub: deterministic dims from byte length, typed schema") {
    val out = Multimodal.decodeImages(
      Multimodal.withBlob(docs, "text", "blob"), "doc_id", "blob")
    assert(out.schema.map(f => (f.name, f.dataType.simpleString)) ==
      Seq("id" -> "bigint", "width" -> "int", "height" -> "int",
        "channels" -> "int", "n_pixels" -> "bigint"))
    val r = out.orderBy("id").collect()
    assert(r(0).getAs[Int]("width") == 1 + 100 % 512)
    assert(r(1).getAs[Int]("height") == 1 + (600 * 7) % 512)
    assert(r(2).getAs[Int]("width") == 1) // empty payload
  }

  test("frame sampling fans out rows with stride") {
    val out = Multimodal.sampleFrames(
      Multimodal.withBlob(docs, "text", "blob"), "doc_id", "blob",
      frameBytes = 64, stride = 2)
    // doc 2: 600/64 = 9 frames → indices 0,2,4,6,8
    assert(colOf(out.filter(col("id") === 2).orderBy("frame_index"),
      "frame_index") == Seq(0, 2, 4, 6, 8))
    assert(out.filter(col("id") === 3).count() == 0)
  }

  private def encodeImage(
      w: Int, h: Int, rgb: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  test("real decode: javax.imageio parses true PNG/JPEG dimensions") {
    val rows = Seq(
      (1L, encodeImage(17, 9, 0x336699, "png")),
      (2L, encodeImage(64, 32, 0xFF0000, "jpg")),
      (3L, "not an image".getBytes("UTF-8")),
      (4L, Array.empty[Byte]))
    val df = rows.toDF("doc_id", "blob")
    val out = Multimodal.decodeImagesIO(df, "doc_id", "blob")
      .orderBy("id").collect()
    // corrupt + empty payloads are dropped, not task failures
    assert(out.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L))
    assert(out(0).getAs[Int]("width") == 17)
    assert(out(0).getAs[Int]("height") == 9)
    assert(out(0).getAs[Int]("channels") == 3)
    assert(out(0).getAs[Long]("n_pixels") == 17L * 9 * 3)
    assert(out(1).getAs[Int]("width") == 64)
    assert(out(1).getAs[Int]("height") == 32)
  }

  test("real feature extraction: mean luminance of a solid-color PNG") {
    // gray (128,128,128): luma = 128 exactly under the BT.601 weights
    val df = Seq((1L, encodeImage(10, 10, 0x808080, "png")))
      .toDF("doc_id", "blob")
    val out = Multimodal.imageFeatures(df, "doc_id", "blob").collect()
    assert(out.length == 1)
    assert(math.abs(out(0).getAs[Double]("mean_luma") - 128.0) < 1e-9)
    assert(out(0).getAs[Int]("width") == 10)
  }

  test("resize plan keeps lineage as column math") {
    val dec = Multimodal.decodeImages(
      Multimodal.withBlob(docs, "text", "blob"), "doc_id", "blob")
    val out = Multimodal.resizePlan(dec, 224, 224)
    assert(out.filter(col("out_pixels") =!= 224L * 224 * 3).count() == 0)
  }
}
