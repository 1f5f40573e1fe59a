package graft

import graft.functions.GraftFunctions
import graft.text.TextFunctions
import org.apache.spark.sql.functions._

/** Round-6 operators: heavy hitters (CMS pre-filter — covered in
  * RelationalSpec), accent stripping / text normalization. */
class NormalizeTextSpec extends SparkSpec {
  import spark.implicits._

  test("strip_accents removes composed and decomposed accents, keeps ASCII") {
    val df = Seq(
      "Caf\u00e9",              // composed e-acute
      "Cafe\u0301",             // decomposed e + combining acute
      "na\u00efve Z\u00fcrich",
      "\u00c0\u00c9\u00ce\u00d5\u00dc\u00e7\u00f1",
      "plain ascii stays",
      "\u0153uvre"              // oe ligature: NOT an accent, must survive
    ).toDF("s")
    val got = df.select(GraftFunctions.strip_accents(col("s")).as("o"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("Cafe", "Cafe", "naive Zurich", "AEIOUcn",
      "plain ascii stays", "\u0153uvre"))
  }

  test("strip_accents null and empty passthrough") {
    val df = Seq(Some(""), None).toDF("s")
    val got = df.select(GraftFunctions.strip_accents(col("s")).as("o"))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(got == Seq(Some(""), None))
  }

  test("normalizeText collapses whitespace, trims, lowercases") {
    val df = Seq("  Caf\u00e9   du\t\tMonde \n").toDF("s")
    assert(df.select(TextFunctions.normalizeText(col("s")).as("o"))
      .head().getString(0) == "cafe du monde")
    assert(df.select(
        TextFunctions.normalizeText(col("s"), lowercase = false).as("o"))
      .head().getString(0) == "Cafe du Monde")
  }

  test("bpeTokens splits like the GPT-2 pre-tokenizer family") {
    val s = "The quick brown fox's 42 jumps, over 3.14 miles!  Don't " +
      "stop-now; e.g. U.S.A. 'quoted'   spaces"
    val df = Seq(s).toDF("t")
    val toks = df.select(TextFunctions.bpeTokens(col("t")).as("x"))
      .head().getSeq[String](0)
    // cross-checked against DuckDB regexp_extract_all with the same
    // pattern: identical 36 splits
    assert(toks.length == 36)
    assert(toks.take(8) ==
      Seq("The", " quick", " brown", " fox", "'s", " 42", " jumps", ","))
    assert(df.select(TextFunctions.bpeTokenCount(col("t"))).head.getLong(0)
      == 36L)
    assert(Seq("").toDF("t")
      .select(TextFunctions.bpeTokenCount(col("t"))).head.getLong(0) == 0L)
  }

  test("normalizeText makes accent-variant duplicates exactly equal") {
    // the dedup motivation: same page crawled twice with different
    // Unicode normalization must collapse to one key
    val df = Seq(
      (1L, "R\u00e9sum\u00e9  writing\ttips"),
      (2L, "Re\u0301sume\u0301 writing tips")).toDF("id", "text")
    val keys = df.select(TextFunctions.normalizeText(col("text")).as("k"))
      .distinct().count()
    assert(keys == 1L)
  }
}

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  test("urlDomain extracts lowercased host, strips user/port, null on junk") {
    val df = Seq(
      "https://WWW.Example.COM/path?q=1",
      "http://user:pw@Host.org:8080/x",
      "ftp://files.example.net",
      "not a url",
      "relative/path",
      "").toDF("u")
    val got = df.select(graft.text.Corpus.urlDomain(col("u")).as("d"))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(got == Seq(Some("www.example.com"), Some("host.org"),
      Some("files.example.net"), None, None, None))
  }

  test("domainFilter drops blocked domains and their subdomains only") {
    val docs = Seq(
      (1L, "https://example.com/a"),        // exact block
      (2L, "https://ads.example.com/b"),    // subdomain block
      (3L, "https://example.com.evil.io/c"), // NOT a suffix match - keeps
      (4L, "https://good.org/d"),
      (5L, "junk"),                          // null domain - keeps
      (6L, "https://deep.ads.example.com/e") // deeper subdomain block
    ).toDF("id", "url")
    val blocked = Seq("EXAMPLE.com").toDF("dom") // case-insensitive
    val kept = graft.text.Corpus.domainFilter(docs, "url", "id",
        blocked, "dom")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(3L, 4L, 5L))
  }

  test("binaryFile round trip preserves exact bytes") {
    val dir = java.nio.file.Files.createTempDirectory("binsrc")
    val payload = Array[Byte](0, 1, -1, 127, -128, 10, 13)
    java.nio.file.Files.write(dir.resolve("7.bin"), payload)
    java.nio.file.Files.write(dir.resolve("skip.txt"), "x".getBytes)
    val got = graft.sources.Sources.readBinaryFiles(spark, dir.toString,
      "*.bin").select("length", "content").collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == payload.length.toLong)
    assert(got(0).getAs[Array[Byte]](1).toSeq == payload.toSeq)
  }
}

class RobustScalerSpec extends SparkSpec {
  import spark.implicits._

  test("robust strategy equals (x - median) / IQR with exact quartiles") {
    val df = Seq(1.0, 2.0, 3.0, 4.0, 100.0).toDF("x") // outlier-heavy
    val got = new graft.operators.Scaler(Seq("x"), Seq("y"), "robust")
      .fit(df).transform(df)
      .orderBy("x").collect().map(_.getDouble(1)).toSeq
    // median = 3, q1 = 2, q3 = 4, iqr = 2
    assert(got == Seq(-1.0, -0.5, 0.0, 0.5, 48.5))
  }

  test("robust degenerate IQR = 0 scales by 1; nulls pass through") {
    val df = Seq(Some(5.0), Some(5.0), Some(5.0), None).toDF("x")
    val got = new graft.operators.Scaler(Seq("x"), Seq("y"), "robust")
      .fit(df).transform(df)
      .collect().map(r => Option(r.get(1)).map(_.asInstanceOf[Double])).toSeq
    assert(got == Seq(Some(0.0), Some(0.0), Some(0.0), None))
  }

  test("robust ScalerModel persists and reloads") {
    val df = Seq(1.0, 2.0, 3.0, 4.0, 100.0).toDF("x")
    val m = new graft.operators.Scaler(Seq("x"), Seq("y"), "robust").fit(df)
    val dir = java.nio.file.Files.createTempDirectory("robsc").toString
    val pipe = graft.operators.DFPipeline(
      new graft.operators.Scaler(Seq("x"), Seq("y"), "robust")).fit(df)
    graft.operators.GraftPersistence.save(pipe, dir)
    val loaded = graft.operators.GraftPersistence.load(spark, dir)
    val a = m.transform(df).orderBy("x").collect().map(_.getDouble(1)).toSeq
    val b = loaded.transform(df).orderBy("x").collect()
      .map(_.getAs[Double]("y")).toSeq
    assert(a == b)
  }
}

class SampleNPerGroupSpec extends SparkSpec {
  import spark.implicits._

  test("exactly n per group; smaller groups keep all; matches window form") {
    val df = ((1 to 20).map(i => ("big", i.toLong)) ++
      (21 to 23).map(i => ("small", i.toLong))).toDF("g", "id")
    val got = graft.text.Corpus.sampleNPerGroup(df, Seq("g"), "id", 5)
    val counts = got.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("big" -> 5L, "small" -> 3L))

    // equals the row_number() formulation ordered by the same hash
    val u = graft.text.Corpus.hashUniform(col("id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(u.asc, col("id").asc)
    val expected = df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= 5)
      .select("g", "id", "sample_rank")
      .orderBy("g", "sample_rank").collect().toSeq
    val gotRows = got.select(col("g"), col("id"),
        col("sample_rank").cast("int").as("sample_rank"))
      .orderBy("g", "sample_rank").collect().toSeq
    assert(gotRows == expected)
  }

  test("sample is deterministic across invocations") {
    val df = (1 to 100).map(i => ("g", i.toLong)).toDF("g", "id")
    val a = graft.text.Corpus.sampleNPerGroup(df, Seq("g"), "id", 10)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val b = graft.text.Corpus.sampleNPerGroup(df.repartition(7), Seq("g"),
        "id", 10)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
  }
}

class AudioSpec extends SparkSpec {
  import spark.implicits._

  test("WAV round trip: real javax.sound decode recovers format + exact RMS") {
    val df = Seq(3L, 10L, 499L, 1000L).toDF("id")
    val got = graft.multimodal.Multimodal.audioFeatures(
        graft.multimodal.Multimodal.syntheticWavs(df, "id"), "id", "blob")
      .orderBy("id").collect()
    assert(got.length == 4)
    got.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == 8000)             // sample_rate
      assert(r.getInt(2) == 1)                // channels
      assert(r.getInt(3) == 16)               // bits
      assert(r.getLong(4) == 1 + id % 500)    // n_samples
      assert(r.getDouble(5) == (1 + id % 500) * 0.125) // duration_ms
      assert(r.getDouble(6) == (1 + (id * 7) % 10000).toDouble) // exact RMS
    }
  }

  test("undecodable audio payloads are dropped, not failed") {
    val junk = Seq((1L, Array[Byte](1, 2, 3)),
      (2L, Array.empty[Byte])).toDF("id", "blob")
    assert(graft.multimodal.Multimodal.audioFeatures(junk, "id", "blob")
      .count() == 0L)
  }
}

class VideoDemuxSpec extends SparkSpec {
  import spark.implicits._
  import graft.multimodal.Multimodal

  test("AVI round trip: real chunk-tree parse recovers frames + header") {
    val df = Seq(0L, 7L, 23L, 100L).toDF("id")
    val got = Multimodal.demuxFrames(Multimodal.syntheticAvis(df, "id"),
        "id", "blob", stride = 1)
      .orderBy("id", "frame_index").collect()
    val byId = got.groupBy(_.getLong(0))
    Seq(0L, 7L, 23L, 100L).foreach { id =>
      val rows = byId(id)
      val n = (1 + id % 24).toInt
      val fsz = (16 + 2 * ((3 * id) % 33)).toInt
      assert(rows.length == n)
      rows.zipWithIndex.foreach { case (r, k) =>
        assert(r.getInt(1) == k)
        assert(r.getLong(2) == 232L + k * (8 + fsz)) // fixed-layout offset
        assert(r.getInt(3) == fsz)
        assert(r.getInt(4) == 32 * (1 + id % 8).toInt)
        assert(r.getInt(5) == 24 * (1 + id % 6).toInt)
        assert(r.getInt(6) == n)
      }
    }
  }

  test("parser is offset-exact: frame bytes at reported offset are the chunk") {
    val bytes = Multimodal.aviBytes(nFrames = 3, frameBytes = 20,
      width = 64, height = 48)
    val Some((w, h, frames)) = Multimodal.parseAvi(bytes)
    assert((w, h) == (64, 48) && frames.length == 3)
    frames.zipWithIndex.foreach { case ((off, sz), k) =>
      assert(sz == 20)
      // chunk tag sits 8 bytes before the data offset
      assert(new String(bytes, off.toInt - 8, 4, "US-ASCII") == "00dc")
      assert(bytes(off.toInt) == ((k + 0) & 0xff).toByte)
    }
  }

  test("non-AVI and truncated payloads are dropped, not failed") {
    val junk = Seq(
      (1L, Array[Byte](1, 2, 3)),
      (2L, Array.empty[Byte]),
      (3L, "RIFFxxxxWAVE".getBytes("US-ASCII")), // RIFF but not AVI
      // well-formed AVI cut mid-frame: parse stops cleanly at the tail
      // (total 308 bytes; 256 keeps frame 0 whole, cuts frame 1's header)
      (4L, Multimodal.aviBytes(3, 20, 64, 48).take(256))
    ).toDF("id", "blob")
    val got = Multimodal.demuxFrames(junk, "id", "blob")
      .select("id", "n_frames").collect()
    assert(got.forall(_.getLong(0) == 4L))
    assert(got.length == 1 && got.head.getInt(1) == 1) // only frame 0 fits
  }
}
