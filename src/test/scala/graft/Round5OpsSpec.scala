package graft

import graft.relational.Relational
import graft.sim.Similarity
import graft.text.{Corpus, Dedup, TextFunctions}
import org.apache.spark.sql.functions._

/** Round-5 operators: semi/anti joins, grouping sets, Gopher quality gate,
  * DSIR importance scoring, semantic dedup, and the engine-portable hash
  * variants (md5 simhash / md5-integer hyperplanes). */
class SemiAntiJoinSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "b"))
    .toDF("id", "k")
  // non-unique right: a semi join must NOT duplicate left rows
  private val right = Seq("b", "b", "c").toDF("k")

  test("semiJoin keeps matching left rows exactly once") {
    val got = Relational.semiJoin(left, right, Seq("k"))
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(2L, 3L, 4L))
  }

  test("antiJoin keeps non-matching left rows") {
    val got = Relational.antiJoin(left, right, Seq("k"), broadcastRight = true)
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L))
  }

  test("semi + anti partition the left side") {
    val s = Relational.semiJoin(left, right, Seq("k")).count()
    val a = Relational.antiJoin(left, right, Seq("k")).count()
    assert(s + a == left.count())
  }
}

class GroupingSetsSpec extends SparkSpec {
  import spark.implicits._

  test("detail, subtotal, and grand-total rows in one pass") {
    val df = Seq(("x", "p", 1L), ("x", "q", 2L), ("y", "p", 4L))
      .toDF("a", "b", "v")
    val got = Relational.groupingSetsAgg(df,
      Seq(Seq("a", "b"), Seq("a"), Seq.empty),
      Seq(sum("v").as("s")))
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1))) ->
        r.getLong(2))
      .toMap
    assert(got((Some("x"), Some("p"))) == 1L)
    assert(got((Some("x"), Some("q"))) == 2L)
    assert(got((Some("y"), Some("p"))) == 4L)
    assert(got((Some("x"), None)) == 3L)
    assert(got((Some("y"), None)) == 4L)
    assert(got((None, None)) == 7L)
    assert(got.size == 6)
  }
}

class GopherStatsSpec extends SparkSpec {
  import spark.implicits._

  test("stats and keep decision") {
    // 4 words incl. 3 stopwords (the, of, it), mean len (3+5+2+2)/4 = 3.0
    val df = Seq((1L, "the quick of it"), (2L, "x y"))
      .toDF("doc_id", "text")
    val got = TextFunctions.gopherStats(df, "text",
      minWords = 3, minStopHits = 2)
      .select("doc_id", "n_words", "mean_word_len", "alpha_frac",
        "stop_hits", "gopher_keep")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4),
          r.getBoolean(5))).toMap
    val (n1, len1, alpha1, stop1, keep1) = got(1L)
    assert(n1 == 4L && len1 == 3.0 && alpha1 == 1.0 && stop1 == 3L)
    assert(keep1)
    val (n2, _, _, stop2, keep2) = got(2L)
    assert(n2 == 2L && stop2 == 0L && !keep2)
  }

  test("word-count and mean-length bounds reject") {
    val longWords = Seq((1L, "abcdefghijklmnop abcdefghijklmnop wat"))
      .toDF("doc_id", "text")
    val r = TextFunctions.gopherStats(longWords, "text",
      minWords = 1, minStopHits = 0, minAlphaFrac = 0.0)
      .select("gopher_keep").as[Boolean].head()
    assert(!r) // mean word length 11.3 > 10
  }
}

class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("target-like docs score above target-unlike docs") {
    val source = Seq(
      (1L, "alpha beta alpha beta"), // looks like target
      (2L, "zork gork bork nork"), // does not
      (3L, "alpha zork")) // mixed
      .toDF("doc_id", "text")
    val target = Seq(Tuple1("alpha beta alpha beta alpha beta"))
      .toDF("ttext")
    val got = Corpus.dsirScore(source, "text", "doc_id", target, "ttext",
      buckets = 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got(1L)._1 == 4L)
    assert(got(1L)._2 > got(3L)._2)
    assert(got(3L)._2 > got(2L)._2)
  }

  test("score matches the smoothed log-ratio formula") {
    // single shared token: every hash collision question disappears
    val source = Seq((1L, "tok")).toDF("doc_id", "text")
    val target = Seq(Tuple1("tok tok")).toDF("ttext")
    val got = Corpus.dsirScore(source, "text", "doc_id", target, "ttext",
      buckets = 16)
      .select("dsir_score").as[Double].head()
    val expected = math.log(3.0 / (2 + 16)) - math.log(2.0 / (1 + 16))
    assert(math.abs(got - expected) < 1e-12)
  }
}

class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("keeps one representative per near-dup cluster") {
    // 1↔2 near-identical, 3 orthogonal, 4 near-identical to 1 (chain)
    val df = Seq(
      (1L, vec(1, 0, 0, 0)),
      (2L, vec(0.999, 0.01, 0, 0)),
      (3L, vec(0, 1, 0, 0)),
      (4L, vec(0.998, 0.02, 0, 0)))
      .toDF("vec_id", "embedding")
    val kept = Similarity.semanticDedup(df, "vec_id", "embedding",
      dim = 4, threshold = 0.95, nPlanes = 16, bands = 8)
      .select("vec_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L))
  }

  test("portable mode is deterministic and keeps non-duplicates") {
    val df = Seq(
      (10L, vec(1, 0, 0, 0)),
      (20L, vec(0, 1, 0, 0)),
      (30L, vec(0, 0, 1, 0)))
      .toDF("vec_id", "embedding")
    val kept = Similarity.semanticDedup(df, "vec_id", "embedding",
      dim = 4, threshold = 0.99, portable = true)
      .select("vec_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(10L, 20L, 30L))
  }
}

class PortableHashSpec extends SparkSpec {
  import spark.implicits._

  test("portable simhash: identical texts collide, eval == codegen") {
    val df = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "completely different words here"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simHashNearDup(df, "text", "doc_id", portable = true)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("portable simhash signatures stay within 60 bits") {
    val df = Seq(Tuple1("some text with tokens")).toDF("text")
    val sig = df.select(Dedup.simHash(col("text"), portable = true))
      .as[Long].head()
    assert(sig >= 0L && sig < (1L << 60))
  }

  test("portable plane weights match the md5 formula") {
    val w = Similarity.portablePlanes(2, 3)
    def expected(p: Int, d: Int): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"plane:$p:$d".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 5), 16).toDouble - 524288.0
    }
    assert(w(0)(0) == expected(0, 0) && w(1)(2) == expected(1, 2))
    // spot-check against the DuckDB-verified value (plane:0:0 → 150301)
    assert(w(0)(0) == 150301.0)
  }
}

class GraftExtensionsSpec extends SparkSpec {
  import org.apache.spark.sql.SparkSession

  test("spark.sql.extensions-style injection works in a fresh session") {
    val base = spark // force the shared session (and its context) to exist
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c, " +
          "simhash64(array(1L)) AS s, " +
          "dot_product(array(2.0D), array(3.0D)) AS d").head()
      assert(r.getDouble(0) == 1.0)
      assert(r.getLong(1) == 1L) // single hash 1 → only bit 0 wins the vote
      assert(r.getDouble(2) == 6.0)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}

class ContaminationBloomSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "one two three four five six seven"),
    (2L, "totally unrelated words with no overlap here"),
    (3L, "one two three four five and then more")).toDF("doc_id", "text")
  private val bench = Seq(
    (100L, "zz one two three four five zz")).toDF("doc_id", "text")

  test("bloom path equals the exact contamination result") {
    val exact = Corpus.contamination(docs, "text", "doc_id",
      bench, "text", "doc_id", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bloom = Corpus.contaminationBloom(docs, "text", "doc_id",
      bench, "text", "doc_id", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(bloom == exact)
    assert(bloom.map(_._1) == Set(1L, 3L)) // doc 2 shares no 5-gram
  }

  test("empty benchmark contaminates nothing") {
    val bloom = Corpus.contaminationBloom(docs, "text", "doc_id",
      bench.filter(col("doc_id") < 0), "text", "doc_id", k = 5)
    assert(bloom.count() == 0)
  }
}
