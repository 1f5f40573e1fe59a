package graft

import graft.relational.Relational
import graft.text.{Corpus, Dedup, Ranking}
import org.apache.spark.sql.functions._

/** Round-4 operators: TF-IDF keywords, bigram LM quality, duplicated-span
  * ranges, GPT-style sequence packing, and pivot. */
class TfidfSpec extends SparkSpec {
  import spark.implicits._

  test("tfidf ranks doc-specific terms above corpus-wide ones") {
    val df = Seq(
      (1L, "apple apple banana common"),
      (2L, "cherry common banana"),
      (3L, "common common date"))
      .toDF("doc_id", "text")
    val out = Ranking.tfidfTopTerms(df, "text", "doc_id", kTerms = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(4)) -> (r.getString(1), r.getLong(2)))
      .toMap
    // doc 1: apple tf=2 df=1 → 2·ln3 top; banana tf=1 df=2 beats common df=3
    assert(out((1L, 1)) == ("apple", 2L))
    assert(out((1L, 2)) == ("banana", 1L))
    // doc 3: date df=1 → ln3 ≈ 1.10 beats common 2·ln(1)=0
    assert(out((3L, 1)) == ("date", 1L))
    // ties and zero scores still fill k deterministically (term asc)
    assert(out((3L, 2)) == ("common", 2L))
  }

  test("tfidf values match the formula") {
    val df = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = Ranking.tfidfTopTerms(df, "text", "doc_id", 3)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(3))
      .toMap
    assert(math.abs(got((1L, "a")) - 2 * math.log(2.0 / 1)) < 1e-12)
    assert(math.abs(got((1L, "b")) - 1 * math.log(2.0 / 2)) < 1e-12)
    assert(math.abs(got((2L, "c")) - 1 * math.log(2.0 / 1)) < 1e-12)
  }
}

class BigramLogProbSpec extends SparkSpec {
  import spark.implicits._

  test("mean ln P(w2|w1) with prefix-count normalization") {
    // bigrams: (a b) ×2 from docs 1,2; (a c) ×1; prefix a count = 3
    val df = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val got = Ranking.bigramLogProb(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got(1L)._1 == 1L)
    assert(math.abs(got(1L)._2 - math.log(2.0 / 3)) < 1e-12)
    assert(math.abs(got(3L)._2 - math.log(1.0 / 3)) < 1e-12)
  }

  test("docs with fewer than 2 tokens are absent; order matters") {
    val df = Seq((1L, "one"), (2L, "x y x y"), (3L, "y x y x"))
      .toDF("doc_id", "text")
    val out = Ranking.bigramLogProb(df, "text", "doc_id")
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(2L, 3L))
    // doc 2 bigrams: xy, yx, xy; doc 3: yx, xy, yx — same multiset of
    // probabilities here by symmetry, but both must use ONLY their own
    val n = out.filter(col("doc_id") === 2L).head().getLong(1)
    assert(n == 3L)
  }
}

class SpanRangesSpec extends SparkSpec {
  import spark.implicits._

  test("overlapping and adjacent grams merge; gaps split") {
    // doc 1 owns everything; doc 2 repeats tokens 1..6 (two overlapping
    // 5-grams → one span) and, after a unique gap, tokens 12..16
    val owner = "t1 t2 t3 t4 t5 t6 zz zz2 zz3 zz4 zz5 s1 s2 s3 s4 s5"
    val copier = "t1 t2 t3 t4 t5 t6 uq1 uq2 uq3 uq4 uq5 s1 s2 s3 s4 s5"
    val df = Seq((1L, owner), (2L, copier)).toDF("doc_id", "text")
    val out = Dedup.duplicateSpanRanges(df, "text", "doc_id", k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    // span 1: starts 1,2 → [1, 6], 2 grams, 6 tokens
    // span 2: start 12 → [12, 16], 1 gram, 5 tokens
    assert(out == Set((2L, 1L, 6L, 2L, 6L), (2L, 12L, 16L, 1L, 5L)))
  }

  test("ranges cover exactly what removeDuplicateSpans deletes") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "x1 a b c d e x2 x3 x4 f g h i j x5"),
      (3L, "a b c d e x2 x3 x4 f g h i j"))
      .toDF("doc_id", "text")
    val ranges = Dedup.duplicateSpanRanges(docs, "text", "doc_id", k = 5)
    val removed = Dedup.removeDuplicateSpans(docs, "text", "doc_id", k = 5)
    val covered = ranges.groupBy("doc_id")
      .agg(sum("span_tokens").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nRemoved = removed.filter(col("n_removed") > 0)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(covered == nRemoved)
  }
}

class DedupLinesSpec extends SparkSpec {
  import spark.implicits._

  test("first occurrence wins globally; blanks and order survive") {
    val df = Seq(
      (1L, "alpha\nshared one\nbeta"),
      (2L, "shared one\n\ngamma\nshared two"),
      (3L, "shared two\nshared one\ndelta"))
      .toDF("doc_id", "text")
    val got = Dedup.dedupLines(df, "text", "doc_id")
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(1L) == ("alpha\nshared one\nbeta", 3L, 0L))
    // doc 2 loses "shared one" (doc 1 owns it), keeps the blank line
    assert(got(2L) == ("\ngamma\nshared two", 4L, 1L))
    // doc 3 loses both shared lines
    assert(got(3L) == ("delta", 3L, 2L))
  }

  test("line identity trims; a doc losing every line yields empty text") {
    val df = Seq((1L, "only line"), (2L, "  only line  "))
      .toDF("doc_id", "text")
    val got = Dedup.dedupLines(df, "text", "doc_id")
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(3))).toMap
    assert(got(1L) == ("only line", 0L))
    assert(got(2L) == ("", 1L))
  }
}

class PackSequencesSpec extends SparkSpec {
  import spark.implicits._

  test("slices reassemble every doc and fill every sequence exactly") {
    val docs = (0L until 40L).map(i =>
      (i, (0 until (3 + (i % 7)).toInt).map(j => s"w${i}_$j").mkString(" ")))
    val df = docs.toDF("doc_id", "text")
    val out = Corpus.packSequences(df, "text", "doc_id",
      ctxTokens = 10, nShards = 2).collect()

    // every doc's slices cover [0, n) contiguously and rebuild its text
    val byDoc = out.groupBy(_.getLong(2))
    for ((id, rows) <- byDoc) {
      val sorted = rows.sortBy(_.getLong(3)) // doc_offset
      val rebuilt = sorted.map(_.getString(6)).mkString(" ")
      assert(rebuilt == docs.find(_._1 == id).get._2, s"doc $id")
      val offsets = sorted.map(r => (r.getLong(3), r.getLong(5)))
      offsets.foldLeft(0L) { case (expect, (off, n)) =>
        assert(off == expect, s"doc $id gap"); off + n
      }
    }

    // every (shard, seq) holds exactly ctx tokens, except the last per shard
    val byShard = out.groupBy(_.getInt(0))
    for ((shard, rows) <- byShard) {
      val bySeq = rows.groupBy(_.getLong(1)).toSeq.sortBy(_._1)
      val last = bySeq.map(_._1).max
      for ((seq, srows) <- bySeq) {
        val total = srows.map(_.getLong(5)).sum
        if (seq != last) assert(total == 10L, s"shard $shard seq $seq")
        else assert(total >= 1L && total <= 10L)
        // seq_offsets tile [0, total)
        val tiles = srows.sortBy(_.getLong(4)).map(r =>
          (r.getLong(4), r.getLong(5)))
        tiles.foldLeft(0L) { case (expect, (off, n)) =>
          assert(off == expect); off + n
        }
      }
      // seq indices are 0..last with no holes
      assert(bySeq.map(_._1) == (0L to last))
    }
  }

  test("a doc longer than ctx spans multiple sequences") {
    val df = Seq((1L, (0 until 25).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Corpus.packSequences(df, "text", "doc_id", 10, 1)
      .orderBy("seq_index").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L))
    assert(out.map(_.getLong(5)).toSeq == Seq(10L, 10L, 5L))
    assert(out.map(_.getLong(3)).toSeq == Seq(0L, 10L, 20L)) // doc_offset
    assert(out.map(_.getLong(4)).toSeq == Seq(0L, 0L, 0L))   // seq_offset
  }
}

class QuantileBinnerSpec extends SparkSpec {
  import spark.implicits._

  test("quartile bins: boundary values fall in the lower bin, nulls stay") {
    // values 1..8: cuts at 2.75, 4.5, 6.25
    val df = ((1 to 8).map(v => (v.toLong, Some(v.toDouble))) :+
      (9L, Option.empty[Double])).toDF("id", "v")
    val m = new graft.operators.QuantileBinner(Seq("v"), Seq("b"), 4).fit(df)
    val got = m.transform(df).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) -1 else r.getInt(2)))
      .toMap
    assert(got == Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1, 5L -> 2, 6L -> 2,
      7L -> 3, 8L -> 3, 9L -> -1))
  }

  test("distributed fit equals the single-aggregate fit") {
    val df = (1 to 500).map(i => ((i * 37) % 501).toDouble).toDF("v")
    val a = new graft.operators.QuantileBinner(Seq("v"), Seq("b"), 5)
      .fit(df).cuts
    val b = new graft.operators.QuantileBinner(Seq("v"), Seq("b"), 5,
      distributedPercentiles = true).fit(df).cuts
    assert(a == b)
  }

  test("all-null fit column bins to null") {
    val df = Seq((1L, Option.empty[Double]), (2L, None)).toDF("id", "v")
    val out = new graft.operators.QuantileBinner(Seq("v"), Seq("b"), 4)
      .fit(df).transform(df)
    assert(out.collect().forall(_.isNullAt(2)))
  }
}

class QuantileBinnerFusionSpec extends SparkSpec {
  import spark.implicits._

  test("binner fuses into the scalar fit with identical cuts") {
    val df = (1 to 100).map(i => (i.toLong, i.toDouble, (101 - i).toDouble))
      .toDF("id", "x", "y")
    val binner = () => new graft.operators.QuantileBinner(
      Seq("x"), Seq("xb"), 4)
    val winsor = () => new graft.operators.Winsorizer(
      Seq("y"), Seq("yw"), 0.05, 0.95)
    val fused = graft.operators.FitFusion.fitPipeline(
      Array(binner(), winsor()), df)
    val solo = binner().fit(df)
    val fusedBinner = fused.stages.collectFirst {
      case m: graft.operators.QuantileBinnerModel => m
    }.get
    assert(fusedBinner.cuts == solo.cuts)
    val a = fused.transform(df).select("id", "xb", "yw").collect().toSeq
    val b = winsor().fit(df).transform(solo.transform(df))
      .select("id", "xb", "yw").collect().toSeq
    assert(a.sortBy(_.getLong(0)) == b.sortBy(_.getLong(0)))
  }
}

class PivotSpec extends SparkSpec {
  import spark.implicits._

  test("pivot equals conditional aggregation") {
    val df = Seq(("a", "x", 1.0), ("a", "y", 2.0), ("a", "x", 3.0),
      ("b", "y", 4.0)).toDF("g", "p", "v")
    val got = Relational.pivotAgg(df, Seq("g"), "p", Seq("x", "y"), sum("v"))
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(got("a") == (Some(4.0), Some(2.0)))
    assert(got("b") == (None, Some(4.0))) // no 'x' rows → null, not 0
  }
}
