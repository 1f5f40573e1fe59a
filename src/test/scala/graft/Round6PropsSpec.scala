package graft

import graft.relational.{Graph, Relational, Sketches}
import graft.text.{Dedup, Subword}
import org.apache.spark.sql.functions._

/** Seeded randomized properties for the round-6 operators — structured
  * invariants a hand-picked fixture can miss. */
class Round6PropsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260814L)

  test("subword: emitted pieces concatenate back to the word (no [UNK])") {
    // vocabulary = every substring of every word -> no UNK possible, and
    // the greedy pieces must tile each word exactly
    val words = (1 to 60).map(_ =>
      (1 to (rnd.nextInt(8) + 1)).map(_ => ('a' + rnd.nextInt(4)).toChar)
        .mkString).distinct
    val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val vocab = Subword.fitVocab(docs, "text", size = 10000, maxLen = 4)
    val enc = Subword.encode(docs, "text", "doc_id", vocab, maxLen = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    val byId = words.zipWithIndex.map { case (w, i) => i.toLong -> w }.toMap
    enc.foreach { case (id, (nPieces, nUnk, encoded)) =>
      assert(nUnk == 0L, s"unexpected UNK for ${byId(id)}")
      assert(encoded.split(" ").mkString == byId(id))
      assert(encoded.split(" ").length.toLong == nPieces)
    }
  }

  test("boilerplate: kept + removed == n_lines, and minDocs=2 removes " +
      "exactly the cross-doc lines") {
    val shared = Seq("AAA", "BBB", "CCC")
    val docs = (1 to 20).map { i =>
      val own = (1 to 5).map(j => s"own-$i-$j")
      val mix = rnd.shuffle(own ++ rnd.shuffle(shared).take(rnd.nextInt(3)))
      (i.toLong, mix.mkString("\n"))
    }.toDF("doc_id", "text")
    val out = Dedup.removeBoilerplate(docs, "text", "doc_id", minDocs = 2)
      .collect()
    out.foreach { r =>
      val kept =
        if (r.getString(1).isEmpty) 0L
        else r.getString(1).split("\n", -1).length.toLong
      assert(kept + r.getLong(3) == r.getLong(2))
      // no shared line survives anywhere; own lines all survive
      assert(!shared.exists(s => r.getString(1).split("\n", -1).contains(s)))
      assert(r.getString(1).split("\n", -1).count(_.startsWith("own-")) == 5)
    }
  }

  test("pagerank: ranks sum to ~scale on random strongly-messy graphs") {
    for (trial <- 1 to 3) {
      val edges = (1 to 60).map(_ => (s"n${rnd.nextInt(12)}",
        s"n${rnd.nextInt(12)}", (rnd.nextInt(9) + 1).toLong))
        .filter(e => e._1 != e._2)
      val r = Graph.pageRank(edges.toDF("s", "d", "w"), "s", "d", "w", 4)
        .agg(sum("rank")).head.getLong(0)
      // floor leak only: <= (edges + nodes + 2) units per iteration
      assert(r <= 1000000000L && r > 1000000000L - 4 * (60 + 12 + 2) * 2,
        s"trial $trial: mass $r")
    }
  }

  test("triangles equal the brute-force 3-subset count on random graphs") {
    for (_ <- 1 to 3) {
      val vs = (0 until 9).map(i => s"v$i")
      val und = (for (a <- vs; b <- vs if a < b && rnd.nextBoolean())
        yield (a, b)).toSet
      val brute = vs.combinations(3).count { c =>
        val Seq(x, y, z) = c.sorted
        und((x, y)) && und((y, z)) && und((x, z))
      }
      val got = Graph.triangleCount(und.toSeq.toDF("s", "d"), "s", "d")
        .head().getLong(0)
      assert(got == brute.toLong, s"got $got want $brute")
    }
  }

  test("cms estimate >= exact count for every key on random streams") {
    val rows = (1 to 3000).map(_ => ("g", s"k${rnd.nextInt(300)}"))
    val df = rows.toDF("grp", "k")
    val truth = rows.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val est = Sketches.cmsEstimate(Sketches.cmsSketch(df, Seq("grp"), "k"),
        df.select("grp", "k").distinct(), Seq("grp"), "k")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    truth.foreach { case (k, n) =>
      assert(est(k) >= n, s"$k: ${est(k)} < $n")
    }
  }

  test("bloom: inserted keys always probe true under random group splits") {
    val rows = (1 to 1000).map(i => (s"g${i % 7}", s"key-${rnd.nextInt(500)}"))
      .toDF("grp", "k")
    val reg = Sketches.bloomSketch(rows, Seq("grp"), "k")
    val miss = Sketches.bloomContains(reg, rows.distinct(), Seq("grp"), "k")
      .filter(!col("maybe_present")).count()
    assert(miss == 0L)
  }

  test("basket: pair count never exceeds either item count or basket total") {
    val rows = (1 to 600).map(_ =>
      (rnd.nextInt(80).toLong, s"i${rnd.nextInt(12)}")).toDF("b", "i")
    val out = Relational.marketBasketPairs(rows, "b", "i", 1L).collect()
    val nBaskets = rows.select("b").distinct().count()
    assert(out.nonEmpty)
    out.foreach { r =>
      val nAb = r.getLong(2)
      assert(nAb <= nBaskets)
      assert(r.getDouble(4) <= 1.0 + 1e-9 && r.getDouble(5) <= 1.0 + 1e-9)
      assert(r.getDouble(3) > 0.0 && r.getDouble(6) > 0.0)
    }
  }
}
