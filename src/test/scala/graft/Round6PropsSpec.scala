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

  test("hh: the cnt <= true <= cnt+floor invariant holds for EVERY item " +
      "on random zipf-ish streams, kept or dropped, any k") {
    for (trial <- 1 to 3) {
      val k = rnd.nextInt(6) + 2
      val rows = (1 to 2000).map { _ =>
        // zipf-ish: low item ids much more frequent
        val item = math.min(rnd.nextInt(40), rnd.nextInt(40))
        (s"s${rnd.nextInt(5)}", f"i$item%02d")
      }
      val df = rows.toDF("sub", "k").withColumn("grp", lit("g"))
      val daily = Sketches.hhSketch(df, Seq("grp", "sub"), "k", k = k)
      val merged = Sketches.hhMerge(daily.drop("sub"), Seq("grp"), k = k)
      val floorV = merged.filter(col("item").isNull)
        .select("cnt").head().getLong(0)
      val kept = merged.filter(col("item").isNotNull)
        .select("item", "cnt").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val truth = rows.groupBy(_._2).map { case (i, v) =>
        i -> v.size.toLong }
      truth.foreach { case (item, n) =>
        kept.get(item) match {
          case Some(lo) =>
            assert(lo <= n && n <= lo + floorV,
              s"trial $trial k=$k $item: lo $lo true $n floor $floorV")
          case None =>
            assert(n <= floorV,
              s"trial $trial k=$k dropped $item true $n > floor $floorV")
        }
      }
    }
  }

  test("skyline2 equals brute-force dominance on random point clouds") {
    import graft.relational.Analytics
    for (trial <- 1 to 3) {
      val pts = (1 to 200).map(_ => (s"g${rnd.nextInt(3)}",
        rnd.nextInt(20), rnd.nextInt(20)))
      val got = Analytics.skyline2(pts.toDF("g", "x", "y"),
          Seq("g"), "x", "y")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
        .sorted.toSeq
      val expect = pts.filter { case (g, x, y) =>
        !pts.exists { case (g2, x2, y2) =>
          g2 == g && x2 >= x && y2 >= y && (x2 > x || y2 > y) }
      }.sorted
      assert(got == expect, s"trial $trial")
    }
  }

  test("joinDelta-maintained join equals the full recompute on random " +
      "tables and random delta splits") {
    import graft.relational.Analytics
    for (trial <- 1 to 3) {
      val lAll = (1 to 120).map(i => (rnd.nextInt(30), s"l$i"))
      val rAll = (1 to 80).map(i => (rnd.nextInt(30), s"r$i"))
      val (lOldS, lNewS) = lAll.partition(_ => rnd.nextBoolean())
      val (rOldS, rNewS) = rAll.partition(_ => rnd.nextBoolean())
      val Seq(lo, ln) = Seq(lOldS, lNewS).map(_.toDF("k", "lv"))
      val Seq(ro, rn) = Seq(rOldS, rNewS).map(_.toDF("j", "rv"))
      val maintained = lo.join(ro, lo("k") === ro("j"))
        .unionByName(Analytics.joinDelta(lo, ln, ro, rn,
          Seq("k"), Seq("j")))
        .select("k", "lv", "rv").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2)))
        .sorted.toSeq
      val full = lAll.flatMap { case (k, lv) =>
        rAll.collect { case (j, rv) if j == k => (k, lv, rv) } }.sorted
      assert(maintained == full, s"trial $trial")
    }
  }

  test("association: chi2 and mi match a direct Scala computation over " +
      "the full contingency table on random categorical data") {
    import graft.relational.Analytics
    for (trial <- 1 to 3) {
      val rows = (1 to 500).map(_ =>
        (s"a${rnd.nextInt(4)}", s"b${rnd.nextInt(3)}"))
      val r = Analytics.association(rows.toDF("a", "b"), "a", "b").head()
      val n = rows.size.toDouble
      val cells = rows.groupBy(identity).map { case (k, v) =>
        k -> v.size.toDouble }
      val ra = rows.groupBy(_._1).map { case (k, v) => k -> v.size.toDouble }
      val cb = rows.groupBy(_._2).map { case (k, v) => k -> v.size.toDouble }
      val chi2 = (for { a <- ra.keys; b <- cb.keys } yield {
        val e = ra(a) * cb(b) / n
        val o = cells.getOrElse((a, b), 0.0)
        (o - e) * (o - e) / e
      }).sum
      val mi = cells.map { case ((a, b), o) =>
        o / n * math.log(o * n / (ra(a) * cb(b))) }.sum
      assert(math.abs(r.getDouble(3) - chi2) < 1e-4, s"trial $trial chi2")
      assert(math.abs(r.getDouble(4) - mi) < 1e-4, s"trial $trial mi")
      assert(r.getLong(2) == (ra.size - 1L) * (cb.size - 1L))
    }
  }

  test("ols: slope and intercept match the closed-form least squares on " +
      "random point sets") {
    import graft.relational.Analytics
    for (trial <- 1 to 3) {
      val pts = (1 to 50).map(_ =>
        (rnd.nextDouble() * 10, rnd.nextDouble() * 10))
      val r = Analytics.groupedOls(
        pts.toDF("x", "y").withColumn("g", lit("g")),
        Seq("g"), "x", "y").head()
      val n = pts.size.toDouble
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxx = pts.map(p => p._1 * p._1).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val intercept = sy / n - slope * sx / n
      assert(math.abs(r.getDouble(2) - slope) < 1e-5, s"trial $trial")
      assert(math.abs(r.getDouble(3) - intercept) < 1e-5, s"trial $trial")
    }
  }

  test("attribution: first and last models attribute the SAME conversion " +
      "set — per-model conversion and value totals are equal") {
    import graft.relational.Analytics
    val rows = (1 to 400).map { i =>
      val t = Seq("ad", "email", "social", "buy")(rnd.nextInt(4))
      (rnd.nextInt(25).toLong, rnd.nextInt(1000).toLong, i.toLong, t,
        rnd.nextInt(50).toDouble)
    }.toDF("u", "o", "id", "t", "v")
    val out = Analytics.attribution(rows, "u", "o", "id", "t", "v", "buy")
      .collect().map(r => r.getString(1) -> (r.getLong(2), r.getDouble(3)))
    val byModel = out.groupBy(_._1).map { case (m, v) =>
      m -> ((v.map(_._2._1).sum, v.map(_._2._2).sum)) }
    assert(byModel("last")._1 == byModel("first")._1)
    assert(math.abs(byModel("last")._2 - byModel("first")._2) < 1e-6)
  }
}
