package graft

import graft.relational.{Analytics, Eval}
import graft.text.Ranking
import org.apache.spark.sql.functions._

/** Seeded randomized properties for the round-7 operators — structural
  * invariants a hand-picked fixture can miss. */
class Round7PropsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260815L)

  test("theilSen: slope is invariant under y-shift and equivariant " +
      "under y-scale (the affine contract of a slope estimator)") {
    val pts = (0 until 40).map(i =>
      ("g", i.toLong, i.toDouble, rnd.nextDouble() * 50 + i * 3.0))
    def slope(rows: Seq[(String, Long, Double, Double)]): Double =
      Analytics.theilSen(rows.toDF("g", "id", "x", "y"),
        "g", "x", "y", "id").collect()(0).getDouble(3)
    val s0 = slope(pts)
    val shifted = slope(pts.map { case (g, id, x, y) => (g, id, x, y + 1000.0) })
    val scaled = slope(pts.map { case (g, id, x, y) => (g, id, x, y * 4.0) })
    // shift: mathematically invariant; (y+c)-(y'+c) rounds differently
    // than y-y' in IEEE, so the pick can move within an ulp-sized band
    assert(math.abs(shifted - s0) < 1e-9)
    // scale by 4 (power of two): every slope scales exactly -> median x4
    assert(scaled == s0 * 4.0)
    // and the fitted slope tracks the planted trend through the noise
    assert(s0 > 1.0 && s0 < 6.0)
  }

  test("tokenEntropy: permutation-invariant, bounded by ln(n_types), " +
      "and zero only for single-type docs") {
    val words = (1 to 30).map(i =>
      Seq.fill(rnd.nextInt(5) + 1)(s"w${rnd.nextInt(6)}")).flatten
    val doc = words.mkString(" ")
    val perm = rnd.shuffle(words).mkString(" ")
    val m = Ranking.tokenEntropy(
      Seq((1L, doc), (2L, perm), (3L, "solo solo solo"))
        .toDF("doc_id", "text"), "text", "doc_id")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(m(1L) == m(2L)) // same multiset -> identical triple
    val (_, types, h) = m(1L)
    assert(h >= 0.0 && h <= math.log(types.toDouble) + 1e-12)
    assert(m(3L)._3 == 0.0)
  }

  test("abcClasses: classes partition the entities, cum_value ends at " +
      "the group total, and every A-row's share is <= every C-row's " +
      "cumulative share within its group") {
    val rows = (1 to 120).map(i =>
      (s"g${i % 3}", s"e$i", (rnd.nextInt(1000) + 1).toLong))
    val got = Analytics.abcClasses(rows.toDF("g", "ent", "v"),
      Seq("g"), "ent", "v").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5)))
    val byG = got.groupBy(_._1)
    assert(got.length == 120 && byG.size == 3)
    byG.foreach { case (g, rs) =>
      val total = rs.map(_._3).sum
      val last = rs.maxBy(_._4)
      assert(last._5 == total, s"$g cum must end at total")
      // ranks are 1..n and cum_value is non-decreasing in rank
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to rs.length).map(_.toLong))
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._5 <= b._5 && a._3 >= b._3
        case _ => true
      })
      // tier boundaries honor the integer cross-multiplication
      sorted.foreach { r =>
        val cls = if (r._5 * 100 <= total * 80) "A"
          else if (r._5 * 100 <= total * 95) "B" else "C"
        assert(r._6 == cls)
      }
    }
  }

  test("jsDivergence: zero iff same distribution, symmetric, and " +
      "monotone in mixture distance") {
    def corpus(weights: Map[String, Int]) =
      weights.toSeq.flatMap { case (w, k) => Seq.fill(k)(w) }
        .zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("doc_id", "text")
    val a = corpus(Map("x" -> 6, "y" -> 3, "z" -> 1))
    def jsd(b: org.apache.spark.sql.DataFrame) =
      Ranking.jsDivergence(a, b, "text").collect()(0).getDouble(3)
    assert(jsd(corpus(Map("x" -> 6, "y" -> 3, "z" -> 1))) == 0.0)
    val mild = jsd(corpus(Map("x" -> 3, "y" -> 6, "z" -> 1)))
    val wild = jsd(corpus(Map("q" -> 10)))
    assert(mild > 0.0 && wild > mild && wild < math.log(2))
  }

  test("isotonic fit == brute-force PAV on random bin profiles") {
    def pav(n: Array[Long], p: Array[Long]): Array[Double] = {
      // classic pool-adjacent-violators over (n, pos) blocks
      case class B(var n: Long, var p: Long)
      val blocks = scala.collection.mutable.ArrayBuffer.empty[B]
      val sizes = scala.collection.mutable.ArrayBuffer.empty[Int]
      for (i <- n.indices) {
        blocks += B(n(i), p(i)); sizes += 1
        while (blocks.length > 1 && {
          val a = blocks(blocks.length - 2); val b = blocks.last
          a.p * b.n >= b.p * a.n // rate(a) >= rate(b): violator
        }) {
          val b = blocks.remove(blocks.length - 1)
          val s = sizes.remove(sizes.length - 1)
          blocks.last.n += b.n; blocks.last.p += b.p
          sizes(sizes.length - 1) += s
        }
      }
      blocks.toSeq.zip(sizes).flatMap { case (b, s) =>
        Seq.fill(s)(b.p.toDouble / b.n) }.toArray
    }
    (1 to 5).foreach { _ =>
      val nBins = 8
      // one row per (bin, label) count so bins land exactly
      val counts = Array.fill(nBins)(rnd.nextInt(20) + 1L)
      val pos = counts.map(c => (rnd.nextInt(c.toInt + 1)).toLong)
      val rows = (0 until nBins).flatMap { b =>
        val s = (b + 0.5) / nBins
        Seq.fill(pos(b).toInt)((s, 1L)) ++
          Seq.fill((counts(b) - pos(b)).toInt)((s, 0L))
      }
      val got = Eval.isotonicCalibration(rows.toDF("score", "label"),
        "score", "label", nBins).collect()
        .map(r => r.getLong(0) -> r.getDouble(4)).toMap
      val want = pav(counts, pos)
      (0 until nBins).foreach { b =>
        assert(math.abs(got(b.toLong) - math.rint(want(b) * 1e6) / 1e6)
          < 1e-9, s"bin $b: got ${got(b.toLong)} want ${want(b)}")
      }
    }
  }
}
