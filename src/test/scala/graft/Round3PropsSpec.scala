package graft

import graft.relational.Relational
import graft.text.Corpus
import org.apache.spark.sql.functions._

/** Seeded randomized properties for the round-3 operators — the structured
  * invariants a hand-picked fixture can miss. */
class Round3PropsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812L)

  test("rangeJoin equals the brute-force inequality join on random data") {
    val left = (1 to 300).map(i =>
      (rnd.nextInt(10).toLong, i.toLong, rnd.nextLong() % 100000L))
      .toDF("k", "lid", "lts")
    val right = (1 to 300).map(i =>
      (rnd.nextInt(10).toLong, 1000L + i, rnd.nextLong() % 100000L))
      .toDF("k", "rid", "rts")
    // asymmetric window incl. negative timestamps (floorDiv binning)
    val (lo, hi) = (-7000L, 3000L)
    val got = Relational.rangeJoin(left, right, "lts", "rts", Seq("k"),
        lo, hi, Seq("rid"))
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = left.join(right, "k")
      .filter(col("rts").between(col("lts") + lo, col("lts") + hi))
      .select("lid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute && got.nonEmpty)
  }

  test("sessionize: gaps within a session <= gap; session starts exceed it") {
    val us = 1000000L
    val events = (1 to 500).map { i =>
      (rnd.nextInt(5).toLong, math.abs(rnd.nextLong()) % (100000L * us),
        i.toLong)
    }.toDF("user_id", "ts_us", "event_id")
      .withColumn("ts", timestamp_micros(col("ts_us")))
    val gap = 600L
    val out = Relational.sessionize(events, Seq("user_id"), "ts",
        "event_id", gap)
      .select("user_id", "ts_us", "session_index").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._2).toSeq
      sorted.sliding(2).foreach {
        case Seq((_, t1, s1), (_, t2, s2)) =>
          if (s1 == s2) assert(t2 - t1 <= gap * us)
          else {
            assert(s2 == s1 + 1, "session indices are consecutive")
            assert(t2 - t1 > gap * us)
          }
        case _ => ()
      }
      assert(sorted.head._3 == 0L)
    }
  }

  test("mixSources: every row appears floor(w) or ceil(w) times") {
    val docs = (0L until 500L).map(i => (i, s"s${i % 3}")).toDF("id", "src")
    val w = Map("s0" -> 1.7, "s1" -> 0.4, "s2" -> 3.0)
    val out = Corpus.mixSources(docs, "id", "src", w, 1.0)
    val counts = out.groupBy("id", "src").count().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    counts.foreach { case (_, src, n) =>
      val ww = w(src)
      assert(n == math.floor(ww).toLong || n == math.ceil(ww).toLong,
        s"$src row repeated $n times for weight $ww")
    }
    // dropped rows only come from fractional weights < 1
    val present = counts.map(_._1).toSet
    (0L until 500L).filterNot(present).foreach(i =>
      assert(i % 3 == 1, s"row $i dropped but its weight is >= 1"))
  }

  test("winsorizer: outputs inside fitted bounds, clipping is monotone") {
    val df = (1 to 400)
      .map(i => (i.toLong, rnd.nextGaussian() * 1000.0))
      .toDF("row_id", "v")
    val m = new operators.Winsorizer(Seq("v"), Seq("w"), 0.1, 0.9).fit(df)
    val (lo, hi) = (m.bounds.head._1.get, m.bounds.head._2.get)
    val out = m.transform(df).select("v", "w").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    out.foreach { case (v, w) =>
      assert(w >= lo && w <= hi)
      assert(w == math.min(math.max(v, lo), hi))
    }
    // ~20% of a gaussian sample must actually clip
    assert(out.count { case (v, w) => v != w } > 40)
  }
}
