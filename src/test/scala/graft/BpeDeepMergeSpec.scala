package graft

import graft.text.Bpe
import org.apache.spark.sql.functions.col

/** VERDICT r9 #4: [[Bpe.encodeBpe]] compiles the whole rule table into
  * `numMerges` NESTED `replace` expressions inside one projection — the
  * oracled queries exercise 12 merges, but the API allows 4096. This spec
  * pins the deep-encode path at a REALISTIC merge count (256): the
  * 256-deep expression must evaluate (a >64 KB generated method makes
  * whole-stage codegen fall back to interpreted evaluation — allowed, but
  * it must stay CORRECT), and the result must equal an independent
  * plain-Scala greedy rank-order application that shares no code with the
  * wrapped-string `replace` trick. */
class BpeDeepMergeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference: greedy left-to-right non-overlapping application of one
    * rule (the BpePropsSpec reference, reproduced — independence from the
    * Spark path is the point). */
  private def refApply(toks: Vector[String], l: String, r: String)
      : Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
        b += (l + r); i += 2
      } else { b += toks(i); i += 1 }
    }
    b.result()
  }

  test("encodeBpe with a 256-rule merge table: the nested-replace " +
      "expression evaluates and matches the plain-Scala reference") {
    // 256 synthetic single-char rules (a..p × a..p) in deterministic rank
    // order: every rule is a plausible adjacent pair over the corpus
    // alphabet, so many actually fire on random words — the depth AND the
    // greedy rank-order semantics are both exercised.
    val alphabet = "abcdefghijklmnop"
    val rules = (for {
      l <- alphabet; r <- alphabet
    } yield (l.toString, r.toString)).take(256)
    val merges = rules.zipWithIndex.map { case ((l, r), i) =>
      Bpe.Merge(i + 1, l, r, 1L)
    }
    assert(merges.size == 256)

    val rng = new scala.util.Random(0xD3E9)
    val docs = (1 to 12).map { i =>
      (i.toLong, (1 to (3 + rng.nextInt(5))).map { _ =>
        (1 to (2 + rng.nextInt(10)))
          .map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
      }.mkString(" "))
    }

    def refTokens(text: String): (Long, Long) = {
      val words = text.toLowerCase.split("\\s+")
        .filter(_.matches("[a-z0-9]+"))
      val pieces = words.map { w =>
        merges.foldLeft(w.map(_.toString).toVector) { (t, m) =>
          refApply(t, m.lhs, m.rhs)
        }.size.toLong
      }
      (words.length.toLong, pieces.sum)
    }

    val got = Bpe.encodeBpe(docs.toDF("doc_id", "text"), "text", "doc_id",
        merges)
      .select("doc_id", "n_words", "n_tokens")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    docs.foreach { case (id, text) =>
      assert(got(id) == refTokens(text),
        s"doc $id: got ${got(id)}, want ${refTokens(text)} ($text)")
    }
  }
}
