package graft

import graft.text.Dedup

/** Frequency-thresholded boilerplate removal: cross-doc headers die
  * everywhere, within-doc repeats survive (df = 1), blanks and unique
  * lines stay, trim-keyed identity. */
class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "SITE HEADER\nunique alpha\nSITE HEADER\nfooter text"),
    (2L, "SITE HEADER \nunique beta\n\nfooter text"),
    (3L, "  SITE HEADER\nunique gamma\nrepeat me\nrepeat me\nrepeat me"),
    (4L, "all original\nnothing shared here")
  ).toDF("doc_id", "text")

  test("lines in >= minDocs distinct docs are removed everywhere") {
    val got = Dedup.removeBoilerplate(docs, "text", "doc_id", minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // "SITE HEADER" (trimmed identity, df=3) and "footer text" (df=2) go;
    // within-doc "repeat me" (df=1) stays all three times; blank survives
    assert(got(1L) == (("unique alpha", 4L, 3L)))
    assert(got(2L) == (("unique beta\n", 4L, 2L)))
    assert(got(3L) ==
      (("unique gamma\nrepeat me\nrepeat me\nrepeat me", 5L, 1L)))
    assert(got(4L) == (("all original\nnothing shared here", 2L, 0L)))
  }

  test("threshold above every df removes nothing") {
    val got = Dedup.removeBoilerplate(docs, "text", "doc_id", minDocs = 5)
    assert(got.filter("n_removed > 0").isEmpty)
  }

  test("minDocs below 2 is rejected") {
    intercept[IllegalArgumentException] {
      Dedup.removeBoilerplate(docs, "text", "doc_id", minDocs = 1)
    }
  }
}
