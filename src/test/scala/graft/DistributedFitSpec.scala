package graft

import graft.operators._

/** The no-driver-collect encoder fit paths (forced via maxCollect = 0) must
  * produce exactly the same codes/frequencies as the collect paths —
  * including the sentinel-appended-last rule and unseen-value defaults. */
class DistributedFitSpec extends SparkSpec {
  import spark.implicits._

  lazy val train = Seq((1L, Some("a")), (2L, Some("a")), (3L, Some("b")),
    (4L, None)).toDF("row_id", "col1")
  lazy val noNull = Seq((1L, "a"), (2L, "zz")).toDF("row_id", "col1")
  lazy val serve = Seq((1L, "a"), (2L, "UNSEEN")).toDF("row_id", "col1")

  test("distributed CLE fit: null → sentinel sorted in, identical codes") {
    val m = new ComplementLabelEncoder(Seq("col1"), Seq("col1"), maxCollect = 0)
      .fit(train)
    assert(m.dicts.head.isInstanceOf[BigDict])
    assertCol(m.transform(train), "col1", Seq(0, 0, 1, 2))
  }

  test("distributed CLE fit: no-null appends sentinel last; unseen → sentinel") {
    val m = new ComplementLabelEncoder(Seq("col1"), Seq("col1"), maxCollect = 0)
      .fit(noNull)
    assertCol(m.transform(serve), "col1", Seq(0, 2))
  }

  test("distributed frequency fit matches collect path incl. defaults") {
    val df = Seq((1L, "x"), (2L, "x"), (3L, "y"), (4L, "x")).toDF("row_id", "c")
    val big = new FrequencyEncoder(Seq("c"), Seq("n"), normalize = true,
      maxCollect = 0).fit(df)
    assert(big.dicts.head.isInstanceOf[BigFreq])
    val small = new FrequencyEncoder(Seq("c"), Seq("n"), normalize = true)
      .fit(df)
    val serveF = Seq((1L, "x"), (2L, "NEW")).toDF("row_id", "c")
    assert(colOf(big.transform(serveF), "n") ==
      colOf(small.transform(serveF), "n"))
    assertCol(big.transform(serveF), "n", Seq(0.75, 0.0))
  }

  test("multi-column forced BigDict fit matches the collect path exactly") {
    // one shared distinct-pairs scan must yield per-column BigDicts whose
    // codes equal the SmallDict (collect) fit on every column at once —
    // including a null-bearing column and a no-null column in the SAME fit
    val train = Seq(
      (1L, Some("a"), "x", Some(10)), (2L, Some("b"), "y", Some(20)),
      (3L, None, "y", None), (4L, Some("a"), "z", Some(10)))
      .toDF("row_id", "c1", "c2", "c3")
    val serve = Seq((1L, "a", "z", "10"), (2L, "NEW", "nope", "99"))
      .toDF("row_id", "c1", "c2", "c3")
    val big = new ComplementLabelEncoder(
      Seq("c1", "c2", "c3"), Seq("o1", "o2", "o3"), maxCollect = 0)
      .fit(train)
    assert(big.dicts.forall(_.isInstanceOf[BigDict]))
    val small = new ComplementLabelEncoder(
      Seq("c1", "c2", "c3"), Seq("o1", "o2", "o3")).fit(train)
    assert(small.dicts.forall(!_.isInstanceOf[BigDict]))
    val a = big.transform(serve).orderBy("row_id").collect().toSeq
    val b = small.transform(serve).orderBy("row_id").collect().toSeq
    assert(a == b)
    // null-bearing column: sentinel sorted in ("extra_category_" > "b");
    // no-null column: sentinel appended last (code = vocab size)
    assertCol(big.transform(train), "o1", Seq(0, 1, 2, 0))
    assertCol(big.transform(serve), "o2", Seq(2, 3))
  }

  test("big-dict model survives save/load") {
    val model = DFPipeline(
      new ComplementLabelEncoder(Seq("col1"), Seq("col1"), maxCollect = 0))
      .fit(train)
    val dir = "target/tmp/persist_bigdict"
    GraftPersistence.save(model, dir)
    val loaded = GraftPersistence.load(spark, dir)
    assertCol(loaded.transform(serve), "col1", Seq(0, 2))
  }
}
