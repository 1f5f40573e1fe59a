package graft

import org.apache.spark.sql.functions._

import graft.operators.{HashingEncoder, TargetEncoder}

class HashingEncoderSpec extends SparkSpec {
  import spark.implicits._

  test("buckets are in range, deterministic, and column-name-salted") {
    val df = Seq(("a", "a"), ("b", "b"), (null, "c"))
      .toDF("x", "y")
    val out = new HashingEncoder(Seq("x", "y"), Seq("xb", "yb"), 64)
      .transform(df)
    val rows = out.collect()
    val xb = rows.map(r => Option(r.get(2)).map(_.asInstanceOf[Int]))
    val yb = rows.map(r => r.getInt(3))
    assert(yb.forall(b => b >= 0 && b < 64))
    assert(xb(2).isEmpty, "null input must stay null")
    // same value hashed under different column names diverges
    assert(xb(0).get != yb(0) || xb(1).get != yb(1))
    // determinism: rerun produces identical buckets
    val again = new HashingEncoder(Seq("y"), Seq("yb"), 64)
      .transform(df).collect().map(_.getInt(2))
    assert(again.sameElements(yb))
  }

  test("pure projection: no shuffle in the plan") {
    val df = Seq(("a", 1)).toDF("x", "n")
    val plan = new HashingEncoder(Seq("x"), Seq("xb"), 16).transform(df)
      .queryExecution.executedPlan
    assert(plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.isEmpty)
  }
}

class TargetEncoderSpec extends SparkSpec {
  import spark.implicits._

  // ids chosen so folds(md5) split the category across folds
  private val train = Seq(
    (1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 30.0),
    (4L, "b", 100.0), (5L, "b", 200.0), (6L, "c", 5.0)
  ).toDF("id", "cat", "y")

  test("OOF encoding excludes the row's own fold; smoothing pulls to prior") {
    val m = 2.0
    val enc = new TargetEncoder(Seq("cat"), Seq("cat_te"), "y", "id",
      nFolds = 2, smoothing = m)
    val model = enc.fit(train)
    val prior = train.agg(avg("y")).head().getDouble(0)
    val fold = train.select(col("id"),
        TargetEncoder.foldOf(col("id"), 2).as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = train.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val got = model.transformTrain(train)
      .select("id", "cat_te").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((id, cat, _) <- rows) {
      val others = rows.filter(t => t._2 == cat && fold(t._1) != fold(id))
      val expect =
        (others.map(_._3).sum + m * prior) / (others.length + m)
      assert(math.abs(got(id) - expect) < 1e-9,
        s"id=$id cat=$cat got ${got(id)} expect $expect")
    }
  }

  test("serve path: all-data smoothed mean; unseen value gets the prior") {
    val m = 2.0
    val model = new TargetEncoder(Seq("cat"), Seq("cat_te"), "y", "id",
      nFolds = 2, smoothing = m).fit(train)
    val prior = train.agg(avg("y")).head().getDouble(0)
    val serve = Seq((10L, "a"), (11L, "zzz"), (12L, null))
      .toDF("id", "cat")
    val got = model.transform(serve).select("id", "cat_te").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expectA = (10.0 + 20.0 + 30.0 + m * prior) / (3 + m)
    assert(math.abs(got(10L) - expectA) < 1e-9)
    assert(math.abs(got(11L) - prior) < 1e-9, "unseen -> prior")
    assert(math.abs(got(12L) - prior) < 1e-9, "null -> prior")
  }

  test("distributed (big) fitted state matches the literal-map path") {
    val small = new TargetEncoder(Seq("cat"), Seq("te"), "y", "id",
      nFolds = 2, smoothing = 2.0).fit(train)
    val big = new TargetEncoder(Seq("cat"), Seq("te"), "y", "id",
      nFolds = 2, smoothing = 2.0, maxCollect = 0L).fit(train)
    def dump(m: graft.operators.TargetEncoderModel) =
      m.transformTrain(train).select("id", "te").collect()
        .map(r => r.getLong(0) -> math.rint(r.getDouble(1) * 1e9))
        .toMap
    assert(dump(small) == dump(big))
    val serve = Seq((10L, "a"), (11L, "zzz")).toDF("id", "cat")
    def dumpServe(m: graft.operators.TargetEncoderModel) =
      m.transform(serve).select("id", "te").collect()
        .map(r => r.getLong(0) -> math.rint(r.getDouble(1) * 1e9)).toMap
    assert(dumpServe(small) == dumpServe(big))
  }
}
