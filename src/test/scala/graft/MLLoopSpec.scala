package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Closes the reference's end-to-end benchmark lifecycle (fit → transform →
  * train → score — the Accuracy/ROC-AUC loop in the reference's
  * benchmarks/RunBench.py:166-176): graft pipeline features →
  * VectorAssembler → spark.ml LogisticRegression on a held-out split.
  * The label (order price above the customer-key mean) is linearly
  * separable in the assembled features, so a working loop must clear
  * AUC 0.5 by a wide margin — failures here mean plumbing, not modeling. */
class MLLoopSpec extends SparkSpec {

  test("fit -> transform -> train -> score: LR on graft features, AUC > 0.5") {
    val d = "/root/testdata/sf0.001"
    val customer = spark.read.parquet(s"$d/customer.parquet")
    val orders = spark.read.parquet(s"$d/orders.parquet")
    val joined = orders.join(broadcast(customer),
        orders("o_custkey") === customer("c_custkey"))
      .select(col("o_orderkey"), col("o_totalprice"),
        col("c_mktsegment"), col("c_nationkey"), col("c_acctbal"))
      .persist()

    val model = DFPipeline(
      new StringConcatenator(Seq(Seq("c_mktsegment", "c_nationkey")),
        Seq("ckey"), "_"),
      new FrequencyEncoder(Seq("ckey"), Seq("ckey_freq"), normalize = true),
      new Aggregator(Seq("o_totalprice"), Seq("cust_price_mean"),
        Seq("ckey"), "mean"),
      new Scaler(Seq("c_acctbal"), Seq("bal_std"), "standard"))
      .fit(joined)

    val feats = model.transform(joined)
      .withColumn("label",
        (col("o_totalprice") > col("cust_price_mean")).cast("double"))
    val assembled = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("o_totalprice", "cust_price_mean", "ckey_freq",
        "bal_std"))
      .setOutputCol("features")
      .transform(feats)
      .select("label", "features")

    val Array(train, test) = assembled.randomSplit(Array(0.8, 0.2), seed = 42)
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setMaxIter(25)
    val scored = lr.fit(train).transform(test)

    val auc = new org.apache.spark.ml.evaluation.BinaryClassificationEvaluator()
      .setMetricName("areaUnderROC")
      .evaluate(scored)
    val accuracy = new org.apache.spark.ml.evaluation
      .MulticlassClassificationEvaluator()
      .setMetricName("accuracy")
      .evaluate(scored)

    joined.unpersist()
    // the true boundary (price > per-key mean) is linear in the assembled
    // features, so a correctly-wired loop lands near-perfect
    assert(auc > 0.9, s"AUC $auc — end-to-end loop is mis-wired")
    assert(accuracy > 0.8, s"accuracy $accuracy")
  }
}
