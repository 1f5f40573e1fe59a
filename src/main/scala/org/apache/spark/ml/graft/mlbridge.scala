package org.apache.spark.ml.graft

import org.apache.spark.ml.{PipelineModel, Transformer}
import org.apache.spark.ml.util.Identifiable

/** Bridge into `private[ml]` PipelineModel construction, so graft's fused
  * pipeline fit ([[graft.operators.FitFusion]]) can hand back a bona fide
  * `PipelineModel` (same type Spark's `Pipeline.fit` returns — persistence
  * and downstream tooling keep working) while choosing its own fit schedule.
  * Same extension-library pattern as the sql Bridge; nothing else in Spark's
  * namespace is touched.
  */
object MLBridge {
  def pipelineModel(stages: Array[Transformer]): PipelineModel =
    new PipelineModel(Identifiable.randomUID("pipeline"), stages)
}
