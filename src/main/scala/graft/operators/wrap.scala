package graft.operators

import org.apache.spark.ml.{PipelineStage, Transformer}
import org.apache.spark.ml.feature.{MaxAbsScaler, MinMaxScaler, RobustScaler, StandardScaler, VectorAssembler}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Adapter wrapping an arbitrary `spark.ml` stage into the engine's
  * column-in/column-out convention. Reference: dfpipeline/WrapTransform.py:
  * 53-116 — one deep-copied transformer is fitted PER INPUT COLUMN and its
  * output written back to the paired output column.
  *
  * `mkStage` builds a fresh stage per column (the deep-copy analog). Stages
  * that consume `Vector` columns (StandardScaler & friends) are adapted via
  * `VectorAssembler` + `vector_to_array`; plain-column stages get their
  * `inputCol(s)`/`outputCol(s)` params set by reflection on the Params API.
  * sklearn emits NaN for missing doubles; those are normalized back to null
  * (pandas NaN ⇔ Spark null, SURVEY §1.2).
  */
class WrapTransformer(
    inputs: Seq[String],
    outputs: Seq[String],
    mkStage: () => PipelineStage)
    extends GraftEstimator[WrapTransformerModel] {
  require(inputs.length == outputs.length)

  override def fitDF(df: DataFrame): WrapTransformerModel = {
    val fitted = inputs.zipWithIndex.map { case (in, i) =>
      val tmpIn = s"__wrap_in_$i"
      val tmpOut = s"__wrap_out_$i"
      mkStage() match {
        case v if WrapTransformer.needsVector(v) =>
          val asm = new VectorAssembler()
            .setInputCols(Array(in)).setOutputCol(tmpIn)
            .setHandleInvalid("keep")
          val stage = WrapTransformer.setCols(v, tmpIn, tmpOut)
          val model = stage.asInstanceOf[org.apache.spark.ml.Estimator[_]]
            .fit(asm.transform(df)).asInstanceOf[Transformer]
          FittedWrap(in, tmpOut, Some(asm), model, fromVector = true)
        case e: org.apache.spark.ml.Estimator[_] =>
          val stage = WrapTransformer.setCols(e, in, tmpOut)
          FittedWrap(in, tmpOut, None,
            stage.asInstanceOf[org.apache.spark.ml.Estimator[_]].fit(df)
              .asInstanceOf[Transformer], fromVector = false)
        case t: Transformer =>
          FittedWrap(in, tmpOut, None,
            WrapTransformer.setCols(t, in, tmpOut).asInstanceOf[Transformer],
            fromVector = false)
      }
    }
    new WrapTransformerModel(inputs, outputs, fitted)
  }
}

object WrapTransformer {
  def needsVector(s: PipelineStage): Boolean = s match {
    case _: StandardScaler | _: MinMaxScaler | _: MaxAbsScaler |
        _: RobustScaler => true
    case _ => false
  }

  /** Set inputCol/outputCol (or the plural forms) via the Params API. */
  def setCols(s: PipelineStage, in: String, out: String): PipelineStage = {
    def trySet(name: String, v: Any): Boolean =
      if (s.hasParam(name)) { s.set(s.getParam(name), v); true } else false
    if (!trySet("inputCol", in)) trySet("inputCols", Array(in))
    if (!trySet("outputCol", out)) trySet("outputCols", Array(out))
    s
  }
}

case class FittedWrap(
    in: String,
    tmpOut: String,
    assembler: Option[VectorAssembler],
    model: Transformer,
    fromVector: Boolean)

class WrapTransformerModel(
    ins: Seq[String],
    outs: Seq[String],
    fitted: Seq[FittedWrap])
    extends GraftModel[WrapTransformerModel] {
  override def transformDF(df: DataFrame): DataFrame =
    outs.zip(fitted).foldLeft(df) { case (d, (out, fw)) =>
      val pre = fw.assembler.fold(d)(_.transform(d).toDF())
      val applied = fw.model.transform(pre).toDF()
      val raw: Column =
        if (fw.fromVector)
          element_at(vector_to_array(col(fw.tmpOut)), 1)
        else col(fw.tmpOut)
      val numeric = fw.fromVector ||
        applied.schema(fw.tmpOut).dataType.isInstanceOf[NumericType]
      val cleaned =
        if (numeric)
          when(isnan(raw.cast(DoubleType)), lit(null)).otherwise(raw)
        else raw
      applied
        .withColumn(out, cleaned)
        .drop(fw.assembler.map(_.getOutputCol).toSeq :+ fw.tmpOut: _*)
    }
}
