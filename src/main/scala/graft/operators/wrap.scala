package graft.operators

import org.apache.spark.ml.{PipelineStage, Transformer}
import org.apache.spark.ml.feature.{MaxAbsScaler, MinMaxScaler, RobustScaler, StandardScaler, VectorAssembler}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Adapter wrapping an arbitrary `spark.ml` stage into the engine's
  * column-in/column-out convention. Reference: dfpipeline/WrapTransform.py:
  * 53-116 — one deep-copied transformer is fitted per input entry and its
  * output written back to the paired output entry, where an entry is a
  * single column OR a column tuple (WrapTransform.py:72-75: a tuple fits ONE
  * transformer over the multi-column frame and writes the multi-column
  * result back to the output tuple).
  *
  * `mkStage` builds a fresh stage per entry (the deep-copy analog). Stages
  * that consume `Vector` columns (StandardScaler & friends) are adapted via
  * `VectorAssembler` + `vector_to_array` — a tuple assembles all its columns
  * into one vector and the fitted output vector is split back positionally.
  * Plain-column stages get their `inputCol(s)`/`outputCol(s)` params set by
  * reflection on the Params API (a tuple requires the stage to support the
  * plural forms, e.g. `org.apache.spark.ml.feature.Imputer`). sklearn emits
  * NaN for missing doubles; those are normalized back to null (pandas NaN ⇔
  * Spark null, SURVEY §1.2).
  */
class WrapTransformer(
    val inputs: Seq[Seq[String]],
    val outputs: Seq[Seq[String]],
    mkStage: () => PipelineStage)
    extends GraftEstimator[WrapTransformerModel] {
  require(inputs.length == outputs.length)
  require(inputs.zip(outputs).forall { case (i, o) => i.length == o.length },
    "each input tuple needs an output tuple of the same arity")

  override def fitDF(df: DataFrame): WrapTransformerModel = {
    val fitted = inputs.zipWithIndex.map { case (ins, i) =>
      val tmpIn = s"__wrap_in_$i"
      val tmpOuts = ins.indices.map(j => s"__wrap_out_${i}_$j")
      mkStage() match {
        case v if WrapTransformer.needsVector(v) =>
          // one assembled vector per tuple → ONE fitted model over all its
          // columns (the reference's tuple semantics), split back by slot
          val asm = new VectorAssembler()
            .setInputCols(ins.toArray).setOutputCol(tmpIn)
            .setHandleInvalid("keep")
          val stage = WrapTransformer.setCols(v, Seq(tmpIn), Seq(tmpOuts.head))
          val model = stage.asInstanceOf[org.apache.spark.ml.Estimator[_]]
            .fit(asm.transform(df)).asInstanceOf[Transformer]
          FittedWrap(ins, Seq(tmpOuts.head), Some(asm), model,
            fromVector = true)
        case e: org.apache.spark.ml.Estimator[_] =>
          val stage = WrapTransformer.setCols(e, ins, tmpOuts)
          FittedWrap(ins, tmpOuts, None,
            stage.asInstanceOf[org.apache.spark.ml.Estimator[_]].fit(df)
              .asInstanceOf[Transformer], fromVector = false)
        case t: Transformer =>
          FittedWrap(ins, tmpOuts, None,
            WrapTransformer.setCols(t, ins, tmpOuts)
              .asInstanceOf[Transformer],
            fromVector = false)
      }
    }
    new WrapTransformerModel(inputs, outputs, fitted)
  }
}

object WrapTransformer {
  /** Single-column entries (the common case). */
  def apply(inputs: Seq[String], outputs: Seq[String],
      mkStage: () => PipelineStage): WrapTransformer =
    new WrapTransformer(inputs.map(Seq(_)), outputs.map(Seq(_)), mkStage)

  /** One fitted stage per column TUPLE (WrapTransform.py:72-75). */
  def tuples(inputs: Seq[Seq[String]], outputs: Seq[Seq[String]],
      mkStage: () => PipelineStage): WrapTransformer =
    new WrapTransformer(inputs, outputs, mkStage)

  def needsVector(s: PipelineStage): Boolean = s match {
    case _: StandardScaler | _: MinMaxScaler | _: MaxAbsScaler |
        _: RobustScaler => true
    case _ => false
  }

  /** Set inputCol/outputCol (or the plural forms) via the Params API. */
  def setCols(
      s: PipelineStage, ins: Seq[String], outs: Seq[String]): PipelineStage = {
    def trySet(name: String, v: Any): Boolean =
      if (s.hasParam(name)) { s.set(s.getParam(name), v); true } else false
    if (ins.length == 1) {
      if (!trySet("inputCol", ins.head)) trySet("inputCols", ins.toArray)
      if (!trySet("outputCol", outs.head)) trySet("outputCols", outs.toArray)
    } else {
      if (!trySet("inputCols", ins.toArray) ||
          !trySet("outputCols", outs.toArray))
        throw new UnsupportedOperationException(
          s"${s.getClass.getSimpleName} has no inputCols/outputCols params; " +
            "a column tuple needs a multi-column stage (or a vector stage, " +
            "which is assembled automatically)")
    }
    s
  }
}

case class FittedWrap(
    ins: Seq[String],
    tmpOuts: Seq[String],
    assembler: Option[VectorAssembler],
    model: Transformer,
    fromVector: Boolean)

class WrapTransformerModel(
    ins: Seq[Seq[String]],
    outs: Seq[Seq[String]],
    fitted: Seq[FittedWrap])
    extends GraftModel[WrapTransformerModel] {
  override def transformDF(df: DataFrame): DataFrame =
    outs.zip(fitted).foldLeft(df) { case (d, (outTuple, fw)) =>
      val pre = fw.assembler.fold(d)(_.transform(d).toDF())
      val applied = fw.model.transform(pre).toDF()
      val withOuts = outTuple.zipWithIndex.foldLeft(applied) {
        case (acc, (out, j)) =>
          val raw: Column =
            if (fw.fromVector)
              element_at(vector_to_array(col(fw.tmpOuts.head)), j + 1)
            else col(fw.tmpOuts(j))
          val numeric = fw.fromVector ||
            applied.schema(fw.tmpOuts(j)).dataType.isInstanceOf[NumericType]
          val cleaned =
            if (numeric)
              when(isnan(raw.cast(DoubleType)), lit(null)).otherwise(raw)
            else raw
          acc.withColumn(out, cleaned)
      }
      withOuts.drop(fw.assembler.map(_.getOutputCol).toSeq ++ fw.tmpOuts: _*)
    }
}
