package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Whole-column embedding math that has to aggregate ACROSS rows (the
  * per-row kernels — cosine, dot, quantize — live in graft.functions as
  * codegen expressions; [[Similarity]] owns the candidate-generation
  * joins). */
object Embeddings {

  /** Per-group mean vector ("domain centroid" — the seed for cluster-
    * balanced curation, drift monitoring, and [[IvfIndex]]-style coarse
    * quantizers). Computed by position: `posexplode` turns the vector
    * column into (group, pos, value) rows whose `avg` partial-aggregates
    * map-side, so the shuffle carries ≤ partitions × groups × dim partial
    * sums — never a vector payload — and no group funnels through one
    * task. The dim-sized `collect_list` reassembly is bounded by the
    * vector width, not the group size. Output: group cols + `centroid`
    * (array<double>, unrounded) + `n_vectors`.
    *
    * Rows whose vector is null are ignored; ragged widths are the
    * caller's bug (positions avg independently, so a short vector just
    * contributes to fewer positions). */
  def groupCentroids(
      df: DataFrame, groupCols: Seq[String], vecCol: String): DataFrame = {
    require(groupCols.nonEmpty, "need >= 1 group column")
    val exploded = df
      .filter(col(vecCol).isNotNull)
      .select(groupCols.map(col) :+
        posexplode(col(vecCol)).as(Seq("__pos", "__v")): _*)
    exploded
      .groupBy((groupCols.map(col) :+ col("__pos")): _*)
      .agg(avg(col("__v")).as("__avg"), count(lit(1)).as("__n"))
      .groupBy(groupCols.map(col): _*)
      .agg(
        transform(
          array_sort(collect_list(struct(col("__pos"), col("__avg")))),
          x => x("__avg")).as("centroid"),
        max(col("__n")).as("n_vectors"))
  }
}
