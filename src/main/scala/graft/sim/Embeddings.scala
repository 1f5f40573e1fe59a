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

  /** Johnson–Lindenstrauss random projection to `dimOut` dimensions — the
    * cost lever in front of every embedding pipeline (ANN candidate
    * generation, near-dup bucketing, clustering all scale with dim;
    * JL preserves pairwise distances within 1±ε for dimOut = O(ln n/ε²),
    * independent of dimIn — public result, Johnson & Lindenstrauss 1984).
    * The projection matrix is generated from the seed on every executor
    * (never shipped, never fitted — nothing to persist) and the whole map
    * is ONE codegen'd Project of fused [[graft.functions.DotProduct]]
    * kernels: no shuffle, no join, scan speed.
    *
    * `portable = true` switches to the md5-derived integer planes over the
    * 2²⁰-quantized vector (see [[Similarity.lshSignature]]): every output
    * coordinate is an integer, exactly representable in double under ANY
    * summation order, so an external SQL engine replays the projection
    * bit-for-bit. The default is the seeded Gaussian family scaled by
    * 1/√dimOut (the classic JL normalization — cosine/distance-comparable
    * to the input space). Output: `idCol` + `proj` (array<double>,
    * length `dimOut`). */
  def randomProjection(
      df: DataFrame, idCol: String, vecCol: String,
      dimIn: Int, dimOut: Int, seed: Long = 42L,
      portable: Boolean = false): DataFrame = {
    require(dimOut >= 1 && dimIn >= 1, "need dimIn, dimOut >= 1")
    val planes =
      if (portable) Similarity.portablePlanes(dimOut, dimIn)
      else {
        val rnd = new scala.util.Random(seed)
        val s = 1.0 / math.sqrt(dimOut)
        Seq.fill(dimOut)(Seq.fill(dimIn)(rnd.nextGaussian() * s))
      }
    val v =
      if (portable) Similarity.quantize(col(vecCol))
      else col(vecCol)
    df.select(col(idCol),
      array(planes.map(p => graft.functions.GraftFunctions
        .dot_product(v, typedlit(p.toArray))): _*).as("proj"))
  }
}
