package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization for ANN (Jégou, Douze, Schmid: "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011): split the
  * vector into `m` subspaces, fit a small k-means codebook per
  * subspace, store each vector as `m` small codes, and answer queries
  * with asymmetric distance computation (ADC) — the exact query
  * subvector against each assigned codeword, summed across subspaces.
  * The memory-side complement to [[IvfIndex]]'s pruning: a 64-float
  * (256-byte) embedding compresses to m≈4 bytes of codes, so a 100-TB
  * embedding corpus scans at ~1/64 the bytes during candidate scoring.
  *
  * 100-TB shape:
  *  - fit: `m` independent Lloyd's fits ([[Cluster.fitQuantized]] on
  *    vector SLICES) — each iteration ONE map-side-combined aggregate
  *    with k·subDim longs of shuffle state; the codebooks are m·k·subDim
  *    doubles of driver state (hundreds of values, not corpus-scale);
  *  - encode: ONE codegen'd projection against codeword LITERALS — no
  *    join, no shuffle, scan speed;
  *  - query: each query's m×k ADC table is computed ON THE DRIVER
  *    (queries are bounded — the lshTopK broadcast-queries contract)
  *    and inlined as array literals; scoring is `element_at` per
  *    subspace + the bounded-heap top-k aggregate — the corpus never
  *    shuffles and pairwise distances never materialize beyond the
  *    heaps.
  *
  * Engine-portable exactness, inherited from [[Cluster]]: codebooks are
  * exact-rational doubles (exact long sums / counts), encode argmins
  * break ties to the lower code via the `<=` cascade, ADC tables fold
  * (q_i − c_i)² LEFT-ASSOCIATIVELY in dimension order, the cross-
  * subspace sum folds in subspace order, and the top-k heap keeps
  * (distance ASC, id ASC) — every step replays bit-for-bit in SQL, so
  * the driver oracle verifies codebooks, codes, and rankings end to
  * end. */
object Pq {

  /** Fitted product quantizer: `codebooks(j)(c)` is codeword `c` of
    * subspace `j` in the quantized integer space. */
  case class PqModel(dim: Int, m: Int, k: Int,
      codebooks: Seq[Array[Array[Double]]]) {
    val subDim: Int = dim / m
  }

  /** Fit one codebook per subspace over the corpus. `dim` must divide
    * evenly into `m` subspaces. */
  def fit(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      m: Int = 4, k: Int = 16, iters: Int = 2): PqModel = {
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    val sub = dim / m
    // the m subspace fits are INDEPENDENT jobs (separate slices, separate
    // persisted projections, separate collected centroids) — submit them
    // from a small thread pool so each fit's job tail back-fills the
    // others' idle executors (round 10, guide §2.6 overlap independent
    // jobs). Results are keyed by subspace index, so scheduling order
    // cannot change the model.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(m, 4))
    val futs = (0 until m).map { j =>
      pool.submit(new java.util.concurrent.Callable[Array[Array[Double]]] {
        def call(): Array[Array[Double]] = Cluster.fitQuantized(
          df.select(col(idCol),
            slice(col(vecCol), j * sub + 1, sub).as("__sub")),
          idCol, "__sub", k, iters, sub)
      })
    }
    val books = futs.map(_.get())
    pool.shutdown()
    PqModel(dim, m, k, books)
  }

  /** Quantized subspace columns `__q{j}_{i}` for subspace `j`. */
  private def quantCols(vecCol: String, model: PqModel, j: Int)
      : Seq[Column] = {
    val sub = model.subDim
    (0 until sub).map(i =>
      floor(element_at(col(vecCol), j * sub + i + 1).cast("double") *
        lit(1048576.0)).cast("double").as(s"__q${j}_$i"))
  }

  /** Encode each vector as `m` code columns `code_0 … code_{m-1}`
    * (ints in [0, k)), carrying `keepCols` through. ONE projection —
    * no shuffle. */
  def encode(df: DataFrame, idCol: String, vecCol: String,
      model: PqModel, keepCols: Seq[String] = Nil): DataFrame = {
    val q = df.select(
      (keepCols.map(col) :+ col(idCol)) ++ (0 until model.m).flatMap(j =>
        quantCols(vecCol, model, j)): _*)
    q.select(
      (keepCols.map(col) :+ col(idCol)) ++ (0 until model.m).map(j =>
        Cluster.argminColP(model.codebooks(j), model.subDim, s"__q${j}_")
          .as(s"code_$j")): _*)
  }

  /** Driver-side ADC table for one query and subspace: entry `c` is the
    * squared distance from the query's quantized subvector to codeword
    * `c`, folded in the same fixed dimension order as the Spark/SQL
    * expressions. */
  private def adcTable(qvec: Seq[Float], model: PqModel, j: Int)
      : Array[Double] = {
    val sub = model.subDim
    val qx = Array.tabulate(sub)(i =>
      math.floor(qvec(j * sub + i).toDouble * 1048576.0))
    model.codebooks(j).map { cw =>
      (0 until sub).map { i =>
        val d = qx(i) - cw(i); d * d
      }.reduceLeft(_ + _)
    }
  }

  /** IVFADC (Jégou et al. §V): prune cells with an [[IvfIndex]], score
    * only the probed cells' vectors by PQ codes — the composition a
    * billion-vector index actually runs: the index stores (cell, id,
    * m code bytes) and the raw vectors never participate at query time.
    *
    * Shape: the corpus side is the index's persisted assignment
    * relation encoded ONCE (a projection); each query's probe cells
    * come from the same centroid-literal expression as IvfIndex.query;
    * the cell match is one equi-join against the broadcast (query,
    * cell) probe relation; ADC scores via a bounded `when`-cascade over
    * the query literals; the bounded heap finishes. With `nProbe =
    * ivf.nCentroids` the result EQUALS [[topK]] over the whole corpus
    * (asserted in PqSpec) — pruning is the only approximation added.
    * Output: (qIdCol, idCol, adist, rank). */
  def ivfAdcTopK(ivf: IvfIndex, model: PqModel, queries: DataFrame,
      qIdCol: String, qVecCol: String, kNn: Int, nProbe: Int): DataFrame = {
    require(nProbe >= 1 && nProbe <= ivf.nCentroids,
      s"nProbe in [1, ${ivf.nCentroids}], got $nProbe")
    val qs = queries.select(col(qIdCol).cast("long"), col(qVecCol))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    require(qs.nonEmpty, "no query rows")
    val codes = encode(ivf.assigned, ivf.idCol, ivf.vecCol, model,
      keepCols = Seq("__cell"))
    val pr = queries
      .withColumn("__probe",
        slice(array_sort(array(
          IvfIndex.cellEntries(col(qVecCol), ivf.centroids)
            .toIndexedSeq: _*)), 1, nProbe))
      .select(col(qIdCol).cast("long").as("__qid"),
        explode(col("__probe")).as("__p"))
      .select(col("__qid"), col("__p.cell").as("__cell"))
    val adist = qs.foldRight(lit(null).cast("double")) {
      case ((qid, qvec), rest) =>
        val d = (0 until model.m).map { j =>
          element_at(lit(adcTable(qvec, model, j)), col(s"code_$j") + 1)
        }.reduceLeft(_ + _)
        when(col("__qid") === qid, d).otherwise(rest)
    }
    codes.join(broadcast(pr), Seq("__cell"))
      .select(col("__qid"),
        struct((-adist).as("score"),
          col(ivf.idCol).cast("long").as("id")).as("__cand"))
      .groupBy(col("__qid"))
      .agg(graft.functions.TopK.collect_top_k(col("__cand"), kNn)
        .as("__top"))
      .select(col("__qid").as(qIdCol),
        posexplode(col("__top")).as(Seq("__pos", "__t")))
      .select(col(qIdCol), col("__t.id").as(ivf.idCol),
        (-col("__t.score")).as("adist"),
        (col("__pos") + 1).cast("long").as("rank"))
  }

  /** ADC top-`kNn` per query: encode the corpus, inline each query's
    * m×k distance table as literals, score with `element_at` sums, and
    * keep the per-query bounded heap. Queries collect to the driver
    * (bounded — the broadcast-queries contract shared with lshTopK).
    * Output: (qIdCol, idCol, adist, rank), rank 1 = nearest by the
    * (adist ASC, id ASC) total order. */
  def topK(df: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      kNn: Int, model: PqModel): DataFrame = {
    val qs = queries.select(col(qIdCol).cast("long"), col(qVecCol))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    require(qs.nonEmpty, "no query rows")
    val enc = encode(df, idCol, vecCol, model)
    val perQuery = qs.map { case (qid, qvec) =>
      val adist = (0 until model.m).map { j =>
        element_at(lit(adcTable(qvec, model, j)), col(s"code_$j") + 1)
      }.reduceLeft(_ + _)
      struct(lit(qid).as("qid"), adist.as("adist"))
    }
    enc
      .select(col(idCol), explode(array(perQuery: _*)).as("__q"))
      .select(col("__q.qid").as(qIdCol),
        struct((-col("__q.adist")).as("score"),
          col(idCol).cast("long").as("id")).as("__cand"))
      .groupBy(col(qIdCol))
      .agg(graft.functions.TopK.collect_top_k(col("__cand"), kNn)
        .as("__top"))
      .select(col(qIdCol), posexplode(col("__top")).as(Seq("__pos", "__t")))
      .select(col(qIdCol), col("__t.id").as(idCol),
        (-col("__t.score")).as("adist"),
        (col("__pos") + 1).cast("long").as("rank"))
  }
}
