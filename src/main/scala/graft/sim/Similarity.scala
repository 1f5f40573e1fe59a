package graft.sim

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Brute-force cosine top-k is the exact baseline; the
  * scale path buckets by random-hyperplane LSH signatures so only bucket
  * collisions pay the cosine loop. The cosine itself is the code-generated
  * [[graft.functions.CosineSimilarity]] expression.
  */
object Similarity {

  def cosine(a: Column, b: Column): Column = GraftFunctions.cosine_sim(a, b)

  /** Exact top-k: broadcast the (small) query set against every row, score
    * with the codegen'd cosine, and cut with the [[graft.functions
    * .CollectTopK]] bounded-heap aggregate — partial heaps combine map-side,
    * so the shuffle carries `partitions × k` candidates per query, never all
    * N scored rows of a query through one task. */
  def bruteForceTopK(
      data: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int): DataFrame = {
    val scored = data.crossJoin(broadcast(queries))
      .select(col(qIdCol),
        struct(cosine(col(vecCol), col(qVecCol)).as("score"),
          col(idCol).cast("long").as("id")).as("__cand"))
    scored.groupBy(col(qIdCol))
      .agg(graft.functions.TopK.collect_top_k(col("__cand"), k).as("__top"))
      .select(col(qIdCol), posexplode(col("__top")).as(Seq("__pos", "__t")))
      .select(col(qIdCol), col("__t.id").as(idCol),
        col("__t.score").as("sim"), (col("__pos") + 1).as("rank"))
  }

  /** Deterministic pseudo-random unit-free hyperplanes (seeded). */
  private def planes(nPlanes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  private def dotLit(vec: Column, plane: Seq[Double]): Column =
    GraftFunctions.dot_product(vec, typedlit(plane.toArray))

  /** Pack the sign bits of `nPlanes` hyperplane projections into an int. */
  def lshSignature(
      vec: Column, nPlanes: Int, dim: Int, seed: Long = 42L): Column =
    planes(nPlanes, dim, seed).zipWithIndex
      .map { case (p, i) =>
        when(dotLit(vec, p) >= 0, lit(1 << i)).otherwise(lit(0))
      }
      .reduce(_ + _)

  /** LSH-bucketed ANN top-k: signature bands → bucket join → exact cosine on
    * collisions only. Recall < 1 by construction (report alongside the
    * brute-force baseline); `bands` of `nPlanes/bands` bits each — a pair is
    * a candidate if any band agrees. */
  def lshTopK(
      data: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int, dim: Int, nPlanes: Int = 16, bands: Int = 4,
      seed: Long = 42L): DataFrame = {
    require(nPlanes % bands == 0)
    val r = nPlanes / bands
    val mask = (1 << r) - 1
    def bucketed(df: DataFrame, id: String, vec: String): DataFrame = {
      val sig = lshSignature(col(vec), nPlanes, dim, seed)
      df.withColumn("__sig", sig)
        .select(col(id), col(vec), explode(array((0 until bands).map(j =>
          struct(lit(j).as("band"),
            shiftrightunsigned(col("__sig"), j * r).bitwiseAND(lit(mask))
              .as("bucket"))): _*)).as("__b"))
        .select(col(id), col(vec), col("__b.band"), col("__b.bucket"))
    }
    val cand = bucketed(data, idCol, vecCol)
      .join(bucketed(broadcast(queries), qIdCol, qVecCol), Seq("band", "bucket"))
      .select(col(qIdCol), col(idCol), col(vecCol), col(qVecCol))
      .distinct()
      .withColumn("sim", cosine(col(vecCol), col(qVecCol)))
      .select(col(qIdCol), col(idCol), col("sim"))
    val w = Window.partitionBy(col(qIdCol)).orderBy(col("sim").desc, col(idCol))
    cand.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(qIdCol, idCol, "sim", "rank")
  }

  /** IVF-style ANN top-k: a k-means coarse quantizer (spark.ml KMeans)
    * partitions the corpus into `nCentroids` cells; each query probes its
    * `nProbe` nearest cells and pays the exact cosine only there. The
    * centroid table is tiny and broadcast; the candidate join is an
    * equi-join on the cell id, so the work scales with corpus/nCentroids ×
    * nProbe per query instead of the full corpus. Recall < 1 by
    * construction (probe more cells to trade time for recall). */
  def ivfTopK(
      data: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int, nCentroids: Int = 16, nProbe: Int = 4,
      seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    val spark = data.sparkSession
    import spark.implicits._
    // cluster and probe on L2-NORMALIZED vectors: on the unit sphere L2
    // order equals cosine order, so cells follow the scoring metric even
    // for non-unit-norm embeddings (exact cosine still scores raw vectors)
    def unit(c: Column): Column = {
      val d = c.cast("array<double>")
      val n = sqrt(aggregate(transform(d, x => x * x), lit(0.0),
        (acc, x) => acc + x))
      transform(d, x => when(n === 0, x).otherwise(x / n))
    }
    // persisted: KMeans iterates over it and the assignment reads it again
    val withVec = data.withColumn("__v", array_to_vector(unit(col(vecCol))))
      .persist()
    // coarse quantization doesn't need a converged clustering — random init
    // and few iterations: kmeans|| init plus 20 iterations is ~30 Spark
    // jobs of pure scheduling overhead, and cell QUALITY only shifts the
    // recall/probe tradeoff marginally
    val model = new org.apache.spark.ml.clustering.KMeans()
      .setK(nCentroids).setSeed(seed)
      .setInitMode("random").setMaxIter(8)
      .setFeaturesCol("__v").setPredictionCol("__cell")
      .fit(withVec)
    val assigned = model.transform(withVec)
      .select(col(idCol), col(vecCol), col("__cell"))
    val centers = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }.toSeq
      .toDF("__cell", "__cvec")
    // queries × centroids is tiny: rank cells per query, keep nProbe
    val sq = queries.crossJoin(broadcast(centers))
      .withColumn("__d2", aggregate(
        zip_with(unit(col(qVecCol)), col("__cvec"),
          (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x))
    val probeW = Window.partitionBy(col(qIdCol)).orderBy(col("__d2"),
      col("__cell"))
    val probes = sq.withColumn("__pr", row_number().over(probeW))
      .filter(col("__pr") <= nProbe)
      .select(col(qIdCol), col(qVecCol), col("__cell"))
    val scored = probes.join(assigned, "__cell")
      .select(col(qIdCol),
        struct(cosine(col(vecCol), col(qVecCol)).as("score"),
          col(idCol).cast("long").as("id")).as("__cand"))
    val result = scored.groupBy(col(qIdCol))
      .agg(graft.functions.TopK.collect_top_k(col("__cand"), k).as("__top"))
      .select(col(qIdCol), posexplode(col("__top")).as(Seq("__pos", "__t")))
      .select(col(qIdCol), col("__t.id").as(idCol),
        col("__t.score").as("sim"), (col("__pos") + 1).as("rank"))
      .persist()
    result.count() // materialize, then free the normalized-vector cache
    withVec.unpersist()
    result
  }

  /** Embedding near-duplicate pairs: LSH self-join buckets, then exact
    * cosine ≥ threshold. */
  def embeddingNearDup(
      data: DataFrame, idCol: String, vecCol: String,
      dim: Int, threshold: Double = 0.95, nPlanes: Int = 16, bands: Int = 4,
      maxBucket: Int = 1000, seed: Long = 42L): DataFrame = {
    require(nPlanes % bands == 0)
    val r = nPlanes / bands
    val mask = (1 << r) - 1
    val sig = lshSignature(col(vecCol), nPlanes, dim, seed)
    // persisted: the signature projection feeds the count aggregate and both
    // sides of the pair join
    val buckets = data.withColumn("__sig", sig)
      .select(col(idCol), col(vecCol), explode(array((0 until bands).map(j =>
        struct(lit(j).as("band"),
          shiftrightunsigned(col("__sig"), j * r).bitwiseAND(lit(mask))
            .as("bucket"))): _*)).as("__b"))
      .select(col(idCol), col(vecCol), col("__b.band"), col("__b.bucket"))
      .persist()
    val counts = buckets.groupBy("band", "bucket").count()
    val (ok, countsCached) = graft.text.Dedup.capBuckets(buckets, counts,
      maxBucket, "embeddingNearDup")
    val a = ok.select(col("band"), col("bucket"), col(idCol).as("id_a"),
      col(vecCol).as("__v_a"))
    val b = ok.select(col("band"), col("bucket"), col(idCol).as("id_b"),
      col(vecCol).as("__v_b"))
    val result = a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "__v_a", "__v_b").distinct()
      .withColumn("sim", cosine(col("__v_a"), col("__v_b")))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
      .persist()
    result.count() // materialize, then release the bucket cache
    buckets.unpersist()
    countsCached.unpersist()
    result
  }
}
