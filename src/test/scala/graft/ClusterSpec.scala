package graft

import graft.sim.Cluster
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means: planted-blob recovery, bit-exact agreement
  * with a driver-side replay of the portable rules, and the degenerate
  * edges (ties, empty clusters). */
class ClusterSpec extends SparkSpec {
  import spark.implicits._

  /** 3 well-separated 4-dim blobs, deterministic jitter. */
  private def blobs: Seq[(Long, Array[Float])] = {
    val centers = Seq(
      Array(0f, 0f, 0f, 0f),
      Array(10f, 10f, 0f, 0f),
      Array(-10f, 5f, 7f, -3f))
    for (i <- 0 until 90L.toInt) yield {
      val c = centers(i % 3)
      val jit = Array.tabulate(4)(d =>
        (((i * 31 + d * 7) % 11) - 5) * 0.05f)
      (i.toLong, Array.tabulate(4)(d => c(d) + jit(d)))
    }
  }

  test("kMeans recovers planted blobs (pure clusters)") {
    val df = blobs.toDF("vec_id", "embedding")
    val got = Cluster.kMeans(df, "vec_id", "embedding", k = 3, iters = 5,
      dims = 4).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // every true blob lands in exactly one predicted cluster, all distinct
    val byBlob = (0 until 3).map(b =>
      (0 until 90).filter(_ % 3 == b).map(i => got(i.toLong)).distinct)
    assert(byBlob.forall(_.size == 1), s"impure clusters: $byBlob")
    assert(byBlob.map(_.head).distinct.size == 3, "blobs merged")
  }

  test("kMeans matches a driver-side replay of the portable rules") {
    val df = blobs.toDF("vec_id", "embedding")
    val k = 4; val iters = 3; val dims = 4
    val got = Cluster.kMeans(df, "vec_id", "embedding", k, iters, dims)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

    // naive replay: floor-quantize, init first k by id, exact-long means,
    // left-assoc double distance fold, ties to lower id, empty keeps
    val pts = blobs.sortBy(_._1).map { case (id, v) =>
      id -> Array.tabulate(dims)(i =>
        math.floor(v(i).toDouble * 1048576.0))
    }
    var cents = pts.take(k).map(_._2.clone()).toArray
    def d2(x: Array[Double], c: Array[Double]): Double =
      (0 until dims).map(i => (x(i) - c(i)) * (x(i) - c(i))).reduceLeft(_ + _)
    def assign(x: Array[Double]): Int = {
      val ds = cents.map(d2(x, _))
      (0 until k).find(j =>
        ((j + 1) until k).forall(l => ds(j) <= ds(l))).get
    }
    for (_ <- 0 until iters) {
      val cl = pts.map { case (id, x) => (id, x, assign(x)) }
      cents = Array.tabulate(k) { j =>
        val mine = cl.filter(_._3 == j)
        if (mine.isEmpty) cents(j)
        else Array.tabulate(dims)(i =>
          mine.map(_._2(i).toLong).sum.toDouble / mine.size)
      }
    }
    val want = pts.map { case (id, x) => id -> assign(x) }.toMap
    assert(got == want)
  }

  test("identical points: all tie to cluster 0, empty clusters survive") {
    val df = (0L until 6L).map(i => (i, Array(1f, 2f, 3f)))
      .toDF("vec_id", "embedding")
    val got = Cluster.kMeans(df, "vec_id", "embedding", k = 3, iters = 2,
      dims = 3)
    assert(got.select("cluster").distinct().collect().map(_.getInt(0)).toSeq
      == Seq(0))
  }

  test("kMeansSizes partitions the corpus") {
    val df = blobs.toDF("vec_id", "embedding")
    val sizes = Cluster.kMeansSizes(df, "vec_id", "embedding", k = 3,
      iters = 4, dims = 4)
    assert(sizes.agg(sum("n")).head().getLong(0) == 90L)
    assert(sizes.count() == 3)
  }

  test("requires k rows and valid params") {
    val df = Seq((1L, Array(1f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Cluster.kMeans(df, "vec_id", "embedding", k = 5, iters = 1, dims = 1)
    }
  }

  test("exemplars: members of their own cluster, distance-ordered, " +
    "rank-1 is the most central") {
    val df = blobs.toDF("vec_id", "embedding")
    val assign = Cluster.kMeans(df, "vec_id", "embedding", k = 3,
      iters = 4, dims = 4).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ex = Cluster.kMeansExemplars(df, "vec_id", "embedding", k = 3,
      iters = 4, dims = 4, topN = 4).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(ex.length == 12)
    // every exemplar is assigned to the cluster it represents
    ex.foreach { case (c, id, _, _) => assert(assign(id) == c) }
    // within a cluster, dist2 is non-decreasing with rank
    ex.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._3).sliding(2).forall(w =>
        w.length < 2 || w(0) <= w(1)))
      assert(sorted.map(_._4).toSeq == (1L to sorted.length))
    }
  }

  test("exemplars: duplicate vectors tie-break to the lower id") {
    // 6 identical vectors + 2 far ones, k=2: the identical cluster's
    // exemplars must be the lowest ids in order
    val rows = (0L until 6L).map(i => (i, Array(1f, 1f))) ++
      Seq((10L, Array(100f, 100f)), (11L, Array(100f, 100f)))
    val ex = Cluster.kMeansExemplars(rows.toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = 2, iters = 3, dims = 2, topN = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(3)))
    val byCluster = ex.groupBy(_._1).view
      .mapValues(_.sortBy(_._3).map(_._2).toList).toMap
    // one cluster holds the six dups: its top-3 must be ids 0,1,2
    assert(byCluster.values.exists(_ == List(0L, 1L, 2L)))
  }
}
