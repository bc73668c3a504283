package graft

import graft.operators.{Clustering, Similarity}

/** Deterministic k-means: reproducibility, the singleton degeneracy,
  * the empty-cluster carry policy, and the trained-centroid handoff to
  * ivfTopK. The full iterative replay vs DuckDB is q68's hash gate. */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  private def vec(axis: Int, noise: Float): Seq[Float] =
    (0 until dim).map { i =>
      if (i == axis) 1.0f
      else if (i == (axis + 1) % dim) noise
      else 0.0f
    }

  /** 4 axis-aligned clusters of 5, ids 0..19; ids 0..3 seed one cluster
    * each, so training can only sharpen, never scramble. */
  private def corpus = {
    val rows = (0 until 20).map { id =>
      (id.toLong, vec(id % 4, if (id < 4) 0.0f else 0.05f + 0.01f * (id / 4)))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("kmeans is deterministic and recovers planted clusters") {
    val a = Clustering.kmeans(corpus, k = 4, iters = 2).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    val b = Clustering.kmeans(corpus, k = 4, iters = 2).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(a == b)
    // planted structure: id ≡ cluster (mod 4) and seeds are ids 0..3,
    // so cluster labels equal the axis index
    (0L until 20L).foreach { id =>
      assert(a(id)._1 == (id % 4).toInt, s"vec $id in wrong cluster")
      assert(a(id)._2 > 0.99, s"vec $id far from its centroid: ${a(id)._2}")
    }
  }

  test("k = corpus size: every vector is its own cluster at cos 1.0") {
    val small = corpus.filter("vec_id < 4")
    val out = Clustering.kmeans(small, k = 4, iters = 1).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(out.length == 4)
    out.foreach { case (id, cl, cos) =>
      assert(cl == id.toInt && cos == 1.0)
    }
  }

  test("a seed with no members keeps its previous sum") {
    // two seeds pointing the SAME direction: everything ties to the
    // lower cluster id, cluster 1 goes empty and must survive with its
    // seed vector rather than NaN/crash
    val dup = Seq(
      (0L, vec(0, 0.0f)), (1L, vec(0, 0.0f)),
      (2L, vec(0, 0.01f)), (3L, vec(0, 0.02f)))
      .toDF("vec_id", "embedding")
    val sums = Clustering.kmeansCentroidSums(dup, k = 2, iters = 2)
    assert(sums.size == 2)
    // cluster 1's sum is still its (quantized) seed — the id-1 vector
    assert(sums(1).count(_ != 0.0) > 0)
    val assigned = Clustering.assignClusters(dup, sums).collect()
    assert(assigned.forall(_.getInt(1) == 0)) // ties → lowest cluster
  }

  test("centroid means are member-count-scaled sums") {
    // k=1: everything joins the single cluster, so after one round the
    // sum is the whole corpus's quantized sum and the mean divides by 20
    val sums = Clustering.kmeansCentroidSums(corpus, k = 1, iters = 1)
    val means = Clustering.kmeansCentroidMeans(corpus, k = 1, iters = 1)
    assert(sums.size == 1 && means.size == 1)
    sums.head.zip(means.head).foreach { case (s, m) =>
      assert(math.abs(m - s / 20.0) < 1e-12, s"mean $m vs sum $s / 20")
    }
    // and the cosine surfaces are scale-invariant between the two
    val bySums = Clustering.assignClusters(corpus, sums).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val byMeans = Clustering.assignClusters(corpus, means).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(bySums == byMeans)
  }

  test("trained centroids slot into ivfTopK and keep exact top-1") {
    val cents = Clustering.ivfCentroids(corpus, k = 4, iters = 2)
    assert(cents.map(_._1) == Seq(0L, 1L, 2L, 3L))
    val queries = corpus.filter("vec_id < 4")
      .withColumnRenamed("vec_id", "query_id")
    val ivf = Similarity.ivfTopK(corpus, queries, k = 3, numCells = 4,
      nprobe = 1, centroids = cents).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // with one probed cell per query and clean planted cells, IVF's
    // top-1 must agree with brute force
    (0L until 4L).foreach { q =>
      assert(ivf((q, 1)) == exact((q, 1)), s"query $q top-1 diverged")
    }
  }
}
