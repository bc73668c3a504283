package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** IVF-Flat ANN: cell assignment + probing semantics on a corpus with
  * known cluster structure, and the nprobe=numCells exactness
  * degeneracy on arbitrary data. (The LSH path is covered by the q28
  * recall probe and DedupSpec; brute force by q26.) */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  /** 4 well-separated clusters along distinct axes; ids 0..3 are one
    * seed vector per cluster (the deterministic centroids), 4..19 are
    * members with small fixed off-axis noise. */
  private def clustered = {
    def vec(axis: Int, noise: Float): Seq[Float] =
      (0 until dim).map { i =>
        if (i == axis * 2) 1.0f
        else if (i == axis * 2 + 1) noise
        else 0.01f * ((i + axis) % 3)
      }
    val seeds = (0 until 4).map(c => (c.toLong, vec(c, 0.0f)))
    val members = (4 until 20).map { id =>
      val c = id % 4
      (id.toLong, vec(c, 0.05f + 0.01f * (id / 4)))
    }
    (seeds ++ members).toDF("vec_id", "embedding")
  }

  test("well-separated clusters: nprobe=1 IVF equals brute force") {
    val corpus = clustered
    val queries = corpus.filter($"vec_id".isin(5L, 6L, 7L))
      .select($"vec_id".as("query_id"), $"embedding")
    val ivf = Similarity.ivfTopK(corpus, queries, k = 3,
      numCells = 4, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // the true top-3 of a cluster member live in its own cluster, so
    // probing one cell loses nothing
    assert(ivf == exact)
    // the query itself is rank 1 at cosine 1.0
    val self = Similarity.ivfTopK(corpus, queries, k = 3,
      numCells = 4, nprobe = 1)
      .filter($"rank" === 1).collect()
    assert(self.forall(r => r.getLong(0) == r.getLong(2)
      && r.getDouble(3) == 1.0))
  }

  test("nprobe = numCells degenerates to exact top-k on any corpus") {
    // adversarial-ish corpus: no cluster structure at all
    val corpus = (0L until 40L).map { id =>
      (id, (0 until dim).map(i =>
        math.sin(id * 7.3 + i * 1.9).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 2)
      .select($"vec_id".as("query_id"), $"embedding")
    val ivf = Similarity.ivfTopK(corpus, queries, k = 5,
      numCells = 8, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(ivf == exact)
  }

  test("assignment ties break to the lowest cell id") {
    // two identical centroids (ids 0, 1): every vector ties between
    // them and must land in cell 0
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(1.0f, 0.1f)), (3L, Seq(1.0f, 0.2f)))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" === 2L)
      .select($"vec_id".as("query_id"), $"embedding")
    // nprobe=1 probes cell 0 only; all 4 vectors are in it, so the
    // top-4 covers the whole corpus — proving nothing fell into cell 1
    val got = Similarity.ivfTopK(corpus, queries, k = 4,
      numCells = 2, nprobe = 1)
    assert(got.count() == 4)
  }
}
