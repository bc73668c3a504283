package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic, engine-reproducible k-means over an embedding column —
 * the trainer for [[Similarity.ivfTopK]]'s `centroids` /
 * [[Similarity.pqTopK]]'s `codebook` hooks, and a clustering surface in
 * its own right (semantic corpus bucketing, coarse quantizer training).
 *
 * Classic Lloyd iteration is NOT reproducible across engines: centroid
 * means are float sums whose value depends on summation order, so two
 * engines (or two runs on differently-partitioned data) disagree on
 * boundary assignments. This implementation removes float summation
 * entirely, the same device that makes the quantized ANN path (q49)
 * hash-verifiable:
 *
 *  - Vectors are int8-quantized first
 *    ([[graft.functions.VectorExpressions.QuantizeInt8]], floor(x·127/s
 *    + 0.5) stated verbatim in codegen and oracle SQL).
 *  - A centroid is represented by the INTEGER SUM of its members'
 *    quantized vectors — never the mean. Cosine is scale-invariant, so
 *    cos(v, sum) ≡ cos(v, mean): dividing by the count is pure noise.
 *    Integer sums are exact in double (every partial sum is an integer
 *    < 2^53 for any realistic cluster: |coord sum| ≤ 127·n), hence
 *    independent of partitioning, task order, and engine.
 *  - Assignments compare 4dp-ROUNDED cosines, ties to the LOWEST
 *    cluster id, via the same `array_max` over (cos, -id) structs as
 *    [[Similarity.ivfTopK]] — one broadcast codegen pass, no shuffle.
 *  - Init = the k lowest-id vectors (deterministic, oracle-replayable);
 *    a cluster that loses all members keeps its previous sum.
 *
 * Scale shape: each iteration is one narrow assignment pass (centroid
 * literals ride inside the codegen stage) + one hash aggregation of
 * `dim` unrolled integer sums (map-side combinable) collecting exactly
 * k rows to the driver. State is k·dim doubles on the driver; the
 * quantized corpus is cached once and reused across iterations. At
 * 100 TB this is the standard coarse-quantizer training loop — optional
 * `sampleFraction`-style downsampling belongs in the caller (train on a
 * deterministic [[Sampling.deterministicSample]] slice, assign the
 * full corpus once with [[assignClusters]]).
 */
object Clustering {

  import graft.functions.VectorExpressions.{cosineSim, quantizeInt8}

  /** Max k: centroid literals must stay a broadcastable codegen array. */
  private val MaxK = 256

  /** Winning (round(cos,4), -cl) struct over the centroid sums — via
    * the [[graft.functions.VectorExpressions.TopCells]] references-
    * array expression (ties to the lowest cluster id), NOT a per-
    * centroid literal tree: 16 inlined 64-element literals are the
    * Janino-limit shape that silently de-codegens the whole stage.
    * Struct keeps the historical (c, n = -cl) field layout so
    * consumers and oracles are unchanged. */
  private def bestOf(vec: Column, sums: Seq[Seq[Double]]): Column = {
    val t = element_at(graft.functions.VectorExpressions.topCells(
      vec, sums.zipWithIndex.map { case (s, cl) => (cl.toLong, s) }, 1), 1)
    struct(t.getField("cos").as("c"),
      (-t.getField("cell")).cast("int").as("n"))
  }

  private def clusterOf(vec: Column, sums: Seq[Seq[Double]]): Column =
    -bestOf(vec, sums).getField("n")

  /** Quantized view `(idCol, __q: array<double>)` — int8 codes carried
    * as exact small-integer doubles so every later dot/norm term is an
    * integer until the final division. */
  private def quantized(corpus: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    corpus.select(col(idCol), quantizeInt8(col(vecCol))
      .cast("array<double>").as("__q"))

  /**
   * Train k centroids: `iters` rounds of (assign, integer-sum update)
   * from the k lowest-id seeds. Returns the centroid SUM vectors,
   * cluster id = position (0-based). Feed straight into
   * [[assignClusters]] or (cast to float) [[Similarity.ivfTopK]].
   */
  def kmeansCentroidSums(corpus: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): Seq[Seq[Double]] =
    kmeansSumsAndCounts(corpus, k, iters, idCol, vecCol).map(_._1)

  /**
   * Centroid MEANS (sum ÷ member count) — for consumers where centroid
   * SCALE matters, unlike the cosine surfaces above: PQ sub-codebooks
   * score by raw ADC dot products, so a sum-scaled centroid would
   * inflate every score by its cluster's size. Counts ride the same
   * integer aggregation (seeds count as 1; an emptied cluster keeps its
   * previous sum AND count), so the division is one deterministic
   * double op per coordinate.
   */
  def kmeansCentroidMeans(corpus: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): Seq[Seq[Double]] =
    kmeansSumsAndCounts(corpus, k, iters, idCol, vecCol)
      .map { case (s, c) => s.map(_ / c) }

  private def kmeansSumsAndCounts(corpus: DataFrame, k: Int, iters: Int,
      idCol: String, vecCol: String): Seq[(Seq[Double], Long)] = {
    require(k > 0 && k <= MaxK, s"k in [1,$MaxK], got $k")
    require(iters >= 0, s"iters >= 0, got $iters")
    // scope-local persist: releasing it after training must not touch
    // caches other in-flight operators registered globally
    PersistTracker.scoped { scope =>
      val qz = scope.persist(quantized(corpus, idCol, vecCol))
      // seeds: the k lowest-id quantized vectors (bounded collect)
      var state: Seq[(Seq[Double], Long)] = qz
        .orderBy(col(idCol)).limit(k).collect()
        .map(r => r.getSeq[Double](1).toSeq -> 1L).toSeq
      require(state.size == k, s"corpus smaller than k=$k")
      val dim = state.head._1.size
      var it = 0
      while (it < iters) {
        val sums = state.map(_._1)
        val assigned = qz.select(col("__q"),
          clusterOf(col("__q"), sums).as("__cl"))
        // dim unrolled integer sums — one map-side-combinable hash agg,
        // k rows back to the driver
        val sumCols = (0 until dim)
          .map(j => sum(element_at(col("__q"), j + 1)).as(s"s$j"))
        val fresh = assigned.groupBy("__cl")
          .agg(count(lit(1)).as("__n"), sumCols: _*)
          .collect()
          .map(r => r.getInt(0) ->
            ((2 to dim + 1).map(r.getDouble).toSeq -> r.getLong(1)))
          .toMap
        // empty clusters keep their previous sum (deterministic policy,
        // replayed by the oracle's LEFT JOIN + COALESCE)
        state = state.zipWithIndex.map { case (prev, cl) =>
          fresh.getOrElse(cl, prev)
        }
        it += 1
      }
      state
    }
  }

  /** One assignment pass of the full corpus against trained centroid
    * sums: `(idCol, cluster, cos)` with the 4dp cosine to the chosen
    * centroid. Narrow, shuffle-free. */
  def assignClusters(corpus: DataFrame, sums: Seq[Seq[Double]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(sums.nonEmpty && sums.size <= MaxK)
    quantized(corpus, idCol, vecCol)
      .select(col(idCol), bestOf(col("__q"), sums).as("__b"))
      .select(col(idCol),
        (-col("__b.n")).cast("int").as("cluster"), col("__b.c").as("cos"))
  }

  /** Train + assign in one call — the battery's q68 surface. */
  def kmeans(corpus: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sums = kmeansCentroidSums(corpus, k, iters, idCol, vecCol)
    assignClusters(corpus, sums, idCol, vecCol)
  }

  /** Trained centroids in [[Similarity.ivfTopK]]'s `(id, vec)` shape
    * (cluster id, float centroid-sum vector — cosine is scale-invariant
    * so sums serve directly as centroids). */
  def ivfCentroids(corpus: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): Seq[(Long, Seq[Float])] =
    kmeansCentroidSums(corpus, k, iters, idCol, vecCol).zipWithIndex
      .map { case (s, cl) => cl.toLong -> s.map(_.toFloat) }

  /** The k lowest-id QUANTIZED vectors — the deterministic seed state
    * shared by batch Lloyd training above and the streamed mini-batch
    * path ([[graft.streaming.IndexIngest.ingestKmeansBatch]]). Bounded
    * collect of k rows. */
  def seedSums(corpus: DataFrame, k: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): Seq[Seq[Double]] = {
    require(k > 0 && k <= MaxK, s"k in [1,$MaxK], got $k")
    val seeds = quantized(corpus, idCol, vecCol)
      .orderBy(col(idCol)).limit(k).collect()
      .map(_.getSeq[Double](1).toSeq).toSeq
    require(seeds.size == k, s"corpus smaller than k=$k")
    seeds
  }

  /**
   * One mini-batch's per-cluster INTEGER partials against the given
   * centroid-sum state: assign each batch row to its best cluster (4dp
   * cosine, ties to the lowest id — the same codegen pass as training),
   * then aggregate member count + elementwise quantized sums. The
   * returned k-or-fewer rows are the exact increment the online
   * accumulation model adds to its state (mini-batch k-means, public
   * algorithm: Sculley, WWW 2010 — the order-free batch-aggregate
   * form): integer sums make `state + partial` associative, so the
   * accumulated state is independent of partitioning and engine.
   *
   * @return `(__cl int, __n long, __s array<double>)` — one row per
   *         non-empty cluster in the batch
   */
  def miniBatchPartials(batch: DataFrame, sums: Seq[Seq[Double]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(sums.nonEmpty && sums.size <= MaxK)
    val dim = sums.head.size
    val assigned = quantized(batch, idCol, vecCol)
      .select(col("__q"), clusterOf(col("__q"), sums).as("__cl"))
    val sumCols = (0 until dim)
      .map(j => sum(element_at(col("__q"), j + 1)).as(s"s$j"))
    assigned.groupBy("__cl")
      .agg(count(lit(1)).as("__n"), sumCols: _*)
      .select(col("__cl").cast("int"), col("__n"),
        array((0 until dim).map(j => col(s"s$j")): _*).as("__s"))
  }
}
