package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 * Two paths:
 *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query
 *    set against the corpus; one narrow pass + per-query top-k. The
 *    baseline and the verification oracle.
 *  - [[lshTopK]]: multi-table random-hyperplane LSH with multi-probe —
 *    corpus vectors get one sign-bit bucket key per table (narrow pass);
 *    queries probe every key within Hamming ≤ `probeHamming` of theirs in
 *    each table; candidates come from the (table, key) equi-join, then
 *    exact cosine re-rank. Recall/cost is tuned by (numPlanes, numTables,
 *    probeHamming); the battery's q28 measures recall vs the exact path.
 *
 * Performance note: vector math is statically UNROLLED over the known
 * dimension (`element_at` chains) — Spark's higher-order lambdas
 * (`aggregate`/`zip_with`) are CodegenFallback (interpreted) and
 * measured orders of magnitude slower in the hot path. Unrolled
 * element_at arithmetic stays inside whole-stage codegen. The generic
 * Column forms are kept for dynamic-dimension callers.
 */
object Similarity {

  /** Dot product, generic (interpreted HOF — fine off the hot path). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Dot product via the native codegen expression. */
  def dotFast(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dotProduct(a, b)

  /** L2 norm (generic HOF form, off the hot path). */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** L2 norm via the native expression. */
  def normFast(a: Column): Column = sqrt(dotFast(a, a))

  /** Cosine similarity via the native fused-loop expression (0.0 when
    * either side has zero norm). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.cosineSim(a, b)

  /**
   * Exact brute-force cosine top-k: for each query vector, the k nearest
   * corpus vectors. Queries are broadcast (they are few); the corpus
   * streams through one narrow projection and a per-query top-k window.
   * Pass `dim` when known to unroll the math into codegen.
   */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      dim: Int = -1, idCol: String = "vec_id", queryIdCol: String = "query_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(queryIdCol), col(vecCol).as("__qvec"))
    // a small corpus arrives as 1-2 parquet splits, which would run the
    // whole scoring pass on 1-2 cores (same pathology VcfSource guards
    // against for single .gz inputs); big corpora already have enough
    // splits and skip the shuffle
    val parallelism = corpus.sparkSession.sparkContext.defaultParallelism
    val c0 = corpus.select(col(idCol), col(vecCol).as("__cvec"))
    val c = if (c0.rdd.getNumPartitions < parallelism / 2)
      c0.repartition(parallelism) else c0
    val scored = c
      .crossJoin(broadcast(q))
      .withColumn("cosine", round(cosine(col("__qvec"), col("__cvec")), 4))
    val w = Window.partitionBy(queryIdCol)
      .orderBy(col("cosine").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col("rank"), col(idCol), col("cosine"))
  }

  /**
   * Hard-negative mining for contrastive embedding training (public
   * practice — DPR, Karpukhin et al. 2020; SimCSE-style objectives):
   * for each query vector, the `k` MOST-similar corpus vectors whose
   * label differs from the query's — the near-boundary negatives that
   * make a contrastive objective informative (random negatives are
   * trivially separable; same-label neighbors are positives, not
   * negatives). Rows with a null label on either side drop (no stance
   * on unlabeled data).
   *
   * Same scale shape as [[bruteForceTopK]]: broadcast queries, one
   * narrow corpus scan, per-query top-k window. At corpus scale swap
   * the scan for an ANN candidate stage ([[ivfTopKWithIndex]] /
   * [[annSearchRerank]] with depth ≫ k) and apply the label filter on
   * the candidate list.
   *
   * @param queries `(queryIdCol, vecCol, labelCol)` — the anchor's
   *                label defines "negative"
   * @return `(queryIdCol, rank, idCol, cosine, label)` — the mined
   *         negative's label rides along for mixing diagnostics
   */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", queryIdCol: String = "query_id",
      vecCol: String = "embedding", labelCol: String = "label"): DataFrame = {
    require(k > 0, s"need k>0; got $k")
    val q = queries.select(col(queryIdCol), col(vecCol).as("__qvec"),
      col(labelCol).as("__qlabel"))
    val parallelism = corpus.sparkSession.sparkContext.defaultParallelism
    val c0 = corpus.select(col(idCol), col(vecCol).as("__cvec"),
      col(labelCol).as("__clabel"))
    val c = if (c0.rdd.getNumPartitions < parallelism / 2)
      c0.repartition(parallelism) else c0
    val scored = c
      .crossJoin(broadcast(q))
      .filter(col("__clabel") =!= col("__qlabel"))
      .withColumn("cosine", round(cosine(col("__qvec"), col("__cvec")), 4))
    val w = Window.partitionBy(queryIdCol)
      .orderBy(col("cosine").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col("rank"), col(idCol), col("cosine"),
        col("__clabel").as(labelCol))
  }

  /**
   * Brute-force cosine top-k over int8-QUANTIZED vectors
   * ([[graft.functions.VectorExpressions.QuantizeInt8]], FAISS-SQ8
   * style): 4× smaller vectors at rest and in flight for a rank
   * ordering that agrees with full precision wherever the cosine gap
   * exceeds the ~1e-2 quantization noise. Per-vector scales cancel in
   * cosine, so there is NO dequantization — every dot/norm term is an
   * exact small integer and the result is engine-independent (q49's
   * hash gate). At scale the quantized corpus is what you materialize;
   * the float originals stay in cold storage for final re-ranking.
   */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", queryIdCol: String = "query_id",
      vecCol: String = "embedding"): DataFrame = {
    def qz(df: DataFrame, id: String): DataFrame = df.select(col(id),
      graft.functions.VectorExpressions.quantizeInt8(col(vecCol))
        .cast("array<float>").as(vecCol)) // ≤127: exact in float
    bruteForceTopK(qz(corpus, idCol), qz(queries, queryIdCol), k,
      idCol = idCol, queryIdCol = queryIdCol, vecCol = vecCol)
  }

  /** Deterministic random hyperplanes: `numPlanes × dim`, seeded. */
  def hyperplanes(dim: Int, numPlanes: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Sign-bit LSH bucket keys, all tables at once, via the native
    * one-pass expression: `array<int>`, one key per table. */
  def lshKeysAllTables(vec: Column, tables: Seq[Seq[Seq[Double]]]): Column =
    graft.functions.VectorExpressions.lshKeys(vec, tables)

  /** Deterministic PORTABLE ±1 sign matrix for [[randomProject]]:
    * `signs(i)(j)` is +1 when the 60-bit md5 prefix of
    * `"<seed>_<i>_<j>"` is even — replayable in any engine with md5
    * (DuckDB: `('0x' || substr(md5(seed || '_' || i || '_' || j), 1,
    * 15))::BIGINT % 2`), unlike a JVM `Random` stream. Rademacher ±1
    * entries satisfy the Johnson–Lindenstrauss guarantee (Achlioptas
    * 2003) without Gaussian sampling. */
  def jlSigns(dim: Int, outDim: Int, seed: Long = 7L): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(outDim, dim) { (i, j) =>
      val hex = md.digest(s"${seed}_${i}_${j}"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .take(8).map(b => f"$b%02x").mkString.take(15)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0 else -1.0
    }
  }

  /**
   * Johnson–Lindenstrauss random projection: `dim → outDim` with a
   * deterministic Rademacher (±1/√outDim) matrix — the cheap
   * distance-preserving dimensionality reduction that runs BEFORE the
   * expensive ANN machinery at scale (shorter vectors shrink every
   * downstream shuffle, LSH hash, and PQ training pass by dim/outDim).
   *
   * Plan shape: ONE narrow codegen projection over the corpus
   * ([[graft.functions.VectorExpressions.SignedProject]] — the sign
   * matrix rides the references array; no literal tree, no per-dim
   * unrolling, no shuffle). Returns `(idCol, proj: array<double>)`.
   */
  def randomProject(df: DataFrame, idCol: String, vecCol: String,
      dim: Int = 64, outDim: Int = 16, seed: Long = 7L): DataFrame =
    df.select(col(idCol),
      graft.functions.VectorExpressions.signedProject(
        col(vecCol), jlSigns(dim, outDim, seed)).as("proj"))

  /** XOR masks for all keys within Hamming distance `h` of a key. */
  private def probeMasks(bits: Int, h: Int): Seq[Int] = {
    val m0 = Seq(0)
    val m1 = if (h >= 1) (0 until bits).map(1 << _) else Nil
    val m2 = if (h >= 2)
      for (i <- 0 until bits; j <- (i + 1) until bits) yield (1 << i) | (1 << j)
    else Nil
    m0 ++ m1 ++ m2
  }

  /**
   * IVF-Flat approximate cosine top-k — the cell-partitioned ANN scale
   * path next to [[lshTopK]]'s hash-bucketed one. The corpus is split
   * into `numCells` Voronoi cells around centroid vectors; a query
   * scans only its `nprobe` nearest cells, i.e. `nprobe/numCells` of
   * the corpus instead of all of it.
   *
   * Centroids default to the `numCells` lowest-id corpus vectors:
   * deterministic and exactly replayable by a SQL oracle (iterative
   * k-means depends on float summation order, which no two engines
   * share). Pass trained centroids via the `centroids` parameter at
   * production scale — same plan shape, and the per-call corpus scan
   * that picks the defaults is skipped. Assignment is ONE broadcast
   * codegen pass per corpus row: `array_max` over (cosine, -cell_id)
   * structs picks the nearest centroid (ties to the lowest id) with NO
   * shuffle and no per-row window. The probe side broadcasts the tiny
   * (query, cell) pair list; the only exchanges are the per-query top-k
   * windows. At 100 TB the assigned corpus is written once, bucketed by
   * cell (same pattern as VariantStore), and every later query batch
   * joins against nprobe buckets.
   *
   * Cosines are rounded to 4 places BEFORE every argmax/rank so an
   * oracle replaying the arithmetic in double precision agrees on the
   * discrete choices (same device as q26's verification).
   */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      numCells: Int = 16, nprobe: Int = 4,
      idCol: String = "vec_id", queryIdCol: String = "query_id",
      vecCol: String = "embedding",
      centroids: Seq[(Long, Seq[Float])] = Nil): DataFrame =
    ivfTopKWithIndex(
      buildIvfIndex(corpus, numCells, idCol, vecCol, centroids),
      queries, k, nprobe, idCol, queryIdCol, vecCol)

  /** The IVF index: the cell-assigned corpus (`idCol, __cvec, __cell`)
    * plus its centroids. The assigned frame is what a deployment
    * materializes ONCE — write it bucketed on `__cell`
    * ([[graft.sources.BucketedTables]]) and every later query batch
    * joins against `nprobe` buckets with no assignment pass and no
    * corpus-side shuffle. */
  case class IvfIndex(assigned: DataFrame, centroids: Seq[(Long, Seq[Float])])

  /** Assign every corpus vector to its nearest centroid — one broadcast
    * codegen pass (`array_max` over (cosine, -cell_id) structs, ties to
    * the lowest id), no shuffle. Centroids default to the `numCells`
    * lowest-id vectors (deterministic, oracle-replayable); pass
    * [[graft.operators.Clustering.ivfCentroids]]-trained ones at
    * production scale. */
  /** Centroids as (id, double-vector) for [[graft.functions
    * .VectorExpressions.TopCells]] — float elements promote exactly as
    * the literal-tree accessor did. */
  private def centsD(cents: Seq[(Long, Seq[Float])]): Seq[(Long, Seq[Double])] =
    cents.map { case (id, v) => (id, v.map(_.toDouble)) }

  private def topCellsOf(vec: Column, cents: Seq[(Long, Seq[Float])],
      n: Int): Column =
    graft.functions.VectorExpressions.topCells(vec, centsD(cents), n)

  /** The auto coarse-quantizer size: ≈32 vectors per cell (the classic
    * IVF ~√n regime at these corpus sizes), clamped to [16, 4096] —
    * [[mineBitextWithIndex]]'s `numCells = 0` default. Constant target
    * cell size keeps the per-probe candidate scan flat as the corpus
    * grows; a fixed cell COUNT would re-grow it linearly with SF. */
  def scaledCellCount(n: Long): Int =
    math.min(4096L, math.max(16L, n / 32L)).toInt

  def buildIvfIndex(corpus: DataFrame, numCells: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding",
      centroids: Seq[(Long, Seq[Float])] = Nil): IvfIndex = {
    require(numCells > 0 && numCells <= 4096,
      s"numCells must be a broadcastable dimension, got $numCells")
    val cents: Seq[(Long, Seq[Float])] =
      if (centroids.nonEmpty) {
        require(centroids.size == numCells,
          s"expected $numCells centroids, got ${centroids.size}")
        centroids
      } else corpus
        .select(col(idCol).cast("long"), col(vecCol))
        .orderBy(col(idCol)).limit(numCells).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toSeq
    def cellOf(vec: Column): Column =
      element_at(topCellsOf(vec, cents, 1), 1).getField("cell")
    IvfIndex(corpus.select(col(idCol), col(vecCol).as("__cvec"),
      cellOf(col(vecCol)).as("__cell")), cents)
  }

  /**
   * Incrementally extend an [[IvfIndex]] with a batch of new vectors —
   * the ANN face of the engine's index-refresh story ([[Retrieval
   * .mergeIndex]] for BM25, [[Dedup.dedupAgainstIndex]] for dedup):
   * the batch is assigned against the EXISTING centroids and appended;
   * the already-assigned corpus is never rescanned (with the assigned
   * frame stored bucketed on `__cell`, the append writes new files
   * only). Because cell assignment is a pure function of (vector,
   * centroids), the merged index is IDENTICAL to a full rebuild over
   * the union corpus with the same centroids — spec-checked down to
   * served results.
   *
   * The classic IVF caveat applies (Jégou et al. — public knowledge):
   * centroids drift as the corpus grows; retrain periodically
   * ([[graft.operators.Clustering.ivfCentroids]]) and re-assign, the
   * same cadence trade as [[graft.streaming.DedupIngest]]'s compaction.
   *
   * Contract: batch ids must be disjoint from the indexed ids.
   */
  def addToIvfIndex(index: IvfIndex, batch: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): IvfIndex = {
    val add = buildIvfIndex(batch, index.centroids.size, idCol, vecCol,
      index.centroids)
    IvfIndex(index.assigned.unionByName(add.assigned), index.centroids)
  }

  /**
   * Distributed ANN SELF-join (kNN join): every corpus vector finds its
   * `k` approximate nearest neighbours — the corpus-scale kNN-graph
   * builder ([[GraphOps.knnEdgesExact]]'s documented production swap).
   * Where [[ivfTopKWithIndex]] BROADCASTS a small probe list, here the
   * probe side IS the corpus, so nothing broadcasts:
   *
   *  - per-row probe selection is fully NARROW: the numCells centroid
   *    cosines ride in one codegen projection as a (1−cos, cell) struct
   *    array; `sort_array` + `slice` picks the nprobe best (1−cos keeps
   *    the sort ascending without negating a double — negation creates
   *    −0.0, whose sort order is engine-dependent; subtraction from 1.0
   *    is order-preserving at 4dp granularity);
   *  - the candidate stage is a plain shuffle join on `__cell` — both
   *    sides hash-partition by cell; with the assigned corpus stored
   *    bucketed on `__cell` (the [[IvfIndex]] deployment note) the
   *    corpus side never re-shuffles, and the probe side ships
   *    n·nprobe (id, vector) rows — the inherent IVF-join cost;
   *  - per-query top-k is a rank window that Spark's WindowGroupLimit
   *    rewrites into partial top-k before the exchange, so the final
   *    shuffle carries ~k rows per query per map partition, not the
   *    full candidate set.
   *
   * numCells sizes the join parallelism (each cell is one join key)
   * AND the asymptotics: per-probe candidate work is `nprobe/numCells`
   * of the corpus, so a FIXED cell count re-grows the join
   * quadratically with corpus size (measured: 10× corpus at fixed 16
   * cells = 32× wall; at corpus-scaled cells = ~2×). `numCells = 0`
   * (the default) therefore scales with the corpus via
   * [[scaledCellCount]]; pass an explicit value only to replay a
   * pinned configuration. Self-matches are excluded; ranking follows
   * the 4dp + id-tie discipline, so the whole join — assignment, probe
   * ranks, candidates, final ranks — replays exactly in an oracle.
   */
  def ivfKnnJoin(corpus: DataFrame, k: Int, numCells: Int = 0,
      nprobe: Int = 4, idCol: String = "vec_id",
      vecCol: String = "embedding",
      centroids: Seq[(Long, Seq[Float])] = Nil,
      maxCellSize: Int = 100000): DataFrame = {
    require(numCells >= 0 && numCells <= 4096,
      s"numCells in [0 (auto), 4096], got $numCells")
    val cells =
      if (centroids.nonEmpty) centroids.size
      else if (numCells > 0) numCells
      else scaledCellCount(corpus.count())
    val index = buildIvfIndex(corpus, cells, idCol, vecCol, centroids)
    val cents = index.centroids
    require(nprobe > 0 && nprobe <= cents.size,
      s"nprobe in [1,${cents.size}]")
    val assigned = capCells(index.assigned, idCol, maxCellSize, "ivfKnnJoin")
    val probes = corpus
      .select(col(idCol).as("__qid"), col(vecCol).as("__qvec"))
      .withColumn("__p", explode(topCellsOf(col("__qvec"), cents, nprobe)))
      .select(col("__qid"), col("__qvec"), col("__p.cell").as("__cell"))
    // Exchange barrier on the cell key — load-bearing twice over.
    // (1) Plan health: without it Catalyst inlines the 16-cosine
    //     `__cell` assignment expression into the join stage (filter +
    //     project copies), the generated method blows past the codegen
    //     size limits, and the WHOLE candidate stage silently falls
    //     back to interpreted eval — measured 8.5 µs vs 0.9 µs per
    //     candidate cosine at sf0.1 (9.3 s → ~1 s for the full join).
    // (2) Scale honesty: this is exactly the one-time co-location
    //     shuffle a deployment pays when it writes the assigned corpus
    //     bucketed by `__cell`; the join itself then never re-shuffles
    //     the corpus side.
    val scored = assigned.repartition(col("__cell"))
      .join(probes, Seq("__cell"))
      .filter(col(idCol) =!= col("__qid"))
      .withColumn("cosine", round(cosine(col("__qvec"), col("__cvec")), 4))
    val w = Window.partitionBy("__qid")
      .orderBy(col("cosine").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("__qid").as("query_id"), col("rank"), col(idCol),
        col("cosine"))
  }

  private lazy val knnJoinLog =
    org.slf4j.LoggerFactory.getLogger("graft.operators.Similarity")

  /** Hot-cell guard (the Dedup.cappedBuckets discipline): a cell of
    * size c costs c·(probing queries) candidate rows — a degenerate
    * corpus (near-identical embeddings) concentrates in ONE cell and a
    * cell-partitioned join goes quadratic on that skewed key. ONE
    * bounded count detects overflow; when nothing overflows the plan is
    * byte-identical, otherwise overflowed cells trim to their lowest-id
    * members (the approximation degrades — logged loudly; the real fix
    * is retraining centroids so cells balance). `maxCellSize <= 0`
    * disables the guard. */
  private def capCells(assigned: DataFrame, idCol: String,
      maxCellSize: Int, tag: String): DataFrame =
    if (maxCellSize <= 0) assigned else {
      val over = assigned.groupBy("__cell")
        .agg(count(lit(1)).as("__csz")).filter(col("__csz") > maxCellSize)
        .agg(count(lit(1)).as("nb"), sum("__csz").as("nr")).head()
      if (over.isNullAt(1) || over.getLong(0) == 0L) assigned
      else {
        knnJoinLog.warn(s"$tag: ${over.getLong(0)} cell(s) over " +
          s"maxCellSize=$maxCellSize (${over.getLong(1)} rows) TRIMMED " +
          "to their lowest-id members — recall degrades in those cells; " +
          "retrain centroids (Clustering.ivfCentroids) to rebalance")
        val wCap = Window.partitionBy("__cell").orderBy(col(idCol))
        assigned.withColumn("__cr", row_number().over(wCap))
          .filter(col("__cr") <= maxCellSize).drop("__cr")
      }
    }

  /** [[ivfTopK]] against a prepared [[IvfIndex]] — the serving form:
    * the probe list broadcasts into the assigned corpus and only the
    * probed cells are scanned. */
  def ivfTopKWithIndex(index: IvfIndex, queries: DataFrame, k: Int,
      nprobe: Int = 4, idCol: String = "vec_id",
      queryIdCol: String = "query_id", vecCol: String = "embedding"): DataFrame = {
    val cents = index.centroids
    require(nprobe > 0 && nprobe <= cents.size, s"nprobe in [1,${cents.size}]")
    // probe list: every query's nprobe nearest cells — one narrow
    // TopCells projection per query row (no per-query window, no
    // literal tree; ordering (cos DESC, cell ASC) identical to the
    // windowed form it replaces)
    val probes = queries
      .select(col(queryIdCol), col(vecCol).as("__qvec"))
      .withColumn("__p", explode(topCellsOf(col("__qvec"), cents, nprobe)))
      .select(col(queryIdCol), col("__qvec"), col("__p.cell").as("__cell"))

    // scan only the probed cells, exact cosine re-rank within them
    val scored = index.assigned.join(broadcast(probes), Seq("__cell"))
      .withColumn("cosine", round(cosine(col("__qvec"), col("__cvec")), 4))
    val w = Window.partitionBy(queryIdCol)
      .orderBy(col("cosine").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col("rank"), col(idCol), col("cosine"))
  }

  /**
   * IVF tuning harness: recall@k versus `nprobe` — the accuracy/cost
   * curve every ANN deployment reads before fixing its probe budget.
   * For each setting, the IVF result is intersected with the exact
   * brute-force top-k ground truth, per query.
   *
   * Unlike a sampled recall PROBE (q28's rows-only check), every stage
   * here — assignment, probe ranking, top-k, ground truth, the
   * intersection counts — is deterministic 4dp-rounded arithmetic, so
   * the whole sweep is exactly oracle-replayable.
   *
   * Scale shape: the index is built once (assigned frame persisted, one
   * scan per setting probes only its cells); ground truth is ONE
   * brute-force pass over the corpus — the sweep costs |settings| cheap
   * probed scans plus a single exact scan, not |settings| exact scans.
   * Run it on a query SAMPLE at 100 TB: recall estimates need hundreds
   * of queries, not the production load.
   *
   * @return `(nprobe, queryIdCol, hits, recall)` — hits = |IVF@k ∩
   *         exact@k|, recall = hits/k rounded 4dp
   */
  def ivfRecallSweep(corpus: DataFrame, queries: DataFrame, k: Int,
      numCells: Int, nprobes: Seq[Int],
      idCol: String = "vec_id", queryIdCol: String = "query_id",
      vecCol: String = "embedding",
      centroids: Seq[(Long, Seq[Float])] = Nil): DataFrame = {
    require(k > 0, s"need k>0; got $k")
    require(nprobes.nonEmpty && nprobes.forall(_ > 0) &&
      nprobes.distinct.size == nprobes.size,
      s"nprobes must be distinct positives; got $nprobes")
    val index = buildIvfIndex(corpus, numCells, idCol, vecCol, centroids)
    val ix = IvfIndex(PersistTracker.trackPersist(index.assigned),
      index.centroids)
    val truth = PersistTracker.trackPersist(
      bruteForceTopK(corpus, queries, k, idCol = idCol,
        queryIdCol = queryIdCol, vecCol = vecCol)
        .select(col(queryIdCol), col(idCol), lit(1).as("__t")))
    nprobes.sorted.map { np =>
      ivfTopKWithIndex(ix, queries, k, np, idCol, queryIdCol, vecCol)
        .select(lit(np).as("nprobe"), col(queryIdCol), col(idCol))
    }.reduce(_ unionByName _)
      .join(truth, Seq(queryIdCol, idCol), "left_outer")
      .groupBy(col("nprobe"), col(queryIdCol))
      .agg(sum(coalesce(col("__t"), lit(0))).cast("long").as("hits"),
        round(sum(coalesce(col("__t"), lit(0))).cast("double") / k, 4)
          .as("recall"))
  }

  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      dim: Int, numPlanes: Int = 10, numTables: Int = 6, probeHamming: Int = 2,
      idCol: String = "vec_id", queryIdCol: String = "query_id",
      vecCol: String = "embedding"): DataFrame = {
    val tables = (0 until numTables)
      .map(t => hyperplanes(dim, numPlanes, seed = 42L + t))

    // one native-expression pass computes every table's key; posexplode
    // turns the array into (table, key) rows
    val c = corpus.select(col(idCol), col(vecCol).as("__cvec"),
      posexplode(lshKeysAllTables(col(vecCol), tables)).as(Seq("table", "key")))

    // Query keys are materialized behind an exchange barrier before the
    // probe expansion so the key computation isn't re-inlined into every
    // probe expression by projection collapse.
    val masks = probeMasks(numPlanes, probeHamming)
    val qKeys = queries.select(col(queryIdCol), col(vecCol).as("__qvec"),
      lshKeysAllTables(col(vecCol), tables).as("__keys"))
      .repartition(col(queryIdCol))
    // probe fan-out as TWO scalar explodes (tables, then XOR masks)
    // instead of one literal array of |tables|x|masks| struct
    // expressions — the 336-field array constructor generated a ~14k
    // line Java file janino refused to compile, silently dropping the
    // whole stage to interpreted execution
    val q = qKeys
      .select(col(queryIdCol), col("__qvec"),
        posexplode(col("__keys")).as(Seq("table", "key0")))
      .select(col(queryIdCol), col("__qvec"), col("table"), col("key0"),
        explode(lit(masks.toArray)).as("__m"))
      .select(col(queryIdCol), col("__qvec"), col("table"),
        col("key0").bitwiseXOR(col("__m")).as("key"))

    val candidates = c.join(broadcast(q), Seq("table", "key"))
      .dropDuplicates(queryIdCol, idCol)
      .withColumn("cosine",
        round(cosine(col("__qvec"), col("__cvec")), 4))
    val w = Window.partitionBy(queryIdCol)
      .orderBy(col("cosine").desc, col(idCol))
    candidates.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col("rank"), col(idCol), col("cosine"))
  }

  /**
   * Product-quantization ADC top-k (the PQ of Jégou et al.'s "Product
   * Quantization for Nearest Neighbor Search", public knowledge): vectors
   * are split into `m` subspaces, each subvector snapped to one of
   * `codebookSize` per-subspace centroids (maximum-inner-product
   * assignment — this PQ variant targets dot-product similarity), and a
   * query scores a vector WITHOUT touching it: asymmetric distance
   * computation sums the query-subvector · centroid dot products looked
   * up by the vector's codes.
   *
   * Codebooks default to the `codebookSize` lowest-id corpus vectors
   * sliced per subspace — deterministic and oracle-replayable, same
   * policy as [[ivfTopK]]'s centroids; k-means-trained codebooks can be
   * passed in. Assignment compares 4dp-ROUNDED dots (ties → lowest code)
   * so codes are engine-reproducible.
   *
   * 100 TB shape: encoding is one narrow codegen pass (m·codebookSize
   * native dot products per vector — no shuffle), and codes are 8 ints
   * per vector where the vector was 64 floats: the scan a query pays is
   * ~8× smaller, which is the entire point of PQ at scale. ADC joins
   * codes to a broadcast (m·codebookSize)-row codebook and a broadcast
   * query-subvector frame; the only shuffle is the final per-query
   * top-k window over candidate scores.
   *
   * @return `(queryIdCol, rank, idCol, score_adc)`
   */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      m: Int = 8, codebookSize: Int = 16,
      idCol: String = "vec_id", queryIdCol: String = "query_id",
      vecCol: String = "embedding",
      codebook: Seq[Seq[Seq[Float]]] = Nil): DataFrame =
    pqTopKWithIndex(
      buildPqIndex(corpus, m, codebookSize, idCol, vecCol, codebook),
      queries, k, idCol, queryIdCol, vecCol)

  /** The PQ index: per-(vector, subspace) codes — the 8-bytes-per-
    * vector at-rest artifact that IS the point of PQ — plus the
    * codebook that decodes them. Materialize `codes` once; serving
    * never touches the float corpus. */
  case class PqIndex(codes: DataFrame, codebook: Seq[Seq[Seq[Float]]])

  /** Incrementally extend a [[PqIndex]]: encode ONLY the batch against
    * the frozen codebook and append its code rows — identical to a
    * rebuild over the union with the same codebook (encoding is
    * per-row), so serving equality is by construction; spec-checked
    * anyway. Same drift caveat and id-disjointness contract as
    * [[addToIvfIndex]]. */
  def addToPqIndex(index: PqIndex, batch: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): PqIndex = {
    val m = index.codebook.size
    val add = buildPqIndex(batch, m, index.codebook.head.size, idCol,
      vecCol, index.codebook)
    PqIndex(index.codes.unionByName(add.codes), index.codebook)
  }

  /** Encode the corpus: per-subspace argmax code (rounded-dot, ties to
    * the lowest code) in one narrow pass, no shuffle. Codebook defaults
    * to the `codebookSize` lowest-id vectors sliced per subspace;
    * train a real one with [[pqTrainCodebook]]. */
  def buildPqIndex(corpus: DataFrame, m: Int = 8, codebookSize: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding",
      codebook: Seq[Seq[Seq[Float]]] = Nil): PqIndex = {
    require(m > 0 && codebookSize > 0 && codebookSize <= 256,
      s"need m>0 and codebookSize in [1,256], got ($m, $codebookSize)")
    // codebook(j)(c) = centroid c of subspace j
    val cb: Seq[Seq[Seq[Float]]] =
      if (codebook.nonEmpty) {
        require(codebook.size == m && codebook.forall(_.size == codebookSize),
          s"expected $m x $codebookSize codebook")
        val sd0 = codebook.head.head.size
        require(codebook.forall(_.forall(_.size == sd0)),
          s"ragged codebook: every sub-centroid must have $sd0 dims")
        // a mismatched codebook would silently slice wrong subvectors —
        // probe one corpus vector (bounded) and fail loudly instead
        val dim = corpus.select(size(col(vecCol)).as("d")).limit(1)
          .collect().headOption.map(_.getInt(0)).getOrElse(m * sd0)
        require(m * sd0 == dim,
          s"codebook covers ${m * sd0} dims but embeddings have $dim")
        codebook
      } else {
        val base = corpus.select(col(idCol).cast("long"), col(vecCol))
          .orderBy(col(idCol)).limit(codebookSize).collect()
          .map(_.getSeq[Float](1).toSeq).toSeq
        require(base.size == codebookSize,
          s"corpus smaller than codebookSize=$codebookSize")
        val dim = base.head.size
        require(dim % m == 0, s"dim $dim not divisible by m=$m")
        val sd = dim / m
        (0 until m).map(j => base.map(_.slice(j * sd, j * sd + sd)))
      }
    // ALL m subspaces in ONE narrow projection via the references-array
    // PqEncode expression — the per-subspace-union layout this replaces
    // existed to dodge Janino's 64 KB limit on the m·codebookSize
    // literal-tree form; with the codebook riding the references array
    // the generated code is two small nested loops, so one corpus pass
    // (no persisted re-read, no union) encodes everything. Still no
    // shuffle anywhere in the encode.
    val codes = corpus.select(col(idCol), posexplode(
        graft.functions.VectorExpressions.pqEncode(col(vecCol),
          cb.map(_.map(_.map(_.toDouble))))))
      .select(col(idCol), col("pos").cast("int").as("__j"),
        col("col").cast("int").as("__code"))
    PqIndex(codes, cb)
  }

  /** [[pqTopK]] against a prepared [[PqIndex]] — the serving form: ADC
    * joins the code rows to the broadcast codebook and broadcast query
    * sub-vectors; the only shuffle is the per-(query, id) score sum and
    * the top-k window. */
  def pqTopKWithIndex(index: PqIndex, queries: DataFrame, k: Int,
      idCol: String = "vec_id", queryIdCol: String = "query_id",
      vecCol: String = "embedding"): DataFrame = {
    val cb = index.codebook
    val m = cb.size
    val sd = cb.head.head.size
    val spark = queries.sparkSession
    import spark.implicits._
    def sub(vec: Column, j: Int): Column = slice(vec, j * sd + 1, sd)
    val cbRows = (for {
      j <- 0 until m; c <- cb(j).indices
    } yield (j, c, cb(j)(c))).toDF("__j", "__code", "__cvec")
    val qsubs = queries.select(col(queryIdCol),
      posexplode(array((0 until m).map(j => sub(col(vecCol), j)): _*))
        .as(Seq("__j", "__qsub")))
    val adc = index.codes
      .join(broadcast(cbRows), Seq("__j", "__code"))
      .join(broadcast(qsubs), Seq("__j"))
      .groupBy(col(queryIdCol), col(idCol))
      .agg(round(sum(dotFast(col("__qsub"), col("__cvec"))), 4)
        .as("score_adc"))
    val w = Window.partitionBy(queryIdCol)
      .orderBy(col("score_adc").desc, col(idCol))
    adc.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col("rank"), col(idCol), col("score_adc"))
  }

  /**
   * Two-stage ANN serving — the standard IVF-PQ + exact-refine chain
   * (coarse quantizer → ADC over probed cells → exact re-rank of the
   * short list; the FAISS `IndexIVFPQ` + refine shape, public
   * knowledge): for each query, (1) pick its `nprobe` nearest IVF
   * cells, (2) ADC-score ONLY the PQ codes of vectors in those cells
   * and keep the top `candidates`, (3) fetch the float vectors for
   * just those candidates and re-rank by exact cosine to the final
   * top-`k`. Stage 2 never touches a float corpus vector; stage 3
   * touches exactly `candidates` per query.
   *
   * Scale shape: probes, candidate-id lists, codebook rows and query
   * sub-vectors all broadcast (a serving batch is small by definition —
   * the corpus is the big side and it is never shuffled: codes and the
   * assigned frame are at-rest artifacts, bucketable on `__cell`). The
   * only exchanges are the per-(query, candidate) ADC sum and two
   * per-query top windows over ≤`candidates` rows. Every discrete
   * choice (cell ranks, codes, both top cuts) happens on 4 dp-rounded
   * scores with id tie-breaks — engine-replayable end to end.
   *
   * `ivf` and `pq` must be built over the SAME corpus/id space; the
   * refine stage reads its float vectors from `ivf.assigned`.
   *
   * @return (queryIdCol, rank, idCol, cosine, score_adc)
   */
  def annSearchRerank(ivf: IvfIndex, pq: PqIndex, queries: DataFrame,
      k: Int, candidates: Int, nprobe: Int = 4,
      idCol: String = "vec_id", queryIdCol: String = "query_id",
      vecCol: String = "embedding"): DataFrame = {
    require(candidates >= k, s"candidates=$candidates must be >= k=$k")
    val cents = ivf.centroids
    require(nprobe > 0 && nprobe <= cents.size, s"nprobe in [1,${cents.size}]")
    val cb = pq.codebook
    val m = cb.size
    val sd = cb.head.head.size
    val spark = queries.sparkSession
    import spark.implicits._

    // stage 1 — probe list: each query's nprobe nearest cells (narrow
    // TopCells projection; same (cos DESC, cell ASC) ordering)
    val probes = queries
      .select(col(queryIdCol), col(vecCol).as("__qvec"))
      .withColumn("__p", explode(topCellsOf(col("__qvec"), cents, nprobe)))
      .select(col(queryIdCol), col("__p.cell").as("__cell"))
    // candidate ids = the probed cells' members
    val cand = ivf.assigned.join(broadcast(probes), Seq("__cell"))
      .select(col(queryIdCol), col(idCol))

    // stage 2 — ADC over candidate codes only, keep top `candidates`
    val cbRows = (for {
      j <- 0 until m; c <- cb(j).indices
    } yield (j, c, cb(j)(c))).toDF("__j", "__code", "__cvec")
    val qsubs = queries.select(col(queryIdCol),
      posexplode(array((0 until m).map(j =>
        slice(col(vecCol), j * sd + 1, sd)): _*)).as(Seq("__j", "__qsub")))
    val adc = pq.codes
      .join(broadcast(cand), Seq(idCol))
      .join(broadcast(cbRows), Seq("__j", "__code"))
      .join(broadcast(qsubs), Seq(queryIdCol, "__j"))
      .groupBy(col(queryIdCol), col(idCol))
      .agg(round(sum(dotFast(col("__qsub"), col("__cvec"))), 4)
        .as("score_adc"))
    val wAdc = Window.partitionBy(queryIdCol)
      .orderBy(col("score_adc").desc, col(idCol))
    val shortList = adc.withColumn("__ar", row_number().over(wAdc))
      .filter(col("__ar") <= candidates)
      .select(col(queryIdCol), col(idCol), col("score_adc"))

    // stage 3 — exact refine: fetch floats for the short list only
    val qvecs = queries.select(col(queryIdCol), col(vecCol).as("__qvec"))
    val wFinal = Window.partitionBy(queryIdCol)
      .orderBy(col("cosine").desc, col(idCol))
    ivf.assigned.select(col(idCol), col("__cvec"))
      .join(broadcast(shortList), Seq(idCol))
      .join(broadcast(qvecs), Seq(queryIdCol))
      .withColumn("cosine", round(cosine(col("__qvec"), col("__cvec")), 4))
      .withColumn("rank", row_number().over(wFinal))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col("rank"), col(idCol), col("cosine"),
        col("score_adc"))
  }

  /**
   * Residual-encoded IVF-PQ ADC top-k — the actual IVFADC formulation
   * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
   * public knowledge): vectors are PQ-encoded as residuals against
   * their IVF cell centroid (r = v − c_cell), not as raw vectors, so
   * one small codebook describes every cell's LOCAL geometry and the
   * quantization error drops for free. [[annSearchRerank]] is the
   * global-codebook variant; this is the cell-relative one FAISS's
   * `IndexIVFPQ` defaults to.
   *
   * Distances are squared-L2 computed in the algebraic form
   * `rr − 2·rc + cc` (per subspace: ‖r_j‖² − 2·r_j·cw + ‖cw‖²) so the
   * serve side never reconstructs a vector: per (query, probed cell)
   * the query residual subvectors broadcast, and a candidate costs m
   * code lookups — the corpus floats are touched only at encode time.
   *
   * Every discrete choice replays cross-engine (the q43/q62 device):
   * cell assignment by 4dp-rounded cosine (ties → lowest cell), code
   * assignment by 4dp-rounded squared-L2 (ties → lowest code), final
   * rank by 4dp-rounded ADC distance (ties → lowest id). Deterministic
   * artifacts: centroids = the `numCells` lowest-id vectors; codebook =
   * the residuals of the NEXT `codebookSize` vectors by id (the first
   * `numCells` are their own centroids — residual exactly 0 — so they
   * would train a degenerate all-zero codebook).
   *
   * Scale shape: centroids, codebook, probe lists and query residual
   * subvectors all broadcast; encode is ONE [[graft.functions
   * .VectorExpressions.PqEncode]] projection over one persisted
   * residual frame — all m subspaces in a single references-array pass
   * (no per-subspace unions, no shuffle, no Janino hazard; the
   * [[buildPqIndex]] layout); the only exchanges are the
   * per-(query, candidate) ADC sum and the final top-k window. At rest
   * this is the same artifact story as [[PqIndex]] — codes bucketed by
   * `__cell` serve without touching floats.
   *
   * @return (queryIdCol, rank, idCol, dist_adc) — dist ASCENDING
   */
  def ivfPqResidualTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      numCells: Int = 16, nprobe: Int = 4,
      m: Int = 8, codebookSize: Int = 16,
      idCol: String = "vec_id", queryIdCol: String = "query_id",
      vecCol: String = "embedding"): DataFrame = {
    require(numCells > 0 && numCells <= 4096, s"numCells in [1,4096]")
    require(nprobe > 0 && nprobe <= numCells, s"nprobe in [1,$numCells]")
    require(m > 0 && codebookSize > 0 && codebookSize <= 256,
      s"need m>0 and codebookSize in [1,256], got ($m, $codebookSize)")
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecDiff = graft.functions.VectorExpressions.vecDiff _

    // coarse quantizer: lowest-id vectors, cells named by their vec_id
    val cents: Seq[(Long, Seq[Float])] = corpus
      .select(col(idCol).cast("long"), col(vecCol))
      .orderBy(col(idCol)).limit(numCells).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toSeq
    require(cents.size == numCells,
      s"corpus smaller than numCells=$numCells")
    val dim = cents.head._2.size
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sd = dim / m
    val centRows = cents
      .map { case (cid, v) => (cid, v.map(_.toDouble)) }
      .toDF("__cell", "__centvec")

    def cellOf(vec: Column): Column =
      element_at(topCellsOf(vec, cents, 1), 1).getField("cell")

    // residual frame: one broadcast join + one native vec-diff pass;
    // persisted because the m encode branches and the codebook seed all
    // re-read it
    val resid = graft.operators.PersistTracker.trackPersist(
      corpus.select(col(idCol), col(vecCol).as("__v"),
          cellOf(col(vecCol)).as("__cell"))
        .join(broadcast(centRows), Seq("__cell"))
        .select(col(idCol), col("__cell"),
          vecDiff(col("__v"), col("__centvec")).as("__r")))

    // codebook: residuals of rows ranked [numCells, numCells+cbSize) by
    // id, sliced per subspace (bounded collect — cbSize rows)
    val cbBase = resid
      .select(col(idCol).cast("long").as("__oid"), col("__r"))
      .orderBy(col("__oid")).offset(numCells).limit(codebookSize)
      .collect().map(_.getSeq[Double](1).toSeq).toSeq
    require(cbBase.size == codebookSize,
      s"corpus smaller than numCells+codebookSize=${numCells + codebookSize}")
    val cb: Seq[Seq[Seq[Double]]] =
      (0 until m).map(j => cbBase.map(_.slice(j * sd, j * sd + sd)))
    def sqnorm(v: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < v.size) { s += v(i) * v(i); i += 1 }
      s
    }

    // encode: per-subspace argmin code over rounded squared-L2 in the
    // rr − 2·rc + cc form — all m subspaces in ONE PqEncode projection
    // (references-array codebook + precomputed codeword norms; see
    // buildPqIndex)
    val codes = resid.select(col(idCol), col("__cell"), posexplode(
        graft.functions.VectorExpressions.pqEncode(col("__r"), cb,
          cb.map(_.map(sqnorm)))))
      .select(col(idCol), col("__cell"),
        col("pos").cast("int").as("__j"), col("col").cast("int").as("__code"))

    // probe list: every query's nprobe nearest cells (narrow TopCells
    // projection; same (cos DESC, cell ASC) ordering)
    val probes = queries
      .select(col(queryIdCol), col(vecCol).as("__qvec"))
      .withColumn("__p", explode(topCellsOf(col("__qvec"), cents, nprobe)))
      .select(col(queryIdCol), col("__qvec"), col("__p.cell").as("__cell"))

    // query residual subvectors per probed cell (+ their rr term)
    val qsubs = probes.join(broadcast(centRows), Seq("__cell"))
      .select(col(queryIdCol), col("__cell"),
        vecDiff(col("__qvec"), col("__centvec")).as("__qr"))
      .select(col(queryIdCol), col("__cell"),
        posexplode(array((0 until m).map(j =>
          slice(col("__qr"), j * sd + 1, sd)): _*))
          .as(Seq("__j", "__qrsub")))
      .select(col(queryIdCol), col("__cell"), col("__j"), col("__qrsub"),
        dotFast(col("__qrsub"), col("__qrsub")).as("__qrr"))

    val cbRows = (for { j <- 0 until m; c <- cb(j).indices }
      yield (j, c, cb(j)(c))).toDF("__j", "__code", "__cbvec")

    // ADC: candidates = codes of probed cells; per-(query, id) sum of
    // per-subspace lookup terms, rank ascending
    val adc = codes
      .join(broadcast(qsubs), Seq("__cell", "__j"))
      .join(broadcast(cbRows), Seq("__j", "__code"))
      .groupBy(col(queryIdCol), col(idCol))
      .agg(round(sum(col("__qrr")
        - lit(2.0) * dotFast(col("__qrsub"), col("__cbvec"))
        + dotFast(col("__cbvec"), col("__cbvec"))), 4).as("dist_adc"))
    val w = Window.partitionBy(queryIdCol)
      .orderBy(col("dist_adc").asc, col(idCol))
    adc.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      // + 0.0 folds IEEE negative zero: the rr − 2·rc + cc form can
      // cancel to −1e-16 for a query's own vector and round to −0.0 in
      // one engine but +0.0 in the other (string-hash mismatch)
      .select(col(queryIdCol), col("rank"), col(idCol),
        (col("dist_adc") + lit(0.0)).as("dist_adc"))
  }

  /**
   * Per-pair sample covariance of an embedding column, derived from ONE
   * [[graft.functions.MomentSums]] scan: `cov(i,j) = (Σx_i·x_j −
   * Σx_i·Σx_j/n)/(n−1)` over the upper triangle (i ≤ j). The corpus is
   * never pair-exploded — the aggregate's buffer is the only shuffled
   * state, and the `d(d+1)/2` output rows unfold from the single sums
   * row joined to a broadcast (k → i, j) index map.
   *
   * Round before cross-engine comparison (float-sum order).
   *
   * @return (i, j, cov) for i ≤ j — `dim·(dim+1)/2` rows
   */
  def embeddingCovariance(df: DataFrame, vecCol: String,
      dim: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sums = df.agg(
      graft.functions.MomentSums.momentSums(dim)(
        col(vecCol).cast("array<double>")).as("__s"))
    val triMap = (for {
      i <- 0 until dim; j <- i until dim
    } yield (i * dim - i * (i - 1) / 2 + (j - i), i, j))
      .toDF("__k", "i", "j")
    sums.select(col("__s"),
        posexplode(slice(col("__s"), dim + 2, dim * (dim + 1) / 2))
          .as(Seq("__k", "__sxy")))
      .join(broadcast(triMap), Seq("__k"))
      .select(col("i"), col("j"),
        ((col("__sxy")
          - element_at(col("__s"), col("i") + 2)
            * element_at(col("__s"), col("j") + 2)
            / element_at(col("__s"), lit(1)))
          / (element_at(col("__s"), lit(1)) - lit(1.0))).as("cov"))
  }

  /**
   * Whitening transform for retrieval embeddings (Su et al. 2021,
   * "Whitening Sentence Representations ..." — public knowledge):
   * centers the corpus and maps through `L⁻¹` where `cov + εI = L·Lᵀ`
   * (Cholesky), so the transformed corpus has identity covariance —
   * the cheap fix for the anisotropy that depresses cosine contrast in
   * encoder embeddings.
   *
   * Shape: one [[graft.functions.MomentSums]] scan collects the
   * `1 + d + d(d+1)/2` sums to the driver (bounded by construction);
   * Cholesky + forward substitution on the `d×d` matrix is driver-side
   * deterministic; the corpus then flows through ONE narrow codegen
   * pass ([[graft.functions.VectorExpressions.AffineProject]] — matrix
   * in the references array). Spec-gated: the whitened corpus's own
   * [[embeddingCovariance]] must be ≈ I (the battery oracles the
   * covariance path; eigen/Cholesky algebra is not SQL-replayable).
   *
   * @return input columns with `vecCol` replaced by the whitened
   *         double array
   */
  /**
   * Per-dimension z-score standardization — [[whitenEmbeddings]]'s
   * diagonal little sibling (feature scaling for mixed-source
   * embedding corpora): `z_j = (x_j − μ_j) · (1/σ_j)` with μ/σ from
   * the SAME single [[graft.functions.MomentSums]] scan (the diagonal
   * of the triangle), a bounded driver collect, and one narrow
   * [[graft.functions.VectorExpressions.AffineProject]] codegen pass
   * (diagonal matrix — the off-diagonal zero terms add exact ±0.0 and
   * cannot perturb the value). σ_j ≤ 0 (constant dimension) maps to 1
   * so the dimension passes through centered. Unlike whitening, every
   * arithmetic step here replays in SQL — sample variance, sqrt,
   * reciprocal-multiply — so the full output is oracle-gateable (4dp,
   * float-sum-order rounding discipline as the covariance oracle).
   */
  def standardizeEmbeddings(df: DataFrame, vecCol: String,
      dim: Int): DataFrame = {
    val sums = df.agg(
        graft.functions.MomentSums.momentSums(dim)(
          col(vecCol).cast("array<double>")).as("__s"))
      .collect().head.getSeq[Double](0)
    val n = sums(0)
    require(n > 1, s"need at least 2 vectors to standardize, got $n")
    val mu = Array.tabulate(dim)(j => sums(1 + j) / n)
    val inv = Array.tabulate(dim) { j =>
      val sx = sums(1 + j)
      val sxx = sums(1 + dim + (j * dim - j * (j - 1) / 2))
      val s = math.sqrt((sxx - sx * sx / n) / (n - 1.0))
      if (s > 0) 1.0 / s else 1.0
    }
    val m = Array.tabulate(dim, dim)((r, c) =>
      if (r == c) inv(r) else 0.0)
    df.withColumn(vecCol,
      graft.functions.VectorExpressions.affineProject(col(vecCol), m, mu))
  }

  def whitenEmbeddings(df: DataFrame, vecCol: String, dim: Int,
      eps: Double = 1e-8): DataFrame = {
    val sums = df.agg(
        graft.functions.MomentSums.momentSums(dim)(
          col(vecCol).cast("array<double>")).as("__s"))
      .collect().head.getSeq[Double](0)
    val n = sums(0)
    require(n > 1, s"need at least 2 vectors to whiten, got $n")
    val mu = Array.tabulate(dim)(i => sums(1 + i) / n)
    val cov = Array.ofDim[Double](dim, dim)
    var k = 1 + dim
    for (i <- 0 until dim; j <- i until dim) {
      val c = (sums(k) - sums(1 + i) * sums(1 + j) / n) / (n - 1)
      cov(i)(j) = c; cov(j)(i) = c
      k += 1
    }
    // Cholesky of cov + εI (standard textbook algorithm, deterministic)
    val l = Array.ofDim[Double](dim, dim)
    for (i <- 0 until dim) {
      for (j <- 0 to i) {
        var s = cov(i)(j) + (if (i == j) eps else 0.0)
        var t = 0
        while (t < j) { s -= l(i)(t) * l(j)(t); t += 1 }
        if (i == j) {
          require(s > 0, s"covariance not positive definite at $i")
          l(i)(i) = math.sqrt(s)
        } else l(i)(j) = s / l(j)(j)
      }
    }
    // W = L⁻¹ by forward substitution, row by row
    val w = Array.ofDim[Double](dim, dim)
    for (r <- 0 until dim) {
      w(r)(r) = 1.0 / l(r)(r)
      for (c <- 0 until r) {
        var s = 0.0
        var t = c
        while (t < r) { s -= l(r)(t) * w(t)(c); t += 1 }
        w(r)(c) = s / l(r)(r)
      }
    }
    df.withColumn(vecCol,
      graft.functions.VectorExpressions.affineProject(col(vecCol), w, mu))
  }

  /**
   * Margin-based bitext mining (Artetxe & Schwenk, "Margin-based
   * Parallel Corpus Mining with Multilingual Sentence Embeddings" —
   * the LASER/CCMatrix criterion, public knowledge): a candidate pair
   * scores by its cosine RELATIVE to each side's local similarity
   * neighborhood,
   *
   *   margin(x, y) = cos(x, y) / (½·(avgTopK_tgt(x) + avgTopK_src(y)))
   *
   * which suppresses hub vectors that are near everything (their
   * denominator is high) and surfaces genuinely-aligned pairs even in
   * dense regions. Returns each source's best target with its margin
   * and an `accepted` flag at `threshold` (the paper operates around
   * 1.05–1.1; 1.0 = "above your own neighborhood average").
   *
   * Replayable end-to-end: cosines round to 4 dp before every rank
   * (ties → lowest id), margins round to 4 dp, a non-positive
   * denominator yields a null margin (never ±Inf into a rank).
   *
   * Scale shape: `src` is a BOUNDED mining batch (broadcast, as
   * [[bruteForceTopK]]'s queries); `tgt` streams through one narrow
   * scored pass and is never shuffled except by the per-side top-k
   * windows over candidate rows. The plan is |src|·|tgt| — linear in
   * the corpus ONLY while src stays bounded. When BOTH sides are
   * corpus-proportional (mining one language against another), use
   * [[mineBitextWithIndex]]: IVF-gated candidate lists on both sides
   * feeding this same margin algebra — the actual CCMatrix pipeline.
   *
   * @return (src_id, tgt_id, cosine, margin, accepted) — one row per
   *         src vector (its margin-best target)
   */
  def mineBitext(src: DataFrame, tgt: DataFrame, k: Int,
      threshold: Double = 1.05,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val s = src.select(col(idCol).as("src_id"), col(vecCol).as("__sv"))
    val x = graft.operators.PersistTracker.trackPersist(
      tgt.select(col(idCol).as("tgt_id"), col(vecCol).as("__tv"))
        .crossJoin(broadcast(s))
        .select(col("src_id"), col("tgt_id"),
          round(cosine(col("__sv"), col("__tv")), 4).as("cos")))
    val wx = Window.partitionBy("src_id")
      .orderBy(col("cos").desc, col("tgt_id"))
    // the averages stay UNROUNDED: the mean of k 4dp-rounded cosines
    // lands exactly on .00005 rounding ties about 1/k of the time,
    // where engines' ROUND implementations systematically disagree —
    // only the final margin is rounded (cross-engine drift there is
    // 1-ulp sum-order noise, the accepted class)
    val ax = x.withColumn("__rn", row_number().over(wx))
      .filter(col("__rn") <= k)
      .groupBy("src_id").agg(avg("cos").as("__ax"))
    val wy = Window.partitionBy("tgt_id")
      .orderBy(col("cos").desc, col("src_id"))
    val ay = x.withColumn("__rn", row_number().over(wy))
      .filter(col("__rn") <= k)
      .groupBy("tgt_id").agg(avg("cos").as("__ay"))
    val denom = lit(0.5) * (col("__ax") + col("__ay"))
    val scored = x.join(broadcast(ax), Seq("src_id"))
      .join(ay, Seq("tgt_id"))
      .withColumn("margin",
        when(denom > 0, round(col("cos") / denom, 4)))
    val wBest = Window.partitionBy("src_id")
      .orderBy(col("margin").desc_nulls_last, col("tgt_id"))
    scored.withColumn("__rn", row_number().over(wBest))
      .filter(col("__rn") === 1)
      .select(col("src_id"), col("tgt_id"), col("cos").as("cosine"),
        col("margin"),
        // null margin (non-positive denominator) is never accepted
        coalesce((col("margin") >= threshold).cast("int"), lit(0))
          .as("accepted"))
  }

  /**
   * ANN-gated margin bitext mining — the CCMatrix pipeline (Schwenk et
   * al., "CCMatrix: Mining Billions of High-Quality Parallel Sentences
   * on the Web", public knowledge) for the case [[mineBitext]]'s
   * contract excludes: BOTH sides corpus-proportional. Exact all-pairs
   * cosines are quadratic there; instead each side gets an IVF index
   * (deterministic lowest-id centroids, as [[buildIvfIndex]]) and the
   * margin runs over CANDIDATE LISTS:
   *
   *  - forward candidates: every src vector probes its `nprobe`
   *    nearest cells of the TGT index and keeps its `depth` best
   *    targets by rounded cosine;
   *  - backward candidates: every tgt vector probes the SRC index the
   *    same way (the margin's denominator needs y's own neighborhood,
   *    not just who found y);
   *  - each side's neighborhood average is the mean of its top-`k`
   *    candidate cosines (depth ≫ k so the average is stable);
   *  - pairs = forward ∪ backward candidate pairs, scored by the
   *    UNCHANGED margin algebra and reduced to each src's margin-best
   *    target with the `threshold` accept flag — [[mineBitext]]'s
   *    output contract, restricted to the candidate graph.
   *
   * Scale shape: the [[ivfKnnJoin]] discipline on both directions —
   * NOTHING broadcasts (both sides are corpus-sized); each direction is
   * one cell-partitioned shuffle join behind an exchange barrier on
   * `__cell` (the one-time co-location shuffle a deployment pays when
   * the assigned corpora are stored bucketed by cell), hot cells capped
   * by [[capCells]], and the per-probe candidate work is
   * `nprobe/numCells` of the opposite corpus — size `numCells` with the
   * corpus (~√n, the classic IVF choice) and the join stays subquadratic
   * with executor-sized cells. The per-side top-`depth` windows rewrite
   * to partial top-k before their exchanges (WindowGroupLimit).
   *
   * Replayable end-to-end (the q43 + q126 devices): centroid choice,
   * cell assignment, probe ranking, candidate ranks, both averages, the
   * margin and the accept flag are all 4dp-rounded with id tie-breaks.
   * With `nprobe = numCells` and `depth ≥ max(|src|, |tgt|)` the
   * candidate graph is complete and the result ≡ [[mineBitext]]
   * exactly (spec-checked) — the gated form degrades only by candidate
   * coverage, never by algebra.
   *
   * @param depth candidate-list depth per vector (≫ k; caps the pair
   *              fan-out each side contributes)
   * @param numCells coarse-quantizer size for BOTH directions' indexes;
   *                 0 (the default) scales each direction with ITS
   *                 indexed corpus via [[scaledCellCount]] — the
   *                 subquadratic shape without the caller having to
   *                 count. A fixed value re-grows the per-probe scan
   *                 linearly with corpus size; pass one only to replay
   *                 a pinned configuration.
   * @return (src_id, tgt_id, cosine, margin, accepted) — one row per
   *         src vector (its margin-best candidate target)
   */
  def mineBitextWithIndex(src: DataFrame, tgt: DataFrame, k: Int,
      depth: Int, threshold: Double = 1.05,
      numCells: Int = 0, nprobe: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxCellSize: Int = 100000): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(depth >= k, s"depth must be >= k, got ($depth, $k)")
    require(numCells >= 0 && numCells <= 4096,
      s"numCells in [0 (auto), 4096], got $numCells")

    // one direction: every `from` vector probes the `to` index and
    // keeps its `depth` best opposite-side candidates by rounded cosine
    def candidates(from: DataFrame, to: IvfIndex, fromId: String,
        toId: String): DataFrame = {
      val cents = to.centroids
      require(nprobe > 0 && nprobe <= cents.size,
        s"nprobe in [1,${cents.size}]")
      val assigned = capCells(to.assigned, idCol, maxCellSize,
        "mineBitextWithIndex")
      val probes = from
        .select(col(idCol).as(fromId), col(vecCol).as("__qvec"))
        .withColumn("__p", explode(topCellsOf(col("__qvec"), cents, nprobe)))
        .select(col(fromId), col("__qvec"), col("__p.cell").as("__cell"))
      // exchange barrier on the cell key — the ivfKnnJoin rationale:
      // keeps the 16-cosine assignment expression out of the join stage
      // (codegen health) and is the honest at-rest bucketing shuffle
      val scored = assigned.repartition(col("__cell"))
        .join(probes, Seq("__cell"))
        .withColumn("cos", round(cosine(col("__qvec"), col("__cvec")), 4))
      val w = Window.partitionBy(fromId)
        .orderBy(col("cos").desc, col(idCol))
      scored.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= depth)
        .select(col(fromId), col(idCol).as(toId), col("cos"), col("__rn"))
    }

    val s = src.select(col(idCol), col(vecCol))
    val t = tgt.select(col(idCol), col(vecCol))
    // auto mode: each direction's quantizer scales with the corpus it
    // indexes (one count per side — cheap against the joins it sizes)
    val cellsT = if (numCells > 0) numCells else scaledCellCount(t.count())
    val cellsS = if (numCells > 0) numCells else scaledCellCount(s.count())
    // persisted: each direction feeds its side's average AND the pair
    // union — without the cache the cell joins run twice
    val fwd = graft.operators.PersistTracker.trackPersist(
      candidates(s, buildIvfIndex(t, cellsT, idCol, vecCol),
        "src_id", "tgt_id"))
    val bwd = graft.operators.PersistTracker.trackPersist(
      candidates(t, buildIvfIndex(s, cellsS, idCol, vecCol),
        "tgt_id", "src_id"))

    // neighborhood averages over each side's own top-k candidates; the
    // averages stay UNROUNDED (the mineBitext rationale — only the
    // final margin rounds)
    val ax = fwd.filter(col("__rn") <= k)
      .groupBy("src_id").agg(avg("cos").as("__ax"))
    val ay = bwd.filter(col("__rn") <= k)
      .groupBy("tgt_id").agg(avg("cos").as("__ay"))

    // candidate pairs from BOTH directions (cos is deterministic per
    // pair, so distinct collapses the overlap); the ax/ay joins are
    // plain shuffle joins — both sides are corpus-proportional, nothing
    // is broadcastable here by design
    val pairs = fwd.select(col("src_id"), col("tgt_id"), col("cos"))
      .unionByName(bwd.select(col("src_id"), col("tgt_id"), col("cos")))
      .distinct()
    val denom = lit(0.5) * (col("__ax") + col("__ay"))
    val scored = pairs.join(ax, Seq("src_id")).join(ay, Seq("tgt_id"))
      .withColumn("margin",
        when(denom > 0, round(col("cos") / denom, 4)))
    val wBest = Window.partitionBy("src_id")
      .orderBy(col("margin").desc_nulls_last, col("tgt_id"))
    scored.withColumn("__rn", row_number().over(wBest))
      .filter(col("__rn") === 1)
      .select(col("src_id"), col("tgt_id"), col("cos").as("cosine"),
        col("margin"),
        coalesce((col("margin") >= threshold).cast("int"), lit(0))
          .as("accepted"))
  }

  /**
   * Train a PQ codebook for [[pqTopK]]: per-subspace deterministic
   * k-means ([[Clustering.kmeansCentroidMeans]] — MEANS, not sums,
   * because ADC scores are raw dot products where centroid scale
   * matters) over each `dim/m`-wide sub-vector slice of the corpus.
   *
   * `m` independent trainings, each one narrow slice projection of the
   * corpus + the k-means loop's bounded driver state — at scale, train
   * on a [[Sampling.deterministicSample]] slice and persist it first so
   * the `m` passes share one cached frame.
   */
  def pqTrainCodebook(corpus: DataFrame, m: Int = 8, codebookSize: Int = 16,
      iters: Int = 2, idCol: String = "vec_id",
      vecCol: String = "embedding"): Seq[Seq[Seq[Float]]] = {
    require(m > 0 && codebookSize > 0 && codebookSize <= 256,
      s"need m>0 and codebookSize in [1,256], got ($m, $codebookSize)")
    val dim = corpus.select(size(col(vecCol)).as("d")).limit(1)
      .collect().headOption.map(_.getInt(0))
      .getOrElse(throw new IllegalArgumentException("empty corpus"))
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sd = dim / m
    (0 until m).map { j =>
      val sub = corpus.select(col(idCol),
        slice(col(vecCol), j * sd + 1, sd).as("__sub"))
      Clustering.kmeansCentroidMeans(sub, codebookSize, iters, idCol, "__sub")
        .map(_.map(_.toFloat))
    }
  }
}
