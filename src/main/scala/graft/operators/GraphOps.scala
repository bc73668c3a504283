package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Graph analytics over corpus-derived graphs — the link-analysis family a
 * large-scale data pipeline uses for representativeness ranking and
 * duplicate-cluster centrality (public algorithm: PageRank, Page/Brin/
 * Motwani/Winograd 1999; the power-iteration formulation).
 *
 * The graph itself is data-derived: [[knnEdgesExact]] builds the directed
 * k-nearest-neighbour graph over an embedding column (each node points at
 * its k most-similar peers), the graph used for hub detection ("which
 * documents are everyone's neighbour?") and as the similarity backbone for
 * diversity-aware selection. Any (src, dst) edge frame works — the near-dup
 * star edges from [[Dedup.nearDupStarEdgesFromSignatures]] feed
 * [[pageRank]] directly for duplicate-cluster centrality.
 *
 * Determinism: the rank is FIXED-POINT — a long at scale 10^12 with every
 * operation in integer arithmetic (explicit `div`). Float power iteration
 * cannot survive a cross-engine hash gate: rank vectors land on a decimal
 * grid after one iteration, so the next iteration's quarter-sums sit
 * EXACTLY on rounding midpoints where one summation-order ulp flips any
 * rounding scheme. Integer sums are associative — partial aggregation
 * order cannot matter — and the per-edge `(pr·dNum) div (dDen·deg)` floor
 * replays verbatim in SQL. (The same integer-quantization device as
 * [[UnigramLm]]'s log-prob grid.) The deliberate cost: each edge term
 * floors away < 1 unit of 10^-12 — a sub-ppb perturbation of the classic
 * float PageRank, identically on every engine.
 *
 * Scale notes:
 *  - [[knnEdgesExact]] is the EXACT O(n²) route (one narrow broadcast
 *    self-join + per-src top-k window) — correct at any SF but priced for
 *    validation corpora. At 100 TB swap edge generation for the ANN
 *    candidate stage ([[Similarity.ivfTopKWithIndex]] with depth ≥ k) and
 *    feed the same [[pageRank]]; the iteration machinery never changes.
 *  - [[pageRank]] is pure relational per iteration: one |E|-row shuffle
 *    join on src, one |V|-group long-sum aggregate on dst (map-side
 *    combine), one left join back to the node frame. No driver state (the
 *    node count is a 1-row broadcast stats frame); no global window;
 *    edges+degrees persist once and replay each round.
 */
object GraphOps {

  /**
   * Directed kNN graph over an embedding column: for every vector, an
   * edge to each of its `k` most-cosine-similar peers (self excluded).
   * Ranking follows the battery's ANN discipline — cosine rounded to 4
   * places BEFORE the rank, ties broken by neighbour id ascending — so
   * the edge set is exactly replayable by an oracle.
   *
   * @return `(src, dst, cosine, rank)` with rank in [1, k]
   */
  def knnEdgesExact(emb: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val parallelism = emb.sparkSession.sparkContext.defaultParallelism
    val a0 = emb.select(col(idCol).as("src"), col(vecCol).as("__av"))
    // small validation corpora arrive as 1-2 parquet splits; spread the
    // probe side so the O(n²) scoring pass uses the whole machine
    val a = if (a0.rdd.getNumPartitions < parallelism / 2)
      a0.repartition(parallelism) else a0
    val b = emb.select(col(idCol).as("dst"), col(vecCol).as("__bv"))
    val scored = a.join(broadcast(b), col("src") =!= col("dst"))
      .withColumn("cosine",
        round(Similarity.cosine(col("__av"), col("__bv")), 4))
    val w = Window.partitionBy("src").orderBy(col("cosine").desc, col("dst"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("src", "dst", "cosine", "rank")
  }

  /** Fixed-point grid: ranks are longs at this scale (10^-12 resolution —
    * 1e12 total mass splits meaningfully down to trillion-node graphs). */
  val PrScale: Long = 1000000000000L

  /**
   * Power-iteration PageRank over a directed edge frame, in fixed-point
   * integer arithmetic (see object doc for why float cannot hash-gate).
   *
   * With damping d = dampingNum/dampingDen:
   *   pr⁰(v) = S div N
   *   prᵗ(v) = (S·(dDen−dNum)) div (dDen·N)
   *            + Σ_{u→v} (prᵗ⁻¹(u)·dNum) div (dDen·outdeg(u))
   * all on longs at scale S = 10^12. Nodes with no out-edges (dangling)
   * leak their mass — the "no dangling redistribution" variant an oracle
   * replays exactly; kNN graphs have uniform out-degree k and no dangling
   * nodes at all.
   *
   * Deep-iteration hardening: small `iters` unroll into one lineage (the
   * cheapest plan — no materialization); past `truncateEvery` iterations
   * the rank frame is `localCheckpoint`ed to cut the lineage, because
   * Catalyst analysis/codegen cost otherwise grows with plan DEPTH (the
   * values are exact integers, so truncation cannot change them —
   * spec-pinned truncated ≡ unrolled). `tolE12 >= 0` adds a convergence
   * stop: iteration ends early once no node's rank moved by more than
   * `tolE12` fixed-point units — an EXACT integer delta (float PageRank
   * could never honestly compare to 0), at the cost of one bounded
   * 1-row driver action per iteration (each iteration materializes via
   * localCheckpoint in that mode, so the delta action never replays the
   * whole lineage). With `tolE12 = 0` the stop is EXACT: a zero-delta
   * integer state is a fixpoint of the update, so stopping returns
   * bit-identically what running the remaining iterations would. With
   * `tolE12 > 0` the state may still be moving within the tolerance —
   * the result equals the run truncated at the stop iteration, not the
   * full `iters` run.
   *
   * @param edges `(src, dst)` distinct directed edges
   * @param nodes one row per node (the universe — nodes with no in-edges
   *              still receive the teleport term)
   * @param tolE12 convergence threshold in 10^-12 rank units; negative
   *               (default) disables the per-iteration delta check
   * @param truncateEvery cut lineage every this many iterations
   * @return `(idCol, pr_e12)` — one row per node, rank at scale 10^12
   */
  def pageRank(edges: DataFrame, nodes: DataFrame, idCol: String,
      iters: Int, dampingNum: Int = 17, dampingDen: Int = 20,
      tolE12: Long = -1L, truncateEvery: Int = 8): DataFrame = {
    require(iters >= 1, "pageRank: iters must be >= 1")
    require(dampingNum > 0 && dampingNum < dampingDen,
      "pageRank: damping must be in (0, 1)")
    require(truncateEvery >= 1, "pageRank: truncateEvery must be >= 1")
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
    // |E| rows, persisted once, replayed every iteration
    val e = PersistTracker.trackPersist(
      edges.select("src", "dst").join(deg, "src"))
    // 1-row node count, broadcast into every iteration (house stats-frame
    // shape — no driver action, no global window)
    val nDf = nodes.agg(count(lit(1)).as("__n"))
    val base = nodes.select(col(idCol).as("__nid"))
      .crossJoin(broadcast(nDf))
    val teleport = expr(
      s"(${PrScale}L * ${dampingDen - dampingNum}) div ($dampingDen * __n)")
    var pr = base.select(col("__nid"), expr(s"${PrScale}L div __n").as("pr"))
    var it = 1
    var converged = false
    while (it <= iters && !converged) {
      val contrib = e.join(pr, e("src") === pr("__nid"))
        .groupBy(col("dst"))
        .agg(sum(expr(s"(pr * $dampingNum) div ($dampingDen * __deg)"))
          .as("__in"))
      val next = base
        .join(contrib, col("__nid") === col("dst"), "left")
        .select(col("__nid"),
          (teleport + coalesce(col("__in"), lit(0L))).as("pr"))
      val cut = if (tolE12 >= 0L || it % truncateEvery == 0)
        next.localCheckpoint(true) else next
      if (tolE12 >= 0L) {
        val delta = cut
          .join(pr.select(col("__nid"), col("pr").as("__prev")), "__nid")
          .agg(coalesce(max(abs(col("pr") - col("__prev"))), lit(0L)))
          .head.getLong(0)
        converged = delta <= tolE12
      }
      pr = cut
      it += 1
    }
    pr.select(col("__nid").as(idCol), col("pr").as("pr_e12"))
  }
}
