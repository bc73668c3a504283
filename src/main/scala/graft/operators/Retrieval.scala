package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sparse lexical retrieval over a document corpus — the ranking side of
 * a training-data pipeline (dataset curation by query, decontamination
 * triage, RAG corpus serving). Okapi BM25 (Robertson et al. — public
 * knowledge), in Lucene's non-negative idf form:
 *
 *   score(q, d) = Σ_{t ∈ q ∩ d} ln(1 + (N − df + 0.5)/(df + 0.5))
 *                 · tf / (tf + k1·(1 − b + b·dl/avgdl))
 *
 * Engine-reproducible by the battery's standard devices: whitespace
 * tokens lowercased on both sides, scores rounded at 4dp, rank ties to
 * the lowest doc id.
 *
 * 100 TB shape: the corpus side is two hash aggregations (per-(doc,term)
 * tf — persisted, it feeds both the df count and the scoring join — and
 * per-term df) plus one narrow per-doc length projection; corpus stats
 * `(N, avgdl)` ride a broadcast single-row crossJoin, never a driver
 * collect. The query side is small by definition, so its distinct terms
 * BROADCAST into the tf join: the only corpus-scale shuffles are the two
 * aggregations and the final per-query top-k window over candidate docs
 * (docs sharing ≥1 query term — gram selectivity bounds the fan-out).
 * At serving scale the tf/df frames are the inverted index: write them
 * once bucketed on term and only the query side moves per request.
 */
object Retrieval {

  /**
   * BM25 top-k: for each query row, the `k` best-scoring documents.
   *
   * @return `(queryIdCol, rank, idCol, score)` — rank 1..k by
   *         (score desc, doc id asc), score rounded 4dp
   */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text",
      queryIdCol: String = "query_id", queryTextCol: String = "query_text"): DataFrame = {
    require(k > 0 && k1 >= 0 && b >= 0 && b <= 1,
      s"need k>0, k1>=0, b in [0,1]; got ($k, $k1, $b)")
    val terms = docs.select(col(idCol).as("__id"),
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("__t"))
    // persisted: tf feeds the df aggregation AND the scoring join
    val tf = PersistTracker.trackPersist(
      terms.groupBy("__id", "__t").agg(count(lit(1)).as("__tf")))
    val dfreq = tf.groupBy("__t").agg(count(lit(1)).as("__df"))
    val dl = docs.select(col(idCol).as("__id"),
      size(TextAnalysis.tokens(lower(col(textCol)))).as("__dl"))
    val stats = dl.agg(count(lit(1)).as("__n"), avg(col("__dl")).as("__avgdl"))
    val qterms = queries.select(col(queryIdCol),
        explode(TextAnalysis.tokens(lower(col(queryTextCol)))).as("__t"))
      .distinct()
    val idf = log(lit(1.0) +
      (col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5)))
    val norm = col("__tf") /
      (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl")))
    val scored = tf
      .join(broadcast(qterms), Seq("__t"))
      .join(dfreq, Seq("__t"))
      .join(dl, Seq("__id"))
      .crossJoin(broadcast(stats))
      .groupBy(col(queryIdCol), col("__id"))
      .agg(round(sum(idf * norm), 4).as("score"))
    val w = Window.partitionBy(queryIdCol)
      .orderBy(col("score").desc, col("__id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col("rank"), col("__id").as(idCol), col("score"))
  }
}
