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
 * The operator is split index/serve the way a 100 TB deployment is:
 * [[buildIndex]] derives the classic inverted-index frames — per-
 * (doc, term) tf with the doc length attached, per-term df, and a
 * single-row (N, avgdl) stats frame — in two corpus aggregations;
 * [[bm25TopK]] then scores with ONE pass over the tf frame: the query
 * terms broadcast into it, the df rows for those terms (a |query terms|-
 * row slice, never the full vocabulary) broadcast, stats broadcast, and
 * the only corpus-scale shuffles are the final per-(query, doc) sum and
 * the top-k window over candidate docs (docs sharing ≥ 1 query term —
 * term selectivity bounds the fan-out). Persist the index frames — or
 * write tf bucketed on `__t` ([[graft.sources.BucketedTables]]) — and
 * per-request cost is independent of corpus tokenization.
 */
object Retrieval {

  /** Inverted index: `tf(__id, __t, __tf, __dl)`, `df(__t, __df)`,
    * `stats(__n, __avgdl)` — the three frames BM25 serving needs.
    * Columns are engine-internal; persist or bucket-write the frames to
    * reuse across query batches. */
  case class Bm25Index(tf: DataFrame, df: DataFrame, stats: DataFrame)

  /** Derive a [[Bm25Index]]. The per-(doc, term) tf frame is persisted
    * (it feeds the df aggregation AND every scoring pass); doc length
    * rides ON the tf rows so serving never joins a per-doc frame. */
  def buildIndex(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): Bm25Index = {
    val dl = docs.select(col(idCol).as("__id"),
      size(TextAnalysis.tokens(lower(col(textCol)))).as("__dl"))
    val terms = docs.select(col(idCol).as("__id"),
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("__t"))
    val tf = PersistTracker.trackPersist(terms
      .groupBy("__id", "__t").agg(count(lit(1)).as("__tf"))
      .join(dl, Seq("__id")))
    Bm25Index(
      tf,
      tf.groupBy("__t").agg(count(lit(1)).as("__df")),
      dl.agg(count(lit(1)).as("__n"), avg(col("__dl")).as("__avgdl")))
  }

  /**
   * BM25 top-k: for each query row, the `k` best-scoring documents.
   *
   * @return `(queryIdCol, rank, idCol, score)` — rank 1..k by
   *         (score desc, doc id asc), score rounded 4dp
   */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text",
      queryIdCol: String = "query_id", queryTextCol: String = "query_text"): DataFrame =
    bm25TopKWithIndex(buildIndex(docs, idCol, textCol), queries, k, k1, b,
      idCol, queryIdCol, queryTextCol)

  /** [[bm25TopK]] against a prepared [[Bm25Index]] — the serving form:
    * only the query side and the candidate slice of the index move. */
  def bm25TopKWithIndex(index: Bm25Index, queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id",
      queryIdCol: String = "query_id", queryTextCol: String = "query_text"): DataFrame = {
    require(k > 0 && k1 >= 0 && b >= 0 && b <= 1,
      s"need k>0, k1>=0, b in [0,1]; got ($k, $k1, $b)")
    val qterms = queries.select(col(queryIdCol),
        explode(TextAnalysis.tokens(lower(col(queryTextCol)))).as("__t"))
      .distinct()
    // df slice for the query vocabulary only — |query terms| rows, so it
    // broadcasts no matter how large the corpus vocabulary is
    val dfq = index.df
      .join(broadcast(qterms.select("__t").distinct()), Seq("__t"))
    val idf = log(lit(1.0) +
      (col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5)))
    val norm = col("__tf") /
      (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl")))
    val scored = index.tf
      .join(broadcast(qterms), Seq("__t"))
      .join(broadcast(dfq), Seq("__t"))
      .crossJoin(broadcast(index.stats))
      .groupBy(col(queryIdCol), col("__id"))
      .agg(round(sum(idf * norm), 4).as("score"))
    val w = Window.partitionBy(queryIdCol)
      .orderBy(col("score").desc, col("__id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col("rank"), col("__id").as(idCol), col("score"))
  }

  /**
   * Exact phrase search: for each query phrase, every document whose
   * token stream contains the phrase's tokens CONTIGUOUSLY, with the
   * occurrence count and the 1-based position of the first occurrence —
   * the corpus-audit primitive BM25's bag-of-words ranking can't answer
   * ("which documents contain this exact benchmark sentence?").
   *
   * Classic positional-index anchor alignment: positional postings
   * (doc, pos, term) join the broadcast query terms (qpos, term); a
   * phrase occurrence starting at position a exists iff every qpos has
   * a posting at a + qpos − 1, i.e. the (doc, anchor = pos − qpos)
   * group covers all qlen query offsets. Repeated phrase terms are
   * handled by counting DISTINCT qpos per anchor.
   *
   * Scale shape: the postings explode is the corpus scan (build it once
   * and persist/bucket by term for repeated audits); the broadcast term
   * join discards every non-matching posting AT the scan, so the anchor
   * aggregation — the only corpus-scale shuffle — sees only postings of
   * query terms (query-vocabulary selectivity, not corpus size).
   */
  def phraseSearch(docs: DataFrame, queries: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      queryIdCol: String = "query_id", phraseCol: String = "phrase"): DataFrame = {
    val postings = docs.select(col(idCol),
        posexplode(TextAnalysis.tokens(lower(col(textCol))))
          .as(Seq("__p", "__t")))
      .select(col(idCol), (col("__p") + 1).as("__pos"), col("__t"))
    val qtoks = TextAnalysis.tokens(lower(col(phraseCol)))
    val qt = queries.select(col(queryIdCol), size(qtoks).as("__qlen"),
        posexplode(qtoks).as(Seq("__q", "__t")))
      .select(col(queryIdCol), col("__qlen"), (col("__q") + 1).as("__qpos"),
        col("__t"))
    postings.join(broadcast(qt), Seq("__t"))
      .select(col(queryIdCol), col(idCol), col("__qlen"), col("__qpos"),
        (col("__pos") - col("__qpos")).as("__anchor"))
      .groupBy(col(queryIdCol), col(idCol), col("__anchor"), col("__qlen"))
      .agg(countDistinct(col("__qpos")).as("__hit"))
      .filter(col("__hit") === col("__qlen"))
      .groupBy(col(queryIdCol), col(idCol))
      .agg(count(lit(1)).as("n_matches"),
        (min(col("__anchor")) + 1).cast("long").as("first_pos"))
  }
}
