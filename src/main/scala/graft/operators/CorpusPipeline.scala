package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * End-to-end corpus preparation: the composition a training-data team
 * actually runs, assembled from this library's operators in the order
 * that shrinks data earliest:
 *
 *  1. exact dedup (md5 fingerprint of normalized text, keep lowest id) —
 *     cheapest stage, biggest reduction, so it runs first;
 *  2. quality gate (token count + stopword ratio) — a narrow codegen'd
 *     filter on the survivors;
 *  3. per-source quota cap ([[Dedup.capPerKey]]) — bounds any one
 *     domain's share of the mixture; the only remaining shuffle;
 *  4. deterministic split assignment ([[Sampling.assignSplit]]) — a
 *     narrow projection, so re-runs never migrate documents.
 *
 * Scale shape: stages 1 and 3 are one hash shuffle each (fingerprint,
 * source); 2 and 4 are shuffle-free. Near-dup clustering
 * ([[Dedup.connectedComponents]]) slots between 1 and 2 when the corpus
 * warrants it — left out of the default chain because pair enumeration
 * is the one stage whose cost is corpus-dependent.
 *
 * Returns the surviving rows with their original columns plus `split`.
 */
object CorpusPipeline {

  def prepare(df: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      sourceCol: String = "source",
      minTokens: Int = 25, minStopRatio: Double = 0.02,
      perSourceCap: Int = 15, splitSalt: String = "v1"): DataFrame = {
    val norm = regexp_replace(trim(lower(col(textCol))), "\\s+", " ")
    val deduped = Dedup.exactDedup(df, md5(norm), col(idCol))
      .filter(!col("is_duplicate")).drop("is_duplicate")
    val quality = deduped.filter(
      TextAnalysis.tokenCount(col(textCol)) >= minTokens &&
        TextAnalysis.stopwordRatio(col(textCol)) >= minStopRatio)
    val capped = Dedup.capPerKey(quality, col(sourceCol),
      length(col(textCol)), col(idCol), perSourceCap)
    Sampling.assignSplit(capped, col(idCol), splitSalt)
  }
}
