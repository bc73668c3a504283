package graft.operators

import graft.model.LoadConfig
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The `--genicQc` repair pipeline (SURVEY.md §3 E2, GenicQc.java:27-69):
 * re-scan VCFs, re-derive loci, look up already-loaded variants at those
 * loci, recompute genic status, and emit only the rows whose status
 * changed (A5 delta → K6 update sink).
 *
 * Reference quirks preserved:
 *  - the QC probe is the degenerate point [start_pos, start_pos]
 *    (GenicQc.java:232), unlike the loader's [start_pos, end_pos] — kept
 *    behind `pointProbe` (default true = reference behavior);
 *  - no multi-allelic expansion (GenicQc.java:113-116): loci come from the
 *    first-allele normalization only. Set-level this is subsumed by taking
 *    DISTINCT loci, since expansion never changes the derived start of
 *    allele 0.
 *
 * Scale: loci are DISTINCT (chromosome, start_pos) — the J5 range lookup
 * becomes one semi-join against the store, shuffled on the same key the
 * store would be bucketed by; gene intervals broadcast as in the loader.
 */
object GenicQcJob {

  /** @return changed rows `(rgd_id, chromosome, start_pos, old_status,
    *         genic_status)` — the K6 update batch. */
  def run(spark: SparkSession, vcfPath: String, genes: DataFrame,
      existing: DataFrame, config: LoadConfig,
      pointProbe: Boolean = true): DataFrame = {

    val loci = VariantLoader.normalizedAlleles(spark, vcfPath, config)
      .filter(col("allele_idx") === 0)
      .select("chromosome", "start_pos").distinct()

    // J5: variants already loaded at the re-derived loci
    val probed = existing.join(loci, Seq("chromosome", "start_pos"), "left_semi")

    val withProbe =
      if (pointProbe)
        probed.withColumnRenamed("end_pos", "end_pos_orig")
          .withColumn("end_pos", col("start_pos"))
      else probed.withColumn("end_pos_orig", col("end_pos"))

    GenicAnnotator.annotateIndexed(
      withProbe.withColumnRenamed("genic_status", "old_status"), genes)
      .filter(col("genic_status") =!= col("old_status"))
      .select(col("rgd_id"), col("chromosome"), col("start_pos"),
        col("old_status"), col("genic_status"))
  }
}
