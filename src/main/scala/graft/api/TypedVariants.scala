package graft.api

import graft.model.{VariantRecord, VariantSampleDetail}
import graft.sources.VariantStore
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Typed `Dataset` facade over a loaded variant store — the
 * `Dataset[T]`/`Encoder` surface SURVEY.md §2.9 reserves for where type
 * safety helps: consumers get compile-checked fields and case-class
 * results while the operators underneath stay DataFrame/Column (dynamic
 * schema, full Catalyst optimization).
 *
 * Filters here are deliberately COLUMN-based even though the return
 * types are typed: a lambda filter (`ds.filter(_.genicStatus ==
 * "GENIC")`) deserializes every row and is opaque to the optimizer (no
 * pushdown, no pruning), which defeats the store's bucketing. Columns
 * keep the plan declarative; the typed boundary is the RESULT.
 */
class TypedVariants(spark: SparkSession, storeDir: String) {
  import spark.implicits._

  /** Store snapshot as `Dataset[VariantRecord]`. Fields the load path
    * never writes (clinvar_id) surface as None. */
  def variants: Dataset[VariantRecord] =
    VariantStore.variants(spark, storeDir)
      .select(
        col("rgd_id").as("rgdId"),
        col("chromosome"),
        col("start_pos").as("startPos"),
        col("end_pos").as("endPos"),
        col("ref_nuc").as("refNuc"),
        col("var_nuc").as("varNuc"),
        col("variant_type").as("variantType"),
        col("padding_base").as("paddingBase"),
        col("rs_id").as("rsId"),
        lit(null).cast("string").as("clinvarId"),
        col("genic_status").as("genicStatus"),
        col("map_key").as("mapKey"),
        col("species_type_key").as("speciesTypeKey"))
      .as[VariantRecord]

  /** Sample details as `Dataset[VariantSampleDetail]`. All 12 reference
    * columns (DAO.java:70-75) are physical in the store; the ones the
    * loader never sets (source, ref allele, num allele, quality) carry
    * the reference's unset-bean defaults. */
  def sampleDetails: Dataset[VariantSampleDetail] =
    spark.read.parquet(s"$storeDir/details")
      .select(
        col("rgd_id").as("rgdId"),
        col("source"),
        col("sample_id").as("sampleId"),
        col("total_depth").as("totalDepth"),
        col("var_freq").as("varFreq"),
        col("zygosity_status").as("zygosityStatus"),
        col("zygosity_percent_read").as("zygosityPercentRead"),
        col("zygosity_poss_error").as("zygosityPossError"),
        col("zygosity_ref_allele").as("zygosityRefAllele"),
        coalesce(col("zygosity_num_allele"), lit(0)).as("zygosityNumAllele"),
        col("zygosity_in_pseudo").as("zygosityInPseudo"),
        col("quality_score").as("qualityScore"))
      .as[VariantSampleDetail]

  /** Variants of one genic status (Column filter — pushes down). */
  def byGenicStatus(status: String): Dataset[VariantRecord] =
    variants.filter(col("genicStatus") === status)

  /** Range scan, typed (J5 shape). */
  def inRange(mapKey: Int, chromosome: String, from: Long,
      to: Long): Dataset[VariantRecord] =
    variants.filter(col("mapKey") === mapKey &&
      col("chromosome") === chromosome &&
      col("startPos").between(from, to))

  /** Typed aggregation example: variants per (chromosome, type) as a
    * case-class-free tuple Dataset — groupByKey keeps the keys typed,
    * count stays a Catalyst aggregate. */
  def countsByChromosomeType: Dataset[((String, String), Long)] =
    variants.groupByKey(v => (v.chromosome, v.variantType)).count()
}
