package graft.api

import graft.sources.VariantStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The engine's query surface over a loaded variant store — the E3
 * equivalent of the reference's DAO API (SURVEY.md §3 E3; DAO.java
 * point lookups :121-136, range scans :138-140,165-167, existence counts
 * :60-66, dimension gets :37-49). Each per-row JDBC query becomes a
 * pruned DataFrame over the chromosome-partitioned store — partition
 * pruning gives the reference's per-chromosome access path, Catalyst
 * replaces Oracle's optimizer.
 *
 * `registerViews` exposes the store to `spark.sql` users as `variant`
 * (denormalized variant ⋈ variant_map_data) and `variant_sample_detail`.
 */
class VariantQueries(spark: SparkSession, storeDir: String) {

  /** Snapshot of the primary denormalized variant table. */
  def primaryVariants: DataFrame = VariantStore.variants(spark, storeDir)

  /** Snapshot of the `variant_ext` side (empty when absent). */
  def variantsExt: DataFrame = VariantStore.variantsExt(spark, storeDir)

  /** The DAO's variant relation: `variant ∪ variant_ext` — rgdcore's
    * VariantDAO queries the union of the two schema-identical tables
    * (U1), so every lookup below sees both sides. */
  def variants: DataFrame = primaryVariants.unionByName(variantsExt)

  /** Snapshot of the sample-detail table. */
  def sampleDetails: DataFrame =
    spark.read.parquet(s"$storeDir/details")

  /** Register SQL views (the spark.sql entry point, E3): `variant` and
    * `variant_ext` as their own tables plus the DAO-shaped union
    * `variant_all`. */
  def registerViews(): Unit = {
    primaryVariants.createOrReplaceTempView("variant")
    variantsExt.createOrReplaceTempView("variant_ext")
    variants.createOrReplaceTempView("variant_all")
    sampleDetails.createOrReplaceTempView("variant_sample_detail")
  }

  /** DAO.getVariant (DAO.java:121-128): variants at an exact locus. */
  def variantsAtLocus(mapKey: Int, chromosome: String,
      startPos: Long): DataFrame =
    variants.filter(col("map_key") === mapKey &&
      col("chromosome") === chromosome && col("start_pos") === startPos)

  /** DAO.getVariantByRsId (DAO.java:130-136). */
  def variantsByRsId(mapKey: Int, rsId: String): DataFrame =
    variants.filter(col("map_key") === mapKey && col("rs_id") === rsId)

  /** DAO.getVariantsWithGeneLocation (DAO.java:138-140): range scan. */
  def variantsInRange(mapKey: Int, chromosome: String, from: Long,
      to: Long): DataFrame =
    variants.filter(col("map_key") === mapKey &&
      col("chromosome") === chromosome &&
      col("start_pos").between(from, to))

  /** DAO.getVariantSampleDetailCount (DAO.java:64-66): existence count. */
  def detailCount(rgdId: Long, sampleId: Int): Long =
    sampleDetails.filter(col("rgd_id") === rgdId &&
      col("sample_id") === sampleId).count()

  /** rgdcore `select distinct(vmd.map_key)` (A4). */
  def distinctMapKeys(): DataFrame =
    variants.select("map_key").distinct()

  /** rgdcore `select distinct start_pos, chromosome` (A4). */
  def distinctLoci(mapKey: Int): DataFrame =
    variants.filter(col("map_key") === mapKey)
      .select("start_pos", "chromosome").distinct()

  /** rgdcore pagination (`offset ? rows fetch next N rows only`, L1) —
    * deterministic keyset pagination on rgd_id (offset+limit over an
    * unordered store is nondeterministic in any engine). */
  def pageVariants(afterRgdId: Long, pageSize: Int): DataFrame =
    variants.filter(col("rgd_id") > afterRgdId)
      .orderBy("rgd_id").limit(pageSize)
}
