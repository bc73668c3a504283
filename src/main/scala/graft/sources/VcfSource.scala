package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * VCF text source (SURVEY.md §2.1 S1-S3).
 *
 * The reference streams one gzip file line-at-a-time
 * (DAO.java:186-199, HrdpVariants.java:87-115). Here the file (or a whole
 * directory glob of files, S2 — DAO.java:173-184) is read with
 * `spark.read.text`, which handles .gz transparently; records become one
 * DataFrame with fixed columns plus a `genotypes` array aligned with the
 * header's sample columns (S3 — HrdpVariants.java:95-110).
 *
 * Scale note: a single .gz file is a single input partition (gzip is not
 * splittable). At 100 TB inputs arrive as many files, so parallelism comes
 * from the file count; a `repartition` after parse re-balances if one file
 * dominates. For genuinely huge single files, pre-split or use bgzip.
 */
object VcfSource {

  /** Column layout of a parsed (but not yet normalized) VCF record. */
  val fixedCols: Seq[String] =
    Seq("chrom", "pos", "rs_id", "ref", "alt", "qual", "filter", "info", "format")

  /**
   * Reads the sample names from the `#CHROM` header line.
   * Runs on the driver — the header is within the first lines of the file,
   * mirroring the reference's sequential header scan (HrdpVariants.java:97).
   */
  def headerSamples(spark: SparkSession, path: String): Seq[String] = {
    val header = spark.read.textFile(path)
      .filter(_.startsWith("#CHROM"))
      .head()
    header.split("\t").drop(9).toSeq
  }

  /**
   * Parses VCF records into a DataFrame:
   * `(chrom, pos, rs_id, ref, alt, qual, filter, info, format,
   *   genotypes: array<string>)`.
   *
   * - `##`/header lines dropped (P1, HrdpVariants.java:95-96)
   * - tab split (P2, :172); fixed 9 columns + the rest as `genotypes`
   * - rs_id "." → null (P6, :191-195)
   * - chromosome left RAW here; contig filter + normalization (P3/P4) are
   *   applied by the load pipeline so the quirk flags stay in one place.
   *
   * `split(value, "\t", -1)` keeps trailing empty strings — Java's
   * `String.split("\t")` drops them (SURVEY.md §2.6), but a trailing empty
   * genotype column is data corruption we'd rather surface than hide.
   */
  def records(spark: SparkSession, path: String): DataFrame =
    recordsFromLines(spark.read.text(path))

  /** [[records]] over an existing line DataFrame (`value: string`) — the
    * entry point streaming micro-batches use. */
  def recordsFromLines(raw: DataFrame): DataFrame = {
    val cells = split(col("value"), "\t", -1)
    raw
      .filter(!col("value").startsWith("#"))
      .select(
        element_at(cells, 1).as("chrom"),
        element_at(cells, 2).cast("long").as("pos"),
        when(element_at(cells, 3) === ".", lit(null).cast("string"))
          .otherwise(element_at(cells, 3)).as("rs_id"),
        element_at(cells, 4).as("ref"),
        element_at(cells, 5).as("alt"),
        element_at(cells, 6).as("qual"),
        element_at(cells, 7).as("filter"),
        element_at(cells, 8).as("info"),
        element_at(cells, 9).as("format"),
        slice(cells, lit(10), greatest(size(cells) - 9, lit(0))).as("genotypes"))
  }

  /**
   * Parses the FORMAT blob of every genotype column (P11,
   * HrdpVariants.java:292-294,466-475) into
   * `genotypes: array<struct<sample_idx:int, gt:string, ad:array<int>,
   * dp:int>>` where `sample_idx` is 0-based over the header's sample
   * columns, `ad(0)` is the ref depth and `ad(j+1)` the depth of ALT allele
   * j. A non-numeric DP (".") becomes null — the reference's carry-over of
   * the previous sample's depth (:470-475) is an order-dependent quirk we
   * deliberately correct (model.CompatFlags.carryOverDotDepth).
   */
  def withParsedGenotypes(df: DataFrame): DataFrame = {
    val parsed = transform(
      col("genotypes"),
      (g, i) => {
        val parts = split(g, ":")
        // try_* variants, not plain cast/element_at: a "./." blob carries no
        // AD/DP and a "." depth is non-numeric — both must become null, and
        // Spark 4's default ANSI mode makes the plain forms throw instead.
        struct(
          i.cast("int").as("sample_idx"),
          element_at(parts, 1).as("gt"),
          transform(split(try_element_at(parts, lit(2)), ","),
            d => d.try_cast("int")).as("ad"),
          try_element_at(parts, lit(3)).try_cast("int").as("dp"))
      })
    df.withColumn("genotypes", parsed)
  }
}
