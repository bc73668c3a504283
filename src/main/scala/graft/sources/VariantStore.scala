package graft.sources

import graft.operators.VariantLoader
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The variant store — the engine's replacement for the reference's four
 * Oracle tables (SURVEY.md §2.1 K1-K7; DAO.java:68-119). Plain
 * chromosome-partitioned parquet:
 *
 *   store/
 *     variants/chromosome=<c>/...   (variant ⋈ variant_map_data, §1.1)
 *     details/...                   (variant_sample_detail)
 *
 * Partitioning by chromosome gives the same access path the reference's
 * per-chromosome caches and locus lookups rely on (GeneCache.java:23-44,
 * DAO.java:121-140): locus probes prune to one partition, and the J4
 * dedup join co-shuffles on the same key at any scale. End-pos/genic
 * updates (K5/K6) are partition overwrites — the plain-parquet analog of
 * the reference's batched UPDATEs (a table format would make them row
 * upserts; out of scope per SURVEY §7 risk register).
 */
object VariantStore {

  /** K2/K3/K4: append the load result to the store (new variants only —
    * existing rows are already there). */
  def append(result: VariantLoader.LoadResult, dir: String): Unit = {
    result.newVariants.write
      .partitionBy("chromosome")
      .mode(SaveMode.Append)
      .parquet(s"$dir/variants")
    result.sampleDetails.write
      .mode(SaveMode.Append)
      .parquet(s"$dir/details")
  }

  /** Snapshot read of the variant side (empty frame when absent).
    * `chromosome` is a partition column and Spark's partition-type
    * inference would read "1"/"2" back as INT — force it to string so the
    * schema is stable across write/read cycles. */
  def variants(spark: SparkSession, dir: String): DataFrame =
    readOrEmpty(spark, s"$dir/variants", VariantLoader.variantCols) match {
      case Some(df) =>
        df.withColumn("chromosome", col("chromosome").cast("string"))
          .select(VariantLoader.variantCols.map(col): _*)
      case None => emptyVariants(spark)
    }

  /** Snapshot read of `(rgd_id, sample_id)` detail keys. */
  def detailKeys(spark: SparkSession, dir: String): DataFrame =
    readOrEmpty(spark, s"$dir/details", Seq("rgd_id", "sample_id")) match {
      case Some(df) => df.select("rgd_id", "sample_id")
      case None =>
        import spark.implicits._
        Seq.empty[(Long, Int)].toDF("rgd_id", "sample_id")
    }

  /** Current max rgd id (the W2 minting seed for the next load). */
  def maxRgdId(spark: SparkSession, dir: String, fallback: Long): Long = {
    val df = variants(spark, dir)
    if (df.isEmpty) fallback
    else math.max(fallback,
      df.agg(max("rgd_id")).head().getLong(0))
  }

  /** K6: apply genic-status updates (changed rows from GenicQcJob) via
    * read → merge → full rewrite of the variant side. */
  def applyGenicUpdates(spark: SparkSession, dir: String,
      changes: DataFrame): Unit = {
    val current = variants(spark, dir)
    val fixes = changes.select(col("rgd_id").as("u_rgd_id"),
      col("genic_status").as("u_status"))
    val merged = current.join(fixes, col("rgd_id") === col("u_rgd_id"), "left")
      .withColumn("genic_status",
        coalesce(col("u_status"), col("genic_status")))
      .drop("u_rgd_id", "u_status")
    overwriteVariants(spark, dir, merged)
  }

  /** K5: apply end-position drift updates. */
  def applyEndPosUpdates(spark: SparkSession, dir: String,
      updates: DataFrame): Unit = {
    val current = variants(spark, dir)
    val fixes = updates.select(col("rgd_id").as("u_rgd_id"),
      col("end_pos").as("u_end"))
    val merged = current.join(fixes, col("rgd_id") === col("u_rgd_id"), "left")
      .withColumn("end_pos", coalesce(col("u_end"), col("end_pos")))
      .drop("u_rgd_id", "u_end")
    overwriteVariants(spark, dir, merged)
  }

  private def overwriteVariants(spark: SparkSession, dir: String,
      df: DataFrame): Unit = {
    // materialize before overwriting the directory being read
    val rows = df.select(VariantLoader.variantCols.map(col): _*).cache()
    rows.count()
    rows.write.partitionBy("chromosome")
      .mode(SaveMode.Overwrite).parquet(s"$dir/variants")
    rows.unpersist()
  }

  private def readOrEmpty(spark: SparkSession, path: String,
      cols: Seq[String]): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val df = spark.read.parquet(path)
      if (cols.forall(df.columns.contains)) Some(df) else None
    }
  }

  def emptyVariants(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, String, Long, Long, Option[String], Option[String],
        String, Option[String], Option[String], String, Int, Int)]
      .toDF(VariantLoader.variantCols: _*)
  }
}
