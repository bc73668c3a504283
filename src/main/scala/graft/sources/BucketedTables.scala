package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Bucketed-table support for the variant store's hot join keys.
 *
 * The J4 dedup join shuffles BOTH sides on (chromosome, start_pos) every
 * incremental load. Bucketing the store side on those keys makes its scan
 * arrive pre-partitioned: Spark elides the store-side Exchange and only
 * the (much smaller) incoming batch shuffles — at 100 TB the store side
 * is the one that grows without bound, so this converts the dominant
 * shuffle into a narrow scan. Verified by plan shape in
 * BucketedTablesSpec (exactly one Exchange in the bucketed join).
 *
 * Plain parquet directories can't carry bucket metadata — bucketed
 * tables live in the session catalog (`saveAsTable`, default warehouse).
 */
object BucketedTables {

  /** Write `df` as a bucketed+sorted catalog table on the given keys.
    * `sortCols` (default: the bucket keys) lets a caller sort each
    * bucket file by a refinement of the keys — e.g. an encoded token
    * stream bucketed on its pack key but laid out in (key, doc, pos)
    * order so downstream windows sort runs, not shuffles. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String], sortCols: Seq[String] = Seq.empty): Unit = {
    val s = if (sortCols.isEmpty) keys else sortCols
    df.write
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(s.head, s.tail: _*)
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata rides with the catalog
    * entry; joins on the bucket keys skip the table-side shuffle). */
  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
