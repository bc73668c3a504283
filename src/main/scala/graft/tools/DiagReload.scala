package graft.tools

import graft.model.LoadConfig
import graft.operators.VariantLoader
import graft.sources.{VariantStore, VcfSource}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-attribution for the reload path: times each sub-plan of
  * the detail pipeline independently so regressions are bisected by
  * STAGE, not theorized. Not part of the product surface.
  *
  *   runMain graft.tools.DiagReload <vcf> <genes> <store>
  */
object DiagReload {
  def main(args: Array[String]): Unit = {
    val Array(vcf, genesPath, store) = args.take(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[diag] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val genes = spark.read.parquet(genesPath)
    val config = LoadConfig(mapKey = 372,
      rgdIdSeed = VariantStore.maxRgdId(spark, store, 0L))
    val existing = VariantStore.variants(spark, store)
    val existingDetails = VariantStore.detailKeys(spark, store)

    val result = timed("load() plan+eager") {
      VariantLoader.load(spark, vcf, genes, existing, existingDetails, config)
    }
    timed("variants count")(println("  variants=" + result.variants.count()))
    timed("key-dup probe")(println("  occurrences=" + result.variants.count()
      + " distinct_ids=" + result.variants.agg(
        countDistinct(col("rgd_id"))).head.getLong(0)))
    timed("newVariants count")(println("  new=" + result.newVariants.count()))
    // the detail plan, end to end
    timed("details count")(println("  details=" + result.sampleDetails.count()))
    timed("details count (2nd run)")(result.sampleDetails.count())
    result.unpersist()
    spark.stop()
  }
}
