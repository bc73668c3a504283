package graft

import java.nio.file.Files

import graft.model.LoadConfig
import graft.operators.{GenicQcJob, VariantLoader}
import graft.sources.VariantStore
import org.apache.spark.sql.functions._

/** Store round trip: append → reload → incremental load is a no-op;
  * genic/end-pos updates rewrite in place. Uses the VariantLoaderSpec
  * fixture VCF via a fresh temp store. */
class VariantStoreSpec extends SparkSpec {
  import spark.implicits._

  private val vcf = {
    val f = java.io.File.createTempFile("graft-store", ".vcf")
    f.deleteOnExit()
    val w = new java.io.PrintWriter(f)
    w.println("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1")
    w.println("chr1\t100\t.\tA\tT\t50\tPASS\t.\tGT:AD:DP\t0/1:32,9:41")
    w.println("chr2\t200\t.\tC\tG\t50\tPASS\t.\tGT:AD:DP\t1/1:0,30:30")
    w.close()
    f.getAbsolutePath
  }

  private def genes =
    Seq((1, "1", 90L, 110L)).toDF("gene_rgd_id", "chromosome", "start_pos",
      "stop_pos")

  private val config = LoadConfig(mapKey = 372, rgdIdSeed = 100L)

  test("append, reload, incremental no-op, updates") {
    val dir = Files.createTempDirectory("graft-store").toString

    // fresh store is empty
    assert(VariantStore.variants(spark, dir).isEmpty)
    assert(VariantStore.maxRgdId(spark, dir, 7L) == 7L)

    // load + append
    val r1 = VariantLoader.load(spark, vcf, genes,
      VariantStore.variants(spark, dir),
      VariantStore.detailKeys(spark, dir), config)
    VariantStore.append(r1, dir)
    val stored = VariantStore.variants(spark, dir)
    assert(stored.count() == 2)
    assert(stored.select("chromosome").distinct().count() == 2)
    assert(VariantStore.maxRgdId(spark, dir, 0L) > 100L)

    // incremental reload: nothing new, details deduped via J6
    val r2 = VariantLoader.load(spark, vcf, genes,
      VariantStore.variants(spark, dir),
      VariantStore.detailKeys(spark, dir),
      config.copy(rgdIdSeed = VariantStore.maxRgdId(spark, dir, 0L)))
    assert(r2.newVariants.count() == 0)
    assert(r2.sampleDetails.count() == 0)

    // K6 genic update path: flip chr2's status and verify the rewrite
    val change = stored.filter($"chromosome" === "2")
      .select($"rgd_id", lit("GENIC").as("genic_status"))
    VariantStore.applyGenicUpdates(spark, dir, change)
    val after = VariantStore.variants(spark, dir)
    assert(after.filter($"chromosome" === "2").select("genic_status")
      .as[String].head() == "GENIC")
    assert(after.count() == 2)

    // QC over the updated store flips it back (gene list says INTERGENIC)
    val qc = GenicQcJob.run(spark, vcf, genes, after, config)
    assert(qc.count() == 1)
    VariantStore.applyGenicUpdates(spark, dir,
      qc.select($"rgd_id", $"genic_status"))
    assert(VariantStore.variants(spark, dir)
      .filter($"chromosome" === "2").select("genic_status")
      .as[String].head() == "INTERGENIC")

    // K5 end-pos update path
    val drift = VariantStore.variants(spark, dir)
      .filter($"chromosome" === "1")
      .select($"rgd_id", lit(999L).as("end_pos"))
    VariantStore.applyEndPosUpdates(spark, dir, drift)
    assert(VariantStore.variants(spark, dir)
      .filter($"chromosome" === "1").select("end_pos")
      .as[Long].head() == 999L)
  }
}
