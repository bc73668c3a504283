package graft

import graft.model.{CompatFlags, LoadConfig}
import graft.operators.VariantLoader
import graft.sources.VariantStore
import org.apache.spark.sql.functions._

/** Bit-compat quirk modes (SURVEY.md §4 item 3) exercised end-to-end. */
class CompatFlagsSpec extends SparkSpec {
  import spark.implicits._

  private val vcf = {
    val f = java.io.File.createTempFile("graft-compat", ".vcf")
    f.deleteOnExit()
    val w = new java.io.PrintWriter(f)
    w.println("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1")
    w.println("chr1\t100\t.\tA\tT\t50\tPASS\t.\tGT:AD:DP\t0/1:32,9:41")
    w.println("chr1\t400\t.\tA\tC,G\t60\tPASS\t.\tGT:AD:DP\t1/2:5,10,8:23")
    w.close()
    f.getAbsolutePath
  }

  private def genes =
    Seq((1, "1", 1L, 10L)).toDF("gene_rgd_id", "chromosome", "start_pos",
      "stop_pos")

  private def load(config: LoadConfig) =
    VariantLoader.load(spark, vcf, genes, VariantStore.emptyVariants(spark),
      Seq.empty[(Long, Int)].toDF("rgd_id", "sample_id"), config)

  test("snp label quirk: multi-allelic substitutions emit 'snp'") {
    val compat = load(LoadConfig(mapKey = 372, rgdIdSeed = 0L,
      compat = CompatFlags(snpLabelOnMultiAllelic = true)))
    val types = compat.variants
      .select("start_pos", "variant_type").as[(Long, String)].collect().toMap
    assert(types(100L) == "snv") // single-allele path keeps snv
    assert(types(400L) == "snp") // multi-allelic copy path emits snp
    compat.unpersist()

    val corrected = load(LoadConfig(mapKey = 372, rgdIdSeed = 0L))
    assert(corrected.variants.filter($"variant_type" === "snp").count() == 0)
    corrected.unpersist()
  }

  test("int-division percent-read quirk (HrdpVariants.java:489-490)") {
    val compat = load(LoadConfig(mapKey = 372, rgdIdSeed = 0L,
      compat = CompatFlags(intDivisionPercentRead = true)))
    // varFreq/depth in integer division is 0 for every het call
    val reads = compat.sampleDetails
      .select("zygosity_percent_read").as[Int].collect()
    assert(reads.nonEmpty && reads.forall(_ == 0))
    compat.unpersist()

    val corrected = load(LoadConfig(mapKey = 372, rgdIdSeed = 0L))
    // corrected mode keeps the rounded percent (e.g. 9/41 → 22)
    assert(corrected.sampleDetails
      .select("zygosity_percent_read").as[Int].collect().exists(_ > 0))
    corrected.unpersist()
  }
}
