package graft

import java.nio.file.Files

import graft.api.{TypedVariants, VariantQueries}
import graft.model.{LoadConfig, VariantRecord}
import graft.operators.VariantLoader
import graft.sources.VariantStore

/** Typed Dataset facade agrees with the untyped DAO surface. */
class TypedVariantsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val storeDir: String = {
    val dir = Files.createTempDirectory("graft-typed").toString
    val f = java.io.File.createTempFile("graft-typed", ".vcf")
    f.deleteOnExit()
    val w = new java.io.PrintWriter(f)
    w.println("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1")
    w.println("chr1\t100\trs9\tA\tT\t50\tPASS\t.\tGT:AD:DP\t0/1:32,9:41")
    w.println("chr1\t205\t.\tCA\tC\t50\tPASS\t.\tGT:AD:DP\t1/1:0,30:30")
    w.println("chr2\t300\t.\tG\tA\t50\tPASS\t.\tGT:AD:DP\t0/1:5,7:12")
    w.close()
    val genes = Seq((1, "1", 90L, 110L))
      .toDF("gene_rgd_id", "chromosome", "start_pos", "stop_pos")
    val r = VariantLoader.load(spark, f.getAbsolutePath, genes,
      VariantStore.emptyVariants(spark),
      Seq.empty[(Long, Int)].toDF("rgd_id", "sample_id"),
      LoadConfig(mapKey = 372, rgdIdSeed = 50L))
    VariantStore.append(r, dir)
    r.unpersist()
    dir
  }

  private lazy val typed = new TypedVariants(spark, storeDir)
  private lazy val untyped = new VariantQueries(spark, storeDir)

  test("typed snapshot round-trips the store as case classes") {
    val vs: Seq[VariantRecord] = typed.variants.collect().toSeq
    assert(vs.length == 3)
    val snv = vs.find(_.startPos == 100L).get
    assert(snv.refNuc.contains("A") && snv.varNuc.contains("T"))
    assert(snv.variantType == "snv" && snv.genicStatus == "GENIC")
    assert(snv.rsId.contains("rs9") && snv.clinvarId.isEmpty)
    // deletion: var_nuc is genuinely absent, typed as None not ""
    val del = vs.find(_.variantType == "deletion").get
    assert(del.varNuc.isEmpty && del.paddingBase.contains("C"))
  }

  test("typed filters agree with the DAO surface and stay Column-based") {
    assert(typed.byGenicStatus("GENIC").count() == 1)
    assert(typed.inRange(372, "1", 50, 300).count() ==
      untyped.variantsInRange(372, "1", 50, 300).count())
    // the filter must reach the scan as a pushed data filter, and the
    // plan must not round-trip through objects (a lambda filter would
    // show DeserializeToObject). Both asserted POSITIVELY — the old
    // disjunction was vacuously true against capitalized "Filter".
    val plan = typed.byGenicStatus("GENIC").queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject"),
      s"Column-based filter must not deserialize to objects:\n$plan")
    assert(plan.contains("EqualTo(genic_status,GENIC)"),
      s"genic_status equality must be pushed to the scan:\n$plan")
  }

  test("typed details and keyed aggregation") {
    val details = typed.sampleDetails.collect()
    assert(details.nonEmpty)
    assert(details.forall(_.sampleId == 0)) // no dict: header index 0
    val counts = typed.countsByChromosomeType.collect().toMap
    assert(counts(("1", "snv")) == 1L)
    assert(counts(("1", "deletion")) == 1L)
    assert(counts(("2", "snv")) == 1L)
  }
}
