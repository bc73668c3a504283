package graft

import java.nio.file.Files

import graft.api.VariantQueries
import graft.model.LoadConfig
import graft.operators.VariantLoader
import graft.sources.VariantStore

/** E3 DAO-equivalent query surface over a loaded store. */
class VariantQueriesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val storeDir: String = {
    val dir = Files.createTempDirectory("graft-api").toString
    val f = java.io.File.createTempFile("graft-api", ".vcf")
    f.deleteOnExit()
    val w = new java.io.PrintWriter(f)
    w.println("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1")
    w.println("chr1\t100\trs77\tA\tT\t50\tPASS\t.\tGT:AD:DP\t0/1:32,9:41")
    w.println("chr1\t250\t.\tC\tG\t50\tPASS\t.\tGT:AD:DP\t1/1:0,30:30")
    w.println("chr2\t300\t.\tG\tA\t50\tPASS\t.\tGT:AD:DP\t0/1:5,7:12")
    w.close()
    val genes = Seq((1, "1", 90L, 110L))
      .toDF("gene_rgd_id", "chromosome", "start_pos", "stop_pos")
    val r = VariantLoader.load(spark, f.getAbsolutePath, genes,
      VariantStore.emptyVariants(spark),
      Seq.empty[(Long, Int)].toDF("rgd_id", "sample_id"),
      LoadConfig(mapKey = 372, rgdIdSeed = 10L))
    VariantStore.append(r, dir)
    r.unpersist()
    dir
  }

  private lazy val q = new VariantQueries(spark, storeDir)

  test("point lookup by locus and by rsId (J2/J3)") {
    assert(q.variantsAtLocus(372, "1", 100).count() == 1)
    assert(q.variantsAtLocus(372, "1", 999).count() == 0)
    assert(q.variantsByRsId(372, "rs77").select("start_pos")
      .as[Long].head() == 100L)
  }

  test("range scan (J5) and distincts (A4)") {
    assert(q.variantsInRange(372, "1", 50, 300).count() == 2)
    assert(q.variantsInRange(372, "1", 200, 300).count() == 1)
    assert(q.distinctMapKeys().as[Int].collect().toSeq == Seq(372))
    assert(q.distinctLoci(372).count() == 3)
  }

  test("existence count (J6/A3) and keyset pagination (L1)") {
    val anyId = q.variants.select("rgd_id").as[Long].head()
    val anySample = q.sampleDetails.select("sample_id").as[Int].head()
    assert(q.detailCount(anyId, anySample) >= 0)
    val page1 = q.pageVariants(0L, 2).select("rgd_id").as[Long].collect()
    assert(page1.length == 2 && page1.sorted.sameElements(page1))
    val page2 = q.pageVariants(page1.max, 2).select("rgd_id").as[Long].collect()
    assert(page2.nonEmpty && page2.min > page1.max)
  }

  test("spark.sql over registered views (E3 SQL entry point)") {
    q.registerViews()
    val n = spark.sql(
      "SELECT COUNT(*) FROM variant WHERE genic_status = 'GENIC'")
      .as[Long].head()
    assert(n == 1) // only chr1:100 overlaps the gene [90,110]
    assert(spark.sql("SELECT COUNT(*) FROM variant_sample_detail")
      .as[Long].head() == 3)
  }

  test("variant ∪ variant_ext union surface (rgdcore VariantDAO U1)") {
    val base = q.primaryVariants.count()
    assert(q.variantsExt.count() == 0)     // absent ext side reads empty
    assert(q.variants.count() == base)
    // land one row in the ext side; every DAO lookup must now see it
    val extRow = q.primaryVariants.limit(1)
      .withColumn("rgd_id", org.apache.spark.sql.functions.lit(999999L))
      .withColumn("start_pos", org.apache.spark.sql.functions.lit(777L))
    VariantStore.appendExt(extRow, storeDir)
    assert(q.variantsExt.count() == 1)
    assert(q.variants.count() == base + 1)
    val chrom = extRow.select("chromosome").as[String].head()
    assert(q.variantsAtLocus(372, chrom, 777).count() == 1)
    q.registerViews()
    assert(spark.sql("SELECT COUNT(*) FROM variant_all").as[Long].head()
      == base + 1)
    assert(spark.sql("SELECT COUNT(*) FROM variant_ext").as[Long].head() == 1)
  }

  test("K7 sample-dimension sink: insert-if-absent") {
    val s1 = Seq((11, "HRDP_batch_1", 372), (22, "HRDP_batch_1", 372))
      .toDF("sample_id", "analysis_name", "map_key")
    VariantStore.ensureSamples(spark, storeDir, s1)
    assert(VariantStore.samples(spark, storeDir).count() == 2)
    // re-ensuring with one overlapping and one new id appends only the new
    val s2 = Seq((22, "HRDP_batch_2", 372), (33, "HRDP_batch_2", 372))
      .toDF("sample_id", "analysis_name", "map_key")
    VariantStore.ensureSamples(spark, storeDir, s2)
    val after = VariantStore.samples(spark, storeDir)
    assert(after.count() == 3)
    assert(after.select("sample_id").as[Int].collect().toSet == Set(11, 22, 33))
  }
}
