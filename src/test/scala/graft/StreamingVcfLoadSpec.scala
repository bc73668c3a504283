package graft

import java.nio.file.{Files, Paths}

import graft.model.LoadConfig
import graft.sources.VariantStore
import graft.streaming.StreamingVcfLoad
import org.apache.spark.sql.functions._

/** Streaming ingestion: files appearing in a watched dir flow through the
  * full load; re-delivered content dedups (idempotent). */
class StreamingVcfLoadSpec extends SparkSpec {
  import spark.implicits._

  private def writeVcf(dir: String, name: String, rows: Seq[String]): Unit = {
    val body =
      ("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1" +: rows)
        .mkString("", "\n", "\n")
    Files.write(Paths.get(dir, name), body.getBytes("UTF-8"))
  }

  test("micro-batches load incrementally with cross-file dedup") {
    val watch = Files.createTempDirectory("graft-watch").toString
    val store = Files.createTempDirectory("graft-stream-store").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val genes = Seq((1, "1", 90L, 110L))
      .toDF("gene_rgd_id", "chromosome", "start_pos", "stop_pos")
    val config = LoadConfig(mapKey = 372, rgdIdSeed = 100L)

    // batch 1: two variants
    writeVcf(watch, "a.vcf", Seq(
      "chr1\t100\t.\tA\tT\t50\tPASS\t.\tGT:AD:DP\t0/1:32,9:41",
      "chr2\t200\t.\tC\tG\t50\tPASS\t.\tGT:AD:DP\t1/1:0,30:30"))
    val q1 = StreamingVcfLoad.start(spark, watch, genes, store, config, ckpt,
      availableNow = true)
    q1.awaitTermination()
    assert(VariantStore.variants(spark, store).count() == 2)

    // batch 2: one repeat of chr1:100 (dedup) + one new variant
    writeVcf(watch, "b.vcf", Seq(
      "chr1\t100\t.\tA\tT\t50\tPASS\t.\tGT:AD:DP\t0/1:30,8:38",
      "chr3\t300\t.\tG\tA\t50\tPASS\t.\tGT:AD:DP\t0/1:5,7:12"))
    val q2 = StreamingVcfLoad.start(spark, watch, genes, store, config, ckpt,
      availableNow = true)
    q2.awaitTermination()

    val vs = VariantStore.variants(spark, store)
    assert(vs.count() == 3) // chr1:100 deduped, chr3:300 appended
    val ids = vs.select("rgd_id").as[Long].collect()
    assert(ids.distinct.length == 3)
    // the genic join ran in both batches
    assert(vs.filter($"chromosome" === "1").select("genic_status")
      .as[String].head() == "GENIC")
    assert(vs.filter($"chromosome" === "3").select("genic_status")
      .as[String].head() == "INTERGENIC")
  }
}
