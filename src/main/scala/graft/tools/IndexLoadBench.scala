package graft.tools

import graft.streaming.IndexIngest
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Multi-batch streamed-index ingest bench (VERDICT r8 item 7): drives
 * [[IndexIngest.ingestBm25Batch]] over N micro-batches of the test
 * corpus with a compaction cadence, reporting
 *
 *  - per-batch ingest wall (does the Kth batch cost what the 1st did,
 *    or does the accumulating index tax later batches?),
 *  - data-dir file counts before/after compaction (the size-tiered
 *    fold must hold them bounded),
 *  - total replay time for ALL N batches against the committed ledger
 *    (must be O(1) each — a marker probe, no index scan).
 *
 * runMain graft.tools.IndexLoadBench [nBatches] [compactEvery]
 * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
 */
object IndexLoadBench {

  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(16)
    val compactEvery = args.lift(1).map(_.toInt).getOrElse(4)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "10000000")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("graft-idxbench")
      .toFile.getAbsolutePath
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").cache()
    val total = docs.count()
    println(s"[idxbench] $total docs over $n batches, compactEvery=" +
      s"$compactEvery, dir=$dir")

    def files(sub: String): Int = {
      val d = new java.io.File(s"$dir/$sub")
      Option(d.listFiles()).fold(0)(_.count(f =>
        f.isFile && f.getName.endsWith(".parquet")))
    }
    var maxFiles = 0
    val walls = (0 until n).map { i =>
      val batch = docs.filter(pmod(col("doc_id"), lit(n)) === i)
      val t0 = System.nanoTime()
      IndexIngest.ingestBm25Batch(batch, i.toLong, dir)
      if ((i + 1) % compactEvery == 0) IndexIngest.compactBm25(spark, dir)
      val dt = (System.nanoTime() - t0) / 1e9
      maxFiles = math.max(maxFiles, files("tf") + files("df") + files("stats"))
      dt
    }
    println(f"[idxbench] per-batch wall: " +
      walls.map(w => f"$w%.2f").mkString(" "))
    println(f"[idxbench] first=${walls.head}%.2f last=${walls.last}%.2f " +
      f"mean=${walls.sum / n}%.2f max_files_seen=$maxFiles " +
      s"final_files=${files("tf")}+${files("df")}+${files("stats")} " +
      "(tf+df+stats)")

    // replay all N batches: every one must be an O(1) marker no-op
    val t0 = System.nanoTime()
    val refolded = (0 until n).count { i =>
      IndexIngest.ingestBm25Batch(
        docs.filter(pmod(col("doc_id"), lit(n)) === i), i.toLong, dir)
    }
    val replayS = (System.nanoTime() - t0) / 1e9
    println(f"[idxbench] replay of $n committed batches: $replayS%.2f s " +
      s"total, $refolded re-folded (must be 0)")

    // the served view covers every doc exactly once
    val served = IndexIngest.readBm25(spark, dir)
    val nServed = served.tf.select("__id").distinct().count()
    println(s"[idxbench] served distinct docs=$nServed of $total " +
      (if (nServed == total) "OK" else "MISMATCH"))
    spark.stop()
  }
}
