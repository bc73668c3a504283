package graft.tools

import graft.model.LoadConfig
import graft.sources.VariantStore
import graft.streaming.StreamingVcfLoad
import org.apache.spark.sql.SparkSession

/**
 * Streaming-ingestion throughput probe: points [[StreamingVcfLoad]] at a
 * directory of pre-split VCF chunks with Trigger.AvailableNow, waits for
 * the file source to drain, and reports stored rows and elapsed time —
 * the micro-batch analog of the Manager --runLoad measurement (each
 * batch runs the FULL E1 load against the store built by the batches
 * before it: dedup, minting, detail anti-joins).
 *
 *   runMain graft.tools.StreamLoadBench <watchDir> <genesParquet> \
 *     <storeDir> <checkpointDir> [mapKey] [maxFilesPerTrigger]
 *
 * `maxFilesPerTrigger` is the latency/throughput knob this tool exists
 * to measure: 1 = smallest batches (freshest store, but every
 * micro-batch pays the fixed E1 cost — the store-side dedup/anti-join
 * scans), N = bigger batches amortizing that fixed cost over N files at
 * the price of N× coarser commit granularity. Measured back-to-back on
 * the 5-chunk 100k-record corpus (local[32], round 5): 1 → 78.3 s
 * (5 batches), 5 → 35.9 s (one batch), final stores count-identical
 * (109938 / 8114432) — so each extra micro-batch costs ~10 s of
 * re-run store-side scans against the store the batches before it
 * built. Size triggers by freshness requirements, not throughput.
 */
object StreamLoadBench {

  def main(args: Array[String]): Unit = {
    val Array(watchDir, genesPath, storeDir, checkpoint) = args.take(4)
    val mapKey = args.lift(4).map(_.toInt).getOrElse(372)
    val mfpt = args.lift(5).map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .appName("graft-stream-bench")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // see Manager: the loader's struct-min dedup WANTS the sort-based
      // object-agg fallback (millions of near-unique keys)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val genes = spark.read.parquet(genesPath)
      val t0 = System.currentTimeMillis()
      val q = StreamingVcfLoad.start(spark, watchDir, genes, storeDir,
        LoadConfig(mapKey = mapKey), checkpoint, availableNow = true,
        maxFilesPerTrigger = Some(mfpt))
      q.awaitTermination()
      val secs = (System.currentTimeMillis() - t0) / 1000.0
      val nVars = VariantStore.variants(spark, storeDir).count()
      val nDetails = spark.read.parquet(s"$storeDir/details").count()
      println(f"[graft] stream ingest: $nVars variants, $nDetails details " +
        f"in $secs%.1f s (${nDetails / secs}%.0f detail rows/s)")
    } finally spark.stop()
  }
}
