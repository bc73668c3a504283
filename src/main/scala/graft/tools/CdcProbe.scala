package graft.tools

import graft.streaming.LayoutIngest
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures what per-row ingest provenance buys a CDC consumer at the
  * FILE level: a long-lived clustered table accumulates history into
  * folded generations, and a consumer polling "what's new since my
  * checkpoint" should open only the tail — not re-list, re-open, or
  * re-filter years of folded history. The probe ingests the event log
  * as B micro-batches with a fold every `foldEvery` (so most history
  * lives in big generations), then compares:
  *
  *  - `full`  — read() + count: every live unit opened
  *  - `tail`  — readSince(B-2) + count: only units whose sidecar
  *    batch span intersects [B-1, ∞) — the last L0 batch (plus any
  *    gen the fold swallowed it into)
  *
  * reporting units opened and wall time (median of reps). At 100 TB
  * the `full` column is the cost a provenance-less consumer pays per
  * poll; `tail` is flat in table size.
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CDC_BATCHES
  * (32), SPARK_GRAFT_CDC_FOLD_EVERY (8), SPARK_GRAFT_CDC_REPS (5).
  */
object CdcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val nb = sys.env.getOrElse("SPARK_GRAFT_CDC_BATCHES", "32").toInt
    val foldEvery =
      sys.env.getOrElse("SPARK_GRAFT_CDC_FOLD_EVERY", "8").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_CDC_REPS", "5").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("cdcprobe")
      .toFile.getAbsolutePath + "/table"
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select($"event_id", $"user_id",
        unix_micros($"ts".cast("timestamp")).as("ts_us"))
    val b = ev.agg(min("user_id"), max("user_id"),
      min("ts_us"), max("ts_us")).head()
    val (tmn, tmx) = (b.getLong(2), b.getLong(3))
    LayoutIngest.bootstrap(spark, dir, LayoutIngest.Grid(
      Seq("user_id", "ts_us"),
      Seq((b.getLong(0), b.getLong(1)), (tmn, tmx)), bits = 16))
    val span = (tmx - tmn) / nb + 1
    val t0 = System.nanoTime()
    (0 until nb).foreach { i =>
      val lo = tmn + i * span
      LayoutIngest.ingestBatch(
        ev.filter($"ts_us" >= lo && $"ts_us" < lo + span),
        i.toLong, dir, filesPerBatch = 2): Unit
      if ((i + 1) % foldEvery == 0 && i + 1 < nb)
        LayoutIngest.compact(spark, dir, smallFileBytes = 1L << 30)
    }
    println(f"[cdc] ingested $nb batches (fold every $foldEvery) in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s; " +
      s"rows=${LayoutIngest.read(spark, dir).count()}")
    val depth = LayoutIngest.clusteringDepth(spark, dir)
    println(f"[cdc] units=${depth._3} maxDepth=${depth._1} " +
      f"meanDepth=${depth._2}%.2f")

    val (hit, live) = LayoutIngest.prunedBoxDirs(spark, dir,
      Seq((LayoutIngest.BatchCol, (nb - 1).toLong, Long.MaxValue)))
    println(s"[cdc] tail poll opens ${hit.size}/${live.size} units: " +
      hit.map(_.getName).mkString(", "))
    require(hit.size < live.size, "tail poll must prune folded history")
    // bytes the reader may touch — THE 100 TB claim (wall time at
    // probe scale is scheduler-bound; I/O proportionality is not)
    def unitBytes(p: org.apache.hadoop.fs.Path): Long = {
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      fs.listStatus(p).filter(s => s.isFile &&
        s.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
    }
    val (hb, lb) = (hit.map(unitBytes).sum, live.map(unitBytes).sum)
    println(f"[cdc] bytes to open: tail=$hb%,d of $lb%,d " +
      f"(${100.0 * hb / lb}%.1f%% — flat in table size; the full-read " +
      "column grows with history)")

    // the timed body MATERIALIZES rows (sum over a data column) — a
    // bare count() is answered from parquet footer metadata and would
    // time the planner, not the read
    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (0 until reps).map { _ =>
        val s = System.nanoTime()
        val r = df.agg(sum($"user_id"), count(lit(1))).head()
        ((System.nanoTime() - s) / 1e6, r.getLong(1))
      }
      val ms = ts.map(_._1).sorted
      println(f"[cdc] $label%-5s rows=${ts.head._2}%7d  " +
        f"min=${ms.head}%7.1f ms  median=${ms(reps / 2)}%7.1f ms")
    }
    time("full")(LayoutIngest.read(spark, dir))
    time("tail")(LayoutIngest.readSince(spark, dir, (nb - 2).toLong))
    spark.stop()
  }
}
