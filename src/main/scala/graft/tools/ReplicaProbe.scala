package graft.tools

import graft.streaming.LayoutIngest
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off empirical probe for [[LayoutIngest.replicate]]'s central
  * scale claim: an INCREMENTAL sync costs ~the tail it pulls (the
  * per-batch provenance-pruned scans + the statement replay's
  * stats-pruned rewrites), NOT the table — so a replica of a 100 TB
  * table syncs at the ingest rate, and only the one-time bootstrap
  * pays table-sized work. Builds a source from the events table of
  * `SPARK_GRAFT_SF_DIR` (default sf0.1; point it at tmp/sf10ev for the
  * 10M-row 100x run), bootstraps a replica, then times: a small
  * append + sync, a thin redaction + sync, a small merge + sync, and
  * an empty sync. Prints one line per step. */
object ReplicaProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-replica-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.sql.GraftSqlExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files
      .createTempDirectory("replica-probe").toFile
    root.deleteOnExit()
    val src = s"${root.getAbsolutePath}/src"
    val dst = s"${root.getAbsolutePath}/dst"
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    // the testdata ts column arrives as nanos-long (nanosAsLong conf)
    // or TIMESTAMP_NTZ depending on writer — normalize like the battery
    val withTs = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
    val ev = withTs.select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("ts_us"), col("value"))
    val b = ev.agg(min("user_id"), max("user_id"),
      min("ts_us"), max("ts_us"), max("event_id")).head()
    val (tmn, tmx) = (b.getLong(2), b.getLong(3))
    // blooms on the merge key — without them a 16-key merge on a
    // column the grid doesn't order rewrites every unit (measured:
    // 9.9 s at 10M rows vs ~1 s bloom-pruned)
    LayoutIngest.bootstrap(spark, src, LayoutIngest.Grid(
      Seq("user_id", "ts_us"),
      Seq((b.getLong(0), b.getLong(1)), (tmn, tmx)), bits = 16,
      bloomCols = Seq("event_id")))
    // 8 time-sliced batches — the shape a long-lived ingest leaves
    val cuts = (1 to 7).map(i => tmn + i * ((tmx - tmn) / 8))
    val bounds = (Long.MinValue +: cuts) :+ Long.MaxValue
    (0 until 8).foreach { k =>
      LayoutIngest.ingestBatch(
        ev.filter(col("ts_us") >= bounds(k) &&
          col("ts_us") < bounds(k + 1)), k.toLong, src, 4): Unit
    }
    val rows = LayoutIngest.read(spark, src).count()
    def timed(what: String)(f: => LayoutIngest.ReplicateStats): Unit = {
      val t0 = System.nanoTime()
      val st = f
      println(f"[probe] $what%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  $st")
    }
    println(s"[probe] source rows=$rows batches=8 at $sfDir")
    timed("bootstrap sync (full table)")(
      LayoutIngest.replicate(spark, src, dst))
    // a small append: ~1/1000 of the corpus re-keyed under batch 8
    val slice = ev.filter(abs(hash(col("event_id"))) % 1000 === 0)
      .withColumn("event_id", col("event_id") + b.getLong(4) + 1L)
    LayoutIngest.appendNext(spark, src, slice, filesPerBatch = 2): Unit
    timed("incremental sync (1 batch)")(
      LayoutIngest.replicate(spark, src, dst))
    // a thin redaction: 2% of the time domain, NULL-safe constant
    val (rlo, rhi) = (tmn + (tmx - tmn) * 49 / 100,
      tmn + (tmx - tmn) * 51 / 100)
    LayoutIngest.updateBoxesNext(spark, src,
      Seq(Seq(("ts_us", rlo, rhi))), Seq("value" -> lit(-1.0))): Unit
    timed("redaction replay sync")(
      LayoutIngest.replicate(spark, src, dst))
    // a small merge: 16 corrections to RECENT rows (one time slice —
    // the realistic correction pattern; keys scattered across every
    // slice would legitimately rewrite every unit, bloom or not)
    val ups = LayoutIngest.read(spark, src)
      .filter(col("ts_us") >= bounds(7))
      .filter(abs(hash(col("event_id"))) % 4096 === 0)
      .select("event_id", "user_id", "ts_us", "value")
      .withColumn("value", col("value") * 2).limit(16)
    LayoutIngest.mergeRowsNext(spark, src, "event_id", ups): Unit
    timed("merge replay sync")(
      LayoutIngest.replicate(spark, src, dst))
    timed("empty sync")(
      LayoutIngest.replicate(spark, src, dst))
    val (srcN, dstN) = (LayoutIngest.read(spark, src).count(),
      LayoutIngest.read(spark, dst).count())
    require(srcN == dstN, s"probe: replica diverged ($srcN vs $dstN)")
    println(s"[probe] converged at $srcN rows")
    spark.stop()
  }
}
