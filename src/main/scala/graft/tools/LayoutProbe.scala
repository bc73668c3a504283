package graft.tools

import graft.operators.Layout
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * End-to-end measurement of the storage-layout lever AT THE READER
 * (VERDICT r11 item 3): LayoutSpec proves the per-file statistics
 * property, but the lever's payoff is whole files/row-groups actually
 * SKIPPED by the parquet scan on a box predicate. This writes the event
 * log under competing layouts — linear time order (the shape a
 * log-structured ingest produces), Z-order, 2-D Hilbert, 3-D Hilbert —
 * then, for a thin non-leading-column predicate (a 2% user_id slice),
 * reports BOTH:
 *
 *  1. the deterministic footer evidence: how many row groups' [min,max]
 *     on the predicate column intersect the slice (what ANY
 *     statistics-driven reader — Spark row-group skipping, a data-lake
 *     file pruner — must read), and
 *  2. the live reader effect: the FileSourceScanExec's "number of
 *     output rows" (rows actually materialized after row-group/page
 *     skipping, before the residual Filter) and wall time, min of 3.
 *
 * Deliberately a one-JVM probe, not a spec: the numbers go to NOTES as
 * the committed measurement. Env: SPARK_GRAFT_SF_DIR (default sf0.1),
 * SPARK_GRAFT_LAYOUT_DIR (scratch, default /root/repo/tmp/layoutprobe),
 * SPARK_GRAFT_LAYOUT_FILES (default 64 — at 100 TB this is "row groups
 * per retention partition"; the RATIO of groups read is the
 * scale-invariant quantity).
 */
object LayoutProbe {

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_LAYOUT_DIR",
      "/root/repo/tmp/layoutprobe")
    val numFiles = sys.env.getOrElse("SPARK_GRAFT_LAYOUT_FILES", "64").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the events table's ts physical type varies across testdata
    // generations (the Battery.events note): nanos-as-long, NTZ micros,
    // or plain timestamp — normalize to micros-as-long
    val raw = spark.read.parquet(s"$base/events.parquet")
    val tsUs = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col("ts").cast("timestamp"))
      case _ => unix_micros(col("ts"))
    }
    val ev = raw.select(col("event_id"), col("user_id"),
      tsUs.as("ts_us"), col("value"))
    val b = ev.agg(min("user_id"), max("user_id")).head()
    val (umn, umx) = (b.getLong(0), b.getLong(1))
    // a 2% user slice around the middle of the domain — non-leading for
    // the linear-time layout, so only multi-dim layouts can prune it
    val lo = umn + (umx - umn) * 49 / 100
    val hi = umn + (umx - umn) * 51 / 100
    println(s"[layoutprobe] base=$base files=$numFiles " +
      s"slice=user_id in [$lo, $hi] of [$umn, $umx]")

    val layouts: Seq[(String, DataFrame)] = Seq(
      "linear_ts" -> ev.repartitionByRange(numFiles, col("ts_us"))
        .sortWithinPartitions("ts_us"),
      "zorder" -> Layout.clusterByZOrder(ev,
        Seq(col("user_id"), col("ts_us")), numFiles),
      "hilbert2" -> Layout.clusterByHilbert(ev,
        col("user_id"), col("ts_us"), numFiles),
      "hilbert3" -> Layout.clusterByHilbertN(ev,
        Seq(col("user_id"), col("ts_us"), col("event_id")), numFiles))

    layouts.foreach { case (name, df) =>
      val dir = s"$out/$name"
      df.write.mode("overwrite").parquet(dir)
      val groups = rowGroupStats(spark, dir, "user_id")
      val touched = groups.filter { case (_, mn, mx, _) =>
        mx >= lo && mn <= hi
      }
      val rowsInTouched = touched.map(_._4).sum
      val totalRows = groups.map(_._4).sum
      val (scanRows, scanFiles, secs) = scanProbe(spark, dir, lo, hi)
      println(f"[layoutprobe] $name%-10s rowGroups=${touched.size}%3d/" +
        f"${groups.size}%3d rowsInTouchedGroups=$rowsInTouched%8d/" +
        f"$totalRows%8d scanOutputRows=$scanRows%8d " +
        f"scanFiles=$scanFiles%3d time=$secs%.3f s")
    }
    spark.stop()
  }

  /** Per-row-group (file, min, max, rowCount) for `colName`, read
    * straight from the parquet footers — the statistics every pruning
    * reader consumes. */
  private def rowGroupStats(spark: SparkSession, dir: String,
      colName: String): Seq[(String, Long, Long, Long)] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    fs.listStatus(p).toSeq
      .filter(_.getPath.getName.endsWith(".parquet"))
      .flatMap { st =>
        val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            st.getPath, conf))
        try rdr.getFooter.getBlocks.asScala.toSeq.map { blk =>
          val c = blk.getColumns.asScala
            .find(_.getPath.toDotString == colName)
            .getOrElse(throw new IllegalStateException(
              s"no column $colName in ${st.getPath}"))
          val stats = c.getStatistics
          (st.getPath.getName,
            stats.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
            stats.genericGetMax.asInstanceOf[java.lang.Long].longValue(),
            blk.getRowCount)
        } finally rdr.close()
      }
  }

  /** Run the slice aggregation and pull the scan node's live metrics:
    * (scan output rows, scan files, min-of-3 seconds). */
  private def scanProbe(spark: SparkSession, dir: String,
      lo: Long, hi: Long): (Long, Long, Double) = {
    var best = Double.MaxValue
    var rows = 0L
    var files = 0L
    (1 to 3).foreach { _ =>
      val df = spark.read.parquet(dir)
        .filter(col("user_id") >= lo && col("user_id") <= hi)
        .agg(count(lit(1)).as("n"), sum("value").as("s"))
      val t0 = System.nanoTime()
      // collect(), not head(): head() executes a DERIVED limit(1) plan,
      // leaving this plan instance's metrics untouched
      df.collect()
      val dt = (System.nanoTime() - t0) / 1e9
      // under AQE the scan hides behind the adaptive wrapper AND inside
      // materialized query stages (collectLeaves stops at stage
      // boundaries) — walk the whole executed tree
      def allScans(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
        p match {
          case a: org.apache.spark.sql.execution.adaptive
              .AdaptiveSparkPlanExec => allScans(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive
              .QueryStageExec => allScans(q.plan)
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            Seq(f)
          case other => other.children.flatMap(allScans)
        }
      val scans = allScans(df.queryExecution.executedPlan)
      rows = scans.map(_.metrics("numOutputRows").value).sum
      files = scans.map(_.metrics("numFiles").value).sum
      best = math.min(best, dt)
    }
    (rows, files, best)
  }
}
