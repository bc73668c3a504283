package graft.tools

import graft.streaming.LayoutIngest
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures what the publish-time stats sidecars buy at PLANNING time:
  * the per-call cost of a pruning decision (`prunedBoxDirs` — the
  * driver-side unit selection behind `scanBox`/`deleteBox`) over a
  * many-unit clustered table, under three regimes:
  *
  *  - `sidecar` — one small `_graft_stats.tsv` read per unit (the
  *    published path; cache cleared between reps so every rep pays IO)
  *  - `footer`  — sidecars deleted: the fallback walk opens every
  *    parquet footer of every unit (the pre-sidecar planning cost)
  *  - `cached`  — warm in-process cache (steady-state repeat queries)
  *
  * The three numbers make the scaling argument concrete: planning cost
  * is (units × files-per-unit × footer-open) without sidecars,
  * (units × one-small-read) with them, and ~0 when cached — at 100 TB
  * the unit count is what grows, so the per-unit constant is the lever.
  *
  * Env: SPARK_GRAFT_STATS_UNITS (default 96), _FILES (files/unit, 4),
  * _ROWS (rows/unit, 2000), _REPS (5).
  */
object StatsProbe {

  def main(args: Array[String]): Unit = {
    val units = sys.env.getOrElse("SPARK_GRAFT_STATS_UNITS", "96").toInt
    val filesPer = sys.env.getOrElse("SPARK_GRAFT_STATS_FILES", "4").toInt
    val rowsPer = sys.env.getOrElse("SPARK_GRAFT_STATS_ROWS", "2000").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_STATS_REPS", "5").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("statsprobe")
      .toFile.getAbsolutePath
    val domain = units.toLong * rowsPer
    LayoutIngest.bootstrap(spark, dir, LayoutIngest.Grid(
      Seq("x", "y"), Seq((0L, domain - 1), (0L, domain - 1)), bits = 16))
    (0 until units).foreach { b =>
      val rows = (0 until rowsPer).map { i =>
        val id = b.toLong * rowsPer + i
        (id, id, (id * 2654435761L) % domain)
      }
      LayoutIngest.ingestBatch(rows.toDF("id", "x", "y"), b.toLong,
        dir, filesPer): Unit
    }
    // mid-domain 2% x slice — prunes most units on x alone
    val box = Seq(("x", domain * 49 / 100, domain * 51 / 100))

    def time(label: String, clearEach: Boolean): Unit = {
      val ms = (0 until reps).map { _ =>
        if (clearEach) LayoutIngest.clearStatsCache()
        val t0 = System.nanoTime()
        val (hit, live) = LayoutIngest.prunedBoxDirs(spark, dir, box)
        val t = (System.nanoTime() - t0) / 1e6
        require(live.size == units && hit.size < live.size,
          s"probe invariant: ${hit.size}/${live.size}")
        t
      }
      println(f"$label%-8s min=${ms.min}%8.1f ms  " +
        f"median=${ms.sorted.apply(reps / 2)}%8.1f ms")
    }

    println(s"units=$units filesPerUnit=$filesPer rowsPerUnit=$rowsPer")
    // operational view sanity: every unit accounted for, exact rows
    val desc = LayoutIngest.describe(spark, dir)
      .agg(count(lit(1)), sum("rows"), sum("files")).head()
    println(s"describe: units=${desc.getLong(0)} rows=${desc.getLong(1)} " +
      s"files=${desc.getLong(2)}")
    require(desc.getLong(0) == units && desc.getLong(1) == domain,
      s"describe mismatch: $desc")
    LayoutIngest.clearStatsCache()
    time("sidecar", clearEach = true)
    time("cached", clearEach = false)
    // strip the sidecars -> fallback footer walk
    new java.io.File(s"$dir/data").listFiles().filter(_.isDirectory)
      .foreach { u =>
        val sc = new java.io.File(u, "_graft_stats.tsv")
        if (sc.exists()) { sc.delete(); () }
        val crc = new java.io.File(u, "._graft_stats.tsv.crc")
        if (crc.exists()) { crc.delete(); () }
      }
    time("footer", clearEach = true)
    spark.stop()
  }
}
