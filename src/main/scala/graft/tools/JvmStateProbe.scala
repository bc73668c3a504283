package graft.tools

import graft.queries.Battery
import org.apache.spark.sql.SparkSession

/**
 * Same-JVM A/B probe for the "untouched queries slow down as the battery
 * grows" class of bench regressions (VERDICT r7, What's wrong #1): times
 * a set of suspect queries FRESH (phase A), runs the whole battery once
 * (phase B — the JVM-state load the real bench applies before reaching
 * them in sorted order), then re-times the suspects (phase C).
 *
 * Box noise hits A and C alike; JVM-state degradation (codegen class
 * cache eviction, JIT code-heap exhaustion, metaspace pressure) hits
 * only C. Between phases it prints the whole-stage-codegen compilation
 * count (Spark's CodegenMetrics — a jump during C means the suspects'
 * generated classes were evicted during B and recompiled) and the JVM
 * code-heap pool usage (a full "non-profiled nmethods" heap means the
 * JIT stopped optimizing — the silent mode where everything after some
 * point runs at C1 or interpreter speed).
 *
 * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_BENCH_REPS (default 5).
 */
object JvmStateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt
    val suspects = if (args.nonEmpty) args.toSeq
      else Seq("q21_text_stats", "q22_token_count", "q50_ivf_sq8",
        "q63_incremental_dedup", "q32_embedding_dedup", "q59_bigram_lm")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "10000000")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).count()
    catch { case _: Throwable => () }

    def jvmState(tag: String): Unit = {
      val codegen = org.apache.spark.metrics.source.CodegenMetrics
      val compiled = codegen.METRIC_COMPILATION_TIME.getCount
      val jit = java.lang.management.ManagementFactory.getCompilationMXBean
        .getTotalCompilationTime
      val pools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans
      val sb = new StringBuilder(
        f"[state] $tag codegen_classes=$compiled jit_ms=$jit")
      pools.forEach { p =>
        val n = p.getName
        if (n.contains("CodeHeap") || n.contains("Metaspace")) {
          val u = p.getUsage
          // getMax is -1 for unbounded pools (e.g. Metaspace without a
          // cap) — printing "used/0MB" would read as an exhausted pool
          val max = if (u.getMax < 0) "unbounded"
            else s"${u.getMax / 1048576}MB"
          sb.append(f" ${n.replace(' ', '_').replace("'", "")}=" +
            f"${u.getUsed / 1048576}%d/$max")
        }
      }
      println(sb.toString)
    }

    def run1(name: String): Double = {
      val t0 = System.nanoTime()
      try Battery.queries(name)(spark, sfDir).count()
      catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      graft.operators.Dedup.releasePersisted()
      dt
    }

    def timeSuspects(phase: String): Unit = suspects.foreach { name =>
      val ts = (1 to reps).map(_ => run1(name))
      println(f"[probe] $phase $name " +
        ts.map(t => f"$t%.2f").mkString(" ") + f" min=${ts.min}%.2f")
    }

    jvmState("start")
    timeSuspects("A-fresh")
    jvmState("after-A")
    val names = Battery.queries.keys.toSeq.sorted
    val t0 = System.nanoTime()
    names.foreach(run1)
    println(f"[probe] B-battery ${names.size} queries in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    jvmState("after-B")
    timeSuspects("C-loaded")
    jvmState("after-C")
    spark.stop()
  }
}
