package graft.tools

import graft.queries.Battery
import org.apache.spark.sql.SparkSession

/** Times selected battery queries, printing every rep (first rep carries
  * codegen/JIT warmup — read the later reps for steady state):
  * `runMain graft.tools.TimeQ q40_ngram_jaccard [more...]`
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_BENCH_REPS. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // SQL DML on the clustered table (DELETE/MERGE routing)
      .config("spark.sql.extensions", "graft.sql.GraftSqlExtensions")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "10000000")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).count()
    catch { case _: Throwable => () }
    args.foreach { name =>
      val fn = Battery.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.operators.Dedup.releasePersisted()
        (dt, n)
      }
      println(f"[timeq] $name rows=${times.head._2} " +
        times.map(t => f"${t._1}%.2f").mkString(" "))
    }
    spark.stop()
  }
}
