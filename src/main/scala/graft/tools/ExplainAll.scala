package graft.tools

import graft.queries.Battery
import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` of every battery query (or the named
  * subset) to `<outDir>/<query>_<tag>.txt`, plus a one-line inventory
  * (exchange count, join strategies, codegen spans) to stdout — the
  * before/after plan evidence the optimization rounds commit under
  * `plans/rNN/`. Uses the bench session shape (same master/partitions)
  * so the captured plans are the ones the bench actually runs.
  *
  * `runMain graft.tools.ExplainAll <outDir> <tag> [query...]`
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS. */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.sql.GraftSqlExtensions")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "10000000")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else Battery.queries.keys.toSeq.sorted
    names.foreach { name =>
      try {
        val df = Battery.queries(name)(spark, sfDir)
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val w = new java.io.PrintWriter(s"$outDir/${name}_$tag.txt")
        try w.println(formatted) finally w.close()
        val plan = df.queryExecution.executedPlan.toString
        def n(s: String) = plan.linesIterator.count(_.contains(s))
        println(s"[explain] $name exch=${n("Exchange")} " +
          s"smj=${n("SortMergeJoin")} bhj=${n("BroadcastHashJoin")} " +
          s"shj=${n("ShuffledHashJoin")} bnl=${n("BroadcastNestedLoop")} " +
          s"cart=${n("CartesianProduct")} wscg=${n("WholeStageCodegen")} " +
          s"sort=${n("Sort ")}")
      } catch { case e: Throwable =>
        println(s"[explain] $name FAILED: ${e.getMessage}")
      }
      graft.operators.Dedup.releasePersisted()
    }
    spark.stop()
  }
}
