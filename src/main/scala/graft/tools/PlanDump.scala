package graft.tools

import graft.queries.Battery
import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plan of named battery queries plus an
  * Exchange/WholeStageCodegen inventory — the evidence for plan-shape
  * decisions (NOTES.md entries, verdict follow-ups):
  * `runMain graft.tools.PlanDump q40_ngram_jaccard [more...]`
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val df = Battery.queries(name)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      val exchanges = plan.linesIterator.count(_.contains("Exchange"))
      val wscg = plan.linesIterator
        .count(_.contains("WholeStageCodegen"))
      println(s"=== $name: exchanges=$exchanges wholeStageCodegen=$wscg ===")
      df.explain("formatted")
      graft.operators.Dedup.releasePersisted()
    }
    spark.stop()
  }
}
