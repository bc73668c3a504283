package graft.tools

import graft.operators.{PersistTracker, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Micro-probe for the r20 buildIndex tf-shape decision: times each
  * candidate tf pipeline through the noop sink and prints its plan. */
object TfShapeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String, plan: Boolean = false)(mk: => DataFrame): Unit = {
      val reps = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        noop(mk)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[tf] $label%-24s " + reps.map(t => f"$t%.3f").mkString(" "))
      if (plan) println(mk.queryExecution.executedPlan.toString.take(3000))
    }
    val toks = TextAnalysis.tokens(lower(col("text")))

    // v1: the r19 shape — two tokenize scans + corpus join
    time("v1 old join") {
      val dl = docs.select(col("doc_id").as("__id"), size(toks).as("__dl"))
      docs.select(col("doc_id").as("__id"), explode(toks).as("__t"))
        .groupBy("__id", "__t").agg(count(lit(1)).as("__tf"))
        .join(dl, Seq("__id"))
    }
    // v2: dl on the grouping key, size + explode in one select
    time("v2 key, same select", plan = true) {
      docs.select(col("doc_id").as("__id"), size(toks).as("__dl"),
        explode(toks).as("__t"))
        .groupBy("__id", "__t", "__dl").agg(count(lit(1)).as("__tf"))
        .select("__id", "__t", "__tf", "__dl")
    }
    // v3: alias the array first so size/explode share one evaluation
    time("v3 aliased array", plan = true) {
      docs.select(col("doc_id").as("__id"), toks.as("__toks"))
        .select(col("__id"), size(col("__toks")).as("__dl"),
          explode(col("__toks")).as("__t"))
        .groupBy("__id", "__t", "__dl").agg(count(lit(1)).as("__tf"))
        .select("__id", "__t", "__tf", "__dl")
    }
    // v4: explode the (dl, token) pair once — size via the struct
    time("v4 posexplode pair") {
      docs.select(col("doc_id").as("__id"), explode(toks).as("__t"),
        size(toks).as("__dl"))
        .groupBy("__id", "__t", "__dl").agg(count(lit(1)).as("__tf"))
    }
    spark.stop()
  }
}
