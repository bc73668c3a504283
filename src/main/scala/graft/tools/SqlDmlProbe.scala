package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions._

/** Scratch probe: what does the analyzer hand a post-hoc resolution rule
  * for DELETE FROM / MERGE INTO over a temp view of the V1 relation? */
object SqlDmlProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .withExtensions { ext =>
        ext.injectPostHocResolutionRule { _ =>
          new Rule[LogicalPlan] {
            override def apply(plan: LogicalPlan): LogicalPlan = {
              val cn = plan.getClass.getSimpleName
              if (cn.contains("Delete") || cn.contains("Merge")) {
                println(s"== POSTHOC sees: $cn")
                println(plan.treeString)
              }
              plan
            }
          }
        }
      }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = new java.io.File(
      System.getProperty("java.io.tmpdir"), "sqldmlprobe-table")
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    val td = dir.getAbsolutePath
    graft.streaming.LayoutIngest.bootstrap(spark, td,
      graft.streaming.LayoutIngest.Grid(
        Seq("a", "b"), Seq((0L, 100L), (0L, 100L)), bits = 8,
        bloomCols = Seq("a")))
    import spark.implicits._
    graft.streaming.LayoutIngest.ingestBatch(
      (0L to 50L).map(i => (i, i * 2 % 100, s"v$i")).toDF("a", "b", "s"),
      0L, td, 2): Unit
    spark.read.format("graft-layout").load(td).createOrReplaceTempView("t")
    (1L to 3L).map(i => (i, i, s"new$i")).toDF("a", "b", "s")
      .createOrReplaceTempView("src")
    try {
      spark.sql("DELETE FROM t WHERE a >= 10 AND a <= 20")
      println("DELETE ran without error")
    } catch { case e: Throwable =>
      println(s"DELETE failed: ${e.getClass.getName}: ${e.getMessage}")
    }
    try {
      spark.sql("""MERGE INTO t USING src ON t.a = src.a
        WHEN MATCHED THEN UPDATE SET b = src.b, s = src.s
        WHEN NOT MATCHED THEN INSERT (a, b, s) VALUES (src.a, src.b, src.s)""")
      println("MERGE ran without error")
    } catch { case e: Throwable =>
      println(s"MERGE failed: ${e.getClass.getName}: ${e.getMessage}")
    }
    spark.stop()
  }
}
