package graft.tools

import graft.queries.Battery
import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plan of selected battery queries:
  * `runMain graft.tools.ExplainTool q11_range_join [more...]` */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Battery.queries.keys.toSeq.sorted
    names.foreach { name =>
      println(s"========== $name ==========")
      Battery.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
