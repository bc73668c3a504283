package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev-loop sibling of [[graft.Verify]]: dump ONLY the named queries (plus
  * their oracle SQL) so `scripts/compare_oracle.py` can check one new query
  * without a full battery sweep.
  * `runMain graft.tools.VerifyOne <sfDir> <outDir> <query> [query...]` */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // SQL DML on the clustered table (DELETE/MERGE routing)
      .config("spark.sql.extensions", "graft.sql.GraftSqlExtensions")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "10000000")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      graft.operators.Dedup.releasePersisted()
    }
    val sqls = SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
    val json = sqls.map { case (k, v) =>
      val esc = v.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => "\\u%04x".format(c.toInt)
        case c => c.toString
      }
      s""""$k": "$esc""""
    }.mkString("{", ", ", "}")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
