package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: SQL DELETE / MERGE INTO over a graft-layout temp view
  * through [[graft.sql.GraftSqlExtensions]], end to end. */
object SqlDmlProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.sql.GraftSqlExtensions")
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
    (40L to 55L).map(i => (i, 7L, s"new$i")).toDF("a", "b", "s")
      .createOrReplaceTempView("src")

    spark.sql("DELETE FROM t WHERE a >= 10 AND a <= 20")
    val afterDelete = spark.sql("SELECT count(*) FROM t").head().getLong(0)
    println(s"after DELETE [10,20]: $afterDelete rows (want 40)")

    spark.sql("""MERGE INTO t USING src ON t.a = src.a
      WHEN MATCHED THEN UPDATE SET b = src.b, s = src.s
      WHEN NOT MATCHED THEN INSERT (a, b, s) VALUES (src.a, src.b, src.s)""")
    val m = spark.table("t")
    println(s"after MERGE: ${m.count()} rows (want 45)")
    println(s"  b=7 rows: ${m.filter(col("b") === 7).count()} (want 16)")
    println(s"  s prefix new: ${m.filter(col("s").startsWith("new")).count()} (want 16)")

    // refused shapes surface typed errors
    def expectErr(sql: String): Unit =
      try { spark.sql(sql); println(s"!! NOT refused: $sql") }
      catch { case e: Throwable =>
        println(s"refused OK: ${e.getMessage.take(110)}") }
    expectErr("DELETE FROM t WHERE s = 'v3'")
    expectErr("DELETE FROM t WHERE a = 1 OR a = 2")
    expectErr("""MERGE INTO t USING src ON t.a = src.a
      WHEN MATCHED THEN UPDATE SET b = src.b
      WHEN NOT MATCHED THEN INSERT (a, b, s) VALUES (src.a, src.b, src.s)""")
    expectErr("""MERGE INTO t USING src ON t.a = src.a
      WHEN MATCHED THEN DELETE""")
    // full-table delete
    spark.sql("DELETE FROM t")
    println(s"after DELETE all: ${spark.table("t").count()} rows (want 0)")
    spark.stop()
  }
}
