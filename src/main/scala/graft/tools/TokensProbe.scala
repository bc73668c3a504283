package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B of tokenizer forms for the r20 codegen audit: the interpreted
  * higher-order `filter(split(...), len > 0)` vs codegen-pure spellings
  * (strip edge whitespace, split, guard the all-whitespace case). */
object TokensProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t1(c: Column): Column = filter(split(c, "\\s+"), t => length(t) > 0)
    def t2(c: Column): Column = {
      val stripped = regexp_replace(c, "^\\s+|\\s+$", "")
      when(stripped === "", array().cast("array<string>"))
        .otherwise(split(stripped, "\\s+"))
    }
    def t3(c: Column): Column = {
      val stripped = trim(c)
      when(stripped === "", array().cast("array<string>"))
        .otherwise(split(stripped, "\\s+"))
    }
    def run(label: String, tok: Column => Column): Unit = {
      val reps = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        noop(docs.select(col("doc_id"), tok(lower(col("text"))).as("__t"))
          .select(col("doc_id"), size(col("__t")).as("n"),
            explode(col("__t")).as("t"))
          .groupBy("doc_id", "t", "n").agg(count(lit(1))))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[tok] $label%-14s " + reps.map(t => f"$t%.3f").mkString(" "))
    }
    // split on \s+ can only yield "" at the array edges (consecutive
    // whitespace is one separator), so removing "" IS the len>0 filter
    def t4(c: Column): Column = array_remove(split(c, "\\s+"), "")
    run("t1 hof filter", t1)
    run("t2 re-strip", t2)
    run("t3 trim", t3)
    run("t4 arr-remove", t4)
    // parity t1 vs t2 on the corpus + adversarial edges
    import spark.implicits._
    val edge = Seq((1L, "  a  b "), (2L, ""), (3L, "   "), (4L, "x"),
      (5L, "\ta\nb\r"), (6L, "  z  ")).toDF("doc_id", "text")
    for ((nm, df) <- Seq(("corpus", docs.select("doc_id", "text")),
        ("edges", edge))) {
      val a = df.select(col("doc_id"), t1(lower(col("text"))).as("t"))
      for ((vn, tok) <- Seq(("t2", t2 _), ("t4", t4 _))) {
        val b = df.select(col("doc_id"), tok(lower(col("text"))).as("t"))
        val d = a.exceptAll(b).count() + b.exceptAll(a).count()
        println(s"[tok] parity t1-vs-$vn $nm diff=$d")
      }
    }
    spark.stop()
  }
}
