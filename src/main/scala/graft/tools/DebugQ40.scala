package graft.tools

import graft.operators.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the q40 n-gram Jaccard pipeline (scratch
  * diagnostic; summary numbers land in NOTES.md). */
object DebugQ40 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val threshold = 0.5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q40] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    try {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val sh = docs.select(col("doc_id").as("__sid"),
        transform(TextAnalysis.wordShingles(col("text"), 3),
          s => xxhash64(s)).as("__sh"))
        .persist()
      time("shingle+hash")(sh.count())
      val inv = sh.select(col("__sid"), size(col("__sh")).as("__m"),
        explode(col("__sh")).as("shingle"))
      time("inverted rows")(println("  rows=" + inv.count()))
      val dfreq = inv.groupBy("shingle").agg(count(lit(1)).as("__df"))
      time("dfreq")(println("  shingles=" + dfreq.count()))
      val prefix = inv.join(dfreq, Seq("shingle"))
        .withColumn("__rk", row_number().over(
          Window.partitionBy("__sid").orderBy(col("__df"), col("shingle"))))
        .filter(col("__rk") <=
          col("__m") - ceil(lit(threshold) * col("__m")).cast("int") + 1)
        .select(col("__sid"), col("shingle")).persist()
      time("prefix rows")(println("  rows=" + prefix.count()))
      val a = prefix.select(col("__sid").as("id_a"), col("shingle"))
      val b = prefix.select(col("__sid").as("id_b"), col("shingle"))
      val rawPairs = a.join(b, Seq("shingle")).filter(col("id_a") < col("id_b"))
      time("raw candidate rows")(println("  rows=" + rawPairs.count()))
      val pairs = rawPairs.select("id_a", "id_b")
        .dropDuplicates("id_a", "id_b").persist()
      time("distinct candidates")(println("  pairs=" + pairs.count()))
      val verified = pairs
        .join(sh.select(col("__sid").as("id_a"), col("__sh").as("sh_a")), "id_a")
        .join(sh.select(col("__sid").as("id_b"), col("__sh").as("sh_b")), "id_b")
        .withColumn("jaccard", round(
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))), 4))
        .filter(col("jaccard") >= threshold)
      time("verify")(println("  out=" + verified.count()))
    } finally spark.stop()
  }
}
