package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage timing for the q134 video pipeline (noop sink): generator
  * (md5 pixels) vs PNG encode vs full chain — the r20 evidence for the
  * per-doc base-pixel hoist. */
object VideoProbe {
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
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(mk: => DataFrame): Unit = {
      val reps = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        noop(mk)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[video] $label%-22s " + reps.map(t => f"$t%.3f").mkString(" "))
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id")).repartition(col("doc_id"))
    def genOld = docs
      .select(col("doc_id"), explode(sequence(lit(0), lit(2))).as("f"))
      .select(col("doc_id"), col("f"), expr(
        "transform(sequence(0, 63), i -> cast((cast(conv(substring(" +
          "md5(concat(cast(doc_id as string), ':v:', " +
          "cast(i as string))), 1, 2), 16, 10) as int) + " +
          "(case when i < 2 * f then 16 else 0 end)) % 256 as int))")
        .as("__px"))
    def genNew = docs
      .select(col("doc_id"), expr(
        "transform(sequence(0, 63), i -> cast(conv(substring(" +
          "md5(concat(cast(doc_id as string), ':v:', " +
          "cast(i as string))), 1, 2), 16, 10) as int))").as("__base"))
      .select(col("doc_id"), col("__base"),
        explode(sequence(lit(0), lit(2))).as("f"))
      .select(col("doc_id"), col("f"), expr(
        "transform(__base, (x, i) -> cast((x + " +
          "(case when i < 2 * f then 16 else 0 end)) % 256 as int))")
        .as("__px"))
    time("gen old (md5 x3)")(genOld)
    time("gen new (md5 x1)")(genNew)
    time("gen+png encode old") {
      graft.operators.Multimodal.encodeGrayPngs(
        genOld.select((col("doc_id") * 4 + col("f")).as("fid"),
          col("__px")), "fid", "__px", 8, 8)
    }
    // parity: the two generators must produce identical pixels
    val a = genOld.orderBy("doc_id", "f")
    val b = genNew.orderBy("doc_id", "f")
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"[video] generator parity diff rows = $diff")
    spark.stop()
  }
}
