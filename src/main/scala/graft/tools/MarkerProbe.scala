package graft.tools

import graft.streaming.IndexIngest
import org.apache.spark.sql.SparkSession

/** Measures what the marker-ledger watermark fold buys at READ time:
  * a long-lived index stream commits one marker per micro-batch, and
  * before the fold every `readBm25` listed all of them AND built its
  * visibility filter as an `isInCollection` over every historical id.
  * The probe ingests a few real batches, then stamps a large tail of
  * committed EMPTY batches (a legal, reachable ledger state — empty
  * micro-batches deliberately commit so replays stay no-ops), and
  * times the served read before and after `compactMarkers`:
  *
  *  - `unfolded` — tens of thousands of individual markers: the read
  *    pays the listing and plans a tens-of-thousands-element IN set
  *  - `folded`   — one `batch-upto-<n>` watermark: same served rows,
  *    bounded listing, two-term range predicate
  *
  * Env: SPARK_GRAFT_MARKERS (default 20000), _REPS (5).
  */
object MarkerProbe {

  def main(args: Array[String]): Unit = {
    val extra = sys.env.getOrElse("SPARK_GRAFT_MARKERS", "20000").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_MARKER_REPS", "5").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("markerprobe")
      .toFile.getAbsolutePath
    Seq(
      Seq((101L, "apple banana cherry"), (102L, "banana fig")),
      Seq((103L, "cherry date apple")),
      Seq((104L, "fig grape banana apple"))
    ).zipWithIndex.foreach { case (docs, b) =>
      IndexIngest.ingestBm25Batch(
        docs.toDF("doc_id", "text"), b.toLong, dir): Unit
    }
    // a long stream's committed-empty-batch tail, stamped directly
    (3 until 3 + extra).foreach { i =>
      java.nio.file.Files.createFile(
        java.nio.file.Paths.get(s"$dir/markers/$i")): Unit
    }
    def markerCount: Int =
      new java.io.File(s"$dir/markers").listFiles()
        .count(f => !f.getName.startsWith(".") && f.getName != "lock")
    def servedRows: Long = {
      val idx = IndexIngest.readBm25(spark, dir)
      idx.tf.count()
    }
    def time(label: String): Long = {
      val ms = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        val n = servedRows
        require(n == 12L, s"served tf rows drifted: $n")
        (System.nanoTime() - t0) / 1e6
      }
      println(f"$label%-9s markers=$markerCount%6d  " +
        f"min=${ms.min}%8.1f ms  median=${ms.sorted.apply(reps / 2)}%8.1f ms")
      markerCount
    }
    time("unfolded")
    IndexIngest.compactMarkers(spark, dir)
    val after = time("folded")
    require(after <= 2, s"fold must collapse the tail, got $after markers")
    spark.stop()
  }
}
