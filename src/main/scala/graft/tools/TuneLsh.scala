package graft.tools

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Parameter sweep for the LSH embedding near-dup path (Battery q41):
 * for each (numPlanes, numTables) combo, reports
 *  - misses: planted pairs (cosine ≥ threshold) NOT covered by any
 *    shared LSH bucket — must be 0 for the oracle check to hold;
 *  - candidates: distinct candidate pairs the verify step must score —
 *    the cost knob.
 * Deterministic end-to-end (seeded hyperplanes), so a 0-miss combo here
 * is a guarantee for the same data, not a probability.
 *
 *   runMain graft.tools.TuneLsh /root/testdata/sf0.01 [threshold]
 */
object TuneLsh {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val threshold = args.lift(1).map(_.toDouble).getOrElse(0.70)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .appName("graft-tune-lsh")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val derived = emb.select(
        (col("vec_id") + lit(1000000L)).as("vec_id"),
        concat(array((0 until 8).map(_ => lit(0.0f)): _*),
          slice(col("embedding"), 9, 56)).as("embedding"))
      val corpus = emb.select("vec_id", "embedding").unionByName(derived)
        .persist()
      val n = corpus.count()

      // ground truth: ALL qualifying pairs (not just planted ones) via the
      // blocked exact join — what the DuckDB oracle will contain
      val truth = Dedup.embeddingNearDupPairsExact(
        corpus, "vec_id", col("embedding"), threshold)
        .select("id_a", "id_b").persist()
      val nTruth = truth.count()
      println(s"[tune] corpus=$n truth_pairs=$nTruth threshold=$threshold")

      for (p <- Seq(6, 8, 10, 12); t <- Seq(8, 16, 24, 32)) {
        val tables = (0 until t).map(i =>
          Similarity.hyperplanes(64, p, seed = 911L + i))
        val keyed = corpus.select(col("vec_id").as("__id"),
          posexplode(Similarity.lshKeysAllTables(col("embedding"), tables))
            .as(Seq("table", "key")))
        val a = keyed.select(col("__id").as("id_a"), col("table"), col("key"))
        val b = keyed.select(col("__id").as("id_b"), col("table"), col("key"))
        val cands = a.join(b, Seq("table", "key"))
          .filter(col("id_a") < col("id_b"))
          .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
          .persist()
        val nCands = cands.count()
        val misses = truth.join(cands, Seq("id_a", "id_b"), "left_anti").count()
        cands.unpersist()
        println(f"[tune] planes=$p%2d tables=$t%2d candidates=$nCands%9d " +
          f"misses=$misses%d")
      }
    } finally spark.stop()
  }
}
