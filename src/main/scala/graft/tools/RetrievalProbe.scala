package graft.tools

import graft.operators.Retrieval
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Times the BM25/PRF pipeline stage by stage through the noop sink
  * (guide §1.4) — the r20 evidence for the buildIndex/scoreTermFrame
  * rework: `runMain graft.tools.RetrievalProbe`.
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS. */
object RetrievalProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    import spark.implicits._
    val queries = Seq(
      (1L, "table hash join value"),
      (2L, "spark window agg batch"),
      (3L, "fast slow row scan")).toDF("query_id", "query_text")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $label%-28s " +
        reps.map(t => f"$t%.3f").mkString(" "))
    }
    // stage 1: index build alone (tf materialized through noop)
    time("buildIndex.tf") {
      val idx = Retrieval.buildIndex(docs)
      noop(idx.tf)
      graft.operators.Dedup.releasePersisted()
    }
    // stage 2: df + stats on top of a materialized tf
    time("df+stats (tf cached)") {
      val idx = Retrieval.buildIndex(docs)
      idx.tf.count()
      noop(idx.df)
      noop(idx.stats)
      graft.operators.Dedup.releasePersisted()
    }
    // stage 3: one scoring pass, fresh index
    time("bm25TopK (build+score)") {
      noop(Retrieval.bm25TopK(docs, queries, k = 5))
      graft.operators.Dedup.releasePersisted()
    }
    // stage 4: full PRF, fresh index (the q146 shape)
    time("prfTopK (build+prf)") {
      noop(Retrieval.prfTopK(Retrieval.buildIndex(docs), queries, k = 5,
        fbDocs = 3, fbTerms = 2))
      graft.operators.Dedup.releasePersisted()
    }
    // stage 5: PRF over a pre-materialized tf (isolates the serve side)
    time("prfTopK (tf cached)") {
      val idx = Retrieval.buildIndex(docs)
      idx.tf.count()
      noop(Retrieval.prfTopK(idx, queries, k = 5, fbDocs = 3, fbTerms = 2))
      graft.operators.Dedup.releasePersisted()
    }
    spark.stop()
  }
}
