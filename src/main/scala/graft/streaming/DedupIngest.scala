package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/**
 * Streaming corpus ingest with incremental deduplication — the
 * recurring-crawl pipeline as one continuous query: each micro-batch is
 * (1) exact-deduplicated within itself, (2) checked against the
 * PERSISTED corpus index ([[Dedup.CorpusIndex]]: distinct fingerprints +
 * word n-gram hashes), and (3) its survivors appended to the corpus
 * while their index entries append to the index — so later batches, and
 * REPLAYS of this batch after a crash, see them.
 *
 * Replay safety falls out of the dedup itself: re-processing a batch
 * finds its own fingerprints already in the index and admits nothing —
 * no high-water-mark bookkeeping.
 *
 * Write ordering is load-bearing twice over. Survivors are STAGED to
 * disk before anything appends: the survivor frame's lineage reads the
 * index paths, and Spark invalidates and lazily RECOMPUTES cached plans
 * whose input paths are appended to (CacheManager.recacheByPath) — an
 * unstaged frame would re-evaluate against the just-updated index and
 * dedup the batch against itself (observed: corpus append of zero
 * rows). The index then appends BEFORE the corpus, so a crash between
 * the writes loses that batch's survivors from the corpus rather than
 * duplicating them — at-most-once per document, the right default for
 * training data, where a duplicate costs more than a dropped crawl doc
 * (reconcile corpus from `stage/` if the gap matters; a crash between
 * the fps and grams appends can also leave a doc's grams missing,
 * which only weakens the NEAR-dup gate for that doc — the exact gate
 * stays exact).
 *
 * Scale shape per batch: the index sides are plain parquet reads joined
 * on their hash — at corpus scale write them bucketed on the hash
 * ([[graft.sources.BucketedTables]]) so only the batch shuffles; the
 * batch-side work is [[Dedup.dedupAgainstIndex]]'s two anti-joins.
 */
object DedupIngest {

  private val FpSchema = StructType(Seq(StructField("__fp", StringType)))
  private val GramSchema = StructType(Seq(StructField("__g", StringType)))

  /** Recover a half-finished [[compact]] swap: if the live dir is gone
    * but its staged replacement exists, promote the replacement. */
  private def recoverSwap(path: String): Unit = {
    val (live, next) = (new java.io.File(path), new java.io.File(path + ".next"))
    if (!live.exists() && next.exists()) next.renameTo(live)
  }

  private def readOrEmpty(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    recoverSwap(path)
    if (new java.io.File(path).exists())
      spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Fold each append-accumulated side back to one compact write —
    * every batch lands new small files, so a long-running ingest pays
    * growing listing/scan overhead without this. The index sides also
    * re-`distinct` (crash replays can leave duplicate entries; dedup
    * correctness never depended on uniqueness, only size does). Swap is
    * write-`.next` → delete live → promote; [[recoverSwap]] completes a
    * swap that crashed after the delete.
    */
  private def compact(spark: SparkSession, dir: String): Unit = {
    def swap(path: String, write: String => Unit): Unit = {
      recoverSwap(path)
      if (new java.io.File(path).exists()) {
        write(path + ".next")
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(path))
        new java.io.File(path + ".next").renameTo(new java.io.File(path))
      }
    }
    swap(s"$dir/fps", out => spark.read.schema(FpSchema)
      .parquet(s"$dir/fps").distinct().write.parquet(out))
    swap(s"$dir/grams", out => spark.read.schema(GramSchema)
      .parquet(s"$dir/grams").distinct().write.parquet(out))
    swap(s"$dir/corpus", out => spark.read.parquet(s"$dir/corpus")
      .repartition(spark.sessionState.conf.numShufflePartitions)
      .write.parquet(out))
  }

  /**
   * @param docs       streaming DataFrame with `idCol` and `textCol`
   * @param dir        corpus root: `corpus/`, `fps/`, `grams/` parquet
   * @param checkpoint streaming checkpoint (file-source progress)
   * @param availableNow process what's buffered, then stop (testing)
   */
  def start(docs: DataFrame, dir: String, checkpoint: String,
      idCol: String = "doc_id", textCol: String = "text",
      n: Int = 8, minHits: Int = 1,
      availableNow: Boolean = false,
      compactEvery: Option[Int] = None): StreamingQuery = {
    require(compactEvery.forall(_ > 0), "compactEvery must be positive")
    val writer = docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val idx = Dedup.CorpusIndex(
          readOrEmpty(spark, s"$dir/fps", FpSchema),
          readOrEmpty(spark, s"$dir/grams", GramSchema))
        val intra = Dedup.exactDedup(batch,
            graft.operators.TextAnalysis.fingerprint(col(textCol)),
            col(idCol))
          .filter(!col("is_duplicate")).drop("is_duplicate")
        val survivors = Dedup.dedupAgainstIndex(intra, idx,
          idCol, col(textCol), n, minHits)
        try {
          // stage first — see the object doc: appending to the index
          // paths recaches-by-path any plan that reads them, so all
          // downstream appends must derive from this frozen copy
          survivors.write.mode("overwrite").parquet(s"$dir/stage")
          val staged = spark.read.parquet(s"$dir/stage")
          val (fps, grams) = Dedup.indexEntries(staged, idCol,
            col(textCol), n)
          // index before corpus: a crash between the writes drops the
          // batch on replay instead of double-appending it
          fps.write.mode("append").parquet(s"$dir/fps")
          grams.write.mode("append").parquet(s"$dir/grams")
          staged.write.mode("append").parquet(s"$dir/corpus")
        } finally {
          // the ingest owns this session's dedup caches (caller role,
          // like Verify/Bench) — released once per batch; early release
          // under a concurrent query only costs recomputation
          Dedup.releasePersisted()
        }
        // batch ids persist in the checkpoint, so the cadence survives
        // restarts (the StreamingVcfLoad.compactEvery pattern)
        compactEvery.foreach { every =>
          if ((batchId + 1) % every == 0) compact(spark, dir)
        }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }
}
