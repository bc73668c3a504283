package graft.streaming

import graft.operators.{Retrieval, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/**
 * Streaming maintenance of SERVED retrieval indexes — the missing piece
 * between the batch increments ([[Retrieval.mergeIndex]] for BM25,
 * [[Similarity.addToIvfIndex]] for ANN) and a recurring-crawl pipeline:
 * a `foreachBatch` loop that folds each micro-batch into an at-rest
 * index whose READERS ([[readBm25]] / [[readIvf]]) always see a
 * consistent, replay-safe view. [[DedupIngest]] is the template (staged
 * writes, explicit crash ordering, bounded compaction); this module
 * applies the same reasoning to the two index families whose serving
 * surfaces already exist.
 *
 * == BM25 layout and crash windows ==
 *
 * Three append-only parquet dirs under `dir/`, every row stamped with
 * its `__batch`:
 *
 *  - `tf/` — per-(doc, term) term frequencies with doc length: the pure
 *    append side (at scale, write bucketed on `__t` — new files only).
 *    Appended LAST: the presence of a batch's rows in `tf/` IS the
 *    commit record for that batch.
 *  - `df/` — PER-BATCH document-frequency partials (vocab-sized each).
 *  - `stats/` — per-batch `(n_docs, dl_sum)` with the length sum kept
 *    as an exact long ([[Retrieval.mergeIndex]]'s recovery trick, made
 *    explicit at rest).
 *
 * An ingest appends df → stats → tf. A crash before the tf append
 * leaves ORPHAN df/stats partials for an uncommitted batch; serving
 * joins partials against the batches present in `tf/`, so orphans are
 * invisible, and the checkpoint replays the batch, whose re-appended
 * partials are byte-identical to the orphans (tokenization is
 * deterministic) — serving collapses duplicates per (batch, term)
 * before summing, so the crash window costs nothing. A REPLAY of a
 * fully-committed batch is detected by its `tf/` rows and skipped
 * whole. Net: exactly-once index contents under any crash/replay
 * interleaving, with no write-ahead log beyond the tf commit record
 * itself. (A crashed tf append itself leaves only uncommitted task
 * files Spark's reader ignores.)
 *
 * Serving reconstructs exact global df (per-term sum of disjoint
 * batches' partials) and exact corpus stats (integer sums, one final
 * division) — [[readBm25]] ≡ a from-scratch [[Retrieval.buildIndex]]
 * over every committed doc, spec-checked down to served scores.
 * Contract (as for mergeIndex): doc ids disjoint across batches — gate
 * recurring feeds through [[DedupIngest]] first.
 *
 * == IVF layout ==
 *
 * `centroids/` is written once ([[bootstrapIvf]] — cell assignment
 * must be a pure function of (vector, frozen centroids) for increments
 * to equal rebuilds); `assigned/` appends each batch's assignments,
 * stamped `__batch` (the single dir doubles as its own commit record —
 * replays of committed batches are skipped, crashed appends leave only
 * ignorable uncommitted files). Centroid retraining/re-assignment stays
 * a batch-cadence operation ([[Similarity.addToIvfIndex]] scaladoc).
 *
 * == Compaction ==
 *
 * Per-batch files and partials accumulate; [[compactBm25]] /
 * [[compactIvf]] fold them on the caller's cadence (single writer —
 * run from the ingest thread between batches, like [[DedupIngest]]):
 * the tf/assigned tails fold through the manifest-logged size-tiered
 * [[DedupIngest.foldCorpusTail]] (large generations never rewritten);
 * the vocab-sized df/stats partials collapse to one summed partial
 * under the reserved batch stamp −1 (always treated as committed) via
 * the `.next`-swap with [[DedupIngest.recoverSwap]] crash recovery.
 */
object IndexIngest {

  private val CommittedBatch = -1L

  private val TfSchema = StructType(Seq(
    StructField("__id", StringType), StructField("__t", StringType),
    StructField("__tf", LongType), StructField("__dl", LongType),
    StructField("__batch", LongType)))
  private val DfSchema = StructType(Seq(
    StructField("__t", StringType), StructField("__df", LongType),
    StructField("__batch", LongType)))
  private val StatsSchema = StructType(Seq(
    StructField("__batch", LongType), StructField("__n", LongType),
    StructField("__dlsum", LongType)))
  private val AssignedSchema = StructType(Seq(
    StructField("__vid", LongType),
    StructField("__cvec", ArrayType(FloatType)),
    StructField("__cell", LongType), StructField("__batch", LongType)))
  private val CentroidSchema = StructType(Seq(
    StructField("cell_id", LongType),
    StructField("cvec", ArrayType(FloatType))))

  private def committed(spark: SparkSession, markerDir: String,
      schema: StructType, batchId: Long): Boolean =
    !DedupIngest.readOrEmpty(spark, markerDir, schema)
      .filter(col("__batch") === batchId).isEmpty

  // ------------------------------------------------------------------
  // BM25
  // ------------------------------------------------------------------

  /** Fold one micro-batch into the BM25 dirs (df → stats → tf; see the
    * object doc for why that order). Returns false on a replay of a
    * committed batch (no-op) or an empty batch. */
  def ingestBm25Batch(batch: DataFrame, batchId: Long, dir: String,
      idCol: String = "doc_id", textCol: String = "text"): Boolean = {
    val spark = batch.sparkSession
    if (committed(spark, s"$dir/tf", TfSchema, batchId)) return false
    if (batch.isEmpty) return false
    val idx = Retrieval.buildIndex(batch, idCol, textCol)
    try {
      idx.df.select(col("__t"), col("__df").cast("long"),
          lit(batchId).as("__batch"))
        .write.mode("append").parquet(s"$dir/df")
      idx.stats.select(lit(batchId).as("__batch"),
          col("__n").cast("long"),
          coalesce(round(col("__avgdl") * col("__n")), lit(0.0))
            .cast("long").as("__dlsum"))
        .write.mode("append").parquet(s"$dir/stats")
      // LAST: commits the batch
      idx.tf.select(col("__id").cast("string"), col("__t"),
          col("__tf").cast("long"), col("__dl").cast("long"),
          lit(batchId).as("__batch"))
        .write.mode("append").parquet(s"$dir/tf")
      true
    } finally graft.operators.Dedup.releasePersisted()
  }

  /** The served view: exactly [[Retrieval.buildIndex]] over every
    * committed document. Orphan df/stats partials (crashed ingests) are
    * excluded by the committed-batch join; duplicate partials (crash +
    * replay) collapse per (batch, term) before the global sum. Doc ids
    * serve as strings (at-rest schema stability across feeds). */
  def readBm25(spark: SparkSession, dir: String): Retrieval.Bm25Index = {
    val tf = DedupIngest.readOrEmpty(spark, s"$dir/tf", TfSchema)
    val valid = tf.select("__batch").distinct()
      .unionByName(spark.range(1).select(lit(CommittedBatch).as("__batch")))
    val df = DedupIngest.readOrEmpty(spark, s"$dir/df", DfSchema)
      .groupBy("__t", "__batch").agg(max("__df").as("__df"))
      .join(valid, Seq("__batch"), "left_semi")
      .groupBy("__t").agg(sum("__df").as("__df"))
    val stats = DedupIngest.readOrEmpty(spark, s"$dir/stats", StatsSchema)
      .groupBy("__batch").agg(max("__n").as("__n"),
        max("__dlsum").as("__dlsum"))
      .join(valid, Seq("__batch"), "left_semi")
      .agg(sum("__n").as("__n"),
        (sum("__dlsum").cast("double") / sum("__n")).as("__avgdl"))
    Retrieval.Bm25Index(tf.drop("__batch"), df, stats)
  }

  /** Maintain the BM25 dirs from a streaming document source. */
  def startBm25(docs: DataFrame, dir: String, checkpoint: String,
      idCol: String = "doc_id", textCol: String = "text",
      availableNow: Boolean = false,
      compactEvery: Option[Int] = None,
      smallFileBytes: Long = 32L << 20): StreamingQuery = {
    require(compactEvery.forall(_ > 0), "compactEvery must be positive")
    val writer = docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBm25Batch(batch, batchId, dir, idCol, textCol)
        compactEvery.foreach { every =>
          if ((batchId + 1) % every == 0)
            compactBm25(batch.sparkSession, dir, smallFileBytes)
        }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** Fold the BM25 dirs back to bounded size: tf through the
    * size-tiered manifest-logged tail fold; df/stats partials collapse
    * to one committed partial each (stamp −1) under a recoverable
    * `.next` swap. Single-writer cadence (see object doc). */
  def compactBm25(spark: SparkSession, dir: String,
      smallFileBytes: Long = 32L << 20): Unit = {
    val tf = DedupIngest.readOrEmpty(spark, s"$dir/tf", TfSchema)
    val valid = tf.select("__batch").distinct()
      .unionByName(spark.range(1).select(lit(CommittedBatch).as("__batch")))
      .collect().map(_.getLong(0)).toSet
    def swapFold(path: String, schema: StructType,
        fold: DataFrame => DataFrame): Unit = {
      DedupIngest.recoverSwap(spark, path)
      val (f, live) = DedupIngest.fs(spark, path)
      if (!f.exists(live)) return
      val folded = fold(spark.read.schema(schema).parquet(path)
        .filter(col("__batch").isInCollection(valid)))
      folded.coalesce(1).write.parquet(path + ".next")
      f.delete(live, true)
      f.rename(new org.apache.hadoop.fs.Path(path + ".next"), live)
    }
    swapFold(s"$dir/df", DfSchema, d => d
      .groupBy("__t", "__batch").agg(max("__df").as("__df"))
      .groupBy("__t").agg(sum("__df").as("__df"))
      .select(col("__t"), col("__df"), lit(CommittedBatch).as("__batch")))
    swapFold(s"$dir/stats", StatsSchema, d => d
      .groupBy("__batch").agg(max("__n").as("__n"),
        max("__dlsum").as("__dlsum"))
      .agg(sum("__n").as("__n"), sum("__dlsum").as("__dlsum"))
      .select(lit(CommittedBatch).as("__batch"), col("__n"), col("__dlsum")))
    DedupIngest.foldCorpusTail(spark, s"$dir/tf", smallFileBytes)
  }

  // ------------------------------------------------------------------
  // IVF
  // ------------------------------------------------------------------

  /** Pin the frozen centroid set the ingest assigns against. Overwrite
    * is idempotent; re-bootstrapping with DIFFERENT centroids after
    * ingest has begun is a re-assignment event, not a bootstrap — the
    * assigned dir must be rebuilt with them (batch cadence). */
  def bootstrapIvf(spark: SparkSession, dir: String,
      centroids: Seq[(Long, Seq[Float])]): Unit = {
    require(centroids.nonEmpty, "need at least one centroid")
    import spark.implicits._
    centroids.toDF("cell_id", "cvec")
      .select(col("cell_id").cast("long"),
        col("cvec").cast(ArrayType(FloatType)))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
  }

  private def readCentroids(spark: SparkSession, dir: String)
      : Seq[(Long, Seq[Float])] =
    spark.read.schema(CentroidSchema).parquet(s"$dir/centroids")
      .orderBy("cell_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toSeq).toSeq

  /** Assign one micro-batch against the bootstrapped centroids and
    * append. Single-dir append: the batch stamp is its own commit
    * record, so replays of committed batches no-op. Vector ids must be
    * long-castable (ranking ties break on the id — string order would
    * reorder numeric ids). */
  def ingestIvfBatch(batch: DataFrame, batchId: Long, dir: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Boolean = {
    val spark = batch.sparkSession
    if (committed(spark, s"$dir/assigned", AssignedSchema, batchId))
      return false
    if (batch.isEmpty) return false
    val cents = readCentroids(spark, dir)
    val add = Similarity.buildIvfIndex(batch, cents.size, idCol, vecCol,
      cents)
    add.assigned.select(col(idCol).cast("long").as("__vid"),
        col("__cvec").cast(ArrayType(FloatType)),
        col("__cell").cast("long"), lit(batchId).as("__batch"))
      .write.mode("append").parquet(s"$dir/assigned")
    true
  }

  /** The served view: identical to [[Similarity.buildIvfIndex]] over
    * every ingested vector with the bootstrapped centroids (assignment
    * is pure, so increments ≡ rebuild — spec-checked on served
    * results). */
  def readIvf(spark: SparkSession, dir: String,
      idCol: String = "vec_id"): Similarity.IvfIndex =
    Similarity.IvfIndex(
      DedupIngest.readOrEmpty(spark, s"$dir/assigned", AssignedSchema)
        .select(col("__vid").as(idCol), col("__cvec"), col("__cell")),
      readCentroids(spark, dir))

  /** Maintain the IVF dirs from a streaming vector source. */
  def startIvf(vecs: DataFrame, dir: String, checkpoint: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      availableNow: Boolean = false,
      compactEvery: Option[Int] = None,
      smallFileBytes: Long = 32L << 20): StreamingQuery = {
    require(compactEvery.forall(_ > 0), "compactEvery must be positive")
    val writer = vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestIvfBatch(batch, batchId, dir, idCol, vecCol)
        compactEvery.foreach { every =>
          if ((batchId + 1) % every == 0)
            compactIvf(batch.sparkSession, dir, smallFileBytes)
        }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** Fold the assigned tail (size-tiered, manifest-logged — large
    * generations never rewritten). */
  def compactIvf(spark: SparkSession, dir: String,
      smallFileBytes: Long = 32L << 20): Unit =
    DedupIngest.foldCorpusTail(spark, s"$dir/assigned", smallFileBytes)
}
