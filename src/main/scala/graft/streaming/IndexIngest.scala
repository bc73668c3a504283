package graft.streaming

import graft.operators.{Retrieval, Similarity}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
 * == Commit protocol and crash windows ==
 *
 * Data dirs are append-only parquet, every row stamped `__batch`; a
 * `markers/` ledger carries one tiny file per batch in two states —
 * `<id>.intent`, created atomically BEFORE any append, and `<id>`
 * (the commit record), created atomically AFTER every append. Ingest:
 *
 *  1. commit marker exists → the batch is fully folded; a checkpoint
 *     REPLAY no-ops in O(1) (one file-existence probe — no index scan
 *     on the hot path).
 *  2. intent marker exists without a commit → a previous attempt
 *     crashed somewhere inside its appends; the batch's rows (possibly
 *     a PARTIAL append — a parquet job commit is not atomic across
 *     files) are purged with a filtered rewrite of each data dir
 *     (recoverable `.next` swap), then the batch re-appends cleanly.
 *     The rewrite is paid only on this rare post-crash path.
 *  3. neither → first attempt: write intent, append (BM25: df, stats,
 *     tf), write commit, drop intent.
 *
 * Readers take the committed-marker set as the source of truth: rows
 * whose `__batch` lacks a commit marker (a crashed attempt not yet
 * replayed, or an in-flight batch) are filtered out of every served
 * frame. Net: exactly-once index contents and always-consistent reads
 * under any crash/replay interleaving.
 *
 * Contract: an index dir is bound to ONE streaming checkpoint lineage —
 * batch ids are the replay identity, so pointing a NEW stream (fresh
 * checkpoint, ids restarting at 0) at an existing dir would read old
 * commit markers as "already ingested" and silently drop data. Start a
 * new dir for a new lineage (or feed batches through
 * [[ingestBm25Batch]]/[[ingestIvfBatch]] with caller-managed ids).
 * Doc/vector ids must be disjoint across batches (as for
 * [[Retrieval.mergeIndex]]) — gate recurring feeds through
 * [[DedupIngest]] first.
 *
 * == BM25 layout ==
 *
 *  - `tf/` — per-(doc, term) frequencies with doc length (at scale,
 *    write bucketed on `__t` — new files only per batch).
 *  - `df/` — PER-BATCH document-frequency partials (vocab-sized each).
 *  - `stats/` — per-batch `(n_docs, dl_sum)`, the length sum stored
 *    directly from the builder's exact long `__dlsum` (no float
 *    round-trip — deletions cancel it with exact negatives).
 *
 * Serving reconstructs exact global df (per-term sum of disjoint
 * batches' partials) and exact corpus stats (integer sums, one final
 * division) — [[readBm25]] ≡ a from-scratch [[Retrieval.buildIndex]]
 * over every committed doc, spec-checked down to served scores.
 *
 * == IVF layout ==
 *
 * `centroids/` is written once ([[bootstrapIvf]] — cell assignment
 * must be a pure function of (vector, frozen centroids) for increments
 * to equal rebuilds); `assigned/` appends each batch's assignments
 * under the same marker protocol. Centroid retraining/re-assignment
 * stays a batch-cadence operation ([[Similarity.addToIvfIndex]]).
 *
 * == Compaction ==
 *
 * == Single-writer contract ==
 *
 * Compaction AND deletion are filtered read→rewrite→swap operations
 * over the data dirs: an append landing between a rewrite's read and
 * its install would be silently lost, and a batch that passed its
 * `tombstonedIds` check before a deletion's intent landed would fold
 * tombstoned rows. So [[compactBm25]]/[[compactIvf]]/[[compactPq]]
 * AND [[deleteBm25Docs]]/[[deleteIvfVecs]]/[[deletePqVecs]]/
 * [[deleteKmeansContribs]] MUST run
 * from the ingest thread between batches (the `foreachBatch` body is
 * the natural place; the compactEvery hooks already do) — never
 * concurrently with an in-flight ingest of the same dir.
 *
 * == Compaction ==
 *
 * Per-batch files and partials accumulate; [[compactBm25]] /
 * [[compactIvf]] fold them on the caller's cadence (single writer —
 * see above, like [[DedupIngest]]):
 * the tf/assigned tails fold through the manifest-logged size-tiered
 * [[DedupIngest.foldCorpusTail]] (large generations never rewritten;
 * readers run its recovery before listing, so a crashed fold can never
 * serve duplicates); the vocab-sized df/stats partials collapse to one
 * summed partial under the reserved batch stamp −1 (always committed)
 * via the `.next` swap with [[DedupIngest.recoverSwap]]. The ledger's
 * FACTS are permanent — late replays of folded batches still no-op —
 * but the individual ingest markers themselves fold into a
 * `batch-upto-<n>` watermark file ([[compactMarkers]]): a long-lived
 * stream would otherwise mint one marker per micro-batch forever and
 * every read's marker listing (and its committed-id set) would grow
 * with stream lifetime rather than index size.
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

  // ------------------------------------------------------------------
  // Marker ledger
  // ------------------------------------------------------------------

  private def marker(spark: SparkSession, dir: String, name: String) = {
    val (f, _) = DedupIngest.fs(spark, s"$dir/markers")
    (f, new org.apache.hadoop.fs.Path(s"$dir/markers/$name"))
  }

  private def hasMarker(spark: SparkSession, dir: String,
      name: String): Boolean = {
    val (f, p) = marker(spark, dir, name)
    f.exists(p)
  }

  private def putMarker(spark: SparkSession, dir: String,
      name: String): Unit = {
    val (f, p) = marker(spark, dir, name)
    f.mkdirs(p.getParent)
    f.create(p, true).close()
  }

  private def dropMarker(spark: SparkSession, dir: String,
      name: String): Unit = {
    val (f, p) = marker(spark, dir, name)
    if (f.exists(p)) f.delete(p, false)
  }

  /** Deletions live in their own marker namespace (`del-<id>`) and
    * stamp their negative partials `-(id) - 2` — distinct from every
    * ingest batch id (≥ 0) and from the compaction stamp (−1), so a
    * deletion id can never collide with a stream micro-batch id. */
  private def delStamp(deleteId: Long): Long = -deleteId - 2

  // ------------------------------------------------------------------
  // Single-writer lock — machinery shared with DedupIngest, see
  // [[LedgerLock]]; every mutator below holds the dir's lock. These
  // aliases keep the lock API discoverable next to the operations it
  // guards.
  // ------------------------------------------------------------------

  val LockStaleMsKey: String = LedgerLock.LockStaleMsKey
  type ConcurrentWriterException = LedgerLock.ConcurrentWriterException
  def breakLedgerLock(spark: SparkSession, dir: String): Unit =
    LedgerLock.break(spark, dir)

  private def withLedgerLock[T](spark: SparkSession, dir: String)
      (body: => T): T = LedgerLock.withLock(spark, dir)(body)

  /** Marker names in the ledger (commit state only). */
  private def markerNames(spark: SparkSession, dir: String): Seq[String] = {
    val (f, root) = DedupIngest.fs(spark, s"$dir/markers")
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).toSeq.map(_.getPath.getName)
      .filterNot(_.endsWith(".intent"))
  }

  /** "Every ingest batch id in [0, n] is committed (and its intent
    * dropped)" — the highest published `batch-upto-<n>` watermark,
    * -1 when none. See [[compactMarkers]]. */
  private def batchWatermark(spark: SparkSession, dir: String): Long =
    MarkerLedger.watermark(markerNames(spark, dir))

  /** The committed-visibility predicate over a batch-stamp column:
    * inside the watermark's [0, n], OR carrying an individual marker.
    * This replaces `isInCollection(every historical id)` — both that
    * literal list and the marker listing behind it grew with stream
    * LIFETIME (millions of micro-batches at 100 TB), so reads got
    * slower forever on a table whose size was flat. `ingestOnly`
    * restricts the tail to non-negative ingest stamps (excludes
    * deletion/compaction stamps).
    *
    * Watermark and tail come from ONE `listStatus` snapshot: two
    * listings raced a concurrent [[compactMarkers]] fold (new
    * watermark created, folded markers deleted, in between) — a
    * lock-free reader could capture the OLD watermark with the
    * POST-fold tail and silently drop committed batches. One listing
    * is atomic enough: a fold never removes a marker without the
    * covering watermark already existing, so any single snapshot is
    * complete (it may only over-include, never under-include). */
  private def committedPred(spark: SparkSession, dir: String,
      c: Column, ingestOnly: Boolean = false): Column = {
    // ONE snapshot ([[markerNames]] is a single listStatus), then the
    // shared parsers — the watermark regex lives in MarkerLedger and
    // the tail parse in [[markerTailIds]], not re-inlined here
    val names = markerNames(spark, dir)
    val w = MarkerLedger.watermark(names)
    val tail = (markerTailIds(names) :+ CommittedBatch)
      .filter(id => !ingestOnly || id >= 0)
    (c >= 0L && c <= w) || c.isInCollection(tail)
  }

  /** Batch-stamp ids carried by INDIVIDUAL markers in `names` (bare
    * ingest ids and `del-<n>` deletion stamps) — the tail above the
    * watermark plus permanent deletion markers. The one place this
    * family's marker names are parsed into stamps. */
  private def markerTailIds(names: Seq[String]): Seq[Long] =
    names.flatMap { n =>
      if (n.startsWith("del-")) n.drop(4).toLongOption.map(delStamp)
      else n.toLongOption
    }

  /** Fold the contiguous committed prefix of INGEST batch markers into
    * ONE `batch-upto-<n>` watermark file ([[LayoutIngest]]'s device):
    * without it a long-lived stream mints one marker per micro-batch
    * forever and every read/replay listing walks all of them. The
    * watermark preserves both ledger facts the individual markers
    * carried — replay no-ops ([[ingestBm25Batch]] &c. probe it) and
    * committed visibility ([[committedPred]]). Crash-exact: the
    * watermark create is atomic and its NAME carries the state
    * (monotone — readers take the max); folded markers, their leftover
    * intents (an intent at or below the watermark is by definition a
    * committed batch's leftover), and superseded watermarks are deleted
    * after, and every intermediate state converges on the next fold.
    * Deletion markers (`del-*`) are PERMANENT — deletion volume is
    * takedown-sized, not stream-lifetime-sized. Runs from the ingest
    * thread (the single-writer cadence); the stream loops call it
    * after every batch. */
  def compactMarkers(spark: SparkSession, dir: String): Unit =
      withLedgerLock(spark, dir) {
    val (f, root) = DedupIngest.fs(spark, s"$dir/markers")
    if (!f.exists(root)) return
    val names = f.listStatus(root).toSeq.map(_.getPath.getName)
    // shared fold core (MarkerLedger); this family names commit
    // markers with the bare id, and a fold also retires the folded
    // batches' stale .intent files — keyed on the watermark, so an
    // intent whose commit marker went in an earlier crashed pass is
    // still collected (an intent at or below the watermark is by
    // definition a committed batch's leftover)
    MarkerLedger.fold(f, root, names,
      commitIds = names.filterNot(_.startsWith("del-"))
        .filterNot(_.endsWith(".intent"))
        .flatMap(_.toLongOption).filter(_ >= 0).toSet,
      commitName = i => i.toString,
      retireBelow = n => names.filter(_.endsWith(".intent"))
        .flatMap(_.stripSuffix(".intent").toLongOption)
        .filter(i => i >= 0 && i <= n)
        .map(i => s"$i.intent"))
  }

  /** Highest ingest batch id the ledger has SEEN (commit or intent) —
    * the coverage horizon a deletion records so replays of earlier
    * batches know to re-apply it. */
  private def maxSeenBatch(spark: SparkSession, dir: String): Long = {
    val (f, root) = DedupIngest.fs(spark, s"$dir/markers")
    val names = if (!f.exists(root)) Seq.empty[String]
      else f.listStatus(root).toSeq.map(_.getPath.getName)
    val w = names.filter(_.matches("batch-upto-\\d+"))
      .map(_.stripPrefix("batch-upto-").toLong).foldLeft(-1L)(math.max)
    val ids = names.filterNot(_.startsWith("del-"))
      .map(_.stripSuffix(".intent")).flatMap(_.toLongOption)
    (ids :+ w).max
  }

  private val TombSchema = StructType(Seq(
    StructField("__id", StringType), StructField("__covered", LongType),
    StructField("__del", LongType)))

  /** Ids a replaying batch must drop: tombstones of COMMITTED deletions
    * whose coverage horizon includes `batchId`. Bounded by deletion
    * volume (takedown lists, not corpus scale) — one small collect. */
  private def tombstonedIds(spark: SparkSession, dir: String,
      batchId: Long): Seq[String] = {
    // a crashed delete-replay tombstone rewrite must be completed, not
    // read as "no tombstones" — that would let a replaying batch
    // resurrect every committed deletion's docs
    DedupIngest.recoverSwap(spark, s"$dir/tombstones")
    val (f, p) = DedupIngest.fs(spark, s"$dir/tombstones")
    if (!f.exists(p)) return Seq.empty
    val dels = markerNames(spark, dir)
      .filter(_.startsWith("del-")).flatMap(_.drop(4).toLongOption)
    if (dels.isEmpty) return Seq.empty
    spark.read.schema(TombSchema).parquet(s"$dir/tombstones")
      .filter(col("__covered") >= batchId &&
        col("__del").isInCollection(dels))
      .select("__id").distinct().collect().map(_.getString(0)).toSeq
  }

  /** Remove every `__batch = batchId` row from a data dir — the
    * post-crash cleanup for a partially-appended batch. Completes any
    * crashed compaction fold FIRST (a rewrite over a half-installed
    * fold would both materialize its duplicates and orphan its
    * manifest), then filtered-rewrites under the recoverable `.next`
    * swap; a no-op when the dir is absent. Only runs on the
    * intent-without-commit path. */
  private def purgeBatch(spark: SparkSession, path: String,
      schema: StructType, batchId: Long): Unit =
    purgeWhere(spark, path, schema, col("__batch") =!= batchId)

  private def purgeWhere(spark: SparkSession, path: String,
      schema: StructType,
      keep: org.apache.spark.sql.Column): Unit = {
    DedupIngest.recoverFold(spark, path)
    DedupIngest.recoverSwap(spark, path)
    val (f, live) = DedupIngest.fs(spark, path)
    if (!f.exists(live)) return
    spark.read.schema(schema).parquet(path)
      .filter(keep)
      .write.parquet(path + ".next")
    f.delete(live, true)
    DedupIngest.renameOrThrow(f,
      new org.apache.hadoop.fs.Path(path + ".next"), live, "purge swap")
  }

  // ------------------------------------------------------------------
  // BM25
  // ------------------------------------------------------------------

  /** Fold one micro-batch into the BM25 dirs under the marker protocol
    * (object doc). Returns false on a replay of a committed batch (an
    * O(1) no-op) or an empty batch. */
  def ingestBm25Batch(batch: DataFrame, batchId: Long, dir: String,
      idCol: String = "doc_id", textCol: String = "text"): Boolean =
      withLedgerLock(batch.sparkSession, dir) {
    val spark = batch.sparkSession
    require(batchId >= 0, s"batchId must be non-negative, got $batchId" +
      " (negative stamps are reserved for deletions/compaction)")
    if (hasMarker(spark, dir, batchId.toString) ||
      batchId <= batchWatermark(spark, dir)) return false
    if (hasMarker(spark, dir, s"$batchId.intent")) {
      purgeBatch(spark, s"$dir/tf", TfSchema, batchId)
      purgeBatch(spark, s"$dir/df", DfSchema, batchId)
      purgeBatch(spark, s"$dir/stats", StatsSchema, batchId)
    }
    // drop docs a committed deletion has tombstoned for this horizon —
    // otherwise replaying a batch that crashed BEFORE the deletion
    // would resurrect the deleted docs
    val tomb = tombstonedIds(spark, dir, batchId)
    val live = if (tomb.isEmpty) batch
      else batch.filter(!coalesce(
        col(idCol).cast("string").isInCollection(tomb), lit(false)))
    if (live.isEmpty) {
      // nothing to fold (empty or fully tombstoned) — still COMMIT so
      // replays are O(1) no-ops and no intent marker dangles
      putMarker(spark, dir, batchId.toString)
      dropMarker(spark, dir, s"$batchId.intent")
      return false
    }
    putMarker(spark, dir, s"$batchId.intent")
    val idx = Retrieval.buildIndex(live, idCol, textCol)
    try {
      idx.df.select(col("__t"), col("__df").cast("long"),
          lit(batchId).as("__batch"))
        .write.mode("append").parquet(s"$dir/df")
      idx.stats.select(lit(batchId).as("__batch"),
          col("__n").cast("long"), col("__dlsum").cast("long"))
        .write.mode("append").parquet(s"$dir/stats")
      idx.tf.select(col("__id").cast("string"), col("__t"),
          col("__tf").cast("long"), col("__dl").cast("long"),
          lit(batchId).as("__batch"))
        .write.mode("append").parquet(s"$dir/tf")
      putMarker(spark, dir, batchId.toString)
      dropMarker(spark, dir, s"$batchId.intent")
      true
    } finally graft.operators.Dedup.releasePersisted()
  }

  /** The served view: exactly [[Retrieval.buildIndex]] over every
    * committed document. Rows of uncommitted batches (crashed attempts
    * awaiting replay, in-flight appends) are filtered by the marker
    * ledger; a crashed compaction fold is completed before listing.
    * Doc ids serve as strings (at-rest schema stability across
    * feeds). */
  def readBm25(spark: SparkSession, dir: String): Retrieval.Bm25Index = {
    DedupIngest.recoverFold(spark, s"$dir/tf")
    val vis = committedPred(spark, dir, col("__batch"))
    val tf = DedupIngest.readOrEmpty(spark, s"$dir/tf", TfSchema)
      .filter(vis)
    val df = DedupIngest.readOrEmpty(spark, s"$dir/df", DfSchema)
      .filter(vis)
      .groupBy("__t").agg(sum("__df").as("__df"))
    val stats = DedupIngest.readOrEmpty(spark, s"$dir/stats", StatsSchema)
      .filter(vis)
      .agg(sum("__n").as("__n"),
        (sum("__dlsum").cast("double") / sum("__n")).as("__avgdl"),
        coalesce(sum("__dlsum"), lit(0L)).cast("long").as("__dlsum"))
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
        compactMarkers(batch.sparkSession, dir)
        compactEvery.foreach { every =>
          if ((batchId + 1) % every == 0)
            compactBm25(batch.sparkSession, dir, smallFileBytes)
        }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** Fold the BM25 dirs back to bounded size: tf through the
    * size-tiered manifest-logged tail fold (file-level — any
    * uncommitted rows ride along, stay reader-invisible, and are
    * purged by their batch's replay); df/stats partials collapse to
    * one committed partial each (stamp −1) under a recoverable `.next`
    * swap, dropping uncommitted rows in passing. Commit markers
    * survive as the permanent ledger. Single-writer cadence (object
    * doc). */
  def compactBm25(spark: SparkSession, dir: String,
      smallFileBytes: Long = 32L << 20): Unit = withLedgerLock(spark, dir) {
    val vis = committedPred(spark, dir, col("__batch"))
    def swapFold(path: String, schema: StructType,
        fold: DataFrame => DataFrame): Unit = {
      DedupIngest.recoverSwap(spark, path)
      val (f, live) = DedupIngest.fs(spark, path)
      if (!f.exists(live)) return
      val folded = fold(spark.read.schema(schema).parquet(path)
        .filter(vis))
      folded.coalesce(1).write.parquet(path + ".next")
      f.delete(live, true)
      DedupIngest.renameOrThrow(f,
        new org.apache.hadoop.fs.Path(path + ".next"), live, "fold swap")
    }
    swapFold(s"$dir/df", DfSchema, d => d
      .groupBy("__t").agg(sum("__df").as("__df"))
      .select(col("__t"), col("__df"), lit(CommittedBatch).as("__batch")))
    swapFold(s"$dir/stats", StatsSchema, d => d
      .agg(sum("__n").as("__n"), sum("__dlsum").as("__dlsum"))
      .select(lit(CommittedBatch).as("__batch"), col("__n"), col("__dlsum")))
    DedupIngest.foldCorpusTail(spark, s"$dir/tf", smallFileBytes)
    // sweep committed deletions' staged snapshots (they hold the
    // forgotten docs' content; normally cleaned at commit, but a crash
    // in the commit window can orphan one that is never replayed)
    val (f, delRoot) = DedupIngest.fs(spark, s"$dir/deletes")
    if (f.exists(delRoot)) {
      val committed = markerNames(spark, dir)
        .filter(_.startsWith("del-")).map(_.drop(4)).toSet
      f.listStatus(delRoot).foreach { s =>
        if (committed.contains(s.getPath.getName.stripSuffix(".tmp")))
          f.delete(s.getPath, true)
      }
    }
  }

  /**
   * Targeted document deletion — the data-governance path
   * (right-to-be-forgotten, takedown, retraction) a served index needs
   * next to its ingest. Deletion is the MIRROR of ingest under the
   * same ledger, with one extra staging step because the evidence
   * destroys itself: the negative df/stats corrections can only be
   * derived while the doomed tf rows still exist, so they are
   * snapshotted to `deletes/<batchId>` first and every later step
   * derives from that frozen copy —
   *
   *  1. intent marker;
   *  2. stage the affected tf rows (skipped if already staged — a
   *     replay reuses the snapshot even though tf no longer holds the
   *     rows);
   *  3. append NEGATIVE df/stats partials derived from the snapshot
   *     (purged and re-appended on replay like any partials);
   *  4. rewrite tf without the deleted docs (recoverable `.next`
   *     swap; idempotent);
   *  5. commit marker, drop intent + snapshot.
   *
   * Serving needs no special case: the committed negative partials
   * cancel the deleted docs' contributions exactly, so
   * [[readBm25]] ≡ a rebuild without them (spec-checked on served
   * scores). A crash between the tf rewrite and the commit leaves a
   * transient where candidates are already gone but df still counts
   * the deleted docs (slightly inflated idf on shared terms) — healed
   * by the replay, the same reader-visible window class as ingest.
   *
   * `deleteId` draws from its own `del-` marker namespace and must be
   * fresh (caller-managed). SINGLE-WRITER: deletions rewrite the data
   * dirs — run them from the ingest thread between batches, like
   * compaction (object doc); a concurrent append would be lost in the
   * rewrite window.
   */
  def deleteBm25Docs(spark: SparkSession, dir: String, ids: Seq[String],
      deleteId: Long): Boolean = withLedgerLock(spark, dir) {
    require(ids.nonEmpty, "need at least one doc id to delete")
    require(deleteId >= 0, s"deleteId must be non-negative, got $deleteId")
    val m = s"del-$deleteId"
    val stamp = delStamp(deleteId)
    val stage = s"$dir/deletes/$deleteId"
    val (f, stagePath) = DedupIngest.fs(spark, stage)
    if (hasMarker(spark, dir, m)) {
      // committed replay: O(1) no-op, but clean any residue a crash
      // between the commit and the cleanup left behind — the staged
      // snapshot holds the to-be-forgotten docs' content and must not
      // persist at rest
      if (f.exists(stagePath)) f.delete(stagePath, true)
      dropMarker(spark, dir, s"$m.intent")
      return false
    }
    if (hasMarker(spark, dir, s"$m.intent")) {
      purgeBatch(spark, s"$dir/df", DfSchema, stamp)
      purgeBatch(spark, s"$dir/stats", StatsSchema, stamp)
      purgeWhere(spark, s"$dir/tombstones", TombSchema,
        col("__del") =!= deleteId)
    }
    putMarker(spark, dir, s"$m.intent")
    // The snapshot is written aside and RENAMED into place so its
    // existence implies completeness (a crash mid-write cannot leave a
    // partial snapshot a replay would trust), and REFRESHED on every
    // attempt: a replay may hold a stale snapshot (its rows already
    // purged from tf) while OTHER rows of the doomed ids were
    // re-committed by a batch replay in between — the union of the
    // snapshot with tf's current rows for the ids covers both, and
    // distinct() collapses the overlap (rows are deterministic per
    // (batch, id, term)). A half-written refresh is promoted only if
    // its job committed (_SUCCESS); otherwise it is discarded — tf
    // still holds the rows in that case, nothing is lost. The negative
    // partials below derive from the committed slice only (uncommitted
    // rows have no positive partials to cancel).
    DedupIngest.recoverFold(spark, s"$dir/tf")
    val vis = committedPred(spark, dir, col("__batch"))
    val tmpPath = new org.apache.hadoop.fs.Path(stage + ".tmp")
    if (!f.exists(stagePath) && f.exists(tmpPath) &&
        f.exists(new org.apache.hadoop.fs.Path(stage + ".tmp/_SUCCESS"))) {
      f.mkdirs(stagePath.getParent)
      DedupIngest.renameOrThrow(f, tmpPath, stagePath, "stage promote")
    }
    val prior = DedupIngest.readOrEmpty(spark, stage, TfSchema)
    val current = DedupIngest.readOrEmpty(spark, s"$dir/tf", TfSchema)
      .filter(col("__id").isInCollection(ids))
    if (f.exists(tmpPath)) f.delete(tmpPath, true)
    prior.unionByName(current).distinct().write.parquet(tmpPath.toString)
    if (f.exists(stagePath)) f.delete(stagePath, true)
    f.mkdirs(stagePath.getParent)
    DedupIngest.renameOrThrow(f, tmpPath, stagePath, "stage publish")
    val removed = spark.read.schema(TfSchema).parquet(stage)
      .filter(vis)
    removed.groupBy("__t")
      .agg((-countDistinct("__id")).as("__df"))
      .select(col("__t"), col("__df").cast("long"),
        lit(stamp).as("__batch"))
      .write.mode("append").parquet(s"$dir/df")
    removed.groupBy("__id").agg(first("__dl").as("__dl"))
      .agg(coalesce(-count(lit(1)), lit(0L)).as("__n"),
        coalesce(-sum("__dl"), lit(0L)).as("__dlsum"))
      .select(lit(stamp).as("__batch"), col("__n").cast("long"),
        col("__dlsum").cast("long"))
      .write.mode("append").parquet(s"$dir/stats")
    // tombstones: any replay of a batch the ledger has seen so far
    // must drop these ids, or a batch that crashed BEFORE this deletion
    // would resurrect them when it replays after
    val horizon = maxSeenBatch(spark, dir)
    import spark.implicits._
    ids.toDF("__id")
      .select(col("__id"), lit(horizon).as("__covered"),
        lit(deleteId).as("__del"))
      .coalesce(1).write.mode("append").parquet(s"$dir/tombstones")
    purgeDocs(spark, s"$dir/tf", TfSchema, ids)
    putMarker(spark, dir, m)
    dropMarker(spark, dir, s"$m.intent")
    f.delete(stagePath, true)
    true
  }

  /** Remove every row of the given doc ids from a data dir (fold
    * recovery first, then a filtered rewrite under the recoverable
    * `.next` swap; idempotent). */
  private def purgeDocs(spark: SparkSession, path: String,
      schema: StructType, ids: Seq[String]): Unit =
    purgeWhere(spark, path, schema,
      !coalesce(col("__id").isInCollection(ids), lit(false)))

  /** Targeted vector deletion — [[deleteBm25Docs]]' IVF counterpart,
    * simpler because the assigned dir is self-contained (no derived
    * partials): fold recovery + one recoverable filtered rewrite, a
    * tombstone append so replays of earlier batches re-drop the ids,
    * and the namespaced ledger marker (fresh `deleteId`,
    * caller-managed). SINGLE-WRITER like compaction — run between
    * batches from the ingest thread (object doc). */
  def deleteIvfVecs(spark: SparkSession, dir: String, ids: Seq[Long],
      deleteId: Long): Boolean = withLedgerLock(spark, dir) {
    require(ids.nonEmpty, "need at least one vec id to delete")
    require(deleteId >= 0, s"deleteId must be non-negative, got $deleteId")
    val m = s"del-$deleteId"
    if (hasMarker(spark, dir, m)) {
      dropMarker(spark, dir, s"$m.intent")
      return false
    }
    if (hasMarker(spark, dir, s"$m.intent"))
      purgeWhere(spark, s"$dir/tombstones", TombSchema,
        col("__del") =!= deleteId)
    putMarker(spark, dir, s"$m.intent")
    val horizon = maxSeenBatch(spark, dir)
    import spark.implicits._
    ids.map(_.toString).toDF("__id")
      .select(col("__id"), lit(horizon).as("__covered"),
        lit(deleteId).as("__del"))
      .coalesce(1).write.mode("append").parquet(s"$dir/tombstones")
    purgeWhere(spark, s"$dir/assigned", AssignedSchema,
      !coalesce(col("__vid").isInCollection(ids), lit(false)))
    putMarker(spark, dir, m)
    dropMarker(spark, dir, s"$m.intent")
    true
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
    * append, under the same marker protocol as
    * [[ingestBm25Batch]]. Vector ids must be long-castable (ranking
    * ties break on the id — string order would reorder numeric
    * ids). */
  def ingestIvfBatch(batch: DataFrame, batchId: Long, dir: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Boolean =
      withLedgerLock(batch.sparkSession, dir) {
    val spark = batch.sparkSession
    require(batchId >= 0, s"batchId must be non-negative, got $batchId" +
      " (negative stamps are reserved for deletions/compaction)")
    if (hasMarker(spark, dir, batchId.toString) ||
      batchId <= batchWatermark(spark, dir)) return false
    if (hasMarker(spark, dir, s"$batchId.intent"))
      purgeBatch(spark, s"$dir/assigned", AssignedSchema, batchId)
    val tomb = tombstonedIds(spark, dir, batchId)
    val live = if (tomb.isEmpty) batch
      else batch.filter(!coalesce(
        col(idCol).cast("string").isInCollection(tomb), lit(false)))
    if (live.isEmpty) {
      // nothing to fold (empty or fully tombstoned) — still COMMIT so
      // replays are O(1) no-ops and no intent marker dangles
      putMarker(spark, dir, batchId.toString)
      dropMarker(spark, dir, s"$batchId.intent")
      return false
    }
    putMarker(spark, dir, s"$batchId.intent")
    val cents = readCentroids(spark, dir)
    val add = Similarity.buildIvfIndex(live, cents.size, idCol, vecCol,
      cents)
    add.assigned.select(col(idCol).cast("long").as("__vid"),
        col("__cvec").cast(ArrayType(FloatType)),
        col("__cell").cast("long"), lit(batchId).as("__batch"))
      .write.mode("append").parquet(s"$dir/assigned")
    putMarker(spark, dir, batchId.toString)
    dropMarker(spark, dir, s"$batchId.intent")
    true
  }

  /** The served view: identical to [[Similarity.buildIvfIndex]] over
    * every committed vector with the bootstrapped centroids
    * (assignment is pure, so increments ≡ rebuild — spec-checked on
    * served results). Uncommitted rows are filtered by the ledger; a
    * crashed compaction fold is completed before listing. */
  def readIvf(spark: SparkSession, dir: String,
      idCol: String = "vec_id"): Similarity.IvfIndex = {
    DedupIngest.recoverFold(spark, s"$dir/assigned")
    Similarity.IvfIndex(
      DedupIngest.readOrEmpty(spark, s"$dir/assigned", AssignedSchema)
        .filter(committedPred(spark, dir, col("__batch")))
        .select(col("__vid").as(idCol), col("__cvec"), col("__cell")),
      readCentroids(spark, dir))
  }

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
        compactMarkers(batch.sparkSession, dir)
        compactEvery.foreach { every =>
          if ((batchId + 1) % every == 0)
            compactIvf(batch.sparkSession, dir, smallFileBytes)
        }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** Fold the assigned tail (size-tiered, manifest-logged — large
    * generations never rewritten; readers complete a crashed fold
    * before listing). */
  def compactIvf(spark: SparkSession, dir: String,
      smallFileBytes: Long = 32L << 20): Unit =
    withLedgerLock(spark, dir) {
      DedupIngest.foldCorpusTail(spark, s"$dir/assigned", smallFileBytes)
    }

  // ------------------------------------------------------------------
  // PQ
  // ------------------------------------------------------------------

  private val CodesSchema = StructType(Seq(
    StructField("__vid", LongType), StructField("__j", IntegerType),
    StructField("__code", IntegerType), StructField("__batch", LongType)))
  private val CodebookSchema = StructType(Seq(
    StructField("__j", IntegerType), StructField("__code", IntegerType),
    StructField("cvec", ArrayType(FloatType))))

  /** Pin the frozen PQ codebook the ingest encodes against — the PQ
    * analogue of [[bootstrapIvf]]: encoding is a pure function of
    * (vector, codebook), so appended code rows equal a rebuild's.
    * Re-bootstrapping with a DIFFERENT codebook after ingest began is a
    * re-encoding event (batch cadence), not a bootstrap. */
  def bootstrapPq(spark: SparkSession, dir: String,
      codebook: Seq[Seq[Seq[Float]]]): Unit = {
    require(codebook.nonEmpty && codebook.forall(_.nonEmpty),
      "need a non-empty m x codebookSize codebook")
    import spark.implicits._
    (for { j <- codebook.indices; c <- codebook(j).indices }
      yield (j, c, codebook(j)(c))).toDF("__j", "__code", "cvec")
      .select(col("__j").cast("int"), col("__code").cast("int"),
        col("cvec").cast(ArrayType(FloatType)))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/codebook")
  }

  private def readCodebook(spark: SparkSession,
      dir: String): Seq[Seq[Seq[Float]]] = {
    val rows = spark.read.schema(CodebookSchema).parquet(s"$dir/codebook")
      .orderBy("__j", "__code").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toSeq))
    rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3).toSeq)
  }

  /** Encode one micro-batch against the bootstrapped codebook and
    * append its code rows, under the same marker protocol as
    * [[ingestIvfBatch]] — the codes dir is self-contained (no derived
    * partials; encoding is per-row against the frozen codebook), so
    * the protocol is exactly the IVF `assigned` shape. Vector ids must
    * be long-castable. */
  def ingestPqBatch(batch: DataFrame, batchId: Long, dir: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Boolean =
      withLedgerLock(batch.sparkSession, dir) {
    val spark = batch.sparkSession
    require(batchId >= 0, s"batchId must be non-negative, got $batchId" +
      " (negative stamps are reserved for deletions/compaction)")
    if (hasMarker(spark, dir, batchId.toString) ||
      batchId <= batchWatermark(spark, dir)) return false
    if (hasMarker(spark, dir, s"$batchId.intent"))
      purgeBatch(spark, s"$dir/codes", CodesSchema, batchId)
    val tomb = tombstonedIds(spark, dir, batchId)
    val live = if (tomb.isEmpty) batch
      else batch.filter(!coalesce(
        col(idCol).cast("string").isInCollection(tomb), lit(false)))
    if (live.isEmpty) {
      // nothing to fold (empty or fully tombstoned) — still COMMIT so
      // replays are O(1) no-ops and no intent marker dangles
      putMarker(spark, dir, batchId.toString)
      dropMarker(spark, dir, s"$batchId.intent")
      return false
    }
    putMarker(spark, dir, s"$batchId.intent")
    val cb = readCodebook(spark, dir)
    val add = Similarity.buildPqIndex(live, cb.size, cb.head.size, idCol,
      vecCol, cb)
    try {
      add.codes.select(col(idCol).cast("long").as("__vid"),
          col("__j").cast("int"), col("__code").cast("int"),
          lit(batchId).as("__batch"))
        .write.mode("append").parquet(s"$dir/codes")
      putMarker(spark, dir, batchId.toString)
      dropMarker(spark, dir, s"$batchId.intent")
      true
    } finally graft.operators.Dedup.releasePersisted()
  }

  /** The served view: identical to [[Similarity.buildPqIndex]] over
    * every committed vector with the bootstrapped codebook (encoding is
    * pure, so increments ≡ rebuild). Uncommitted rows are filtered by
    * the ledger; a crashed compaction fold is completed before
    * listing. */
  def readPq(spark: SparkSession, dir: String,
      idCol: String = "vec_id"): Similarity.PqIndex = {
    DedupIngest.recoverFold(spark, s"$dir/codes")
    Similarity.PqIndex(
      DedupIngest.readOrEmpty(spark, s"$dir/codes", CodesSchema)
        .filter(committedPred(spark, dir, col("__batch")))
        .select(col("__vid").as(idCol), col("__j"), col("__code")),
      readCodebook(spark, dir))
  }

  /** Maintain the PQ codes dir from a streaming vector source. */
  def startPq(vecs: DataFrame, dir: String, checkpoint: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      availableNow: Boolean = false,
      compactEvery: Option[Int] = None,
      smallFileBytes: Long = 32L << 20): StreamingQuery = {
    require(compactEvery.forall(_ > 0), "compactEvery must be positive")
    val writer = vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestPqBatch(batch, batchId, dir, idCol, vecCol)
        compactMarkers(batch.sparkSession, dir)
        compactEvery.foreach { every =>
          if ((batchId + 1) % every == 0)
            compactPq(batch.sparkSession, dir, smallFileBytes)
        }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** Fold the codes tail (size-tiered, manifest-logged). Single-writer
    * cadence (object doc). */
  def compactPq(spark: SparkSession, dir: String,
      smallFileBytes: Long = 32L << 20): Unit =
    withLedgerLock(spark, dir) {
      DedupIngest.foldCorpusTail(spark, s"$dir/codes", smallFileBytes)
    }

  // ------------------------------------------------------------------
  // Mini-batch k-means (streamed model maintenance)
  // ------------------------------------------------------------------

  private val KmSeedSchema = StructType(Seq(
    StructField("__cl", IntegerType),
    StructField("__s", ArrayType(DoubleType))))
  /** `__h` is the VALIDITY HORIZON: a partial participates in the state
    * fold for `upTo` only when `__h < upTo`. Ingest partials carry
    * `__h = batchId` (same semantics as before); a DELETION's negative
    * partials carry the ledger's max seen batch at deletion time, so a
    * crashed batch REPLAYING later reconstructs exactly the state it
    * first assigned against (the deletion didn't exist then), while the
    * final served state (`upTo = ∞`) includes every committed
    * cancellation. */
  private val KmPartialSchema = StructType(Seq(
    StructField("__cl", IntegerType), StructField("__n", LongType),
    StructField("__s", ArrayType(DoubleType)),
    StructField("__batch", LongType), StructField("__h", LongType)))

  /** Pin the frozen seed state the mini-batch stream accumulates onto —
    * the k-means analogue of [[bootstrapIvf]]. Seeds are centroid-SUM
    * vectors on [[graft.operators.Clustering]]'s integer-quantized grid
    * (normally [[graft.operators.Clustering.seedSums]] of a reference
    * slice); the evolving state is always `seed + Σ committed batch
    * partials`, so an emptied cluster degrades to its seed exactly as
    * the batch trainer's empty-cluster policy. */
  def bootstrapKmeans(spark: SparkSession, dir: String,
      seeds: Seq[Seq[Double]]): Unit = {
    require(seeds.nonEmpty, "need at least one seed centroid")
    import spark.implicits._
    seeds.zipWithIndex.map { case (s, cl) => (cl, s) }.toDF("__cl", "__s")
      .select(col("__cl").cast("int"),
        col("__s").cast(ArrayType(DoubleType)))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/seeds")
  }

  /** Accumulated centroid-sum state from the seeds plus every COMMITTED
    * partial with `__batch < upTo` — the distributive fold (posexplode →
    * per-(cluster, dim) integer sum → k·dim bounded collect); all terms
    * are exact small-integer doubles, so the fold is order-free. */
  private def kmeansStateSums(spark: SparkSession, dir: String,
      upTo: Long): Seq[Seq[Double]] = {
    DedupIngest.recoverFold(spark, s"$dir/partials")
    val seeds = spark.read.schema(KmSeedSchema).parquet(s"$dir/seeds")
    // committed AND horizon-visible: ingest partials fold when their
    // batch id < upTo (coalesce covers pre-__h rows), deletion partials
    // when they were committed before batch `upTo` was first ingested
    val partials = DedupIngest
      .readOrEmpty(spark, s"$dir/partials", KmPartialSchema)
      .filter(committedPred(spark, dir, col("__batch")) &&
        coalesce(col("__h"), col("__batch")) < upTo)
      .select(col("__cl"), col("__s"))
    val folded = seeds.select(col("__cl"), col("__s"))
      .unionByName(partials)
      .select(col("__cl"), posexplode(col("__s")).as(Seq("__j", "__v")))
      .groupBy("__cl", "__j").agg(sum(col("__v")).as("__v"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
    folded.groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3).toSeq)
  }

  /**
   * Fold one micro-batch into the mini-batch k-means state under the
   * marker protocol: assign the batch against the state accumulated
   * from STRICTLY EARLIER committed batches (so a crashed batch replays
   * against exactly the state it first saw), append the per-cluster
   * integer partials, commit. Unlike the index families the ingest
   * order is SEMANTIC here — batch t's assignment depends on state
   * t−1 — so the single-writer contract (object doc) additionally
   * means monotone batch ids, which is what foreachBatch delivers.
   *
   * Replay after a deletion: a crashed (intent-only) batch replaying
   * once a committed [[deleteKmeansContribs]] has tombstoned some of
   * its doc ids drops those rows; if EVERY row is tombstoned the
   * replay is a successful no-op — it purges the batch's orphaned
   * partials, commits the marker (so later replays are O(1)), and
   * returns false. A batch whose COMMIT marker is lost is outside the
   * contract: its positives were already cancelled by any committed
   * deletion's negatives, so re-ingesting it would double-subtract —
   * commit markers are never deleted (single-writer contract).
   */
  def ingestKmeansBatch(batch: DataFrame, batchId: Long, dir: String,
      idCol: String = "vec_id", vecCol: String = "embedding"): Boolean =
      withLedgerLock(batch.sparkSession, dir) {
    val spark = batch.sparkSession
    require(batchId >= 0, s"batchId must be non-negative, got $batchId" +
      " (negative stamps are reserved for compaction)")
    if (hasMarker(spark, dir, batchId.toString) ||
      batchId <= batchWatermark(spark, dir)) return false
    if (hasMarker(spark, dir, s"$batchId.intent"))
      purgeBatch(spark, s"$dir/partials", KmPartialSchema, batchId)
    // a batch replaying AFTER a committed deletion must not resurrect
    // the forgotten docs' contributions (the index families' rule)
    val tomb = tombstonedIds(spark, dir, batchId)
    val live = if (tomb.isEmpty) batch
      else batch.filter(!coalesce(
        col(idCol).cast("string").isInCollection(tomb), lit(false)))
    if (live.isEmpty) {
      putMarker(spark, dir, batchId.toString)
      dropMarker(spark, dir, s"$batchId.intent")
      return false
    }
    putMarker(spark, dir, s"$batchId.intent")
    val state = kmeansStateSums(spark, dir, upTo = batchId)
    graft.operators.Clustering
      .miniBatchPartials(live, state, idCol, vecCol)
      .withColumn("__batch", lit(batchId))
      .withColumn("__h", lit(batchId))
      .coalesce(1).write.mode("append").parquet(s"$dir/partials")
    putMarker(spark, dir, batchId.toString)
    dropMarker(spark, dir, s"$batchId.intent")
    true
  }

  /** The served model: centroid-sum state over every committed batch —
    * feed straight into [[graft.operators.Clustering.assignClusters]].
    * Uncommitted/crashed partials are filtered by the ledger. */
  def readKmeansSums(spark: SparkSession, dir: String): Seq[Seq[Double]] =
    kmeansStateSums(spark, dir, upTo = Long.MaxValue)

  /** Maintain the mini-batch k-means state from a streaming vector
    * source. */
  def startKmeans(vecs: DataFrame, dir: String, checkpoint: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      availableNow: Boolean = false,
      compactEvery: Option[Int] = None,
      smallFileBytes: Long = 32L << 20): StreamingQuery = {
    require(compactEvery.forall(_ > 0), "compactEvery must be positive")
    val writer = vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestKmeansBatch(batch, batchId, dir, idCol, vecCol)
        compactMarkers(batch.sparkSession, dir)
        compactEvery.foreach { every =>
          if ((batchId + 1) % every == 0)
            compactKmeans(batch.sparkSession, dir, smallFileBytes)
        }
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  /** Fold the partials tail (size-tiered, manifest-logged). Single-
    * writer cadence (object doc). */
  def compactKmeans(spark: SparkSession, dir: String,
      smallFileBytes: Long = 32L << 20): Unit =
    withLedgerLock(spark, dir) {
      DedupIngest.foldCorpusTail(spark, s"$dir/partials", smallFileBytes)
    }

  private val KmSnapSchema = StructType(Seq(
    StructField("__vid", LongType),
    StructField("__v", ArrayType(FloatType)),
    StructField("__b", LongType)))

  /**
   * Right-to-be-forgotten for the streamed k-means state — completes
   * deletion across EVERY ledgered family: [[ingestKmeansBatch]]'s
   * integer partials otherwise retain deleted docs' contributions
   * forever. The [[deleteBm25Docs]] device adapted to a MODEL (the
   * state holds no per-doc rows, so the caller supplies the
   * to-be-forgotten vectors with the batch each was ingested in —
   * `docs = (idCol, vecCol, batchCol)`, e.g. straight from the
   * [[DedupIngest]] corpus store):
   *
   *  1. intent marker; stage the (id, vector, batch) snapshot to
   *     `deletes/<id>` (rename-into-place — replays reuse the frozen
   *     input even if the caller's frame changed);
   *  2. per affected batch `b`, RE-DERIVE each doc's original cluster
   *     assignment against the state AS OF ingest —
   *     `kmeansStateSums(upTo = b)`, exact because the `__h` horizon
   *     rule excludes every deletion committed after `b` was first
   *     ingested and assignment is a pure function of (vector, state);
   *  3. append the NEGATED integer partials under this deletion's
   *     stamp with `__h =` the ledger's max seen batch: integer sums
   *     make the cancellation exact, and the horizon keeps crashed
   *     batches' replays assigning against their original state;
   *  4. tombstone the ids (coverage horizon) so an uncommitted batch
   *     replaying later drops them, then commit.
   *
   * Docs whose batch never committed are skipped (no contribution to
   * cancel — the replaying batch's tombstone filter handles them), as
   * are ids already forgotten by a committed deletion (double-delete is
   * a no-op, not a double-subtraction). Deleting an id that was never
   * ingested with the claimed batch is a caller error the state cannot
   * detect — the contract is "these rows were in that batch", exactly
   * [[deleteBm25Docs]]' trust in its snapshot.
   *
   * SEMANTICS: the cancellation is exact at the SUM level; the served
   * state equals a rebuild-without-them whenever no surviving doc's
   * assignment flips once the deleted mass is gone (true for separated
   * clusters; the mini-batch analogue of the IVF centroid-drift caveat
   * — spec-checked on a separated corpus plus the crash matrix).
   * SINGLE-WRITER like every deletion (object doc); fresh
   * caller-managed `deleteId`.
   */
  def deleteKmeansContribs(spark: SparkSession, dir: String,
      docs: DataFrame, deleteId: Long,
      idCol: String = "vec_id", vecCol: String = "embedding",
      batchCol: String = "__batch"): Boolean = withLedgerLock(spark, dir) {
    require(deleteId >= 0, s"deleteId must be non-negative, got $deleteId")
    val m = s"del-$deleteId"
    val stamp = delStamp(deleteId)
    val stage = s"$dir/deletes/$deleteId"
    val (f, stagePath) = DedupIngest.fs(spark, stage)
    if (hasMarker(spark, dir, m)) {
      if (f.exists(stagePath)) f.delete(stagePath, true)
      dropMarker(spark, dir, s"$m.intent")
      return false
    }
    if (hasMarker(spark, dir, s"$m.intent")) {
      purgeBatch(spark, s"$dir/partials", KmPartialSchema, stamp)
      purgeWhere(spark, s"$dir/tombstones", TombSchema,
        col("__del") =!= deleteId)
    }
    putMarker(spark, dir, s"$m.intent")
    val tmpPath = new org.apache.hadoop.fs.Path(stage + ".tmp")
    if (!f.exists(stagePath)) {
      // promote a crashed-but-completed earlier stage write, else build
      // fresh: committed-batch rows only (uncommitted contributions have
      // no positives to cancel), minus ids a PRIOR committed deletion
      // already forgot (double-delete must not double-subtract)
      if (f.exists(tmpPath) && f.exists(
          new org.apache.hadoop.fs.Path(stage + ".tmp/_SUCCESS"))) {
        f.mkdirs(stagePath.getParent)
        DedupIngest.renameOrThrow(f, tmpPath, stagePath, "stage promote")
      } else {
        if (f.exists(tmpPath)) f.delete(tmpPath, true)
        val priorDels = markerNames(spark, dir)
          .filter(_.startsWith("del-")).flatMap(_.drop(4).toLongOption)
          .filter(_ != deleteId)
        val priorIds: Seq[String] =
          if (priorDels.isEmpty) Seq.empty
          else {
            DedupIngest.recoverSwap(spark, s"$dir/tombstones")
            DedupIngest.readOrEmpty(spark, s"$dir/tombstones", TombSchema)
              .filter(col("__del").isInCollection(priorDels))
              .select("__id").distinct().collect()
              .map(_.getString(0)).toSeq
          }
        val snap0 = docs.select(col(idCol).cast("long").as("__vid"),
            col(vecCol).cast(ArrayType(FloatType)).as("__v"),
            col(batchCol).cast("long").as("__b"))
          .filter(committedPred(spark, dir, col("__b"),
            ingestOnly = true))
        val snap = (if (priorIds.isEmpty) snap0
          else snap0.filter(
            !coalesce(col("__vid").cast("string")
              .isInCollection(priorIds), lit(false))))
          .distinct()
        snap.coalesce(1).write.parquet(tmpPath.toString)
        f.mkdirs(stagePath.getParent)
        DedupIngest.renameOrThrow(f, tmpPath, stagePath, "stage promote")
      }
    }
    val snap = spark.read.schema(KmSnapSchema).parquet(stage)
    val batches = snap.select("__b").distinct().collect()
      .map(_.getLong(0)).sorted.toSeq
    val horizon = maxSeenBatch(spark, dir)
    // one as-of state per affected batch (bounded: deletions are
    // takedown lists, not corpus scale), negatives derived with the
    // SAME assignment kernel the ingest used
    val negatives = batches.map { b =>
      val state = kmeansStateSums(spark, dir, upTo = b)
      graft.operators.Clustering.miniBatchPartials(
          snap.filter(col("__b") === b)
            .select(col("__vid").as(idCol), col("__v").as(vecCol)),
          state, idCol, vecCol)
        .select(col("__cl"), (-col("__n")).as("__n"),
          transform(col("__s"), x => -x).as("__s"))
    }
    negatives.reduceOption(_ unionByName _).foreach(_
      .select(col("__cl"), col("__n").cast("long"), col("__s"),
        lit(stamp).as("__batch"), lit(horizon).as("__h"))
      .coalesce(1).write.mode("append").parquet(s"$dir/partials"))
    snap.select(col("__vid").cast("string").as("__id")).distinct()
      .select(col("__id"), lit(horizon).as("__covered"),
        lit(deleteId).as("__del"))
      .coalesce(1).write.mode("append").parquet(s"$dir/tombstones")
    putMarker(spark, dir, m)
    dropMarker(spark, dir, s"$m.intent")
    f.delete(stagePath, true)
    true
  }

  /** Targeted PQ vector deletion — [[deleteIvfVecs]]' codes-dir twin:
    * tombstone append (coverage horizon), then a recoverable filtered
    * rewrite of the codes. Same single-writer contract and fresh
    * caller-managed `deleteId`. */
  def deletePqVecs(spark: SparkSession, dir: String, ids: Seq[Long],
      deleteId: Long): Boolean = withLedgerLock(spark, dir) {
    require(ids.nonEmpty, "need at least one vec id to delete")
    require(deleteId >= 0, s"deleteId must be non-negative, got $deleteId")
    val m = s"del-$deleteId"
    if (hasMarker(spark, dir, m)) {
      dropMarker(spark, dir, s"$m.intent")
      return false
    }
    if (hasMarker(spark, dir, s"$m.intent"))
      purgeWhere(spark, s"$dir/tombstones", TombSchema,
        col("__del") =!= deleteId)
    putMarker(spark, dir, s"$m.intent")
    val horizon = maxSeenBatch(spark, dir)
    import spark.implicits._
    ids.map(_.toString).toDF("__id")
      .select(col("__id"), lit(horizon).as("__covered"),
        lit(deleteId).as("__del"))
      .coalesce(1).write.mode("append").parquet(s"$dir/tombstones")
    purgeWhere(spark, s"$dir/codes", CodesSchema,
      !coalesce(col("__vid").isInCollection(ids), lit(false)))
    putMarker(spark, dir, m)
    dropMarker(spark, dir, s"$m.intent")
    true
  }
}
