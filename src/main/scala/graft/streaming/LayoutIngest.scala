package graft.streaming

import graft.operators.Layout
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streamed CLUSTERED ingest — the write path of the storage-layout
 * lever ([[graft.operators.Layout]]): a continuous feed lands as
 * z-order-clustered parquet so multi-dimensional scan pruning holds on
 * the LIVE table, not only after an offline rewrite. The same
 * LSM-shaped discipline every lakehouse OPTIMIZE/ZORDER implementation
 * converges on, under this engine's crash-exact marker protocol:
 *
 *  - The quantization GRID is a table property fixed at [[bootstrap]]
 *    (columns, per-column bounds, bits), persisted under `grid/` —
 *    per-batch min/max would give the same row different keys in
 *    different batches and make files incomparable; with a fixed grid
 *    every batch, every compaction, and a SQL oracle compute identical
 *    keys ([[Layout.withZOrderKeyFixed]]; out-of-bounds late data
 *    clamps to the edge cells — pruning degrades gracefully, never
 *    corrupts).
 *  - Each micro-batch keys its rows, range-partitions them on the key
 *    into `filesPerBatch` sorted files, writes them to a staging dir,
 *    and publishes with ONE atomic rename to `data/batch-<id>/`,
 *    followed by a commit marker. Crash matrix: mid-write → stage is
 *    garbage, replay deletes and rewrites; after rename before marker
 *    → the dir is complete by construction (the rename only follows a
 *    finished write), replay just re-stamps the marker; after marker →
 *    replay is a no-op. Batch dirs are the LSM L0: internally
 *    clustered, overlapping in key range across batches.
 *  - [[compact]] folds the small-dir tail into one `gen-<stamp>/`
 *    re-clustered across ALL folded rows (restoring non-overlapping
 *    per-file key ranges), via a WAL manifest in `markers/`: stage the
 *    gen dir, durably record (target, sources, COMMIT), rename stage
 *    into `data/`, delete sources, drop the manifest. Every step after
 *    the COMMIT trailer is idempotent; [[recoverCompact]] replays them.
 *    Large generations are never rewritten (the DedupIngest size-tier
 *    argument: bytes per cycle bounded by the small tail).
 *  - [[read]] is correct in EVERY crash state without writing: it lists
 *    the `data/` subdirs and drops a committed manifest's sources when
 *    its target dir exists — the rename is the publish point, so before
 *    it the sources are live, after it they are logically deleted even
 *    if the physical deletes haven't run yet.
 *  - TWO single-writer locks, so maintenance never stalls the stream
 *    ([[LedgerLock]]s — fail-fast for the maintenance holders, a
 *    BOUNDED WAIT on the tail acquires ([[LedgerLock.withLockWait]])
 *    so writers that legitimately interleave sleep through each
 *    other's short marker sections; same-host dead writers
 *    self-recover):
 *    the TAIL lock (`<dir>/markers/lock`) serializes the ingest path —
 *    batch publish, commit markers, the marker-watermark fold, schema
 *    publication — and the MAINTENANCE lock (`<dir>/maint/…`)
 *    serializes every unit REWRITER ([[compact]], [[deleteBox]], the
 *    rewrite half of [[mergeRows]]) plus [[recoverCompact]]. The split
 *    is safe because the tail only ever CREATES new units and markers,
 *    never mutates published ones, and readers are lock-free by the
 *    publish-point rule; the one cross-lock writer, [[mergeRows]],
 *    holds MAINTENANCE for its whole run (fail-fast at entry, before
 *    any mutation) and nests a SHORT tail section inside it for just
 *    the freshness guard + append — the only maint→tail nesting in
 *    the engine, and no path nests the other way, so no cycle; a live
 *    stream stalls only for that append, never for the merge's
 *    rewrites. Rewriters must still exclude EACH OTHER — two
 *    manifests naming one source with different targets would
 *    double-publish its rows. A deleteBox/compact concurrent with a
 *    live stream is serializable as happening BEFORE any batch
 *    published after its unit selection (a concurrent insert into the
 *    deleted box survives — the delete happened first).
 *
 * FILESYSTEM CONTRACT: the publish protocol assumes directory rename
 * is atomic and O(1) — true on HDFS, local filesystems, and
 * rename-consistent stores (ABFS, GCS); NOT true on plain S3A, where
 * "rename" is a non-atomic copy+delete and a reader can observe a
 * half-copied `data/batch-<id>/`. On such stores run the table over an
 * atomic-rename layer (S3A + a consistent committer/metastore, or an
 * HDFS/ABFS staging tier) — the marker ledger alone does not repair a
 * torn rename, because [[read]] deliberately treats dir EXISTENCE (not
 * the marker) as the publish point so that readers never need the
 * lock. Same scoping discipline as [[LedgerLock]]'s own S3A caveat.
 * The contract is executable: LayoutIngestSpec's torn-rename test
 * drives both states — the atomic-rename crash (stage-only, readers
 * unaffected, replay discards) and the torn half-copied dir (reads
 * fail LOUDLY on the parquet footer — never a silent wrong answer).
 *
 * 100 TB: nothing here is driver-bound — batches shuffle once on the
 * key (the range partition), compaction reads only the small tail, and
 * the table serves statistics-pruned scans the whole time (the
 * LayoutProbe numbers: a thin slice materializes 1/64 of a clustered
 * table vs all of a time-ordered one).
 */
object LayoutIngest extends org.apache.spark.internal.Logging {

  /** The persisted cluster key column. */
  /** [[start]]'s ledger-id regime — a dedicated type rather than a
    * Boolean so the two regimes can never be swapped by a positional
    * argument (the epoch-keyed opt-in flips a writer into an
    * EXCLUSIVE ledger; see the regime section on [[start]]). */
  sealed abstract class IdRegime
  /** Txn-minted ledger ids — the safe, multi-writer default. */
  case object TxnMintedIds extends IdRegime
  /** Epoch-keyed ids — content-addressed replays, single-writer
    * EXCLUSIVE opt-in. */
  case object EpochKeyedIds extends IdRegime

  val KeyCol = "zkey"

  /** [[mergeRows]]'s freshness guard fired: the requested batch id is
    * already committed in (or reserved against) the ledger. TYPED so
    * advisory-id callers ([[nextUnusedId]] mint-then-merge, the SQL
    * MERGE command) can distinguish "lost the id race — re-mint and
    * retry" from genuine contract violations. */
  final class StaleBatchIdException(msg: String)
    extends IllegalArgumentException(msg)

  /** [[mergeRows]]' `classifiedAt` guard fired: the table committed a
    * write between the caller's read of the ledger (its matched /
    * unmatched classification of source rows — the conditional SQL
    * MERGE's key-membership split) and the merge's claim of its id.
    * TYPED and DISTINCT from [[StaleBatchIdException]]: re-minting the
    * id is not enough — the caller must REDO the classification read
    * against the new table state and retry the whole statement
    * ([[graft.sql.GraftMergeCommand]]'s loop). */
  final class StaleClassificationException(msg: String)
    extends IllegalStateException(msg)

  /** The MAINTENANCE lock (object doc): serializes the unit rewriters
    * against each other while the TAIL lock keeps ingesting. Scoped
    * under `<dir>/maint` so the two locks are distinct files of the
    * same [[LedgerLock]] machinery. */
  private def withMaintLock[T](spark: SparkSession, dir: String)
      (body: => T): T =
    LedgerLock.withLock(spark, s"$dir/maint")(body)

  /** The persisted INGEST PROVENANCE column: every row carries the id
    * of the micro-batch that ingested it, stamped at [[ingestBatch]]
    * and immutable from then on — compaction folds and delete rewrites
    * copy it untouched. Two reads fall out of one column plus the
    * existing statistics machinery ([[readSince]]/[[readAsOf]]): the
    * per-unit sidecars carry the column's min/max like any other, so
    * an L0 unit spans exactly its own id and a folded generation spans
    * the ids it swallowed — a CDC consumer asking "everything after
    * batch b" skips whole generations of old history at the FILE
    * level before the reader opens anything. [[read]] hides the
    * column (the current-state read is provenance-free); the
    * provenance reads return it so consumers can checkpoint
    * `max(__batch)`. */
  val BatchCol = "__batch"

  /** `curve`: "zorder" (any dims) or "hilbert" (≥2 dims, the Skilling
    * N-dim form — tighter locality at the same grid; the LayoutProbe
    * numbers). A table property like the rest of the grid: every
    * writer keys with the same curve forever.
    *
    * `bloomCols`: long- or string-typed columns to carry a per-unit
    * Bloom-filter sidecar for POINT lookups ([[scanPoints]] /
    * [[scanPointsStr]]) — the clustered columns' min/max stats
    * prune boxes, but an equality probe on a NON-clustered column
    * (e.g. `event_id = k` on a (user_id, ts)-clustered table) finds
    * every unit's range intersecting. A bloom answers "this unit
    * cannot contain k" with no false negatives, so [[scanPoints]]
    * prunes exactly like a box scan does; false positives only add
    * units to read — the residual filter keeps results exact. Costs
    * one extra pass over each freshly-staged unit per column at
    * publish time (the lakehouse bloom-index trade). */
  final case class Grid(cols: Seq[String], bounds: Seq[(Long, Long)],
      bits: Int, curve: String = "zorder", bloomCols: Seq[String] = Nil)

  /** Create the table: persist the grid (the fixed quantization
    * contract every future writer shares). Fails if the dir already
    * holds a grid — re-gridding an existing table is a rewrite, not a
    * bootstrap. */
  def bootstrap(spark: SparkSession, dir: String, grid: Grid): Unit = {
    require(grid.cols.nonEmpty && grid.cols.size == grid.bounds.size,
      "bootstrap: cols and bounds must align")
    require(Set("zorder", "hilbert")(grid.curve),
      s"bootstrap: unknown curve '${grid.curve}'")
    require(grid.curve != "hilbert" || grid.cols.size >= 2,
      "bootstrap: the hilbert curve needs >= 2 dims")
    val (f, p) = DedupIngest.fs(spark, s"$dir/grid")
    require(!f.exists(p), s"LayoutIngest.bootstrap: $dir already has a grid")
    import spark.implicits._
    Seq((grid.cols, grid.bounds.map(_._1), grid.bounds.map(_._2),
        grid.bits, grid.curve, grid.bloomCols))
      .toDF("cols", "mns", "mxs", "bits", "curve", "bloomCols")
      .coalesce(1).write.parquet(s"$dir/grid")
    f.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/data"))
    f.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/markers"))
  }

  /** The grid is immutable after [[bootstrap]] (regrid = new dir), so
    * one parquet read per table path serves every later batch, fold
    * and delete — a long-lived stream otherwise pays a driver job per
    * micro-batch for a constant. Same invalidation contract as the
    * stats cache ([[clearStatsCache]] — drop + re-bootstrap at the
    * SAME path). */
  private val MaxGridCache = 4096
  private val gridCache = new java.util.LinkedHashMap[String, Grid](
      16, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[String, Grid]): Boolean =
      size() > MaxGridCache
  }

  def readGrid(spark: SparkSession, dir: String): Grid = {
    gridCache.synchronized {
      val hit = gridCache.get(dir)
      if (hit != null) return hit
    }
    val g = readGridUncached(spark, dir)
    gridCache.synchronized(gridCache.put(dir, g)): Unit
    g
  }

  private def readGridUncached(spark: SparkSession, dir: String): Grid = {
    val df = spark.read.parquet(s"$dir/grid")
    val r = df.head()
    Grid(r.getSeq[String](0),
      r.getSeq[Long](1).zip(r.getSeq[Long](2)),
      r.getInt(3),
      // tables written before the curve column are z-order by contract
      if (df.schema.fieldNames.contains("curve"))
        r.getString(df.schema.fieldIndex("curve"))
      else "zorder",
      // and before the bloomCols column, bloom-free
      if (df.schema.fieldNames.contains("bloomCols"))
        r.getSeq[String](df.schema.fieldIndex("bloomCols"))
      else Nil)
  }

  /** The grid's key expression over a batch — the ONE place the curve
    * choice lives. */
  private def keyed(batch: DataFrame, grid: Grid): DataFrame =
    grid.curve match {
      case "hilbert" => Layout.withHilbertKeyNFixed(batch,
        grid.cols.map(col), grid.bounds, grid.bits, KeyCol)
      case _ => Layout.withZOrderKeyFixed(batch,
        grid.cols.map(col), grid.bounds, grid.bits, KeyCol)
    }

  /**
   * Continuous clustered ingest: every micro-batch lands as one
   * published batch dir (see the object doc's crash matrix).
   * `compactEvery = Some(n)` folds the small tail after every n
   * batches — the cadence runs AFTER the locked ingest body (the lock
   * is not reentrant). RESTART AFTER A DRIVER CRASH: the
   * [[DedupIngest.start]] contract — same-host restarts self-recover
   * via the dead-pid lock break; cross-host failover sets
   * [[LedgerLock.LockStaleMsKey]].
   *
   * TWO LEDGER-ID REGIMES, chosen by `ids` (a dedicated [[IdRegime]]
   * type, NOT a Boolean: the r17 rename inverted the old `txnIds`
   * flag's sense, and a positional `true` from an external caller
   * compiled under the old signature would have silently flipped a
   * writer into the exclusive epoch-keyed regime — the exact
   * silent-row-drop hazard the default flip retired; same option
   * names and default as the format-level sink, `writeStream.format(
   * "graft-layout")` `.option("epochIds", ...)`):
   *
   *  - [[TxnMintedIds]] (default): each (queryId, epoch) RESERVES
   *    the next unused ledger id under the tail lock, bound durably by
   *    a `txn-e<epoch>-i<id>-<qid>` marker ([[streamLedgerId]]) — the
   *    idempotent-sink pattern. Batch appends ([[appendNext]],
   *    `df.write`/`INSERT INTO`), [[mergeRows]] and other streams
   *    interleave freely on one table and nothing is ever dropped;
   *    in-flight-epoch replays are exact via the reservation.
   *    The price: a replay from a FRESH checkpoint re-ingests (ids are
   *    allocation order, not content) — at-least-once across
   *    checkpoint RESETS, exactly-once across restarts of the same
   *    checkpoint.
   *  - [[EpochKeyedIds]]: ledger id = the checkpoint's micro-batch
   *    epoch. With a deterministic source this makes ids
   *    CONTENT-ADDRESSED: a replay from a fresh checkpoint re-offers
   *    the same rows under the same ids and every ingest is a marker
   *    no-op — re-running a whole pipeline is idempotent end to end.
   *    The price is an EXCLUSIVE ledger: nothing else may mint ids
   *    while such a stream is attached — a batch append or a merge
   *    would take the stream's next epoch id and turn that future
   *    batch into a silent row-dropping no-op. Opt in ONLY for a
   *    single-writer table fed by one deterministic pipeline.
   *
   *  Pre-flip tables written by the old epoch-keyed default: quiesce
   *  and keep using `ids = EpochKeyedIds`, or restart from a fresh
   *  checkpoint on a fresh table — the reservation ledger is the
   *  compatibility boundary.
   */
  def start(df: DataFrame, dir: String, checkpoint: String,
      filesPerBatch: Int = 4,
      availableNow: Boolean = false,
      compactEvery: Option[Int] = None,
      smallFileBytes: Long = 32L << 20,
      lockWaitMs: Long = 30000L,
      ids: IdRegime = TxnMintedIds): StreamingQuery = {
    require(filesPerBatch >= 1, "filesPerBatch must be >= 1")
    require(compactEvery.forall(_ > 0), "compactEvery must be positive")
    val writer = df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        microBatchIngest(batch, batchId, dir, checkpoint, filesPerBatch,
          compactEvery, smallFileBytes, lockWaitMs,
          txnIds = ids == TxnMintedIds)
      }
    (if (availableNow)
      writer.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    else writer).start()
  }

  /** ONE micro-batch's whole sink body — the shared engine behind
    * [[start]]'s foreachBatch AND the format-level streaming sink
    * ([[LayoutStreamSink]], `df.writeStream.format("graft-layout")`):
    * resolve the ledger id for this epoch (txn reservation or the
    * epoch itself — [[start]] documents the two regimes), ingest under
    * the tail lock, fold the marker ledger, and run the best-effort
    * compaction cadence. */
  private[streaming] def microBatchIngest(batch: DataFrame, epoch: Long,
      dir: String, checkpoint: String, filesPerBatch: Int,
      compactEvery: Option[Int], smallFileBytes: Long,
      lockWaitMs: Long, txnIds: Boolean): Unit = {
    val spark = batch.sparkSession
    // bounded wait, not fail-fast: a mergeRows append section or a
    // batch appendNext holding the tail for tens of ms must not
    // fail the streaming query — only a holder outliving the
    // budget (a stuck or duplicate writer) does. The STREAM default
    // stale lease ([[LedgerLock.StreamLockStaleMsDefault]]) makes a
    // CROSS-HOST failover self-recover: a tail holder ten minutes old
    // under a live stream is a dead foreign writer (sections are tens
    // of ms) — retired automatically where the same-host dead-pid
    // break cannot reach; LockStaleMsKey overrides when set.
    LedgerLock.withLockWait(spark, dir, lockWaitMs,
      LedgerLock.StreamLockStaleMsDefault) {
      val ledgerId =
        if (txnIds)
          streamLedgerId(spark, dir,
            checkpointQueryId(spark, checkpoint), epoch)
        else epoch
      ingestBatch(batch, ledgerId, dir, filesPerBatch): Unit
      // keep the marker dir at one watermark + the in-flight tail
      compactMarkersLocked(spark, dir)
    }
    compactEvery.foreach { n =>
      if ((epoch + 1) % n == 0)
        // the cadence is best-effort: a concurrently-running manual
        // fold/delete (maintenance lock held) must not kill the
        // STREAM — the fold happens on the next cadence instead
        try compact(spark, dir, smallFileBytes)
        catch {
          case e: LedgerLock.ConcurrentWriterException =>
            logWarning("LayoutIngest: compaction cadence skipped — " +
              s"maintenance lock contention on $dir (${e.getMessage})")
        }
    }
  }

  /** One batch's ingest under the caller-held lock; false = replay of
    * an already-committed batch (no-op). */
  private[graft] def ingestBatch(batch: DataFrame, batchId: Long,
      dir: String, filesPerBatch: Int): Boolean = {
    val spark = batch.sparkSession
    refuseReplicaWrite(spark, dir, "ingestBatch")
    val (f, markers) = DedupIngest.fs(spark, s"$dir/markers")
    // NO recoverCompact here, by design: the ingest path never touches
    // gen manifests — recovery is the MAINTENANCE lock's job (compact/
    // deleteBox/mergeRows all run it), which is what lets a fold run
    // concurrently with the stream (see the lock-split section of the
    // object doc). Reads are crash-correct without recovery (liveDirs'
    // publish-point rule), so deferring it costs only debris lifetime.
    val marker = new org.apache.hadoop.fs.Path(markers, s"batch-$batchId")
    if (batchId <= batchWatermark(f, markers) || f.exists(marker))
      return false
    val target = new org.apache.hadoop.fs.Path(s"$dir/data/batch-$batchId")
    if (!f.exists(target)) {
      // crash-leftover stage from a previous attempt is garbage
      val stage = new org.apache.hadoop.fs.Path(
        s"$dir/data.stage-$batchId")
      if (f.exists(stage)) f.delete(stage, true)
      val grid = readGrid(spark, dir)
      require(!batch.columns.contains(BatchCol),
        s"ingestBatch: input already carries $BatchCol (reserved — " +
          "provenance is stamped here, not by the caller)")
      require(!batch.columns.contains(KeyCol),
        s"ingestBatch: input already carries $KeyCol (reserved — " +
          "the cluster key is computed here; keyed() would silently " +
          "overwrite the caller's column)")
      val toWrite = keyed(batch, grid).withColumn(BatchCol, lit(batchId))
      toWrite
        .repartitionByRange(filesPerBatch, col(KeyCol))
        .sortWithinPartitions(KeyCol)
        .write.mode("overwrite").parquet(stage.toString)
      // an EMPTY micro-batch publishes no data dir (streams emit them
      // routinely): the marker alone records the commit, replays stay
      // no-ops, and no zero-row unit accumulates in the listing (the
      // footer count is one metadata read of the just-written stage)
      if (footerRowCount(f, stage) == 0L) {
        f.delete(stage, true)
        f.create(marker, true).close()
        return true
      }
      writeUnitStats(f, stage, grid.cols :+ KeyCol :+ BatchCol,
        grid.bloomCols)
      writeUnitBlooms(spark, f, stage, grid.bloomCols)
      // schema BEFORE data: the stored union is always a superset of
      // every published file (additive evolution, see tableSchema)
      publishSchema(spark, dir, toWrite.schema)
      if (!f.rename(stage, target))
        throw new IllegalStateException(
          s"LayoutIngest: publish rename failed for batch $batchId")
    }
    // target existing without a marker = crash between rename and
    // marker; the dir is complete by construction — just re-stamp
    f.create(marker, true).close()
    true
  }

  /** A PRUNABLE UNIT of the table — a flat dir of key-sorted parquet
    * files: an L0 batch dir, a single-dir generation, or one `range-k`
    * subdir of a RANGE-SPLIT generation. Named relative to `data/`
    * (`batch-3`, `gen-ab12cd34/range-2`); manifests, logical deletion,
    * footer pruning, deletes, and reads all operate on units. */
  private def leafUnits(f: org.apache.hadoop.fs.FileSystem,
      data: org.apache.hadoop.fs.Path)
      : Seq[(String, org.apache.hadoop.fs.Path)] =
    f.listStatus(data).toSeq.filter(_.isDirectory).flatMap { top =>
      val subs = f.listStatus(top.getPath).toSeq.filter(s =>
        s.isDirectory && s.getPath.getName.startsWith("range-"))
      if (subs.isEmpty) Seq(top.getPath.getName -> top.getPath)
      else subs.map(s =>
        s"${top.getPath.getName}/${s.getPath.getName}" -> s.getPath)
    }

  /** Stamp commit markers for PUBLISHED-BUT-UNMARKED L0 batch dirs (a
    * crash between the publish rename and the marker create). Must be
    * called with the MAINTENANCE lock held, BEFORE
    * [[compact]]/[[deleteBox]] select units: both pick units by
    * listing `data/`, so without this an orphan `batch-<id>` dir could
    * be folded into a generation (or rewritten) first, and the
    * stream's later replay of that id — finding neither marker nor
    * target dir — would re-ingest it, duplicating every row (and,
    * after a deleteBox, resurrecting deleted ones). Stamping is safe
    * by the same argument [[ingestBatch]]'s own recovery path uses: a
    * published dir is complete by construction (the rename is the last
    * data step), so the marker only formalizes a commit the replay
    * would have re-stamped anyway; with the marker in place that
    * replay becomes a no-op. Under the LOCK SPLIT a dir-without-marker
    * here may also be a LIVE tail writer between its rename and marker
    * create (not only a crashed one) — adoption is still safe: it
    * stamps exactly the marker that writer is about to create itself
    * (an idempotent overwrite-create; the writer's return value and
    * replay contract are unchanged). */
  private def adoptOrphanBatches(spark: SparkSession, dir: String): Unit = {
    val (f, data) = DedupIngest.fs(spark, s"$dir/data")
    if (!f.exists(data)) return
    val (_, markers) = DedupIngest.fs(spark, s"$dir/markers")
    val w = batchWatermark(f, markers)
    f.listStatus(data).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.matches("batch-\\d+"))
      .map(_.stripPrefix("batch-").toLong)
      .filter(_ > w)
      .foreach { id =>
        val m = new org.apache.hadoop.fs.Path(markers, s"batch-$id")
        if (!f.exists(m)) {
          // rare post-crash healing — worth an audit trace: operators
          // should see that a publish-rename/marker crash window was
          // adopted, not silently absorbed
          logWarning(s"LayoutIngest: adopting orphan batch-$id under " +
            s"$dir (published dir without a commit marker — a writer " +
            "crashed between the publish rename and the marker create); " +
            "stamping its marker now")
          f.create(m, true).close()
        }
      }
  }

  /** Fold the small prunable units into one re-clustered generation —
    * WAL-manifested (object doc); no-op under two small units. A fold
    * producing more than one output file publishes as a RANGE-SPLIT
    * generation: each file lands in its own `range-k/` subdir (the
    * files are range-disjoint by construction), so FILE-LEVEL pruning
    * ([[scanBox]]/[[deleteBox]]'s unit selection) applies within the
    * generation — at scale a fold spans many dirs' worth of data, and
    * one monolithic dir would force every box to open all of it. The
    * split happens INSIDE the stage, so the publish is still one
    * atomic rename. `targetFileBytes` sizes the outputs (0 → 8×
    * `smallFileBytes`, the graduate-and-never-refold tier ladder). */
  def compact(spark: SparkSession, dir: String,
      smallFileBytes: Long = 32L << 20,
      targetFileBytes: Long = 0L): Unit =
    withMaintLock(spark, dir) {
      recoverCompact(spark, dir)
      adoptOrphanBatches(spark, dir)
      val (f, data) = DedupIngest.fs(spark, s"$dir/data")
      val smalls =
        if (!f.exists(data)) Nil
        else leafUnits(f, data)
          .filter { case (_, p) => dirBytes(f, p) < smallFileBytes }
      if (smalls.size >= 2) {
        val stamp = java.util.UUID.randomUUID().toString.take(8)
        val stage = new org.apache.hadoop.fs.Path(s"$dir/gen-$stamp.stage")
        val target = if (targetFileBytes > 0) targetFileBytes
          else 8L * smallFileBytes
        val parts = math.min(4096, math.max(1, math.ceil(
          smalls.map(p => dirBytes(f, p._2)).sum.toDouble /
            target.toDouble).toInt))
        // the key is PERSISTED, so re-clustering is a pure range
        // repartition on it — no re-quantization pass; the stored
        // schema unifies units written before a payload column
        readUnits(spark, dir, smalls.map(_._2))
          .repartitionByRange(parts, col(KeyCol))
          .sortWithinPartitions(KeyCol)
          .write.mode("overwrite").parquet(stage.toString)
        // range-split: one subdir per output file, inside the stage
        val partFiles = f.listStatus(stage).toSeq.filter(s =>
          s.isFile && isDataFile(s.getPath.getName))
          .sortBy(_.getPath.getName)
        val gridNow = readGrid(spark, dir)
        val statCols = gridNow.cols :+ KeyCol :+ BatchCol
        if (partFiles.size > 1) {
          partFiles.zipWithIndex.foreach { case (pf, k) =>
            val sub = new org.apache.hadoop.fs.Path(stage, s"range-$k")
            f.mkdirs(sub)
            // a false here (Hadoop reports most failures via false,
            // not exceptions) would strand the file at the gen's top
            // level where leafUnits assigns it to NO unit — its rows
            // would silently vanish once the manifest commits
            if (!f.rename(pf.getPath,
                new org.apache.hadoop.fs.Path(sub, pf.getPath.getName)))
              throw new IllegalStateException(
                s"compact: range-split rename failed for ${pf.getPath}")
          }
          (0 until partFiles.size).foreach { k =>
            val sub = new org.apache.hadoop.fs.Path(stage, s"range-$k")
            writeUnitStats(f, sub, statCols, gridNow.bloomCols)
            writeUnitBlooms(spark, f, sub, gridNow.bloomCols)
          }
        } else {
          writeUnitStats(f, stage, statCols, gridNow.bloomCols)
          writeUnitBlooms(spark, f, stage, gridNow.bloomCols)
        }
        val man = manifestPath(spark, dir, stamp)
        val out = f.create(man, true)
        try out.write((smalls.map(s => s"S\t${s._1}") ++
            Seq(s"T\tgen-$stamp", "COMMIT"))
          .mkString("\n").getBytes("UTF-8"))
        finally out.close()
        recoverCompact(spark, dir) // the happy path IS the replay
      }
      // NO marker fold here: the batch-marker watermark is TAIL-lock
      // state (the ingest cadence folds it every batch; batch-mode
      // tables call compactMarkers()) — folding it from under the
      // maintenance lock would put two concurrent folds on one ledger
    }

  /** "All batch ids ≤ n are committed" — the highest published
    * `batch-upto-<n>` watermark, -1 when none. An id is committed iff
    * it is ≤ the watermark OR its individual marker exists. */
  private def batchWatermark(f: org.apache.hadoop.fs.FileSystem,
      markers: org.apache.hadoop.fs.Path): Long =
    if (!f.exists(markers)) -1L
    else f.listStatus(markers).toSeq.map(_.getPath.getName)
      .filter(_.matches("batch-upto-\\d+"))
      .map(_.stripPrefix("batch-upto-").toLong)
      .foldLeft(-1L)(math.max)

  /** Fold the contiguous committed prefix of the L0 batch markers into
    * ONE `batch-upto-<n>` watermark file. WHY: every ingest and
    * recovery lists `markers/`, and a long-lived stream mints one
    * marker per micro-batch forever — at 100 TB (millions of batches)
    * each listing walks millions of entries, a quadratic over the
    * stream's lifetime (the q141 cost shape, on metadata instead of
    * data). The fold keeps the dir at one watermark + the in-flight
    * tail. Crash-exact and idempotent with NO ordering hazard: the
    * watermark is an atomic empty-file create whose NAME carries the
    * state (monotone — readers take the max), the folded markers and
    * superseded watermarks are deleted after, and a crash between any
    * two steps leaves a state this fold or any replay converges from.
    * Ids above a gap (a concurrent writer's in-flight batch) keep
    * their individual markers until the gap commits. */
  def compactMarkers(spark: SparkSession, dir: String): Unit =
    LedgerLock.withLock(spark, dir)(compactMarkersLocked(spark, dir))

  /** What [[vacuum]] swept, for operations logging/asserts.
    * `manifestsReplayed` counts manifests RESOLVED by the recovery
    * pass — committed ones replayed to completion plus uncommitted
    * (crash-mid-write) ones discarded with their stages;
    * `genStagesDropped` is the WAL-less stage orphans beyond those. */
  final case class VacuumStats(manifestsReplayed: Int,
      genStagesDropped: Int, ingestStagesDropped: Int,
      emptyUnitsDropped: Int, dmlMarkersFolded: Int = 0)

  /** The retention/VACUUM op — one call that physically clears every
    * debris class the crash-exact protocol can leave behind, none of
    * which affects CORRECTNESS (reads are exact in every crash state;
    * this is about storage and listing hygiene on a long-lived table):
    *
    *  1. committed-but-unfinished compaction/delete/merge manifests
    *     (replayed to completion) and WAL-less `gen-*.stage` orphans —
    *     [[recoverCompact]], which inline maintenance already runs;
    *     vacuum exists so an operator can run it WITHOUT also folding
    *     or deleting anything;
    *  2. dead `data.stage-<id>` ingest stages: a stage is only ever
    *     written under the TAIL lock, so under a short nested tail
    *     section any existing one belongs to a crashed writer — swept.
    *     Safe even if that id IS later replayed (a txn-regime restart
    *     with a surviving (queryId, epoch) reservation resolves to the
    *     same id and re-runs [[ingestBatch]]): the replay deletes and
    *     rewrites its stage itself, so sweeping it early only does the
    *     replay's first step for it; only a fresh-checkpoint restart
    *     never revisits the id at all;
    *  3. ZERO-ROW live units (a [[deleteBox]]/[[mergeRows]] rewrite
    *     that emptied a whole unit publishes an empty dir — trivially
    *     pruned by every read, but it costs a listing + sidecar stat
    *     probe per scan forever): dropped WITHOUT a WAL manifest,
    *     which is safe precisely because the unit holds no rows — any
    *     crash mid-drop leaves a subset of its zero rows, i.e. still
    *     zero; a range-split generation whose last leaf drops loses
    *     its empty parent shell too;
    *  4. the marker ledger fold ([[compactMarkersLocked]], inside the
    *     same tail section);
    *  5. the DML marker fold ([[foldDmlMarkers]]): the permanent
    *     `del-*`/`upd-*`/`sdml-*`/`mrg-*` statement records — and the
    *     `merge-<id>` commit markers of the folded merges —
    *     consolidate into one `dml-log` file: facts kept exactly,
    *     every per-statement listing entry bounded (the replay
    *     snapshots `mrg-<id>.updates` stay until
    *     [[dropMergeSnapshots]] retention).
    *
    * Holds the MAINTENANCE lock throughout (vacuum is a rewriter-class
    * op: manifests name sources, and two recoverers must not race)
    * with the one short maint→tail nesting the engine already uses
    * ([[mergeRows]]' order — no cycle). Concurrent readers stay
    * correct by the same argument as compaction's source deletes: the
    * transient FAILED_READ_FILE on a just-dropped (empty) unit is the
    * documented file-listing-read contract, never a wrong answer.
    * Retired txn reservations are NOT swept (one per stream is the
    * documented O(#streams) floor — the newest reservation of a live
    * stream is load-bearing state). `del-<id>` / `upd-<id>` / `sdml-*`
    * markers are each statement's PERMANENT idempotence + replay
    * record — their FACTS are never dropped, but the files fold into
    * one `dml-log` ([[foldDmlMarkers]], class 5) so the marker listing
    * stays bounded at any DML cadence. */
  def vacuum(spark: SparkSession, dir: String,
      lockWaitMs: Long = 30000L): VacuumStats = {
    // owed chunked-merge buckets FIRST, outside the maintenance hold
    // (each sub-merge takes its own locks; LedgerLock is not
    // reentrant) — dead-owner plans only, the crash-recovery path
    val resumed = resumeChunkedMerges(spark, dir)
    if (resumed > 0)
      logWarning(s"LayoutIngest.vacuum: completed $resumed owed " +
        s"chunked-merge bucket(s) on $dir (crashed writer's plan)")
    withMaintLock(spark, dir) {
      val (f, markers) = DedupIngest.fs(spark, s"$dir/markers")
      val (_, root) = DedupIngest.fs(spark, dir)
      def manifests: Int =
        if (!f.exists(markers)) 0
        else f.listStatus(markers).toSeq
          .count(_.getPath.getName.matches("compact-.*\\.manifest"))
      // WAL-less orphan stages counted DIRECTLY (a stage with no
      // manifest — recoverCompact discards exactly these), not
      // inferred from before/after listing deltas: a committed
      // manifest whose stage was already consumed would skew a delta
      val orphanStages =
        if (!f.exists(root)) 0
        else f.listStatus(root).toSeq
          .map(_.getPath.getName)
          .filter(_.matches("gen-.*\\.stage"))
          .count(n => !f.exists(manifestPath(spark, dir,
            n.stripPrefix("gen-").stripSuffix(".stage"))))
      val m0 = manifests
      recoverCompact(spark, dir)
      adoptOrphanBatches(spark, dir)
      val m1 = manifests
      val dmlFolded = foldDmlMarkers(spark, dir)

      // zero-row live units (class 3). liveDirs, not a raw listing:
      // recoverCompact just ran under this lock, so no committed
      // manifest still names a source — every listed dir is live.
      var emptied = 0
      liveDirs(spark, dir).foreach { d =>
        if (unitRows(f, d) == 0L) {
          logWarning(s"LayoutIngest.vacuum: dropping zero-row unit " +
            s"$d under $dir")
          f.delete(d, true)
          emptied += 1
          val parent = d.getParent
          if (parent.getName.startsWith("gen-") && f.exists(parent) &&
              f.listStatus(parent).forall(st =>
                st.isFile && !isDataFile(st.getPath.getName)))
            f.delete(parent, true): Unit
        }
      }

      // dead ingest stages + marker fold (classes 2 and 4), under the
      // short nested tail section
      var stages = 0
      LedgerLock.withLockWait(spark, dir, lockWaitMs) {
        if (f.exists(root))
          f.listStatus(root).toSeq
            .filter(_.getPath.getName.matches("data\\.stage-\\d+"))
            .foreach { s =>
              logWarning(s"LayoutIngest.vacuum: dropping dead ingest " +
                s"stage ${s.getPath} under $dir")
              f.delete(s.getPath, true)
              stages += 1
            }
        compactMarkersLocked(spark, dir)
      }
      VacuumStats(manifestsReplayed = m0 - m1,
        genStagesDropped = orphanStages,
        ingestStagesDropped = stages, emptyUnitsDropped = emptied,
        dmlMarkersFolded = dmlFolded)
    }
  }

  private def compactMarkersLocked(spark: SparkSession,
      dir: String): Unit = {
    val (f, markers) = DedupIngest.fs(spark, s"$dir/markers")
    if (!f.exists(markers)) return
    val names = f.listStatus(markers).toSeq.map(_.getPath.getName)
    // shared fold core (MarkerLedger); this family's commit markers
    // are named batch-<id> and leave no per-id debris
    MarkerLedger.fold(f, markers, names,
      commitIds = names.filter(_.matches("batch-\\d+"))
        .map(_.stripPrefix("batch-").toLong).toSet,
      commitName = i => s"batch-$i")
    // txn reservations: keep only each query's LATEST (highest-epoch)
    // reservation. Older epochs are checkpoint-committed — Spark
    // replays only the newest uncommitted epoch, so an older
    // reservation can never be asked for again, and its id stays
    // claimed through its batch marker/watermark/data dir. One marker
    // per (live or dead) stream remains — O(#streams), not O(epochs).
    val txns = names.collect { case n @ TxnMarker(e, _, q) => (q, e, n) }
    txns.groupBy(_._1).valuesIterator.foreach { g =>
      val newest = g.maxBy(_._2)._3
      g.iterator.filter(_._3 != newest).foreach { case (_, _, n) =>
        f.delete(new org.apache.hadoop.fs.Path(markers, n), false): Unit
      }
    }
  }

  /** A parquet data file (not `_SUCCESS`/hidden). */
  private def isDataFile(name: String): Boolean =
    !name.startsWith("_") && !name.startsWith(".") &&
      name.endsWith(".parquet")

  private def manifestPath(spark: SparkSession, dir: String,
      stamp: String): org.apache.hadoop.fs.Path =
    DedupIngest.fs(spark, s"$dir/markers/compact-$stamp.manifest")._2

  /** Replay any committed compaction manifest to completion: publish
    * the staged gen (idempotent — skipped when the target already
    * exists), delete the folded sources, drop manifest + stage. A
    * manifest without its COMMIT trailer (crash mid-write) is
    * discarded along with its stage — nothing was published. */
  private[streaming] def recoverCompact(spark: SparkSession,
      dir: String): Unit = {
    val (f, markers) = DedupIngest.fs(spark, s"$dir/markers")
    if (!f.exists(markers)) return
    // a stage dir with no manifest is a crash-before-WAL orphan:
    // nothing was published, the sources hold every row — discard.
    // Safe under the MAINTENANCE lock every caller holds: gen stages
    // and manifests are only ever created by maintenance holders, so
    // an in-progress writer's stage cannot be seen by another
    // recoverer (the tail's own stages live at data.stage-<id>,
    // outside this sweep's gen-*.stage pattern).
    val (_, root) = DedupIngest.fs(spark, dir)
    f.listStatus(root).toSeq
      .filter(_.getPath.getName.matches("gen-.*\\.stage"))
      .foreach { s =>
        val stamp = s.getPath.getName
          .stripPrefix("gen-").stripSuffix(".stage")
        if (!f.exists(manifestPath(spark, dir, stamp)))
          f.delete(s.getPath, true)
      }
    f.listStatus(markers).toSeq
      .filter(_.getPath.getName.matches("compact-.*\\.manifest"))
      .foreach { m =>
        val lines = {
          val in = f.open(m.getPath)
          try scala.io.Source.fromInputStream(in, "UTF-8")
            .getLines().toList
          finally in.close()
        }
        val stamp = m.getPath.getName
          .stripPrefix("compact-").stripSuffix(".manifest")
        val stage = new org.apache.hadoop.fs.Path(s"$dir/gen-$stamp.stage")
        if (!lines.lastOption.contains("COMMIT")) {
          f.delete(m.getPath, false)
          if (f.exists(stage)) f.delete(stage, true)
        } else {
          val target = new org.apache.hadoop.fs.Path(
            s"$dir/data/" + lines.collectFirst {
              case l if l.startsWith("T\t") => l.drop(2) }.get)
          if (!f.exists(target) && f.exists(stage))
            f.rename(stage, target): Unit
          if (f.exists(target)) {
            val sources = lines.collect {
              case l if l.startsWith("S\t") => l.drop(2) }
            sources.foreach { s =>
              val sp = new org.apache.hadoop.fs.Path(s"$dir/data/$s")
              if (f.exists(sp)) f.delete(sp, true)
            }
            // a range-split gen whose last leaf was folded away leaves
            // an empty (or _SUCCESS-only) parent shell — drop it
            sources.filter(_.contains("/")).map(_.split("/")(0))
              .distinct.foreach { parent =>
                val pp = new org.apache.hadoop.fs.Path(s"$dir/data/$parent")
                if (f.exists(pp) && f.listStatus(pp).forall(st =>
                    st.isFile && !isDataFile(st.getPath.getName)))
                  f.delete(pp, true)
              }
            if (f.exists(stage)) f.delete(stage, true)
            f.delete(m.getPath, false)
          }
          // target AND stage both missing (a published-then-lost gen)
          // is impossible under atomic rename; if it ever happens,
          // LEAVE the manifest and sources for a human rather than
          // delete data blindly
        }
      }
  }

  /** One recorded box-DML statement — the durable payload behind a
    * `del-<id>` / `upd-<id>` / `sdml-<srcSeq>` marker (or its folded
    * [[foldDmlMarkers]] record). WHY statements are recorded, not just
    * marked: a marker name alone can prove idempotence, but it cannot
    * tell a REPLICA what the statement did — and a redaction that
    * never reaches replicas isn't a redaction (the RTBF gap). `seq` is
    * the table-global DML order (del and upd are separate id
    * namespaces, so ids alone cannot order an interleaved history);
    * `upto` is the contiguous committed batch watermark at statement
    * time — the provenance scope a replica replays under (rows of
    * later batches were not visible to the statement). `sets` carries
    * assignment expressions as re-parseable SQL text (empty for a
    * delete). `seq < 0` marks a pre-v1 (payload-less) or unparseable
    * record: idempotence and history stay exact, replication refuses
    * typed. */
  private[graft] final case class DmlRecord(kind: String, id: Long,
      seq: Long, upto: Long, boxes: Seq[Seq[(String, Long, Long)]],
      sets: Seq[(String, String)], atMs: Option[Long])

  private[graft] object DmlRecord {
    /** Line-based, tab-separated record body (columns are identifiers
      * — tabs/newlines in names or a newline in an assignment's SQL
      * are refused at write). */
    def serialize(r: DmlRecord): String = {
      def clean(s: String, what: String): String = {
        require(!s.exists(c => c == '\t' || c == '\n' || c == '\r'),
          s"DmlRecord: $what contains a tab/newline: '$s'")
        s
      }
      val header = s"graft-dml v1 ${clean(r.kind, "kind")} ${r.id} " +
        s"${r.seq} ${r.upto}"
      val at = r.atMs.map(t => s"T\t$t").toSeq
      val bs = r.boxes.map(b => "B\t" + b.map { case (c, lo, hi) =>
        s"${clean(c, "column")}\t$lo\t$hi" }.mkString("\t"))
      val ss = r.sets.map { case (c, e) =>
        s"S\t${clean(c, "column")}\t${clean(e, "assignment SQL")}" }
      (header +: (at ++ bs ++ ss)).mkString("\n")
    }

    /** Parse one record's lines; `fallback` covers pre-v1 empty
      * markers and any unparseable payload (seq = -1 — never replayed,
      * still exact for idempotence and history). */
    def parse(kind: String, id: Long, lines: Seq[String],
        atMs: Option[Long]): DmlRecord = {
      def fallback = DmlRecord(kind, id, -1L, -1L, Nil, Nil, atMs)
      lines.headOption match {
        case Some(h) if h.startsWith("graft-dml v1 ") =>
          try {
            val Array(k, i, q, u) = h.stripPrefix("graft-dml v1 ")
              .split(" ")
            require(k == kind && i.toLong == id,
              s"record header ($k, $i) under marker ($kind, $id)")
            val at = lines.collectFirst {
              case l if l.startsWith("T\t") => l.drop(2).toLong }
            val boxes = lines.filter(_.startsWith("B\t")).map { l =>
              l.drop(2).split("\t", -1).grouped(3).map { t =>
                (t(0), t(1).toLong, t(2).toLong) }.toSeq
            }
            val sets = lines.filter(_.startsWith("S\t")).map { l =>
              val p = l.drop(2).split("\t", 2)
              (p(0), p(1))
            }
            DmlRecord(kind, id, q.toLong, u.toLong, boxes, sets,
              at.orElse(atMs))
          } catch { case scala.util.control.NonFatal(_) => fallback }
        case _ => fallback
      }
    }
  }

  /** SQL function names bound to the EVALUATION ENVIRONMENT — wall
    * clock, session identity, RNG, task placement — rather than to the
    * row. Matched by name because the guard must fire on BOTH resolved
    * trees (the SQL DML rule's analyzed assignments) and the unresolved
    * trees a record's SQL parses back into at replica replay. */
  private val EnvBoundFns = Set(
    "current_timestamp", "now", "current_date", "localtimestamp",
    "current_timezone", "current_user", "user", "session_user",
    "current_database", "current_schema", "current_catalog",
    "uuid", "rand", "random", "randn", "randstr", "uniform", "shuffle",
    "monotonically_increasing_id", "spark_partition_id",
    "input_file_name", "input_file_block_start",
    "input_file_block_length", "version")

  /** First sub-expression of `e` whose value depends on the evaluation
    * environment (non-deterministic, or an [[EnvBoundFns]] call), as
    * display text — None when the expression is a pure function of the
    * row. WHY a WRITE-TIME contract: an UPDATE assignment is recorded
    * as SQL text and re-EVALUATED at replica replay
    * ([[replicate]]), and even on the source each affected unit
    * rewrites in its own job — `current_timestamp()` would stamp
    * different values per unit and diverge replica bytes from source
    * bytes silently. Refused typed at record time ([[updateBoxes]])
    * and, defense-in-depth for records minted by foreign writers, at
    * replay time. */
  private[graft] def environmentBound(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Option[String] =
    e.collectFirst {
      case x if !x.deterministic => x
      case x: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if EnvBoundFns(x.nameParts.last.toLowerCase) => x
      case x if EnvBoundFns(x.prettyName.toLowerCase) => x
    }.map(x => scala.util.Try(x.sql).getOrElse(x.toString))

  /** The statement-record kinds sharing one global `seq` and one fold:
    * local box deletes and updates (marked through
    * [[rewriteBoxedUnits]]), KEYED deletes (`delk`, marked through
    * [[rewriteKeyedUnits]] — the doc-id takedown statement), replicated
    * source statements ([[replicate]]'s `sdml-<srcSeq>` replays), and
    * merges (`mrg-<ledgerId>`, recorded at commit by [[mergeRows]] —
    * `boxes` empty, `sets` = the merge key by convention, the updates
    * snapshot at `markers/mrg-<id>.updates`). */
  private val DmlKinds = Seq("del", "delk", "dels", "upd", "updk",
    "upds", "sdml", "mrg")

  /** Sentinel first `sets` pair of a KEYED DML record (`delk` deletes
    * and `updk` updates): marks the payload as (keyCol, type, keys
    * [, assignments]) rather than plain box-update assignments, so
    * [[replicate]] replays it as a keyed statement even out of an
    * `sdml` record (chained replication). `__graft`-prefixed names are
    * reserved (update assignment targets refuse them), so a real
    * assignment can never forge the tag. */
  private val KeyedDmlTag = "__graft_keyed_dml"
  private val KeyedTypeTag = "__graft_key_type"

  /** Keyed-DML record payload: the key column, its type, every key
    * URL-encoded (keys are user data — tabs/newlines/unicode must
    * survive the line-based record format exactly), and for a keyed
    * UPDATE the assignments as `enc(col) enc(sql)` pairs (URL-encoding
    * never emits a space, so the space splits exactly). */
  private def encodeKeyedSets(keyCol: String, keyIsLong: Boolean,
      keys: Seq[Any], assigns: Seq[(String, String)] = Nil)
      : Seq[(String, String)] = {
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    (KeyedDmlTag -> keyCol) +:
      (KeyedTypeTag -> (if (keyIsLong) "long" else "string")) +:
      (keys.map(k => "k" -> enc(k.toString)) ++
        assigns.map { case (c, sql) => "set" -> s"${enc(c)} ${enc(sql)}" })
  }

  private def decodeKeyedSets(sets: Seq[(String, String)])
      : (String, Boolean, Seq[Any], Seq[(String, String)]) = {
    def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")
    val keyCol = sets.collectFirst {
      case (KeyedDmlTag, c) => c }.getOrElse(
      throw new IllegalStateException(
        "keyed-DML record carries no key column — corrupted record"))
    val keyIsLong = sets.collectFirst {
      case (KeyedTypeTag, t) => t }.contains("long")
    val keys = sets.collect { case ("k", v) =>
      if (keyIsLong) (dec(v).toLong: Any) else (dec(v): Any)
    }
    val assigns = sets.collect { case ("set", v) =>
      v.split(" ", 2) match {
        case Array(c, sql) => dec(c) -> dec(sql)
        case _ => throw new IllegalStateException(
          s"keyed-DML record carries a malformed assignment: '$v'")
      }
    }
    (keyCol, keyIsLong, keys, assigns)
  }

  /** One STRING-RANGE takedown shape — the DOMAIN statement
    * (`WHERE url LIKE 'https://spam.example/%'`, `WHERE s BETWEEN 'a'
    * AND 'b'`) the point-keyed surface cannot express: either a
    * PREFIX (every string starting with `p` — `LIKE 'p%'` with no
    * other wildcards) or a one-column RANGE with optional bounds and
    * per-bound inclusivity. Comparisons are Spark/DuckDB's binary
    * (UTF-8 byte) string order — the same order the driver-side unit
    * pruning uses ([[utf8Cmp]]), so a pruning decision and the
    * rewrite predicate can never disagree. */
  sealed trait StrShape
  final case class StrPrefix(prefix: String) extends StrShape
  final case class StrRange(lo: Option[String], loInc: Boolean,
      hi: Option[String], hiInc: Boolean) extends StrShape {
    require(lo.nonEmpty || hi.nonEmpty,
      "StrRange: at least one bound (an unbounded string rewrite is " +
        "a full-table statement — use a box delete on the cluster key)")
  }

  /** Sentinel first `sets` pair of a STRING-RANGE DML record (`dels`
    * deletes and `upds` updates) — the [[KeyedDmlTag]] convention for
    * the range shapes, so [[replicate]] replays them out of `sdml`
    * records too (chained replication). */
  private val StrRangeDmlTag = "__graft_str_range_dml"

  /** String-range record payload: the column, the shape (`pfx`, or
    * `lo`/`hi` with an `i`/`x` inclusivity flag), and for an update
    * the assignments — all URL-encoded (bounds are user data). */
  private def encodeStrRangeSets(col: String, shape: StrShape,
      assigns: Seq[(String, String)] = Nil): Seq[(String, String)] = {
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    val shapePart = shape match {
      case StrPrefix(p) => Seq("pfx" -> enc(p))
      case StrRange(lo, loInc, hi, hiInc) =>
        lo.map(l => "lo" -> s"${if (loInc) "i" else "x"} ${enc(l)}")
          .toSeq ++
          hi.map(h => "hi" -> s"${if (hiInc) "i" else "x"} ${enc(h)}")
    }
    (StrRangeDmlTag -> col) +: (shapePart ++
      assigns.map { case (c, sql) => "set" -> s"${enc(c)} ${enc(sql)}" })
  }

  private def decodeStrRangeSets(sets: Seq[(String, String)])
      : (String, StrShape, Seq[(String, String)]) = {
    def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")
    val col = sets.collectFirst { case (StrRangeDmlTag, c) => c }
      .getOrElse(throw new IllegalStateException(
        "string-range DML record carries no column — corrupted record"))
    def bound(key: String): Option[(String, Boolean)] =
      sets.collectFirst { case (`key`, v) => v.split(" ", 2) match {
        case Array(flag, b) => (dec(b), flag == "i")
        case _ => throw new IllegalStateException(
          s"string-range DML record carries a malformed bound: '$v'")
      } }
    val shape = sets.collectFirst { case ("pfx", p) => StrPrefix(dec(p)) }
      .getOrElse {
        val lo = bound("lo")
        val hi = bound("hi")
        StrRange(lo.map(_._1), lo.forall(_._2),
          hi.map(_._1), hi.forall(_._2))
      }
    val assigns = sets.collect { case ("set", v) =>
      v.split(" ", 2) match {
        case Array(c, sql) => dec(c) -> dec(sql)
        case _ => throw new IllegalStateException(
          s"string-range DML record carries a malformed assignment: " +
            s"'$v'")
      }
    }
    (col, shape, assigns)
  }

  private def readMarkerLines(f: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Seq[String] = {
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSeq
    finally in.close()
  }

  /** Records folded out of the live marker listing by
    * [[foldDmlMarkers]] — the union of every `dml-log-<k>` file
    * (normally one; a crash between a fold's publish and its cleanup
    * leaves a superseded log or still-live markers, deduped by
    * (kind, id) everywhere downstream).
    *
    * CACHED on the log files' (name, mtime, length) fingerprint (the
    * grid-cache pattern): every DML statement, mint, [[history]] call
    * and replica sync reads the log, and while one read is small
    * (statements are compliance-cadence ops), hot paths — per-sync
    * minting, battery warm replays — re-parse an unchanged file. Logs
    * are IMMUTABLE once published (written whole + renamed; a fold
    * mints a NEW `dml-log-<k>`, and `k` is MONOTONIC — the fold
    * computes max-existing + 1 and deletes superseded logs only
    * AFTER the higher log publishes, so a name is never reused), so
    * an equal fingerprint is an exact hit; any fold/crash-cleanup
    * changes the listing and misses. Two belts against the
    * fingerprint's edges: the cache KEY is the filesystem-qualified
    * markers path (two spellings of one dir — trailing slash, scheme
    * — share one entry), and a fingerprint whose newest mtime is
    * within the last [[DmlLogMtimeSlackMs]] is never served from
    * cache (coarse-mtime filesystems stamp whole seconds; a
    * hypothetical same-name same-length rewrite inside that second
    * would be indistinguishable, so the window re-reads; var — the
    * cache spec pins the hit path without waiting the window out). */
  private[graft] var DmlLogMtimeSlackMs = 2000L
  private val MaxDmlLogCache = 1024
  private val dmlLogCache = new java.util.LinkedHashMap[String,
      (Seq[(String, Long, Long)], Seq[DmlRecord])](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String,
        (Seq[(String, Long, Long)], Seq[DmlRecord])]): Boolean =
      size() > MaxDmlLogCache
  }
  /** Test instrumentation for the cache (no behavior rides on them). */
  private[graft] var dmlLogCacheHits = 0L
  private[graft] var dmlLogCacheMisses = 0L

  private def dmlLogEntries(spark: SparkSession,
      dir: String): Seq[DmlRecord] = {
    val (f, markers) = DedupIngest.fs(spark, s"$dir/markers")
    if (!f.exists(markers)) return Nil
    val logs = f.listStatus(markers).toSeq
      .filter(_.getPath.getName.matches("dml-log-\\d+"))
    val print = logs.map(s => (s.getPath.getName,
      s.getModificationTime, s.getLen)).sortBy(_._1)
    val key = f.makeQualified(markers).toString
    // a just-written log's mtime second may not have closed yet —
    // inside the slack window the fingerprint is not yet decisive
    val settled = print.forall(p =>
      System.currentTimeMillis() - p._2 >= DmlLogMtimeSlackMs)
    if (settled) dmlLogCache.synchronized {
      val hit = dmlLogCache.get(key)
      if (hit != null && hit._1 == print) {
        dmlLogCacheHits += 1
        return hit._2
      }
    }
    val parsed = parseDmlLogs(f, logs)
    dmlLogCache.synchronized {
      dmlLogCacheMisses += 1
      dmlLogCache.put(key, (print, parsed)): Unit
    }
    parsed
  }

  private def parseDmlLogs(f: org.apache.hadoop.fs.FileSystem,
      logs: Seq[org.apache.hadoop.fs.FileStatus]): Seq[DmlRecord] = {
    logs.flatMap { s =>
      // lock-free readers (history, records) can race a fold's
      // old-log delete — the superseding log carries every record
      val lines =
        try readMarkerLines(f, s.getPath)
        catch { case _: java.io.FileNotFoundException => Nil }
      // split on record headers; each group parses independently
      val groups = scala.collection.mutable.Buffer
        .empty[scala.collection.mutable.Buffer[String]]
      lines.foreach { l =>
        if (l.startsWith("graft-dml v1 "))
          groups += scala.collection.mutable.Buffer(l)
        else if (groups.nonEmpty) groups.last += l
      }
      groups.toSeq.flatMap { g =>
        g.head.stripPrefix("graft-dml v1 ").split(" ") match {
          case Array(k, i, _, _) if DmlKinds.contains(k) =>
            Some(DmlRecord.parse(k, i.toLong, g.toSeq, None))
          case _ => None
        }
      }
    }.groupBy(r => (r.kind, r.id)).values.map(_.head).toSeq
  }

  /** Fold the individual `del-*`/`upd-*`/`sdml-*` markers into ONE
    * `dml-log-<k>` file — the DML ledger's analogue of the ingest
    * fold ([[compactMarkers]]). WHY: the markers are each statement's
    * permanent idempotence + replay record, and
    * [[deleteBoxesNext]]/[[updateBoxesNext]]/[[history]]/[[replicate]]
    * all list (and for records, READ) the whole namespace — at a
    * daily-retention cadence on a 100 TB deployment that listing
    * grows without bound. The fold keeps the dir at one log file +
    * the statements since. EXACT: every record survives with its
    * boxes, assignment SQL, global seq, scope watermark, and commit
    * mtime (stamped into the record at fold time), so [[history]] and
    * replica replay read the same facts before and after. Crash-safe:
    * the new log is written whole and renamed, markers and superseded
    * logs are deleted after, and every intermediate state reads
    * correctly because [[dmlRecords]] dedupes (kind, id) across live
    * markers and ALL surviving logs. Runs from [[vacuum]] under the
    * maintenance lock (DML markers are maintenance-lock state — the
    * per-batch ingest fold must not race it on the same dir). */
  private def foldDmlMarkers(spark: SparkSession, dir: String): Int = {
    val (f, markers) = DedupIngest.fs(spark, s"$dir/markers")
    if (!f.exists(markers)) return 0
    val names = f.listStatus(markers).toSeq.map(_.getPath.getName)
    val nameSet = names.toSet
    // an mrg record whose COMMIT marker is still absent is in-flight
    // state (the crash window between record and marker): it must stay
    // a live file — the owed replay's record-exists check reads it,
    // and folding it would let that replay re-mint a misordered seq
    val liveNames = names.filter(n =>
      DmlKinds.exists(k => n.matches(s"$k-\\d+")) &&
        !(n.startsWith("mrg-") &&
          !nameSet(s"merge-${n.stripPrefix("mrg-")}")))
    if (liveNames.isEmpty) return 0
    val byName = f.listStatus(markers).toSeq
      .map(s => s.getPath.getName -> s).toMap
    val all = dmlRecords(spark, dir)
      // same rule for the log side: an uncommitted mrg record never
      // enters the log — so a FOLDED mrg record always means
      // COMMITTED, which is what lets the merge-<id> commit marker
      // itself retire below (the ledger-id occupation survives via
      // the merge's own batch marker / watermark)
      .filter(r => r.kind != "mrg" || !nameSet(s"mrg-${r.id}") ||
        nameSet(s"merge-${r.id}"))
      .map { r =>
        // pin the commit time into the folded record — after the
        // marker is gone the record is the only witness. A merge's
        // history row shows the COMMIT marker's mtime, so that is
        // what its record must carry.
        if (r.kind == "mrg" && nameSet(s"mrg-${r.id}"))
          r.copy(atMs = byName.get(s"merge-${r.id}")
            .map(_.getModificationTime).orElse(r.atMs))
        else if (r.atMs.isDefined) r
        else r.copy(atMs = Some(System.currentTimeMillis()))
      }
    val oldLogs = names.filter(_.matches("dml-log-\\d+"))
    val k = oldLogs.map(_.stripPrefix("dml-log-").toLong)
      .foldLeft(-1L)(math.max) + 1L
    val tmp = new org.apache.hadoop.fs.Path(markers, s"dml-log-$k.tmp")
    if (f.exists(tmp)) f.delete(tmp, false)
    val out = f.create(tmp, true)
    try out.write(all.sortBy(_.seq).map(DmlRecord.serialize)
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
    val log = new org.apache.hadoop.fs.Path(markers, s"dml-log-$k")
    if (!f.rename(tmp, log))
      throw new IllegalStateException(
        s"LayoutIngest: dml-log publish failed for $dir")
    // the COMMIT markers of folded merges retire with their records:
    // the folded mrg record is the committed-proof, the batch marker /
    // watermark keeps the ledger id occupied, and history reads the
    // record — the merge namespace stops growing per statement. Swept
    // from the NEW log's mrg ids (not just this round's live records):
    // a crash between a previous fold's record delete and marker
    // delete leaves a marker whose record is already folded.
    val mergeMarkers = all.filter(_.kind == "mrg")
      .map(r => s"merge-${r.id}")
      .filter(nameSet)
    (liveNames ++ mergeMarkers).foreach(n =>
      f.delete(new org.apache.hadoop.fs.Path(markers, n), false): Unit)
    oldLogs.foreach(n =>
      f.delete(new org.apache.hadoop.fs.Path(markers, n), false): Unit)
    liveNames.size + mergeMarkers.size
  }

  /** The [[foldDmlMarkers]] class-5 sweep on its own (the DML
    * analogue of [[compactMarkers]]) — under the maintenance lock,
    * like every DML-marker writer. Returns how many individual
    * markers folded. */
  def compactDmlMarkers(spark: SparkSession, dir: String): Int =
    withMaintLock(spark, dir)(foldDmlMarkers(spark, dir))

  /** EVERY recorded DML statement on `dir` — folded log entries plus
    * live `del-* `/`upd-*`/`sdml-*` markers (live wins the dedupe: its
    * mtime is fresher than a superseded log's copy). */
  private[graft] def dmlRecords(spark: SparkSession,
      dir: String): Seq[DmlRecord] = {
    val (f, markers) = DedupIngest.fs(spark, s"$dir/markers")
    val live =
      if (!f.exists(markers)) Nil
      else f.listStatus(markers).toSeq.flatMap { s =>
        val n = s.getPath.getName
        DmlKinds.find(k => n.matches(s"$k-\\d+")).flatMap { k =>
          // a lock-free reader (history(), replicate() on the source)
          // can list a marker just before a concurrent vacuum's
          // [[foldDmlMarkers]] deletes it — drop the entry and let the
          // log side recover the record (the fold publishes the new
          // dml-log BEFORE deleting markers, so the fact is never
          // lost); same race-tolerance [[dmlLogEntries]] grants the
          // fold's old-log delete
          try Some(DmlRecord.parse(k, n.stripPrefix(s"$k-").toLong,
            readMarkerLines(f, s.getPath),
            Some(s.getModificationTime)))
          catch { case _: java.io.FileNotFoundException => None }
        }
      }
    val liveKeys = live.map(r => (r.kind, r.id)).toSet
    live ++ dmlLogEntries(spark, dir)
      .filterNot(r => liveKeys((r.kind, r.id)))
  }

  /**
   * Targeted delete (the right-to-be-forgotten surface on the
   * clustered table) — where the layout pays off TWICE: rows inside an
   * axis-aligned box on the clustered columns are removed by rewriting
   * ONLY the data dirs whose parquet footer statistics intersect the
   * box. On a clustered table a thin box touches a handful of dirs
   * (the LayoutProbe numbers); a time-ordered table would rewrite
   * everything. Each affected dir rewrites through the SAME WAL
   * manifest as [[compact]] (stage the filtered copy, record
   * (target, source, COMMIT), publish by rename, drop the source) —
   * crash at any point converges via [[recoverCompact]], and readers
   * stay correct throughout ([[read]]'s publish-point rule). The
   * whole operation is idempotent behind a `del-<deleteId>` marker:
   * a replay after a mid-delete crash re-filters the already-filtered
   * dirs (a no-op rewrite) and finishes the rest. Returns false when
   * the marker shows the delete already committed.
   *
   * `box`: (column, lo, hi) conjunctive ranges, inclusive; rows
   * matching EVERY range are deleted. Columns must be long-typed
   * (the clustered columns are — that is what makes the footer
   * statistics decisive).
   */
  def deleteBox(spark: SparkSession, dir: String,
      box: Seq[(String, Long, Long)], deleteId: Long): Boolean =
    deleteBoxes(spark, dir, Seq(box), deleteId)

  /** UNION-of-boxes delete — [[deleteBox]] generalized to remove rows
    * matching ANY of several conjunctive boxes in ONE operation: one
    * maintenance hold, one ledger entry (`del-<deleteId>`), and at
    * most ONE rewrite per affected unit no matter how many boxes name
    * it (N sequential deleteBox calls would rewrite a shared unit N
    * times and log N delete ops for what the caller means as one
    * statement). Overlapping boxes are fine — the row predicate is a
    * single OR, so a doubly-covered row is simply deleted. A unit is
    * rewritten iff its footer stats intersect at least one box. The
    * body behind SQL `DELETE ... WHERE <box> OR <box>`. */
  def deleteBoxes(spark: SparkSession, dir: String,
      boxes: Seq[Seq[(String, Long, Long)]], deleteId: Long): Boolean =
    // NULL-safe: delete ONLY rows where the box predicate is TRUE.
    // Under three-valued logic a NULL box column makes the naive
    // NOT(range AND range) evaluate to NULL and filter() would
    // silently DESTROY the row (nulls are legal in grid columns —
    // quantization folds them to the minimum cell — and pre-evolution
    // units read added columns as NULL). `hit` arrives coalesced.
    rewriteBoxedUnits(spark, dir, "del", deleteId,
      boxes, Nil)((df, hit) => df.filter(!hit))

  /** In-place BOX-SCOPED UPDATE — the REDACTION surface (null out or
    * overwrite a payload column for a user/time slice WITHOUT deleting
    * the rows — the compliance op deletion is too blunt for). Same
    * machinery as [[deleteBoxes]]: only units whose footer statistics
    * intersect a box are rewritten, each through the WAL manifest,
    * idempotent behind an `upd-<updateId>` marker, one ledger entry
    * for the whole union of boxes.
    *
    * `sets` assigns payload columns from deterministic expressions
    * over the row's UNTOUCHED columns — an assignment may read any
    * column the statement does not assign. Reading an ASSIGNED column
    * (`value = value + 1`, swaps) is refused at record time, like
    * environment-bound values: the statement is recorded as SQL text
    * and re-evaluated on replica sync, where at-least-once replay
    * over pre- or post-statement bytes cannot re-apply a self-read
    * exactly ([[validateAssignSets]]; MERGE's partial UPDATE SET is
    * the replica-exact spelling of those shapes — its updates
    * snapshot replays bytes, not expressions). Rows outside the
    * boxes (or where the predicate is NULL — three-valued logic, the
    * row is NOT hit) keep every column untouched.
    *
    * REPLAY after a mid-operation crash (same updateId): exact — and
    * belt-and-braces: the replay skips the crashed attempt's own
    * published rewrites by their `gen-upd<id>-` name prefix, so even
    * a NON-idempotent assignment (none are recordable today — that
    * would need a self-read — but the skip predates the gate and
    * guards records minted by older writers) applies exactly once
    * per row. The contract assumes the standard
    * crash-recovery discipline: replay the owed op before any OTHER
    * maintenance renames those units (the maintenance lock's
    * break-then-look rule). The SQL path never replays — a driver
    * retry mints a new id, and [[occupiedDmlIds]] counts a crashed
    * statement's published debris as occupying its id, so the fresh
    * statement can never collide with (and silently skip) the dead
    * one's outputs.
    *
    * The CLUSTER-DERIVED columns are not assignable: the grid columns
    * and [[KeyCol]] decide where a row lives (stats, blooms,
    * range-split leaves), so changing them in place would strand the
    * row under a stale key — move rows with delete + insert, or
    * [[regrid]]. [[BatchCol]] is immutable provenance; consistent
    * with [[deleteBox]], an in-place redaction is NOT re-emitted to
    * CDC readers (the row keeps its original `__batch`). */
  def updateBoxes(spark: SparkSession, dir: String,
      boxes: Seq[Seq[(String, Long, Long)]],
      sets: Seq[(String, org.apache.spark.sql.Column)],
      updateId: Long): Boolean = {
    val setExprs = validateAssignSets(spark, dir, "updateBoxes", sets)
    val setMap = sets.toMap
    rewriteBoxedUnits(spark, dir, "upd", updateId, boxes,
      setExprs) { (df, hit) =>
      df.select(df.columns.toSeq.map { c =>
        setMap.get(c)
          .map(e => when(hit, e).otherwise(col(c)).as(c))
          .getOrElse(col(c))
      }: _*)
    }
  }

  /** Shared assignment contract of the in-place UPDATE statements
    * ([[updateBoxes]] and [[updateKeys]]): non-empty distinct targets;
    * cluster-derived/provenance columns and the reserved `__graft`
    * prefix refused (the grid columns and [[KeyCol]] decide where a
    * row LIVES; the prefix carries engine record tags a forged
    * assignment could make a replica mis-replay); targets must exist
    * (no stored schema falls back to the served columns — without it a
    * typo'd target would silently never apply; a table with neither
    * schema nor data has no rows to miss); and the RECORD-TIME
    * replayability gates — the assignment is recorded as SQL text and
    * re-evaluated at replica replay (and once per affected unit even
    * on the source), so an environment-bound value
    * (current_timestamp(), rand(), uuid(), current_user()) would write
    * DIFFERENT bytes per evaluation, and a SELF-REFERENTIAL value
    * (reading any assigned column) cannot re-apply exactly over a
    * replica's pre- or post-statement bytes — both silently diverge
    * replicas, both refused here rather than poisoning the record
    * stream for every later sync.
    * Returns the (column, SQL) record pairs. */
  private def validateAssignSets(spark: SparkSession, dir: String,
      what: String, sets: Seq[(String, org.apache.spark.sql.Column)])
      : Seq[(String, String)] = {
    require(sets.nonEmpty, s"$what: no assignments")
    require(sets.map(_._1).distinct.size == sets.size,
      s"$what: duplicate assignment targets in ${sets.map(_._1)}")
    val gridNow = readGrid(spark, dir)
    val reserved = (gridNow.cols :+ KeyCol :+ BatchCol).toSet
    sets.foreach { case (c, _) =>
      require(!reserved(c),
        s"$what: '$c' is a cluster-derived or provenance " +
          "column — not assignable in place (delete + insert, or " +
          "regrid, to move rows)")
      require(!c.startsWith("__graft"),
        s"$what: '$c' — the __graft prefix is reserved for " +
          "engine-internal columns and record tags")
    }
    val known = tableSchema(spark, dir)
      .map(_.fieldNames.toSet)
      .orElse {
        val (df0, data0) = DedupIngest.fs(spark, s"$dir/data")
        if (!df0.exists(data0) || leafUnits(df0, data0).isEmpty) None
        else Some(read(spark, dir).columns.toSet)
      }
      .getOrElse(Set.empty)
    sets.foreach { case (c, _) =>
      require(known.isEmpty || known(c),
        s"$what: unknown column '$c' (table has $known)")
    }
    // RECORD-TIME twin of the replica-replay gates (replicateBody):
    // a recorded statement must be replayable, and two value shapes
    // can never be — environment-bound expressions (re-evaluate to
    // different bytes) and SELF-REFERENTIAL ones (an assignment
    // reading any ASSIGNED column: under at-least-once replay a
    // replica may hold pre- OR post-statement bytes, so `v = v + 1`
    // or a `v = w, w = v` swap cannot be re-applied exactly).
    // Refusing them HERE, not at sync time, is what keeps one bad
    // statement from minting a poison record that permanently fails
    // every subsequent replicate() of the table. The replay-side
    // gates stay as defense-in-depth against foreign/older writers.
    // Self-referential shapes still have a replica-exact spelling:
    // MERGE's partial UPDATE SET (`SET value = t.value + s.delta`)
    // snapshots the post-statement rows, so replicas replay bytes,
    // not expressions.
    val assigned = sets.map(_._1.toLowerCase).toSet
    sets.map { case (c, e) =>
      val ex = org.apache.spark.sql.graftbridge.ColumnBridge
        .catalystExpr(e)
      environmentBound(ex).foreach(bad =>
        throw new IllegalArgumentException(
          s"$what: assignment to '$c' reads the evaluation " +
            s"environment ($bad) — it cannot rewrite the same bytes " +
            "on replay or replica sync; evaluate it once and assign " +
            "the resulting literal instead"))
      val refs = ex.collect {
        case u: org.apache.spark.sql.catalyst.analysis
          .UnresolvedAttribute => u.nameParts.last.toLowerCase
        case a: org.apache.spark.sql.catalyst.expressions
          .AttributeReference => a.name.toLowerCase
      }
      refs.toSet.intersect(assigned).headOption.foreach(bad =>
        throw new IllegalArgumentException(
          s"$what: assignment to '$c' reads an assigned column " +
            s"('$bad') — self-referential assignments cannot " +
            "replay exactly under at-least-once replica sync, so they " +
            "are refused at record time; read only untouched columns, " +
            "or use MERGE (its updates snapshot replays bytes, not " +
            "expressions)"))
      c -> ex.sql
    }
  }

  /** The shared core of the box-scoped unit REWRITERS ([[deleteBoxes]]
    * filters, [[updateBoxes]] projects, [[replicate]] replays): under
    * the maintenance lock,
    * idempotent behind the `<kind>-<id>` marker (live or folded into
    * the [[foldDmlMarkers]] log), rewrite exactly the units whose
    * stats intersect at least one box, each through the same WAL
    * manifest as [[compact]]. `transform` receives the unit frame and
    * the NULL-SAFE union-of-boxes predicate (already coalesced to
    * false — a NULL box column never hits). The commit marker carries
    * the full statement as a [[DmlRecord]] (boxes, `setsRecord`
    * assignment SQL, the global DML `seq`, the batch watermark `upto`)
    * — what [[replicate]] replays on a replica. */
  private def rewriteBoxedUnits(spark: SparkSession, dir: String,
      kind: String, id: Long,
      boxes: Seq[Seq[(String, Long, Long)]],
      setsRecord: Seq[(String, String)])(
      transform: (DataFrame, org.apache.spark.sql.Column) => DataFrame)
      : Boolean = {
    require(boxes.nonEmpty && boxes.forall(_.nonEmpty),
      s"$kind$id: empty box")
    val inBox = boxes.map(_.map { case (c, lo, hi) =>
      col(c) >= lo && col(c) <= hi
    }.reduce(_ && _)).reduce(_ || _)
    val hit = coalesce(inBox, lit(false))
    rewriteMarkedUnits(spark, dir, kind, id, boxes, setsRecord,
      affects = (f, d) => boxes.exists(_.forall { case (c, lo, hi) =>
        dirColumnRange(f, d, c) match {
          case Some((mn, mx)) => mx >= lo && mn <= hi
          case None => true // no stats → conservatively rewrite
        }
      }))(df => transform(df, hit))
  }

  /** The shared scaffold under every marked unit REWRITER
    * ([[rewriteBoxedUnits]]'s box ops and [[rewriteKeyedUnits]]'s
    * keyed deletes): under the maintenance lock, idempotent behind the
    * `<kind>-<id>` marker (live or folded into the [[foldDmlMarkers]]
    * log), rewrite exactly the units `affects` admits (a conservative
    * pruner — stats for boxes, blooms for keys), each through the same
    * WAL manifest as [[compact]]. The commit marker carries the full
    * statement as a [[DmlRecord]] (`recBoxes`/`recSets` — what
    * [[replicate]] replays on a replica). */
  private def rewriteMarkedUnits(spark: SparkSession, dir: String,
      kind: String, id: Long,
      recBoxes: Seq[Seq[(String, Long, Long)]],
      recSets: Seq[(String, String)],
      affects: (org.apache.hadoop.fs.FileSystem,
        org.apache.hadoop.fs.Path) => Boolean)(
      transform: DataFrame => DataFrame): Boolean = {
    refuseReplicaWrite(spark, dir, s"$kind-$id")
    withMaintLock(spark, dir) {
      fencePromotedMidSync(spark, dir, s"$kind-$id")
      val stampPrefix = s"$kind$id"
      recoverCompact(spark, dir)
      adoptOrphanBatches(spark, dir)
      val (f, markers) = DedupIngest.fs(spark, s"$dir/markers")
      val marker = new org.apache.hadoop.fs.Path(markers, s"$kind-$id")
      if (f.exists(marker) ||
          dmlLogEntries(spark, dir)
            .exists(r => r.kind == kind && r.id == id)) false
      else {
        // recorded BEFORE the unit listing: batches committing during
        // the rewrite are not in the listing, so the statement's scope
        // is exactly "rows of batches <= upto" (plus any committed
        // above a gap — served post-rewrite to any later reader, so a
        // replica stays exact either way; see [[replicate]])
        val upto = contiguousCommittedBatch(spark, dir)
        val seq = dmlRecords(spark, dir).map(_.seq)
          .foldLeft(-1L)(math.max) + 1L
        val (_, data) = DedupIngest.fs(spark, s"$dir/data")
        val units =
          if (!f.exists(data)) Nil
          else leafUnits(f, data)
        val affectedPaths =
          parFilter(units.map(_._2))(d => affects(f, d)).toSet
        // a REPLAY after a mid-operation crash (marker not yet
        // created) must not re-transform units the crashed attempt
        // already PUBLISHED — its own outputs are recognizable by the
        // id-scoped name prefix. For a delete this only saves a no-op
        // rewrite; for an UPDATE it is what makes a non-idempotent
        // assignment (value = value + 1) replay-safe. Holds under the
        // crash-recovery discipline the maintenance lock imposes
        // (break the dead holder's lock, replay the owed op BEFORE
        // any other maintenance renames those units).
        val ownOutput = s"gen-$stampPrefix-"
        val affected = units.filter(u =>
          affectedPaths(u._2) && !u._1.startsWith(ownOutput))
        val gridNow = readGrid(spark, dir) // immutable — read once
        affected.zipWithIndex.foreach { case ((name, d), i) =>
          // the attempt nonce keeps a REPLAY's target names distinct
          // from a previous attempt's published gens — without it a
          // replayed rewrite of gen-delX could manifest X as both
          // source and target and recovery would drop the data
          val stamp = s"$stampPrefix-$i-" +
            java.util.UUID.randomUUID().toString.take(6)
          val stage = new org.apache.hadoop.fs.Path(
            s"$dir/gen-$stamp.stage")
          if (f.exists(stage)) f.delete(stage, true)
          // per-file partitions, narrow transform: key order inside
          // each written file is inherited from the sorted source
          // files (a filter or a row-local projection preserves it)
          transform(readUnits(spark, dir, Seq(d)))
            .write.mode("overwrite").parquet(stage.toString)
          writeUnitStats(f, stage, gridNow.cols :+ KeyCol :+ BatchCol,
            gridNow.bloomCols)
          writeUnitBlooms(spark, f, stage, gridNow.bloomCols)
          val man = manifestPath(spark, dir, stamp)
          val out = f.create(man, true)
          try out.write((Seq(s"S\t$name", s"T\tgen-$stamp",
              "COMMIT")).mkString("\n").getBytes("UTF-8"))
          finally out.close()
          recoverCompact(spark, dir)
        }
        // the marker is the statement's commit record AND its durable
        // payload — written whole to a tmp and renamed, so an existing
        // marker always parses (a crash mid-write leaves only the tmp;
        // the owed replay rewrites nothing — every unit carries the
        // op's stamp — and re-publishes the marker)
        val tmp = new org.apache.hadoop.fs.Path(markers,
          s"$kind-$id.tmp")
        if (f.exists(tmp)) f.delete(tmp, false)
        val out = f.create(tmp, true)
        try out.write(DmlRecord.serialize(DmlRecord(kind, id, seq,
          upto, recBoxes, recSets, None)).getBytes("UTF-8"))
        finally out.close()
        if (!f.rename(tmp, marker))
          throw new IllegalStateException(
            s"LayoutIngest: DML marker publish failed for $kind-$id")
        true
      }
    }
  }

  /** Every delete/update id OCCUPIED on `dir` for `prefix` (`del` or
    * `upd`): committed markers PLUS the id-stamped debris a statement
    * that crashed after publishing rewrites but before its marker
    * leaves behind — published `gen-<prefix><id>-*` units in the data
    * tree, staged `gen-<prefix><id>-*.stage` dirs, and
    * `compact-<prefix><id>-*.manifest` WAL entries. WHY the debris
    * counts: [[rewriteBoxedUnits]]'s replay path skips units carrying
    * the operation's OWN id stamp (what makes a non-idempotent UPDATE
    * replay exact), so a LATER, semantically different statement that
    * re-minted a crashed id would silently treat the dead statement's
    * outputs as its own published rewrites and exempt those units from
    * its delete/update — a missed redaction. Minting past the debris
    * makes a fresh statement's id collision-free; the explicit-id API
    * replay of the crashed statement itself keeps the skip. */
  private def occupiedDmlIds(spark: SparkSession, dir: String,
      prefix: String): Set[Long] = {
    val (f, markers) = DedupIngest.fs(spark, s"$dir/markers")
    val stamp = s"gen-$prefix(\\d+)-.*"
    val markerIds =
      if (!f.exists(markers)) Seq.empty[Long]
      else f.listStatus(markers).toSeq.map(_.getPath.getName).flatMap {
        case n if n.matches(s"$prefix-\\d+") =>
          Some(n.stripPrefix(s"$prefix-").toLong)
        case n if n.matches(s"compact-$prefix(\\d+)-.*\\.manifest") =>
          Some(n.stripPrefix(s"compact-$prefix")
            .takeWhile(_.isDigit).toLong)
        case _ => None
      }
    val logIds = dmlLogEntries(spark, dir)
      .filter(_.kind == prefix).map(_.id)
    val (_, root) = DedupIngest.fs(spark, dir)
    val stageIds =
      if (!f.exists(root)) Seq.empty[Long]
      else f.listStatus(root).toSeq.map(_.getPath.getName).collect {
        case n if n.matches(s"$stamp\\.stage") =>
          n.stripPrefix(s"gen-$prefix").takeWhile(_.isDigit).toLong
      }
    val (_, data) = DedupIngest.fs(spark, s"$dir/data")
    val unitIds =
      if (!f.exists(data)) Seq.empty[Long]
      else f.listStatus(data).toSeq.map(_.getPath.getName).collect {
        case n if n.matches(stamp) =>
          n.stripPrefix(s"gen-$prefix").takeWhile(_.isDigit).toLong
      }
    (markerIds ++ logIds ++ stageIds ++ unitIds).toSet
  }

  /** [[deleteBox]] under the NEXT UNUSED delete id — the body behind
    * SQL `DELETE FROM` on the relation. Delete ids are their own
    * marker namespace (`del-<id>`), scanned fresh per attempt
    * INCLUDING id-stamped crash debris ([[occupiedDmlIds]] — a crashed
    * statement's published-but-unmarked rewrites occupy its id, so a
    * fresh statement never adopts them); a
    * concurrent SQL DELETE that wins the id turns this attempt's
    * deleteBox into a marker no-op (returns false), and the loop
    * re-mints — bounded, since every loss means another delete
    * COMMITTED. Same retry caveat as [[appendNext]]: a driver-level
    * retry of the whole statement is a new delete, not a replay.
    * Returns the id the delete committed under. */
  private[graft] def deleteBoxNext(spark: SparkSession, dir: String,
      box: Seq[(String, Long, Long)]): Long =
    deleteBoxesNext(spark, dir, Seq(box))

  /** [[deleteBoxes]] under the next unused delete id (same id-race
    * loop as the single-box form). */
  private[graft] def deleteBoxesNext(spark: SparkSession, dir: String,
      boxes: Seq[Seq[(String, Long, Long)]]): Long = {
    var attempts = 0
    while (true) {
      val next =
        occupiedDmlIds(spark, dir, "del").foldLeft(-1L)(math.max) + 1L
      if (deleteBoxes(spark, dir, boxes, next)) return next
      attempts += 1
      require(attempts < 16,
        s"deleteBoxNext: lost the delete-id race $attempts times on " +
          s"$dir — a pathological storm of concurrent DELETEs")
    }
    -1L // unreachable
  }

  /** [[updateBoxes]] under the next unused update id — the body
    * behind SQL `UPDATE` on the relation. `upd-<id>` is its own
    * marker namespace (crash debris counted — [[occupiedDmlIds]]),
    * same id-race loop as [[deleteBoxesNext]]. */
  private[graft] def updateBoxesNext(spark: SparkSession, dir: String,
      boxes: Seq[Seq[(String, Long, Long)]],
      sets: Seq[(String, org.apache.spark.sql.Column)]): Long = {
    var attempts = 0
    while (true) {
      val next =
        occupiedDmlIds(spark, dir, "upd").foldLeft(-1L)(math.max) + 1L
      if (updateBoxes(spark, dir, boxes, sets, next)) return next
      attempts += 1
      require(attempts < 16,
        s"updateBoxesNext: lost the update-id race $attempts times " +
          s"on $dir — a pathological storm of concurrent UPDATEs")
    }
    -1L // unreachable
  }

  /** Hard ceiling on one keyed delete's keys: the keys drive
    * driver-side bloom probing AND ride inside the statement's
    * permanent record (what replicas replay) — a takedown list is
    * governance-sized by nature, and a "delete" of corpus-sized keys
    * is a rewrite in disguise (the [[MaxMergeKeys]] argument, tighter
    * because the record stores every key). */
  private val MaxDeleteKeys = 1 << 16

  /** The unit pruner + row predicate behind the KEYED statements,
    * shared by the source forms ([[deleteKeys]]/[[updateKeys]],
    * unscoped) and their replica replays ([[replicate]], scoped
    * `__batch <= scopeUpto`): a unit rewrites only if it has rows,
    * intersects the batch scope, and — when `keyCol` carries sidecars
    * — its stats range (long keys) or Bloom filter (both types; the
    * [[mergeRows]] q166/q170 machinery) admits at least one key. The
    * row predicate handed to `transform` is a codegen'd IN-set,
    * NULL-safe (a NULL key never hits — SQL's three-valued IN). */
  /** Ceiling on ONE keyed statement's total driver bloom-probe work,
    * keys × live units (each probe is ~7 hash lookups): above it the
    * unit selection falls back to stats-range pruning alone — the
    * [[BloomProbeMaxKeys]] rule from [[mergeRows]], scaled by unit
    * count, so a max-size (2^16-key) list against a many-unit table
    * with NO bloom hits cannot spin the driver through keys × units
    * misses (`exists` short-circuits only on HITS). Conservative,
    * never wrong: skipping blooms rewrites more units, not fewer.
    * Var — the spec pins the fallback without building 4M probes. */
  private[graft] var KeyedBloomProbeBudget = 1L << 22
  /** Test instrumentation: statements whose bloom probing was skipped
    * for budget (no behavior rides on it). */
  private[graft] var keyedBloomBudgetSkips = 0L

  private def rewriteKeyedUnits(spark: SparkSession, dir: String,
      kind: String, id: Long, keyCol: String, keyIsLong: Boolean,
      keys: Seq[Any], scopeUpto: Long,
      recBoxes: Seq[Seq[(String, Long, Long)]],
      assigns: Seq[(String, String)] = Nil)(
      transform: (DataFrame, org.apache.spark.sql.Column) => DataFrame =
        (df, hit) => df.filter(!hit)): Boolean = {
    val (longMin, longMax) =
      if (keyIsLong && keys.nonEmpty) {
        val ls = keys.map(_.asInstanceOf[Long])
        (ls.min, ls.max)
      } else (Long.MinValue, Long.MaxValue)
    val unitCount = {
      val (f0, data0) = DedupIngest.fs(spark, s"$dir/data")
      if (!f0.exists(data0)) 0 else leafUnits(f0, data0).size
    }
    val probeBloom =
      keys.size.toLong * math.max(1, unitCount) <= KeyedBloomProbeBudget
    if (!probeBloom) keyedBloomBudgetSkips += 1
    val affects = (f: org.apache.hadoop.fs.FileSystem,
        d: org.apache.hadoop.fs.Path) =>
      unitRows(f, d) > 0 &&
        (scopeUpto == Long.MaxValue ||
          (dirColumnRange(f, d, BatchCol) match {
            case Some((mn, _)) => mn <= scopeUpto
            case None => true // no stats → conservative
          })) &&
        (!keyIsLong || (dirColumnRange(f, d, keyCol) match {
          case Some((mn, mx)) => mx >= longMin && mn <= longMax
          case None => true
        })) &&
        (!probeBloom || (unitBloom(f, d, keyCol) match {
          case Some(b) => keys.exists {
            case s: String => b.mightContainString(s)
            case l: Long => b.mightContainLong(l)
            case other => throw new IllegalStateException(
              s"unreachable key type: ${other.getClass.getName}")
          }
          case None => true // no bloom sidecar → conservative
        }))
    val inKeys = coalesce(
      col(keyCol).isin(keys: _*), lit(false))
    val hit =
      if (scopeUpto == Long.MaxValue) inKeys
      else inKeys && col(BatchCol) <= scopeUpto
    rewriteMarkedUnits(spark, dir, kind, id, recBoxes,
      encodeKeyedSets(keyCol, keyIsLong, keys, assigns), affects)(
      df => transform(df, hit))
  }

  /** Targeted KEY delete — the doc-id TAKEDOWN statement (the RTBF
    * shape every LLM-corpus operator actually writes: "forget these
    * document ids"), where the box machinery cannot reach: string keys
    * have no enumerable complement and no long-range stats, but they
    * DO have per-unit Bloom sidecars ([[Grid.bloomCols]] — the
    * [[mergeRows]] string path's pruning), so the statement rewrites
    * only the units whose bloom admits at least one key. Long keys
    * work too (stats range + bloom); for those the box surface
    * (`deleteBoxes` point boxes) is equivalent — this form just skips
    * the per-key box bookkeeping.
    *
    * Same contract family as [[deleteBoxes]]: one maintenance hold,
    * ONE ledger entry (`delk-<deleteId>`), at most one WAL-manifested
    * rewrite per affected unit, idempotent behind the marker, replayed
    * crash-exact (filtering is idempotent), and RECORDED — the marker
    * carries the key column and every key (URL-encoded, bounded by
    * [[MaxDeleteKeys]]), so [[replicate]] replays the statement on
    * every replica scoped `__batch <= upto`, exactly like a box
    * delete. NULL keys are refused (they can never match — SQL IN);
    * rows whose key IS NULL are kept (three-valued logic, the
    * [[deleteBoxes]] rule). `keyCol` must be LONG or STRING (the bloom
    * sidecar types) and SHOULD be in [[Grid.bloomCols]] — without a
    * bloom every unit conservatively rewrites (correct, slow).
    *
    * 100 TB: the keys are driver-held by contract (governance-sized,
    * ≤ [[MaxDeleteKeys]]); pruning is metadata-only; each affected
    * unit rewrites once through a codegen'd IN-set filter; the data
    * path never collects or shuffles. */
  def deleteKeys(spark: SparkSession, dir: String, keyCol: String,
      keys: Seq[Any], deleteId: Long): Boolean = {
    val (distinctKeys, keyIsLong) =
      validateKeyedArgs(spark, dir, "deleteKeys", keyCol, keys)
    rewriteKeyedUnits(spark, dir, "delk", deleteId, keyCol, keyIsLong,
      distinctKeys, Long.MaxValue, Nil)()
  }

  /** Shared argument contract of the keyed statements: non-empty
    * NULL-free keys (a NULL never matches — SQL IN), deduped, bounded
    * by [[MaxDeleteKeys]] (they ride in the record and drive driver
    * bloom probes), homogeneous Long-or-String, and the key column
    * must exist with the matching type (the updateBoxes fallback rule:
    * no stored schema falls back to the served columns; neither →
    * nothing to touch, validates against nothing). */
  private def validateKeyedArgs(spark: SparkSession, dir: String,
      what: String, keyCol: String, keys: Seq[Any])
      : (Seq[Any], Boolean) = {
    require(keys.nonEmpty, s"$what: no keys")
    require(!keys.contains(null),
      s"$what: NULL keys are not supported — a NULL never matches " +
        "(SQL IN semantics), so the statement could not touch anything")
    val distinctKeys = keys.distinct
    require(distinctKeys.size <= MaxDeleteKeys,
      s"$what: ${distinctKeys.size} distinct keys — a keyed statement " +
        "this large is a rewrite in disguise; split it or use a box " +
        "statement on a range")
    val keyIsLong = distinctKeys.head.isInstanceOf[Long]
    require(distinctKeys.forall(k =>
        if (keyIsLong) k.isInstanceOf[Long] else k.isInstanceOf[String]),
      s"$what: keys must be all Long or all String (the bloom " +
        "sidecar types)")
    tableSchema(spark, dir)
      .map(s => s.fields.map(fd => fd.name -> fd.dataType).toMap)
      .orElse {
        val (df0, data0) = DedupIngest.fs(spark, s"$dir/data")
        if (!df0.exists(data0) || leafUnits(df0, data0).isEmpty) None
        else Some(read(spark, dir).schema.fields
          .map(fd => fd.name -> fd.dataType).toMap)
      }
      .foreach { known =>
        val dt = known.getOrElse(keyCol,
          throw new IllegalArgumentException(
            s"$what: unknown column '$keyCol' (table has " +
              s"${known.keySet})"))
        val want =
          if (keyIsLong) org.apache.spark.sql.types.LongType
          else org.apache.spark.sql.types.StringType
        require(dt == want,
          s"$what: column '$keyCol' is ${dt.simpleString} but " +
            s"the keys are ${want.simpleString} — a mistyped key can " +
            "never match; cast the keys, not the column")
      }
    (distinctKeys, keyIsLong)
  }

  /** KEY-scoped in-place UPDATE — the REDACTION twin of
    * [[deleteKeys]] (null out or overwrite payload columns for a list
    * of document ids WITHOUT deleting the rows — the statement a
    * string-keyed corpus writes when deletion is too blunt), where the
    * box surface cannot reach (string keys have no boxes). Same
    * machinery and contracts: Bloom-sidecar unit pruning, one
    * `updk-<updateId>` ledger entry recording the key column, every
    * key AND every assignment's SQL (all URL-encoded), replica replay
    * scoped `__batch <= upto`, crash-replay exact (the
    * [[rewriteMarkedUnits]] own-output skip), and [[updateBoxes]]'
    * assignment contract — payload columns only, deterministic
    * environment-free expressions over columns the statement does NOT
    * assign (self-reads refused at record time, the replica
    * replayability gate; [[validateAssignSets]]), rows whose key is
    * NULL or absent untouched. */
  def updateKeys(spark: SparkSession, dir: String, keyCol: String,
      keys: Seq[Any], sets: Seq[(String, org.apache.spark.sql.Column)],
      updateId: Long): Boolean = {
    val (distinctKeys, keyIsLong) =
      validateKeyedArgs(spark, dir, "updateKeys", keyCol, keys)
    val setExprs = validateAssignSets(spark, dir, "updateKeys", sets)
    require(!sets.exists(_._1 == keyCol),
      s"updateKeys: assigning the key column '$keyCol' itself under a " +
        "key predicate rewrites row identity — use MERGE (whole-row) " +
        "or delete + insert")
    val setMap = sets.toMap
    rewriteKeyedUnits(spark, dir, "updk", updateId, keyCol, keyIsLong,
      distinctKeys, Long.MaxValue, Nil, setExprs) { (df, hit) =>
      df.select(df.columns.toSeq.map { c =>
        setMap.get(c)
          .map(e => when(hit, e).otherwise(col(c)).as(c))
          .getOrElse(col(c))
      }: _*)
    }
  }

  /** [[updateKeys]] under the next unused keyed-update id — the body
    * behind SQL `UPDATE t SET ... WHERE <stringCol> IN (...)`. Same
    * id-race loop as its siblings; `updk-<id>` debris counted. */
  private[graft] def updateKeysNext(spark: SparkSession, dir: String,
      keyCol: String, keys: Seq[Any],
      sets: Seq[(String, org.apache.spark.sql.Column)]): Long = {
    var attempts = 0
    while (true) {
      val next =
        occupiedDmlIds(spark, dir, "updk").foldLeft(-1L)(math.max) + 1L
      if (updateKeys(spark, dir, keyCol, keys, sets, next)) return next
      attempts += 1
      require(attempts < 16,
        s"updateKeysNext: lost the update-id race $attempts times on " +
          s"$dir — a pathological storm of concurrent UPDATEs")
    }
    -1L // unreachable
  }

  /** [[deleteKeys]] under the NEXT UNUSED delete-keys id — the body
    * behind SQL `DELETE FROM t WHERE <stringCol> IN (...)`. `delk-<id>`
    * is its own marker namespace (crash debris counted —
    * [[occupiedDmlIds]]), same id-race loop as [[deleteBoxesNext]]. */
  private[graft] def deleteKeysNext(spark: SparkSession, dir: String,
      keyCol: String, keys: Seq[Any]): Long = {
    var attempts = 0
    while (true) {
      val next =
        occupiedDmlIds(spark, dir, "delk").foldLeft(-1L)(math.max) + 1L
      if (deleteKeys(spark, dir, keyCol, keys, next)) return next
      attempts += 1
      require(attempts < 16,
        s"deleteKeysNext: lost the delete-id race $attempts times on " +
          s"$dir — a pathological storm of concurrent DELETEs")
    }
    -1L // unreachable
  }

  /** The rewrite predicate of a [[StrShape]], NULL-safe: a NULL
    * string never matches (three-valued logic — the row is kept /
    * untouched, the [[deleteBoxes]] rule); comparisons are Spark's
    * binary UTF-8 order, matching the driver-side pruning. */
  private def strShapeHit(c: String, shape: StrShape)
      : org.apache.spark.sql.Column = {
    val raw = shape match {
      case StrPrefix(p) => col(c).startsWith(lit(p))
      case StrRange(lo, loInc, hi, hiInc) =>
        (lo.map(l => if (loInc) col(c) >= l else col(c) > l).toSeq ++
          hi.map(h => if (hiInc) col(c) <= h else col(c) < h))
          .reduce(_ && _)
    }
    coalesce(raw, lit(false))
  }

  /** Can this unit's string stats admit a [[StrShape]] hit?
    * Conservative: no stats (pre-string-sidecar units, all-null
    * columns) → true. Byte-order comparisons throughout ([[utf8Cmp]],
    * [[utf8PrefixLeq]]) — the same order the predicate evaluates in. */
  private def strShapeMayHit(f: org.apache.hadoop.fs.FileSystem,
      d: org.apache.hadoop.fs.Path, c: String, shape: StrShape)
      : Boolean =
    dirColumnRangeStr(f, d, c) match {
      case Some((mn, mx)) => shape match {
        case StrPrefix(p) =>
          utf8Cmp(mx, p) >= 0 && utf8PrefixLeq(mn, p)
        case StrRange(lo, _, hi, _) =>
          // inclusivity ignored — conservative by a boundary point
          lo.forall(l => utf8Cmp(mx, l) >= 0) &&
            hi.forall(h => utf8Cmp(mn, h) <= 0)
      }
      case None => true
    }

  /** Shared argument contract of the string-range statements: the
    * column must exist and be STRING (same fallback ladder as the
    * keyed statements), and a bounded range must be non-empty in byte
    * order. */
  /** PROVABLY-EMPTY string shape: a bounded range whose lo exceeds
    * hi in byte order, or meets it with an exclusive end — matches no
    * string. The SQL commands run these as clean no-ops (no rewrite,
    * no minted id, no ledger entry — the empty-box rule); the
    * explicit-id API refuses them instead (an empty statement given a
    * permanent id is a caller bug). */
  private[graft] def strShapeEmpty(shape: StrShape): Boolean =
    shape match {
      case StrRange(Some(l), loInc, Some(h), hiInc) =>
        utf8Cmp(l, h) > 0 ||
          (utf8Cmp(l, h) == 0 && !(loInc && hiInc))
      case _ => false
    }

  private def validateStrRangeArgs(spark: SparkSession, dir: String,
      what: String, c: String, shape: StrShape): Unit = {
    require(!strShapeEmpty(shape),
      s"$what: provably-empty range ($shape) — it matches no string; " +
        "the SQL surface no-ops these, the explicit-id API refuses " +
        "them")
    tableSchema(spark, dir)
      .map(s => s.fields.map(fd => fd.name -> fd.dataType).toMap)
      .orElse {
        val (df0, data0) = DedupIngest.fs(spark, s"$dir/data")
        if (!df0.exists(data0) || leafUnits(df0, data0).isEmpty) None
        else Some(read(spark, dir).schema.fields
          .map(fd => fd.name -> fd.dataType).toMap)
      }
      .foreach { known =>
        val dt = known.getOrElse(c,
          throw new IllegalArgumentException(
            s"$what: unknown column '$c' (table has ${known.keySet})"))
        require(dt == org.apache.spark.sql.types.StringType,
          s"$what: column '$c' is ${dt.simpleString} — string-range " +
            "statements only apply to STRING columns; long columns " +
            "take the box surface")
      }
  }

  /** The string-range analogue of [[rewriteKeyedUnits]]: rewrite
    * exactly the units whose STRING stats sidecar admits the shape,
    * behind the `<kind>-<id>` marker, recording column + shape (+
    * assignments) for replica replay. */
  private def rewriteStrRangeUnits(spark: SparkSession, dir: String,
      kind: String, id: Long, c: String, shape: StrShape,
      scopeUpto: Long,
      recBoxes: Seq[Seq[(String, Long, Long)]],
      assigns: Seq[(String, String)] = Nil)(
      transform: (DataFrame, org.apache.spark.sql.Column) => DataFrame =
        (df, hit) => df.filter(!hit)): Boolean = {
    val affects = (f: org.apache.hadoop.fs.FileSystem,
        d: org.apache.hadoop.fs.Path) =>
      unitRows(f, d) > 0 &&
        (scopeUpto == Long.MaxValue ||
          (dirColumnRange(f, d, BatchCol) match {
            case Some((mn, _)) => mn <= scopeUpto
            case None => true
          })) &&
        strShapeMayHit(f, d, c, shape)
    val inShape = strShapeHit(c, shape)
    val hit =
      if (scopeUpto == Long.MaxValue) inShape
      else inShape && col(BatchCol) <= scopeUpto
    rewriteMarkedUnits(spark, dir, kind, id, recBoxes,
      encodeStrRangeSets(c, shape, assigns), affects)(
      df => transform(df, hit))
  }

  /** STRING-RANGE DELETE — the DOMAIN TAKEDOWN statement
    * (`DELETE ... WHERE url LIKE 'https://spam.example/%'`, the most
    * common corpus governance statement after doc-id lists), where
    * neither the box surface (long-only) nor the keyed surface
    * (enumerated points) can reach: the shape selects an open set of
    * strings, pruned by the per-unit STRING min/max sidecar in binary
    * UTF-8 order. Same contract family as [[deleteKeys]]: one
    * maintenance hold, ONE ledger entry (`dels-<deleteId>`), at most
    * one WAL-manifested rewrite per admitted unit, idempotent behind
    * the marker, and RECORDED — [[replicate]] replays the statement on
    * every replica scoped `__batch <= upto`. NULL values never match
    * (kept). Pruning is only as good as the sidecars: units written
    * before the string-stats line (or whose column carries no binary
    * footer stats) conservatively rewrite — correct, slow; `c` SHOULD
    * be a [[Grid.bloomCols]] column, which is what gets the sidecar
    * written.
    *
    * 100 TB: pruning is metadata-only (one small sidecar read per
    * unit, pooled); each admitted unit rewrites once through a
    * codegen'd StartsWith/range filter; nothing collects or
    * shuffles. A prefix that covers the table IS a rewrite — that is
    * what the statement means. */
  def deleteStrPrefix(spark: SparkSession, dir: String, c: String,
      prefix: String, deleteId: Long): Boolean =
    deleteStr(spark, dir, c, StrPrefix(prefix), deleteId)

  /** [[deleteStrPrefix]]'s general form: a one-column string RANGE
    * with optional bounds and per-bound inclusivity (SQL
    * `s BETWEEN 'a' AND 'b'`, `s >= 'a' AND s < 'b'`). */
  def deleteStrRange(spark: SparkSession, dir: String, c: String,
      lo: Option[String], loInc: Boolean,
      hi: Option[String], hiInc: Boolean, deleteId: Long): Boolean =
    deleteStr(spark, dir, c, StrRange(lo, loInc, hi, hiInc), deleteId)

  private[graft] def deleteStr(spark: SparkSession, dir: String,
      c: String, shape: StrShape, deleteId: Long): Boolean = {
    validateStrRangeArgs(spark, dir, "deleteStr", c, shape)
    rewriteStrRangeUnits(spark, dir, "dels", deleteId, c, shape,
      Long.MaxValue, Nil)()
  }

  /** STRING-RANGE in-place UPDATE — [[deleteStrPrefix]]'s REDACTION
    * twin (null out or overwrite payload columns for a domain/prefix
    * slice WITHOUT deleting the rows). [[updateBoxes]]' assignment
    * contract applies unchanged: payload columns only, deterministic
    * environment-free expressions over columns the statement does NOT
    * assign, the selecting column itself not assignable; rows whose
    * value is NULL or outside the shape untouched. */
  def updateStrPrefix(spark: SparkSession, dir: String, c: String,
      prefix: String,
      sets: Seq[(String, org.apache.spark.sql.Column)],
      updateId: Long): Boolean =
    updateStr(spark, dir, c, StrPrefix(prefix), sets, updateId)

  def updateStrRange(spark: SparkSession, dir: String, c: String,
      lo: Option[String], loInc: Boolean,
      hi: Option[String], hiInc: Boolean,
      sets: Seq[(String, org.apache.spark.sql.Column)],
      updateId: Long): Boolean =
    updateStr(spark, dir, c, StrRange(lo, loInc, hi, hiInc), sets,
      updateId)

  private[graft] def updateStr(spark: SparkSession, dir: String,
      c: String, shape: StrShape,
      sets: Seq[(String, org.apache.spark.sql.Column)],
      updateId: Long): Boolean = {
    validateStrRangeArgs(spark, dir, "updateStr", c, shape)
    val setExprs = validateAssignSets(spark, dir, "updateStr", sets)
    require(!sets.exists(_._1 == c),
      s"updateStr: assigning the selecting column '$c' itself under " +
        "a string-range predicate rewrites what the statement means " +
        "on replay — use MERGE (whole-row) or delete + insert")
    val setMap = sets.toMap
    rewriteStrRangeUnits(spark, dir, "upds", updateId, c, shape,
      Long.MaxValue, Nil, setExprs) { (df, hit) =>
      df.select(df.columns.toSeq.map { cc =>
        setMap.get(cc)
          .map(e => when(hit, e).otherwise(col(cc)).as(cc))
          .getOrElse(col(cc))
      }: _*)
    }
  }

  /** [[deleteStr]] under the next unused `dels` id — the body behind
    * SQL `DELETE ... WHERE <stringCol> LIKE 'p%' / BETWEEN ...`.
    * Same id-race loop as its siblings; crash debris counted. */
  private[graft] def deleteStrNext(spark: SparkSession, dir: String,
      c: String, shape: StrShape): Long = {
    var attempts = 0
    while (true) {
      val next =
        occupiedDmlIds(spark, dir, "dels").foldLeft(-1L)(math.max) + 1L
      if (deleteStr(spark, dir, c, shape, next)) return next
      attempts += 1
      require(attempts < 16,
        s"deleteStrNext: lost the delete-id race $attempts times on " +
          s"$dir — a pathological storm of concurrent DELETEs")
    }
    -1L // unreachable
  }

  /** [[updateStr]] under the next unused `upds` id — the body behind
    * SQL `UPDATE ... WHERE <stringCol> LIKE 'p%' / BETWEEN ...`. */
  private[graft] def updateStrNext(spark: SparkSession, dir: String,
      c: String, shape: StrShape,
      sets: Seq[(String, org.apache.spark.sql.Column)]): Long = {
    var attempts = 0
    while (true) {
      val next =
        occupiedDmlIds(spark, dir, "upds").foldLeft(-1L)(math.max) + 1L
      if (updateStr(spark, dir, c, shape, sets, next)) return next
      attempts += 1
      require(attempts < 16,
        s"updateStrNext: lost the update-id race $attempts times on " +
          s"$dir — a pathological storm of concurrent UPDATEs")
    }
    -1L // unreachable
  }

  /** What one [[replicate]] sync did, for operations logging and the
    * battery's premises. */
  final case class ReplicateStats(batchesPulled: Int, dmlReplayed: Int,
      dmlSkippedAsBootstrap: Int, mergesReplayed: Int = 0)

  /** `markers/replica-of` marks a dir [[replicate]] writes into;
    * `markers/promoted` (content: the watermark at promotion) is the
    * PROMOTION fence. Between them they ENFORCE what was previously
    * only documented: an un-promoted replica refuses local writes
    * TYPED (a locally-minted id would shadow the source batch with
    * that id and the next pull would silently skip it), and a promoted
    * replica refuses further pulls (a pull would ingest a source batch
    * under an id the promoted table may have locally reused). */
  private val ReplicaOfMarker = "replica-of"
  private val PromotedMarker = "promoted"

  /** [[replicate]] runs with this > 0 on its thread: the sync IS the
    * replica's one legitimate writer, so the write guards stand down
    * for its own ingests/replays (same-thread only — replicate drives
    * its mutations from the driver thread). */
  private val replicaSyncDepth = new ThreadLocal[Integer] {
    override def initialValue(): Integer = 0
  }

  private def isUnpromotedReplica(
      f: org.apache.hadoop.fs.FileSystem,
      markers: org.apache.hadoop.fs.Path): Boolean =
    f.exists(new org.apache.hadoop.fs.Path(markers, ReplicaOfMarker)) &&
      !f.exists(new org.apache.hadoop.fs.Path(markers, PromotedMarker))

  private def isPromoted(f: org.apache.hadoop.fs.FileSystem,
      markers: org.apache.hadoop.fs.Path): Boolean =
    f.exists(new org.apache.hadoop.fs.Path(markers, PromotedMarker))

  /** Refuse a LOCAL write on an un-promoted replica, typed. Called by
    * every mutator entry ([[ingestBatch]], [[mergeRows]], the
    * [[rewriteMarkedUnits]] core); [[replicate]]'s own writes pass via
    * [[replicaSyncDepth]]. */
  private def refuseReplicaWrite(spark: SparkSession, dir: String,
      what: String): Unit = {
    if (replicaSyncDepth.get() > 0) return
    val (f, markers) = DedupIngest.fs(spark, s"$dir/markers")
    require(!isUnpromotedReplica(f, markers),
      s"LayoutIngest.$what: $dir is a REPLICA (markers/replica-of) — " +
        "its batch ledger mirrors its source, so a locally-minted id " +
        "would shadow the source batch with that id and the next sync " +
        "would silently skip it. Read replicas are read-only; to take " +
        "writes, promoteReplica(dir) first (this permanently fences " +
        "further replicate() pulls).")
  }

  /** PROMOTE a replica to a free-standing writable table — the
    * fail-over/cut-over verb: durably fence the sync cursor
    * (`markers/promoted`, atomic create under the tail lock so a
    * racing sync's pull section observes it), after which local
    * writes mint normally ABOVE the replica's committed watermark
    * (the standard [[nextUnusedIdLocked]] scan — pulls were
    * prefix-only, so everything below is occupied by mirrored source
    * batches) and every further [[replicate]] pull into this dir
    * refuses typed (a pull after local writes could collide with a
    * locally-minted id — the shadow hazard in reverse). Idempotent:
    * promoting twice returns the recorded watermark. Refuses on a dir
    * that was never a replica (nothing to promote — and stamping the
    * fence would be a lie in the ledger). Returns the watermark the
    * promotion fenced at.
    *
    * PROMOTION IS ONE-WAY — the fail-back story is REBUILD, not
    * re-seed: once a promoted table has minted local ids inside what
    * used to be the mirrored prefix's future, no cursor can make the
    * source's and this table's ledgers line up again, so the
    * sanctioned re-subscription is `replicate(src, freshDir)` (a
    * fresh bootstrap pulls current bytes and stamps the statement
    * history without replaying anything — the cheap path by design)
    * and retiring the promoted dir once its unique local writes have
    * been merged back into the source (an ordinary `mergeRows` /
    * append of the post-promotion tail, read via
    * `readSince(promotedAt)`).
    *
    * LOCKING: maintenance THEN tail (the [[mergeRows]] order). The
    * tail lock makes a racing sync's per-batch pull observe the fence
    * exactly; the maintenance lock does the same for the sync's
    * STATEMENT-REPLAY phase ([[rewriteMarkedUnits]] and replayed
    * merges re-check the fence under it) — without it a promotion
    * landing between two replayed statements would let source DML
    * keep applying to a table that just went locally writable. */
  def promoteReplica(spark: SparkSession, dir: String): Long =
    LedgerLock.withLockWait(spark, s"$dir/maint", 5000L) {
    LedgerLock.withLockWait(spark, dir, 5000L) {
      val (f, markers) = DedupIngest.fs(spark, s"$dir/markers")
      require(f.exists(new org.apache.hadoop.fs.Path(markers,
          ReplicaOfMarker)),
        s"promoteReplica: $dir is not a replica (no markers/" +
          s"$ReplicaOfMarker) — only replicate() targets promote")
      val p = new org.apache.hadoop.fs.Path(markers, PromotedMarker)
      if (f.exists(p))
        readMarkerLines(f, p).headOption
          .flatMap(_.trim.toLongOption).getOrElse(-1L)
      else {
        val w = contiguousCommittedBatch(spark, dir)
        val tmp = new org.apache.hadoop.fs.Path(markers,
          s"$PromotedMarker.tmp")
        if (f.exists(tmp)) f.delete(tmp, false)
        val out = f.create(tmp, true)
        try out.write(w.toString.getBytes("UTF-8"))
        finally out.close()
        if (!f.rename(tmp, p))
          throw new IllegalStateException(
            s"promoteReplica: fence publish failed for $dir")
        w
      }
    }
    }

  /** The PROMOTION fence for a sync's own writes: a statement replay
    * or merge replay racing [[promoteReplica]] re-checks the fence at
    * its write's claim point ([[rewriteMarkedUnits]]/[[mergeRows]]
    * call this inside the maintenance section; the pull path checks
    * under the tail lock) — exact, because the promotion holds BOTH
    * locks. Outside a sync (depth 0) this is a no-op: promoted tables
    * legitimately take local writes. */
  private def fencePromotedMidSync(spark: SparkSession, dir: String,
      what: String): Unit = {
    if (replicaSyncDepth.get() <= 0) return
    val (f, markers) = DedupIngest.fs(spark, s"$dir/markers")
    require(!isPromoted(f, markers),
      s"replicate: $dir was promoted mid-sync — $what replay " +
        "aborted (promoted tables never sync again)")
  }

  /** Incremental REPLICA sync — the answer to "RTBF that doesn't
    * reach replicas isn't RTBF": pull the source's new committed batch
    * prefix, then REPLAY the source's recorded DML statements
    * ([[DmlRecord]] — every [[deleteBoxes]]/[[updateBoxes]] commit
    * marker carries its boxes, assignment SQL, global order `seq`, and
    * batch-watermark scope `upto`), so a redaction or deletion on the
    * source converges on every replica that syncs, INCLUDING rows the
    * replica consumed before the statement ran. Call on a cadence (or
    * after any compliance statement) — each call is one incremental,
    * idempotent step.
    *
    * THE CONTRACT, piece by piece:
    *  - The replica ingests each source batch under the SOURCE's
    *    ledger id ([[ingestBatch]] is idempotent per id), so replica
    *    [[BatchCol]] provenance mirrors the source and the replica's
    *    own contiguous watermark IS its applied-prefix cursor — no
    *    second offset store. Pulls take only the contiguous prefix
    *    (the same exactly-once rule as the CDC stream source).
    *  - Replayed statements are scoped `AND __batch <= upto`: rows of
    *    batches the source ingested AFTER the statement were never
    *    touched by it and must not be touched on the replica; rows of
    *    batches <= upto pulled LATER arrive post-statement from the
    *    source (the statement completed before its marker is
    *    visible), so a replay over them must be a no-op — which is
    *    exactly why assignments whose value reads an ASSIGNED column
    *    (`value = value + 1`) are REFUSED here, typed: under
    *    snapshot/replay interleaving they cannot be made exact.
    *    Assignments reading only unassigned columns (null-out,
    *    constant, mask-from-siblings — the redaction shapes) are
    *    idempotent under re-application, so every interleaving
    *    converges to the source's bytes.
    *  - Each replay runs through [[rewriteBoxedUnits]] behind an
    *    `sdml-<srcSeq>` marker: exactly-once per source statement,
    *    crash-replay-exact (own-output skip), stats-pruned to the
    *    affected units, and recorded — a replica can itself be
    *    replicated (chained replays stay scoped by the embedded
    *    provenance bounds).
    *  - A ledger id that was a MERGE replays as the merge itself —
    *    [[mergeRows]] on the replica under the SOURCE id, from the
    *    recorded key + updates snapshot (`mrg-<id>` record +
    *    `markers/mrg-<id>.updates`, written at the source commit):
    *    the append alone would leave the replica's matched old
    *    versions alive forever. Replayed at its exact ledger
    *    position; merges vs box statements order by the shared
    *    global `seq` (all serialized by the source's maintenance
    *    lock), and a statement's batch scope excludes every batch a
    *    later merge appended — the pair always either runs in source
    *    order here or provably commutes. An IN-FLIGHT or owed-replay
    *    merge (intent/record without its commit marker) HOLDS the
    *    pull at the previous id and defers statement replay to the
    *    next sync — the replay arguments need every committed merge
    *    below the cursor applied first.
    *  - A FRESH replica (no batches yet) pulls post-statement bytes
    *    for everything — committed merges pull as plain batches (the
    *    removal already happened at the source) and source statements
    *    recorded before the bootstrap are stamped applied WITHOUT
    *    rewriting anything (an empty `__batch <= -1` scope publishes
    *    just the marker + record) — a 100 TB bootstrap does not
    *    re-run years of retention deletes or corrections.
    *  - REFUSED, typed: payload-less DML markers and merges from
    *    before the record format, and a merge claimed over a
    *    NON-contiguous ledger (its removal listing cannot be aligned
    *    with a batch-prefix replica) — rebuild the replica.
    *
    * NOT a lock-step mirror: between syncs the replica lags by
    * whatever the cadence allows (the standard async-replica
    * contract); after a sync that returns without holding, every
    * source batch <= the source watermark observed at entry and every
    * source statement recorded before it are applied. The replica
    * must not take LOCAL writes: its batch ledger mirrors the
    * source's, so a locally-minted id would shadow the source batch
    * with that id and the pull would silently skip it (read replicas
    * are read-only — the contract every replication system shares). */
  def replicate(spark: SparkSession, srcDir: String, dstDir: String,
      filesPerBatch: Int = 4, lockWaitMs: Long = 30000L)
      : ReplicateStats = {
    val (df1, dmarkers) = DedupIngest.fs(spark, s"$dstDir/markers")
    require(!isPromoted(df1, dmarkers),
      s"replicate: $dstDir was PROMOTED (markers/$PromotedMarker) — " +
        "it takes local writes now, and a pull could collide with a " +
        "locally-minted ledger id; promoted tables never sync again. " +
        "To re-subscribe after a fail-back, REBUILD: replicate into a " +
        "FRESH dir (a bootstrap pulls the source's current bytes and " +
        "stamps its statement history — no snapshots or replays " +
        "needed) and retire this one; there is no in-place re-seed, " +
        "because locally-minted ids cannot be un-minted from the " +
        "mirrored ledger prefix.")
    replicaSyncDepth.set(replicaSyncDepth.get() + 1)
    try replicateBody(spark, srcDir, dstDir, filesPerBatch, lockWaitMs)
    finally replicaSyncDepth.set(replicaSyncDepth.get() - 1)
  }

  /** Package-private for the promotion-fence spec, which drives the
    * body directly to simulate a promotion landing AFTER
    * [[replicate]]'s entry check (the race window the in-loop fences
    * close). */
  private[graft] def replicateBody(spark: SparkSession, srcDir: String,
      dstDir: String, filesPerBatch: Int, lockWaitMs: Long)
      : ReplicateStats = {
    val (sf, smarkers) = DedupIngest.fs(spark, s"$srcDir/markers")
    val srcNames =
      if (!sf.exists(smarkers)) Seq.empty[String]
      else sf.listStatus(smarkers).toSeq.map(_.getPath.getName)
    val (df0, dgrid) = DedupIngest.fs(spark, s"$dstDir/grid")
    if (!df0.exists(dgrid))
      bootstrap(spark, dstDir, readGrid(spark, srcDir))
    // stamp the dir a replica (idempotent; also adopts pre-marker
    // replicas on their next sync): from here on, LOCAL writes refuse
    // typed until promoteReplica — the read-only contract, enforced
    val (dmf, dmarkers0) = DedupIngest.fs(spark, s"$dstDir/markers")
    val replicaOf = new org.apache.hadoop.fs.Path(dmarkers0,
      ReplicaOfMarker)
    if (!dmf.exists(replicaOf)) {
      val out = dmf.create(replicaOf, true)
      try out.write(srcDir.getBytes("UTF-8"))
      finally out.close()
    }
    // source statements recorded BEFORE the pull: their effects are in
    // every byte the pull serves
    val srcRecords = dmlRecords(spark, srcDir)
    srcRecords.filterNot(_.kind == "mrg").find(_.seq < 0).foreach { r =>
      throw new IllegalArgumentException(
        s"replicate: source DML marker ${r.kind}-${r.id} predates " +
          "the statement-record format (no payload) — it cannot be " +
          "replayed on a replica; rebuild the replica from a full read")
    }
    val mergeRec = srcRecords.filter(_.kind == "mrg")
      .map(r => r.id -> r).toMap
    // committed = live commit marker OR a folded mrg record (only
    // committed merges fold); a LIVE record without its marker is the
    // in-flight crash window — the stall case, never committed
    val srcNameSet = srcNames.toSet
    val committedMerges = (srcNames.filter(_.matches("merge-\\d+"))
      .map(_.stripPrefix("merge-").toLong) ++
      srcRecords.filter(r => r.kind == "mrg" &&
        !srcNameSet(s"mrg-${r.id}")).map(_.id)).toSet
    committedMerges.find(id => !mergeRec.contains(id) ||
        mergeRec(id).seq < 0).foreach { id =>
      throw new IllegalArgumentException(
        s"replicate: source merge-$id predates the merge-record " +
          "format (no mrg record / updates snapshot) — its in-place " +
          "row replacement cannot be replayed; rebuild the replica " +
          "from a full read")
    }
    val mergeIntents = srcNames
      .filter(_.matches("merge-\\d+\\.intent"))
      .map(_.stripPrefix("merge-").stripSuffix(".intent").toLong).toSet
    val srcOps = srcRecords.filterNot(_.kind == "mrg").sortBy(_.seq)
    val dstW = contiguousCommittedBatch(spark, dstDir)
    val dstFresh = dstW < 0
    val srcW = contiguousCommittedBatch(spark, srcDir)
    var pulled = 0
    var mergesReplayed = 0
    // ONE provenance-pruned scan per batch, nothing materialized:
    // [[BatchCol]] is in every unit's statistics, so an incremental
    // sync opens only the source's tail units and a bootstrap never
    // checkpoints table-sized state to executor storage (the 100 TB
    // constraint; the cost ceiling is re-reading a folded generation
    // once per batch it spans — bounded by the fold width, and only
    // during bootstrap). Each slice read is individually exact (the
    // publish-point rule); a source statement COMMITTING between two
    // slice jobs can leave early slices pre-statement and late ones
    // post-statement, and the replay step below is what makes every
    // such interleaving converge — the same argument that already
    // covers statements committing between whole syncs.
    //
    // A ledger id that was a MERGE replays as the merge itself
    // (mergeRows on the replica from the recorded key + updates
    // snapshot, under the SOURCE id) — the append alone would leave
    // the replica's matched old versions alive forever. Exact at this
    // position because the record's `upto` (the claim-instant
    // watermark) must equal id-1: every batch the source merge's
    // removal pass saw is already on the replica, and batches the
    // source ingested after are not yet (a merge claimed over a GAP is
    // refused — its removal listing and the replica's prefix cannot be
    // aligned). A batch id carrying a merge intent or record WITHOUT
    // its commit marker is an IN-FLIGHT (or owed-replay) merge: the
    // pull holds at id-1 until the source completes it — the same
    // replay-the-owed-op discipline the source itself runs under.
    var b = dstW + 1
    var stalled = false
    while (b <= srcW && !stalled) {
      if (committedMerges(b) && !dstFresh) {
        val r = mergeRec(b)
        require(r.upto == b - 1,
          s"replicate: source merge-$b was claimed over a " +
            s"non-contiguous ledger (watermark was ${r.upto}) — its " +
            "removal pass cannot be aligned with a batch-prefix " +
            "replica; rebuild the replica from a full read")
        val snapPath = new org.apache.hadoop.fs.Path(
          s"$srcDir/markers/mrg-$b.updates")
        require(sf.exists(snapPath),
          s"replicate: merge-$b's updates snapshot was dropped by " +
            "retention (dropMergeSnapshots) — this replica's cursor " +
            "predates the retention window; rebuild it (a fresh " +
            "bootstrap needs no snapshots)")
        val updates = spark.read.parquet(snapPath.toString)
        require(r.sets.nonEmpty,
          s"replicate: merge-$b's record carries no merge key — " +
            "corrupted record; rebuild the replica from a full read")
        // a NOT-MATCHED-BY-SOURCE delete rides in the record: replay
        // it with the merge — the snapshot carries every kept key, so
        // the replica decides membership exactly as the source did
        val unmatchedDel = r.sets.collectFirst {
          case (UnmatchedDelTag, v) =>
            val sql = java.net.URLDecoder.decode(v, "UTF-8")
            UnmatchedDelete(
              if (sql.isEmpty) None
              else Some(org.apache.spark.sql.functions.expr(sql)))
        }
        if (mergeRows(spark, dstDir, r.sets.head._1, updates, b,
            filesPerBatch, dropUnmatched = unmatchedDel))
          mergesReplayed += 1
      } else if (!committedMerges(b) &&
          (mergeIntents(b) || mergeRec.contains(b))) {
        stalled = true
      } else {
        val slice = provenanceScan(spark, srcDir, b, b)
          .drop(KeyCol, BatchCol)
        LedgerLock.withLockWait(spark, dstDir, lockWaitMs) {
          // a promotion racing this sync fences mid-pull: the fence is
          // created under this same lock, so the check is exact
          require(!isPromoted(dmf, dmarkers0),
            s"replicate: $dstDir was promoted mid-sync — pull aborted")
          if (ingestBatch(slice, b, dstDir, filesPerBatch))
            pulled += 1
          compactMarkersLocked(spark, dstDir)
        }
      }
      if (!stalled) b += 1
    }
    // A STALLED pull skips the statement replay entirely: the replay
    // arguments below lean on "every committed merge <= the position
    // reached is applied before any statement replays" — replaying a
    // statement past an unapplied merge could order it before a merge
    // it followed on the source. The held-back work lands on the next
    // sync, after the source completes its owed merge.
    if (stalled) {
      logWarning(s"LayoutIngest.replicate: pull held at batch $b — " +
        s"the source has an in-flight (or owed-replay) merge there; " +
        "statement replay deferred to the next sync")
      return ReplicateStats(pulled, 0, 0, mergesReplayed)
    }
    // replay (or bootstrap-stamp) the source statements, in the
    // recorded global order
    val appliedSeqs = dmlRecords(spark, dstDir)
      .filter(_.kind == "sdml").map(_.id).toSet
    var replayed = 0
    var stamped = 0
    srcOps.filterNot(r => appliedSeqs(r.seq)).foreach { r =>
      // promotion fence, re-checked per record (and exactly, under
      // the maintenance lock, inside each rewrite): a promoteReplica
      // landing mid-replay must stop source statements from applying
      // to the now-locally-writable table
      require(!isPromoted(dmf, dmarkers0),
        s"replicate: $dstDir was promoted mid-sync — statement " +
          "replay aborted (promoted tables never sync again)")
      val scopeUpto = if (dstFresh) -1L else r.upto
      val scoped = r.boxes.map(_ :+ ((BatchCol, Long.MinValue,
        scopeUpto)))
      if (r.sets.headOption.exists(_._1 == KeyedDmlTag)) {
        // a KEYED statement (source `delk`/`updk`, or a chained
        // replica's `sdml` replay of one — the tag, not the kind,
        // marks the payload): replay scoped `__batch <= upto` like
        // every box statement; a chained record also carries the
        // scope it ITSELF applied under (its recBoxes batch box) —
        // intersect, so a replica-of-a-replica never widens the
        // original statement
        val (kc, keyIsLong, keys, assigns) = decodeKeyedSets(r.sets)
        val recordedScope = r.boxes.flatten.collectFirst {
          case (c, _, hi) if c == BatchCol => hi }
        val keyScope =
          if (dstFresh) -1L
          else math.min(r.upto, recordedScope.getOrElse(Long.MaxValue))
        val known = tableSchema(spark, dstDir)
          .map(_.fieldNames.toSet).getOrElse(Set.empty)
        (kc +: assigns.map(_._1)).foreach { c =>
          require(dstFresh || known.isEmpty || known(c),
            s"replicate: source keyed statement seq ${r.seq} touches " +
              s"'$c', a column this replica has not seen yet (schema " +
              "evolution above a source ledger gap) — re-sync after " +
              "the gap commits")
        }
        if (assigns.isEmpty)
          rewriteKeyedUnits(spark, dstDir, "sdml", r.seq, kc, keyIsLong,
            keys, keyScope,
            recBoxes =
              Seq(Seq((BatchCol, Long.MinValue, keyScope))))(): Unit
        else {
          // keyed UPDATE replay: same replayability gates as the box
          // update below — self-referential and environment-bound
          // assignments cannot re-evaluate to the source's bytes
          val assigned = assigns.map(_._1.toLowerCase).toSet
          val sets = assigns.map { case (c, sql) =>
            val e = org.apache.spark.sql.graftbridge.ColumnBridge
              .catalystExpr(org.apache.spark.sql.functions.expr(sql))
            val refs = e.collect {
              case u: org.apache.spark.sql.catalyst.analysis
                .UnresolvedAttribute => u.nameParts.last.toLowerCase
            }
            require(dstFresh || refs.toSet.intersect(assigned).isEmpty,
              s"replicate: source keyed update seq ${r.seq} assigns " +
                s"'$c' from '$sql', which reads an assigned column — " +
                "self-referential assignments cannot replay exactly " +
                "under at-least-once replication")
            if (!dstFresh) environmentBound(e).foreach(bad =>
              throw new IllegalArgumentException(
                s"replicate: source keyed update seq ${r.seq} " +
                  s"assigns '$c' from '$sql', which reads the " +
                  s"evaluation environment ($bad) — re-evaluating it " +
                  "at replay time diverges replica bytes"))
            c -> org.apache.spark.sql.functions.expr(sql)
          }
          val setMap = sets.toMap
          rewriteKeyedUnits(spark, dstDir, "sdml", r.seq, kc, keyIsLong,
            keys, keyScope,
            recBoxes = Seq(Seq((BatchCol, Long.MinValue, keyScope))),
            assigns = assigns) { (d, hit) =>
            d.select(d.columns.toSeq.map { c =>
              setMap.get(c)
                .map(e => when(hit, e).otherwise(col(c)).as(c))
                .getOrElse(col(c))
            }: _*)
          }: Unit
        }
      } else if (r.sets.headOption.exists(_._1 == StrRangeDmlTag)) {
        // a STRING-RANGE statement (source `dels`/`upds`, or a
        // chained replica's `sdml` replay of one): replay scoped
        // `__batch <= upto` like every statement; a chained record's
        // own batch box intersects, so a replica-of-a-replica never
        // widens the original
        val (sc, shape, strAssigns) = decodeStrRangeSets(r.sets)
        val recordedScope = r.boxes.flatten.collectFirst {
          case (c, _, hi) if c == BatchCol => hi }
        val strScope =
          if (dstFresh) -1L
          else math.min(r.upto, recordedScope.getOrElse(Long.MaxValue))
        val known = tableSchema(spark, dstDir)
          .map(_.fieldNames.toSet).getOrElse(Set.empty)
        (sc +: strAssigns.map(_._1)).foreach { c =>
          require(dstFresh || known.isEmpty || known(c),
            s"replicate: source string-range statement seq ${r.seq} " +
              s"touches '$c', a column this replica has not seen yet " +
              "(schema evolution above a source ledger gap) — " +
              "re-sync after the gap commits")
        }
        if (strAssigns.isEmpty)
          rewriteStrRangeUnits(spark, dstDir, "sdml", r.seq, sc, shape,
            strScope,
            recBoxes =
              Seq(Seq((BatchCol, Long.MinValue, strScope))))(): Unit
        else {
          // string-range UPDATE replay: the same replayability gates
          // as the keyed/box updates — defense-in-depth for records
          // minted by foreign/older writers
          val assigned = strAssigns.map(_._1.toLowerCase).toSet
          val sets = strAssigns.map { case (c, sql) =>
            val e = org.apache.spark.sql.graftbridge.ColumnBridge
              .catalystExpr(org.apache.spark.sql.functions.expr(sql))
            val refs = e.collect {
              case u: org.apache.spark.sql.catalyst.analysis
                .UnresolvedAttribute => u.nameParts.last.toLowerCase
            }
            require(dstFresh || refs.toSet.intersect(assigned).isEmpty,
              s"replicate: source string-range update seq ${r.seq} " +
                s"assigns '$c' from '$sql', which reads an assigned " +
                "column — self-referential assignments cannot replay " +
                "exactly under at-least-once replication")
            if (!dstFresh) environmentBound(e).foreach(bad =>
              throw new IllegalArgumentException(
                s"replicate: source string-range update seq ${r.seq} " +
                  s"assigns '$c' from '$sql', which reads the " +
                  s"evaluation environment ($bad) — re-evaluating it " +
                  "at replay time diverges replica bytes"))
            c -> org.apache.spark.sql.functions.expr(sql)
          }
          val setMap = sets.toMap
          rewriteStrRangeUnits(spark, dstDir, "sdml", r.seq, sc, shape,
            strScope,
            recBoxes = Seq(Seq((BatchCol, Long.MinValue, strScope))),
            assigns = strAssigns) { (d, hit) =>
            d.select(d.columns.toSeq.map { c =>
              setMap.get(c)
                .map(e => when(hit, e).otherwise(col(c)).as(c))
                .getOrElse(col(c))
            }: _*)
          }: Unit
        }
      } else if (r.sets.isEmpty) {
        rewriteBoxedUnits(spark, dstDir, "sdml", r.seq, scoped,
          Nil)((d, hit) => d.filter(!hit)): Unit
      } else {
        val assigned = r.sets.map(_._1.toLowerCase).toSet
        // an assigned column the replica has never seen (schema
        // evolution via a still-gapped source batch) must refuse, not
        // silently no-op the projection — the sync retries after the
        // gap commits and the evolving batch arrives
        val known = tableSchema(spark, dstDir)
          .map(_.fieldNames.toSet).getOrElse(Set.empty)
        r.sets.foreach { case (c, _) =>
          require(dstFresh || known.isEmpty || known(c),
            s"replicate: source update seq ${r.seq} assigns '$c', a " +
              "column this replica has not seen yet (schema evolution " +
              "above a source ledger gap) — re-sync after the gap " +
              "commits")
        }
        val sets = r.sets.map { case (c, sql) =>
          val e = org.apache.spark.sql.graftbridge.ColumnBridge
            .catalystExpr(org.apache.spark.sql.functions.expr(sql))
          val refs = e.collect {
            case u: org.apache.spark.sql.catalyst.analysis
              .UnresolvedAttribute => u.nameParts.last.toLowerCase
          }
          // a BOOTSTRAP stamp (empty scope) never evaluates the
          // assignment, so even a self-referential statement is safe
          // to mark applied — its effects are in every pulled byte
          require(dstFresh || refs.toSet.intersect(assigned).isEmpty,
            s"replicate: source update seq ${r.seq} assigns '$c' " +
              s"from '$sql', which reads an assigned column — " +
              "self-referential assignments cannot replay exactly " +
              "under at-least-once replication (a replica may see " +
              "pre- or post-statement bytes); redactions must read " +
              "only columns the statement leaves untouched")
          // defense-in-depth twin of [[updateBoxes]]'s record-time
          // gate, for records minted by foreign/older writers: an
          // environment-bound value (now(), rand()) re-evaluates to
          // DIFFERENT bytes here than it did at the source — silent
          // divergence, refused typed (a fresh bootstrap never
          // evaluates the assignment; the stamp stays safe)
          if (!dstFresh) environmentBound(e).foreach(bad =>
            throw new IllegalArgumentException(
              s"replicate: source update seq ${r.seq} assigns '$c' " +
                s"from '$sql', which reads the evaluation environment " +
                s"($bad) — re-evaluating it at replay time diverges " +
                "replica bytes from source bytes; such statements " +
                "cannot replicate (and current writers refuse them at " +
                "record time)"))
          c -> org.apache.spark.sql.functions.expr(sql)
        }
        val setMap = sets.toMap
        rewriteBoxedUnits(spark, dstDir, "sdml", r.seq, scoped,
          r.sets) { (d, hit) =>
          d.select(d.columns.toSeq.map { c =>
            setMap.get(c)
              .map(e => when(hit, e).otherwise(col(c)).as(c))
              .getOrElse(col(c))
          }: _*)
        }: Unit
      }
      if (dstFresh) stamped += 1 else replayed += 1
    }
    ReplicateStats(pulled, replayed, stamped, mergesReplayed)
  }

  /** RETENTION for the merge replay snapshots: drop the
    * `markers/mrg-<id>.updates` frames for merge ids <= `uptoBatch` —
    * the knob that keeps a merge-heavy table's replay state bounded
    * (every CDC system's retention trade: Kafka ages out segments the
    * same way). The statement RECORDS (`mrg-<id>`) and idempotence
    * markers are NOT touched — history, minting and in-flight
    * detection stay exact. A replica whose cursor still predates a
    * dropped snapshot can no longer sync incrementally
    * ([[replicate]] refuses typed at that merge); rebuild it — a
    * FRESH bootstrap never reads snapshots. Returns how many
    * snapshots dropped. */
  def dropMergeSnapshots(spark: SparkSession, dir: String,
      uptoBatch: Long): Int =
    withMaintLock(spark, dir) {
      val (f, markers) = DedupIngest.fs(spark, s"$dir/markers")
      if (!f.exists(markers)) 0
      else f.listStatus(markers).toSeq.map(_.getPath.getName)
        .filter(_.matches("mrg-\\d+\\.updates"))
        .filter(_.stripPrefix("mrg-").stripSuffix(".updates")
          .toLong <= uptoBatch)
        .count(n => f.delete(
          new org.apache.hadoop.fs.Path(markers, n), true))
    }

  /** [[mergeRows]] under the NEXT UNUSED ledger id — the body behind
    * SQL `MERGE INTO` on the relation. Mint-then-merge with a bounded
    * retry on [[StaleBatchIdException]] (a concurrent writer claiming
    * the advisory id between the mint and the merge's atomic freshness
    * guard); every retry means another writer COMMITTED, so the loop
    * terminates. Returns the ledger id the merge committed under. */
  private[graft] def mergeRowsNext(spark: SparkSession, dir: String,
      keyCol: String, updates: DataFrame,
      filesPerBatch: Int = 4,
      classifiedAt: Option[String] = None,
      dropUnmatched: Option[UnmatchedDelete] = None): Long = {
    var attempts = 0
    while (true) {
      val id = nextUnusedId(spark, dir)
      try {
        mergeRows(spark, dir, keyCol, updates, id, filesPerBatch,
          classifiedAt = classifiedAt,
          dropUnmatched = dropUnmatched): Unit
        return id
      } catch {
        case e: StaleBatchIdException =>
          attempts += 1
          require(attempts < 16,
            s"mergeRowsNext: lost the ledger-id race $attempts times " +
              s"on $dir — a pathological storm of concurrent writers " +
              s"(last: ${e.getMessage})")
      }
    }
    -1L // unreachable
  }

  /** [[mergeRows]] auto-split for CORPUS-SCALE backfills: a merge
    * whose distinct keys exceed `maxKeysPerMerge` lands as N
    * sub-merges over DISJOINT deterministic key buckets
    * (`xxhash64(key) mod N` — disjointness is what makes the split
    * exact: every target row matches at most one sub-merge, so the N
    * statements commute and any serial order yields the same table),
    * each an ordinary [[mergeRowsNext]]: its own ledger id, its own
    * recorded statement + updates snapshot, so REPLICAS converge by
    * replaying the sub-merges at their exact positions with no new
    * machinery. The updates plan pins ONCE (localCheckpoint) — every
    * bucket filter reads the same rows, the usual MERGE
    * materialization argument. Bucket counts are VERIFIED before any
    * commit (hash skew on distinct keys is tiny, but a pathological
    * key set gets more buckets, doubling until every bucket fits —
    * bounded: log2 rounds).
    *
    * NOT one atomic statement: sub-merges commit one by one, and a
    * crash between them leaves a prefix applied (each sub-merge is
    * itself crash-exact). The split is CRASH-RESUMABLE: before any
    * sub-merge commits, the updates pin DURABLY
    * (`markers/chunk-<nonce>.updates` — a localCheckpoint dies with
    * the JVM) and a PLAN file (`markers/chunk-<nonce>.plan`, written
    * whole + renamed after every sub-merge) records the owner, the
    * bucket layout, the planned non-empty buckets and each committed
    * (bucket, ledgerId) pair; [[resumeChunkedMerges]] — run by
    * [[vacuum]] — finishes the remaining buckets of a provably-dead
    * owner's plan, so the committed prefix keeps its ids and only the
    * owed suffix merges (a blind caller retry would re-merge
    * everything under all-fresh ids). A crash BETWEEN a sub-merge's
    * commit and its plan rewrite re-merges that ONE bucket — value-
    * idempotent (same keys replace to the same bytes), one extra
    * ledger id, the bounded version of the old full-retry cost.
    * Callers needing single-statement atomicity stay under
    * [[MaxMergeKeys]] (or use `dropUnmatched` for full syncs).
    *
    * Returns the committed ledger ids in commit order. 100 TB: the
    * split adds ONE hash-filter pass per bucket over the pinned
    * updates plus one durable write of the updates (the resume
    * input); per-bucket emptiness comes from the SIZING pass's counts
    * (no extra job per bucket); everything else is N ordinary bounded
    * merges — driver key collections and record sizes stay under the
    * per-merge caps by construction. */
  def mergeRowsChunkedNext(spark: SparkSession, dir: String,
      keyCol: String, updates: DataFrame, filesPerBatch: Int = 4,
      maxKeysPerMerge: Int = MaxMergeKeys.toInt): Seq[Long] = {
    require(maxKeysPerMerge > 0 && maxKeysPerMerge <= MaxMergeKeys,
      s"mergeRowsChunkedNext: maxKeysPerMerge must be in " +
        s"[1, $MaxMergeKeys]")
    val snap = updates.localCheckpoint(true)
    val nKeys = snap.agg(countDistinct(col(keyCol))).head().getLong(0)
    if (nKeys <= maxKeysPerMerge)
      return Seq(mergeRowsNext(spark, dir, keyCol, snap, filesPerBatch))
    // slack so hash skew rarely needs a second round; verify exactly
    var buckets = math.max(2,
      math.ceil(nKeys / (maxKeysPerMerge * 0.8)).toInt)
    var rounds = 0
    while (true) {
      rounds += 1
      require(rounds <= 20,
        "mergeRowsChunkedNext: bucket sizing failed to converge — " +
          "pathological key distribution")
      val bucket = pmod(xxhash64(col(keyCol)), lit(buckets.toLong))
      // ONE sizing job returns every bucket's distinct-key count:
      // both the cap check and per-bucket emptiness (an empty bucket
      // merges nothing and must not burn an id) come from it — no
      // per-bucket isEmpty jobs
      val counts = snap.groupBy(bucket.as("__b"))
        .agg(countDistinct(col(keyCol)).as("__n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      if (counts.values.forall(_ <= maxKeysPerMerge)) {
        val planned = (0 until buckets).map(_.toLong)
          .filter(counts.contains)
        val (f, markers) = DedupIngest.fs(spark, s"$dir/markers")
        f.mkdirs(markers)
        val nonce = java.util.UUID.randomUUID().toString.take(8)
        snap.write.mode("overwrite")
          .parquet(s"$dir/markers/chunk-$nonce.updates")
        var committed = Seq.empty[(Long, Long)]
        var seq = 0
        def writePlan(): Unit = {
          writeChunkPlan(f, markers, nonce, seq, keyCol, buckets,
            filesPerBatch, planned, committed)
          seq += 1
        }
        writePlan()
        val ids = planned.map { c =>
          val id = mergeRowsNext(spark, dir, keyCol,
            snap.filter(bucket === c), filesPerBatch)
          committed :+= (c -> id)
          writePlan()
          id
        }
        dropChunkPlan(f, markers, nonce)
        return ids
      }
      buckets *= 2
    }
    Nil // unreachable
  }

  /** Publish plan version `seq` (written whole + renamed to a NEW
    * name — there is never a moment with no readable plan: version
    * `seq-1` survives until `seq` is live), then drop the superseded
    * versions. A torn superseded-delete leaves extra versions;
    * readers take the highest, and a missing B line only re-merges a
    * value-idempotent bucket. */
  private def writeChunkPlan(f: org.apache.hadoop.fs.FileSystem,
      markers: org.apache.hadoop.fs.Path, nonce: String, seq: Int,
      keyCol: String, buckets: Int, filesPerBatch: Int,
      planned: Seq[Long], committed: Seq[(Long, Long)]): Unit = {
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    val owner = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getName
    val lines = Seq(s"graft-chunk v1 $nonce", s"O\t$owner",
      s"K\t${enc(keyCol)}", s"N\t$buckets", s"F\t$filesPerBatch") ++
      planned.map(c => s"P\t$c") ++
      committed.map { case (c, id) => s"B\t$c\t$id" }
    val tmp = new org.apache.hadoop.fs.Path(markers,
      s"chunk-$nonce.plan-$seq.tmp")
    if (f.exists(tmp)) f.delete(tmp, false)
    val out = f.create(tmp, true)
    try out.write(lines.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    val plan = new org.apache.hadoop.fs.Path(markers,
      s"chunk-$nonce.plan-$seq")
    if (f.exists(plan)) f.delete(plan, false)
    if (!f.rename(tmp, plan))
      throw new IllegalStateException(
        s"mergeRowsChunkedNext: plan publish failed for chunk-$nonce")
    chunkPlanVersions(f, markers, nonce).filter(_._1 < seq)
      .foreach(v => f.delete(v._2, false): Unit)
  }

  private def chunkPlanVersions(f: org.apache.hadoop.fs.FileSystem,
      markers: org.apache.hadoop.fs.Path, nonce: String)
      : Seq[(Int, org.apache.hadoop.fs.Path)] =
    f.listStatus(markers).toSeq.map(_.getPath)
      .filter(_.getName.matches(
        s"chunk-$nonce\\.plan-\\d+"))
      .map(p => (p.getName.split("-").last.toInt, p))

  private def dropChunkPlan(f: org.apache.hadoop.fs.FileSystem,
      markers: org.apache.hadoop.fs.Path, nonce: String): Unit = {
    chunkPlanVersions(f, markers, nonce)
      .foreach(v => f.delete(v._2, false): Unit)
    f.delete(new org.apache.hadoop.fs.Path(markers,
      s"chunk-$nonce.updates"), true): Unit
  }

  /** Finish the owed buckets of CRASHED chunked merges (the
    * [[mergeRowsChunkedNext]] plan files): for each plan whose owner
    * is PROVABLY dead (same-host exited pid — the [[LedgerLock]]
    * rule; a live or foreign-host owner is skipped unless `force`,
    * the operator's cross-host break), merge the planned-minus-
    * committed buckets from the durable updates snapshot, then retire
    * the plan. Run by [[vacuum]] OUTSIDE its maintenance hold (each
    * sub-merge takes its own locks — [[LedgerLock]] is not
    * reentrant). Returns sub-merges completed. */
  def resumeChunkedMerges(spark: SparkSession, dir: String,
      force: Boolean = false): Int = {
    val (f, markers) = DedupIngest.fs(spark, s"$dir/markers")
    if (!f.exists(markers)) return 0
    def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")
    var done = 0
    val nonces = f.listStatus(markers).toSeq.map(_.getPath.getName)
      .flatMap {
        case n if n.matches("chunk-[0-9a-f]{8}\\.plan-\\d+") =>
          Some(n.stripPrefix("chunk-").takeWhile(_ != '.'))
        case _ => None
      }.distinct
    nonces.foreach { nonce =>
      val versions = chunkPlanVersions(f, markers, nonce)
      if (versions.nonEmpty) {
        val (topSeq, p) = versions.maxBy(_._1)
        val lines = readMarkerLines(f, p)
        val owner = lines.collectFirst {
          case l if l.startsWith("O\t") => l.drop(2) }.getOrElse("")
        val ownerDead =
          LedgerLock.holderProvablyDead(s"$owner:plan")
        if (ownerDead || force) {
          val keyCol = lines.collectFirst {
            case l if l.startsWith("K\t") => dec(l.drop(2)) }.get
          val buckets = lines.collectFirst {
            case l if l.startsWith("N\t") => l.drop(2).toInt }.get
          val filesPerBatch = lines.collectFirst {
            case l if l.startsWith("F\t") => l.drop(2).toInt }.get
          val planned = lines.filter(_.startsWith("P\t"))
            .map(_.drop(2).toLong)
          var committedPairs = lines.filter(_.startsWith("B\t"))
            .map { l =>
              val t = l.drop(2).split("\t")
              (t(0).toLong, t(1).toLong)
            }
          val owed = planned.filterNot(committedPairs.map(_._1).toSet)
          if (owed.nonEmpty) {
            val snap = spark.read
              .parquet(s"$dir/markers/chunk-$nonce.updates")
            val bucket = pmod(xxhash64(col(keyCol)),
              lit(buckets.toLong))
            var seq = topSeq + 1
            owed.foreach { c =>
              val id = mergeRowsNext(spark, dir, keyCol,
                snap.filter(bucket === c), filesPerBatch)
              committedPairs :+= (c -> id)
              writeChunkPlan(f, markers, nonce, seq, keyCol, buckets,
                filesPerBatch, planned, committedPairs)
              seq += 1
              done += 1
            }
          }
          dropChunkPlan(f, markers, nonce)
        }
      }
    }
    done
  }

  /** Probing every merge key against every unit bloom is driver work
    * (keys × units × ~7 hashes); above this many distinct keys the
    * unit selection falls back to stats-range pruning alone — still
    * correct (conservative), and a merge that large is mis-sized
    * anyway (see [[mergeRows]]'s contract). */
  private val BloomProbeMaxKeys = 1 << 16

  /** Hard ceiling on one merge batch's distinct keys: the keys are
    * collected to the driver to drive unit pruning, and a "merge"
    * rewriting a corpus-sized key set is a regrid in disguise — split
    * it or rewrite the table. */
  private val MaxMergeKeys = 1 << 22

  /**
   * Row-keyed MERGE (upsert) — the generalization of the reference's
   * K5/K6 row-keyed update sinks (reference VariantStore pattern,
   * `HrdpVariants.java`-style "update these rows by id") to the
   * clustered table: every live row whose `keyCol` appears in
   * `updates` is REPLACED by the update row; keys not present yet are
   * plain inserts. Implemented as delete+append under the existing
   * WAL/marker protocol, so nothing new has to be trusted:
   *
   *  1. the `updates` plan is MATERIALIZED ONCE on entry (an eager
   *     `localCheckpoint`): validation, key pruning, the anti-join and
   *     the append all read the same pinned rows, so a
   *     non-deterministic plan (rand/sample/limit) or a source that
   *     changes mid-merge — including a plan over THIS table's own
   *     files — can never make the deleted key set and the appended
   *     rows disagree (the silent-row-loss hazard every MERGE
   *     implementation materializes against);
   *  2. the updates land FIRST, as ONE ordinary ingest batch via
   *     [[ingestBatch]] under a short tail-lock section — keyed,
   *     range-partitioned, published behind the atomic rename +
   *     `batch-<batchId>` marker, visible to CDC consumers as new rows
   *     of that batch;
   *  3. units that might hold a PRE-MERGE matching key are found from
   *     the sidecars — `__batch` span (units entirely ≥ `batchId` are
   *     exempt by definition, the appended batch first among them),
   *     stats range `[min(keys), max(keys)]`, then the per-unit Bloom
   *     filters when `keyCol` is a [[Grid.bloomCols]] column (the
   *     q166/q170 machinery: a unit whose bloom excludes every key is
   *     never opened, let alone rewritten);
   *  4. each affected unit rewrites through the same staged
   *     WAL-manifest as [[deleteBox]], dropping its matching-key rows
   *     with `__batch < batchId` (a broadcast anti-join on the keys —
   *     the data path never collects). Because the append is already
   *     published, a concurrent reader during the rewrites sees AT
   *     WORST transient duplicates (old + new row both live) — the
   *     benign anomaly for an upsert; the old append-last order had a
   *     transient-ABSENCE window (neither version visible), a state no
   *     serial history produces.
   *
   * SEMANTICS under concurrency: the merge applies exactly at ledger
   * position `batchId` — it replaces matching-key rows ingested by
   * batches `< batchId` and leaves rows of batches `≥ batchId`
   * (including its own append, and any batch a live stream publishes
   * while the rewrites run) untouched, so every interleaving
   * serializes as "the merge happened at its id". `batchId` comes from
   * the SAME sequence as the stream's ingest batches (it IS an ingest
   * batch) and must be fresh — merging under a committed id would
   * delete without appending, and is refused up front, atomically
   * under the tail lock. With a live stream, coordinate the id with
   * the stream's checkpoint (the stream's NEXT id is its state — a
   * merge stealing it would turn that future batch's replay into a
   * silent no-op); the stream itself keeps flowing: it contends with
   * the merge only for the short append section, never for the
   * rewrites — and tail-lock contention is resolved by BOUNDED
   * WAITING, not failure: the merge's inner tail acquire waits out a
   * live holder for up to `tailWaitMs` (and the stream's ingest
   * section waits `lockWaitMs` on [[start]]), so the loser of the
   * race sleeps through the winner's short marker-metadata section
   * instead of failing the job; only a holder that outlives the
   * budget (a stuck writer — a genuine contract violation) still
   * throws [[LedgerLock.ConcurrentWriterException]] naming it.
   *
   * A merge with ZERO keys still BURNS its id: it stamps
   * `batch-<batchId>` (an empty committed batch, the empty-micro-batch
   * convention) plus its merge marker, so a later stream batch can
   * never reuse the id and [[history]] stays unambiguous.
   *
   * `dropUnmatched` is SQL's `WHEN NOT MATCHED BY SOURCE [AND gate]
   * THEN DELETE` — the full-sync dimension statement (target rows
   * whose key is ABSENT from `updates`, optionally gated by a
   * deterministic target-row predicate, are deleted in the SAME
   * rewrite pass, scoped `__batch < batchId` like the replacement
   * drops). ONE atomic statement, one ledger id, crash-exact behind
   * the same markers; serializable for free — membership is decided
   * per row AGAINST THE PINNED SNAPSHOT at apply position `batchId`,
   * no classification read to go stale. Recorded in the `mrg` record
   * (gate SQL URL-encoded), and replayed on replicas from the updates
   * snapshot — the complement is never enumerated, so the statement
   * scales to any target size (it IS a table-wide rewrite: every
   * pre-merge unit may hold an unmatched row, so pruning is off by
   * construction — that is what a full sync means). Standard SQL
   * semantics for NULL keys: a NULL-keyed target row matches nothing,
   * so it is "not matched by source" and deletes (gate permitting) —
   * the ONE spot where the engine's keep-NULL-rows delete rule yields
   * to the SQL MERGE contract. The gate must be environment-free
   * (recorded SQL, re-evaluated at replay — the [[updateBoxes]]
   * rule); an empty `updates` with `dropUnmatched` is a gated
   * FULL-TABLE delete (nothing appends, everything unmatched).
   * Incompatible with the chunked split ([[mergeRowsChunkedNext]] —
   * each sub-merge would delete its own bucket's complement).
   *
   * Idempotent and crash-exact behind a `merge-<batchId>` marker with
   * an intent twin (the IndexIngest two-state pattern):
   * `merge-<batchId>.intent` is created atomically BEFORE any
   * mutation, the commit marker AFTER everything. Crash matrix:
   * before the intent → nothing happened; after the intent, anywhere →
   * a replay (same batchId, same updates — the caller's replay
   * contract, as for ingestBatch) skips the freshness guard, re-drives
   * [[ingestBatch]] (a no-op once its marker exists), re-runs the
   * rewrites (already-filtered units rewrite to themselves; the
   * appended rows are protected by the `__batch ≥ batchId` exemption
   * wherever a fold may have carried them), re-stamps the commit
   * marker, drops the intent. After the commit marker → false, O(1).
   *
   * Like [[deleteBox]], replaced row versions are destructive across
   * history: [[readAsOf]] views before `batchId` do not resurrect the
   * old values of merged keys (the RTBF rule — a correction exists to
   * supersede the record everywhere).
   *
   * Constraints: `keyCol` must be a LONG or STRING column (the bloom
   * sidecar types — a training corpus keyed on string doc ids merges
   * as naturally as a numeric event log; string keys prune by bloom
   * alone, since min/max range sidecars are long-only); `updates` must
   * carry distinct, non-null keys (last-wins inside one batch is
   * undefined) and at most [[MaxMergeKeys]] of them; pruning is only
   * as good as the sidecars — declare `keyCol` in [[Grid.bloomCols]]
   * or cluster on a correlate, or every pre-merge unit conservatively
   * rewrites (correct, slow). The materialized updates live as
   * executor-local blocks for the merge's duration (correction-sized
   * by contract); an executor loss mid-merge fails the job — replay
   * it. 100 TB: the keys collect once to the driver (correction-sized
   * by contract), the rewrites touch only sidecar-hit units, the
   * append is one ordinary clustered batch.
   */
  /** The NOT-MATCHED-BY-SOURCE side of a [[mergeRows]]: delete target
    * rows whose key is absent from the updates, `gate` (target-row
    * predicate) permitting. */
  final case class UnmatchedDelete(
      gate: Option[org.apache.spark.sql.Column] = None)

  /** `sets` tag carrying [[UnmatchedDelete]] in the `mrg` record:
    * value = URL-encoded gate SQL, empty for ungated. */
  private val UnmatchedDelTag = "__graft_unmatched_del"

  def mergeRows(spark: SparkSession, dir: String, keyCol: String,
      updates: DataFrame, batchId: Long,
      filesPerBatch: Int = 4, tailWaitMs: Long = 5000L,
      classifiedAt: Option[String] = None,
      dropUnmatched: Option[UnmatchedDelete] = None): Boolean = {
    refuseReplicaWrite(spark, dir, "mergeRows")
    // the gate is recorded as SQL and re-evaluated per unit rewrite
    // and at replica replay — the updateBoxes record-time rule
    val unmatchedRec: Option[String] = dropUnmatched.map { ud =>
      ud.gate.map { g =>
        val ex = org.apache.spark.sql.graftbridge.ColumnBridge
          .catalystExpr(g)
        environmentBound(ex).foreach(bad =>
          throw new IllegalArgumentException(
            "mergeRows: the NOT MATCHED BY SOURCE gate reads the " +
              s"evaluation environment ($bad) — it cannot decide the " +
              "same rows on replay or replica sync"))
        ex.sql
      }.getOrElse("")
    }
    val (f, markers) = DedupIngest.fs(spark, s"$dir/markers")
    val marker = new org.apache.hadoop.fs.Path(markers, s"merge-$batchId")
    if (f.exists(marker) || dmlLogEntries(spark, dir)
        .exists(r => r.kind == "mrg" && r.id == batchId)) {
      // lock-free early exit (markers are create-only, and a FOLDED
      // mrg record in the dml-log is the same committed-proof — only
      // committed merges fold): retire a stale
      // intent (a crash between the commit marker and the intent
      // delete) so history() and the ledger stay clean
      f.delete(new org.apache.hadoop.fs.Path(markers,
        s"merge-$batchId.intent"), false): Unit
      return false
    }
    require(updates.schema.fieldNames.contains(keyCol),
      s"mergeRows: updates carry no '$keyCol' column")
    val keyIsLong = updates.schema(keyCol).dataType ==
      org.apache.spark.sql.types.LongType
    require(keyIsLong || updates.schema(keyCol).dataType ==
        org.apache.spark.sql.types.StringType,
      s"mergeRows: key column '$keyCol' must be LONG or STRING " +
        s"(the bloom-column types), got " +
        updates.schema(keyCol).dataType.simpleString)
    // materialize ONCE (doc item 1) — every later use reads the pinned
    // snapshot, never re-executes the caller's plan
    val snap = updates.localCheckpoint(true)
    // one aggregate validates the key contract and bounds the range —
    // read-only, so it runs BEFORE the intent (a refused merge must
    // leave no ledger debris)
    val a = snap.agg(
      count(col(keyCol)), countDistinct(col(keyCol)), count(lit(1)),
      min(col(keyCol)), max(col(keyCol))).head()
    require(a.getLong(0) == a.getLong(2),
      "mergeRows: null merge keys are not supported")
    require(a.getLong(0) == a.getLong(1),
      "mergeRows: duplicate keys inside one merge batch — last-wins " +
        "is undefined; dedup the updates first")
    val nKeys = a.getLong(1)
    require(nKeys <= MaxMergeKeys,
      s"mergeRows: $nKeys distinct keys — a merge this large is a " +
        "rewrite in disguise; use mergeRowsChunkedNext (disjoint " +
        "key-bucket sub-merges) or regrid")
    // MAINTENANCE for the whole merge (fail-fast here, before any
    // mutation — rewriter exclusion), with a SHORT tail section nested
    // inside for the freshness guard + append (the only maint→tail
    // nesting; see the object doc's lock-split section)
    withMaintLock(spark, dir) {
      fencePromotedMidSync(spark, dir, s"merge-$batchId")
      recoverCompact(spark, dir)
      adoptOrphanBatches(spark, dir)
      val intent = new org.apache.hadoop.fs.Path(markers,
        s"merge-$batchId.intent")
      LedgerLock.withLockWait(spark, dir, tailWaitMs) {
        if (!f.exists(intent)) {
          // freshness guard — only on the FIRST attempt (a replay
          // finds the intent; by then the id is legitimately ours);
          // atomic with the append: the tail lock freezes the id
          if (batchId <= batchWatermark(f, markers) ||
              f.exists(new org.apache.hadoop.fs.Path(markers,
                s"batch-$batchId")))
            throw new StaleBatchIdException(
              s"mergeRows: batch id $batchId is already committed in " +
                "this table's ledger — merging under it would delete " +
                "without appending; use the next unused ingest id")
          // a txn-stream's reservation owns its id even before the
          // batch marker lands (the stream's owed in-flight replay)
          val reserved = f.listStatus(markers).toSeq
            .map(_.getPath.getName).exists {
              case TxnMarker(_, i, _) => i == batchId
              case _ => false
            }
          if (reserved)
            throw new StaleBatchIdException(
              s"mergeRows: batch id $batchId is reserved by a live " +
                "stream transaction — its owed replay would collide; " +
                "use the next unused ingest id")
          // CLASSIFICATION GUARD (first attempt only — a replay's
          // classification already committed with the intent): the
          // caller read the table to classify its source rows
          // (matched/unmatched key membership) and recorded the
          // [[ledgerStamp]] it saw BEFORE that read; if any write
          // committed since — a batch, a delete, another merge — the
          // classification may be stale, and committing this merge
          // would gate rows against a state no serial history
          // produces. Atomic here: this merge holds MAINTENANCE (no
          // DML/merge can commit) and the TAIL lock (no batch can
          // commit), so an equal stamp proves the read is still
          // current at the claim instant.
          classifiedAt.foreach { st =>
            val now = ledgerStamp(spark, dir)
            if (now != st)
              throw new StaleClassificationException(
                s"mergeRows: the table committed writes between the " +
                  s"caller's classification read ($st) and this " +
                  s"merge's claim ($now) — redo the classification " +
                  "and retry the statement")
          }
          // the intent CARRIES the contiguous watermark at the claim
          // instant (guaranteed <= batchId - 1: the guard just proved
          // batch-<batchId> is unminted) — the provenance scope a
          // REPLICA replays this merge under. Written whole + renamed
          // so an existing intent always parses; a crashed attempt's
          // replay must not recompute it (its own appended batch
          // marker would fake a tighter prefix than the merge saw).
          val itmp = new org.apache.hadoop.fs.Path(markers,
            s"merge-$batchId.intent.tmp")
          if (f.exists(itmp)) f.delete(itmp, false)
          val iout = f.create(itmp, true)
          try iout.write(contiguousCommittedBatch(spark, dir)
            .toString.getBytes("UTF-8"))
          finally iout.close()
          if (!f.rename(itmp, intent))
            throw new IllegalStateException(
              s"mergeRows: intent publish failed for merge-$batchId")
        }
        if (nKeys > 0)
          ingestBatch(snap, batchId, dir, filesPerBatch): Unit
        else
          // burn the id even with nothing to append (doc): a later
          // stream batch must never reuse a merged id
          f.create(new org.apache.hadoop.fs.Path(markers,
            s"batch-$batchId"), true).close()
      }
      // durable REPLAY INPUT for replicas ([[replicate]]): the exact
      // updates snapshot, written before any removal rewrite — the
      // commit marker below is the barrier that makes it load-bearing
      // (bounded by MaxMergeKeys; the price of a merge that replicas
      // can replay, the same trade the DML records make)
      snap.write.mode("overwrite").parquet(
        s"$dir/markers/mrg-$batchId.updates")
      if (nKeys > 0 || dropUnmatched.nonEmpty) {
        val (_, data) = DedupIngest.fs(spark, s"$dir/data")
        val units = if (!f.exists(data)) Nil else leafUnits(f, data)
        val keysForBloom: Seq[Any] =
          if (nKeys > 0 && nKeys <= BloomProbeMaxKeys)
            snap.select(col(keyCol)).distinct()
              .collect().toSeq.map(_.get(0))
          else Nil
        // a unit entirely at __batch >= batchId holds no pre-merge
        // rows (the appended batch first among them) — exempt wholesale
        val preMerge: org.apache.hadoop.fs.Path => Boolean = d =>
          dirColumnRange(f, d, BatchCol) match {
            case Some((mn, _)) => mn < batchId
            case None => true
          }
        // stats-range pruning is long-only (the sidecar contract);
        // string keys prune by bloom alone
        val statsHit: org.apache.hadoop.fs.Path => Boolean =
          if (keyIsLong && nKeys > 0) {
            val (kmn, kmx) = (a.getLong(3), a.getLong(4))
            d => dirColumnRange(f, d, keyCol) match {
              case Some((mn, mx)) => mx >= kmn && mn <= kmx
              case None => unitRows(f, d) > 0 // no stats → conservative
            }
          } else d => unitRows(f, d) > 0
        // a NOT-MATCHED-BY-SOURCE delete can hit ANY pre-merge unit
        // (every unit may hold an unmatched key — the complement is
        // un-prunable by construction): key pruning is off, only the
        // batch-span exemption stands
        val affectedPaths = parFilter(units.map(_._2)) { d =>
          preMerge(d) && (
            if (dropUnmatched.nonEmpty) unitRows(f, d) > 0
            else statsHit(d) && (keysForBloom.isEmpty ||
              (unitBloom(f, d, keyCol) match {
                case Some(b) => keysForBloom.exists {
                  case s: String => b.mightContainString(s)
                  case l: Long => b.mightContainLong(l)
                  case other => throw new IllegalStateException(
                    s"unreachable key type: ${other.getClass.getName}")
                }
                case None => true
              })))
        }.toSet
        val affected = units.filter(u => affectedPaths(u._2))
        val keysDf = broadcast(snap.select(col(keyCol)).distinct()
          .withColumn("__graft_merge_hit", lit(true)))
        val gridNow = readGrid(spark, dir)
        affected.zipWithIndex.foreach { case ((name, d), i) =>
          // same attempt-nonce discipline as deleteBox: a replay's
          // target names must not collide with a published one
          val stamp = s"merge$batchId-$i-" +
            java.util.UUID.randomUUID().toString.take(6)
          val stage = new org.apache.hadoop.fs.Path(
            s"$dir/gen-$stamp.stage")
          if (f.exists(stage)) f.delete(stage, true)
          val unitDf = readUnits(spark, dir, Seq(d))
          val cols = unitDf.columns
          // keep: key not merged, OR the row is AT/ABOVE the merge
          // point (its own append wherever a fold carried it, and any
          // batch a live stream published meanwhile); null keys never
          // join → kept, the deleteBox null-safety rule. With
          // dropUnmatched, an UNMATCHED pre-merge row (null-keyed
          // included — SQL MERGE semantics, the doc) survives only if
          // the gate spares it.
          val keepRow = dropUnmatched match {
            case None =>
              col("__graft_merge_hit").isNull ||
                col(BatchCol) >= lit(batchId)
            case Some(ud) =>
              val kill = ud.gate
                .map(g => coalesce(g, lit(false)))
                .getOrElse(lit(true))
              col(BatchCol) >= lit(batchId) ||
                (col("__graft_merge_hit").isNull && !kill)
          }
          unitDf.join(keysDf, Seq(keyCol), "left")
            .filter(keepRow)
            .select(cols.map(col).toIndexedSeq: _*)
            .write.mode("overwrite").parquet(stage.toString)
          writeUnitStats(f, stage, gridNow.cols :+ KeyCol :+ BatchCol,
            gridNow.bloomCols)
          writeUnitBlooms(spark, f, stage, gridNow.bloomCols)
          val man = manifestPath(spark, dir, stamp)
          val out = f.create(man, true)
          try out.write(Seq(s"S\t$name", s"T\tgen-$stamp", "COMMIT")
            .mkString("\n").getBytes("UTF-8"))
          finally out.close()
          recoverCompact(spark, dir)
        }
      }
      // the merge's statement RECORD (kind `mrg`), minted in COMMIT
      // order from the same global seq as the DML records (merges and
      // box DML are all serialized by the maintenance lock, so seq is
      // the exact statement order a replica must apply): `upto` comes
      // from the intent (the claim-instant watermark), `sets` carries
      // the merge key by convention. upto = -2 marks a pre-format
      // (empty) intent — recorded but refused at replay.
      val recordPath = new org.apache.hadoop.fs.Path(markers,
        s"mrg-$batchId")
      // a crash between the record rename and the marker create leaves
      // the record standing — the REPLAY must keep it: its seq is the
      // position the merge's effects actually committed at (statements
      // landing between the crash and the replay minted later seqs,
      // and a re-mint here would tell replicas the wrong order)
      if (!f.exists(recordPath)) {
        val uptoRec = readMarkerLines(f, intent).headOption
          .flatMap(l => scala.util.Try(l.trim.toLong).toOption)
          .getOrElse(-2L)
        val seqRec = dmlRecords(spark, dir).map(_.seq)
          .foldLeft(-1L)(math.max) + 1L
        val rtmp = new org.apache.hadoop.fs.Path(markers,
          s"mrg-$batchId.tmp")
        if (f.exists(rtmp)) f.delete(rtmp, false)
        val rout = f.create(rtmp, true)
        val recSets = Seq((keyCol, "merge-key")) ++
          unmatchedRec.map(g => (UnmatchedDelTag,
            java.net.URLEncoder.encode(g, "UTF-8")))
        try rout.write(DmlRecord.serialize(DmlRecord("mrg", batchId,
          seqRec, uptoRec, Nil, recSets, None))
          .getBytes("UTF-8"))
        finally rout.close()
        if (!f.rename(rtmp, recordPath))
          throw new IllegalStateException(
            s"mergeRows: record publish failed for mrg-$batchId")
      }
      f.create(marker, true).close()
      f.delete(intent, false): Unit
      true
    }
  }

  /** Name of the per-unit stats sidecar (a `_`-prefixed file, so the
    * parquet reader ignores it): one `col\tmin\tmax` line per column
    * (`col\tnone` when the footers carry no stats for it). Written
    * into the STAGED dir before the publish rename, so the sidecar is
    * atomic with the unit itself — a pruning decision then costs one
    * small read per unit instead of opening every parquet footer in
    * it (at 100 TB a box touches thousands of units; footer-opening
    * on the driver was the planning bottleneck). Units without a
    * sidecar (pre-sidecar tables) fall back to the footers. */
  private val StatsFile = "_graft_stats.tsv"

  /** Sidecar pseudo-column carrying the unit's exact row count (a
    * footer-metadata sum) — lets [[unitRows]], [[describe]] and the
    * provenance soundness check answer without a footer walk. */
  private val RowsStat = "__rows"

  /** Write the sidecar for the columns pruning will ask about, from
    * the freshly-written (still hot) footers of `unit`. `strCols` get
    * STRING min/max lines (`c str encMin encMax`, URL-encoded — the
    * [[StrShape]] statements' pruning input; four fields, so readers
    * of the long format never mis-parse them); a strCol whose footer
    * stats are not binary (a long bloom column) or are absent writes
    * `c str-none` — read conservatively. */
  private def writeUnitStats(f: org.apache.hadoop.fs.FileSystem,
      unit: org.apache.hadoop.fs.Path, cols: Seq[String],
      strCols: Seq[String] = Nil): Unit = {
    val n = footerRowCount(f, unit)
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    val lines = s"$RowsStat\t$n\t$n" +: (cols.map { c =>
      footerColumnRange(f, unit, c) match {
        case Some((mn, mx)) => s"$c\t$mn\t$mx"
        case None => s"$c\tnone"
      }
    } ++ strCols.filterNot(cols.contains).map { c =>
      footerColumnRangeStr(f, unit, c) match {
        case Some((mn, mx)) => s"$c\tstr\t${enc(mn)}\t${enc(mx)}"
        case None => s"$c\tstr-none"
      }
    })
    val out = f.create(new org.apache.hadoop.fs.Path(unit, StatsFile), true)
    try out.write(lines.mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Exact row count from the parquet footers (no data read). */
  private def footerRowCount(f: org.apache.hadoop.fs.FileSystem,
      d: org.apache.hadoop.fs.Path): Long = {
    import scala.jdk.CollectionConverters._
    f.listStatus(d).toSeq
      .filter(s => s.isFile && isDataFile(s.getPath.getName))
      .map { st =>
        val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            st.getPath, f.getConf))
        try rdr.getFooter.getBlocks.asScala.map(_.getRowCount).sum
        finally rdr.close()
      }.sum
  }

  /** The unit's row count: sidecar-first (the [[RowsStat]] line, via
    * the same LRU the pruner uses), footer walk for units written
    * before the line existed. */
  private def unitRows(f: org.apache.hadoop.fs.FileSystem,
      d: org.apache.hadoop.fs.Path): Long =
    dirColumnRange(f, d, RowsStat) match {
      case Some((n, _)) => n
      case None => footerRowCount(f, d)
    }

  private def bloomFile(c: String) = s"_graft_bloom_$c"

  /** Write the per-unit Bloom sidecars for the grid's `bloomCols`
    * (see [[Grid]]) from the freshly-staged unit — one distributed
    * pass per column, filter sized to the unit's actual row count
    * (a footer-metadata count, no data read), fpp 1%. Written into
    * the STAGE like [[writeUnitStats]], so atomic with the unit. */
  private def writeUnitBlooms(spark: SparkSession,
      f: org.apache.hadoop.fs.FileSystem,
      unit: org.apache.hadoop.fs.Path, bloomCols: Seq[String]): Unit =
    if (bloomCols.nonEmpty && f.listStatus(unit).exists(s =>
        s.isFile && isDataFile(s.getPath.getName))) {
      // (fileless units — a rewrite that emptied everything — carry no
      // blooms; scanPoints reads bloom-less units conservatively)
      val df = spark.read.parquet(unit.toString)
      bloomCols.foreach { c =>
        require(df.schema.fieldNames.contains(c) &&
          Set[org.apache.spark.sql.types.DataType](
            org.apache.spark.sql.types.LongType,
            org.apache.spark.sql.types.StringType)(df.schema(c).dataType),
          s"bloom column '$c' must be a LONG or STRING column of the " +
            s"table (got ${scala.util.Try(df.schema(c).dataType).toOption})")
      }
      val rows = df.count()
      // a ZERO-ROW unit (a rewrite that emptied it) gets no bloom:
      // Spark's bloomFilter aggregate returns a null buffer on empty
      // input, and a bloom-less unit is already read conservatively
      if (rows > 0) {
        val n = math.max(64L, rows)
        bloomCols.foreach { c =>
          val bloom = df.stat.bloomFilter(c, n, 0.01)
          val out = f.create(
            new org.apache.hadoop.fs.Path(unit, bloomFile(c)), true)
          try bloom.writeTo(out) finally out.close()
        }
      }
    }

  /** Bloom sidecar bytes, LRU-cached by write-once unit path; None
    * when absent or unreadable (probe degrades to reading the unit —
    * same conservative rule as missing stats). */
  private val MaxBloomCache = 128
  private val bloomCache = new java.util.LinkedHashMap[
      (String, String), Option[Array[Byte]]](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[
        (String, String), Option[Array[Byte]]]): Boolean =
      size() > MaxBloomCache
  }

  private def unitBloom(f: org.apache.hadoop.fs.FileSystem,
      d: org.apache.hadoop.fs.Path, c: String)
      : Option[org.apache.spark.util.sketch.BloomFilter] = {
    val key = (d.toString, c)
    val bytes = bloomCache.synchronized(Option(bloomCache.get(key)))
      .getOrElse {
        val r = scala.util.Try {
          val p = new org.apache.hadoop.fs.Path(d, bloomFile(c))
          if (!f.exists(p)) None
          else {
            val in = f.open(p)
            try {
              val buf = new java.io.ByteArrayOutputStream()
              val chunk = new Array[Byte](64 << 10)
              var k = in.read(chunk)
              while (k >= 0) { buf.write(chunk, 0, k); k = in.read(chunk) }
              Some(buf.toByteArray)
            } finally in.close()
          }
        }.toOption.flatten
        bloomCache.synchronized(bloomCache.put(key, r)): Unit
        r
      }
    bytes.flatMap(b => scala.util.Try(
      org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(b))).toOption)
  }

  /** Bounded pool for per-unit METADATA probes (bloom/stats sidecar
    * reads) during planning: the decisions are per-unit independent
    * and each costs one small remote read, so at 100 TB unit counts a
    * SERIAL driver walk is the planning bottleneck the sidecars were
    * built to avoid (the StatsProbe lesson, one level up — reading
    * 10⁵ sidecars one at a time is as bad as opening 10⁵ footers).
    * Daemon threads; sized for metadata-read latency hiding, not CPU.
    * Caches (stats/bloom LRUs) are synchronized; Hadoop FileSystem
    * reads are thread-safe. */
  private lazy val probePool =
    java.util.concurrent.Executors.newFixedThreadPool(16,
      (r: Runnable) => {
        val t = new Thread(r, "graft-layout-probe")
        t.setDaemon(true)
        t
      })

  /** Evaluate `pred` over `dirs` on [[probePool]], preserving order;
    * any probe failure propagates with its ORIGINAL type (the pool's
    * ExecutionException wrapper is stripped — callers that handled a
    * raw IOException from the serial walk keep working), and the
    * predicates themselves already degrade conservatively on
    * missing/corrupt metadata. */
  private def parFilter(dirs: Seq[org.apache.hadoop.fs.Path])(
      pred: org.apache.hadoop.fs.Path => Boolean)
      : Seq[org.apache.hadoop.fs.Path] = {
    import scala.jdk.CollectionConverters._
    if (dirs.size <= 2) dirs.filter(pred)
    else {
      val tasks = dirs.map(d =>
        (() => pred(d)): java.util.concurrent.Callable[Boolean])
      val results = probePool.invokeAll(tasks.asJava).asScala.map { fut =>
        try fut.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw Option(e.getCause).getOrElse(e)
        }
      }
      dirs.zip(results).collect { case (d, true) => d }
    }
  }

  /** (units a point probe must read, all live units): a unit is read
    * when its bloom might contain ANY probed value, or when it has no
    * bloom for the column (conservative). No false negatives — a unit
    * holding a probed value is always read. Probes run on
    * [[probePool]] — per-unit bloom reads in parallel, not a serial
    * driver walk. */
  private[graft] def pointProbeDirs(spark: SparkSession, dir: String,
      column: String, values: Seq[Any])
      : (Seq[org.apache.hadoop.fs.Path], Seq[org.apache.hadoop.fs.Path]) = {
    values.foreach {
      case _: String | _: Long => ()
      case v => throw new IllegalArgumentException(
        s"bloom probe values must be Long or String, got " +
          s"${v.getClass.getName}")
    }
    val (f, _) = DedupIngest.fs(spark, s"$dir/data")
    val dirs = liveDirs(spark, dir)
    (parFilter(dirs) { d =>
      unitBloom(f, d, column) match {
        case Some(b) => values.exists {
          case s: String => b.mightContainString(s)
          case l: Long => b.mightContainLong(l)
          case _ => true // unreachable — validated above
        }
        case None => true
      }
    }, dirs)
  }

  /** Point lookup through the Bloom sidecars — the equality twin of
    * [[scanBox]] for columns the layout does NOT cluster on: units
    * whose bloom excludes every probed value are never opened; the
    * `isin` residual keeps the result exact through false positives
    * and bloom-less units. */
  def scanPoints(spark: SparkSession, dir: String,
      column: String, values: Seq[Long]): DataFrame =
    scanPointsAny(spark, dir, column, values)

  /** [[scanPoints]] for STRING bloom columns (the [[Grid]] doc: a
    * bloom column is LONG or STRING — a high-cardinality string id is
    * as probe-worthy as a numeric one, and min/max statistics are just
    * as useless for it). Same contract: no false negatives by the
    * bloom, `isin` residual keeps false positives exact. */
  def scanPointsStr(spark: SparkSession, dir: String,
      column: String, values: Seq[String]): DataFrame =
    scanPointsAny(spark, dir, column, values)

  private def scanPointsAny(spark: SparkSession, dir: String,
      column: String, values: Seq[Any]): DataFrame = {
    require(values.nonEmpty, "scanPoints: no values to probe")
    // reject nulls up front: a null can never match the isin residual
    // (three-valued logic), and letting it reach the bloom probe threw
    // an NPE (v.getClass on null) instead of a usable message
    require(values.forall(_ != null),
      "scanPoints: null probe values are not supported (isin never " +
        "matches null; probe for nulls with scanBox on a stats column)")
    val (hit, live) = pointProbeDirs(spark, dir, column, values)
    val pred = col(column).isInCollection(values)
    if (hit.nonEmpty)
      readUnits(spark, dir, hit).filter(pred)
    else if (live.nonEmpty)
      // zero candidate units: keep the full schema via one live dir —
      // its bloom already proves the probe empty there
      readUnits(spark, dir, Seq(live.head)).filter(pred)
    else emptyShape(spark, dir).filter(pred)
  }

  /** Published units are WRITE-ONCE (atomic-rename publish, never
    * mutated — deletes and folds mint NEW gen names), so their stats
    * are immutable and cacheable by path. LRU-bounded; long sessions
    * over many tables stay flat. */
  private val MaxStatsCache = 8192
  private val statsCache = new java.util.LinkedHashMap[
      (String, String), Option[(Long, Long)]](64, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[
        (String, String), Option[(Long, Long)]]): Boolean =
      size() > MaxStatsCache
  }

  /** Drop the in-process stats cache. The cache is sound because
    * published units are write-once — the ONE way to violate that is
    * deleting a whole table dir and re-bootstrapping at the SAME path
    * (batch-0 of the new lineage collides with the cached batch-0 of
    * the old). Call this after such a drop-and-recreate; tables at
    * fresh paths never need it. */
  def clearStatsCache(): Unit = {
    statsCache.synchronized(statsCache.clear())
    statsStrCache.synchronized(statsStrCache.clear())
    bloomCache.synchronized(bloomCache.clear())
    gridCache.synchronized(gridCache.clear())
  }

  /** Per-dir [min, max] of a long column — the statistics a pruning
    * reader consumes, reused here to decide which dirs a delete must
    * touch. Source order: in-memory cache (units are write-once),
    * sidecar, parquet footers. None when the dir holds no data files
    * or a file lacks stats for the column. */
  private def dirColumnRange(f: org.apache.hadoop.fs.FileSystem,
      d: org.apache.hadoop.fs.Path, colName: String)
      : Option[(Long, Long)] = {
    val key = (d.toString, colName)
    statsCache.synchronized {
      val hit = statsCache.get(key)
      if (hit != null) return hit
    }
    // an unreadable/corrupt sidecar (torn disk, checksum mismatch)
    // degrades to the footer walk — pruning never fails on metadata
    val fromSidecar: Option[Option[(Long, Long)]] =
      scala.util.Try {
        val sp = new org.apache.hadoop.fs.Path(d, StatsFile)
        if (!f.exists(sp)) None
        else {
          val in = f.open(sp)
          val lines =
            try scala.io.Source.fromInputStream(in, "UTF-8")
              .getLines().toList
            finally in.close()
          lines.map(_.split("\t")).collectFirst {
            case Array(c, "none") if c == colName => None
            case Array(c, mn, mx) if c == colName =>
              Some((mn.toLong, mx.toLong))
          }
        }
      }.toOption.flatten
    val r = fromSidecar.getOrElse(footerColumnRange(f, d, colName))
    statsCache.synchronized(statsCache.put(key, r)): Unit
    r
  }

  /** The footer-walk source of truth behind [[dirColumnRange]]. */
  private def footerColumnRange(f: org.apache.hadoop.fs.FileSystem,
      d: org.apache.hadoop.fs.Path, colName: String)
      : Option[(Long, Long)] = {
    import scala.jdk.CollectionConverters._
    val files = f.listStatus(d).toSeq.filter(s => s.isFile &&
      !s.getPath.getName.startsWith("_") &&
      !s.getPath.getName.startsWith(".") &&
      s.getPath.getName.endsWith(".parquet"))
    if (files.isEmpty) return None
    val ranges = files.flatMap { st =>
      val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          st.getPath, f.getConf))
      try rdr.getFooter.getBlocks.asScala.toSeq.map { blk =>
        blk.getColumns.asScala
          .find(_.getPath.toDotString == colName)
          .map(_.getStatistics)
          .filter(s => s != null && s.hasNonNullValue)
          .map(s => (
            s.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
            s.genericGetMax.asInstanceOf[java.lang.Long].longValue()))
      } finally rdr.close()
    }
    if (ranges.isEmpty || ranges.exists(_.isEmpty)) None
    else Some((ranges.flatten.map(_._1).min, ranges.flatten.map(_._2).max))
  }

  /** UTF-8 BYTE comparison — the string order Spark's comparisons
    * (UTF8String), DuckDB's default collation AND parquet's
    * binary-column statistics all share. Driver-side pruning MUST use
    * it too: Java's String.compareTo orders by UTF-16 unit, which
    * disagrees for supplementary characters vs U+E000..U+FFFF, and a
    * pruning order that disagrees with the predicate's order can skip
    * a unit holding matching rows. */
  private def utf8Cmp(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** `mn` can precede SOME string carrying prefix `p` — the byte-land
    * lower-bound test of the prefix pruner: true iff mn's first
    * |p|-in-bytes bytes are <= p's bytes (if they were greater, mn
    * would exceed every p-prefixed string). Pure byte logic, no
    * next-prefix increment (which is not well-defined on UTF-8). */
  private def utf8PrefixLeq(mn: String, p: String): Boolean = {
    val m = mn.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val pb = p.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(m.length, pb.length)
    while (i < n) {
      val c = (m(i) & 0xff) - (pb(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    true // equal up to min length: mn is a prefix of p or p-prefixed
  }

  private val statsStrCache = new java.util.LinkedHashMap[
      (String, String), Option[(String, String)]](64, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[
        (String, String), Option[(String, String)]]): Boolean =
      size() > MaxStatsCache
  }

  /** Per-dir [min, max] of a STRING column in UTF-8 byte order — the
    * [[StrShape]] statements' pruning input. Source order mirrors
    * [[dirColumnRange]]: cache, sidecar (`c str encMin encMax`
    * lines), parquet footers. None (read conservatively) when the dir
    * has no data, the column has no binary stats, or the unit predates
    * the string-stats sidecar. */
  private def dirColumnRangeStr(f: org.apache.hadoop.fs.FileSystem,
      d: org.apache.hadoop.fs.Path, colName: String)
      : Option[(String, String)] = {
    val key = (d.toString, colName)
    statsStrCache.synchronized {
      val hit = statsStrCache.get(key)
      if (hit != null) return hit
    }
    def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")
    val fromSidecar: Option[Option[(String, String)]] =
      scala.util.Try {
        val sp = new org.apache.hadoop.fs.Path(d, StatsFile)
        if (!f.exists(sp)) None
        else {
          val in = f.open(sp)
          val lines =
            try scala.io.Source.fromInputStream(in, "UTF-8")
              .getLines().toList
            finally in.close()
          lines.map(_.split("\t")).collectFirst {
            case Array(c, "str-none") if c == colName => None
            case Array(c, "str", mn, mx) if c == colName =>
              Some((dec(mn), dec(mx)))
          }
        }
      }.toOption.flatten
    val r = fromSidecar.getOrElse(footerColumnRangeStr(f, d, colName))
    statsStrCache.synchronized(statsStrCache.put(key, r)): Unit
    r
  }

  /** The footer-walk source of truth behind [[dirColumnRangeStr]]:
    * parquet binary statistics decode as UTF-8 (parquet orders binary
    * stats by unsigned byte comparison — exactly [[utf8Cmp]]). Any
    * non-binary column or footer oddity yields None, never a wrong
    * bound. */
  private def footerColumnRangeStr(f: org.apache.hadoop.fs.FileSystem,
      d: org.apache.hadoop.fs.Path, colName: String)
      : Option[(String, String)] = scala.util.Try {
    import scala.jdk.CollectionConverters._
    val files = f.listStatus(d).toSeq.filter(s => s.isFile &&
      !s.getPath.getName.startsWith("_") &&
      !s.getPath.getName.startsWith(".") &&
      s.getPath.getName.endsWith(".parquet"))
    if (files.isEmpty) None
    else {
      val ranges = files.flatMap { st =>
        val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            st.getPath, f.getConf))
        try rdr.getFooter.getBlocks.asScala.toSeq.map { blk =>
          blk.getColumns.asScala
            .find(_.getPath.toDotString == colName)
            .map(_.getStatistics)
            .filter(s => s != null && s.hasNonNullValue)
            .map(s => (
              new String(s.genericGetMin
                .asInstanceOf[org.apache.parquet.io.api.Binary]
                .getBytes, java.nio.charset.StandardCharsets.UTF_8),
              new String(s.genericGetMax
                .asInstanceOf[org.apache.parquet.io.api.Binary]
                .getBytes, java.nio.charset.StandardCharsets.UTF_8)))
        } finally rdr.close()
      }
      if (ranges.isEmpty || ranges.exists(_.isEmpty)) None
      else Some((
        ranges.flatten.map(_._1).reduce((a, b) =>
          if (utf8Cmp(a, b) <= 0) a else b),
        ranges.flatten.map(_._2).reduce((a, b) =>
          if (utf8Cmp(a, b) >= 0) a else b)))
    }
  }.toOption.flatten

  /** The LIVE prunable units under the publish-point rule (object
    * doc): committed-manifest sources are dropped exactly when their
    * target gen is published. A source name may be a top-level dir or
    * a `gen-X/range-k` leaf; a leaf is dead if either its own name or
    * its whole parent is logically deleted. */
  private def liveDirs(spark: SparkSession, dir: String)
      : Seq[org.apache.hadoop.fs.Path] = {
    val (f, data) = DedupIngest.fs(spark, s"$dir/data")
    val (_, markers) = DedupIngest.fs(spark, s"$dir/markers")
    val logicallyDeleted: Set[String] =
      if (!f.exists(markers)) Set.empty
      else f.listStatus(markers).toSeq
        .filter(_.getPath.getName.matches("compact-.*\\.manifest"))
        .flatMap { m =>
          val lines = {
            val in = f.open(m.getPath)
            try scala.io.Source.fromInputStream(in, "UTF-8")
              .getLines().toList
            finally in.close()
          }
          val published = lines.lastOption.contains("COMMIT") &&
            lines.collectFirst { case l if l.startsWith("T\t") =>
              f.exists(new org.apache.hadoop.fs.Path(
                s"$dir/data/" + l.drop(2)))
            }.getOrElse(false)
          if (published)
            lines.collect { case l if l.startsWith("S\t") => l.drop(2) }
          else Nil
        }.toSet
    if (!f.exists(data)) Nil
    else leafUnits(f, data)
      .filterNot { case (name, _) =>
        logicallyDeleted(name) || logicallyDeleted(name.split("/")(0))
      }
      .map(_._2)
  }

  /** Read the live table — correct in every crash state WITHOUT
    * writing ([[liveDirs]]). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val dirs = liveDirs(spark, dir)
    if (dirs.isEmpty) emptyShape(spark, dir)
    else readUnits(spark, dir, dirs).drop(BatchCol)
  }

  // -- additive schema evolution ----------------------------------------
  //
  // Later batches may carry NEW payload columns (and drop old ones);
  // the grid columns and bloomCols are the only mandatory part of a
  // batch. The TABLE schema is the monotone union of every batch
  // schema, persisted as a versioned sidecar (`schema/schema-<v>.json`,
  // readers take the max — the batch-upto watermark pattern, so a
  // crash leaves either the old or the new version, both valid).
  // Every multi-unit read applies the stored schema, so units written
  // before a column surfaces it as nulls — WITHOUT the per-query
  // footer-walk `mergeSchema` costs at 100 TB unit counts (the sidecar
  // is one small file; Delta/Iceberg keep schema in the log for the
  // same reason). Type changes are refused at publish: evolution here
  // is strictly additive, never rewriting history.

  /** The table's current schema — the stored union when the table has
    * evolved, otherwise None (homogeneous pre-evolution table; plain
    * reads are already correct). */
  def tableSchema(spark: SparkSession, dir: String)
      : Option[org.apache.spark.sql.types.StructType] = {
    val (f, sd) = DedupIngest.fs(spark, s"$dir/schema")
    // list-then-open races a concurrent publish retiring old versions.
    // Each retry re-lists and the current max always exists, but a
    // lock-free reader can lose the race MORE than once (two
    // consecutive publishes each retire versions two back), so retry a
    // small bounded number of times rather than exactly once.
    var attempt = 0
    val maxAttempts = 4
    while (true) {
      if (!f.exists(sd)) return None
      val vs = f.listStatus(sd).toSeq.map(_.getPath.getName)
        .filter(_.matches("schema-\\d+\\.json"))
        .map(_.stripPrefix("schema-").stripSuffix(".json").toLong)
      if (vs.isEmpty) return None
      try {
        val in = f.open(new org.apache.hadoop.fs.Path(sd,
          s"schema-${vs.max}.json"))
        val json = try scala.io.Source.fromInputStream(in, "UTF-8")
          .mkString finally in.close()
        return Some(org.apache.spark.sql.types.DataType.fromJson(json)
          .asInstanceOf[org.apache.spark.sql.types.StructType])
      } catch {
        case e: java.io.FileNotFoundException =>
          if (attempt < maxAttempts - 1)
            attempt += 1 // re-list; the writer published a newer version
          else
            // a raw FNF here would read as "the table is broken";
            // name the real cause (losing the list-then-open race
            // maxAttempts times needs a pathological publish storm)
            throw new IllegalStateException(
              s"tableSchema: lost the schema list-then-open race " +
                s"$maxAttempts times under $sd — a concurrent writer " +
                "is retiring schema versions faster than this reader " +
                "can re-list (publish storm); retry when the table's " +
                "writer cadence settles", e)
      }
    }
    None // unreachable
  }

  /** Union the staged batch's schema into the stored table schema —
    * BEFORE the data rename, so the stored schema is always a
    * superset of every published file (a crash in between leaves a
    * column all-null until the replay republishes the data: additive
    * and harmless). Existing columns keep their position, new ones
    * append; a name reused at a different type fails fast. Caller
    * holds the lock. */
  private def publishSchema(spark: SparkSession, dir: String,
      staged: org.apache.spark.sql.types.StructType): Unit = {
    val cur = tableSchema(spark, dir)
    val base = cur.getOrElse(staged)
    val byName = base.fields.map(f => f.name -> f).toMap
    staged.fields.foreach { fl =>
      byName.get(fl.name).foreach { ex =>
        require(ex.dataType == fl.dataType,
          s"schema evolution: column '${fl.name}' arrives as " +
            s"${fl.dataType.simpleString} but the table holds " +
            s"${ex.dataType.simpleString} — only ADDITIVE evolution " +
            "is supported (new table via regrid for type changes)")
      }
    }
    val merged = org.apache.spark.sql.types.StructType(
      base.fields.map(_.copy(nullable = true)) ++
        staged.fields.filterNot(f => byName.contains(f.name))
          .map(_.copy(nullable = true)))
    if (cur.contains(merged)) return
    val (f, sd) = DedupIngest.fs(spark, s"$dir/schema")
    f.mkdirs(sd)
    val vs = f.listStatus(sd).toSeq.map(_.getPath.getName)
      .filter(_.matches("schema-\\d+\\.json"))
      .map(_.stripPrefix("schema-").stripSuffix(".json").toLong)
    val next = vs.foldLeft(-1L)(math.max) + 1
    val out = f.create(new org.apache.hadoop.fs.Path(sd,
      s"schema-$next.json"), true)
    try out.write(merged.json.getBytes("UTF-8")) finally out.close()
    // retire superseded versions but KEEP the immediately-previous
    // one: a lock-free reader that listed before this publish may
    // still be about to open it (list-then-open), and schemas are
    // monotone supersets, so serving v-1 is stale-but-valid — only
    // versions two generations back can be deleted without a race
    vs.filter(_ < next - 1).foreach(v => f.delete(
      new org.apache.hadoop.fs.Path(sd, s"schema-$v.json"), false))
  }

  /** Read units under the stored table schema (nulls for columns a
    * unit predates); plain read for pre-evolution tables. */
  private def readUnits(spark: SparkSession, dir: String,
      units: Seq[org.apache.hadoop.fs.Path]): DataFrame =
    tableSchema(spark, dir) match {
      case Some(s) => spark.read.schema(s).parquet(units.map(_.toString): _*)
      case None => spark.read.parquet(units.map(_.toString): _*)
    }

  /** CDC read: every live row ingested by a batch with id >
    * `afterBatch`, with [[BatchCol]] kept so the consumer can
    * checkpoint `max(__batch)` and call again — the incremental-
    * consumption contract downstream pipelines need ("give me what's
    * new since my last run") without a second event stream. Pruning is
    * the point: [[BatchCol]] is in every unit's statistics sidecar, an
    * L0 unit spans exactly its own batch id and a folded generation
    * spans the ids it swallowed, so old history is skipped at the
    * FILE level — a consumer polling the tail of a 100 TB table opens
    * only the units published since its checkpoint, however many
    * generations the rest has been folded into. Rows REMOVED since the
    * checkpoint are not reported (this is an append-log view, not a
    * diff; [[deleteBox]] is the deliberate exception — right-to-be-
    * forgotten must not re-surface rows anywhere, including here).
    * A downstream TABLE built from this view keeps rows the source
    * later deletes or redacts — use [[replicate]] for a replica that
    * converges through deletions, redactions and merges (it replays
    * the recorded statements, not just the append log). */
  def readSince(spark: SparkSession, dir: String,
      afterBatch: Long): DataFrame = {
    require(afterBatch >= -1L && afterBatch < Long.MaxValue,
      s"readSince: afterBatch out of range: $afterBatch")
    provenanceScan(spark, dir, afterBatch + 1, Long.MaxValue)
  }

  /** Ingest-time travel: the live rows ingested by batches ≤ `batch`
    * — the table as the ingest left it after that batch, EXCEPT that
    * [[deleteBox]] is destructive across history by design: a
    * forgotten row never reappears in any as-of view (time travel
    * that resurrects deleted user data is a compliance hole, not a
    * feature — the reason lakehouse GDPR guides tell operators to cap
    * time travel at the deletion SLA). Compaction does not disturb
    * the view: folds copy [[BatchCol]] untouched, so the filter is
    * exact through any number of generations. */
  def readAsOf(spark: SparkSession, dir: String, batch: Long): DataFrame = {
    require(batch >= 0L, s"readAsOf: batch must be >= 0: $batch")
    provenanceScan(spark, dir, 0L, batch)
  }

  /** The CONTIGUOUS committed batch prefix — "every id in [0, n] is
    * committed", the exactly-once offset [[LayoutTableSource]] serves:
    * an id above a gap (a concurrent or crashed writer's in-flight
    * batch) must hold the offset back, or a consumer would take its
    * rows and then skip the gap batch when it later commits. -1 when
    * nothing is committed. */
  def contiguousCommittedBatch(spark: SparkSession, dir: String): Long = {
    val (f, markers) = DedupIngest.fs(spark, s"$dir/markers")
    if (!f.exists(markers)) return -1L
    val names = f.listStatus(markers).toSeq.map(_.getPath.getName)
    val ids = names.filter(_.matches("batch-\\d+"))
      .map(_.stripPrefix("batch-").toLong).toSet
    var n = MarkerLedger.watermark(names)
    while (ids.contains(n + 1)) n += 1
    n
  }

  /** Canonical fingerprint of everything that can change a key's
    * LIVENESS on `dir`: the committed batch-id SET (contiguous
    * watermark + the ids committed above it — REPRESENTATION-invariant
    * across the marker fold, which only moves ids from the live
    * listing into the watermark) and the max recorded DML `seq`
    * (deletes/updates/merges all mint from it at commit). Two reads of
    * an unchanged stamp bracket a window in which no row was added or
    * removed — what lets the conditional SQL MERGE prove its
    * matched/unmatched classification is still the state its merge
    * commits against ([[mergeRows]]' `classifiedAt`). Driver-side
    * metadata work, statement-cadence cost. */
  private[graft] def ledgerStamp(spark: SparkSession,
      dir: String): String = {
    val (f, markers) = DedupIngest.fs(spark, s"$dir/markers")
    val names =
      if (!f.exists(markers)) Nil
      else f.listStatus(markers).toSeq.map(_.getPath.getName)
    val w = MarkerLedger.watermark(names)
    var n = w
    val ids = names.filter(_.matches("batch-\\d+"))
      .map(_.stripPrefix("batch-").toLong).filter(_ > w).toSet
    while (ids.contains(n + 1)) n += 1
    val above = ids.filter(_ > n).toSeq.sorted
    val dmlSeq = dmlRecords(spark, dir).map(_.seq).foldLeft(-1L)(math.max)
    s"upto=$n;above=${above.mkString(",")};dml=$dmlSeq"
  }

  /** Rows of batches lo..hi (inclusive), stats-pruned — the
    * micro-batch body behind [[LayoutTableSource.getBatch]]. */
  private[streaming] def readBatchRange(spark: SparkSession,
      dir: String, lo: Long, hi: Long): DataFrame =
    provenanceScan(spark, dir, lo, hi)

  /** Stats-pruned scan on the provenance column (the [[scanBox]]
    * machinery on [[BatchCol]]): units whose sidecar batch span is
    * disjoint from [lo, hi] are never opened; the residual predicate
    * keeps the result exact. Tables written before the provenance
    * column carry no per-row batch ids — fail fast rather than guess. */
  private def provenanceScan(spark: SparkSession, dir: String,
      lo: Long, hi: Long): DataFrame = {
    val (hit, live) = prunedBoxDirs(spark, dir, Seq((BatchCol, lo, hi)))
    if (live.isEmpty)
      return emptyShape(spark, dir).withColumn(BatchCol, lit(0L))
        .filter(lit(false))
    // EVERY live unit must carry per-row provenance, not just one
    // sample: __batch is a non-null long, so a published unit always
    // has footer (and sidecar) min/max for it — a unit with NO batch
    // range is a pre-provenance unit, and filtering it would silently
    // DROP its rows from the as-of/CDC answer (its __batch reads as
    // null under the stored schema). Mixed tables fail fast instead.
    val (f, _) = DedupIngest.fs(spark, s"$dir/data")
    // zero-row units (a delete that emptied a whole unit) have no
    // stats for ANY column — they are trivially prunable, not
    // pre-provenance
    val bare = live.filter(d => dirColumnRange(f, d, BatchCol).isEmpty &&
      unitRows(f, d) > 0)
    require(bare.isEmpty,
      s"provenance read: unit ${bare.map(_.getName).mkString(", ")} " +
        s"predates the $BatchCol column — its rows have no batch " +
        "attribution and would silently vanish from this view " +
        "(regrid to re-stamp the table, or read() for current state)")
    val pred = col(BatchCol) >= lo && col(BatchCol) <= hi
    if (hit.nonEmpty)
      readUnits(spark, dir, hit).filter(pred)
    else readUnits(spark, dir, Seq(live.head)).filter(pred)
  }

  /** Highest ledger id ANY artifact claims, plus one: committed batch
    * markers, the `batch-upto` watermark, published-but-unmarked
    * orphan batch dirs (ingesting under one would ADOPT the orphan's
    * data and silently drop the new frame — ingestBatch's
    * target-exists recovery path), merge markers and standing intents
    * (their owed replay appends under that id), and live stream TXN
    * RESERVATIONS (`txn-e<epoch>-i<id>-<qid>` — a default-regime
    * [[start]] writer that crashed between reserving and committing still
    * OWNS its id; see [[streamLedgerId]]). Callers must hold the tail
    * lock for mint-then-use atomicity; [[nextUnusedId]] wraps this for
    * advisory (mint-then-release) uses. */
  private def nextUnusedIdLocked(spark: SparkSession,
      dir: String): Long = {
    val (f, markers) = DedupIngest.fs(spark, s"$dir/markers")
    val ids =
      if (!f.exists(markers)) Nil
      else f.listStatus(markers).toSeq.map(_.getPath.getName).collect {
        case n if n.matches("batch-\\d+") =>
          n.stripPrefix("batch-").toLong
        case n if n.matches("batch-upto-\\d+") =>
          n.stripPrefix("batch-upto-").toLong
        case n if n.matches("merge-\\d+\\.intent") =>
          n.stripPrefix("merge-").stripSuffix(".intent").toLong
        case n if n.matches("merge-\\d+") =>
          n.stripPrefix("merge-").toLong
        case TxnMarker(_, id, _) => id
      }
    val (_, dataP) = DedupIngest.fs(spark, s"$dir/data")
    val dirIds =
      if (!f.exists(dataP)) Nil
      else f.listStatus(dataP).toSeq.map(_.getPath.getName).collect {
        case n if n.matches("batch-\\d+") =>
          n.stripPrefix("batch-").toLong
      }
    (ids ++ dirIds).foldLeft(-1L)(math.max) + 1L
  }

  /** ADVISORY next-unused ledger id (taken and released under the tail
    * lock): by the time the caller uses it, another writer may have
    * claimed it — [[mergeRows]]'s freshness guard then throws
    * [[StaleBatchIdException]] and the caller re-mints (the SQL MERGE
    * command's retry loop). For atomic mint-and-use, see
    * [[appendNext]]. */
  private[graft] def nextUnusedId(spark: SparkSession,
      dir: String): Long =
    LedgerLock.withLockWait(spark, dir, 5000L)(
      nextUnusedIdLocked(spark, dir))

  /** Append `df` as ONE clustered ingest batch under the NEXT UNUSED
    * ledger id, taken under the tail lock — the body behind both
    * DataFrameWriter `.mode("append")` and SQL `INSERT INTO` on the
    * relation ([[nextUnusedIdLocked]] documents the id scan). NOT
    * exactly-once across driver retries — a retried call mints a NEW
    * id (every DataFrameWriter sink's contract; use [[start]] or
    * explicit [[ingestBatch]] ids for replay-safe ingest). Returns the
    * id.
    *
    * CONCURRENT STREAMS: safe next to a default (txn-minted) stream
    * writer (both mint from one lock-serialized sequence, and the
    * stream's in-flight reservation is counted). Do NOT batch-append
    * while an EPOCH-KEYED stream ([[start]] `epochIds = true`) is
    * attached: that
    * stream's next id is its checkpoint state, this append would take
    * it, and the stream's future batch would replay as a silent
    * ingest no-op — its rows dropped (the [[mergeRows]] id-coordination
    * hazard, automated). */
  private[graft] def appendNext(spark: SparkSession, dir: String,
      df: DataFrame, filesPerBatch: Int,
      lockWaitMs: Long = 30000L): Long =
    LedgerLock.withLockWait(spark, dir, lockWaitMs) {
      val next = nextUnusedIdLocked(spark, dir)
      ingestBatch(df, next, dir, filesPerBatch): Unit
      next
    }

  /** A stream txn reservation marker: `txn-e<epoch>-i<id>-<qid>` —
    * the name IS the durable (queryId, epoch) → ledgerId binding
    * (name-carries-state, like the batch markers). Extractor yields
    * (epoch, ledgerId, queryId). */
  private object TxnMarker {
    private val Pat = "txn-e(\\d+)-i(\\d+)-(.+)".r
    def unapply(name: String): Option[(Long, Long, String)] =
      name match {
        case Pat(e, i, q) => Some((e.toLong, i.toLong, q))
        case _ => None
      }
    def name(epoch: Long, id: Long, qid: String): String =
      s"txn-e$epoch-i$id-$qid"
  }

  /** Checkpoint location → the stream's DURABLE query id (the
    * `<checkpoint>/metadata` JSON MicroBatchExecution writes at query
    * start — stable across restarts of the same checkpoint, unlike
    * `runId`). Read FRESH per call, never cached per-JVM: a checkpoint
    * dir deleted and recreated at the same path gets a NEW query id,
    * and a cached old id would match the old query's surviving e0
    * reservation — resolving the fresh stream's epoch 0 to an
    * already-committed ledger id and silently dropping its rows. One
    * tiny metadata read per micro-batch (under the tail lock the
    * caller already holds) is noise next to the ingest itself. */
  private def checkpointQueryId(spark: SparkSession,
      checkpoint: String): String = {
    val (f, p) = DedupIngest.fs(spark, s"$checkpoint/metadata")
    val in = f.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    """"id"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(txt)
      .map(_.group(1)).getOrElse(throw new IllegalStateException(
        s"LayoutIngest: no query id in $checkpoint/metadata — not a " +
          "structured-streaming checkpoint?"))
  }

  /** The txn-minted (default-regime) micro-batch body: resolve this
    * (queryId, epoch) to
    * its ledger id — the reservation marker if one exists (a REPLAY of
    * the one in-flight epoch after a crash: same id, so the re-driven
    * [[ingestBatch]] is exact), else the next unused id, RESERVED
    * atomically (marker created before any data moves, under the
    * caller-held tail lock). The idempotent-sink pattern every
    * shared-ledger lakehouse sink uses (appId + epoch → version):
    * decouples the stream's ids from its epochs, so batch appends,
    * merges and OTHER txn streams can interleave freely on one table.
    * Crash matrix: before the reservation → nothing happened, the
    * replay mints fresh; after it, anywhere → the replay finds the
    * reservation and re-drives ingestBatch under the same id (a no-op
    * once its batch marker exists). The reservation is retired by
    * [[compactMarkersLocked]] once a LATER epoch of the same query
    * reserves (Spark replays only the newest checkpoint-uncommitted
    * epoch, so an older reservation can never be asked for again). */
  private[graft] def streamLedgerId(spark: SparkSession, dir: String,
      qid: String, epoch: Long): Long = {
    val (f, markers) = DedupIngest.fs(spark, s"$dir/markers")
    val existing =
      if (!f.exists(markers)) None
      else f.listStatus(markers).toSeq.map(_.getPath.getName)
        .collectFirst {
          case TxnMarker(e, i, q) if e == epoch && q == qid => i
        }
    existing.getOrElse {
      val id = nextUnusedIdLocked(spark, dir)
      f.create(new org.apache.hadoop.fs.Path(markers,
        TxnMarker.name(epoch, id, qid)), true).close()
      id
    }
  }

  /** Scan body behind the BATCH relation
    * ([[LayoutTableRelation]]) — one unit-selection pass combining
    * every pruning source the sidecars offer: conjunctive long RANGES
    * (the scanBox machinery, fed from pushed-down catalyst filters),
    * Bloom POINT probes on declared bloom columns (pushed-down
    * equality/IN), and the PROVENANCE span for `sinceBatch`/
    * `asOfBatch` reads. Pruning is advisory-only for the pushed
    * filters (Spark reapplies them above the scan — the
    * PrunedFilteredScan contract), so conservative inclusion is
    * always safe; the provenance bound is SEMANTIC (it defines the
    * view, not a user predicate) and is applied here as the residual.
    * Returns (frame, unitsRead, unitsLive) so the relation can expose
    * pruning observability. */
  private[streaming] def relationScan(spark: SparkSession, dir: String,
      box: Seq[(String, Long, Long)],
      points: Seq[(String, Seq[Any])],
      batchLo: Long, batchHi: Long,
      keepBatch: Boolean): (DataFrame, Int, Int) = {
    val (f, _) = DedupIngest.fs(spark, s"$dir/data")
    val live = liveDirs(spark, dir)
    val bounded = batchLo > 0L || batchHi < Long.MaxValue
    if (bounded && live.nonEmpty) {
      // same soundness rule as provenanceScan: a provenance-bounded
      // view over pre-provenance units would silently drop their rows
      val bare = live.filter(d =>
        dirColumnRange(f, d, BatchCol).isEmpty && unitRows(f, d) > 0)
      require(bare.isEmpty,
        s"provenance read: unit ${bare.map(_.getName).mkString(", ")} " +
          s"predates the $BatchCol column — its rows have no batch " +
          "attribution and would silently vanish from this view " +
          "(regrid to re-stamp the table, or read() for current state)")
    }
    val fullBox = box ++
      (if (bounded) Seq((BatchCol, batchLo, batchHi)) else Nil)
    val hit = parFilter(live) { d =>
      fullBox.forall { case (c, lo, hi) =>
        dirColumnRange(f, d, c) match {
          case Some((mn, mx)) => mx >= lo && mn <= hi
          case None => true
        }
      } && points.forall { case (c, vs) =>
        unitBloom(f, d, c) match {
          case Some(b) => vs.exists {
            case s: String => b.mightContainString(s)
            case l: Long => b.mightContainLong(l)
            case _ => true // non-probe types never reach here
          }
          case None => true
        }
      }
    }
    val base =
      if (hit.nonEmpty) readUnits(spark, dir, hit)
      else if (live.nonEmpty)
        // keep the full schema via one live unit — its sidecars
        // already prove the predicate empty there, and Spark's
        // reapplied filters keep the result exact
        readUnits(spark, dir, Seq(live.head))
      else emptyShape(spark, dir)
        .withColumn(BatchCol, lit(0L)).filter(lit(false))
    val residual = if (bounded)
      base.filter(col(BatchCol) >= batchLo && col(BatchCol) <= batchHi)
    else base
    (if (keepBatch) residual else residual.drop(BatchCol),
      hit.size, live.size)
  }

  /** Empty frame with the table's shape: the stored schema (minus the
    * provenance column) when the table has one, else the grid's key
    * shape (no data published yet). */
  private def emptyShape(spark: SparkSession, dir: String): DataFrame =
    tableSchema(spark, dir) match {
      case Some(s) => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(
          s.fields.filterNot(_.name == BatchCol)))
      case None =>
        val grid = readGrid(spark, dir)
        spark.range(0).select(
          (grid.cols.map(c => lit(null).cast("long").as(c)) :+
            lit(0L).as(KeyCol)): _*)
    }

  /**
   * Box scan with FILE-LEVEL pruning — the read-side twin of
   * [[deleteBox]], and the piece Spark's own reader does not do:
   * parquet scans skip row GROUPS from footer statistics but still
   * list and open every file (LayoutProbe measured scanFiles = all in
   * every layout). On a clustered table the per-dir statistics are
   * decisive, so dirs disjoint from the box are dropped BEFORE the
   * DataFrame is built — the reader never touches them at all (the
   * data-lake file-pruning pattern, done here from the parquet footers
   * the files already carry, no extra metadata). Dirs without stats
   * are conservatively read; the box predicate is reapplied as the
   * residual filter, so the result is exact regardless of pruning.
   * [[prunedBoxDirs]] exposes the (hit, live) counts for gates and
   * monitoring.
   */
  def scanBox(spark: SparkSession, dir: String,
      box: Seq[(String, Long, Long)]): DataFrame = {
    require(box.nonEmpty, "scanBox: empty box")
    val (hit, live) = prunedBoxDirs(spark, dir, box)
    val pred = box.map { case (c, lo, hi) =>
      col(c) >= lo && col(c) <= hi
    }.reduce(_ && _)
    if (hit.nonEmpty)
      readUnits(spark, dir, hit).filter(pred)
    else if (live.nonEmpty)
      // zero intersecting dirs: keep the table's FULL schema by
      // filtering one live dir — its stats already prove the predicate
      // empty there, so the reader materializes ~nothing
      readUnits(spark, dir, Seq(live.head)).filter(pred)
    else emptyShape(spark, dir).filter(pred)
  }

  /** (dirs whose footer stats intersect the box, all live dirs).
    * Sidecar reads run on [[probePool]], not a serial driver walk. */
  private[graft] def prunedBoxDirs(spark: SparkSession, dir: String,
      box: Seq[(String, Long, Long)])
      : (Seq[org.apache.hadoop.fs.Path], Seq[org.apache.hadoop.fs.Path]) = {
    val (f, _) = DedupIngest.fs(spark, s"$dir/data")
    val dirs = liveDirs(spark, dir)
    (parFilter(dirs) { d =>
      box.forall { case (c, lo, hi) =>
        dirColumnRange(f, d, c) match {
          case Some((mn, mx)) => mx >= lo && mn <= hi
          case None => true
        }
      }
    }, dirs)
  }

  private def dirBytes(f: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Long =
    f.listStatus(p).filter(_.isFile).map(_.getLen).sum

  /** Re-grid the table into a NEW table dir — the answer to domain
    * drift. Grid bounds are fixed at [[bootstrap]] and out-of-range
    * rows CLAMP to the edge cells; when the live domain outgrows the
    * grid, the edge cells fill up and pruning degrades exactly there.
    * The grid is immutable by contract (bootstrap rejects an existing
    * one — every historical writer and oracle keyed under it), so
    * re-gridding is by design a rewrite into a fresh dir: read the
    * live table, drop the old key, re-key and re-cluster under
    * `newGrid` (new bounds, bits, curve, bloom columns all allowed),
    * publish as a range-split generation with fresh sidecars — and
    * an EMPTY batch ledger (the rewrite's own ingest markers are
    * stripped before the install; see below), so any future stream,
    * fresh checkpoint or continuing, ingests normally. Source
    * history collapses to __batch 0/1 ("as of the rewrite"). The
    * destination is assembled in a `.stage` dir and installed with
    * ONE atomic rename — a crash leaves either nothing at `dstDir` or
    * the complete table (a leftover stage is discarded on retry). The
    * SOURCE is left untouched; the caller retires it after swapping
    * pointers (two directories cannot be swapped atomically from a
    * library). 100 TB: one full shuffle on the new key — the same
    * cost every lakehouse re-OPTIMIZE pays, amortized by doing it
    * only on drift. */
  def regrid(spark: SparkSession, srcDir: String, dstDir: String,
      newGrid: Grid, targetFileBytes: Long = 256L << 20): Unit = {
    val (f, dst) = DedupIngest.fs(spark, dstDir)
    require(!f.exists(dst), s"regrid: $dstDir already exists")
    require(targetFileBytes > 0, "regrid: targetFileBytes must be > 0")
    val stage = new org.apache.hadoop.fs.Path(dstDir + ".stage")
    if (f.exists(stage)) f.delete(stage, true) // crashed attempt
    bootstrap(spark, stage.toString, newGrid)
    val live = read(spark, srcDir).drop(KeyCol)
    // two half-ingests + a sized fold reuse the tested publish and
    // range-split machinery; the halves only exist to make compact's
    // >= 2-unit precondition true
    val (fh, firstCol) = (live, newGrid.cols.head)
    val half = fh.filter(
      abs(hash(col(firstCol))) % 2 === 0)
    val other = fh.filter(
      abs(hash(col(firstCol))) % 2 =!= 0)
    ingestBatch(half, 0L, stage.toString, filesPerBatch = 1): Unit
    ingestBatch(other, 1L, stage.toString, filesPerBatch = 1): Unit
    compact(spark, stage.toString, smallFileBytes = Long.MaxValue,
      targetFileBytes = targetFileBytes)
    // strip the rewrite's OWN batch ledger before the install: the
    // half-ingests' markers (and the fold's batch-upto watermark)
    // would make a FRESH stream attached to the new table silently
    // drop its first micro-batches (batchId 0/1 <= the watermark).
    // regrid needs no replay protection — the single install rename
    // below is its atomicity — so the new table starts with an empty
    // ledger and ANY stream (fresh or continuing checkpoint) ingests
    // normally. Provenance: source history collapses to __batch 0/1,
    // "as of the rewrite" (documented above).
    val (_, stageMarkers) = DedupIngest.fs(spark, s"$stage/markers")
    if (f.exists(stageMarkers))
      f.listStatus(stageMarkers).toSeq
        .map(_.getPath)
        .filter(p => p.getName.matches("batch-\\d+") ||
          p.getName.matches("batch-upto-\\d+"))
        .foreach(p => f.delete(p, false): Unit)
    if (!f.rename(stage, dst))
      throw new IllegalStateException(
        s"regrid: install rename failed for $dstDir")
  }

  /** CLUSTERING HEALTH: how many live units a cluster-key point query
    * may have to open, from the per-unit key ranges the pruner
    * already has — `(maxDepth, meanDepth, liveUnits)`, where depth at
    * a key k = |units whose [min zkey, max zkey] contains k| and
    * meanDepth is length-weighted over the covered key domain. Depth
    * 1 everywhere = perfectly compacted (disjoint generations); depth
    * ≈ unit count = an unfolded L0 tail (every batch spans the whole
    * domain). The number an operator watches to decide WHEN to
    * [[compact]] — the same clustering metric every lakehouse
    * OPTIMIZE reports. Units without key statistics count as covering
    * the whole domain (conservative, like the pruner). Driver-only
    * sweep, O(units log units). */
  def clusteringDepth(spark: SparkSession, dir: String)
      : (Int, Double, Int) = {
    val (f, _) = DedupIngest.fs(spark, s"$dir/data")
    val dirs = liveDirs(spark, dir)
    if (dirs.isEmpty) return (0, 0.0, 0)
    val ranges = dirs.map(d => dirColumnRange(f, d, KeyCol)
      .getOrElse((Long.MinValue, Long.MaxValue)))
    // sweep line over interval starts/ends; BigInt lengths (the key
    // domain spans the full Long range for stat-less units)
    val events = ranges.flatMap { case (mn, mx) =>
      Seq((BigInt(mn), 1), (BigInt(mx) + 1, -1)) }
      .groupBy(_._1).map { case (p, es) => (p, es.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    var depth = 0
    var maxDepth = 0
    var covered = BigInt(0)
    var weighted = BigInt(0)
    var prev = BigInt(0)
    events.foreach { case (p, delta) =>
      if (depth > 0) {
        val len = p - prev
        covered += len
        weighted += len * depth
      }
      depth += delta
      maxDepth = math.max(maxDepth, depth)
      prev = p
    }
    val mean =
      if (covered == 0) 0.0
      else (BigDecimal(weighted) / BigDecimal(covered)).toDouble
    (maxDepth, mean, dirs.size)
  }

  /** Operational view of the LEDGER (the DESCRIBE HISTORY every table
    * format grows): one row per committed operation — ingest batches
    * (the watermark's contiguous [0, n] plus individual tail markers),
    * box deletes, row-keyed merges — plus any IN-FLIGHT merge intent
    * (committed = false; a standing intent after a crash tells the
    * operator a replay is owed). The watermark-folded ingest prefix is
    * ONE `ingest-upto` row (id = n means "[0, n] all committed"), NOT
    * n+1 rows — a long-lived stream's watermark covers millions of
    * batches, and the fold's whole point is not retaining (or
    * re-materializing) per-batch entries. `at_ms` is the marker file's
    * mtime where one exists (individual tail/delete/merge markers; the
    * watermark row carries the watermark FILE's mtime — the fold
    * time, not any batch's). Driver-only, one markers listing,
    * O(markers on disk). */
  def history(spark: SparkSession, dir: String): DataFrame = {
    val (f, markers) = DedupIngest.fs(spark, s"$dir/markers")
    val entries: Seq[(String, Long, Boolean, Option[Long])] =
      if (!f.exists(markers)) Nil
      else {
        val st = f.listStatus(markers).toSeq
        val byName = st.map(s => s.getPath.getName -> s).toMap
        val names = byName.keySet
        val w = MarkerLedger.watermark(names.toSeq)
        val folded =
          if (w < 0) Nil
          else Seq(("ingest-upto", w, true,
            byName.get(s"batch-upto-$w").map(_.getModificationTime)))
        val tail = names.toSeq.filter(_.matches("batch-\\d+"))
          .map(_.stripPrefix("batch-").toLong).filter(_ > w).sorted
          .map(i => ("ingest", i, true,
            Some(byName(s"batch-$i").getModificationTime)))
        // DML ops come from the RECORDS (live markers + the folded
        // dml-log), so the presentation is identical before and after
        // a [[foldDmlMarkers]] — the folded record carries the marker's
        // commit mtime
        val dml = dmlRecords(spark, dir)
        def dmlKind(kind: String, as: String) =
          dml.filter(_.kind == kind).sortBy(_.id)
            .map(r => (as, r.id, true, r.atMs))
        val dels = dmlKind("del", "delete")
        val delks = dmlKind("delk", "delete_keys")
        val delrs = dmlKind("dels", "delete_range")
        val upds = dmlKind("upd", "update")
        val updks = dmlKind("updk", "update_keys")
        val updrs = dmlKind("upds", "update_range")
        val replays = dmlKind("sdml", "replay")
        // committed merges come from live commit markers AND folded
        // mrg records (a record in the dml-log is committed by the
        // fold rule; a LIVE mrg record without its marker is the
        // in-flight crash window — not committed). Legacy merges
        // (pre-record format) have only the marker.
        val recMerges = dml.filter(_.kind == "mrg")
          .filter(r => names(s"merge-${r.id}") || !names(s"mrg-${r.id}"))
          .map(r => (r.id, byName.get(s"merge-${r.id}")
            .map(_.getModificationTime).orElse(r.atMs)))
        val recIds = recMerges.map(_._1).toSet
        val legacyMerges = names.toSeq.filter(_.matches("merge-\\d+"))
          .map(_.stripPrefix("merge-").toLong)
          .filterNot(recIds)
          .map(i => (i, Some(byName(s"merge-$i").getModificationTime)
            : Option[Long]))
        val committedMergeIds = recIds ++ legacyMerges.map(_._1)
        val merges = (recMerges ++ legacyMerges).sortBy(_._1)
          .map { case (i, at) => ("merge", i, true, at) }
        val intents = names.toSeq.filter(_.matches("merge-\\d+\\.intent"))
          .map(_.stripPrefix("merge-").stripSuffix(".intent").toLong)
          .filterNot(committedMergeIds).sorted
          .map(i => ("merge", i, false,
            Some(byName(s"merge-$i.intent").getModificationTime)))
        folded ++ tail ++ dels ++ delks ++ delrs ++ upds ++ updks ++
          updrs ++ replays ++
          merges ++ intents
      }
    import spark.implicits._
    entries.toDF("kind", "id", "committed", "at_ms")
  }

  /** Operational view of the table (the DESCRIBE DETAIL every table
    * format grows): one row per LIVE unit — name, data files, bytes,
    * exact row count (parquet footer record counts, no data read),
    * the cluster-key range, and per-clustered-column min/max from the
    * same statistics pruning consumes. Inspecting what the pruner
    * sees is how a user debugs a box scan that reads too much (e.g. a
    * skew-widened unit). Driver-only metadata pass, O(live units). */
  def describe(spark: SparkSession, dir: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val grid = readGrid(spark, dir)
    val (f, _) = DedupIngest.fs(spark, s"$dir/data")
    // unit name relative to data/ (leafUnits' convention), robust to
    // scheme-qualified listing paths
    def unitName(d: org.apache.hadoop.fs.Path): String =
      if (d.getParent.getName == "data") d.getName
      else s"${d.getParent.getName}/${d.getName}"
    val rows = liveDirs(spark, dir).map { d =>
      val files = f.listStatus(d).toSeq.filter(s =>
        s.isFile && isDataFile(s.getPath.getName))
      val nRows = unitRows(f, d) // sidecar-first, footers as fallback
      val ranges = (grid.cols :+ KeyCol :+ BatchCol).map(c =>
        dirColumnRange(f, d, c))
      (unitName(d), files.size.toLong,
        files.map(_.getLen).sum, nRows,
        ranges.map(_.map(_._1)), ranges.map(_.map(_._2)))
    }
    import spark.implicits._
    rows.toDF("unit", "files", "bytes", "rows", "col_mins", "col_maxs")
      .withColumn("stat_cols",
        typedLit(grid.cols :+ KeyCol :+ BatchCol))
  }
}
