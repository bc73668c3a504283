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
 *  - Every mutator holds the dir's [[LedgerLock]] (single-writer,
 *    fail-fast; same-host dead writers self-recover).
 *
 * 100 TB: nothing here is driver-bound — batches shuffle once on the
 * key (the range partition), compaction reads only the small tail, and
 * the table serves statistics-pruned scans the whole time (the
 * LayoutProbe numbers: a thin slice materializes 1/64 of a clustered
 * table vs all of a time-ordered one).
 */
object LayoutIngest {

  /** The persisted cluster key column. */
  val KeyCol = "zkey"

  final case class Grid(cols: Seq[String], bounds: Seq[(Long, Long)],
      bits: Int)

  /** Create the table: persist the grid (the fixed quantization
    * contract every future writer shares). Fails if the dir already
    * holds a grid — re-gridding an existing table is a rewrite, not a
    * bootstrap. */
  def bootstrap(spark: SparkSession, dir: String, grid: Grid): Unit = {
    require(grid.cols.nonEmpty && grid.cols.size == grid.bounds.size,
      "bootstrap: cols and bounds must align")
    val (f, p) = DedupIngest.fs(spark, s"$dir/grid")
    require(!f.exists(p), s"LayoutIngest.bootstrap: $dir already has a grid")
    import spark.implicits._
    Seq((grid.cols, grid.bounds.map(_._1), grid.bounds.map(_._2),
        grid.bits))
      .toDF("cols", "mns", "mxs", "bits")
      .coalesce(1).write.parquet(s"$dir/grid")
    f.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/data"))
    f.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/markers"))
  }

  def readGrid(spark: SparkSession, dir: String): Grid = {
    val r = spark.read.parquet(s"$dir/grid").head()
    Grid(r.getSeq[String](0),
      r.getSeq[Long](1).zip(r.getSeq[Long](2)),
      r.getInt(3))
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
   */
  def start(df: DataFrame, dir: String, checkpoint: String,
      filesPerBatch: Int = 4,
      availableNow: Boolean = false,
      compactEvery: Option[Int] = None,
      smallFileBytes: Long = 32L << 20): StreamingQuery = {
    require(filesPerBatch >= 1, "filesPerBatch must be >= 1")
    require(compactEvery.forall(_ > 0), "compactEvery must be positive")
    val writer = df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        LedgerLock.withLock(spark, dir) {
          ingestBatch(batch, batchId, dir, filesPerBatch): Unit
        }
        compactEvery.foreach { n =>
          if ((batchId + 1) % n == 0) compact(spark, dir, smallFileBytes)
        }
      }
    (if (availableNow)
      writer.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    else writer).start()
  }

  /** One batch's ingest under the caller-held lock; false = replay of
    * an already-committed batch (no-op). */
  private[graft] def ingestBatch(batch: DataFrame, batchId: Long,
      dir: String, filesPerBatch: Int): Boolean = {
    val spark = batch.sparkSession
    val (f, markers) = DedupIngest.fs(spark, s"$dir/markers")
    recoverCompact(spark, dir)
    val marker = new org.apache.hadoop.fs.Path(markers, s"batch-$batchId")
    if (f.exists(marker)) return false
    val target = new org.apache.hadoop.fs.Path(s"$dir/data/batch-$batchId")
    if (!f.exists(target)) {
      // crash-leftover stage from a previous attempt is garbage
      val stage = new org.apache.hadoop.fs.Path(
        s"$dir/data.stage-$batchId")
      if (f.exists(stage)) f.delete(stage, true)
      val grid = readGrid(spark, dir)
      Layout.withZOrderKeyFixed(batch,
          grid.cols.map(col), grid.bounds, grid.bits, KeyCol)
        .repartitionByRange(filesPerBatch, col(KeyCol))
        .sortWithinPartitions(KeyCol)
        .write.mode("overwrite").parquet(stage.toString)
      if (!f.rename(stage, target))
        throw new IllegalStateException(
          s"LayoutIngest: publish rename failed for batch $batchId")
    }
    // target existing without a marker = crash between rename and
    // marker; the dir is complete by construction — just re-stamp
    f.create(marker, true).close()
    true
  }

  /** Fold the small batch/gen dirs into one re-clustered generation —
    * WAL-manifested (object doc); no-op under two small dirs. */
  def compact(spark: SparkSession, dir: String,
      smallFileBytes: Long = 32L << 20): Unit =
    LedgerLock.withLock(spark, dir) {
      recoverCompact(spark, dir)
      val (f, data) = DedupIngest.fs(spark, s"$dir/data")
      val smalls =
        if (!f.exists(data)) Nil
        else f.listStatus(data).toSeq
          .filter(_.isDirectory)
          .filter(d => dirBytes(f, d.getPath) < smallFileBytes)
          .map(_.getPath)
      if (smalls.size >= 2) {
        val stamp = java.util.UUID.randomUUID().toString.take(8)
        val stage = new org.apache.hadoop.fs.Path(s"$dir/gen-$stamp.stage")
        val parts = math.max(1, math.ceil(
          smalls.map(p => dirBytes(f, p)).sum.toDouble /
            (8.0 * smallFileBytes)).toInt)
        // the key is PERSISTED, so re-clustering is a pure range
        // repartition on it — no re-quantization pass
        spark.read.parquet(smalls.map(_.toString): _*)
          .repartitionByRange(parts, col(KeyCol))
          .sortWithinPartitions(KeyCol)
          .write.mode("overwrite").parquet(stage.toString)
        val man = manifestPath(spark, dir, stamp)
        val out = f.create(man, true)
        try out.write((smalls.map(s => s"S\t${s.getName}") ++
            Seq(s"T\tgen-$stamp", "COMMIT"))
          .mkString("\n").getBytes("UTF-8"))
        finally out.close()
        recoverCompact(spark, dir) // the happy path IS the replay
      }
    }

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
            lines.collect { case l if l.startsWith("S\t") => l.drop(2) }
              .foreach { s =>
                val sp = new org.apache.hadoop.fs.Path(s"$dir/data/$s")
                if (f.exists(sp)) f.delete(sp, true)
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

  /** Read the live table — correct in every crash state WITHOUT
    * writing (object doc): committed-manifest sources are dropped
    * exactly when their target gen is published. */
  def read(spark: SparkSession, dir: String): DataFrame = {
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
    val dirs =
      if (!f.exists(data)) Nil
      else f.listStatus(data).toSeq.filter(_.isDirectory)
        .map(_.getPath).filterNot(p => logicallyDeleted(p.getName))
    if (dirs.isEmpty) {
      val grid = readGrid(spark, dir)
      // empty table with the right shape: no rows, key column present
      spark.range(0).select(
        (grid.cols.map(c => lit(null).cast("long").as(c)) :+
          lit(0L).as(KeyCol)): _*)
    } else spark.read.parquet(dirs.map(_.toString): _*)
  }

  private def dirBytes(f: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Long =
    f.listStatus(p).filter(_.isFile).map(_.getLen).sum
}
