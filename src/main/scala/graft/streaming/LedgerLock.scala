package graft.streaming

import org.apache.spark.sql.SparkSession

/**
 * Advisory single-writer lock shared by every marker-ledgered store
 * ([[IndexIngest]]'s four index families and [[DedupIngest]]'s corpus):
 * makes the single-writer contract fail FAST instead of corrupting
 * silently. Every mutator (ingest bodies, `delete*`, `compact*`) holds
 * `<dir>/markers/lock` for its duration. The lock file is created
 * atomically (`create(overwrite = false)` — an atomic existence claim
 * on HDFS and object-store committers) with the owner id as content,
 * and removed in a `finally`, so a SECOND concurrent writer — a
 * mis-wired duplicate stream, a cron compactor racing the ingest
 * thread — throws [[LedgerLock.ConcurrentWriterException]] naming the
 * holder rather than interleaving rewrites with appends.
 *
 * A writer that CRASHES mid-operation leaves the lock behind; that is
 * deliberate (the dir may hold a half-applied operation and must not
 * accept writes until someone looks). Recovery is exactly the ledger's
 * replay story: the operator confirms the old writer is dead, calls
 * [[break]], and re-runs — every mutator is replay-safe behind its
 * intent/commit markers, so break + replay is always sound. Setting
 * [[LockStaleMsKey]] > 0 in the session conf turns that manual step
 * into a lease: an acquire finding a lock whose modification time is
 * older than the threshold breaks it itself (two recoverers can race
 * the break — benign, because the subsequent atomic create still
 * admits exactly one). Advisory, not a correctness primitive:
 * crash-exactness comes from the marker protocol; the lock exists to
 * catch contract violations early.
 *
 * NOT reentrant — a mutator must never call another locked mutator on
 * the same dir while holding the lock (the ingest loops run their
 * compaction cadence AFTER the locked ingest body for this reason).
 */
object LedgerLock {

  /** Session-conf key: a lock older than this many milliseconds is
    * treated as abandoned and broken automatically on the next acquire.
    * 0 (the default) never auto-breaks — recovery is the operator's
    * explicit [[break]]. */
  val LockStaleMsKey = "graft.ledger.lockStaleMs"

  /** A second concurrent writer hit [[withLock]]'s guard. */
  final class ConcurrentWriterException(msg: String)
    extends IllegalStateException(msg)

  /** This writer's identity, written into the lock file so contention
    * errors name the holder: JVM `pid@host` plus a per-JVM nonce. */
  private lazy val lockOwner: String =
    java.lang.management.ManagementFactory.getRuntimeMXBean.getName +
      ":" + java.util.UUID.randomUUID().toString.take(8)

  private[streaming] def withLock[T](spark: SparkSession, dir: String)
      (body: => T): T = {
    val (f, p) = DedupIngest.fs(spark, s"$dir/markers/lock")
    f.mkdirs(p.getParent)
    val staleMs = spark.conf.getOption(LockStaleMsKey)
      .flatMap(_.toLongOption).getOrElse(0L)
    def tryAcquire(): Boolean =
      try {
        val out = f.create(p, false)
        out.write(lockOwner.getBytes("UTF-8")); out.close(); true
      } catch { case _: java.io.IOException => false }
    if (!tryAcquire()) {
      val holder = try {
        val in = f.open(p)
        val b = new Array[Byte](256)
        val n = in.read(b); in.close()
        if (n > 0) new String(b, 0, n, "UTF-8") else "unknown"
      } catch { case _: java.io.IOException => "unknown" }
      val ageMs = try
        System.currentTimeMillis() - f.getFileStatus(p).getModificationTime
      catch { case _: java.io.IOException => 0L }
      val stale = staleMs > 0 && ageMs > staleMs
      if (stale) f.delete(p, false)
      if (!stale || !tryAcquire())
        throw new ConcurrentWriterException(
          s"ledger dir $dir is locked by writer '$holder' (${ageMs}ms old)" +
            ": a second concurrent writer violates the single-writer " +
            "contract. If that writer is dead, call " +
            s"""LedgerLock.break(spark, "$dir") and re-run """ +
            s"(all operations are replay-safe), or set $LockStaleMsKey " +
            "for lease-style auto-recovery.")
    }
    try body
    finally f.delete(p, false)
  }

  /** Operator-driven recovery: remove a dead writer's lock (see the
    * object doc — call ONLY once the holder is known dead; the marker
    * protocol makes the subsequent replay exact). */
  def break(spark: SparkSession, dir: String): Unit = {
    val (f, p) = DedupIngest.fs(spark, s"$dir/markers/lock")
    if (f.exists(p)) f.delete(p, false)
  }
}
