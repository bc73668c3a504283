package graft.streaming

import org.apache.spark.sql.SparkSession

/**
 * Advisory single-writer lock shared by every marker-ledgered store
 * ([[IndexIngest]]'s four index families, [[DedupIngest]]'s corpus,
 * and [[graft.sources.VariantStore]]'s swap sinks): makes the
 * single-writer contract fail FAST instead of corrupting silently.
 * Every mutator (ingest bodies, `delete*`, `compact*`, the store
 * rewrite-and-swap updates) holds `<dir>/markers/lock` for its
 * duration, with the owner id (`pid@host:nonce`) as content, removed
 * in a `finally` — a SECOND concurrent writer (a mis-wired duplicate
 * stream, a cron compactor racing the ingest thread) throws
 * [[LedgerLock.ConcurrentWriterException]] naming the holder rather
 * than interleaving rewrites with appends.
 *
 * ATOMICITY SCOPE of the existence claim: on HDFS (and any filesystem
 * whose `create(overwrite = false)` is a namespace-atomic operation)
 * the claim is exact. On `file://` URIs Hadoop's LocalFileSystem
 * implements non-overwrite create as exists-then-create — NOT atomic
 * across processes — so the local scheme is special-cased through
 * `java.nio.file` `CREATE_NEW` (O_EXCL), which is: local multi-process
 * use is genuinely exclusive. On stores with no atomic create-if-absent
 * (plain S3A without a committer) two racing writers can both
 * "acquire"; there the lock degrades to best-effort advice — which is
 * its documented station: crash-exactness always comes from the marker
 * protocol, the lock exists to catch contract violations early.
 *
 * A writer that CRASHES mid-operation leaves the lock behind; that is
 * deliberate (the dir may hold a half-applied operation and must not
 * accept writes until someone looks). Recovery, in order of automation:
 *
 *  1. **Dead-holder auto-break** — the lock names its holder
 *     `pid@host:nonce`; an acquire that finds the holder's host equal
 *     to its OWN host and that pid provably not alive
 *     (`ProcessHandle`) retires the lock itself. This makes a
 *     single-host streaming deployment's restart-after-driver-crash
 *     self-recovering (the restarted driver is on the same host; the
 *     dead pid is evidence enough) — no operator step, no stale-lease
 *     conf. Cross-host restarts can't prove death this way; use 2/3.
 *  2. **Stale lease** — setting [[LockStaleMsKey]] > 0 in the session
 *     conf retires any lock whose modification time is older than the
 *     threshold. Live holders RENEW their lock's mtime on the
 *     [[LockRenewMsKey]] heartbeat while the body runs, so the
 *     threshold bounds missed heartbeats, not section length — set it
 *     comfortably above the renewal interval (several multiples), not
 *     above the longest operation.
 *  3. **Operator break** — confirm the holder is dead, call [[break]],
 *     re-run; every mutator is replay-safe behind its intent/commit
 *     markers, so break + replay is always sound.
 *
 * Retiring a lock (paths 1 and 2) is TOCTOU-guarded: the breaker
 * re-reads the lock, verifies it is STILL the very lock it judged
 * dead/stale (same owner content and same mtime), and then atomically
 * RENAMES it aside — rename is the arbiter, exactly one of N racing
 * recoverers wins, and the losers fall through to the fresh-lock
 * contention error instead of deleting the winner's new lock. The
 * verify-then-rename pair narrows but does not fully eliminate the
 * window (a lock released and re-created by a NEW holder between the
 * re-read and the rename would be wrongly retired — a sub-millisecond
 * window requiring the "stale" observation to have been wrong);
 * closing it entirely would need a compare-and-swap rename no
 * filesystem API offers. Advisory, not a correctness primitive.
 *
 * NOT reentrant — a mutator must never call another locked mutator on
 * the same dir while holding the lock (the ingest loops run their
 * compaction cadence AFTER the locked ingest body for this reason).
 */
object LedgerLock {

  /** Session-conf key: a lock older than this many milliseconds is
    * treated as abandoned and retired automatically on the next
    * acquire. 0 (the default) never lease-breaks — recovery is then
    * the dead-pid path (same host only) or the operator's explicit
    * [[break]]. */
  val LockStaleMsKey = "graft.ledger.lockStaleMs"

  /** Session-conf key: a GLOBAL floor (milliseconds) on how long any
    * acquire waits out a LIVE holder before throwing
    * [[ConcurrentWriterException]] — the per-call `waitMs` of
    * [[withLockWait]] and this conf combine as max. 0 (the default)
    * keeps every plain [[withLock]] fail-fast. */
  val LockWaitMsKey = "graft.ledger.lockWaitMs"

  /** Default stale lease for the STREAMING sink's tail acquires
    * ([[graft.streaming.LayoutIngest]] `microBatchIngest`), applied
    * when [[LockStaleMsKey]] is unset: every live holder RENEWS its
    * lock's mtime on the [[LockRenewMsKey]] heartbeat (one minute by
    * default), so a lock ten MINUTES old is a holder that missed ten
    * consecutive renewals — a dead or wedged writer on another host,
    * the one recovery case the same-host dead-pid break cannot prove.
    * With this default a multi-host streaming failover self-recovers
    * without operator conf, while a legitimate long-running holder —
    * a merge's tail section spans its whole append, minutes at
    * [[graft.streaming.LayoutIngest]]'s 4M-key ceiling — stays fresh
    * under its heartbeat and is never lease-broken. Batch/maintenance
    * acquires keep the conservative 0 (explicit [[LockStaleMsKey]] or
    * operator [[break]]). [[LockStaleMsKey]], when set, overrides
    * this default too. */
  val StreamLockStaleMsDefault = 600000L

  /** Session-conf key: the holder-side lock-renewal heartbeat
    * interval (milliseconds). While a body runs, a daemon timer
    * touches the lock's mtime every interval, so AGE-based lease
    * judgments ([[LockStaleMsKey]], [[StreamLockStaleMsDefault]])
    * measure "time since the holder last proved liveness", not "time
    * since acquire" — a live merge holding the tail lock across a
    * minutes-long append can no longer be retired by a concurrent
    * streaming writer's lease. <= 0 disables renewal (test hook).
    * The first touch fires one full interval after acquire, so the
    * tens-of-milliseconds marker sections never pay it. */
  val LockRenewMsKey = "graft.ledger.lockRenewMs"

  /** Default renewal interval: 1/10 of [[StreamLockStaleMsDefault]] —
    * a lease judgment at the streaming default tolerates ~10 missed
    * heartbeats before retiring a holder. */
  val LockRenewMsDefault = 60000L

  /** A second concurrent writer hit [[withLock]]'s guard. */
  final class ConcurrentWriterException(msg: String)
    extends IllegalStateException(msg)

  /** This writer's identity, written into the lock file so contention
    * errors name the holder and dead-holder detection can parse it:
    * JVM `pid@host` plus a per-JVM nonce. */
  private lazy val lockOwner: String =
    java.lang.management.ManagementFactory.getRuntimeMXBean.getName +
      ":" + java.util.UUID.randomUUID().toString.take(8)

  private def localHost: String = {
    val name = java.lang.management.ManagementFactory.getRuntimeMXBean.getName
    name.substring(name.indexOf('@') + 1)
  }

  /** Parse `pid@host:nonce` and report whether the holder is PROVABLY
    * dead: same host as this JVM and no live process with that pid.
    * Unparseable content, a foreign host, or a live pid all return
    * false — never break on ambiguity. (A recycled pid defeats this;
    * acceptable for an advisory lock, documented on the object.) */
  private[streaming] def holderProvablyDead(holder: String): Boolean = {
    val at = holder.indexOf('@')
    val colon = holder.lastIndexOf(':')
    if (at <= 0 || colon <= at + 1) return false
    holder.substring(0, at).toLongOption.exists { pid =>
      holder.substring(at + 1, colon) == localHost && {
        val h = java.lang.ProcessHandle.of(pid)
        !h.isPresent || !h.get.isAlive
      }
    }
  }

  /** Atomic existence claim. `file://` goes through nio `CREATE_NEW`
    * (O_EXCL) because Hadoop's LocalFileSystem non-overwrite create is
    * exists-then-create (see the object doc's atomicity scope). */
  private def tryAcquire(f: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Boolean =
    try {
      if (f.getScheme == "file") {
        java.nio.file.Files.write(
          java.nio.file.Paths.get(p.toUri.getPath),
          lockOwner.getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
      } else {
        val out = f.create(p, false)
        out.write(lockOwner.getBytes("UTF-8")); out.close()
      }
      true
    } catch { case _: java.io.IOException => false }

  /** One shared daemon timer drives every held lock's renewal — a
    * touch is sub-millisecond metadata work, and holds are one per
    * writer by contract, so a single thread never falls behind. */
  private lazy val renewTimer = java.util.concurrent.Executors
    .newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-ledger-lock-renew")
      t.setDaemon(true)
      t
    })

  /** Start the holder's heartbeat: every `renewMs`, touch the lock's
    * mtime — but ONLY while the file still carries OUR owner line (a
    * lock lease-retired and re-acquired mid-body belongs to the new
    * holder; extending a foreign lease is harmless but pointless, and
    * the release path surfaces the overlap loudly). IO errors are
    * swallowed: a missed touch degrades to the pre-renewal behavior,
    * never fails the body. */
  private def startRenewal(f: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, renewMs: Long)
      : Option[java.util.concurrent.ScheduledFuture[_]] =
    if (renewMs <= 0) None
    else Some(renewTimer.scheduleAtFixedRate(
      () => try {
        if (readOwner(f, p).contains(lockOwner))
          f.setTimes(p, System.currentTimeMillis(), -1L)
      } catch { case _: Exception => () },
      renewMs, renewMs, java.util.concurrent.TimeUnit.MILLISECONDS))

  private def readOwner(f: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Option[String] =
    try {
      val in = f.open(p)
      val b = new Array[Byte](256)
      val n = in.read(b); in.close()
      Some(if (n > 0) new String(b, 0, n, "UTF-8") else "")
    } catch { case _: java.io.IOException => None }

  /** Retire a lock judged dead/stale, TOCTOU-guarded (object doc):
    * verify it is still the SAME lock — owner content AND mtime — then
    * rename it aside (the atomic arbiter; one racing recoverer wins)
    * and delete the retired copy. False on any mismatch or race. */
  private def retireAside(f: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, expectOwner: String,
      expectMtime: Long): Boolean =
    try {
      if (f.getFileStatus(p).getModificationTime != expectMtime) false
      else if (!readOwner(f, p).contains(expectOwner)) false
      else {
        val aside = new org.apache.hadoop.fs.Path(p.getParent,
          s"lock.retired.${java.util.UUID.randomUUID().toString.take(8)}")
        if (!f.rename(p, aside)) false
        else { f.delete(aside, false); true }
      }
    } catch { case _: java.io.IOException => false }

  private[graft] def withLock[T](spark: SparkSession, dir: String)
      (body: => T): T = withLockWait(spark, dir, 0L)(body)

  /** [[withLock]] with a BOUNDED CONTENTION WAIT: a LIVE holder is
    * retried with short sleeps for up to `waitMs` (max of the
    * parameter and [[LockWaitMsKey]]) before the
    * [[ConcurrentWriterException]] fires. This is what lets writers
    * that legitimately interleave on one table — a streaming tail
    * writer, a concurrent batch append, a merge's short tail
    * section — wait out each other's SHORT critical sections instead
    * of failing the job, while a genuinely stuck or duplicate writer
    * still surfaces loudly once the budget is spent. Dead-holder and
    * stale-lease retirement run on every pass, so a crashed holder is
    * recovered immediately rather than waited on. `waitMs = 0` is the
    * classic fail-fast single-writer contract. */
  private[graft] def withLockWait[T](spark: SparkSession, dir: String,
      waitMs: Long, staleMsDefault: Long = 0L)(body: => T): T = {
    val (f, p) = DedupIngest.fs(spark, s"$dir/markers/lock")
    f.mkdirs(p.getParent)
    val staleMs = spark.conf.getOption(LockStaleMsKey)
      .flatMap(_.toLongOption).getOrElse(staleMsDefault)
    val budgetMs = math.max(waitMs, spark.conf.getOption(LockWaitMsKey)
      .flatMap(_.toLongOption).getOrElse(0L))
    val deadline = System.currentTimeMillis() + budgetMs
    // bounded retry: each pass either acquires, retires a provably
    // dead/stale lock and retries, retries after watching the lock
    // vanish (holder released between our create and stat), sleeps on
    // a live holder while the wait budget lasts, or throws
    var acquired = false
    var attempts = 0
    var retiresPastBudget = 0
    while (!acquired) {
      attempts += 1
      acquired = tryAcquire(f, p)
      if (!acquired) {
        val waiting = System.currentTimeMillis() < deadline
        val st = try Some(f.getFileStatus(p))
          catch { case _: java.io.IOException => None }
        var retiredThisPass = false
        st.foreach { status =>
          val holder = readOwner(f, p).getOrElse("unknown")
          val ageMs = math.max(0L,
            System.currentTimeMillis() - status.getModificationTime)
          val stale = staleMs > 0 && ageMs > staleMs
          val dead = holderProvablyDead(holder)
          val retired = (stale || dead) &&
            retireAside(f, p, holder, status.getModificationTime)
          retiredThisPass = retired
          if (!retired) {
            if (waiting)
              // live holder, budget remains: wait out its critical
              // section (coarse 50ms ticks — these sections are
              // marker-file metadata work, tens of ms)
              Thread.sleep(50L)
            else
              throw new ConcurrentWriterException(
                s"ledger dir $dir is locked by writer '$holder' " +
                  s"(${ageMs}ms old): a second concurrent writer " +
                  "violates " +
                  "the single-writer contract. If that writer is dead, " +
                  s"""call LedgerLock.break(spark, "$dir") and re-run """ +
                  "(all operations are replay-safe); same-host dead pids " +
                  s"are retired automatically, and $LockStaleMsKey > 0 " +
                  "enables lease-style recovery across hosts" +
                  (if (budgetMs > 0) s"; this acquire waited ${budgetMs}" +
                    s"ms ($LockWaitMsKey) before giving up" else "") + ".")
          }
          // retired a dead/stale lock; loop re-attempts the create. A
          // racer that slips in is seen next pass as a FRESH lock
          // (alive holder, age ~0) and produces the contention error.
        }
        // st == None: the lock vanished (holder released) — just retry.
        // Loop backstop AFTER the status pass (so a budget-expired
        // LIVE holder always gets the informative holder/age/break
        // message above, with a final dead-holder retirement attempt,
        // never this generic one), and NOT on a pass that just retired
        // (the next create attempt is owed). Retire passes past the
        // budget are themselves BOUNDED — a crash-looping co-writer
        // (or skewed lease judgments) minting fresh dead locks forever
        // must not spin this acquire unboundedly.
        if (!waiting && retiredThisPass) retiresPastBudget += 1
        if (attempts >= 4 && !waiting &&
            (!retiredThisPass || retiresPastBudget > 8))
          throw new ConcurrentWriterException(
            s"ledger dir $dir: lock contention persisted across " +
              s"$attempts acquire attempts ($retiresPastBudget " +
              "dead/stale retirements past the wait budget) — a " +
              "writer is cycling the lock. Single-writer contract " +
              "violated.")
      }
    }
    // hold heartbeat (see [[LockRenewMsKey]]): while the body runs,
    // the lock's mtime is refreshed so lease judgments measure missed
    // heartbeats, not section length — a long merge under a
    // concurrent stream's lease default is a LIVE holder and stays one
    val renewal = startRenewal(f, p,
      spark.conf.getOption(LockRenewMsKey).flatMap(_.toLongOption)
        .getOrElse(LockRenewMsDefault))
    // release ONLY our own lock: if a lease/dead-pid recovery retired
    // it mid-body (a long GC pause outliving staleMs), the file now
    // belongs to the NEW holder — deleting it would admit a third
    // writer on top of the overlap that already happened. Mutual
    // exclusion was violated either way (the marker protocol is what
    // keeps state correct); surface it loudly — without masking a
    // body exception (suppressed instead).
    var bodyError: Throwable = null
    try body
    catch { case t: Throwable => bodyError = t; throw t }
    finally {
      renewal.foreach(_.cancel(false))
      readOwner(f, p) match {
        case Some(o) if o == lockOwner => f.delete(p, false): Unit
        case Some(other) =>
          val e = new ConcurrentWriterException(
            s"ledger dir $dir: this writer's lock was lease-retired " +
              s"mid-operation and is now held by '$other' — the lease " +
              s"($LockStaleMsKey) expired while the body ran. The " +
              "marker protocol keeps the ledger replay-safe, but " +
              "raise the lease or keep bodies shorter.")
          if (bodyError == null) throw e else bodyError.addSuppressed(e)
        case None => () // already gone (operator break + no re-acquire)
      }
    }
  }

  /** Operator-driven recovery: remove a dead writer's lock (see the
    * object doc — call ONLY once the holder is known dead; the marker
    * protocol makes the subsequent replay exact). */
  def break(spark: SparkSession, dir: String): Unit = {
    val (f, p) = DedupIngest.fs(spark, s"$dir/markers/lock")
    if (f.exists(p)) f.delete(p, false)
  }
}
