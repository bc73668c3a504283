package graft.streaming

/** The lock's one concurrency claim, exercised with REAL threads: of
  * two writers racing the same dir, exactly one enters, the loser gets
  * the holder-naming error, and the dir is reusable after release.
  * (The IndexIngest/DedupIngest specs cover the file-level crash and
  * lease paths; this pins the mutual exclusion itself.) */
class LedgerLockSpec extends graft.SparkSpec {

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("two threads racing withLock: exactly one enters; the loser " +
      "fails fast; release reopens the dir") {
    val dir = tmp("lock-race")
    val inside = new java.util.concurrent.CountDownLatch(1)
    val proceed = new java.util.concurrent.CountDownLatch(1)
    val winnerRan = new java.util.concurrent.atomic.AtomicBoolean(false)
    val t1 = new Thread(() => {
      LedgerLock.withLock(spark, dir) {
        winnerRan.set(true)
        inside.countDown()
        // hold the lock until the loser has observed the contention
        assert(proceed.await(30, java.util.concurrent.TimeUnit.SECONDS))
      }
    })
    t1.start()
    assert(inside.await(30, java.util.concurrent.TimeUnit.SECONDS),
      "writer 1 must acquire")
    // writer 2 races while writer 1 holds — must throw, not wait
    val e = intercept[LedgerLock.ConcurrentWriterException] {
      LedgerLock.withLock(spark, dir) { fail("second writer entered") }
    }
    assert(e.getMessage.contains("locked by writer"))
    proceed.countDown()
    t1.join(30000)
    assert(!t1.isAlive && winnerRan.get)
    // released on exit: the next writer enters immediately
    var reentered = false
    LedgerLock.withLock(spark, dir) { reentered = true }
    assert(reentered)
    // an exception inside the body still releases in the finally
    intercept[RuntimeException] {
      LedgerLock.withLock(spark, dir) { throw new RuntimeException("boom") }
    }
    LedgerLock.withLock(spark, dir) { () }
  }

  private def localHost: String = {
    val n = java.lang.management.ManagementFactory.getRuntimeMXBean.getName
    n.substring(n.indexOf('@') + 1)
  }

  /** A pid that PROVABLY belonged to an exited process: spawn a
    * trivial child, wait for it, return its pid. */
  private def deadPid(): Long = {
    val p = new ProcessBuilder("true").start()
    assert(p.waitFor(30, java.util.concurrent.TimeUnit.SECONDS))
    // waitFor returning guarantees exit; ProcessHandle may briefly
    // still resolve while the zombie is reaped — poll it out
    val deadline = System.currentTimeMillis() + 10000
    while (java.lang.ProcessHandle.of(p.pid()).isPresent &&
        java.lang.ProcessHandle.of(p.pid()).get.isAlive &&
        System.currentTimeMillis() < deadline)
      Thread.sleep(10)
    p.pid()
  }

  test("withLockWait budget expiry on a LIVE holder throws the " +
      "INFORMATIVE holder-naming error, not the generic cycling " +
      "backstop (whose tick count always exceeds 4 on real budgets)") {
    val dir = tmp("lock-wait-expire")
    val inside = new java.util.concurrent.CountDownLatch(1)
    val proceed = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() => {
      LedgerLock.withLock(spark, dir) {
        inside.countDown()
        proceed.await(30, java.util.concurrent.TimeUnit.SECONDS): Unit
      }
    })
    holder.start()
    assert(inside.await(10, java.util.concurrent.TimeUnit.SECONDS))
    try {
      // 400ms budget = ~8 ticks, attempts well past the backstop's 4
      val e = intercept[LedgerLock.ConcurrentWriterException] {
        LedgerLock.withLockWait(spark, dir, 400L) { fail("must not enter") }
      }
      assert(e.getMessage.contains("locked by writer"),
        s"budget expiry must name the holder: ${e.getMessage}")
      assert(e.getMessage.contains("waited 400ms"),
        s"and report the spent budget: ${e.getMessage}")
    } finally {
      proceed.countDown()
      holder.join(10000)
    }
    // the dir is reusable once the holder releases
    var entered = false
    LedgerLock.withLockWait(spark, dir, 400L) { entered = true }
    assert(entered)
  }

  test("dead-holder detection: same-host exited pid is provably dead; " +
      "live pid, foreign host, and garbage are not") {
    val dead = deadPid()
    val live = java.lang.ProcessHandle.current().pid()
    assert(LedgerLock.holderProvablyDead(s"$dead@$localHost:abcd1234"))
    assert(!LedgerLock.holderProvablyDead(s"$live@$localHost:abcd1234"),
      "this JVM's own pid is alive")
    assert(!LedgerLock.holderProvablyDead(s"$dead@not-this-host:abcd1234"),
      "a foreign host can never be proven dead locally")
    assert(!LedgerLock.holderProvablyDead("not-a-lock-owner"))
    assert(!LedgerLock.holderProvablyDead(""))
    assert(!LedgerLock.holderProvablyDead(s"pid@$localHost:x"),
      "unparseable pid is ambiguity, never broken")
  }

  test("a crashed same-host writer's lock is retired automatically; " +
      "a live same-host writer's lock still blocks") {
    val dir = tmp("lock-dead")
    val lockP = java.nio.file.Paths.get(s"$dir/markers/lock")
    java.nio.file.Files.createDirectories(lockP.getParent)
    // dead-pid lock: acquire retires it without staleMs or break()
    java.nio.file.Files.write(lockP,
      s"${deadPid()}@$localHost:dead0000".getBytes("UTF-8"))
    var entered = false
    LedgerLock.withLock(spark, dir) { entered = true }
    assert(entered, "dead-holder lock must self-recover")
    assert(!java.nio.file.Files.exists(lockP))
    assert(java.nio.file.Files.list(lockP.getParent).count() === 0,
      "the retired lock copy must not linger")
    // live-pid lock (this JVM, different nonce — a second local writer
    // that did NOT crash): fails fast naming it
    val live = java.lang.ProcessHandle.current().pid()
    java.nio.file.Files.write(lockP,
      s"$live@$localHost:cafe0000".getBytes("UTF-8"))
    val e = intercept[LedgerLock.ConcurrentWriterException] {
      LedgerLock.withLock(spark, dir) { fail("entered past a live lock") }
    }
    assert(e.getMessage.contains(s"$live@$localHost:cafe0000"))
    java.nio.file.Files.delete(lockP)
  }

  test("release verifies ownership: a lock lease-retired mid-body is " +
      "NOT deleted out from under its new holder, and the stalled " +
      "writer is told") {
    val dir = tmp("lock-steal")
    val lockP = java.nio.file.Paths.get(s"$dir/markers/lock")
    // stalled writer enters; while it 'pauses', a recoverer retires
    // its lock and a NEW writer acquires (simulated by swapping the
    // lock's content — exactly the on-disk state after a lease break)
    val e = intercept[LedgerLock.ConcurrentWriterException] {
      LedgerLock.withLock(spark, dir) {
        java.nio.file.Files.write(lockP,
          "9999@other-host:feed0000".getBytes("UTF-8"))
      }
    }
    assert(e.getMessage.contains("lease-retired"), e.getMessage)
    assert(java.nio.file.Files.exists(lockP),
      "the new holder's lock must survive the stalled writer's release")
    assert(new String(java.nio.file.Files.readAllBytes(lockP), "UTF-8")
      === "9999@other-host:feed0000")
    java.nio.file.Files.delete(lockP)
    // a body exception is NOT masked: the ownership error rides along
    // as a suppressed exception
    val e2 = intercept[RuntimeException] {
      LedgerLock.withLock(spark, dir) {
        java.nio.file.Files.write(lockP,
          "9999@other-host:feed0001".getBytes("UTF-8"))
        throw new RuntimeException("body failed first")
      }
    }
    assert(e2.getMessage === "body failed first")
    assert(e2.getSuppressed.exists(
      _.isInstanceOf[LedgerLock.ConcurrentWriterException]))
    java.nio.file.Files.delete(lockP)
    // vanished lock (operator break, no re-acquire): release is quiet
    var ran = false
    LedgerLock.withLock(spark, dir) {
      ran = true
      java.nio.file.Files.delete(lockP)
    }
    assert(ran)
  }

  test("a LIVE holder outliving the stale lease is NOT lease-broken: " +
      "the renewal heartbeat keeps the lock fresh for the whole hold; " +
      "after release the dir reopens") {
    val dir = tmp("lock-renew")
    spark.conf.set(LedgerLock.LockRenewMsKey, "100")
    spark.conf.set(LedgerLock.LockStaleMsKey, "500")
    try {
      val inside = new java.util.concurrent.CountDownLatch(1)
      val proceed = new java.util.concurrent.CountDownLatch(1)
      val t1 = new Thread(() => {
        LedgerLock.withLock(spark, dir) {
          inside.countDown()
          // a 1.5s hold — far past the 500ms lease; without renewal a
          // concurrent lease acquire would retire this LIVE holder
          assert(proceed.await(30,
            java.util.concurrent.TimeUnit.SECONDS))
        }
      })
      t1.start()
      assert(inside.await(30, java.util.concurrent.TimeUnit.SECONDS))
      val deadline = System.currentTimeMillis() + 1500L
      var contentions = 0
      while (System.currentTimeMillis() < deadline) {
        // every acquire during the hold must see a LIVE (fresh)
        // holder and refuse — never retire it and enter
        intercept[LedgerLock.ConcurrentWriterException](
          LedgerLock.withLock(spark, dir) {
            fail("lease-broke a live renewing holder")
          })
        contentions += 1
        Thread.sleep(150L)
      }
      assert(contentions >= 5, s"only $contentions contention checks")
      proceed.countDown()
      t1.join(30000)
      assert(!t1.isAlive)
      // released: the next acquire enters normally
      var ran = false
      LedgerLock.withLock(spark, dir) { ran = true }
      assert(ran)
    } finally {
      spark.conf.unset(LedgerLock.LockRenewMsKey)
      spark.conf.unset(LedgerLock.LockStaleMsKey)
    }
  }

  test("streaming stale-lease default: a FOREIGN-host holder older " +
      "than the default is retired by the stream acquire; batch " +
      "acquires (no default) still refuse it; LockStaleMsKey overrides") {
    def plantForeign(dir: String, ageMs: Long): java.io.File = {
      val markers = new java.io.File(s"$dir/markers")
      markers.mkdirs()
      val lock = new java.io.File(markers, "lock")
      java.nio.file.Files.write(lock.toPath,
        "12345@some-other-host:abcdef12".getBytes("UTF-8"))
      assert(lock.setLastModified(System.currentTimeMillis() - ageMs))
      lock
    }
    // the dead-pid path cannot prove a foreign host's death…
    assert(!LedgerLock.holderProvablyDead("12345@some-other-host:ab"))
    // …so a plain batch acquire (staleMsDefault 0, no conf) refuses
    val dirA = tmp("lock-stream-stale-a")
    plantForeign(dirA, ageMs = 60L * 60 * 1000)
    intercept[LedgerLock.ConcurrentWriterException](
      LedgerLock.withLockWait(spark, dirA, 0L) { fail("must not enter") })
    // the STREAM acquire's default lease retires it (hour-old holder
    // vs the 10-minute default) and the body runs
    var ran = false
    LedgerLock.withLockWait(spark, dirA, 0L,
      LedgerLock.StreamLockStaleMsDefault) { ran = true }
    assert(ran, "a dead cross-host stream writer must self-recover")
    // a FRESH foreign holder is NOT lease-broken by the default —
    // only waited on (live writers' sections are never this long)
    val dirB = tmp("lock-stream-stale-b")
    plantForeign(dirB, ageMs = 0L)
    intercept[LedgerLock.ConcurrentWriterException](
      LedgerLock.withLockWait(spark, dirB, 0L,
        LedgerLock.StreamLockStaleMsDefault) { fail("must not enter") })
    // an explicit conf overrides the default (here: tighter)
    val dirC = tmp("lock-stream-stale-c")
    plantForeign(dirC, ageMs = 5000L)
    spark.conf.set(LedgerLock.LockStaleMsKey, "1000")
    try {
      var ranC = false
      LedgerLock.withLockWait(spark, dirC, 0L) { ranC = true }
      assert(ranC, "the conf lease must retire the 5s-old holder")
    } finally spark.conf.unset(LedgerLock.LockStaleMsKey)
  }
}
