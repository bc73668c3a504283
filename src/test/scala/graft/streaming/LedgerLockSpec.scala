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
}
