package graft

import graft.streaming.LayoutIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The txn-minted stream regime (the DEFAULT): (queryId, epoch) →
  * ledger-id reservations decouple a stream's ids from its epochs, so
  * batch appends and other streams interleave on one table without
  * the epoch-collision silent-drop hazard the `ids = EpochKeyedIds`
  * opt-in (epoch-keyed, content-addressed) regime documents. */
class LayoutTxnSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private val grid = LayoutIngest.Grid(
    Seq("x", "y"), Seq((0L, 99L), (0L, 99L)), bits = 4)

  private def rows(ids: Range): Seq[(Long, Long, Long)] =
    ids.map(i => (i.toLong, (i * 7 % 100).toLong, (i * 13 % 100).toLong))

  private def markerNames(dir: String): Set[String] =
    Option(new java.io.File(s"$dir/markers").list())
      .map(_.toSet).getOrElse(Set.empty)

  test("DEFAULT stream on a PRE-SEEDED table mints fresh ids — no " +
      "epoch-0 collision drop (the hazard the epochIds opt-in documents)") {
    implicit val sql = spark.sqlContext
    // CONTRAST, epochIds opt-in: batch 0 pre-seeded, fresh stream's
    // epoch 0 replays as a no-op and its rows silently vanish — the
    // exact failure the txn-minted default exists to remove (and why
    // the epoch regime's doc forbids mixing writers)
    locally {
      val dir = tmp("txn-contrast")
      LayoutIngest.bootstrap(spark, dir, grid)
      assert(LayoutIngest.ingestBatch(
        rows(0 until 10).toDF("id", "x", "y"), 0L, dir, 1))
      val input = MemoryStream[(Long, Long, Long)]
      input.addData(rows(100 until 110))
      val q = LayoutIngest.start(input.toDF().toDF("id", "x", "y"),
        dir, tmp("txn-contrast-ck"), availableNow = true,
        ids = graft.streaming.LayoutIngest.EpochKeyedIds)
      try q.processAllAvailable() finally q.stop()
      assert(LayoutIngest.read(spark, dir).count() === 10L,
        "epoch regime: epoch 0 collides with the seeded batch 0 " +
          "and no-ops (documented; the txn-minted default is the fix)")
    }
    // the default: same setup, the stream RESERVES the next unused id
    // and nothing is dropped
    val dir = tmp("txn-seeded")
    LayoutIngest.bootstrap(spark, dir, grid)
    assert(LayoutIngest.ingestBatch(
      rows(0 until 10).toDF("id", "x", "y"), 0L, dir, 1))
    val input = MemoryStream[(Long, Long, Long)]
    input.addData(rows(100 until 110))
    val q = LayoutIngest.start(input.toDF().toDF("id", "x", "y"),
      dir, tmp("txn-seeded-ck"), availableNow = true)
    try q.processAllAvailable() finally q.stop()
    assert(LayoutIngest.read(spark, dir).count() === 20L)
    // per-row provenance: the seed stays batch 0, the stream's epoch 0
    // landed as ledger id 1 (the fold may have collapsed the MARKERS
    // into the watermark, but __batch is immutable row state)
    val byBatch = LayoutIngest.readSince(spark, dir, -1L)
      .groupBy(LayoutIngest.BatchCol).count()
      .as[(Long, Long)].collect().toMap
    assert(byBatch === Map(0L -> 10L, 1L -> 10L),
      s"stream epoch 0 must mint ledger id 1: $byBatch")
  }

  test("txn stream interleaves with batch appends and a SECOND txn " +
      "stream: every writer's rows survive, ids never collide") {
    implicit val sql = spark.sqlContext
    val dir = tmp("txn-interleave")
    LayoutIngest.bootstrap(spark, dir, grid)
    val ck1 = tmp("txn-il-ck1")
    // stream 1, epoch 0
    val in1 = MemoryStream[(Long, Long, Long)]
    in1.addData(rows(0 until 10))
    val q1 = LayoutIngest.start(in1.toDF().toDF("id", "x", "y"),
      dir, ck1, availableNow = true)
    try q1.processAllAvailable() finally q1.stop()
    // batch append takes the next id
    val appended = LayoutIngest.appendNext(spark, dir,
      rows(10 until 20).toDF("id", "x", "y"), 1)
    assert(appended === 1L)
    // stream 2 (different checkpoint = different query id), epoch 0:
    // in the epoch-keyed opt-in this would no-op against the stream-1
    // batch 0; here it mints id 2
    val in2 = MemoryStream[(Long, Long, Long)]
    in2.addData(rows(20 until 30))
    val q2 = LayoutIngest.start(in2.toDF().toDF("id", "x", "y"),
      dir, tmp("txn-il-ck2"), availableNow = true)
    try q2.processAllAvailable() finally q2.stop()
    // stream 1 RESTARTS on its own checkpoint with new data: epoch 1
    // must mint ABOVE everything, not collide with id 1
    in1.addData(rows(30 until 40))
    val q1b = LayoutIngest.start(in1.toDF().toDF("id", "x", "y"),
      dir, ck1, availableNow = true)
    try q1b.processAllAvailable() finally q1b.stop()
    val got = LayoutIngest.read(spark, dir)
      .select("id").as[Long].collect().toSet
    assert(got === (0 until 40).map(_.toLong).toSet,
      "all four writers' rows must coexist — nothing dropped, " +
        "nothing duplicated")
    // retirement: at most ONE reservation marker per stream remains
    val txns = markerNames(dir).filter(_.startsWith("txn-"))
    val perQid = txns.groupBy(_.split("-").last)
    assert(perQid.values.forall(_.size == 1),
      s"compactMarkers must keep only each stream's newest txn: $txns")
  }

  test("reservation crash window: a reserved-but-uncommitted id is " +
      "honored by the replay, skipped by appendNext, refused by " +
      "mergeRows") {
    val dir = tmp("txn-crash")
    LayoutIngest.bootstrap(spark, dir, grid)
    assert(LayoutIngest.ingestBatch(
      rows(0 until 10).toDF("id", "x", "y"), 0L, dir, 1))
    // simulate a txn stream that crashed between reserving id 1 for
    // (qid, epoch 3) and publishing its batch
    val markers = new java.io.File(s"$dir/markers")
    val qid = "11111111-2222-3333-4444-555555555555"
    assert(new java.io.File(markers, s"txn-e3-i1-$qid").createNewFile())
    // appendNext must skip the reserved id
    assert(LayoutIngest.appendNext(spark, dir,
      rows(10 until 20).toDF("id", "x", "y"), 1) === 2L)
    // mergeRows under the reserved id is refused with the typed error
    val e = intercept[LayoutIngest.StaleBatchIdException] {
      LayoutIngest.mergeRows(spark, dir, "id",
        Seq((5L, 5L, 42L)).toDF("id", "x", "y"), batchId = 1L)
    }
    assert(e.getMessage.contains("reserved"))
    // ...and mergeRowsNext re-mints past it
    assert(LayoutIngest.mergeRowsNext(spark, dir, "id",
      Seq((5L, 5L, 42L)).toDF("id", "x", "y")) === 3L)
    // the crashed stream's replay of its in-flight epoch resolves the
    // SAME reserved id (no fresh mint — the binding is the marker),
    // and the owed batch lands under it without collision
    val replayId = graft.streaming.LedgerLock.withLock(spark, dir)(
      LayoutIngest.streamLedgerId(spark, dir, qid, 3L))
    assert(replayId === 1L)
    assert(LayoutIngest.ingestBatch(
      rows(90 until 95).toDF("id", "x", "y"), replayId, dir, 1))
    assert(LayoutIngest.read(spark, dir).count() === 25L)
  }

  test("appendNext's id scan skips ORPHAN batch dirs and STANDING " +
      "merge intents (the adversarial INSERT-INTO window)") {
    val dir = tmp("txn-orphan-intent")
    LayoutIngest.bootstrap(spark, dir, grid)
    assert(LayoutIngest.ingestBatch(
      rows(0 until 10).toDF("id", "x", "y"), 0L, dir, 1))
    // a writer crashed between the publish rename and the marker
    // create: batch-5 exists with NO marker — minting 5 would ADOPT
    // its data and silently drop the new frame (ingestBatch's
    // target-exists recovery)
    val orphanSrc = tmp("txn-orphan-src")
    LayoutIngest.bootstrap(spark, orphanSrc, grid)
    assert(LayoutIngest.ingestBatch(
      rows(40 until 45).toDF("id", "x", "y"), 5L, orphanSrc, 1))
    java.nio.file.Files.move(
      new java.io.File(s"$orphanSrc/data/batch-5").toPath,
      new java.io.File(s"$dir/data/batch-5").toPath)
    // a merge crashed after recording its intent under id 7: the owed
    // replay appends under 7, so 7 is claimed too
    assert(new java.io.File(s"$dir/markers/merge-7.intent")
      .createNewFile())
    val minted = LayoutIngest.appendNext(spark, dir,
      rows(20 until 30).toDF("id", "x", "y"), 1)
    assert(minted === 8L,
      s"appendNext must mint past the orphan (5) and the intent (7), " +
        s"got $minted")
    // the orphan's rows and the append's rows both survive (the orphan
    // is adopted by the next maintenance pass; its data was live all
    // along by the publish-point rule)
    assert(LayoutIngest.read(spark, dir)
      .select("id").as[Long].collect().toSet ===
      ((0 until 10) ++ (40 until 45) ++ (20 until 30))
        .map(_.toLong).toSet)
  }
}
