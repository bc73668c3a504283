package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.LongOffset

/** The rate-limit cursor's PERSISTENCE contract
  * ([[LayoutTableStreamSource]]): with `maxBatchesPerTrigger` set, the
  * offered high-water mark survives a restart via the engine-scoped
  * metadataPath — a caught-up consumer of a long table must offer the
  * checkpointed frontier on its FIRST poll, not creep up from the
  * floor by `maxBatchesPerTrigger` per empty trigger (hours of full
  * markers listings on a long-lived table). Driven at the Source level
  * directly, where the cursor is observable poll by poll. */
class LayoutSourceCursorSpec extends graft.SparkSpec {

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def offered(src: LayoutTableStreamSource): Long =
    src.getOffset match {
      case Some(LongOffset(v)) => v
      case other => fail(s"expected a LongOffset, got $other")
    }

  test("offered cursor persists under metadataPath: a restarted " +
      "rate-limited source offers the frontier immediately") {
    import spark.implicits._
    val dir = tmp("layout-cursor")
    val meta = tmp("layout-cursor-meta")
    LayoutIngest.bootstrap(spark, dir, LayoutIngest.Grid(
      Seq("x", "y"), Seq((0L, 99L), (0L, 99L)), bits = 4))
    (0 until 4).foreach { b =>
      assert(LayoutIngest.ingestBatch(
        (b * 10 until (b + 1) * 10).map(i =>
          (i.toLong, (i * 7 % 100).toLong, (i * 13 % 100).toLong))
          .toDF("id", "x", "y"),
        b.toLong, dir, 1))
    }
    // first lifetime: the cap paces offers 1 -> 3
    val a = new LayoutTableStreamSource(spark, dir,
      maxBatchesPerTrigger = 2L, startingBatch = 0L,
      metadataPath = Some(meta))
    assert(offered(a) === 1L)
    assert(offered(a) === 3L)
    // clean restart (the engine, caught up, never calls getBatch to
    // re-seed): the persisted mark must put the first offer AT the
    // frontier, not at min(3, floor-1 + cap) = 1
    val b = new LayoutTableStreamSource(spark, dir,
      maxBatchesPerTrigger = 2L, startingBatch = 0L,
      metadataPath = Some(meta))
    assert(offered(b) === 3L,
      "a restarted source must not re-offer below the persisted mark")
    // and WITHOUT a metadataPath the documented self-heal fallback
    // still applies (in-memory cursor from the floor)
    val c = new LayoutTableStreamSource(spark, dir,
      maxBatchesPerTrigger = 2L, startingBatch = 0L, metadataPath = None)
    assert(offered(c) === 1L)
    // an UNBOUNDED source writes no cursor files at all
    val meta2 = tmp("layout-cursor-meta2")
    val d = new LayoutTableStreamSource(spark, dir,
      maxBatchesPerTrigger = Long.MaxValue, startingBatch = 0L,
      metadataPath = Some(meta2))
    assert(offered(d) === 3L)
    assert(!new java.io.File(s"$meta2/graft-offered").exists(),
      "unbounded sources must not churn cursor files")
    // superseded marks are retired: exactly one offered-<n> file
    val files = Option(new java.io.File(s"$meta/graft-offered").list())
      .getOrElse(Array.empty[String]).filter(_.startsWith("offered-"))
    assert(files.toSeq === Seq("offered-3"), files.toSeq.toString)
  }
}
