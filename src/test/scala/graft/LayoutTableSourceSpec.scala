package graft

import graft.streaming.{LayoutIngest, LayoutTableSource}
import org.apache.spark.sql.functions._

/** The clustered table as a Structured Streaming source: checkpointed
  * incremental consumption (each trigger delivers exactly the newly
  * committed batches), the gap rule (an id above a gap holds the
  * offset back until the gap commits — exactly-once ordering), and
  * schema/provenance fail-fast. */
class LayoutTableSourceSpec extends SparkSpec {
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

  test("end-to-end incremental consumption: each trigger delivers the " +
      "newly committed batches with __batch; a gap holds the offset " +
      "back until it commits") {
    val dir = tmp("layout-source")
    LayoutIngest.bootstrap(spark, dir, grid)
    (0 until 2).foreach { b =>
      assert(LayoutIngest.ingestBatch(
        rows(b * 10 until (b + 1) * 10).toDF("id", "x", "y"),
        b.toLong, dir, 1))
    }
    assert(LayoutIngest.contiguousCommittedBatch(spark, dir) === 1L)

    val sink = s"layout_src_${System.nanoTime()}"
    val q = spark.readStream
      .format(classOf[LayoutTableSource].getName)
      .option("path", dir)
      .load()
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", tmp("layout-source-ck"))
      .start()
    try {
      q.processAllAvailable()
      def got: Map[Long, Long] = spark.table(sink)
        .select("id", LayoutIngest.BatchCol).as[(Long, Long)]
        .collect().toMap
      assert(got.keySet === (0L until 20L).toSet)
      assert(got(5L) === 0L && got(15L) === 1L,
        "__batch must ride along for consumer checkpointing")

      // a batch ABOVE A GAP (id 3; 2 is missing) must NOT be served:
      // serving it would deliver out of order and skip 2 forever
      assert(LayoutIngest.ingestBatch(
        rows(30 until 40).toDF("id", "x", "y"), 3L, dir, 1))
      assert(LayoutIngest.contiguousCommittedBatch(spark, dir) === 1L)
      q.processAllAvailable()
      assert(got.keySet === (0L until 20L).toSet,
        "rows above the gap must stay invisible")

      // the gap commits -> both 2 and 3 arrive, in one or two triggers
      assert(LayoutIngest.ingestBatch(
        rows(20 until 30).toDF("id", "x", "y"), 2L, dir, 1))
      assert(LayoutIngest.contiguousCommittedBatch(spark, dir) === 3L)
      q.processAllAvailable()
      assert(got.keySet === (0L until 40L).toSet)
      assert(got(25L) === 2L && got(35L) === 3L)

      // a fold must not disturb the already-consumed offsets and the
      // NEXT increment still arrives (provenance survives compaction)
      LayoutIngest.compact(spark, dir, smallFileBytes = 1L << 30)
      assert(LayoutIngest.ingestBatch(
        rows(40 until 45).toDF("id", "x", "y"), 4L, dir, 1))
      q.processAllAvailable()
      assert(got.keySet === (0L until 45L).toSet)
      assert(spark.table(sink).count() === 45,
        "no batch may be delivered twice")
    } finally q.stop()
  }

  test("fail-fast: missing path option; table without a stored schema") {
    val e = intercept[IllegalArgumentException] {
      spark.readStream.format(classOf[LayoutTableSource].getName)
        .load().writeStream.format("noop").start()
    }
    assert(e.getMessage.contains("path"), e.getMessage)
    // a dir with no schema sidecar (pre-provenance table) is refused
    // at schema resolution, not silently empty
    val bare = tmp("layout-source-bare")
    LayoutIngest.bootstrap(spark, bare, grid)
    val e2 = intercept[IllegalArgumentException] {
      spark.readStream.format(classOf[LayoutTableSource].getName)
        .option("path", bare).load()
    }
    assert(e2.getMessage.contains("stored schema"), e2.getMessage)
  }

  test("maxBatchesPerTrigger: catch-up is rate-limited to bounded " +
      "micro-batches, union still exactly-once") {
    val dir = tmp("layout-source-rate")
    LayoutIngest.bootstrap(spark, dir, grid)
    (0 until 4).foreach { b =>
      assert(LayoutIngest.ingestBatch(
        rows(b * 10 until (b + 1) * 10).toDF("id", "x", "y"),
        b.toLong, dir, 1))
    }
    val sink = s"layout_rate_${System.nanoTime()}"
    val q = spark.readStream.format("graft-layout")
      .option("path", dir)
      .option("maxBatchesPerTrigger", "1")
      .load()
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", tmp("layout-source-rate-ck"))
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table(sink).count() === 40,
        "the full backlog must drain, just in bounded steps")
      assert(spark.table(sink).select("id").distinct().count() === 40,
        "no batch may be delivered twice")
      // a 4-batch backlog at cap 1 takes >= 4 non-empty micro-batches —
      // the cap's whole point: no single giant catch-up transaction
      val nonEmpty = q.recentProgress.count(_.numInputRows > 0)
      assert(nonEmpty >= 4,
        s"expected >= 4 rate-limited micro-batches, got $nonEmpty")
      assert(q.recentProgress.filter(_.numInputRows > 0)
          .forall(_.numInputRows <= 10),
        "each micro-batch must carry at most ONE ingest batch's rows")
    } finally q.stop()
    // option validation fails fast — at load(), not asynchronously on
    // the stream thread
    val e = intercept[IllegalArgumentException] {
      spark.readStream.format("graft-layout")
        .option("path", dir)
        .option("maxBatchesPerTrigger", "0").load()
    }
    assert(e.getMessage.contains("positive"), e.getMessage)
  }

  test("startingBatch: a fresh checkpoint tails from the floor " +
      "(bootstrap-from-snapshot); later increments still arrive") {
    val dir = tmp("layout-source-start")
    LayoutIngest.bootstrap(spark, dir, grid)
    (0 until 4).foreach { b =>
      assert(LayoutIngest.ingestBatch(
        rows(b * 10 until (b + 1) * 10).toDF("id", "x", "y"),
        b.toLong, dir, 1))
    }
    val sink = s"layout_start_${System.nanoTime()}"
    val q = spark.readStream.format("graft-layout")
      .option("path", dir)
      .option("startingBatch", "2")
      .load()
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", tmp("layout-source-start-ck"))
      .start()
    try {
      q.processAllAvailable()
      def got: Set[Long] = spark.table(sink)
        .select("id").as[Long].collect().toSet
      assert(got === (20L until 40L).toSet,
        "history below the floor must never be served")
      // the floor applies only to the FIRST range — the checkpointed
      // tail keeps flowing normally
      assert(LayoutIngest.ingestBatch(
        rows(40 until 50).toDF("id", "x", "y"), 4L, dir, 1))
      q.processAllAvailable()
      assert(got === (20L until 50L).toSet)
      assert(spark.table(sink).count() === 30, "no double delivery")
    } finally q.stop()
    val e = intercept[IllegalArgumentException] {
      spark.readStream.format("graft-layout")
        .option("path", dir).option("startingBatch", "-1").load()
    }
    assert(e.getMessage.contains("non-negative"), e.getMessage)
  }

  test("shortName resolves: .format(\"graft-layout\") finds the source " +
      "through the DataSourceRegister service file") {
    // the scaladoc advertises the short name; without the META-INF
    // services entry only the class-name form resolved
    val bare = tmp("layout-source-short")
    LayoutIngest.bootstrap(spark, bare, grid)
    val e = intercept[IllegalArgumentException] {
      spark.readStream.format("graft-layout").option("path", bare).load()
    }
    // lookup succeeded (we reached OUR schema validation, not Spark's
    // "Failed to find data source" ClassNotFound path)
    assert(e.getMessage.contains("stored schema"), e.getMessage)
  }
}
