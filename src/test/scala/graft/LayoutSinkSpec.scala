package graft

import graft.streaming.LayoutIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** `writeStream.format("graft-layout")` — the format-level streaming
  * sink ([[graft.streaming.LayoutStreamSink]]): the same micro-batch
  * body as [[LayoutIngest.start]], reachable without a library import.
  * Correctness of the ingest protocol itself is LayoutIngestSpec /
  * LayoutTxnSpec territory; this spec pins the sink SHELL — option
  * wiring, regime defaults, replay idempotence through a fresh Sink
  * object, and the typed refusals. */
class LayoutSinkSpec extends SparkSpec {
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

  test("sink lands a stream as clustered batches; keys identical to " +
      "the API ingest of the same rows") {
    implicit val sql = spark.sqlContext
    val dir = tmp("sink-table")
    LayoutIngest.bootstrap(spark, dir, grid)
    val input = MemoryStream[(Long, Long, Long)]
    input.addData(rows(0 until 50))
    input.addData(rows(50 until 100))
    val q = input.toDF().toDF("id", "x", "y").writeStream
      .format("graft-layout")
      .option("checkpointLocation", tmp("sink-ck"))
      .option("filesPerBatch", "2")
      .trigger(Trigger.AvailableNow())
      .start(dir)
    try q.awaitTermination() finally q.stop()
    // the fixed grid makes keys deterministic: an API-built twin of
    // the same rows must agree on every (id, zkey)
    val twin = tmp("sink-twin")
    LayoutIngest.bootstrap(spark, twin, grid)
    assert(LayoutIngest.ingestBatch(
      rows(0 until 100).toDF("id", "x", "y"), 0L, twin, 1))
    val got = LayoutIngest.read(spark, dir)
      .select("id", LayoutIngest.KeyCol).as[(Long, Long)].collect().toSet
    val want = LayoutIngest.read(spark, twin)
      .select("id", LayoutIngest.KeyCol).as[(Long, Long)].collect().toSet
    assert(got === want)
  }

  test("default regime is TXN-MINTED: a pre-seeded batch 0 is not " +
      "collided with — the stream's epoch 0 reserves id 1") {
    implicit val sql = spark.sqlContext
    val dir = tmp("sink-txn")
    LayoutIngest.bootstrap(spark, dir, grid)
    assert(LayoutIngest.ingestBatch(
      rows(0 until 10).toDF("id", "x", "y"), 0L, dir, 1))
    val input = MemoryStream[(Long, Long, Long)]
    input.addData(rows(100 until 110))
    val q = input.toDF().toDF("id", "x", "y").writeStream
      .format("graft-layout")
      .option("checkpointLocation", tmp("sink-txn-ck"))
      .trigger(Trigger.AvailableNow())
      .start(dir)
    try q.awaitTermination() finally q.stop()
    val byBatch = LayoutIngest.readSince(spark, dir, -1L)
      .groupBy(LayoutIngest.BatchCol).count()
      .as[(Long, Long)].collect().toMap
    assert(byBatch === Map(0L -> 10L, 1L -> 10L),
      s"sink epoch 0 must mint ledger id 1, got $byBatch")
  }

  test("epochIds=true is content-addressed: a replay from a FRESH " +
      "checkpoint no-ops on the committed epochs") {
    implicit val sql = spark.sqlContext
    val dir = tmp("sink-epoch")
    LayoutIngest.bootstrap(spark, dir, grid)
    def run(): Unit = {
      val input = MemoryStream[(Long, Long, Long)]
      input.addData(rows(0 until 30))
      val q = input.toDF().toDF("id", "x", "y").writeStream
        .format("graft-layout")
        .option("checkpointLocation", tmp("sink-epoch-ck"))
        .option("epochIds", "true")
        .trigger(Trigger.AvailableNow())
        .start(dir)
      try q.awaitTermination() finally q.stop()
    }
    run()
    assert(LayoutIngest.read(spark, dir).count() === 30L)
    run() // same rows, same epochs → marker no-ops, nothing duplicated
    assert(LayoutIngest.read(spark, dir).count() === 30L)
  }

  test("restart of the SAME checkpoint is exactly-once through a " +
      "fresh Sink object: ids and idempotence live in the ledger, " +
      "not the sink instance") {
    val dir = tmp("sink-restart")
    LayoutIngest.bootstrap(spark, dir, grid)
    val ckpt = tmp("sink-restart-ck")
    val in = tmp("sink-restart-in")
    val schema = rows(0 until 1).toDF("id", "x", "y").schema
    def run(): Unit = {
      val q = spark.readStream.schema(schema).parquet(s"$in/*")
        .writeStream
        .format("graft-layout")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start(dir)
      try q.awaitTermination() finally q.stop()
    }
    rows(0 until 10).toDF("id", "x", "y").coalesce(1)
      .write.mode("overwrite").parquet(s"$in/b1")
    run() // epoch 0 → ledger id 0
    rows(10 until 20).toDF("id", "x", "y").coalesce(1)
      .write.mode("overwrite").parquet(s"$in/b2")
    run() // restart: a NEW LayoutStreamSink serves ONLY the new file
    val byBatch = LayoutIngest.readSince(spark, dir, -1L)
      .groupBy(LayoutIngest.BatchCol).count()
      .as[(Long, Long)].collect().toMap
    assert(byBatch === Map(0L -> 10L, 1L -> 10L),
      s"restart must continue the ledger exactly-once: $byBatch")
    assert(LayoutIngest.read(spark, dir)
      .select("id").as[Long].collect().toSet ===
      (0 until 20).map(_.toLong).toSet)
  }

  test("a checkpoint dir DELETED and RECREATED at the same path is a " +
      "new query: its epoch 0 mints a fresh id (no stale-cached query " +
      "id resolving the old e0 reservation into a silent drop)") {
    implicit val sql = spark.sqlContext
    val dir = tmp("sink-ckreuse")
    LayoutIngest.bootstrap(spark, dir, grid)
    val ckpt = tmp("sink-ckreuse-ck")
    def run(ids: Range): Unit = {
      val input = MemoryStream[(Long, Long, Long)]
      input.addData(rows(ids))
      val q = input.toDF().toDF("id", "x", "y").writeStream
        .format("graft-layout")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start(dir)
      try q.awaitTermination() finally q.stop()
    }
    run(0 until 10) // old query: epoch 0 → ledger id 0, reservation kept
    // the user "starts fresh": same PATH, new checkpoint → new query id
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(ckpt))
    run(20 until 30) // epoch 0 AGAIN — must mint id 1, not replay id 0
    val byBatch = LayoutIngest.readSince(spark, dir, -1L)
      .groupBy(LayoutIngest.BatchCol).count()
      .as[(Long, Long)].collect().toMap
    assert(byBatch === Map(0L -> 10L, 1L -> 10L),
      s"recreated checkpoint's epoch 0 must not collide: $byBatch")
  }

  test("compactEvery cadence folds through the sink") {
    implicit val sql = spark.sqlContext
    val dir = tmp("sink-fold")
    LayoutIngest.bootstrap(spark, dir, grid)
    val input = MemoryStream[(Long, Long, Long)]
    val q = input.toDF().toDF("id", "x", "y").writeStream
      .format("graft-layout")
      .option("checkpointLocation", tmp("sink-fold-ck"))
      .option("compactEvery", "2")
      .start(dir)
    try {
      // two distinct epochs — the cadence fires after epoch 1 with two
      // small units to fold (AvailableNow would coalesce them into one)
      input.addData(rows(0 until 40)); q.processAllAvailable()
      input.addData(rows(40 until 80)); q.processAllAvailable()
    } finally q.stop()
    val units = Option(new java.io.File(s"$dir/data").list())
      .map(_.toSeq).getOrElse(Nil)
    assert(units.exists(_.startsWith("gen-")),
      s"expected a folded generation in $units")
    assert(LayoutIngest.read(spark, dir).count() === 80L)
  }

  test("typed refusals: output mode, partitionBy, missing checkpoint, " +
      "bad epochIds") {
    implicit val sql = spark.sqlContext
    val dir = tmp("sink-refuse")
    LayoutIngest.bootstrap(spark, dir, grid)
    val input = MemoryStream[(Long, Long, Long)]
    input.addData(rows(0 until 5))
    val base = input.toDF().toDF("id", "x", "y")

    val agg = base.groupBy("x").count()
    val e1 = intercept[Exception] {
      agg.writeStream.format("graft-layout")
        .outputMode(OutputMode.Complete())
        .option("checkpointLocation", tmp("sr-ck1"))
        .trigger(Trigger.AvailableNow()).start(dir)
    }
    assert(e1.getMessage.contains("only Append output mode"))

    val e2 = intercept[Exception] {
      base.writeStream.format("graft-layout")
        .partitionBy("x")
        .option("checkpointLocation", tmp("sr-ck2"))
        .trigger(Trigger.AvailableNow()).start(dir)
    }
    assert(e2.getMessage.contains("partitionBy is not supported"))

    val e3 = intercept[Exception] {
      base.writeStream.format("graft-layout")
        .trigger(Trigger.AvailableNow()).start(dir)
    }
    assert(e3.getMessage.contains("checkpointLocation"))

    val e4 = intercept[Exception] {
      base.writeStream.format("graft-layout")
        .option("checkpointLocation", tmp("sr-ck4"))
        .option("epochIds", "maybe")
        .trigger(Trigger.AvailableNow()).start(dir)
    }
    assert(e4.getMessage.contains("epochIds must be true or false"))

    // Int-valued options refuse values past Int.MaxValue with the
    // sink's typed message instead of silently truncating via .toInt
    // (4294967297 would have wrapped to filesPerBatch = 1)
    val e5 = intercept[Exception] {
      base.writeStream.format("graft-layout")
        .option("checkpointLocation", tmp("sr-ck5"))
        .option("filesPerBatch", "4294967297")
        .trigger(Trigger.AvailableNow()).start(dir)
    }
    assert(e5.getMessage.contains(
      s"filesPerBatch must be <= ${Int.MaxValue}"))
    val e6 = intercept[Exception] {
      base.writeStream.format("graft-layout")
        .option("checkpointLocation", tmp("sr-ck6"))
        .option("compactEvery", "4294967297")
        .trigger(Trigger.AvailableNow()).start(dir)
    }
    assert(e6.getMessage.contains(
      s"compactEvery must be <= ${Int.MaxValue}"))
  }
}
