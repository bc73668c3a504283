package graft.tools

import graft.streaming.LayoutIngest
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off empirical probe for the round-19 write surface at scale:
  * the string-keyed takedown DELETE ([[LayoutIngest.deleteKeys]] — the
  * claim: cost ~ the bloom-HIT units, not the table), its replica
  * replay, the partial-column MERGE (the claim: the target read is
  * key-pushdown pruned, not a table scan), and the chunked
  * corpus-scale merge ([[LayoutIngest.mergeRowsChunkedNext]] — the
  * claim: N sub-merges cost ~N × one bounded merge, no superlinear
  * blowup). Builds a doc-keyed table from the events table of
  * `SPARK_GRAFT_SF_DIR` (default sf0.1; point at tmp/sf10ev for the
  * 10M-row 100x run). Prints one line per step. */
object TakedownProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-takedown-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.sql.GraftSqlExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](what: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[takedown-probe] $what%-46s $sec%8.2f s")
      r
    }
    val root = java.nio.file.Files
      .createTempDirectory("takedown-probe").toFile
    root.deleteOnExit()
    val src = s"${root.getAbsolutePath}/src"
    val dst = s"${root.getAbsolutePath}/dst"
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val withTs = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
    val ev = withTs.select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("ts_us"), col("value"),
      concat(lit("ev-"), col("event_id")).as("doc_key"))
    val b = ev.agg(min("user_id"), max("user_id"),
      min("ts_us"), max("ts_us"), min("event_id"), max("event_id"),
      count(lit(1))).head()
    val (tmn, tmx) = (b.getLong(2), b.getLong(3))
    val (emn, emx) = (b.getLong(4), b.getLong(5))
    println(s"[takedown-probe] rows=${b.getLong(6)} sf=$sfDir")
    LayoutIngest.bootstrap(spark, src, LayoutIngest.Grid(
      Seq("user_id", "ts_us"),
      Seq((b.getLong(0), b.getLong(1)), (tmn, tmx)), bits = 16,
      bloomCols = Seq("doc_key", "event_id")))
    // 8 time-sliced batches — a long-lived ingest's shape
    val cuts = (1 to 7).map(i => tmn + i * ((tmx - tmn) / 8))
    val bounds = (Long.MinValue +: cuts) :+ Long.MaxValue
    timed("ingest 8 batches") {
      bounds.sliding(2).zipWithIndex.foreach { case (Seq(lo, hi), i) =>
        LayoutIngest.ingestBatch(
          ev.filter(col("ts_us") >= lo && col("ts_us") < hi),
          i.toLong, src, filesPerBatch = 4): Unit
      }
    }
    val units = LayoutIngest.describe(spark, src).count()
    timed("replica bootstrap sync")(
      LayoutIngest.replicate(spark, src, dst))
    // 1. string-keyed takedown: 3 keys (a governance list is small
    // relative to the unit count — that ratio IS the pruning factor;
    // at 100 TB unit counts even a 1000-key list prunes massively)
    val keys = (1 to 3).map(k =>
      s"ev-${emn + (emx - emn) * k / 4}")
    timed(s"deleteKeys(3 string keys) over $units units") {
      LayoutIngest.deleteKeysNext(spark, src, "doc_key", keys): Unit
    }
    val rewritten = Option(new java.io.File(s"$src/data").list()).get
      .count(_.startsWith("gen-delk0-"))
    println(s"[takedown-probe]   units rewritten: $rewritten / $units " +
      "(bloom-pruned)")
    // 2. replica replay of the takedown
    val st = timed("replica sync replaying the takedown")(
      LayoutIngest.replicate(spark, src, dst))
    require(st.dmlReplayed == 1, s"probe premise: $st")
    // 3. partial MERGE: 16-key accumulator through SQL (the synthesis
    // join with key pushdown)
    spark.read.format("graft-layout").load(src)
      .createOrReplaceTempView("probe_t")
    ev.filter(col("event_id").isInCollection(
        (1 to 16).map(k => emn + (emx - emn) * k / 17)))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("value"), col("doc_key"))
      .createOrReplaceTempView("probe_src")
    timed("partial MERGE (16 keys, accumulator SET)") {
      spark.sql("""MERGE INTO probe_t USING probe_src
        |ON probe_t.event_id = probe_src.event_id
        |WHEN MATCHED THEN UPDATE
        |  SET value = probe_t.value + probe_src.value
        |WHEN NOT MATCHED THEN
        |  INSERT (event_id, user_id, ts_us, value, doc_key)
        |  VALUES (probe_src.event_id, probe_src.user_id,
        |    probe_src.ts_us, probe_src.value, probe_src.doc_key)
        |""".stripMargin)
    }
    // 4. chunked corpus-scale merge: key count ~3x the cap → ~4
    // disjoint sub-merges (the >MaxMergeKeys backfill shape, scaled:
    // the cap shrinks with the corpus so both SFs exercise the split)
    val nRows = b.getLong(6)
    val cap = math.max(1024, (nRows / 48).toInt)
    val bigKeys = ev.filter(pmod(col("event_id"), lit(16L)) === 0L)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        (col("value") * 2).as("value"), col("doc_key"))
    val nBig = bigKeys.count()
    val ids = timed(s"mergeRowsChunkedNext($nBig keys, cap $cap)") {
      LayoutIngest.mergeRowsChunkedNext(spark, src, "event_id",
        bigKeys, maxKeysPerMerge = cap)
    }
    println(s"[takedown-probe]   sub-merges: ${ids.size} (${ids.mkString(",")})")
    // 5. replica replays every sub-merge
    val st2 = timed("replica sync replaying partial + chunked merges")(
      LayoutIngest.replicate(spark, src, dst))
    println(s"[takedown-probe]   $st2")
    // 6. promotion is O(1)
    timed("promoteReplica")(LayoutIngest.promoteReplica(spark, dst))
    val eq = LayoutIngest.read(spark, dst).count() ==
      LayoutIngest.read(spark, src).count()
    println(s"[takedown-probe] replica row-count == source: $eq")
    spark.stop()
  }
}
