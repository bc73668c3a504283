package graft

import graft.streaming.{LayoutIngest, LayoutScanStats}
import org.apache.spark.sql.functions._

/** The clustered table's BATCH SQL surface
  * ([[graft.streaming.LayoutTableRelation]]): `spark.read.format
  * ("graft-layout")` must equal the API reads exactly, pushed-down
  * filters must prune UNITS (observable via LayoutScanStats — the
  * result hash alone cannot distinguish a pruned scan from a full
  * one), and the `sinceBatch`/`asOfBatch` options must replay the
  * provenance views. */
class LayoutRelationSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  /** 4 batches with DISJOINT x ranges (25 ids each) and a bloom on
    * `id` — the same decisive-sidecar shape the API pruning specs
    * use. */
  private def build(dir: String): Unit = {
    LayoutIngest.bootstrap(spark, dir, LayoutIngest.Grid(
      Seq("x", "y"), Seq((0L, 99L), (0L, 99L)), bits = 4,
      bloomCols = Seq("id")))
    (0 until 4).foreach { b =>
      assert(LayoutIngest.ingestBatch(
        (0 until 25).map { i =>
          val id = (b * 25 + i).toLong
          (id, id, (i * 13 % 100).toLong)
        }.toDF("id", "x", "y"),
        b.toLong, dir, 1))
    }
  }

  private def rel(dir: String) =
    spark.read.format("graft-layout").load(dir)

  test("full read ≡ LayoutIngest.read; __batch hidden; SQL view works") {
    val dir = tmp("layout-rel")
    build(dir)
    val api = LayoutIngest.read(spark, dir)
      .select("id", "x", "y").as[(Long, Long, Long)].collect().toSet
    val sql = rel(dir).select("id", "x", "y")
      .as[(Long, Long, Long)].collect().toSet
    assert(sql === api)
    assert(!rel(dir).columns.contains(LayoutIngest.BatchCol))
    rel(dir).createOrReplaceTempView("graft_rel_t")
    assert(spark.sql("SELECT count(*) FROM graft_rel_t").head().getLong(0)
      === 100L)
  }

  test("pushed-down range filter prunes units via the stats sidecars; " +
      "result stays exact (Spark reapplies the predicate)") {
    val dir = tmp("layout-rel-box")
    build(dir)
    val got = rel(dir).where(col("x") >= 30L && col("x") <= 40L)
      .select("id").as[Long].collect().toSet
    assert(got === (30L to 40L).toSet)
    assert(LayoutScanStats.lastUnitsRead < LayoutScanStats.lastUnitsLive,
      s"range pushdown must prune: read ${LayoutScanStats.lastUnitsRead}" +
        s"/${LayoutScanStats.lastUnitsLive}")
    // strict > on the boundary: conservative inclusive pruning, exact
    // result
    val strict = rel(dir).where(col("x") > 97L)
      .select("id").as[Long].collect().toSet
    assert(strict === Set(98L, 99L))
    // an OR shape prunes nothing but stays correct
    val or = rel(dir).where(col("x") < 2L || col("x") > 97L)
      .select("id").as[Long].collect().toSet
    assert(or === Set(0L, 1L, 98L, 99L))
    assert(LayoutScanStats.lastUnitsRead === LayoutScanStats.lastUnitsLive)
  }

  test("pushed-down equality/IN on a bloom column prunes units via " +
      "the bloom sidecars") {
    val dir = tmp("layout-rel-pt")
    build(dir)
    val one = rel(dir).where(col("id") === 30L)
      .select("y").as[Long].collect().toSeq
    assert(one === Seq((5 * 13 % 100).toLong))
    assert(LayoutScanStats.lastUnitsRead < LayoutScanStats.lastUnitsLive,
      s"point pushdown must prune: read ${LayoutScanStats.lastUnitsRead}" +
        s"/${LayoutScanStats.lastUnitsLive}")
    val in = rel(dir).where(col("id").isin(3L, 77L))
      .select("id").as[Long].collect().toSet
    assert(in === Set(3L, 77L))
    assert(LayoutScanStats.lastUnitsRead < LayoutScanStats.lastUnitsLive)
    // column pruning: a single-column projection still runs
    assert(rel(dir).select("y").count() === 100L)
  }

  test("df.write.format(\"graft-layout\") appends ONE clustered ingest " +
      "batch under the next unused id; Append-only; orphan dirs and " +
      "merge intents reserve their ids") {
    val dir = tmp("layout-rel-write")
    build(dir)
    (100 until 110).map(i => (i.toLong, (i % 100).toLong, 7L))
      .toDF("id", "x", "y")
      .write.format("graft-layout").mode("append").save(dir)
    assert(rel(dir).count() === 110L)
    assert(LayoutIngest.readSince(spark, dir, 3L)
      .select("id").as[Long].collect().toSet === (100L until 110L).toSet,
      "the write must land as batch 4 (next unused id)")
    // append-only: every other SaveMode is refused loudly
    val e = intercept[Exception] {
      spark.range(1).select(col("id"), col("id").as("x"),
        col("id").as("y"))
        .write.format("graft-layout").mode("overwrite").save(dir)
    }
    assert(e.getMessage.contains("Append"), e.getMessage)
    // a published-but-unmarked orphan dir reserves its id — writing
    // under it would ADOPT the orphan's data and drop this frame
    new java.io.File(s"$dir/data/batch-7").mkdirs()
    // ...and a standing merge intent reserves its id too
    new java.io.File(s"$dir/markers/merge-9.intent").createNewFile()
    Seq((200L, 50L, 50L)).toDF("id", "x", "y")
      .write.format("graft-layout").mode("append").save(dir)
    val got = LayoutIngest.readSince(spark, dir, 4L)
      .select("id", LayoutIngest.BatchCol).as[(Long, Long)]
      .collect().toMap
    assert(got === Map(200L -> 10L),
      s"the write must skip past orphan 7 and intent 9 to id 10: $got")
  }

  test("SQL INSERT INTO the relation view appends a clustered batch; " +
      "INSERT OVERWRITE and provenance-view inserts are refused") {
    val dir = tmp("layout-rel-insert")
    build(dir)
    rel(dir).createOrReplaceTempView("graft_ins_t")
    // the zkey position is a COMPUTED column: the supplied 0 is
    // discarded and the key recomputed from the grid
    spark.sql("INSERT INTO graft_ins_t " +
      "SELECT id + 300, id % 100, 9L, 0L FROM range(5)")
    assert(rel(dir).count() === 105L)
    val inserted = LayoutIngest.readSince(spark, dir, 3L)
      .select("id", "x", "y", "zkey")
      .as[(Long, Long, Long, Long)].collect()
    assert(inserted.map(_._1).toSet === (300L until 305L).toSet,
      "the insert must land as the next ledger batch")
    val expected = graft.operators.Layout.withZOrderKeyFixed(
      inserted.toSeq.toDF("id", "x", "y", "ignored").drop("ignored"),
      Seq(col("x"), col("y")), Seq((0L, 99L), (0L, 99L)), 4, "k")
      .select("id", "k").as[(Long, Long)].collect().toMap
    assert(inserted.forall { case (id, _, _, z) => expected(id) == z },
      "inserted keys must be recomputed from the grid, not taken " +
        "from the statement")
    val e = intercept[Exception] {
      spark.sql("INSERT OVERWRITE TABLE graft_ins_t " +
        "SELECT id, id % 100, 9L, 0L FROM range(1)")
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("regrid")), chain(e).toString)
    spark.read.format("graft-layout").option("asOfBatch", "1").load(dir)
      .createOrReplaceTempView("graft_ins_asof")
    val e2 = intercept[Exception] {
      spark.sql("INSERT INTO graft_ins_asof " +
        "SELECT id, id % 100, 9L, 0L FROM range(1)")
    }
    assert(chain(e2).exists(m => m.contains("provenance") ||
      m.contains("sinceBatch/asOfBatch")), chain(e2).toString)
  }

  test("CREATE TABLE ... USING graft-layout: a PERSISTED catalog " +
      "table round-trips read / pruned scan / INSERT / DELETE / MERGE " +
      "identically to the temp-view path; DROP TABLE keeps the data") {
    val dir = tmp("layout-rel-catalog")
    build(dir)
    spark.sql("DROP TABLE IF EXISTS graft_cat")
    spark.sql(
      s"CREATE TABLE graft_cat USING `graft-layout` OPTIONS (path '$dir')")
    try {
      // read ≡ API; the computed key column is part of the catalog
      // schema like the temp-view schema
      assert(spark.table("graft_cat").count() === 100L)
      assert(spark.table("graft_cat").columns.contains("zkey"))
      val sql = spark.sql(
        "SELECT id, x, y FROM graft_cat WHERE x >= 30 AND x <= 40")
        .as[(Long, Long, Long)].collect().toSet
      assert(sql.map(_._1) === (30L to 40L).toSet)
      // pushdown pruning survives catalog resolution (the V1 relation
      // is the same object the temp view wraps)
      assert(LayoutScanStats.lastUnitsRead < LayoutScanStats.lastUnitsLive,
        s"catalog-table pushdown must prune: read " +
          s"${LayoutScanStats.lastUnitsRead}/${LayoutScanStats.lastUnitsLive}")
      // INSERT INTO appends under the next ledger id; zkey recomputed
      spark.sql("INSERT INTO graft_cat " +
        "SELECT id + 500, id % 100, 9L, 0L FROM range(3)")
      assert(LayoutIngest.readSince(spark, dir, 3L)
        .select("id").as[Long].collect().toSet ===
        (500L until 503L).toSet,
        "the catalog INSERT must land as the next ledger batch")
      // DELETE routes through the same GraftDmlRule interception
      spark.sql("DELETE FROM graft_cat WHERE id BETWEEN 500 AND 501")
      assert(spark.table("graft_cat").count() === 101L)
      // MERGE through the catalog name (whole-row upsert)
      spark.sql("SELECT 502L AS id, 77L AS x, 77L AS y")
        .createOrReplaceTempView("graft_cat_src")
      spark.sql("""MERGE INTO graft_cat USING graft_cat_src
        ON graft_cat.id = graft_cat_src.id
        WHEN MATCHED THEN UPDATE SET x = graft_cat_src.x,
          y = graft_cat_src.y
        WHEN NOT MATCHED THEN INSERT (id, x, y)
          VALUES (graft_cat_src.id, graft_cat_src.x, graft_cat_src.y)""")
      val merged = spark.sql(
        "SELECT x, y FROM graft_cat WHERE id = 502")
        .as[(Long, Long)].collect().toSeq
      assert(merged === Seq((77L, 77L)))
      assert(spark.table("graft_cat").count() === 101L,
        "the merge must replace, not add")
      // UPDATE (in-place redaction) through the catalog name too;
      // the updated column carries a BLOOM sidecar, so the point
      // lookup on the NEW value only works if the rewrite regenerated
      // the unit's bloom (a stale bloom would false-negative the row
      // out of the pushed-down point scan)
      spark.sql("UPDATE graft_cat SET id = 777777 WHERE id = 502")
      assert(spark.sql(
        "SELECT count(*) FROM graft_cat WHERE id = 777777")
        .head().getLong(0) === 1L)
      assert(spark.table("graft_cat").count() === 101L,
        "the update must rewrite in place, not add or drop")
    } finally spark.sql("DROP TABLE IF EXISTS graft_cat")
    // an OPTIONS-path table is EXTERNAL: dropping the catalog entry
    // must not touch the table directory
    assert(LayoutIngest.read(spark, dir).count() === 101L,
      "DROP TABLE on the external catalog entry must keep the data")
  }

  test("sinceBatch = CDC view (keeps __batch); asOfBatch = time " +
      "travel; the two options are mutually exclusive") {
    val dir = tmp("layout-rel-prov")
    build(dir)
    val since = spark.read.format("graft-layout")
      .option("sinceBatch", "2").load(dir)
    assert(since.columns.contains(LayoutIngest.BatchCol))
    assert(since.select("id").as[Long].collect().toSet
      === (75L until 100L).toSet)
    assert(LayoutScanStats.lastUnitsRead < LayoutScanStats.lastUnitsLive,
      "the provenance span must prune old units")
    val asOf = spark.read.format("graft-layout")
      .option("asOfBatch", "0").load(dir)
    assert(!asOf.columns.contains(LayoutIngest.BatchCol))
    assert(asOf.select("id").as[Long].collect().toSet
      === (0L until 25L).toSet)
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft-layout")
        .option("sinceBatch", "1").option("asOfBatch", "2").load(dir)
    }
    assert(e.getMessage.contains("mutually exclusive"), e.getMessage)
  }
}
