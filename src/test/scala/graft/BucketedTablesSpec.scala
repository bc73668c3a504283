package graft

import graft.sources.BucketedTables
import org.apache.spark.sql.functions._

/** Bucketed store side elides its shuffle in the dedup-shaped join. */
class BucketedTablesSpec extends SparkSpec {
  import spark.implicits._

  private def storeDf = (1 to 10000).map { i =>
    ((i % 20 + 1).toString, (i * 13 % 100000).toLong, i.toLong)
  }.toDF("chromosome", "start_pos", "rgd_id")

  private def batchDf = (1 to 500).map { i =>
    ((i % 20 + 1).toString, (i * 13 % 100000).toLong, s"b$i")
  }.toDF("chromosome", "start_pos", "payload")

  test("join on bucket keys shuffles only the probe side") {
    // force a shuffle join so the exchange count is observable
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try doTest()
    finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  private def doTest(): Unit = {
    // the in-memory catalog forgets tables across JVMs but the warehouse
    // directory survives — clear both
    spark.sql("DROP TABLE IF EXISTS graft_bucketed_store")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      "graft_bucketed_store")
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(loc)
    }
    BucketedTables.writeBucketed(storeDf, "graft_bucketed_store", 8,
      Seq("chromosome", "start_pos"))
    val store = BucketedTables.read(spark, "graft_bucketed_store")

    val joined = batchDf.join(store, Seq("chromosome", "start_pos"))
    val plan = joined.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    // bucketed side pre-partitioned -> exactly one exchange (the batch)
    assert(exchanges == 1, s"expected 1 exchange, plan:\n$plan")

    // and results match the unbucketed join
    val plain = batchDf.join(storeDf, Seq("chromosome", "start_pos"))
    assert(joined.count() == plain.count())
    assert(joined.count() > 0)
  }
}
