package graft

import graft.streaming.DedupIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming incremental dedup: cross-batch suppression through the
  * persisted index, and replay safety (re-ingesting an already-admitted
  * batch admits nothing — the property that makes the ingest
  * crash-recoverable without high-water-mark bookkeeping). */
class DedupIngestSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("cross-batch dedup through the index; replay admits nothing") {
    implicit val sql = spark.sqlContext
    val dir = tmp("dedup-ingest")
    val ck = tmp("dedup-ingest-ck")
    val input = MemoryStream[(Long, String)]

    def runAvailable(): Unit = {
      val q = DedupIngest.start(
        input.toDF().toDF("doc_id", "text"), dir, ck,
        n = 8, minHits = 1, availableNow = true)
      try q.processAllAvailable() finally q.stop()
    }
    def corpusIds: Set[Long] =
      spark.read.parquet(s"$dir/corpus").select("doc_id")
        .as[Long].collect().toSet

    // batch 1: two docs, one intra-batch exact duplicate
    input.addData(Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j"),     // intra-batch dup of 1
      (3L, "k l m n o p q r s t")))
    runAvailable()
    assert(corpusIds == Set(1L, 3L))

    // batch 2: an exact dup of doc 1, an 8-gram near-dup of doc 3, a
    // novel doc — only the novel one lands
    input.addData(Seq(
      (11L, "a b c d e f g h i j"),
      (12L, "k l m n o p q r s t extra"),
      (13L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10")))
    runAvailable()
    assert(corpusIds == Set(1L, 3L, 13L))

    // replay: the SAME rows re-delivered on a fresh stream + checkpoint
    // (simulating a post-crash re-read) admit nothing — their
    // fingerprints are already in the index
    val replay = MemoryStream[(Long, String)]
    replay.addData(Seq(
      (1L, "a b c d e f g h i j"),
      (3L, "k l m n o p q r s t"),
      (13L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10")))
    val q2 = DedupIngest.start(
      replay.toDF().toDF("doc_id", "text"), dir, tmp("dedup-ingest-ck2"),
      n = 8, minHits = 1, availableNow = true)
    try q2.processAllAvailable() finally q2.stop()
    assert(corpusIds == Set(1L, 3L, 13L), "replay must be a no-op")
  }

  test("compaction folds small files, preserves contents, and dedups run on") {
    implicit val sql = spark.sqlContext
    val dir = tmp("dedup-compact")
    val ck = tmp("dedup-compact-ck")
    val input = MemoryStream[(Long, String)]
    def run(): Unit = {
      val q = DedupIngest.start(input.toDF().toDF("doc_id", "text"), dir, ck,
        n = 8, minHits = 1, availableNow = true, compactEvery = Some(1))
      try q.processAllAvailable() finally q.stop()
    }
    def parquetFiles(sub: String): Int =
      Option(new java.io.File(s"$dir/$sub").listFiles())
        .fold(0)(_.count(_.getName.endsWith(".parquet")))
    input.addData((1L to 40L).map(i =>
      (i, s"u$i v$i w$i x$i y$i z$i a$i b$i c$i d$i")))
    run()
    input.addData(Seq(
      (101L, "u7 v7 w7 x7 y7 z7 a7 b7 c7 d7"),   // dup of doc 7
      (102L, "n1 n2 n3 n4 n5 n6 n7 n8 n9 n10"))) // novel
    run()
    val ids = spark.read.parquet(s"$dir/corpus").select("doc_id")
      .as[Long].collect().toSet
    assert(ids == (1L to 40L).toSet + 102L)
    // every side folded to one compact write (shuffle.partitions files
    // for the corpus, 32 here; the raw appends would be ~2x that)
    assert(parquetFiles("fps") <= 32 && parquetFiles("grams") <= 32)
    // and the compacted index still gates the next batch
    input.addData(Seq((201L, "n1 n2 n3 n4 n5 n6 n7 n8 n9 n10")))
    run()
    assert(spark.read.parquet(s"$dir/corpus").select("doc_id")
      .as[Long].collect().toSet == ids, "compacted index missed a dup")
  }

  test("minhash band gate suppresses near-dups the gram gate cannot see") {
    implicit val sql = spark.sqlContext
    // 7-token docs: the word-8-gram gate can NEVER fire (no 8-grams
    // exist), and the edited doc is not an exact fingerprint match — so
    // only the MinHash band gate can catch it
    val original = "alpha bravo charlie delta echo foxtrot golf"
    val nearDup = "alpha bravo charlie delta echo foxtrot golfz"
    val novel = "zulu yankee xray whiskey victor uniform tango"

    def ingest(dir: String, ck: String, hashes: Int,
        rows: Seq[(Long, String)]): Unit = {
      val input = MemoryStream[(Long, String)]
      input.addData(rows)
      val q = DedupIngest.start(input.toDF().toDF("doc_id", "text"),
        dir, ck, n = 8, minHits = 1, availableNow = true,
        // compact every batch so the minhash index sides' distinct-swap
        // is exercised between the ingests (the gate must survive it)
        compactEvery = Some(1), minhashHashes = hashes)
      try q.processAllAvailable() finally q.stop()
    }
    def corpusIds(dir: String): Set[Long] =
      spark.read.parquet(s"$dir/corpus").select("doc_id")
        .as[Long].collect().toSet

    val withMh = tmp("ingest-mh")
    ingest(withMh, tmp("ingest-mh-ck1"), 128, Seq((1L, original)))
    ingest(withMh, tmp("ingest-mh-ck2"), 128,
      Seq((2L, nearDup), (3L, novel)))
    assert(corpusIds(withMh) == Set(1L, 3L),
      "band gate must suppress the near-dup and admit the novel doc")
    // the index carries the admitted docs' signatures and band keys
    assert(spark.read.parquet(s"$withMh/msigs").count() == 2)
    assert(spark.read.parquet(s"$withMh/mbands").count() == 2 * 16)

    // control: without the gate the near-dup walks straight in —
    // exact and gram gates genuinely cannot decide this class
    val noMh = tmp("ingest-nomh")
    ingest(noMh, tmp("ingest-nomh-ck1"), 0, Seq((1L, original)))
    ingest(noMh, tmp("ingest-nomh-ck2"), 0,
      Seq((2L, nearDup), (3L, novel)))
    assert(corpusIds(noMh) == Set(1L, 2L, 3L))
  }

  test("deleteCorpusDocs: forgotten at rest, never re-admitted, " +
      "band index no longer yields it") {
    implicit val sql = spark.sqlContext
    val original = "alpha bravo charlie delta echo foxtrot golf"
    val sibling = "november mike lima kilo juliett india hotel"
    val novel = "zulu yankee xray whiskey victor uniform tango"

    def ingest(dir: String, ck: String, rows: Seq[(Long, String)]): Unit = {
      val input = MemoryStream[(Long, String)]
      input.addData(rows)
      val q = DedupIngest.start(input.toDF().toDF("doc_id", "text"),
        dir, ck, n = 8, minHits = 1, availableNow = true,
        minhashHashes = 128)
      try q.processAllAvailable() finally q.stop()
    }
    def corpusIds(dir: String): Set[Long] =
      spark.read.parquet(s"$dir/corpus").select("doc_id")
        .as[Long].collect().toSet

    val dir = tmp("ingest-del")
    ingest(dir, tmp("ingest-del-ck1"), Seq((1L, original), (2L, sibling)))
    assert(corpusIds(dir) == Set(1L, 2L))

    // takedown of doc 1: gone from corpus + stage, sig/band rows gone
    assert(DedupIngest.deleteCorpusDocs(spark, dir, Seq("1"), 0L))
    assert(corpusIds(dir) == Set(2L))
    assert(spark.read.parquet(s"$dir/stage")
      .filter($"doc_id" === 1L).count() == 0)
    assert(spark.read.parquet(s"$dir/msigs")
      .filter($"__mid" === "1").count() == 0,
      "id-keyed signature rows must be physically gone")
    assert(spark.read.parquet(s"$dir/mbands")
      .filter($"__mid" === "1").count() == 0,
      "the band index must no longer yield the doc as a candidate")
    // replay of the committed deletion: O(1) no-op
    assert(!DedupIngest.deleteCorpusDocs(spark, dir, Seq("1"), 0L))

    // a crashed-then-replayed batch carrying the forgotten doc must NOT
    // re-admit it: its fingerprint is retained in fps as the tombstone
    ingest(dir, tmp("ingest-del-ck2"), Seq((1L, original), (3L, novel)))
    assert(corpusIds(dir) == Set(2L, 3L),
      "replay must not resurrect the forgotten doc")

    // crash mid-deletion (intent without commit): redo converges
    assert(DedupIngest.deleteCorpusDocs(spark, dir, Seq("3"), 1L))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$dir/markers/del-2"))
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(s"$dir/markers/del-2.intent"))
    assert(DedupIngest.deleteCorpusDocs(spark, dir, Seq("2"), 2L))
    assert(corpusIds(dir) == Set.empty[Long])
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/markers/del-2.intent")))
  }

  test("ledger lock guards the corpus too: ingest and delete fail fast, " +
      "break recovers") {
    import graft.streaming.LedgerLock
    implicit val sql = spark.sqlContext
    val dir = tmp("dedup-lock")
    def ingest(ck: String, rows: Seq[(Long, String)]): Unit = {
      val input = MemoryStream[(Long, String)]
      input.addData(rows)
      val q = DedupIngest.start(input.toDF().toDF("doc_id", "text"),
        dir, ck, n = 8, minHits = 1, availableNow = true)
      try q.processAllAvailable() finally q.stop()
    }
    ingest(tmp("dedup-lock-ck1"), Seq((1L, "a b c d e f g h i j")))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/markers/lock")),
      "a completed ingest batch must release the lock")
    // a dead writer's lock: the next micro-batch fails its foreachBatch
    // (surfacing as a StreamingQueryException) and the delete fails fast
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/markers/lock"),
      "9999@otherhost:cafe".getBytes("UTF-8"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      ingest(tmp("dedup-lock-ck2"), Seq((2L, "k l m n o p q r s t")))
    }
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(chain.contains("9999@otherhost:cafe"), chain)
    intercept[LedgerLock.ConcurrentWriterException] {
      DedupIngest.deleteCorpusDocs(spark, dir, Seq("1"), 0L)
    }
    LedgerLock.break(spark, dir)
    ingest(tmp("dedup-lock-ck3"), Seq((2L, "k l m n o p q r s t")))
    assert(spark.read.parquet(s"$dir/corpus").select("doc_id")
      .as[Long].collect().toSet == Set(1L, 2L))
  }

  test("corpus compaction is size-tiered: large generations never rewrite") {
    val corpus = tmp("fold-tier") + "/corpus"
    def append(ids: Range): Unit =
      ids.toDF("doc_id").coalesce(1).write.mode("append").parquet(corpus)
    def files: Map[String, (Long, Long)] =
      new java.io.File(corpus).listFiles()
        .filter(f => f.getName.endsWith(".parquet"))
        .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    def ids: Set[Int] =
      spark.read.parquet(corpus).as[Int].collect().toSet

    // one "large" generation (many rows) + a tail of small ones
    append(1 to 50000)
    val large = files.keySet
    assert(large.size == 1)
    val threshold = files(large.head)._1 // fold only files under this
    append(60001 to 60010)
    append(60011 to 60020)
    append(60021 to 60030)
    val before = files
    val all = ids

    DedupIngest.foldCorpusTail(spark, corpus, threshold)
    val after1 = files
    assert(ids == all, "fold must preserve corpus contents")
    // the large generation is byte-identical — never rewritten
    assert(after1(large.head) == before(large.head))
    // the small tail folded into one file
    val folded1 = after1.keySet -- large
    assert(folded1.size == 1 && folded1.head.startsWith("fold-"))
    // bytes rewritten ≈ the small tail, never the corpus: the folded
    // output can't exceed the tail it replaced by more than format
    // overhead, and is far under the large generation
    assert(after1(folded1.head)._1 < threshold)

    // second cycle: more tail; the large generation STILL untouched
    // (the prior fold output is itself small, so it re-enters the fold)
    append(70001 to 70010)
    val all2 = ids
    DedupIngest.foldCorpusTail(spark, corpus, threshold)
    val after2 = files
    assert(ids == all2)
    assert(after2(large.head) == before(large.head),
      "second cycle rewrote the large generation")
    assert((after2.keySet -- large).size == 1)
  }

  test("recoverFold replays a crashed fold to exactly-once contents") {
    import org.apache.hadoop.fs.Path
    val corpus = tmp("fold-crash") + "/corpus"
    def append(ids: Range): Unit =
      ids.toDF("doc_id").coalesce(1).write.mode("append").parquet(corpus)
    append(1 to 10)
    append(11 to 20)
    val all = spark.read.parquet(corpus).as[Int].collect().toSet
    val fsys = new Path(corpus)
      .getFileSystem(spark.sessionState.newHadoopConf())

    // simulate a fold that crashed right after the manifest write:
    // staged fold dir + manifest exist, nothing installed or deleted yet
    val smalls = new java.io.File(corpus).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSeq
    spark.read.parquet(corpus).coalesce(1).write.parquet(corpus + ".fold")
    val part = new java.io.File(corpus + ".fold").listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).head
    // first: a manifest MISSING its COMMIT trailer (crash mid-write)
    // must be discarded without touching the small files
    val partial = fsys.create(new Path(corpus + ".foldmanifest"), true)
    partial.write(s"F\t$part\tfold-crash-0.parquet".getBytes("UTF-8"))
    partial.close()
    DedupIngest.recoverFold(spark, corpus)
    assert(spark.read.parquet(corpus).as[Int].collect().toSet == all)
    assert(!new java.io.File(corpus + ".foldmanifest").exists())
    assert(!new java.io.File(corpus + ".fold").exists())

    // re-stage, now with the full committed manifest
    spark.read.parquet(corpus).coalesce(1).write
      .mode("overwrite").parquet(corpus + ".fold")
    val part2 = new java.io.File(corpus + ".fold").listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).head
    val man = fsys.create(new Path(corpus + ".foldmanifest"), true)
    val text = (s"F\t$part2\tfold-crash-0.parquet" +:
      smalls.map(s => s"S\t$s") :+ "COMMIT").mkString("\n")
    man.write(text.getBytes("UTF-8")); man.close()

    DedupIngest.recoverFold(spark, corpus)
    assert(spark.read.parquet(corpus).as[Int].collect().toSet == all,
      "recovery lost or duplicated rows")
    val names = new java.io.File(corpus).listFiles().map(_.getName)
      .filter(_.endsWith(".parquet")).toSet
    assert(names == Set("fold-crash-0.parquet"))
    assert(!new java.io.File(corpus + ".foldmanifest").exists())
    assert(!new java.io.File(corpus + ".fold").exists())
    // idempotent: a second recovery (crash during recovery) is a no-op
    DedupIngest.recoverFold(spark, corpus)
    assert(spark.read.parquet(corpus).as[Int].collect().toSet == all)
  }
}
