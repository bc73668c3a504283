package graft

import graft.operators.{Retrieval, Similarity}
import graft.streaming.IndexIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming BM25/IVF index maintenance: cross-batch visibility (later
  * queries see earlier batches), served view ≡ from-scratch build over
  * the committed union, replay idempotence, orphan-partial invisibility
  * (the BM25 crash window), and compaction preserving the served view. */
class IndexIngestSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private val batch1 = Seq(
    (101L, "apple banana cherry date"),
    (102L, "apple apple banana fig"),
    (103L, "grape melon peach plum kiwi"))
  private val batch2 = Seq(
    (104L, "banana cherry cherry apple"),
    (105L, "melon fig date apple banana grape"))
  private val queries = Seq((1L, "apple banana"), (2L, "melon grape"))

  private def served(dir: String) = {
    Retrieval.bm25TopKWithIndex(
      IndexIngest.readBm25(spark, dir), queries.toDF("query_id", "query_text"),
      k = 3)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
      .as[(Long, Int, String, Double)].collect().toSet
  }

  private def batchPath(docs: Seq[(Long, String)]) =
    Retrieval.bm25TopK(docs.toDF("doc_id", "text"),
      queries.toDF("query_id", "query_text"), k = 3)
      .select(col("query_id"), col("rank"),
        col("doc_id").cast("string"), col("score"))
      .as[(Long, Int, String, Double)].collect().toSet

  test("bm25: cross-batch serving, ≡ rebuild, replay no-op, orphan, compaction") {
    implicit val sql = spark.sqlContext
    val dir = tmp("bm25-ingest")
    val ck = tmp("bm25-ingest-ck")
    val input = MemoryStream[(Long, String)]
    def run(): Unit = {
      val q = IndexIngest.startBm25(
        input.toDF().toDF("doc_id", "text"), dir, ck, availableNow = true)
      try q.processAllAvailable() finally q.stop()
    }

    input.addData(batch1)
    run()
    assert(served(dir) === batchPath(batch1), "batch-1 docs must serve")

    input.addData(batch2)
    run()
    val full = batchPath(batch1 ++ batch2)
    assert(served(dir) === full,
      "cross-batch queries must see batch-1 AND batch-2 docs")

    def tfRows: Long = spark.read.parquet(s"$dir/tf").count()
    val rowsBefore = tfRows

    // replay: same rows, fresh stream + checkpoint (post-crash re-read)
    val replay = MemoryStream[(Long, String)]
    replay.addData(batch1)
    val q2 = IndexIngest.startBm25(
      replay.toDF().toDF("doc_id", "text"), dir, tmp("bm25-ck2"),
      availableNow = true)
    try q2.processAllAvailable() finally q2.stop()
    assert(tfRows === rowsBefore, "replay of a committed batch must no-op")
    assert(served(dir) === full)

    // crash window: rows of a batch with no commit marker (a crashed
    // attempt) must be invisible to serving
    Seq(("apple", 99L, 999L)).toDF("__t", "__df", "__batch")
      .select(col("__t"), col("__df"), col("__batch"))
      .write.mode("append").parquet(s"$dir/df")
    Seq((999L, 1000L, 4000L)).toDF("__batch", "__n", "__dlsum")
      .write.mode("append").parquet(s"$dir/stats")
    assert(served(dir) === full, "uncommitted rows must not serve")

    // compaction folds partials + the tf tail; the served view is
    // unchanged (orphans dropped by the committed-batch filter)
    IndexIngest.compactBm25(spark, dir)
    assert(served(dir) === full, "compaction must preserve the served view")
    val dfFiles = Option(new java.io.File(s"$dir/df").listFiles())
      .fold(0)(_.count(_.getName.endsWith(".parquet")))
    assert(dfFiles === 1, s"df partials should fold to one file, got $dfFiles")
    // and ingest continues cleanly after compaction
    input.addData(Seq((106L, "kiwi plum apple")))
    run()
    val corpus3 = batch1 ++ batch2 :+ (106L, "kiwi plum apple")
    assert(served(dir) === batchPath(corpus3))

    // crashed-attempt replay (the documented on-disk protocol): an
    // intent marker without a commit plus a PARTIAL tf append for
    // batch 7 — the replay must purge the partial rows, re-append the
    // full batch, and serve exactly the rebuild
    val batch7 = Seq((107L, "kiwi grape grape banana"))
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(s"$dir/markers/7.intent"))
    Seq(("107", "kiwi", 1L, 4L, 7L))
      .toDF("__id", "__t", "__tf", "__dl", "__batch")
      .write.mode("append").parquet(s"$dir/tf")
    assert(served(dir) === batchPath(corpus3),
      "partial crashed append must not serve")
    assert(IndexIngest.ingestBm25Batch(
      batch7.toDF("doc_id", "text"), 7L, dir))
    assert(served(dir) === batchPath(corpus3 :+ batch7.head),
      "replay must purge the partial rows and fold the full batch")
    assert(spark.read.parquet(s"$dir/tf")
      .filter(col("__batch") === 7L && col("__t") === "kiwi")
      .count() === 1L, "the crashed partial row must not survive twice")
    // and a second replay of the now-committed batch is an O(1) no-op
    assert(!IndexIngest.ingestBm25Batch(
      batch7.toDF("doc_id", "text"), 7L, dir))
  }

  test("marker ledger folds into a batch-upto watermark: replays " +
      "still no-op, serving unchanged, gaps and deletions survive") {
    val dir = tmp("bm25-markers")
    def markerNames: Set[String] =
      new java.io.File(s"$dir/markers").listFiles()
        .map(_.getName)
        .filterNot(n => n == "lock" || n.startsWith(".")).toSet
    // ids 0,1,3 committed (2 in flight with another writer)
    assert(IndexIngest.ingestBm25Batch(
      batch1.toDF("doc_id", "text"), 0L, dir))
    assert(IndexIngest.ingestBm25Batch(
      batch2.toDF("doc_id", "text"), 1L, dir))
    val b3 = Seq((106L, "kiwi plum apple"))
    assert(IndexIngest.ingestBm25Batch(b3.toDF("doc_id", "text"), 3L, dir))
    // crash between commit and intent-drop leaves a stale intent — the
    // fold retires it with its committed marker
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(s"$dir/markers/1.intent"))
    IndexIngest.compactMarkers(spark, dir)
    assert(markerNames === Set("batch-upto-1", "3"),
      s"fold must stop at the gap, got $markerNames")
    val full3 = batchPath(batch1 ++ batch2 ++ b3)
    assert(served(dir) === full3,
      "folded batches must stay visible through the watermark")
    // replay of a FOLDED batch is still a no-op
    assert(!IndexIngest.ingestBm25Batch(
      batch1.toDF("doc_id", "text"), 0L, dir))
    assert(served(dir) === full3)
    // the gap commits -> the next fold absorbs everything
    val b2 = Seq((107L, "pear pear banana"))
    assert(IndexIngest.ingestBm25Batch(b2.toDF("doc_id", "text"), 2L, dir))
    IndexIngest.compactMarkers(spark, dir)
    assert(markerNames === Set("batch-upto-3"))
    assert(served(dir) === batchPath(batch1 ++ batch2 ++ b3 ++ b2))
    // a deletion AFTER the fold: the del marker is permanent, its
    // negative partials serve, and a replay of a folded batch still
    // no-ops (does not resurrect the doc)
    assert(IndexIngest.deleteBm25Docs(spark, dir, Seq("101"), 9L))
    IndexIngest.compactMarkers(spark, dir)
    assert(markerNames === Set("batch-upto-3", "del-9"))
    assert(served(dir) === batchPath(
      (batch1.filterNot(_._1 == 101L)) ++ batch2 ++ b3 ++ b2))
    assert(!IndexIngest.ingestBm25Batch(
      batch1.toDF("doc_id", "text"), 0L, dir))
  }

  test("bm25 crash matrix: every append-prefix crash state converges on replay") {
    // the ingest append sequence is [intent, df, stats, tf, commit];
    // construct the on-disk state after a crash at each prefix (the
    // documented protocol) and assert the replay converges to exactly
    // the committed union, with no duplicated rows
    val expect = batchPath(batch1 :+ (200L, "papaya lime lime"))
    val b2 = Seq((200L, "papaya lime lime"))
    for (crashAfter <- 0 to 4) {
      val dir = tmp(s"bm25-crash-$crashAfter")
      assert(IndexIngest.ingestBm25Batch(batch1.toDF("doc_id", "text"),
        0L, dir))
      // hand-build batch 1's appends exactly as ingest would
      val idx = graft.operators.Retrieval.buildIndex(
        b2.toDF("doc_id", "text"))
      val steps: Seq[() => Unit] = Seq(
        () => idx.df.select(col("__t"), col("__df").cast("long"),
            lit(1L).as("__batch"))
          .write.mode("append").parquet(s"$dir/df"),
        () => idx.stats.select(lit(1L).as("__batch"),
            col("__n").cast("long"), col("__dlsum").cast("long"))
          .write.mode("append").parquet(s"$dir/stats"),
        () => idx.tf.select(col("__id").cast("string"), col("__t"),
            col("__tf").cast("long"), col("__dl").cast("long"),
            lit(1L).as("__batch"))
          .write.mode("append").parquet(s"$dir/tf"),
        () => java.nio.file.Files.createFile(
          java.nio.file.Paths.get(s"$dir/markers/1")))
      java.nio.file.Files.createFile(
        java.nio.file.Paths.get(s"$dir/markers/1.intent"))
      steps.take(crashAfter).foreach(_.apply())
      graft.operators.Dedup.releasePersisted()

      val folded = IndexIngest.ingestBm25Batch(b2.toDF("doc_id", "text"),
        1L, dir)
      assert(folded === (crashAfter < 4),
        s"crash@$crashAfter: replay folds iff the commit never landed")
      assert(served(dir) === expect, s"crash@$crashAfter: served ≠ rebuild")
      assert(spark.read.parquet(s"$dir/tf")
        .filter(col("__batch") === 1L).count() === idx.tf.count(),
        s"crash@$crashAfter: tf rows duplicated or lost")
      assert(spark.read.parquet(s"$dir/df")
        .filter(col("__batch") === 1L).groupBy("__t").count()
        .filter(col("count") > 1).isEmpty,
        s"crash@$crashAfter: df partial duplicated")
      graft.operators.Dedup.releasePersisted()
    }
  }

  test("bm25 tombstones: a committed deletion survives the replay of a crashed batch") {
    val dir = tmp("bm25-tomb")
    assert(IndexIngest.ingestBm25Batch(batch1.toDF("doc_id", "text"),
      0L, dir))
    // batch 1 (docs 300, 301) crashed mid-append: intent marker plus a
    // partial tf append for doc 300 only, no commit
    val bX = Seq((300L, "quince apple quince"), (301L, "apple date"))
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(s"$dir/markers/1.intent"))
    Seq(("300", "quince", 2L, 3L, 1L))
      .toDF("__id", "__t", "__tf", "__dl", "__batch")
      .write.mode("append").parquet(s"$dir/tf")
    // takedown for doc 300 arrives and COMMITS while the batch is down
    assert(IndexIngest.deleteBm25Docs(spark, dir, Seq("300"), 0L))
    // the crashed batch replays: doc 301 must fold, doc 300 must stay
    // deleted (the tombstone's horizon covers the intent-seen batch) —
    // without tombstones the replay would resurrect it
    assert(IndexIngest.ingestBm25Batch(bX.toDF("doc_id", "text"), 1L, dir))
    assert(served(dir) === batchPath(batch1 :+ (301L, "apple date")),
      "replayed batch must not resurrect the deleted doc")
    assert(spark.read.parquet(s"$dir/tf")
      .filter(col("__id") === "300").count() === 0L)
    // deletion markers live in their own namespace: the delete above
    // used id 0, and ingest batch 0 still serves
    assert(spark.read.parquet(s"$dir/tf")
      .filter(col("__batch") === 0L).count() > 0L)
  }

  test("bm25 deletion: negative partials cancel exactly; replay no-op") {
    implicit val sql = spark.sqlContext
    val dir = tmp("bm25-delete")
    val ck = tmp("bm25-delete-ck")
    val input = MemoryStream[(Long, String)]
    def run(): Unit = {
      val q = IndexIngest.startBm25(
        input.toDF().toDF("doc_id", "text"), dir, ck, availableNow = true)
      try q.processAllAvailable() finally q.stop()
    }
    input.addData(batch1)
    run()
    input.addData(batch2)
    run()

    // delete one doc (plus a nonexistent id — must be harmless): the
    // served view must equal a rebuild that never saw the doc
    assert(IndexIngest.deleteBm25Docs(spark, dir,
      Seq("102", "9999"), deleteId = 50L))
    val without102 = batchPath((batch1 ++ batch2).filterNot(_._1 == 102L))
    assert(served(dir) === without102,
      "deletion must cancel tf, df, and stats contributions exactly")
    assert(spark.read.parquet(s"$dir/tf")
      .filter(col("__id") === "102").count() === 0L,
      "deleted doc's tf rows must be physically gone")

    // replay of the committed deletion is an O(1) no-op
    assert(!IndexIngest.deleteBm25Docs(spark, dir, Seq("102"), 50L))
    assert(served(dir) === without102)

    // compaction folds the negative partials away; view unchanged
    IndexIngest.compactBm25(spark, dir)
    assert(served(dir) === without102)

    // and ingest continues after a deletion
    input.addData(Seq((108L, "fig date cherry")))
    run()
    assert(served(dir) === batchPath(
      (batch1 ++ batch2).filterNot(_._1 == 102L) :+
        (108L, "fig date cherry")))
  }

  test("ivf deletion: filtered rewrite; served ≡ rebuild without the vec") {
    val dir = tmp("ivf-delete")
    val cents = Seq(0L -> Seq(1.0f, 0.0f, 0.0f), 1L -> Seq(0.0f, 1.0f, 0.0f))
    IndexIngest.bootstrapIvf(spark, dir, cents)
    assert(IndexIngest.ingestIvfBatch(
      (vecs1 ++ vecs2).toDF("vec_id", "embedding"), 0L, dir))
    assert(IndexIngest.deleteIvfVecs(spark, dir, Seq(202L), 60L))
    val rebuild = Similarity.ivfTopKWithIndex(
      Similarity.buildIvfIndex(
        (vecs1 ++ vecs2).filterNot(_._1 == 202L).toDF("vec_id", "embedding"),
        cents.size, centroids = cents),
      qvecs.toDF("query_id", "embedding"), k = 2, nprobe = 1)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(Similarity.ivfTopKWithIndex(
      IndexIngest.readIvf(spark, dir), qvecs.toDF("query_id", "embedding"),
      k = 2, nprobe = 1)
      .as[(Long, Int, Long, Double)].collect().toSet === rebuild)
    assert(!IndexIngest.deleteIvfVecs(spark, dir, Seq(202L), 60L))
  }

  private val vecs1 = Seq(
    (201L, Seq(1.0f, 0.0f, 0.0f)),
    (202L, Seq(0.9f, 0.1f, 0.0f)),
    (203L, Seq(0.0f, 1.0f, 0.0f)))
  private val vecs2 = Seq(
    (204L, Seq(0.0f, 0.9f, 0.2f)),
    (205L, Seq(0.8f, 0.0f, 0.3f)))
  private val qvecs = Seq((1L, Seq(1.0f, 0.05f, 0.0f)),
    (2L, Seq(0.0f, 1.0f, 0.1f)))

  test("ivf: frozen-centroid streaming ingest ≡ rebuild; replay no-op") {
    implicit val sql = spark.sqlContext
    val dir = tmp("ivf-ingest")
    val ck = tmp("ivf-ingest-ck")
    val cents = Seq(0L -> Seq(1.0f, 0.0f, 0.0f), 1L -> Seq(0.0f, 1.0f, 0.0f))
    IndexIngest.bootstrapIvf(spark, dir, cents)

    val input = MemoryStream[(Long, Seq[Float])]
    def run(): Unit = {
      val q = IndexIngest.startIvf(
        input.toDF().toDF("vec_id", "embedding"), dir, ck,
        availableNow = true)
      try q.processAllAvailable() finally q.stop()
    }
    def servedIvf = Similarity.ivfTopKWithIndex(
      IndexIngest.readIvf(spark, dir), qvecs.toDF("query_id", "embedding"),
      k = 2, nprobe = 1)
      .as[(Long, Int, Long, Double)].collect().toSet

    input.addData(vecs1)
    run()
    input.addData(vecs2)
    run()
    val rebuild = Similarity.ivfTopKWithIndex(
      Similarity.buildIvfIndex((vecs1 ++ vecs2).toDF("vec_id", "embedding"),
        cents.size, centroids = cents),
      qvecs.toDF("query_id", "embedding"), k = 2, nprobe = 1)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(servedIvf === rebuild)
    assert(servedIvf.nonEmpty)

    val rowsBefore = spark.read.parquet(s"$dir/assigned").count()
    val replay = MemoryStream[(Long, Seq[Float])]
    replay.addData(vecs1)
    val q2 = IndexIngest.startIvf(
      replay.toDF().toDF("vec_id", "embedding"), dir, tmp("ivf-ck2"),
      availableNow = true)
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(s"$dir/assigned").count() === rowsBefore,
      "replay of a committed batch must no-op")
    assert(servedIvf === rebuild)

    IndexIngest.compactIvf(spark, dir, smallFileBytes = 32L << 20)
    assert(servedIvf === rebuild, "compaction must preserve the served view")
  }

  test("kmeans: streamed mini-batch state ≡ sequential reference; crash + replay converge; compaction") {
    import graft.operators.Clustering
    implicit val sql = spark.sqlContext
    val seeds = Seq(Seq(127.0, 0.0, 0.0), Seq(0.0, 127.0, 0.0))
    val kb1 = Seq((401L, Seq(0.9f, 0.2f, 0.1f)),
      (402L, Seq(0.1f, 0.8f, 0.3f)), (403L, Seq(0.7f, 0.1f, 0.6f)))
    val kb2 = Seq((404L, Seq(0.2f, 0.9f, 0.1f)),
      (405L, Seq(0.8f, 0.1f, 0.1f)))

    // sequential online reference: fold each batch's integer partials
    // onto the state the batch was assigned against
    def fold(st: Seq[Seq[Double]],
        b: Seq[(Long, Seq[Float])]): Seq[Seq[Double]] = {
      val parts = Clustering
        .miniBatchPartials(b.toDF("vec_id", "embedding"), st)
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](2).toSeq).toMap
      st.zipWithIndex.map { case (s, cl) =>
        parts.get(cl)
          .map(p => s.zip(p).map { case (a, x) => a + x }).getOrElse(s)
      }
    }
    val want = fold(fold(seeds, kb1), kb2)

    val dir = tmp("km-ingest")
    IndexIngest.bootstrapKmeans(spark, dir, seeds)
    val input = MemoryStream[(Long, Seq[Float])]
    val ck = tmp("km-ck")
    def run(): Unit = {
      val q = IndexIngest.startKmeans(
        input.toDF().toDF("vec_id", "embedding"), dir, ck,
        availableNow = true)
      try q.processAllAvailable() finally q.stop()
    }
    input.addData(kb1); run()
    input.addData(kb2); run()
    assert(IndexIngest.readKmeansSums(spark, dir) === want)

    // replay of a committed batch is a no-op
    val rowsBefore = spark.read.parquet(s"$dir/partials").count()
    val replay = MemoryStream[(Long, Seq[Float])]
    replay.addData(kb1)
    val q2 = IndexIngest.startKmeans(
      replay.toDF().toDF("vec_id", "embedding"), dir, tmp("km-ck2"),
      availableNow = true)
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(s"$dir/partials").count() === rowsBefore)
    assert(IndexIngest.readKmeansSums(spark, dir) === want)

    // crash state: intent marker + orphan partial rows for batch 2,
    // never committed — served state must exclude them, and the replay
    // must purge + converge
    val orphan = Clustering
      .miniBatchPartials(kb2.toDF("vec_id", "embedding"), want)
      .withColumn("__batch", lit(2L)).withColumn("__h", lit(2L))
    orphan.write.mode("append").parquet(s"$dir/partials")
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(s"$dir/markers/2.intent"))
    assert(IndexIngest.readKmeansSums(spark, dir) === want,
      "orphan partials must be invisible to the served state")
    val kb3 = Seq((406L, Seq(0.1f, 0.1f, 0.9f)))
    assert(IndexIngest.ingestKmeansBatch(
      kb3.toDF("vec_id", "embedding"), 2L, dir))
    val want3 = fold(want, kb3)
    assert(IndexIngest.readKmeansSums(spark, dir) === want3)

    IndexIngest.compactKmeans(spark, dir, smallFileBytes = 32L << 20)
    assert(IndexIngest.readKmeansSums(spark, dir) === want3,
      "compaction must preserve the state")
  }

  test("kmeans deletion: streamed-minus-deleted ≡ rebuild-without-them; crash matrix; replay safety") {
    import graft.operators.Clustering
    // WELL-SEPARATED clusters so removing docs flips no surviving
    // assignment — the regime where cancellation ≡ rebuild exactly
    val seeds = Seq(Seq(127.0, 0.0, 0.0), Seq(0.0, 127.0, 0.0))
    val kb1 = Seq((501L, Seq(0.9f, 0.05f, 0.0f)),
      (502L, Seq(0.05f, 0.9f, 0.0f)), (503L, Seq(0.95f, 0.1f, 0.0f)))
    val kb2 = Seq((504L, Seq(0.1f, 0.95f, 0.0f)),
      (505L, Seq(0.85f, 0.05f, 0.0f)))
    def fold(st: Seq[Seq[Double]],
        b: Seq[(Long, Seq[Float])]): Seq[Seq[Double]] = {
      val parts = Clustering
        .miniBatchPartials(b.toDF("vec_id", "embedding"), st)
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](2).toSeq).toMap
      st.zipWithIndex.map { case (s, cl) =>
        parts.get(cl)
          .map(p => s.zip(p).map { case (a, x) => a + x }).getOrElse(s)
      }
    }
    val dir = tmp("km-del")
    IndexIngest.bootstrapKmeans(spark, dir, seeds)
    assert(IndexIngest.ingestKmeansBatch(kb1.toDF("vec_id", "embedding"),
      0L, dir))
    assert(IndexIngest.ingestKmeansBatch(kb2.toDF("vec_id", "embedding"),
      1L, dir))
    // forget 503 (batch 0) and 504 (batch 1)
    val forget = Seq((503L, kb1(2)._2, 0L), (504L, kb2(0)._2, 1L))
      .toDF("vec_id", "embedding", "__batch")
    assert(IndexIngest.deleteKmeansContribs(spark, dir, forget, 0L))
    // rebuild reference: same seeds, same batches WITHOUT the deleted
    // docs (no assignment flips by construction → must match exactly)
    val want = fold(fold(seeds, kb1.filterNot(_._1 == 503L)),
      kb2.filterNot(_._1 == 504L))
    assert(IndexIngest.readKmeansSums(spark, dir) === want)
    // committed replay: O(1) no-op
    assert(!IndexIngest.deleteKmeansContribs(spark, dir, forget, 0L))
    assert(IndexIngest.readKmeansSums(spark, dir) === want)

    // crash state: a SECOND deletion's intent + orphan negative partials
    // without a commit — invisible to the served state; replay converges
    val stamp1 = -1L - 2L // delStamp(1)
    val orphanNeg = Clustering
      .miniBatchPartials(Seq((505L, kb2(1)._2)).toDF("vec_id", "embedding"),
        IndexIngest.readKmeansSums(spark, dir))
      .select(col("__cl"), (-col("__n")).as("__n"),
        transform(col("__s"), x => -x).as("__s"))
      .withColumn("__batch", lit(stamp1)).withColumn("__h", lit(1L))
    orphanNeg.write.mode("append").parquet(s"$dir/partials")
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(s"$dir/markers/del-1.intent"))
    assert(IndexIngest.readKmeansSums(spark, dir) === want,
      "uncommitted deletion partials must be invisible")
    val forget2 = Seq((505L, kb2(1)._2, 1L))
      .toDF("vec_id", "embedding", "__batch")
    assert(IndexIngest.deleteKmeansContribs(spark, dir, forget2, 1L))
    val want2 = fold(fold(seeds, kb1.filterNot(_._1 == 503L)),
      kb2.filterNot(d => d._1 == 504L || d._1 == 505L))
    assert(IndexIngest.readKmeansSums(spark, dir) === want2)

    // replay safety, the LEGAL crash: batch 2 crashes intent-only (orphan
    // positives appended, commit marker NEVER written — the single-writer
    // contract forbids losing a commit), a deletion of a committed
    // batch-0 doc lands while it is in flight, then batch 2 replays. The
    // __h horizon must keep the replay assigning against the state it
    // first saw, and the served state must equal the rebuild without
    // every deleted doc.
    val kb3 = Seq((506L, Seq(0.92f, 0.02f, 0.0f)),
      (507L, Seq(0.02f, 0.92f, 0.0f)))
    val orphanPos = Clustering
      .miniBatchPartials(kb3.toDF("vec_id", "embedding"),
        IndexIngest.readKmeansSums(spark, dir))
      .withColumn("__batch", lit(2L)).withColumn("__h", lit(2L))
    orphanPos.write.mode("append").parquet(s"$dir/partials")
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(s"$dir/markers/2.intent"))
    assert(IndexIngest.readKmeansSums(spark, dir) === want2,
      "uncommitted ingest partials must be invisible")
    val forget3 = Seq((501L, kb1(0)._2, 0L))
      .toDF("vec_id", "embedding", "__batch")
    assert(IndexIngest.deleteKmeansContribs(spark, dir, forget3, 2L))
    val want3 = fold(fold(seeds,
      kb1.filterNot(d => d._1 == 503L || d._1 == 501L)),
      kb2.filterNot(d => d._1 == 504L || d._1 == 505L))
    assert(IndexIngest.readKmeansSums(spark, dir) === want3)
    assert(IndexIngest.ingestKmeansBatch(kb3.toDF("vec_id", "embedding"),
      2L, dir), "a crashed uncommitted batch must replay successfully")
    val want4 = fold(want3, kb3)
    assert(IndexIngest.readKmeansSums(spark, dir) === want4,
      "replay must purge its orphans and re-derive against its as-of state")

    // all-tombstoned replay: batch 3 crashes intent-only carrying a
    // duplicate row of committed doc 506; 506 is then forgotten (del-3's
    // horizon covers the in-flight batch 3), so the replay drops its
    // whole payload — a successful no-op committing the marker,
    // returning false, leaving the state unchanged
    val dup = Seq((506L, kb3(0)._2))
    Clustering.miniBatchPartials(dup.toDF("vec_id", "embedding"),
        IndexIngest.readKmeansSums(spark, dir))
      .withColumn("__batch", lit(3L)).withColumn("__h", lit(3L))
      .write.mode("append").parquet(s"$dir/partials")
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(s"$dir/markers/3.intent"))
    val forget4 = Seq((506L, kb3(0)._2, 2L))
      .toDF("vec_id", "embedding", "__batch")
    assert(IndexIngest.deleteKmeansContribs(spark, dir, forget4, 3L))
    val want5 = fold(want3, kb3.filterNot(_._1 == 506L))
    assert(IndexIngest.readKmeansSums(spark, dir) === want5)
    assert(!IndexIngest.ingestKmeansBatch(dup.toDF("vec_id", "embedding"),
      3L, dir), "an all-tombstoned replay ingests nothing")
    assert(IndexIngest.readKmeansSums(spark, dir) === want5,
      "all-tombstoned replay must purge its orphans and add nothing")
    assert(!IndexIngest.ingestKmeansBatch(dup.toDF("vec_id", "embedding"),
      3L, dir), "the no-op replay must have committed its marker")
    // double-delete of an already-forgotten id is a no-op
    assert(IndexIngest.deleteKmeansContribs(spark, dir, forget2, 4L))
    assert(IndexIngest.readKmeansSums(spark, dir) === want5,
      "double-delete must not double-subtract")
  }

  test("ledger lock: second writer fails fast; crash leaves a recoverable " +
      "lock; lease auto-break") {
    import java.nio.file.{Files, Paths}
    val dir = tmp("km-lock")
    val lockP = Paths.get(s"$dir/markers/lock")
    IndexIngest.bootstrapKmeans(spark, dir,
      Seq(Seq(127.0, 0.0), Seq(0.0, 127.0)))
    def vecs(rows: (Long, Seq[Float])*) = rows.toDF("vec_id", "embedding")
    // normal operations acquire and release — no lock residue
    assert(IndexIngest.ingestKmeansBatch(vecs(1L -> Seq(0.9f, 0.1f)), 0L, dir))
    IndexIngest.compactKmeans(spark, dir)
    assert(!Files.exists(lockP), "a completed operation must release")
    val before = IndexIngest.readKmeansSums(spark, dir)
    // another writer holds (or died holding) the lock → every mutator
    // fails fast naming the holder, and the state is untouched
    Files.write(lockP, "9999@otherhost:deadbeef".getBytes("UTF-8"))
    val e = intercept[IndexIngest.ConcurrentWriterException] {
      IndexIngest.ingestKmeansBatch(vecs(2L -> Seq(0.1f, 0.9f)), 1L, dir)
    }
    assert(e.getMessage.contains("9999@otherhost:deadbeef"))
    intercept[IndexIngest.ConcurrentWriterException] {
      IndexIngest.compactKmeans(spark, dir)
    }
    intercept[IndexIngest.ConcurrentWriterException] {
      IndexIngest.deleteKmeansContribs(spark, dir,
        Seq((1L, Seq(0.9f, 0.1f), 0L)).toDF("vec_id", "embedding", "__batch"),
        0L)
    }
    assert(IndexIngest.readKmeansSums(spark, dir) === before,
      "a locked-out writer must not have touched the state")
    // readers are never blocked by the lock
    assert(IndexIngest.readKmeansSums(spark, dir) === before)
    // explicit recovery: break the dead writer's lock, replay proceeds
    IndexIngest.breakLedgerLock(spark, dir)
    assert(IndexIngest.ingestKmeansBatch(vecs(2L -> Seq(0.1f, 0.9f)), 1L, dir))
    assert(!Files.exists(lockP))
    // lease mode: a lock older than LockStaleMsKey is auto-broken …
    Files.write(lockP, "stale-writer".getBytes("UTF-8"))
    Files.setLastModifiedTime(lockP, java.nio.file.attribute.FileTime
      .fromMillis(System.currentTimeMillis() - 60000))
    spark.conf.set(IndexIngest.LockStaleMsKey, "1000")
    try {
      assert(IndexIngest.ingestKmeansBatch(vecs(3L -> Seq(0.95f, 0.0f)),
        2L, dir))
      assert(!Files.exists(lockP))
      // … but a FRESH lock within the lease window still fails fast
      Files.write(lockP, "live-writer".getBytes("UTF-8"))
      spark.conf.set(IndexIngest.LockStaleMsKey, "3600000")
      intercept[IndexIngest.ConcurrentWriterException] {
        IndexIngest.ingestKmeansBatch(vecs(4L -> Seq(0.0f, 0.95f)), 3L, dir)
      }
    } finally {
      spark.conf.unset(IndexIngest.LockStaleMsKey)
      IndexIngest.breakLedgerLock(spark, dir)
    }
  }

  // 4-dim vectors, m=2 subspaces × 2 codes — tiny but non-trivial PQ
  private val pqCb: Seq[Seq[Seq[Float]]] = Seq(
    Seq(Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
    Seq(Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)))
  private val pvecs1 = Seq(
    (301L, Seq(0.9f, 0.1f, 0.2f, 0.8f)),
    (302L, Seq(0.1f, 0.9f, 0.7f, 0.1f)),
    (303L, Seq(0.8f, 0.0f, 0.9f, 0.2f)))
  private val pvecs2 = Seq(
    (304L, Seq(0.0f, 0.8f, 0.1f, 0.9f)),
    (305L, Seq(0.7f, 0.2f, 0.8f, 0.0f)))
  private val pq1 = Seq((1L, Seq(1.0f, 0.0f, 0.0f, 1.0f)),
    (2L, Seq(0.0f, 1.0f, 1.0f, 0.0f)))

  private def pqRebuild(vecs: Seq[(Long, Seq[Float])]) =
    Similarity.pqTopKWithIndex(
      Similarity.buildPqIndex(vecs.toDF("vec_id", "embedding"),
        m = 2, codebookSize = 2, codebook = pqCb),
      pq1.toDF("query_id", "embedding"), k = 3)
      .as[(Long, Int, Long, Double)].collect().toSet

  test("pq: frozen-codebook streaming ingest ≡ rebuild; crash matrix; " +
      "deletion; compaction") {
    implicit val sql = spark.sqlContext
    val dir = tmp("pq-ingest")
    val ck = tmp("pq-ingest-ck")
    IndexIngest.bootstrapPq(spark, dir, pqCb)

    def servedPq = Similarity.pqTopKWithIndex(
      IndexIngest.readPq(spark, dir), pq1.toDF("query_id", "embedding"),
      k = 3).as[(Long, Int, Long, Double)].collect().toSet

    val input = MemoryStream[(Long, Seq[Float])]
    def run(): Unit = {
      val q = IndexIngest.startPq(
        input.toDF().toDF("vec_id", "embedding"), dir, ck,
        availableNow = true)
      try q.processAllAvailable() finally q.stop()
    }
    input.addData(pvecs1)
    run()
    assert(servedPq === pqRebuild(pvecs1), "batch-1 codes must serve")
    input.addData(pvecs2)
    run()
    val full = pqRebuild(pvecs1 ++ pvecs2)
    assert(servedPq === full, "cross-batch ADC must see both batches")

    // replay of a committed batch: O(1) no-op, rows unchanged
    val rowsBefore = spark.read.parquet(s"$dir/codes").count()
    val replay = MemoryStream[(Long, Seq[Float])]
    replay.addData(pvecs1)
    val q2 = IndexIngest.startPq(
      replay.toDF().toDF("vec_id", "embedding"), dir, tmp("pq-ck2"),
      availableNow = true)
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(s"$dir/codes").count() === rowsBefore)
    assert(servedPq === full)

    // crash window: intent without commit + PARTIAL codes append for
    // batch 5 — invisible to serving; the replay purges the partial
    // rows and folds the whole batch exactly once
    val b5 = Seq((306L, Seq(0.5f, 0.5f, 0.5f, 0.5f)))
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(s"$dir/markers/5.intent"))
    Seq((306L, 0, 1, 5L)).toDF("__vid", "__j", "__code", "__batch")
      .write.mode("append").parquet(s"$dir/codes")
    assert(servedPq === full, "uncommitted partial codes must not serve")
    assert(IndexIngest.ingestPqBatch(b5.toDF("vec_id", "embedding"),
      5L, dir))
    assert(servedPq === pqRebuild(pvecs1 ++ pvecs2 ++ b5),
      "replay must purge the partial rows and fold the full batch")
    assert(spark.read.parquet(s"$dir/codes")
      .filter(col("__vid") === 306L).count() === 2L,
      "exactly m=2 code rows for the replayed vec — partial purged")
    assert(!IndexIngest.ingestPqBatch(b5.toDF("vec_id", "embedding"),
      5L, dir), "second replay of a committed batch must no-op")

    // deletion: served ≡ rebuild without the vec; replay no-op;
    // physical removal
    assert(IndexIngest.deletePqVecs(spark, dir, Seq(302L), 70L))
    val without302 = pqRebuild(
      (pvecs1 ++ pvecs2 ++ b5).filterNot(_._1 == 302L))
    assert(servedPq === without302)
    assert(spark.read.parquet(s"$dir/codes")
      .filter(col("__vid") === 302L).count() === 0L,
      "deleted vec's code rows must be physically gone")
    assert(!IndexIngest.deletePqVecs(spark, dir, Seq(302L), 70L))

    // tombstone horizon: a batch that crashed BEFORE the deletion
    // replays after it — the deleted vec must stay deleted
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(s"$dir/markers/6.intent"))
    assert(IndexIngest.deletePqVecs(spark, dir, Seq(305L), 71L))
    assert(IndexIngest.ingestPqBatch(
      Seq((305L, Seq(0.7f, 0.2f, 0.8f, 0.0f)),
        (307L, Seq(0.2f, 0.2f, 0.9f, 0.1f))).toDF("vec_id", "embedding"),
      6L, dir), "replayed batch folds its un-tombstoned rows")
    assert(spark.read.parquet(s"$dir/codes")
      .filter(col("__vid") === 305L).count() === 0L,
      "replay must not resurrect a tombstoned vec")
    assert(servedPq === pqRebuild(
      (pvecs1 ++ pvecs2 ++ b5).filterNot(v => v._1 == 302L || v._1 == 305L)
        :+ (307L, Seq(0.2f, 0.2f, 0.9f, 0.1f))))

    // compaction folds the codes tail; served view unchanged
    val after = servedPq
    IndexIngest.compactPq(spark, dir, smallFileBytes = 32L << 20)
    assert(servedPq === after, "compaction must preserve the served view")
  }
}
