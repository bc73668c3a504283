package graft

import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Near-dup operator family on constructed duplicates. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog and runs far away home"
  private val docs = Seq(
    (1L, base),
    (2L, base + " tonight"),                          // near-dup of 1
    (3L, base.replace("quick", "rapid")),             // near-dup of 1
    (4L, "completely different content about spark catalyst expressions"),
    (5L, "another unrelated string mentioning window functions only"))
    .toDF("doc_id", "text")

  test("exactDedup flags identical fingerprints, keeps smallest id") {
    val dup = docs.unionByName(Seq((6L, base)).toDF("doc_id", "text"))
    val flagged = Dedup.exactDedup(dup,
      TextAnalysis.fingerprint(col("text")), col("doc_id"))
    val dups = flagged.filter(col("is_duplicate")).select("doc_id")
      .as[Long].collect().toSeq
    assert(dups == Seq(6L)) // doc 1 kept, byte-identical doc 6 flagged
  }

  test("minhash near-dup finds the constructed pairs") {
    val pairs = Dedup.minhashNearDupPairsText(docs, "doc_id", col("text"),
      n = 5, numHashes = 128, bands = 32, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.exists { case (a, b) => Set(a, b).contains(4L) })
  }

  test("simhash near-dup on token sets") {
    val long1 = Array.fill(10)(base).mkString(" ")
    val longDocs = Seq(
      (1L, long1),
      (2L, long1),                 // byte-identical → hamming 0
      (3L, long1 + " tonight"),    // near-dup → small hamming
      (4L, Array.fill(10)("completely different content about spark catalyst")
        .mkString(" ")))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDupPairs(longDocs, "doc_id",
      TextAnalysis.tokens(lower(col("text"))), maxHamming = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0L))
    assert(!pairs.exists(p => Set(p._1, p._2).contains(4L)))
    // near-dup hamming is far below unrelated-doc hamming
    val sh = Dedup.simhashes(longDocs, "doc_id",
      TextAnalysis.tokens(lower(col("text"))))
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(sh(a) ^ sh(b))
    assert(ham(1L, 3L) < ham(1L, 4L))
    // one extra token among 140 flips only the bits whose vote sum sat at
    // zero — well under a quarter of the 64 bits (observed ~9; unrelated
    // docs sit near 32)
    assert(ham(1L, 3L) <= 16)
  }

  test("ngram jaccard exact pairs agree with definition") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id",
      TextAnalysis.wordShingles(col("text"), 2), threshold = 0.4)
      .as[(Long, Long, Double)].collect()
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(m.contains((1L, 2L)))
    // (1,2): base has 14 tokens → 13 distinct bigrams; doc 2 adds
    // "home tonight" → union 14, intersect 13
    assert(math.abs(m((1L, 2L)) - 13.0 / 14.0) < 1e-3)
  }

  test("ngram jaccard: codegen text path equals generic shingle path") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "jaccard").as[(Long, Long, Double)]
        .collect().toSet
    val generic = pairs(Dedup.ngramJaccardPairs(docs, "doc_id",
      TextAnalysis.wordShingles(col("text"), 2), threshold = 0.4))
    val text = pairs(Dedup.ngramJaccardPairsText(docs, "doc_id",
      col("text"), n = 2, threshold = 0.4))
    assert(generic.nonEmpty)
    assert(text == generic)
  }

  test("winnowing: near-dups share fingerprints, unrelated docs don't") {
    val fps = TextAnalysis.winnowingFingerprints(docs, "doc_id", col("text"))
    val byDoc = fps.collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty)
    assert((byDoc(1L) intersect byDoc(4L)).isEmpty)
  }

  test("embedding near-dup: LSH finds what brute force finds (high sim)") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.1f)),
      (2L, Array(0.99f, 0.01f, 0.0f, 0.1f)),  // ≈ vec 1
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val exact = Dedup.embeddingNearDupPairsExact(vecs, "vec_id",
      col("embedding"), threshold = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact == Set((1L, 2L)))
    val approx = Dedup.embeddingNearDupPairs(vecs, "vec_id",
      col("embedding"), dim = 4, threshold = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(approx == Set((1L, 2L)))
  }

  test("q41 derived corpus: LSH pair set equals blocked exact (recall 1.0)") {
    // the q41 construction at the smallest test scale: planted near-dups
    // (first 8 dims zeroed) with a measured margin; the LSH defaults must
    // reproduce the exact thresholded pair set EXACTLY
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val derived = emb.select(
      (col("vec_id") + lit(1000000L)).as("vec_id"),
      concat(array((0 until 8).map(_ => lit(0.0f)): _*),
        expr("slice(embedding, 9, 56)")).as("embedding"))
    val corpus = emb.select("vec_id", "embedding").unionByName(derived)
    val exact = Dedup.embeddingNearDupPairsExact(corpus, "vec_id",
      col("embedding"), threshold = 0.70)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val approx = Dedup.embeddingNearDupPairs(corpus, "vec_id",
      col("embedding"), dim = 64, threshold = 0.70)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert(approx == exact)
  }

  // ------------------------------------------------------------------
  // Star edges + hot-bucket guards
  // ------------------------------------------------------------------

  /** A planted template family (near-identical boilerplate, the skewed
    * web-crawl shape that makes all-pairs band joins quadratic) + a few
    * unrelated docs. */
  private def templateCorpus(familySize: Int) = {
    val tmpl = "breaking news article boilerplate header navigation " +
      "footer copyright two thousand twenty six all rights reserved " +
      "subscribe newsletter follow us on social media contact form"
    (Seq.tabulate(familySize)(i => (i.toLong, s"$tmpl item number $i")) ++
      Seq((900L, "completely different content about spark catalyst rules"),
        (901L, "another unrelated string mentioning window functions")))
      .toDF("doc_id", "text")
  }

  test("star-edge CC equals all-pairs CC on a planted template family") {
    val corpus = templateCorpus(60)
    val sigs = Dedup.minhashSignaturesFromText(corpus, "doc_id",
      col("text"), n = 5, numHashes = 64)
    val nodes = corpus.select("doc_id")
    val viaPairs = Dedup.connectedComponents(
      Dedup.nearDupPairsFromSignatures(sigs, "doc_id", numHashes = 64,
        bands = 16, threshold = 0.7, maxBucketSize = 0), nodes)
      .as[(Long, Long)].collect().toMap
    val viaStar = Dedup.connectedComponents(
      Dedup.nearDupStarEdgesFromSignatures(sigs, "doc_id", numHashes = 64,
        bands = 16, threshold = 0.7), nodes)
      .as[(Long, Long)].collect().toMap
    Dedup.releasePersisted()
    assert(viaStar == viaPairs)
    // the family really is one component anchored at its min id
    assert(viaStar(59L) == 0L)
    assert(viaStar(900L) == 900L && viaStar(901L) == 901L)
  }

  test("star edges are linear in bucket size where all-pairs is quadratic") {
    val corpus = templateCorpus(80)
    val sigs = Dedup.minhashSignaturesFromText(corpus, "doc_id",
      col("text"), n = 5, numHashes = 64)
    val star = Dedup.nearDupStarEdgesFromSignatures(sigs, "doc_id",
      numHashes = 64, bands = 16, threshold = 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    val pairs = Dedup.nearDupPairsFromSignatures(sigs, "doc_id",
      numHashes = 64, bands = 16, threshold = 0.7, maxBucketSize = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    Dedup.releasePersisted()
    // 80-deep family: ~c−1 star edges per distinct anchor (a few buckets
    // anchor at a different min when the suffix perturbs a band) vs
    // c(c−1)/2 all-pairs — linear vs quadratic in the family depth
    assert(star.length < 2 * 80)
    assert(pairs.length == 80 * 79 / 2)
    assert(star.forall(e => e._1 <= 1L)) // anchors are bucket minima
  }

  test("bucket cap drops only overflowed buckets; no-skew plan unchanged") {
    val corpus = templateCorpus(40)
    val sigs = Dedup.minhashSignaturesFromText(corpus, "doc_id",
      col("text"), n = 5, numHashes = 64)
    val uncapped = Dedup.nearDupPairsFromSignatures(sigs, "doc_id",
      numHashes = 64, bands = 16, threshold = 0.7, maxBucketSize = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // cap far above any bucket: bit-identical result
    val bigCap = Dedup.nearDupPairsFromSignatures(sigs, "doc_id",
      numHashes = 64, bands = 16, threshold = 0.7, maxBucketSize = 10000)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(bigCap == uncapped)
    // cap below the family's bucket size: the family's pairs are excluded
    // (they only ever meet in overflowed buckets), unrelated docs unaffected
    val smallCap = Dedup.nearDupPairsFromSignatures(sigs, "doc_id",
      numHashes = 64, bands = 16, threshold = 0.7, maxBucketSize = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    Dedup.releasePersisted()
    assert(smallCap.isEmpty)
    assert(uncapped.size == 40 * 39 / 2)
  }

  test("minhashSuppressedIds: probe cap still suppresses against a " +
      "template family (anchored members verify)") {
    val corpus = templateCorpus(30)
    val mh = Dedup.minhashBandIndex(corpus, "doc_id", col("text"),
      numHashes = 64, numBands = 16, threshold = 0.7)
    val incoming = Seq(
      (5000L, "breaking news article boilerplate header navigation " +
        "footer copyright two thousand twenty six all rights reserved " +
        "subscribe newsletter follow us on social media contact form " +
        "item number fresh"),
      (5001L, "genuinely novel text with no overlap whatsoever at all"))
      .toDF("doc_id", "text")
    val full = Dedup.minhashSuppressedIds(incoming, mh, "doc_id",
      col("text")).as[Long].collect().toSet
    val capped = Dedup.minhashSuppressedIds(incoming, mh, "doc_id",
      col("text"), maxProbePerBucket = 1).as[Long].collect().toSet
    Dedup.releasePersisted()
    assert(full == Set(5000L))
    assert(capped == Set(5000L)) // one anchor per bucket is enough
  }

  test("connectedComponents collapses transitive chains; singletons kept") {
    // chain 1-2, 2-3 (A~C never enumerated) + island pair 10-11 + the
    // isolated nodes 20, 21
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L).toDF("doc_id")
    val cc = Dedup.connectedComponents(pairs, nodes)
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 21L))
    val canon = Dedup.canonicalByComponent(
      Dedup.connectedComponents(pairs, nodes))
      .filter(col("is_canonical") === 1)
      .select("doc_id").as[Long].collect().toSet
    assert(canon == Set(1L, 10L, 20L, 21L))
    Dedup.releasePersisted()
  }

  test("connectedComponents converges on a long chain (diameter > 2)") {
    val pairs = (1L until 8L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val nodes = (1L to 8L).toDF("doc_id")
    val cc = Dedup.connectedComponents(pairs, nodes)
      .as[(Long, Long)].collect().toMap
    assert(cc.values.toSet == Set(1L))
    Dedup.releasePersisted()
  }

  test("connectedComponents: distributed loop equals driver union-find") {
    // chains, a clique, cross links, singletons — edges in arbitrary order
    val pairs = Seq((5L, 2L), (2L, 9L), (9L, 5L), (3L, 4L), (4L, 12L),
      (20L, 21L), (7L, 100L)).toDF("id_a", "id_b")
    val nodes = (1L to 110L).toDF("doc_id")
    val viaDriver = Dedup.connectedComponents(pairs, nodes)
      .as[(Long, Long)].collect().toMap
    val viaLoop = Dedup.connectedComponents(pairs, nodes,
      maxDriverEdges = 0) // force the distributed fixpoint path
      .as[(Long, Long)].collect().toMap
    assert(viaDriver == viaLoop)
    assert(viaDriver(9L) == 2L && viaDriver(12L) == 3L &&
      viaDriver(100L) == 7L && viaDriver(50L) == 50L)
    Dedup.releasePersisted()
  }

  test("canonicalByScore keeps the best-scoring cluster member") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val nodes = Seq(1L, 2L, 3L, 9L).toDF("doc_id")
    val scores = Seq((1L, 5.0), (2L, 9.0), (3L, 9.0), (9L, 1.0))
      .toDF("doc_id", "score")
    val cc = Dedup.connectedComponents(pairs, nodes).join(scores, "doc_id")
    val canon = Dedup.canonicalByScore(cc, col("score"))
      .filter(col("is_canonical") === 1)
      .select("doc_id").as[Long].collect().toSet
    // cluster {1,2,3}: top score 9.0 tie between 2 and 3 → lowest id 2
    assert(canon == Set(2L, 9L))
    Dedup.releasePersisted()
  }

  test("contaminationFlags finds excerpted benchmark n-grams") {
    val train = Seq(
      (1L, (1 to 30).map("w" + _).mkString(" ")),
      (2L, (101 to 130).map("w" + _).mkString(" ")),
      (3L, "totally unrelated words " + (201 to 226).mkString(" ")))
      .toDF("doc_id", "text")
    // benchmark excerpt = tokens 5..16 of doc 1
    val bench = Seq((900L, (5 to 16).map("w" + _).mkString(" ")))
      .toDF("doc_id", "text")
    val flagged = Dedup.contaminationFlags(train, bench, "doc_id",
      col("text"), n = 8)
      .as[(Long, Long)].collect().toMap
    // 12-token excerpt → 5 distinct 8-grams, all present in doc 1 only
    assert(flagged == Map(1L -> 5L))
  }

  test("capPerKey keeps top-n per key with deterministic ties") {
    val df = Seq(
      ("a", 10, 1L), ("a", 10, 2L), ("a", 9, 3L), ("a", 8, 4L),
      ("b", 5, 5L)).toDF("src", "score", "id")
    val kept = Dedup.capPerKey(df, col("src"), col("score"), col("id"), 2)
      .select("id").as[Long].collect().toSet
    // a: scores (10,id=1), (10,id=2) win — tie broken by lowest id first
    assert(kept == Set(1L, 2L, 5L))
  }

  test("releasePersisted drops every intermediate the operators cached") {
    Dedup.releasePersisted() // clean slate (earlier tests in this suite)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // one query from each caching entry point family
    Dedup.minhashNearDupPairsText(docs, "doc_id", col("text"),
      n = 5, numHashes = 32, bands = 8, threshold = 0.5).count()
    Dedup.ngramJaccardPairsText(docs, "doc_id", col("text"),
      n = 3, threshold = 0.5).count()
    assert(spark.sparkContext.getPersistentRDDs.keySet.size > before.size,
      "queries should have cached intermediates")
    Dedup.releasePersisted()
    assert(spark.sparkContext.getPersistentRDDs.keySet == before,
      "no dedup-cached storage may linger after release")
  }

  test("dedupAgainstCorpus: exact gate, n-gram gate, short-doc pass") {
    val existing = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "k l m n o p q r s t"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (101L, "  A b   c d e F g h i j "), // exact after normalization
      (102L, "l m n o p q r s t"),        // 9-token excerpt of doc 2
      (103L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10"), // novel
      (104L, "q r s"))                    // short: no grams, no fp match
      .toDF("doc_id", "text")
    val got = Dedup.dedupAgainstCorpus(incoming, existing, "doc_id",
      col("text"), n = 8, minHits = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(103L, 104L))
    // minHits above the excerpt's gram count lets it through
    val loose = Dedup.dedupAgainstCorpus(incoming, existing, "doc_id",
      col("text"), n = 8, minHits = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(loose == Set(102L, 103L, 104L), "9-token excerpt has 2 grams")

    // the prepared-index form (the incremental surface: index built
    // once, probed per batch) is result-identical to the one-shot form
    val idx = Dedup.corpusIndex(existing, "doc_id", col("text"), n = 8)
    val viaIndex = Dedup.dedupAgainstIndex(incoming, idx, "doc_id",
      col("text"), n = 8, minHits = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(viaIndex == got)
    // a second batch probes the SAME index without re-deriving it
    val batch2 = Seq(
      (201L, "a b c d e f g h i j"),          // exact dup of doc 1
      (202L, "y1 y2 y3 y4 y5 y6 y7 y8 y9"))   // novel
      .toDF("doc_id", "text")
    val got2 = Dedup.dedupAgainstIndex(batch2, idx, "doc_id",
      col("text"), n = 8, minHits = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(got2 == Set(202L))
    Dedup.releasePersisted()
  }

  test("corpusIndex round-trips through bucketed tables") {
    val existing = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "k l m n o p q r s t")).toDF("doc_id", "text")
    val incoming = Seq(
      (101L, "a b c d e f g h i j"),  // exact dup
      (102L, "z1 z2 z3 z4 z5 z6 z7 z8 z9")).toDF("doc_id", "text")
    val direct = Dedup.dedupAgainstCorpus(incoming, existing, "doc_id",
      col("text"), n = 8, minHits = 1)
      .select("doc_id").as[Long].collect().toSet
    val idx = Dedup.corpusIndex(existing, "doc_id", col("text"), n = 8)
    // the at-scale shape: both index frames bucketed on their probe key
    graft.sources.BucketedTables.writeBucketed(idx.fingerprints,
      "dedup_fp_spec", 4, Seq("__fp"))
    graft.sources.BucketedTables.writeBucketed(idx.gramHashes,
      "dedup_g_spec", 4, Seq("__g"))
    val back = Dedup.CorpusIndex(
      spark.table("dedup_fp_spec"), spark.table("dedup_g_spec"))
    val served = Dedup.dedupAgainstIndex(incoming, back, "doc_id",
      col("text"), n = 8, minHits = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(served == direct && served == Set(102L))
    Seq("dedup_fp_spec", "dedup_g_spec")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    Dedup.releasePersisted()
  }

  test("minhash band gate agrees with the batch pair enumeration") {
    val incoming = Seq(
      (101L, base + " again tonight"),                 // near-dup of 1/2
      (102L, "nothing in common with anything at all here today"),
      (103L, base.replace("quick", "swift")))          // near-dup of 1/3
      .toDF("doc_id", "text")
    val mh = Dedup.minhashBandIndex(docs, "doc_id", col("text"),
      numHashes = 128, numBands = 32, threshold = 0.5, shingleN = 5)
    val suppressed = Dedup.minhashSuppressedIds(incoming, mh,
      "doc_id", col("text")).as[Long].collect().toSet
    // ground truth: the BATCH pair enumerator over corpus ∪ incoming
    // with identical parameters — the incremental gate must suppress
    // exactly the incoming ids that pair with a CORPUS doc (incoming-
    // incoming pairs don't count; the batch would admit the first)
    val pairs = Dedup.minhashNearDupPairsText(
      docs.unionByName(incoming), "doc_id", col("text"),
      n = 5, numHashes = 128, bands = 32, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    val expected = pairs.collect {
      case (a, b) if a <= 5 && b >= 101 => b
      case (a, b) if b <= 5 && a >= 101 => a
    }.toSet
    assert(suppressed == expected)
    assert(expected.nonEmpty && !expected.contains(102L))
    Dedup.releasePersisted()
  }

  test("MinHashBandIndex round-trips through bucketed tables") {
    val mh = Dedup.minhashBandIndex(docs, "doc_id", col("text"),
      numHashes = 128, numBands = 32, threshold = 0.5)
    val incoming = Seq(
      (201L, base + " tonight indeed"),
      (202L, "totally novel words nothing shared whatsoever"))
      .toDF("doc_id", "text")
    val direct = Dedup.minhashSuppressedIds(incoming, mh,
      "doc_id", col("text")).as[Long].collect().toSet
    // the at-scale shape: bands bucketed on the probe key so only the
    // batch shuffles; sigs bucketed on the id the candidates join by
    graft.sources.BucketedTables.writeBucketed(mh.bands,
      "mh_bands_spec", 4, Seq("band_key"))
    graft.sources.BucketedTables.writeBucketed(mh.sigs,
      "mh_sigs_spec", 4, Seq("__mid"))
    val back = mh.copy(sigs = spark.table("mh_sigs_spec"),
      bands = spark.table("mh_bands_spec"))
    val served = Dedup.minhashSuppressedIds(incoming, back,
      "doc_id", col("text")).as[Long].collect().toSet
    assert(served == direct && direct == Set(201L))
    Seq("mh_bands_spec", "mh_sigs_spec")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    Dedup.releasePersisted()
  }

  test("groupMinHashSimilarity matches an exact estimator replay") {
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def fp(text: String): String =
      md5Hex(text.trim.toLowerCase.replaceAll("\\s+", " "))
    def comp(f: String, i: Int): Long =
      java.lang.Long.parseLong(md5Hex(f + ":" + i).take(15), 16)
    val k = 32
    val groups = Map(
      "A" -> Seq("doc one", "doc two", "doc three"),
      "B" -> Seq("doc one", "doc two", "other"),   // |A∩B|/|A∪B| = 0.5
      "C" -> Seq("доc x", "doc y"))                // ~disjoint from A/B
    val rows = groups.toSeq.flatMap { case (g, ds) =>
      ds.zipWithIndex.map { case (d, i) => (g + i, g, d) }
    }.toDF("doc_id", "source", "text")
    def sig(ds: Seq[String]): Seq[Long] =
      (0 until k).map(i => ds.map(d => comp(fp(d), i)).min)
    val expected = (for {
      a <- groups.keys; b <- groups.keys if a < b
      agree = sig(groups(a)).zip(sig(groups(b))).count(p => p._1 == p._2)
    } yield (a, b, BigDecimal(agree.toDouble / k)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    val got = Dedup.groupMinHashSimilarity(rows, col("source"),
      col("text"), k)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .toSet
    assert(got == expected)
    // identical fingerprint sets → estimate exactly 1.0
    val twin = (rows.collect().map(r =>
        (r.getString(0) + "z", "Z" + r.getString(1), r.getString(2))).toSeq)
      .toDF("doc_id", "source", "text")
    val both = rows.union(twin)
    val self = Dedup.groupMinHashSimilarity(both, col("source"),
      col("text"), k)
      .filter(col("key_a") === "A" && col("key_b") === "ZA")
      .collect()
    assert(self.length == 1 && self.head.getDouble(2) == 1.0)
  }

  test("containmentPairsText: asymmetric quote caught, Jaccard misses it") {
    val small = (1 to 12).map(i => s"a$i").mkString(" ")     // 10 3-grams
    val big = small + " " + (1 to 40).map(i => s"u$i").mkString(" ")
    val d = Seq(
      (1L, small), (2L, big),
      (3L, "entirely different words with no shared grams at all here"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairsText(d, "doc_id", col("text"),
        n = 3, num = 7, den = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // every gram of 1 is inside 2; the reverse direction is ~10/50
    assert(got == Set((1L, 2L, 1.0)))
    // the symmetric Jaccard join at the same strength cannot see it
    val jac = Dedup.ngramJaccardPairsText(d, "doc_id", col("text"),
      n = 3, threshold = 0.7).collect()
    assert(jac.isEmpty)
    Dedup.releasePersisted()
  }

  test("containmentPairsText: exact integer boundary at 7/10") {
    val xs = (1 to 12).map(i => s"x$i")                      // 10 3-grams
    def chainTo(k: Int): String =                            // k shared grams
      (xs.take(k + 2) ++ (1 to 20).map(i => s"f$i")).mkString(" ")
    val d = Seq(
      (1L, xs.mkString(" ")),
      (2L, chainTo(7)),     // shares exactly 7 of doc 1's grams → 0.7, ON the bound
      (3L, chainTo(6)))     // 6 shared → 0.6, below
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairsText(d, "doc_id", col("text"),
        n = 3, num = 7, den = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.contains((1L, 2L, 0.7)), s"boundary pair must survive: $got")
    assert(!got.exists(p => p._1 == 1L && p._2 == 3L), "0.6 must not")
    Dedup.releasePersisted()
  }

  test("containmentPairsText equals the quadratic reference on random docs") {
    val rnd = new scala.util.Random(77)
    val vocab = Seq("al", "be", "ga", "de", "ep", "ze", "et", "th")
    val corpus = (1L to 30L).map { id =>
      id -> Seq.fill(6 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }
    def grams(t: String): Set[String] = {
      val w = t.split("\\s+").filter(_.nonEmpty).toSeq
      if (w.size >= 3) w.sliding(3).map(_.mkString(" ")).toSet
      else Set(w.mkString(" "))
    }
    val want = (for {
      (ia, ta) <- corpus; (ib, tb) <- corpus if ia != ib
      ga = grams(ta); inter = (ga intersect grams(tb)).size
      if inter * 10 >= ga.size * 7
    } yield (ia, ib,
      BigDecimal(inter.toDouble / ga.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    val got = Dedup.containmentPairsText(corpus.toDF("doc_id", "text"),
        "doc_id", col("text"), n = 3, num = 7, den = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want, s"got ${got.size} vs want ${want.size}")
    Dedup.releasePersisted()
  }

  test("bagFingerprint: order-insensitive, multiplicity-sensitive, case-folded") {
    import graft.operators.TextAnalysis.{bagFingerprint, fingerprint}
    val d = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "mat the on sat cat the"),   // permutation of 1 → same bag
      (3L, "THE CAT  SAT on the MAT"),  // case/spacing noise → same bag
      (4L, "the cat sat on mat"),       // one 'the' fewer → different
      (5L, "cat cat sat"), (6L, "cat sat sat")) // same set, diff counts
      .toDF("doc_id", "text")
    val fps = d.select(col("doc_id"), bagFingerprint(col("text")).as("bfp"),
        fingerprint(col("text")).as("efp"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    assert(fps(1L)._1 == fps(2L)._1 && fps(1L)._1 == fps(3L)._1)
    assert(fps(1L)._2 != fps(2L)._2, "plain fingerprint must NOT collapse a permutation")
    assert(fps(1L)._1 != fps(4L)._1, "multiplicity must matter")
    assert(fps(5L)._1 != fps(6L)._1, "same vocabulary, different counts")
    val flagged = Dedup.exactDedup(d, bagFingerprint(col("text")), col("doc_id"))
      .filter(col("is_duplicate")).collect().map(_.getLong(0)).toSet
    assert(flagged == Set(2L, 3L), "lowest id of each bag group survives")
  }

  test("snapshotDiff: added/removed/changed/unchanged, whitespace-invariant") {
    val old = Seq((1L, "alpha beta"), (2L, "gamma delta"), (3L, "kept text"))
      .toDF("doc_id", "text")
    val nw = Seq((2L, "gamma delta REVISED"), (3L, "  kept   TEXT "),
      (4L, "brand new")).toDF("doc_id", "text")
    val got = Dedup.snapshotDiff(old, nw, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(
      1L -> "removed", 2L -> "changed",
      3L -> "unchanged",   // fingerprint folds case + whitespace
      4L -> "added"))
  }

  test("semanticDedup collapses planted duplicates to the lowest id") {
    // 4 exact axis clusters (ids ≡ cluster mod 4, all members of a
    // cluster byte-identical): at threshold ~1 every cluster is one
    // component rooted at its seed id; seeds 0..3 are the canonicals
    val dim = 8
    def vec(axis: Int) = (0 until dim).map(i =>
      if (i == axis) 1.0f else 0.0f)
    val corpus = (0 until 20).map(id => (id.toLong, vec(id % 4)))
      .toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(corpus, k = 4, iters = 2,
      threshold = 0.999)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getInt(3)))).toMap
    assert(out.size == 20)
    (0L until 20L).foreach { id =>
      val (cl, comp, canon) = out(id)
      assert(cl == (id % 4).toInt, s"vec $id cluster $cl")
      assert(comp == id % 4, s"vec $id component $comp")
      assert(canon == (if (id < 4) 1 else 0), s"vec $id canonical $canon")
    }
    // determinism across runs
    val again = Dedup.semanticDedup(corpus, k = 4, iters = 2,
      threshold = 0.999)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getInt(3)))).toMap
    assert(again == out)
    Dedup.releasePersisted()
  }

  test("semanticDecontam flags by max cosine with lowest-bench-id ties") {
    val bench = Seq(
      (100L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (101L, Seq(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Seq(0.9998f, 0.02f, 0.0f, 0.0f)), // near-copy of bench 100
      (2L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),     // orthogonal to both
      (3L, Seq(0.6f, 0.8f, 0.0f, 0.0f))      // closest to 101 at 0.8
    ).toDF("vec_id", "embedding")
    val out = Dedup.semanticDecontam(corpus, "vec_id", "embedding",
      bench, "vec_id", "embedding", threshold = 0.9)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getLong(2), r.getInt(3)))).toMap
    assert(out.size == 3)
    val (c1, n1, f1) = out(1L)
    assert(c1 > 0.999 && n1 == 100L && f1 == 1)
    // both benches score an identical 0.0 -> nearest is the LOWEST id
    assert(out(2L) == ((0.0, 100L, 0)))
    assert(out(3L) == ((0.8, 101L, 0)))
  }
}
