package graft

import graft.operators.{Retrieval, TextAnalysis}
import org.apache.spark.sql.functions._

/** BM25 against a plain-Scala reference on a tiny corpus (every
  * aggregate hand-replayed), plus the b=0 degeneracy where length
  * normalization must vanish. The full-scale hash gate is q70. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    1L -> "the cat sat on the mat",
    2L -> "the dog sat",
    3L -> "cat cat cat",
    4L -> "dog mat dog mat dog mat dog mat",
    5L -> "birds").toDF("doc_id", "text")

  private val queries = Seq(
    10L -> "cat mat", 11L -> "dog").toDF("query_id", "query_text")

  private def reference(k1: Double, b: Double): Set[(Long, Long, Double)] = {
    val corpus = Map(
      1L -> "the cat sat on the mat", 2L -> "the dog sat",
      3L -> "cat cat cat", 4L -> "dog mat dog mat dog mat dog mat",
      5L -> "birds").map { case (id, t) => id -> t.split("\\s+").toSeq }
    val n = corpus.size
    val avgdl = corpus.values.map(_.size).sum.toDouble / n
    def df(t: String) = corpus.values.count(_.contains(t))
    def score(q: Seq[String], d: Seq[String]): Double = {
      val s = q.distinct.filter(d.contains).map { t =>
        val tf = d.count(_ == t).toDouble
        val idf = math.log(1 + (n - df(t) + 0.5) / (df(t) + 0.5))
        idf * tf / (tf + k1 * (1 - b + b * d.size / avgdl))
      }.sum
      BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val qs = Map(10L -> Seq("cat", "mat"), 11L -> Seq("dog"))
    qs.flatMap { case (qid, q) =>
      corpus.toSeq.map { case (id, d) => (qid, id, score(q, d)) }
        .filter(_._3 > 0)
    }.toSet
  }

  test("scores match the hand reference; ranking by (score desc, id)") {
    val got = Retrieval.bm25TopK(docs, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSet
    assert(got == reference(1.2, 0.75))
    val ranks = Retrieval.bm25TopK(docs, queries, k = 5)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
    // query "cat mat": doc 3 (tf=3 cat, short) outranks doc 1 (both terms)?
    // whatever the scores say — assert ranks are dense and ordered
    val q10 = ranks.keys.filter(_._1 == 10L).map(_._2).toSeq.sorted
    assert(q10 == (1 to q10.size))
  }

  test("b=0 removes length normalization") {
    // docs 2 and 4 both contain "dog"; with b=0 the denominator no
    // longer depends on dl, so doc 4 (tf=4) must strictly outrank doc 2
    val got = Retrieval.bm25TopK(docs, queries, k = 5, b = 0.0)
      .filter($"query_id" === 11L)
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(got(1) == 4L && got(2) == 2L)
    assert(got == reference(1.2, 0.0).filter(_._1 == 11L)
      .toSeq.sortBy(-_._3).zipWithIndex
      .map { case ((_, id, _), i) => (i + 1) -> id }.toMap)
  }

  test("index-backed serving equals direct; index survives a bucketed write") {
    val direct = Retrieval.bm25TopK(docs, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val idx = Retrieval.buildIndex(docs)
    // the serving shape: tf bucketed on term (the probe key), df likewise,
    // the one-row stats frame as a plain table
    graft.sources.BucketedTables.writeBucketed(idx.tf, "bm25_tf_spec", 4,
      Seq("__t"))
    graft.sources.BucketedTables.writeBucketed(idx.df, "bm25_df_spec", 4,
      Seq("__t"))
    idx.stats.write.mode("overwrite").saveAsTable("bm25_stats_spec")
    val back = Retrieval.Bm25Index(
      spark.table("bm25_tf_spec"), spark.table("bm25_df_spec"),
      spark.table("bm25_stats_spec"))
    val served = Retrieval.bm25TopKWithIndex(back, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(served == direct)
    Seq("bm25_tf_spec", "bm25_df_spec", "bm25_stats_spec")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("mergeIndex ≡ full rebuild: stats exact, served scores identical") {
    val base = docs.filter($"doc_id" <= 3)
    val batch = docs.filter($"doc_id" > 3)
    val merged = Retrieval.mergeIndex(Retrieval.buildIndex(base), batch)
    val rebuilt = Retrieval.buildIndex(docs)
    // stats must be EXACT (bit-identical doubles), not approximately equal
    // — the merged avgdl reconstructs each side's integer token sum
    val ms = merged.stats.collect().head
    val rs = rebuilt.stats.collect().head
    assert(ms.getLong(0) == rs.getLong(0) &&
      ms.getDouble(1) == rs.getDouble(1), s"stats $ms != $rs")
    // df reconciliation: term present in both sides ("mat": docs 1 and 4),
    // one side only ("birds"), sums to the rebuilt df table
    val mdf = merged.df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rdf = rebuilt.df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mdf == rdf)
    // end to end: serving from the merged index = serving from a rebuild
    def serve(ix: Retrieval.Bm25Index) =
      Retrieval.bm25TopKWithIndex(ix, queries, k = 5)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).toSet
    assert(serve(merged) == serve(rebuilt))
    // empty batch is a serving no-op (null-avgdl guard on the stats merge)
    val noop = Retrieval.mergeIndex(rebuilt, docs.filter($"doc_id" < 0))
    assert(serve(noop) == serve(rebuilt))
    graft.operators.PersistTracker.releaseAll()
  }

  test("evalRanking: hand-computed MRR/recall incl. the zero-hit query") {
    val ranked = Seq(
      // query 1: relevant docs at ranks 2 and 5 (of 2 relevant)
      (1L, 1, 101L), (1L, 2, 7L), (1L, 3, 102L), (1L, 5, 8L),
      // query 2: its single relevant doc on top
      (2L, 1, 9L), (2L, 2, 103L),
      // query 3: retrieved nothing relevant
      (3L, 1, 104L), (3L, 2, 105L),
      // query 4: relevant doc exists at rank 6 — outside k=5
      (4L, 6, 10L)).toDF("query_id", "rank", "doc_id")
    val qrels = Seq((1L, 7L), (1L, 8L), (2L, 9L), (3L, 11L), (4L, 10L))
      .toDF("query_id", "doc_id")
    val got = Retrieval.evalRanking(ranked, qrels, k = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got(1L) == ((0.5, 2L, 2L, 1.0)))
    assert(got(2L) == ((1.0, 1L, 1L, 1.0)))
    assert(got(3L) == ((0.0, 0L, 1L, 0.0)))   // zero-hit query surfaces
    assert(got(4L) == ((0.0, 0L, 1L, 0.0)))   // rank 6 is outside k=5
    assert(got.size == 4)
  }

  test("phraseSearch: contiguity, overlap counting, case, no-hit") {
    val corpus = Seq(
      1L -> "The cat sat on the mat",   // "cat sat" at 2; "the mat" at 5
      2L -> "cat on sat",               // cat..sat present, NOT adjacent
      3L -> "x a a a y",                // "a a" overlaps: anchors 2 and 3
      4L -> "tiny").toDF("doc_id", "text")
    val qs = Seq(
      (10L, "cat sat"), (11L, "the mat"), (12L, "a a"),
      (13L, "never present"), (14L, "tiny doc phrase longer than doc"))
      .toDF("query_id", "phrase")
    val got = Retrieval.phraseSearch(corpus, qs)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      (10L, 1L, 1L, 2L),   // one occurrence at position 2 (lowercased)
      (11L, 1L, 1L, 5L),
      (12L, 3L, 2L, 2L)))  // overlapping occurrences both count
  }

  test("duplicatedSpanStats finds planted shared spans") {
    val d = Seq(
      (1L, "a b c d e f"),       // shares 3-grams "b c d","c d e","d e f" w/ 2
      (2L, "x b c d e f"),       // 4 grams, 3 shared
      (3L, "p q r s t u"),       // no overlap
      (4L, "p q"))               // too short for 3-grams: no row
      .toDF("doc_id", "text")
    val got = TextAnalysis.duplicatedSpanStats(d, "doc_id", col("text"),
      n = 3, minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) == ((4L, 3L, 0.75)))
    assert(got(2L) == ((4L, 3L, 0.75)))
    assert(got(3L) == ((4L, 0L, 0.0)))
    assert(!got.contains(4L))
  }

  test("stripDuplicatedSpans removes covered tokens, keeps case") {
    val d = Seq(
      (1L, "a B c d e f"),   // grams (lowercase identity) shared with 2
      (2L, "x b C d e f"),
      (3L, "p q r s t u"),   // unique: untouched (whitespace-normalized)
      (4L, "P  Q"))          // too short for grams: survives as-is
      .toDF("doc_id", "text")
    val got = TextAnalysis.stripDuplicatedSpans(d, "doc_id", col("text"),
      n = 3, minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // docs 1/2: shared 3-grams "b c d","c d e","d e f" cover positions
    // 2..6, leaving only the first token — original case preserved
    assert(got(1L) == ((6L, 1L, "a")))
    assert(got(2L) == ((6L, 1L, "x")))
    assert(got(3L) == ((6L, 6L, "p q r s t u")))
    assert(got(4L) == ((2L, 2L, "P Q")))
    // every doc comes back, even fully-covered ones
    val twin = Seq((1L, "same same"), (2L, "same same")).toDF("doc_id", "text")
    val wiped = TextAnalysis.stripDuplicatedSpans(twin, "doc_id",
      col("text"), n = 2, minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(wiped == Map(1L -> "", 2L -> ""))
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Plain-Scala CDC reference: same trailing-window md5-bucket
    * boundary rule, same chunk fingerprints. */
  private def cdcReference(docs: Seq[(Long, String)], w: Int, avg: Int)
      : Set[(Long, Long, Long, String)] =
    docs.flatMap { case (id, text) =>
      val t = text.split("\\s+").filter(_.nonEmpty)
      if (t.isEmpty) Seq.empty
      else {
        val bounds = (1 to t.length).map { j =>
          j >= w && {
            val gram = t.slice(j - w, j).mkString(" ")
            java.lang.Long.parseLong(md5Hex(gram).take(15), 16) % avg == 0
          }
        }
        val chunkIdx = bounds.scanLeft(0L)((c, b) => if (b) c + 1 else c)
        t.indices.groupBy(i => chunkIdx(i)).map { case (c, is) =>
          (id, c, is.size.toLong, md5Hex(is.map(t).mkString(" ")))
        }
      }
    }.toSet

  test("stripContaminatedSpans removes only benchmark-covered tokens") {
    val corpus = Seq(
      // tokens 3..10 quote the benchmark item verbatim (8-gram hit);
      // unique prose surrounds it and must survive
      (1L, "Unique Intro Here b1 b2 b3 b4 b5 b6 b7 b8 And Unique Outro"),
      (2L, "nothing here overlaps the benchmark at all in any way"),
      (3L, "b1 b2 b3 b4 b5 b6 b7 b8"), // fully covered → empty rewrite
      (4L, "short doc")                // < n tokens: untouched
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "b1 b2 b3 b4 b5 b6 b7 b8 b9"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.stripContaminatedSpans(
      corpus, bench, "doc_id", col("text"), n = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((14L, 6L, "Unique Intro Here And Unique Outro")))
    assert(got(2L)._2 == 10L && got(2L)._3 ==
      "nothing here overlaps the benchmark at all in any way")
    assert(got(3L) == ((8L, 0L, "")))
    assert(got(4L) == ((2L, 2L, "short doc")))
    graft.operators.PersistTracker.releaseAll()
  }

  test("cdcChunkReuse: identical=1.0, novel=0.0, head-edit reuses tail") {
    val rnd = new scala.util.Random(31)
    def words(k: Int, tag: String): String =
      (1 to k).map(_ => s"$tag${rnd.nextInt(5000)}").mkString(" ")
    val oldText = words(400, "w")
    val old = Seq((1L, oldText)).toDF("doc_id", "text")
    val snap = Seq(
      (11L, oldText),                                        // identical
      (12L, words(400, "z")),                                // novel
      (13L, oldText.split(" ").drop(5).mkString(" "))        // head edit
    ).toDF("doc_id", "text")
    val got = TextAnalysis.cdcChunkReuse(snap, old, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(11L)._1 == got(11L)._2 && got(11L)._3 == 1.0)
    assert(got(12L)._2 == 0L && got(12L)._3 == 0.0)
    // CDC resync: the head edit damages at most the first chunk(s);
    // consistency-check the count against the two chunk frames directly
    val oldFps = TextAnalysis.cdcChunks(old, "doc_id", col("text"))
      .select("chunk_fp").as[String].collect().toSet
    val editFps = TextAnalysis.cdcChunks(
      snap.filter(col("doc_id") === 13L), "doc_id", col("text"))
      .select("chunk_fp").as[String].collect()
    val expectReused = editFps.count(oldFps)
    assert(got(13L)._2 == expectReused && expectReused > 0,
      s"resync must recover tail chunks (got $expectReused)")
    assert(got(13L)._3 < 1.0, "the edited head chunk must not match")
    graft.operators.PersistTracker.releaseAll()
  }

  test("cdcChunks matches the plain-Scala reference; boundaries resync") {
    val rnd = new scala.util.Random(11)
    val words = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    def doc(n: Int) = Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" ")
    val a = doc(120)
    val docs = Seq(1L -> a, 2L -> ("zzz qqq " + a), 3L -> "one two",
      4L -> "")
    val got = graft.operators.TextAnalysis.cdcChunks(
      docs.toDF("doc_id", "text"), "doc_id", col("text"),
      w = 4, avgTokens = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    assert(got == cdcReference(docs, 4, 8))
    // the CDC property: a 2-token prefix insertion leaves every chunk
    // after the first boundary intact (fixed-width chunking loses all)
    val fpsA = got.filter(_._1 == 1L).map(_._4)
    val fpsB = got.filter(_._1 == 2L).map(_._4)
    assert((fpsA intersect fpsB).size >= fpsA.size - 1,
      s"resync failed: ${fpsA.size} vs shared ${(fpsA intersect fpsB).size}")
  }

  test("null and empty text: text operators neither crash nor leak rows") {
    val d = Seq((1L, "a b c d"), (2L, null), (3L, ""), (4L, "   "))
      .toDF("doc_id", "text")
    // span stats/strip: only doc 1 can carry grams; null/empty docs
    // surface with zero tokens rather than exploding or disappearing
    val stats = TextAnalysis.duplicatedSpanStats(d, "doc_id", col("text"),
      n = 2, minDocs = 2).collect()
    assert(stats.map(_.getLong(0)).toSet == Set(1L))
    val strip = TextAnalysis.stripDuplicatedSpans(d, "doc_id", col("text"),
      n = 2, minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(strip(1L) == "a b c d" && strip(3L) == "" && strip(4L) == "")
    assert(!strip.contains(2L) || strip(2L) == "",
      "null text must not crash the rewrite")
    val chunks = graft.operators.TextAnalysis.cdcChunks(d, "doc_id",
      col("text"), w = 2, avgTokens = 4).collect()
    assert(chunks.map(_.getLong(0)).toSet == Set(1L))
    // retrieval: null/empty docs simply never match
    val hits = Retrieval.bm25TopK(d,
      Seq((9L, "a")).toDF("query_id", "query_text"), k = 10)
      .collect().map(_.getLong(2)).toSet
    assert(hits == Set(1L))
  }

  test("rrfFuse: hand-computed integer fusion; both-lists doc wins") {
    val lex = Seq((1L, 1, 10L), (1L, 2, 20L)).toDF("query_id", "rank", "doc_id")
    val dense = Seq((1L, 1, 20L), (1L, 2, 30L)).toDF("query_id", "rank", "doc_id")
    val got = Retrieval.rrfFuse(Seq(lex, dense), k = 3)
      .orderBy("rank")
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // 1e9 div 61 = 16393442, div 62 = 16129032 (exact integer arithmetic)
    assert(got.toSeq == Seq(
      (1, 20L, 16393442L + 16129032L, 2L),   // rank 2 lex + rank 1 dense
      (2, 10L, 16393442L, 1L),
      (3, 30L, 16129032L, 1L)))
  }

  test("hybridTopK fuses lexical and dense; exact ties break to lower id") {
    val d = Seq(
      1L -> "apple banana", 2L -> "apple", 3L -> "cherry", 4L -> "durian x")
      .toDF("doc_id", "text")
    val v = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0.8f, 0.6f)),
      (3L, Array(0f, 1f)), (4L, Array(-1f, 0f)))
      .toDF("vec_id", "embedding")
    val q = Seq((7L, "apple", Array(1f, 0f)))
      .toDF("query_id", "query_text", "embedding")
    val got = Retrieval.hybridTopK(d, v, q, k = 4, depth = 4)
      .orderBy("rank")
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // lex: doc 2 (shorter) over doc 1; dense: 1, 2, 3, 4 by cosine.
    // docs 1 and 2 tie exactly (rank pair {1,2} in both) → id order.
    assert(got.toSeq == Seq(
      (1, 1L, 16393442L + 16129032L, 2L),
      (2, 2L, 16393442L + 16129032L, 2L),
      (3, 3L, 1000000000L / 63, 1L),
      (4, 4L, 1000000000L / 64, 1L)))
  }

  test("epochKey orders are deterministic and epoch-independent") {
    val ids = (1L to 500L).toDF("doc_id")
    def order(e: Int) = ids
      .orderBy(graft.operators.Sampling.epochKey(col("doc_id"), e, "s"),
        col("doc_id"))
      .select("doc_id").as[Long].collect().toSeq
    assert(order(1) == order(1), "same epoch reproduces")
    assert(order(1) != order(2), "epochs are fresh permutations")
    assert(order(1).toSet == (1L to 500L).toSet, "a permutation, not a sample")
  }

  test("prfTopK: expansion recovers a doc sharing no original query term") {
    import graft.operators.Retrieval
    // feedback docs pair "alpha" with "gamma"; doc 4 has only "gamma"
    val docs = Seq(
      (1L, "alpha gamma gamma"),
      (2L, "alpha gamma"),
      (3L, "alpha beta"),
      (4L, "gamma delta epsilon"),
      (5L, "zeta eta theta")).toDF("doc_id", "text")
    val q = Seq((1L, "alpha")).toDF("query_id", "query_text")
    val idx = Retrieval.buildIndex(docs)
    val base = Retrieval.bm25TopKWithIndex(idx, q, k = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(!base.contains(4L), "doc 4 must be invisible to the raw query")
    // fbDocs=3 puts doc 1's double "gamma" into the feedback mass:
    // w(gamma) = idf·3 beats the rarer beta's idf·1
    val prf = Retrieval.prfTopK(idx, q, k = 5, fbDocs = 3, fbTerms = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(prf.contains(4L),
      s"expansion (gamma) must recover doc 4; got $prf")
    assert(!prf.contains(5L), "unrelated doc stays invisible")
    // fbTerms = 0 degrades to plain BM25 exactly
    val zero = Retrieval.prfTopK(idx, q, k = 5, fbDocs = 2, fbTerms = 0)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val plain = Retrieval.bm25TopKWithIndex(idx, q, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(zero == plain)
    graft.operators.Dedup.releasePersisted()
  }
}
