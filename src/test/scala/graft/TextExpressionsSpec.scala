package graft

import graft.functions.TextExpressions
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class TextExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("wordListMask bit i ≡ isInCollection membership in list i") {
    val lists = TextAnalysis.LangProfiles.toSeq.sortBy(_._1).map(_._2)
    val tokens = (lists.flatten ++ Seq("zzz", "", "DE", "the "))
      .zipWithIndex.map(_.swap).toDF("id", "tok")
    val expected = lists.zipWithIndex.map { case (ws, i) =>
      when(col("tok").isInCollection(ws), 1 << i).otherwise(0)
    }.reduce(_ + _)
    val rows = tokens
      .select(TextExpressions.wordListMask(col("tok"), lists).as("mask"),
        expected.as("want"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    // "de" appears in several profiles → its mask has >1 bit set
    val deMask = tokens.filter(col("tok") === "de")
      .select(TextExpressions.wordListMask(col("tok"), lists))
      .as[Int].head()
    assert(java.lang.Integer.bitCount(deMask) > 1)
  }

  test("wordListHitCounts ≡ per-token mask sums; argmax ≡ langId") {
    val lists = TextAnalysis.LangProfiles.toSeq.sortBy(_._1)
    val docs = Seq(
      (1, "the quick brown fox and the lazy dog"),
      (2, "le chat et le chien sont dans la maison"),
      (3, "der hund und die katze sind nicht da"),
      (4, "zzz qqq completely unmatched tokens"),
      (5, ""),
      (6, "el perro y el gato en la casa"))
      .toDF("id", "text")
    val toks = TextAnalysis.tokens(lower(col("text")))
    // counts from the one-pass array expression == exploded mask sums
    val got = docs.select(col("id"),
      TextExpressions.wordListHitCounts(toks, lists.map(_._2)).as("c"))
      .as[(Int, Seq[Int])].collect().toMap
    val want = docs
      .select(col("id"), explode_outer(toks).as("t"))
      .select(col("id"), coalesce(TextExpressions
        .wordListMask(col("t"), lists.map(_._2)), lit(0)).as("m"))
      .groupBy("id")
      .agg(sum(shiftright(col("m"), 0).bitwiseAND(1)).cast("int").as("h0"),
        lists.indices.tail.map(i =>
          sum(shiftright(col("m"), i).bitwiseAND(1)).cast("int")
            .as(s"h$i")): _*)
      .collect().map(r => r.getInt(0) ->
        lists.indices.map(i => r.getInt(i + 1))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, c) => assert(c == want(id), s"doc $id") }
    // argmax expression agrees with the Column-form langId on every doc
    val a = docs.select(col("id"),
      TextAnalysis.langGuess(col("text")).as("g"))
      .as[(Int, String)].collect().toMap
    val b = docs.select(col("id"), TextAnalysis.langId(col("text")).as("g"))
      .as[(Int, String)].collect().toMap
    assert(a == b)
    assert(a(4) == "und" && a(5) == "und")
  }

  test("repetitionStats: hand-computed bigram/trigram fractions") {
    val docs = Seq(
      (1L, "a b a b c"),          // bigrams ab,ba,ab,bc → top 2/4
      (2L, "x y z x y z x y z"),  // trigrams 3+2+2 of 7 dup → 1.0
      (3L, "one two"),            // no trigram possible → dup3 = 0.0
      (4L, "solo"))               // no bigram either → 0.0 / 0.0
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(docs, "doc_id", col("text"))
      .as[(Long, Double, Double)].collect()
      .map { case (id, a, b2) => id -> ((a, b2)) }.toMap
    assert(out(1L) == ((0.5, 0.0)))
    assert(out(2L) == ((0.375, 1.0))) // top bigram "x y" 3 of 8
    assert(out(3L) == ((1.0, 0.0)))   // the single bigram is the top one
    assert(out(4L) == ((0.0, 0.0)))
  }

  test("chunkTokens: boundaries, overlap, short docs") {
    val docs = Seq(
      (1L, (1 to 100).map("t" + _).mkString(" ")), // 100 → 3 chunks
      (2L, (1 to 40).map("t" + _).mkString(" ")),  // exactly one window
      (3L, "a b c"))                               // shorter than overlap
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunkTokens(docs, "doc_id", col("text"),
      maxTokens = 40, overlap = 10)
      .as[(Long, Int, Int, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // stride 30: ⌈(100−10)/30⌉ = 3 chunks at starts 1, 31, 61 — the
    // last window reaches token 100, so no 4th chunk is needed
    assert(out(1L).map(c => (c._2, c._3)).toSeq ==
      Seq((0, 40), (1, 40), (2, 40)))
    // consecutive chunks share the 10-token overlap
    val c0 = out(1L)(0)._4.split(" "); val c1 = out(1L)(1)._4.split(" ")
    assert(c0.takeRight(10).toSeq == c1.take(10).toSeq)
    assert(c0.head == "t1" && c1.head == "t31")
    assert(out(2L).map(c => (c._2, c._3)).toSeq == Seq((0, 40)))
    assert(out(3L).map(c => (c._2, c._3, c._4)).toSeq ==
      Seq((0, 3, "a b c")))
    // every token of doc 1 is covered
    assert(out(1L).flatMap(_._4.split(" ")).toSet.size == 100)
  }

  test("packSequences: concat-and-cut prefix-sum arithmetic") {
    def words(n: Int) = (1 to n).map("w" + _).mkString(" ")
    val docs = Seq(
      ("s1", 1L, words(100)), // [0, 100)   → seq 0
      ("s1", 2L, words(200)), // [100, 300) → spans seqs 0 and 1
      ("s1", 3L, words(100)), // [300, 400) → seq 1
      ("s2", 9L, words(10)))  // shards pack independently
      .toDF("source", "doc_id", "text")
    val out = TextAnalysis.packSequences(docs, "source", "doc_id",
      col("text"), capacity = 256)
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out(("s1", 0L)) == ((2L, 256L))) // docs 1+2 fill it exactly
    assert(out(("s1", 1L)) == ((2L, 144L))) // doc 2 tail + doc 3
    assert(out(("s2", 0L)) == ((1L, 10L)))
    assert(out.size == 3)
  }

  test("tfIdfTopTerms: hand-computed smooth idf, rank ties on term") {
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "apple cherry cherry cherry"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.tfIdfTopTerms(docs, "doc_id", col("text"), k = 2)
      .as[(Long, Int, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // N=3, every df=2 → idf = ln(4/3) = 0.287682..., rounded 0.2877/doc tf
    assert(out((1L, 1)) == (("apple", 2L, 0.5754)))
    assert(out((1L, 2)) == (("banana", 1L, 0.2877)))
    // d2: banana and cherry tie at 0.2877 → term asc breaks the tie
    assert(out((2L, 1))._1 == "banana")
    assert(out((2L, 2))._1 == "cherry")
    assert(out((3L, 1)) == (("cherry", 3L, 0.863)))
    assert(out.size == 6)
  }

  test("qualityRuleFlags: hand-computed stats, rule boundaries, null/empty") {
    val d = Seq(
      (1L, "the cat runs fast"),      // all rules pass (boundaries below)
      (2L, "x y"),                    // too short, tiny words, no stopwords
      (3L, "dog dog dog dog the"),    // ttr 0.4 < 0.6 fails; others at bounds
      (4L, null.asInstanceOf[String]),
      (5L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.qualityRuleFlags(d, "doc_id", col("text"),
        minWords = 3, maxWords = 6, minMeanWordLen = 3.0, maxMeanWordLen = 4.0,
        minStopRatio = 0.2, minTypeTokenRatio = 0.6)
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1: n=4, chars=14 → ml 3.5; stops 1/4 = 0.25; ttr 1.0
    assert(got(1L).getDouble(2) == 3.5 && got(1L).getDouble(3) == 0.25)
    assert(got(1L).getInt(9) == 1, "doc 1 passes every rule")
    assert(got(2L).getInt(9) == 0 && got(2L).getInt(8) == 1,
      "doc 2 fails words/len/stop but r_ttr holds")
    // doc 3 sits ON the ml and stop boundaries (3.0, 0.2) — inclusive —
    // and fails only ttr (2/5 = 0.4)
    assert(got(3L).getDouble(2) == 3.0 && got(3L).getDouble(3) == 0.2)
    assert(got(3L).getInt(5) == 1 && got(3L).getInt(6) == 1 &&
      got(3L).getInt(7) == 1 && got(3L).getInt(8) == 0 &&
      got(3L).getInt(9) == 0)
    // null / zero-token docs: present, null stats, pass = 0
    Seq(4L, 5L).foreach { id =>
      assert(got(id).isNullAt(2) && got(id).getInt(9) == 0)
    }
  }

  test("bigramLmScores: hand-computed add-one smoothing") {
    val docs = Seq(
      (1L, "a b a b"),
      (2L, "a b c"),
      (3L, "solo")) // <2 tokens → no bigrams, excluded
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScores(docs, "doc_id", col("text"))
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // c2: (a,b)=3 (b,a)=1 (b,c)=1; c1: a=3 b=2; V=4 ({a,b,c,solo})
    // lp(a,b)=ln(4/7), lp(b,a)=lp(b,c)=ln(2/6)
    val lpAb = math.log(4.0 / 7); val lpB = math.log(2.0 / 6)
    def r4(x: Double) = math.rint(x * 10000) / 10000 // away-from-zero ties never hit here
    assert(out(1L) == ((3L, r4((2 * lpAb + lpB) / 3))))
    assert(out(2L) == ((2L, r4((lpAb + lpB) / 2))))
    assert(!out.contains(3L) && out.size == 2)
  }

  test("knBigramLmScores: hand-computed KN terms; P(·|w1) sums to 1") {
    val docs = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a c"),
      (4L, "solo")) // <2 tokens → excluded
      .toDF("doc_id", "text")
    val out = TextAnalysis.knBigramLmScores(docs, "doc_id", col("text"))
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    graft.operators.Dedup.releasePersisted()
    // c2: (a,b)=2 (a,c)=1; c1(a)=3, N1+(a,·)=2; N1+(·,b)=N1+(·,c)=1; T=2
    // P(b|a) = (2−.75)/3 + .75·2/3·(1/2) = 2/3
    // P(c|a) = (1−.75)/3 + .75·2/3·(1/2) = 1/3  → sums to 1 (KN invariant)
    val pB = (2 - 0.75) / 3 + 0.75 * 2 / 3 * 0.5
    val pC = (1 - 0.75) / 3 + 0.75 * 2 / 3 * 0.5
    assert(math.abs(pB + pC - 1.0) < 1e-12)
    def r4(x: Double) = math.rint(x * 10000) / 10000
    assert(out(1L) == ((1L, r4(math.log(pB)))))
    assert(out(2L) == ((1L, r4(math.log(pB)))))
    assert(out(3L) == ((1L, r4(math.log(pC)))))
    assert(!out.contains(4L) && out.size == 3)
    // the common bigram scores higher than the rare one
    assert(out(1L)._2 > out(3L)._2)
  }

  test("frequentNgrams: exact counts, prefilter never drops a frequent gram") {
    // 40 docs sharing "x y" (count 40), plus per-doc unique bigrams
    val docs = (1 to 40).map(i => (i.toLong, s"x y u$i v$i"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.frequentNgrams(docs, col("text"), n = 2,
      minCount = 3).as[(String, Long)].collect().toMap
    // hand reference: "x y" ×40; every other bigram ("y uI", "uI vI")
    // occurs exactly once, far below minCount
    assert(got == Map("x y" -> 40L))
    assert(!got.keySet.exists(_.startsWith("u")), "tail grams must not appear")
  }

  test("frequentNgrams is partitioning-invariant") {
    val docs = (1 to 60).map(i => (i.toLong, s"a b c d${i % 7} e"))
      .toDF("doc_id", "text")
    val one = TextAnalysis.frequentNgrams(docs.repartition(1), col("text"),
      n = 3, minCount = 4).as[(String, Long)].collect().toSet
    val many = TextAnalysis.frequentNgrams(docs.repartition(13), col("text"),
      n = 3, minCount = 4).as[(String, Long)].collect().toSet
    assert(one == many && one.nonEmpty)
  }

  test("packGreedy: next-fit-decreasing walk, oversized docs, key reset") {
    def words(n: Int) = (1 to n).map("w" + _).mkString(" ")
    val docs = Seq(
      ("s1", 1L, words(7)), ("s1", 2L, words(6)), ("s1", 3L, words(4)),
      ("s1", 4L, words(3)), ("s1", 5L, words(2)), ("s1", 6L, words(12)),
      ("s2", 9L, words(5)), ("s2", 8L, ""))
      .toDF("source", "doc_id", "text")
    val out = TextAnalysis.packGreedy(docs, "source", "doc_id",
      col("text"), capacity = 10)
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // s1 longest-first: 6(12) 1(7) 2(6) 3(4) 4(3) 5(2) →
    // bin0={6 oversized alone}, bin1={1}, bin2={2,3}=10, bin3={4,5}
    assert(out(("s1", 6L)) == ((12L, 0L)))
    assert(out(("s1", 1L)) == ((7L, 1L)))
    assert(out(("s1", 2L)) == ((6L, 2L)))
    assert(out(("s1", 3L)) == ((4L, 2L)))
    assert(out(("s1", 4L)) == ((3L, 3L)))
    assert(out(("s1", 5L)) == ((2L, 3L)))
    assert(out(("s2", 9L)) == ((5L, 0L)), "bins restart per shard")
    assert(!out.contains(("s2", 8L)), "empty docs are excluded")
  }

  test("packGreedy is partitioning-invariant") {
    val docs = (1 to 300).map(i =>
      (s"s${i % 5}", i.toLong, (1 to (i % 37) + 1).map("w" + _).mkString(" ")))
      .toDF("source", "doc_id", "text")
    val one = TextAnalysis.packGreedy(docs.repartition(1), "source",
      "doc_id", col("text"), 64)
      .as[(String, Long, Long, Long)].collect().toSet
    val many = TextAnalysis.packGreedy(docs.repartition(17), "source",
      "doc_id", col("text"), 64)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(one == many && one.nonEmpty)
  }

  test("stripHtml: blocks dropped, tags stripped, entities decoded in order") {
    val cases = Seq(
      "<p>hello <b>world</b></p>" -> "hello world",
      "a<script>var x = \"<p>\";</script>b" -> "a b",
      "x<style type=\"css\">p { color: red }</style>y" -> "x y",
      "keep <!-- not this --> that" -> "keep that",
      "Tom &amp; Jerry &lt;3 &quot;hi&quot; &#39;99&nbsp;!" ->
        "Tom & Jerry <3 \"hi\" '99 !",
      // &amp;lt; must decode to literal "&lt;", NOT double-decode to "<"
      "&amp;lt;" -> "&lt;",
      "  lots   of\n\nspace  " -> "lots of space")
    val got = cases.map(_._1).toDF("h")
      .select(TextAnalysis.stripHtml(col("h"))).as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }

  test("dataCard: hand-computed slice metrics; short slices go null") {
    val docs = Seq(
      // slice (s1, en): 3 docs; doc 2 duplicates doc 1 (fingerprint
      // collapses case/whitespace). Trigram occurrences: docs 1 and 2
      // each give "a b c","b c d"; doc 3 gives "a b c" → 5 total,
      // 2 distinct
      (1L, "a b c d", "s1", "en"),
      (2L, "A  b C d", "s1", "en"),
      (3L, "a b c", "s1", "en"),
      // slice (s2, fr): one 2-token doc → no trigram row
      (4L, "xx yy", "s2", "fr"))
      .toDF("doc_id", "text", "source", "lang")
    val out = TextAnalysis.dataCard(docs, "doc_id", col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val s1 = out(("s1", "en"))
    assert(s1.getLong(2) == 3L)                 // n_docs
    assert(s1.getLong(3) == 11L)                // total tokens 4+4+3
    assert(s1.getDouble(4) == 3.67)             // mean
    assert(s1.getDouble(5) == 4.0)              // median of (3,4,4)
    assert(s1.getDouble(6) == 0.3333)           // 1 - 2/3
    // trigram occurrences: "a b c"×3, "b c d"×2 → 2 distinct / 5
    assert(s1.getDouble(7) == 0.4)
    val s2 = out(("s2", "fr"))
    assert(s2.getLong(2) == 1L && s2.getLong(3) == 2L)
    assert(s2.getDouble(6) == 0.0)
    assert(s2.isNullAt(7), "no >=3-token doc → null diversity")
  }

  test("foldAccents + foldedFingerprint: Unicode-variant dedup class") {
    val docs = Seq(
      (1L, "Résumé, Café — niño!"), // accented
      (2L, "resume cafe nino"),                              // folded twin
      (3L, "RESUME -- CAFE -- NINO"),                        // case+punct
      (4L, "plain ascii text stays put"),
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    def cols(codegen: Boolean): Map[Long, (String, String)] = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try docs.select(col("doc_id"),
          TextExpressions.foldAccents(col("text")).as("f"),
          TextAnalysis.foldedFingerprint(col("text")).as("fp"))
        .collect().map(r => r.getLong(0) ->
          (Option(r.getString(1)).orNull, Option(r.getString(2)).orNull))
        .toMap
      finally spark.conf.set("spark.sql.codegen.wholeStage", true)
    }
    val r = cols(codegen = true)
    // NFD fold: á→a, é→e, ñ→n; em-dash survives the fold (punct handled
    // downstream by the fingerprint's [^a-z0-9] collapse)
    assert(r(1L)._1 == "Resume, Cafe — nino!")
    assert(r(4L)._1 == "plain ascii text stays put") // ASCII fast path
    assert(r(5L) == ((null, null)))
    // all three renderings collapse onto ONE folded fingerprint...
    assert(r(1L)._2 == r(2L)._2 && r(2L)._2 == r(3L)._2)
    // ...which the plain content fingerprint provably misses
    val plain = docs.filter(col("doc_id") <= 3)
      .select(TextAnalysis.fingerprint(col("text"))).as[String]
      .collect().toSet
    assert(plain.size == 3)
    assert(r == cols(codegen = false)) // interpreted ≡ generated
  }

  test("compressionRatio: repetitive < prose < noise; codegen = interpreted") {
    val rnd = new scala.util.Random(5)
    val docs = Seq(
      (1L, "the " * 500),                                    // boilerplate
      (2L, Seq.fill(120)(Seq("alpha", "bridge", "copper", "delta", "ember",
        "forest", "granite", "harbor")(rnd.nextInt(8))).mkString(" ")),
      (3L, Seq.fill(2000)(('a' + rnd.nextInt(26)).toChar).mkString), // noise
      (4L, ""), (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    def ratios(codegen: Boolean): Map[Long, Double] = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try docs.select(col("doc_id"),
          TextAnalysis.compressionRatio(col("text")).as("r"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      finally spark.conf.set("spark.sql.codegen.wholeStage", true)
    }
    val r = ratios(codegen = true)
    assert(r(1L) < r(2L) && r(2L) < r(3L), s"monotonicity broke: $r")
    assert(r(1L) < 0.1 && r(3L) > 0.5, s"tails off: $r")
    assert(r(4L) == 0.0 && r(5L) == 0.0)
    assert(r == ratios(codegen = false))
    // determinism across evaluations (fresh Deflater state per row)
    assert(r == ratios(codegen = true))
  }

  test("bigramLmScoresAgainst: unseen bigrams take the smoothing floor") {
    // train: c2(a,b)=2, c2(b,a)=1; c1(a)=2, c1(b)=1; V = 2 ({a, b})
    val train = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val score = Seq(
      (10L, "a b"),   // seen:        ln((2+1)/(2+2))
      (11L, "a z"),   // unseen pair: ln((0+1)/(2+2))
      (12L, "z q"))   // unseen head: ln((0+1)/(0+2))
      .toDF("doc_id", "text")
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = TextAnalysis.bigramLmScoresAgainst(train, score,
      "doc_id", col("text"))
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(10L) == ((1L, r4(math.log(3.0 / 4)))))
    assert(got(11L) == ((1L, r4(math.log(1.0 / 4)))))
    assert(got(12L) == ((1L, r4(math.log(1.0 / 2)))))
    // the self-scored form still matches its historical inner-join math
    val self = TextAnalysis.bigramLmScores(train, "doc_id", col("text"))
      .as[(Long, Long, Double)].collect()
    assert(self.toSeq == Seq((1L, 3L,
      r4((2 * math.log(3.0 / 4) + math.log(2.0 / 3)) / 3))))
  }

  test("keywordTag: multiplicity counted, minHits gate, multi-topic docs") {
    val docs = Seq(
      (1L, "join join merge sort"),      // joins=3, ordering=1
      (2L, "sort sort ORDER window"),    // ordering=4 (case-folded)
      (3L, "join sort scan"),            // 1 hit each — below every gate
      (4L, "")).toDF("doc_id", "text")
    val topics = Seq(
      "joins" -> Seq("join", "merge", "hash"),
      "ordering" -> Seq("sort", "order", "window"))
    val got = TextAnalysis.keywordTag(docs, "doc_id", col("text"),
        topics, minHits = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((1L, "joins", 3L), (2L, "ordering", 4L)))
    // minHits=1: doc 3 tags BOTH topics; empty doc tags none
    val loose = TextAnalysis.keywordTag(docs, "doc_id", col("text"),
        topics, minHits = 1)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(loose.count(_._1 == 3L) == 2)
    assert(!loose.exists(_._1 == 4L))
  }

  test("ictPairs: middle-third query, context covers the rest exactly") {
    val docs = Seq(
      (1L, "a b c d e f g h i"),      // n=9: query d e f, context a b c g h i
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"), // n=10: a=4, b=6
      (3L, "too short here")).toDF("doc_id", "text")
    val got = TextAnalysis.ictPairs(docs, "doc_id", col("text"),
        minTokens = 9)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getString(3)))).toMap
    assert(got(1L) == ((9L, "d e f", "a b c g h i")))
    assert(got(2L) == ((10L, "w4 w5 w6", "w1 w2 w3 w7 w8 w9 w10")))
    assert(!got.contains(3L))
    // reconstruction invariant: query ++ context is a permutation-free
    // re-partition of the token stream (counts match)
    got.values.foreach { case (n, q, c) =>
      assert(q.split(" ").length + c.split(" ").length == n)
    }
  }

  test("perplexityBuckets: per-language terciles, >= edges, short docs drop") {
    val rows = Seq(
      (1L, "en", "a b a b a b a b"),
      (2L, "en", "a b a b c d"),
      (3L, "en", "c d c d e f"),
      (4L, "en", "e f g h i j"),
      (5L, "en", "g h i j k l"),
      (6L, "en", "k l m n o p"),
      (7L, "fr", "u v u v u v"),
      (8L, "fr", "u v w x"),
      (9L, "fr", "w x y z q r"),
      (10L, "en", "solo"))
    val docs = rows.toDF("doc_id", "lang", "text")
    val out = TextAnalysis.perplexityBuckets(docs, docs, "doc_id",
        col("text"), col("lang"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(4)))).toMap
    assert(!out.contains(10L), "a 1-token doc has no bigrams and must drop")
    assert(out.size == 9)
    // replay the bucketing from the LM scores (themselves spec'd above)
    val scores = TextAnalysis.bigramLmScores(docs, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val langOf = rows.map(t => t._1 -> t._2).toMap
    def pct(xs: Seq[Double], p: Double): Double = {
      val s = xs.sorted
      val h = (s.size - 1) * p
      val i = h.toInt
      val v = if (i + 1 < s.size) s(i) + (h - i) * (s(i + 1) - s(i)) else s(i)
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    Seq("en", "fr").foreach { lang =>
      val ids = out.keys.filter(langOf(_) == lang).toSeq
      val xs = ids.map(scores)
      val lo = pct(xs, 1.0 / 3)
      val hi = pct(xs, 2.0 / 3)
      ids.foreach { id =>
        val want = if (scores(id) >= hi) "head"
          else if (scores(id) >= lo) "middle" else "tail"
        assert(out(id) == ((lang, want)), s"doc $id: ${out(id)} != $want")
      }
    }
    // the en stratum is big enough that all three buckets must appear
    assert(out.collect { case (_, ("en", b)) => b }.toSet ==
      Set("head", "middle", "tail"))
  }
}
