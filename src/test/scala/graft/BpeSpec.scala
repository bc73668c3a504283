package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** BPE tokenizer training: the guarded double-replace merge semantics
  * against hand-traced strings, full training vs an independent driver-
  * side reference on the classic subword corpus, document costing, and
  * early exhaustion. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ----- independent reference implementation (JVM strings; Java
  // String.replace shares the left-to-right non-overlapping contract) --

  private def refTrain(freqs: Map[String, Long], rounds: Int)
      : (Seq[(Int, String, String, Long)], Map[String, String]) = {
    var types: Map[String, (String, Long)] = freqs.map { case (w, f) =>
      w -> (w.toCharArray.mkString(" "), f)
    }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val counts = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      for ((_, (sym, f)) <- types;
           w <- sym.split(" ").sliding(2) if w.length == 2)
        counts(s"${w(0)} ${w(1)}") += f
      if (counts.isEmpty) done = true
      else {
        val (pair, cnt) = counts.toSeq.minBy { case (p, c) => (-c, p) }
        val merged = pair.replace(" ", "")
        out += ((r, pair, merged, cnt))
        types = types.map { case (w, (sym, f)) =>
          val g = (" " + sym + " ")
            .replace(s" $pair ", s" $merged ")
            .replace(s" $pair ", s" $merged ")
          w -> (g.trim, f)
        }
        r += 1
      }
    }
    (out.toSeq, types.map { case (w, (sym, _)) => w -> sym })
  }

  test("mergeOnce: double guarded replace on the adversarial shapes") {
    val cases = Seq(
      // odd run of the pair's own symbol: maximal non-overlapping set
      ("a a a a a", "a a", "aa a aa"),
      // alternating chain: pass 1 skips every other occurrence,
      // pass 2 merges the survivors
      ("x y x y", "x y", "xy xy"),
      ("a b a b a b", "a b", "ab ab ab"),
      // merge at the string ends
      ("l o w", "l o", "lo w"),
      ("l o w", "o w", "l ow"))
    for ((sym, pair, want) <- cases) {
      val got = Seq(sym).toDF("sym")
        .select(Bpe.mergeOnce(col("sym"), pair, pair.replace(" ", "")))
        .as[String].head()
      assert(got === want, s"merge '$pair' on '$sym'")
    }
  }

  test("training matches the driver-side reference on the classic corpus") {
    // Sennrich-style vocabulary: frequent suffixes drive the merges
    val freqs = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L, "a" -> 9L)
    val docs = freqs.toSeq.zipWithIndex.map { case ((w, f), i) =>
      (i.toLong, Seq.fill(f.toInt)(w).mkString(" "))
    }.toDF("doc_id", "text")
    val model = Bpe.trainBpe(Bpe.wordTypes(docs, col("text")), rounds = 10)
    val (wantMerges, wantSyms) = refTrain(freqs, rounds = 10)
    val gotMerges = model.merges.orderBy("merge_round")
      .as[(Int, String, String, Long)].collect().toSeq
    assert(gotMerges === wantMerges)
    // "est" must have formed from the 9 est-occurrences
    assert(gotMerges.map(_._3).contains("est"))
    val gotSyms = model.types.select("word", "sym")
      .as[(String, String)].collect().toMap
    assert(gotSyms === wantSyms)
  }

  test("driver and distributed strategies agree") {
    val docs = Seq((1L, "low low low newest newest widest lower a a a"))
      .toDF("doc_id", "text")
    val wt = Bpe.wordTypes(docs, col("text"))
    val drv = Bpe.trainBpe(wt, rounds = 6)
    val dist = Bpe.trainBpe(wt, rounds = 6, maxDriverVocab = 0L)
    assert(drv.merges.orderBy("merge_round")
      .as[(Int, String, String, Long)].collect().toSeq
      === dist.merges.orderBy("merge_round")
      .as[(Int, String, String, Long)].collect().toSeq)
    assert(drv.types.select("word", "sym").as[(String, String)]
      .collect().toMap
      === dist.types.select("word", "sym").as[(String, String)]
      .collect().toMap)
  }

  test("document costing: vocab lengths, unseen-word char fallback") {
    val docs = Seq((1L, "low low newest"), (2L, "lower widest"))
      .toDF("doc_id", "text")
    val model = Bpe.trainBpe(Bpe.wordTypes(docs, col("text")), rounds = 4)
    val lens = Bpe.tokenLengths(model)
      .as[(String, Int)].collect().toMap
    val got = Bpe.bpeTokenCounts(model,
      Seq((1L, "low low newest"), (2L, "lower widest"),
        (3L, "unseenword")).toDF("doc_id", "text"),
      "doc_id", col("text"))
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(got(0) === ((1L, 3L, lens("low") * 2L + lens("newest"))))
    assert(got(1) === ((2L, 2L, lens("lower") + lens("widest"))))
    // novel word: character count (fully unmerged)
    assert(got(2) === ((3L, 1L, "unseenword".length.toLong)))
  }

  test("exhaustion: single-character vocabulary trains zero merges") {
    val docs = Seq((1L, "a b a c")).toDF("doc_id", "text")
    for (maxDriver <- Seq(200000L, 0L)) {
      val model = Bpe.trainBpe(Bpe.wordTypes(docs, col("text")),
        rounds = 5, maxDriverVocab = maxDriver)
      assert(model.merges.count() === 0)
      assert(model.types.select("sym").as[String].collect().toSet
        === Set("a", "b", "c"))
    }
  }

  test("encodeDocs: subword streams, dense ids, unseen-word fallback") {
    // types ab:2 cd:1; round 1 merges "a b"→"ab"; vocab {ab, c, d}
    val docs = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    val model = Bpe.trainBpe(Bpe.wordTypes(docs, col("text")), rounds = 1)
    val ids = Bpe.tokenIds(model)
      .as[(String, Long)].collect().toMap
    assert(ids === Map("ab" -> 0L, "c" -> 1L, "d" -> 2L))
    val enc = Bpe.encodeDocs(model, docs, "doc_id", col("text"))
      .orderBy("doc_id", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(enc.toSeq === Seq(
      (1L, 0L, "ab", 0L), (1L, 1L, "ab", 0L),
      (1L, 2L, "c", 1L), (1L, 3L, "d", 2L)))
    // word outside the training vocab → characters; "x"/"y" are not
    // subwords of the model, so ids are null
    val out = Bpe.encodeDocs(model,
        Seq((9L, "xy cd")).toDF("doc_id", "text"), "doc_id", col("text"))
      .orderBy("pos")
      .collect().map(r => (r.getLong(1), r.getString(2), r.isNullAt(3)))
    assert(out.toSeq === Seq((0L, "x", true), (1L, "y", true),
      (2L, "c", false), (3L, "d", false)))
  }

  test("packTokenStream: boundary cuts, order-exact hashes, key isolation") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    // hand-built stream: key k1 docs 1,2 with 4+3 tokens, capacity 5 →
    // seq 0 = doc1[0..3] + doc2[0], seq 1 = doc2[1..2]; key k2 isolated
    val enc = Seq(
      ("k1", 1L, 0L, 10L), ("k1", 1L, 1L, 11L), ("k1", 1L, 2L, 12L),
      ("k1", 1L, 3L, 13L),
      ("k1", 2L, 0L, 20L), ("k1", 2L, 1L, 21L), ("k1", 2L, 2L, 22L),
      ("k2", 3L, 0L, 30L))
      .map { case (k, d, p, t) => (k, d, p, t.toString, t) }
      .toDF("source", "doc_id", "pos", "token", "token_id")
    val got = Bpe.packTokenStream(enc, "source", "doc_id", capacity = 5)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getString(3))).toMap
    assert(got(("k1", 0L)) === ((5L, md5hex("10 11 12 13 20"))))
    assert(got(("k1", 1L)) === ((2L, md5hex("21 22"))))
    assert(got(("k2", 0L)) === ((1L, md5hex("30"))))
    assert(got.size === 3)
    // null token ids hash as -1
    val n = Bpe.packTokenStream(
      Seq(("k", 1L, 0L, "t", null.asInstanceOf[java.lang.Long]))
        .toDF("source", "doc_id", "pos", "token", "token_id"),
      "source", "doc_id", capacity = 5).collect()
    assert(n(0).getString(3) === md5hex("-1"))
  }
}
