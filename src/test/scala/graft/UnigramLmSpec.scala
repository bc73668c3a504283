package graft

import graft.operators.UnigramLm
import graft.operators.UnigramLm.UnigramModel
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer: hand-computed scores and segmentations, the
  * integer-tie-break contract, and structural invariants (concatenation,
  * vocab closure, partition invariance). */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private def q20(x: Double): Long =
    math.floor(x * 1048576 + 0.5).toLong

  test("hand-computed candidates, scores and hard-EM re-scores") {
    // words: "ab" (freq 2), "b" (freq 1); maxPieceLen 2
    // candidates: a→2, b→2+1=3, ab→2; T0 = 7
    val words = Seq(("ab", 2L), ("b", 1L)).toDF("word", "freq")
    val cand = UnigramLm.candidateCounts(words, 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cand == Map("a" -> 2L, "b" -> 3L, "ab" -> 2L))
    val m0 = UnigramLm.initialModel(words, 2, vocabSize = 8)
    assert(m0.pieces == Map(
      "a" -> q20(math.log(2.0 / 7)),
      "b" -> q20(math.log(3.0 / 7)),
      "ab" -> q20(math.log(2.0 / 7))))
    // viterbi "ab": [ab] = s(ab) beats [a][b] = s(a)+s(b) (more mass
    // in one piece); "b" → [b]
    val seg0 = UnigramLm.segmentWords(words, m0)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(seg0("ab") == Seq("ab") && seg0("b") == Seq("b"))
    // hard-EM: counts ab→2, b→1; T1 = 3, |V| = 3, Laplace (c+1)/(T1+3)
    val m1 = UnigramLm.emRound(words, m0)
    assert(m1.pieces == Map(
      "a" -> q20(math.log(1.0 / 6)),
      "b" -> q20(math.log(2.0 / 6)),
      "ab" -> q20(math.log(3.0 / 6))))
    val stats = UnigramLm.pieceStats(words, m1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(stats == Set(
      ("ab", 2L, q20(math.log(3.0 / 6))),
      ("b", 1L, q20(math.log(2.0 / 6)))))
  }

  test("exact integer ties break to the smallest split (longest piece)") {
    // s(aa) = 2·s(a) exactly → [aa] ties [a][a]; canonical rule keeps
    // the longest last piece. A float DP could not even represent this
    // tie reliably — the integer quantization is what makes it exact.
    val m = UnigramModel(Map("a" -> -10L, "aa" -> -20L), 2)
    val seg = UnigramLm.segmentWords(
        Seq(("aa", 1L)).toDF("word", "freq"), m)
      .collect().head.getSeq[String](2)
    assert(seg == Seq("aa"))
    // and when the single char is strictly better, it splits
    val m2 = UnigramModel(Map("a" -> -10L, "aa" -> -21L), 2)
    val seg2 = UnigramLm.segmentWords(
        Seq(("aa", 1L)).toDF("word", "freq"), m2)
      .collect().head.getSeq[String](2)
    assert(seg2 == Seq("a", "a"))
  }

  test("invariants on a generated corpus; partition invariance") {
    val rnd = new scala.util.Random(13)
    val alphabet = "abcde"
    val words = (0 until 200).map { i =>
      val len = 1 + rnd.nextInt(8)
      (Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString,
        (1 + i % 7).toLong)
    }.distinct.toDF("word", "freq")
    val model = UnigramLm.trainUnigram(words, maxPieceLen = 4,
      vocabSize = 16, rounds = 1)
    val segs = UnigramLm.segmentWords(words, model)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2))
    // segmentation concatenates back to the word; pieces are in-vocab
    segs.foreach { case (w, ps) =>
      assert(ps.mkString == w, s"$w segmented to $ps")
      ps.foreach(p => assert(model.pieces.contains(p), s"piece $p"))
    }
    val model13 = UnigramLm.trainUnigram(words.repartition(13),
      maxPieceLen = 4, vocabSize = 16, rounds = 1)
    // counts are exact integers → the trained model is identical
    assert(model13.pieces == model.pieces)
  }
}
