package graft

import graft.operators.WordPiece
import graft.operators.WordPiece.WpModel
import org.apache.spark.sql.functions._

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def encode(word: String, m: WpModel): Seq[String] =
    WordPiece.encodeWords(Seq((word, 1L)).toDF("word", "freq"), m)
      .collect().head.getSeq[String](2).toSeq

  test("greedy longest-match-first with ## continuation (BERT semantics)") {
    val m = WpModel(
      initial = Set("u", "un", "und", "a", "w", "wa"),
      cont = Set("n", "d", "able", "a", "b", "l", "e", "nt"),
      maxPieceLen = 4)
    // "und" wins over "un"+"d" at the start; "able" is one continuation
    assert(encode("undable", m) == Seq("und", "##able"))
    // after the initial piece, matching uses ONLY the continuation set:
    // "want": "wa" + ##"nt" (longest cont match beats "n"+"t"... "t"
    // is not even in cont, so nt is required)
    assert(encode("want", m) == Seq("wa", "##nt"))
  }

  test("whole-word [UNK] when any position is uncoverable") {
    val m = WpModel(initial = Set("x"), cont = Set("y"), maxPieceLen = 4)
    assert(encode("xy", m) == Seq("x", "##y"))
    // 'z' uncoverable mid-word → the WHOLE word collapses to [UNK]
    assert(encode("xzy", m) == Seq("[UNK]"))
    // uncoverable at the start too
    assert(encode("zxy", m) == Seq("[UNK]"))
  }

  test("trained vocab guarantees coverage; stats reconcile with corpus mass") {
    val docs = Seq((0L, "spark spark streaming stream table"),
      (1L, "spark table stream")).toDF("doc_id", "text")
    val words = graft.operators.Bpe.wordTypes(docs, col("text"))
    val m = WordPiece.trainWordPiece(words, maxPieceLen = 4, vocabSize = 8)
    val stats = WordPiece.pieceStats(words, m).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // no [UNK] anywhere: every corpus char is a single in both forms
    assert(!stats.contains("[UNK]"))
    // freq-weighted piece chars reconcile to total corpus chars
    val totalChars = words.select(sum(length(col("word")) * col("freq")))
      .head.getLong(0)
    val pieceChars = stats.map { case (p, c) =>
      (if (p.startsWith("##")) p.length - 2 else p.length).toLong * c
    }.sum
    assert(pieceChars == totalChars)
  }

  test("training is partition-invariant (deterministic vocab tie-break)") {
    val docs = (0L until 100L)
      .map(i => (i, s"alpha beta gamma delta${i % 7} epsilon"))
      .toDF("doc_id", "text")
    def stats(parts: Int) = {
      val words = graft.operators.Bpe.wordTypes(
        docs.repartition(parts), col("text"))
      val m = WordPiece.trainWordPiece(words, maxPieceLen = 4,
        vocabSize = 16)
      WordPiece.pieceStats(words, m).collect()
        .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    }
    assert(stats(1) == stats(9))
  }
}
