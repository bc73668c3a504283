package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Unigram-LM subword tokenizer (Kudo 2018, "Subword Regularization" —
 * the SentencePiece unigram model, public knowledge), trained by
 * hard-EM over word TYPES: substring candidates are scored by corpus
 * log-frequency, words are Viterbi-segmented against the current
 * scores, and scores re-estimate from the segmentation counts — the
 * second tokenizer family next to [[Bpe]]'s merge-based one (BPE grows
 * pieces bottom-up; unigram starts from a superset vocabulary and
 * lets EM concentrate mass on the useful pieces).
 *
 * Exactness design (what makes this oracle-replayable when float
 * Viterbi is not): piece scores are INTEGER-quantized log-probs,
 * `floor(ln(c/T)·2²⁰ + 0.5)` longs, so DP path scores are exact
 * integer sums — same-multiset segmentations tie exactly instead of
 * up to float summation order, and the (score DESC, split ASC)
 * tie-break replays in SQL ([[graft.functions.UnigramSegmentExpr]]).
 * Re-estimated scores are Laplace-smoothed over the FIXED initial
 * vocabulary (`(c+1)/(T+|V|)`), so coverage never develops holes
 * between rounds (full SentencePiece prunes the vocab per round; the
 * fixed-vocab hard-EM variant keeps every step closed-form).
 *
 * Scale shape (the [[Bpe]] contract): every corpus-scale step runs at
 * word-TYPE grain — candidate explode + one groupBy(piece), Viterbi
 * as one interpreted pass over types (vocabulary-sized input, off the
 * corpus hot path), count re-estimation as one explode + groupBy. The
 * MODEL is the only driver state, bounded by construction
 * (`vocabSize` multi-char pieces + the alphabet — a production
 * SentencePiece model is a few MB and broadcasts the same way).
 * Encoding a corpus afterwards is a broadcast-model projection at
 * document grain, exactly [[Bpe.encodeDocs]]'s shape.
 */
object UnigramLm {

  /** The trained model: piece → integer-quantized log-prob. */
  case class UnigramModel(pieces: Map[String, Long], maxPieceLen: Int)

  private val Q = 1048576.0 // 2^20 — see the exactness note above

  private def scoreInt(num: Double, den: Double): Long =
    math.floor(math.log(num / den) * Q + 0.5).toLong

  /** Candidate piece occurrence counts, weighted by word frequency:
    * one narrow double-explode over word types + one groupBy(piece). */
  def candidateCounts(words: DataFrame, maxPieceLen: Int): DataFrame =
    words
      .select(col("word"), col("freq"),
        explode(sequence(lit(1), length(col("word")))).as("__i"))
      .select(col("word"), col("freq"), col("__i"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), length(col("word")) - col("__i") + 1)))
          .as("__l"))
      .select(expr("substring(word, __i, __l)").as("p"), col("freq"))
      .groupBy("p").agg(sum("freq").as("cnt"))

  /**
   * Initial model: ALL single characters (coverage guarantee) plus the
   * `vocabSize` most frequent multi-char candidates (ties → lexical),
   * scored `floor(ln(cnt/T)·2²⁰+0.5)` against the TOTAL candidate
   * occurrence mass T. Driver state: the model map (bounded).
   */
  def initialModel(words: DataFrame, maxPieceLen: Int = 4,
      vocabSize: Int = 48): UnigramModel = {
    require(vocabSize > 0 && vocabSize <= 1000000,
      s"vocabSize bounds the driver model, got $vocabSize")
    val cand = PersistTracker.trackPersist(
      candidateCounts(words, maxPieceLen))
    val t0 = cand.agg(sum("cnt")).collect().head.getLong(0)
    val singles = cand.filter(length(col("p")) === 1)
    val multis = cand.filter(length(col("p")) > 1)
      .orderBy(col("cnt").desc, col("p")).limit(vocabSize)
    val voc = singles.unionByName(multis).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    UnigramModel(
      voc.map { case (p, c) =>
        p -> scoreInt(c.toDouble, t0.toDouble)
      }.toMap,
      maxPieceLen)
  }

  /** Viterbi-segment every word type against the model: `(word, freq,
    * pieces array)`. One interpreted pass at type grain. */
  def segmentWords(words: DataFrame, model: UnigramModel): DataFrame =
    words.select(col("word"), col("freq"),
      graft.functions.UnigramExpressions.unigramSegment(
        col("word"), model.pieces, model.maxPieceLen).as("pieces"))

  /** One hard-EM round: segment → piece counts (freq-weighted) →
    * Laplace-smoothed re-scores over the SAME vocabulary. */
  def emRound(words: DataFrame, model: UnigramModel): UnigramModel = {
    val counts = segmentWords(words, model)
      .select(col("freq"), explode(col("pieces")).as("p"))
      .groupBy("p").agg(sum("freq").as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val t1 = counts.valuesIterator.sum
    val nv = model.pieces.size
    UnigramModel(
      model.pieces.map { case (p, _) =>
        p -> scoreInt(counts.getOrElse(p, 0L) + 1.0, (t1 + nv).toDouble)
      },
      model.maxPieceLen)
  }

  /** Train: initial scores, then `rounds` hard-EM refinements. */
  def trainUnigram(words: DataFrame, maxPieceLen: Int = 4,
      vocabSize: Int = 48, rounds: Int = 1): UnigramModel = {
    require(rounds >= 0 && rounds <= 16, s"rounds in [0,16], got $rounds")
    var m = initialModel(words, maxPieceLen, vocabSize)
    var r = 0
    while (r < rounds) { m = emRound(words, m); r += 1 }
    m
  }

  /** Final per-piece usage stats under the trained model: `(piece,
    * cnt, score)` for pieces the segmentation actually uses. */
  def pieceStats(words: DataFrame, model: UnigramModel): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val scores = model.pieces.toSeq.toDF("p", "score")
    segmentWords(words, model)
      .select(col("freq"), explode(col("pieces")).as("p"))
      .groupBy("p").agg(sum("freq").as("cnt"))
      .join(broadcast(scores), Seq("p"))
      .select(col("p").as("piece"), col("cnt"), col("score"))
  }
}
