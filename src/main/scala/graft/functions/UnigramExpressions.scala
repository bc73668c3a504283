package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Viterbi word segmentation against a unigram-LM piece vocabulary
 * ([[graft.operators.UnigramLm]]) — max-sum DP over INTEGER-quantized
 * log-probabilities.
 *
 * Integer scores are the load-bearing design choice: piece scores are
 * `floor(ln(c/T)·2²⁰ + 0.5)` longs, so every path score is an exact
 * integer sum — two segmentations using the same piece multiset in a
 * different order tie EXACTLY (a float DP accumulates left-to-right
 * and ties only up to summation order, which flips the argmax between
 * engines), and the deterministic tie-break (smallest split point,
 * i.e. the longest last piece) replays bit-for-bit in SQL. Unknown
 * characters (not even a single-char piece) fall back to themselves at
 * `unkScore`, keeping the DP total.
 *
 * CodegenFallback deliberately: this runs at word-TYPE grain (the
 * [[graft.operators.Bpe]] device — vocabulary-sized, not corpus-sized
 * input), so interpreted eval is off the hot path; the vocabulary map
 * rides in the expression references like the LSH plane matrices.
 */
case class UnigramSegmentExpr(child: Expression,
    pieces: Map[String, Long], maxPieceLen: Int, unkScore: Long)
    extends UnaryExpression with CodegenFallback {
  require(maxPieceLen >= 1, s"maxPieceLen >= 1, got $maxPieceLen")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_unigram_segment"

  override protected def nullSafeEval(input: Any): Any = {
    val word = input.asInstanceOf[UTF8String].toString
    val n = word.length
    if (n == 0) return new GenericArrayData(Array.empty[AnyRef])
    val best = new Array[Long](n + 1)
    val bp = new Array[Int](n + 1)
    java.util.Arrays.fill(best, Long.MinValue)
    best(0) = 0L
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (best(j) != Long.MinValue) {
          val piece = word.substring(j, i)
          val s = pieces.get(piece) match {
            case Some(v) => v
            case None if i - j == 1 => unkScore // unknown single char
            case None => Long.MinValue
          }
          if (s != Long.MinValue) {
            val cand = best(j) + s
            // strict > with ascending j keeps the SMALLEST j on ties
            // (= longest last piece) — the canonical rule the oracle
            // replays with (score DESC, j ASC)
            if (cand > best(i)) { best(i) = cand; bp(i) = j }
          }
        }
        j += 1
      }
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var pos = n
    while (pos > 0) {
      val j = bp(pos)
      out.prepend(UTF8String.fromString(word.substring(j, pos)))
      pos = j
    }
    new GenericArrayData(out.toArray[AnyRef])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * WordPiece greedy longest-match-first word encoding (public
 * algorithm: Wu et al. 2016 "Google's Neural Machine Translation
 * System"; the BERT tokenizer of Devlin et al. 2018): at each
 * position take the LONGEST vocabulary piece matching the remaining
 * suffix — word-initial positions match the initial vocabulary,
 * later positions the continuation vocabulary (emitted with the
 * "##" prefix) — and a word with any unmatched position becomes the
 * single piece "[UNK]" (whole-word UNK, the BERT rule).
 *
 * No scores, no DP: greedy longest-match is deterministic given the
 * vocab sets, so cross-engine exactness needs no quantization —
 * an oracle replays "longest piece matching here" verbatim. At most
 * one vocab entry can match a given (position, length), so there are
 * no ties to break. CodegenFallback for the same reason as
 * [[UnigramSegmentExpr]]: runs at word-TYPE grain, off the corpus
 * hot path.
 */
case class WordPieceEncodeExpr(child: Expression,
    initial: Set[String], cont: Set[String], maxPieceLen: Int)
    extends UnaryExpression with CodegenFallback {
  require(maxPieceLen >= 1, s"maxPieceLen >= 1, got $maxPieceLen")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_wordpiece_encode"

  private val Unk = UTF8String.fromString("[UNK]")

  override protected def nullSafeEval(input: Any): Any = {
    val word = input.asInstanceOf[UTF8String].toString
    val n = word.length
    if (n == 0) return new GenericArrayData(Array.empty[AnyRef])
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var pos = 0
    while (pos < n) {
      val vocab = if (pos == 0) initial else cont
      var l = math.min(maxPieceLen, n - pos)
      var found = -1
      while (l >= 1 && found < 0) {
        if (vocab.contains(word.substring(pos, pos + l))) found = l
        else l -= 1
      }
      if (found < 0)
        return new GenericArrayData(Array[AnyRef](Unk))
      val piece = word.substring(pos, pos + found)
      out += UTF8String.fromString(
        if (pos == 0) piece else "##" + piece)
      pos += found
    }
    new GenericArrayData(out.toArray[AnyRef])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnigramExpressions {
  def unigramSegment(word: Column, pieces: Map[String, Long],
      maxPieceLen: Int, unkScore: Long = -100L << 20): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.of(
      UnigramSegmentExpr(
        org.apache.spark.sql.graftbridge.ColumnBridge.expr(word),
        pieces, maxPieceLen, unkScore))

  def wordPieceEncode(word: Column, initial: Set[String],
      cont: Set[String], maxPieceLen: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.of(
      WordPieceEncodeExpr(
        org.apache.spark.sql.graftbridge.ColumnBridge.expr(word),
        initial, cont, maxPieceLen))
}
