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

object UnigramExpressions {
  def unigramSegment(word: Column, pieces: Map[String, Long],
      maxPieceLen: Int, unkScore: Long = -100L << 20): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.of(
      UnigramSegmentExpr(
        org.apache.spark.sql.graftbridge.ColumnBridge.expr(word),
        pieces, maxPieceLen, unkScore))
}
