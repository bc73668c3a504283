package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * WordPiece subword tokenizer — the THIRD tokenizer family beside
 * [[Bpe]] (bottom-up merges) and [[UnigramLm]] (top-down EM): a
 * position-aware vocabulary (word-initial pieces vs "##" continuation
 * pieces) consumed by greedy longest-match-first encoding (public
 * algorithm: Wu et al. 2016; the BERT tokenizer, Devlin et al. 2018).
 *
 * Vocabulary selection here is the deterministic FREQUENCY scheme (all
 * single characters for coverage + the most frequent multi-char
 * substrings, counted separately per position form) — the
 * likelihood-driven selection of the original trainer is a different
 * public algorithm; the operator of interest at corpus scale is the
 * ENCODE, which is exactly BERT's. Greedy matching needs no score
 * quantization at all: given the vocab sets the segmentation is a
 * deterministic function of the word, and at most one vocab entry can
 * match a given (position, length) — so the oracle replays
 * "longest piece matching here" with no tie-breaks.
 *
 * Scale shape (the [[Bpe]] contract): candidate counting is one double
 * explode over word TYPES + one groupBy(piece, form); the model is two
 * driver-bounded string sets (alphabet + vocabSize pieces); encoding
 * runs once per word type through
 * [[graft.functions.WordPieceEncodeExpr]] and documents join the
 * per-type results (encode-once/join-many).
 */
object WordPiece {

  /** The trained model: word-initial and continuation piece sets
    * (continuation pieces stored WITHOUT the "##" prefix; the encoder
    * adds it on output). */
  case class WpModel(initial: Set[String], cont: Set[String],
      maxPieceLen: Int)

  /** Candidate substring counts per position form: `(p, init, cnt)`
    * where `init` marks word-initial occurrences — BERT's "abc" and
    * "##abc" are distinct vocabulary entries with separate counts. */
  def candidateCounts(words: DataFrame, maxPieceLen: Int): DataFrame =
    words
      .select(col("word"), col("freq"),
        explode(sequence(lit(1), length(col("word")))).as("__i"))
      .select(col("word"), col("freq"), col("__i"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), length(col("word")) - col("__i") + 1)))
          .as("__l"))
      .select(expr("substring(word, __i, __l)").as("p"),
        (col("__i") === 1).as("init"), col("freq"))
      .groupBy("p", "init").agg(sum("freq").as("cnt"))

  /**
   * Train: ALL single characters in both observed forms (coverage — a
   * corpus word can then never hit [UNK]) plus the `vocabSize` most
   * frequent multi-char candidates over both forms pooled, ties
   * (cnt DESC, piece ASC, initial-form first). Driver state: the two
   * bounded piece sets.
   */
  def trainWordPiece(words: DataFrame, maxPieceLen: Int = 4,
      vocabSize: Int = 48): WpModel = {
    require(vocabSize > 0 && vocabSize <= 1000000,
      s"vocabSize bounds the driver model, got $vocabSize")
    val cand = PersistTracker.trackPersist(
      candidateCounts(words, maxPieceLen))
    val singles = cand.filter(length(col("p")) === 1)
      .select("p", "init").collect()
    val multis = cand.filter(length(col("p")) > 1)
      .orderBy(col("cnt").desc, col("p"),
        col("init").cast("int").desc)
      .limit(vocabSize).select("p", "init").collect()
    val all = (singles ++ multis).map(r => r.getString(0) -> r.getBoolean(1))
    WpModel(
      all.collect { case (p, true) => p }.toSet,
      all.collect { case (p, false) => p }.toSet,
      maxPieceLen)
  }

  /** Greedy-encode every word type: `(word, freq, pieces array)` —
    * continuation pieces carry the "##" prefix; an uncoverable word is
    * the single piece "[UNK]". One interpreted pass at type grain. */
  def encodeWords(words: DataFrame, model: WpModel): DataFrame =
    words.select(col("word"), col("freq"),
      graft.functions.UnigramExpressions.wordPieceEncode(
        col("word"), model.initial, model.cont, model.maxPieceLen)
        .as("pieces"))

  /** Freq-weighted corpus usage per emitted piece: `(piece, cnt)`. */
  def pieceStats(words: DataFrame, model: WpModel): DataFrame =
    encodeWords(words, model)
      .select(col("freq"), explode(col("pieces")).as("piece"))
      .groupBy("piece").agg(sum("freq").as("cnt"))
}
