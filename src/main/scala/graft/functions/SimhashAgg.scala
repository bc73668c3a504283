package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * 64-bit SimHash vote aggregation as a typed `Aggregator`: the buffer is
 * ONE `long[64]` of signed vote counts, updated imperatively per token
 * hash — replacing the previous 64 separate `sum(when(...))` aggregate
 * columns, whose constant factor (64 expression evaluations per exploded
 * token, a 64-column-wide aggregation buffer) dominated Battery q25.
 *
 * `reduce` takes the token's xxhash64 and adds ±1 per bit; `finish`
 * packs `votes(b) > 0` into the final long. Exact at any document
 * length (a packed-lane alternative would overflow 16-bit lanes past
 * 65k tokens), order-independent, mergeable (map-side combine), bounded
 * state — the same contract [[KmvSketch]] establishes for typed
 * aggregates in this library.
 */
case class SimhashVotes(bits: Int = 64)
    extends Aggregator[Long, Array[Long], Long] {
  require(bits > 0 && bits <= 64, s"bits must be in (0, 64], got $bits")

  override def zero: Array[Long] = new Array[Long](bits)

  override def reduce(b: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < bits) {
      b(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bits) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Long = {
    var out = 0L
    var i = 0
    while (i < bits) {
      if (b(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object SimhashVotes {
  /** Column aggregate: `simhashBits(xxhash64(token))`. */
  val simhashBits: Column => Column = {
    val fn = udaf(SimhashVotes())
    (c: Column) => fn(c)
  }

  /** Width-parameterized variant — e.g. 60 bits when the token hash is a
    * portable 15-hex-char md5 prefix the oracle battery can replay. */
  def simhashBitsN(bits: Int): Column => Column = {
    val fn = udaf(SimhashVotes(bits))
    (c: Column) => fn(c)
  }
}
