package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * MinHash signature aggregation as a typed `Aggregator`: the buffer is
 * ONE `long[k]` of running minima, updated imperatively per shingle
 * hash. The hash family is double hashing (Kirsch & Mitzenmacher,
 * "Less Hashing, Same Performance" — public knowledge):
 * `g_i = h1 + i * h2`, with h1 the incoming xxhash64 and h2 a splitmix64
 * finalizer of it — so each row costs one mixer plus k multiply-adds in
 * plain JVM arithmetic (wrapping, which Catalyst's ANSI `+`/`*` would
 * reject), replacing the previous k separate `min(xxhash64(h, i))`
 * aggregate columns that re-hashed every exploded row k times.
 * Deterministic, mergeable (map-side combine), bounded state.
 */
case class MinHashSig(numHashes: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(b: Array[Long], h1: Long): Array[Long] = {
    val h2 = MinHashSig.mix64(h1)
    var g = h1
    var i = 0
    while (i < numHashes) {
      if (g < b(i)) b(i) = g
      g += h2 // g = h1 + (i+1) * h2, wrapping
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

/**
 * Engine-portable variant of [[MinHashSig]]: the caller supplies TWO
 * independent 60-bit hashes per shingle (e.g. two md5 slices) and the
 * family is `g_i = (h1 + i·h2) mod 2^60` — arithmetic another engine can
 * replay exactly (DuckDB: HUGEINT multiply + modulo), which makes whole
 * signatures externally verifiable (battery q42). [[MinHashSig]] stays
 * the production path (one xxhash64 input, splitmix-derived h2).
 */
case class MinHashSigPortable(numHashes: Int)
    extends Aggregator[(Long, Long), Array[Long], Array[Long]] {

  private val Mask60 = (1L << 60) - 1

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(b: Array[Long], h: (Long, Long)): Array[Long] = {
    var g = h._1 & Mask60
    val h2 = h._2 & Mask60
    var i = 0
    while (i < numHashes) {
      if (g < b(i)) b(i) = g
      // ((h1 + i*h2) masked each step) == (h1 + i*h2) mod 2^60: both
      // operands stay < 2^60, so the long addition never wraps
      g = (g + h2) & Mask60
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

object MinHashSig {

  /** Column aggregate over two 60-bit hash columns:
    * `minhashSigPortable(k)(h1, h2)` → array<bigint>. */
  def minhashSigPortable(k: Int): (Column, Column) => Column = {
    val fn = udaf(MinHashSigPortable(k))
    (h1: Column, h2: Column) => fn(h1, h2)
  }

  /** splitmix64 finalizer (public domain; Steele et al.) — decorrelates
    * h2 from h1 so the double-hash family behaves like k independent
    * hashes. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Column aggregate: `minhashSig(k)(xxhash64(shingle))` → array<bigint>. */
  def minhashSig(k: Int): Column => Column = {
    val fn = udaf(MinHashSig(k))
    (c: Column) => fn(c)
  }
}
