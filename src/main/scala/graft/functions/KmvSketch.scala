package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * K-Minimum-Values distinct sketch as a typed `Aggregator` — the
 * user-facing typed-aggregate surface (SURVEY.md §2.9's
 * `Aggregator[IN, BUF, OUT]` slot). KMV keeps the k smallest 64-bit
 * hashes seen; when fewer than k values arrived the count is exact,
 * otherwise the estimate is (k-1) / fraction-of-hash-space covered by
 * the k-th minimum. Deterministic (no RNG), mergeable (map-side
 * combine), bounded state (k longs) — usable in batch and streaming
 * aggregations alike, and the kept hashes double as a uniform sample of
 * the distinct values.
 *
 * Input is the already-hashed value (`xxhash64(col)`), so the sketch
 * composes with any column type.
 */
case class KmvSketch(k: Int,
    hashLo: Double = Long.MinValue.toDouble,
    hashHi: Double = Long.MaxValue.toDouble)
    extends Aggregator[Long, KmvSketch.Buf, Double] {
  import KmvSketch.Buf

  override def zero: Buf = Buf(Array.emptyLongArray)

  override def reduce(b: Buf, h: Long): Buf = b.add(h, k)

  override def merge(a: Buf, b: Buf): Buf = {
    val all = (a.mins ++ b.mins).distinct.sorted
    Buf(all.take(k))
  }

  override def finish(b: Buf): Double =
    if (b.mins.length < k) b.mins.length.toDouble
    else {
      // hashes ~ uniform over [hashLo, hashHi] — the bounds MUST match
      // the hash actually fed in (full signed range for xxhash64; pass
      // [0, 2^60) for the portable md5-prefix hash, or the k-th minimum
      // sits mid-range and the estimate pins near 2(k-1) regardless of
      // cardinality). The k-th minimum covers fraction f of the space →
      // estimate (k-1)/f.
      val kth = b.mins.last
      val frac = (kth.toDouble - hashLo) / (hashHi - hashLo)
      if (frac <= 0) b.mins.length.toDouble else (k - 1) / frac
    }

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object KmvSketch {

  /** Sorted k smallest distinct hashes seen so far. */
  final case class Buf(mins: Array[Long]) {
    def add(h: Long, k: Int): Buf =
      if (mins.length < k) {
        if (java.util.Arrays.binarySearch(mins, h) >= 0) this
        else {
          val next = mins :+ h
          java.util.Arrays.sort(next)
          Buf(next)
        }
      } else if (h >= mins(mins.length - 1) ||
          java.util.Arrays.binarySearch(mins, h) >= 0) this
      else {
        val next = mins.clone()
        next(next.length - 1) = h
        java.util.Arrays.sort(next)
        Buf(next)
      }
  }

  /** Column aggregate: `kmvDistinct(k)(xxhash64(col))`. Pass the hash
    * domain when the input hash is not full-range signed 64-bit (e.g.
    * `kmvDistinct(k, 0.0, math.pow(2, 60))` for the portable md5-prefix
    * hash the oracle battery uses). */
  def kmvDistinct(k: Int,
      hashLo: Double = Long.MinValue.toDouble,
      hashHi: Double = Long.MaxValue.toDouble): Column => Column = {
    val fn = udaf(KmvSketch(k, hashLo, hashHi))
    (c: Column) => fn(c)
  }
}
