package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * First/second-moment sums of an embedding column as ONE typed
 * aggregate: buffer = `[n, Σx_0..Σx_{d−1}, Σx_i·x_j (upper triangle,
 * row-major i ≤ j)]` — `1 + d + d(d+1)/2` doubles of bounded state per
 * partition, merged associatively. The covariance/correlation/whitening
 * consumers derive everything from these sums
 * (`cov = (Σxy − Σx·Σy/n)/(n−1)`), so the corpus is scanned ONCE with
 * map-side combine and the shuffle is `partitions × buffer` doubles —
 * never a `dim²`-row explode of the corpus (the naive pair-explode
 * shape costs `rows·d²` exchanged rows; at 100 TB that is the whole
 * job).
 *
 * Order-independence caveat: float summation order varies with
 * partitioning, so round derived statistics before cross-engine
 * comparison (the battery's standing 4-dp device).
 */
case class MomentSums(dim: Int)
    extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
  require(dim > 0 && dim <= 1024, s"dim must be in (0, 1024], got $dim")
  private val tri = dim * (dim + 1) / 2

  override def zero: Array[Double] = new Array[Double](1 + dim + tri)

  override def reduce(b: Array[Double], v: Seq[Double]): Array[Double] = {
    require(v.length == dim, s"vector length ${v.length} != dim $dim")
    b(0) += 1.0
    var i = 0
    while (i < dim) { b(1 + i) += v(i); i += 1 }
    var k = 1 + dim
    i = 0
    while (i < dim) {
      val xi = v(i)
      var j = i
      while (j < dim) { b(k) += xi * v(j); j += 1; k += 1 }
      i += 1
    }
    b
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Double]): Seq[Double] = b.toSeq

  override def bufferEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}

object MomentSums {
  /** Column aggregate; cast the column to `array<double>` (exact for
    * float embeddings) so both raw and whitened frames feed it. */
  def momentSums(dim: Int): Column => Column = {
    val f = udaf(MomentSums(dim))
    (c: Column) => f(c)
  }
}
