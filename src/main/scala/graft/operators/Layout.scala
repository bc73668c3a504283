package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Storage-layout operators for multi-dimensional scan pruning — the
 * 100 TB lever that lives BELOW the query plan: parquet readers skip
 * whole files/row-groups from footer min/max statistics, but statistics
 * only prune when the layout makes them tight. A corpus sorted on one
 * column has every OTHER column's per-file range equal to the full
 * domain, so any filter off the sort key scans everything. Z-order
 * (Morton-order, public knowledge since Morton 1966; the same layout
 * device popularized by data-lake OPTIMIZE/ZORDER implementations)
 * interleaves the bits of the clustering columns' quantized values, so
 * files that are contiguous in key order cover small axis-aligned boxes
 * of the multi-dimensional space — EVERY clustered column's per-file
 * range tightens to ~domain/side, and a box predicate touches the few
 * files whose box intersects it.
 *
 * The key algebra is deliberately exact-integer end-to-end (global
 * min/max → `(x − mn)·(2^bits − 1) div (mx − mn)` → bit interleave of
 * the quantized ranks) so the whole derivation replays verbatim in an
 * oracle; everything is composed from built-in codegen'd bit
 * expressions — no UDF, no custom Expression needed. The LAYOUT action
 * ([[clusterByZOrder]]) is a range repartition on the key: boundaries
 * come from Spark's reservoir sampling, so file CONTENTS are
 * plan-stable but not byte-deterministic across runs — the key is the
 * oracled contract, the layout is the advisory action (the same split
 * as [[Sampling.shardPlan]]'s plan vs the files it drives).
 */
object Layout {

  /** Morton interleave of already-quantized non-negative values: bit i
    * of dimension d lands at position `i·D + d`. Bits are disjoint, so
    * the sum is a bitwise OR; all terms stay inside one whole-stage
    * codegen projection. Caller guarantees each `q` fits in `bits`
    * bits (the [[withZOrderKey]] quantization does). */
  def mortonKey(qs: Seq[Column], bits: Int): Column = {
    require(qs.nonEmpty, "mortonKey: need at least one dimension")
    require(bits >= 1 && qs.size * bits <= 62,
      s"mortonKey: ${qs.size} dims x $bits bits must fit a long")
    val d = qs.size
    val terms = for {
      (q, j) <- qs.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(q, i).bitwiseAND(lit(1L)), i * d + j)
    terms.reduce(_ + _)
  }

  /** Append the z-order key for `cols` (cast to long; timestamps etc.
    * should be pre-projected to integers by the caller, e.g.
    * `unix_micros(col("ts"))`): one tiny global min/max aggregate per
    * call sizes the quantization grid, then the key is a single narrow
    * codegen projection. A constant column quantizes to 0 (it carries
    * no pruning information). */
  def withZOrderKey(df: DataFrame, cols: Seq[Column], bits: Int = 16,
      keyCol: String = "__zkey"): DataFrame = {
    require(cols.nonEmpty, "withZOrderKey: need at least one column")
    val longs = cols.map(_.cast("long"))
    // min/max for every dim in ONE tiny aggregate
    val aggCols = longs.zipWithIndex.flatMap { case (c, j) =>
      Seq(min(c).as(s"mn$j"), max(c).as(s"mx$j"))
    }
    val row = df.agg(aggCols.head, aggCols.tail: _*).head()
    val k = (1L << bits) - 1
    // exact integer quantization onto [0, 2^bits): the numerator stays
    // under 2^63 for per-column ranges up to ~1.4e14 per unit of k, and
    // integer `div` (Spark) agrees with `//` (DuckDB) because every
    // operand is non-negative — the oracle replays the formula verbatim.
    // `div` has no Column-API method, so the numerator is materialized
    // as a named column and divided via expr (still one codegen
    // projection).
    var cur = df
    val qs = longs.zipWithIndex.map { case (c, j) =>
      val mn = if (row.isNullAt(2 * j)) 0L else row.getLong(2 * j)
      val mx = if (row.isNullAt(2 * j + 1)) 0L else row.getLong(2 * j + 1)
      if (mx == mn) lit(0L)
      else {
        cur = cur.withColumn(s"__zn$j", (c - lit(mn)) * lit(k))
        expr(s"__zn$j div ${mx - mn}")
      }
    }
    cur.withColumn(keyCol, mortonKey(qs, bits))
      .drop(longs.indices.map(j => s"__zn$j"): _*)
  }

  /** Cluster the frame for writing: range-repartition on the z-key into
    * `numFiles` output splits and sort inside each, so every written
    * file covers one contiguous z-range = one small box of the
    * clustered space. Write the result straight out (each partition
    * becomes one file); statistics-based skipping then prunes files on
    * ANY clustered column's predicate, not just a leading sort key. */
  def clusterByZOrder(df: DataFrame, cols: Seq[Column], numFiles: Int,
      bits: Int = 16): DataFrame = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val keyed = withZOrderKey(df, cols, bits)
    keyed.repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
  }
}
