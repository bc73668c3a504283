package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BloomExpressions

/**
 * Bloom-pruned join: build a Bloom filter over the build side's join key,
 * filter the probe side with it BEFORE the join's shuffle, then join.
 *
 * This is the classic runtime-filter / sideways-information-passing
 * optimization (Spark itself applies it opportunistically under
 * `spark.sql.optimizer.runtime.bloomFilter.enabled`; this operator makes
 * it explicit and composable). Semantics are exactly the plain inner
 * join — a Bloom filter has no false negatives, so every joining probe row
 * survives the prune; false positives only ride along to the join where
 * the equality condition drops them.
 *
 * 100 TB shape: the filter build is one pass over the build side
 * (distributed `treeAggregate` under `DataFrameStatFunctions.bloomFilter`,
 * merged on the driver — ~7 MB at 10M keys / 3% fpp), and the probe-side
 * prune runs at scan speed inside whole-stage codegen before the join
 * exchange. When the build side is selective (a filtered dimension), the
 * probe shuffle shrinks by the join selectivity — on a 100 TB fact scan
 * that is the difference between shuffling 100 TB and shuffling the
 * matching percent. `maxKeys` guards the driver: a build side too big to
 * bloom cheaply falls back to the plain join (at which point the join
 * itself should be broadcast or bucketed instead).
 */
object BloomJoin {

  /**
   * Inner-join `probe ⋈ build` on `probeKey = buildKey` (both BIGINT),
   * with the probe side pre-pruned by a Bloom filter of the build keys.
   *
   * @param expectedKeys sizing hint for the filter (distinct build keys)
   * @param fpp          false-positive rate (cost-only, never correctness)
   * @param maxKeys      guard: if the build side exceeds this many rows the
   *                     prune is skipped (plain join, same result)
   */
  def prunedInnerJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      expectedKeys: Long = 1L << 20, fpp: Double = 0.03,
      maxKeys: Long = 50L * 1000 * 1000): DataFrame = {
    val pruned = prune(probe, build, col(probeKey), buildKey,
      expectedKeys, fpp, maxKeys)
    pruned.join(build, pruned(probeKey) === build(buildKey))
  }

  /**
   * Just the prune: `probe` rows whose `probeKey` might be in `build`'s
   * `buildKey` set. A superset of the joinable rows (never drops a match).
   */
  def prune(probe: DataFrame, build: DataFrame, probeKey: Column,
      buildKey: String, expectedKeys: Long = 1L << 20, fpp: Double = 0.03,
      maxKeys: Long = 50L * 1000 * 1000): DataFrame = {
    // the cap rides through limit(Int): beyond that a bloom of the build
    // side is the wrong tool anyway (bucket or broadcast the join)
    require(maxKeys > 0 && maxKeys < Int.MaxValue,
      s"maxKeys in [1, ${Int.MaxValue - 1}], got $maxKeys")
    // bounded check, not count(): one extra row beyond the cap suffices
    val tooBig = build.select(buildKey).limit((maxKeys + 1).toInt)
      .count() > maxKeys
    if (tooBig) probe
    else {
      val bloom = build.stat.bloomFilter(buildKey, expectedKeys, fpp)
      probe.filter(
        BloomExpressions.mightContainLong(probeKey,
          BloomExpressions.serialize(bloom)))
    }
  }
}
