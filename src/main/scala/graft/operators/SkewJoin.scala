package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Salted equi-join for skewed keys (SURVEY.md §4 scale notes; AQE's
 * skew-join split handles sort-merge joins, but salting is the general
 * fix when one key dominates a shuffle-hash join or the skew survives
 * AQE's thresholds).
 *
 * The big (skewed) side gets a deterministic salt in [0, saltFactor)
 * hashed from its row content; the small side is replicated once per salt
 * value. Joining on keys + salt spreads each hot key over `saltFactor`
 * reducers. Result set is identical to the unsalted join (verified by the
 * battery's DuckDB oracle, which replays it as a plain join).
 */
object SkewJoin {

  /**
   * @param big   skewed probe side (each row keeps its single salt)
   * @param small build side — replicated `saltFactor`× (keep it the
   *              smaller input)
   * @param keys  equi-join key columns present on both sides
   */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(saltFactor)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedBig.join(saltedSmall, keys :+ "__salt", joinType).drop("__salt")
  }
}
