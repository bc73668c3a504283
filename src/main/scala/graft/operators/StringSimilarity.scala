package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * String similarity under EDIT distance — the record-linkage /
 * fuzzy-matching sibling of [[Dedup]]'s set-similarity family (near-dup
 * titles, OCR'd identifiers, typo'd entity names in a training corpus).
 *
 * Self-join shape is the POSITIONAL q-gram prefix-filtered pipeline of
 * the Ed-Join line of work (Gravano et al. positional q-gram filtering;
 * Xiao et al. Ed-Join — public knowledge), sharing the q40 machinery's
 * plan shape:
 *
 *  1. positional q-gram occurrences `(gram, pos)` per string, grams
 *     hashed to longs. One edit operation rewrites at most `q`
 *     occurrences and shifts the rest by ≤ the number of
 *     insertions/deletions so far, so strings within distance `d` match
 *     all but `q·d` of their occurrences onto equal grams at positions
 *     differing by ≤ `d` (Gravano's positional count filter);
 *  2. global gram-frequency ordering + per-string rank window → the
 *     PREFIX side keeps only its `q·d + 1` RAREST occurrences
 *     (pigeonhole: at most `q·d` of them can be unmatched, so at least
 *     one prefix occurrence has a positional match in the other
 *     string). Joining prefix(a) against the FULL positional index of b
 *     with `|pos_a − pos_b| ≤ d` keeps the lemma one-sided and simple —
 *     and the position band is the filter with teeth on identifier-like
 *     corpora where the same rare gram recurs at many offsets;
 *  3. length filter `|len(a) − len(b)| ≤ d` on the candidates;
 *  4. exact verify with Spark's codegen'd `levenshtein(l, r, threshold)`
 *     — the threshold form abandons a DP row once it exceeds `d`
 *     (O(d·len) per pair instead of O(len²)).
 *
 * The pigeonhole guarantee needs at least `q·d + 1` gram occurrences on
 * ONE side of each pair (d edits destroy at most `q·d`); a pair of
 * strings BOTH shorter than `q·(d+1)` can share zero grams at distance
 * ≤ d ("ab"/"ac", q=2, d=1). Those shorts go through a separate
 * length-banded candidate pass (emit `len .. len+d` keys on one side,
 * equi-join on the band key) — no padding sentinels, so no silent
 * collision with sentinel characters occurring in real data.
 *
 * 100 TB shape: one explode + one hash-agg for frequencies, one window
 * over per-string gram lists (strings are short — the window partition
 * is tiny), one equi-join on rare gram hashes whose fan-out is bounded
 * by gram selectivity within a ±d position band, and a verify that
 * never touches more than the candidate pairs. No O(n²) stage; the
 * oracle replays the full quadratic join at test SF to prove the filter
 * lossless.
 */
object StringSimilarity {

  /** Positional hashed q-grams of `s` as `array<struct<g,p>>`; strings
    * shorter than `q` contribute themselves as their single gram. */
  private def posGramHashes(s: Column, q: Int): Column =
    transform(
      sequence(lit(1), greatest(length(s) - (q - 1), lit(1))),
      i => struct(xxhash64(s.substr(i, lit(q))).as("g"), i.as("p")))

  /**
   * All pairs within edit distance `maxDist`, as `(id_a, id_b, dist)`
   * with `id_a < id_b`.
   *
   * @param q q-gram width (2-3 for short identifier-like strings; larger
   *          q sharpens rare-gram selectivity on longer text)
   */
  def editDistanceJoin(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, q: Int = 2): DataFrame = {
    require(maxDist >= 0 && q >= 1, s"need maxDist>=0, q>=1")
    val prefixLen = q * maxDist + 1
    val base = PersistTracker.trackPersist(df.select(
      col(idCol).as("__sid"), col(strCol).as("__s"),
      length(col(strCol)).as("__len")))
    val inv = PersistTracker.trackPersist(base
      .select(col("__sid"), col("__len"),
        explode(posGramHashes(col("__s"), q)).as("__gp"))
      .select(col("__sid"), col("__len"),
        col("__gp.g").as("__g"), col("__gp.p").as("__p")))
    val dfreq = inv.groupBy("__g").agg(count(lit(1)).as("__df"))
    val prefix = inv.join(dfreq, Seq("__g"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy("__sid").orderBy(col("__df"), col("__g"), col("__p"))))
      .filter(col("__rk") <= prefixLen)
      .select(col("__sid"), col("__len"), col("__g"), col("__p"))
    val a = prefix.select(col("__sid").as("__ida"), col("__len").as("__la"),
      col("__g"), col("__p").as("__pa"))
    val b = inv.select(col("__sid").as("__idb"), col("__len").as("__lb"),
      col("__g"), col("__p").as("__pb"))
    val gramCands = a.join(b, Seq("__g"))
      .filter(col("__ida") =!= col("__idb"))
      .filter(abs(col("__pa") - col("__pb")) <= maxDist)
      .filter(abs(col("__la") - col("__lb")) <= maxDist)
      .select(least(col("__ida"), col("__idb")).as("id_a"),
        greatest(col("__ida"), col("__idb")).as("id_b"))
    // pairs where BOTH sides have ≤ q·d gram occurrences escape the
    // pigeonhole — length-banded equi-join over that (short) slice
    val shorts = base.filter(col("__len") <= q * (maxDist + 1) - 1)
    val shortCands = shorts
      .select(col("__sid").as("__ida"), col("__len").as("__key"))
      .join(shorts.select(col("__sid").as("__idb"),
          explode(sequence(col("__len"), col("__len") + maxDist))
            .as("__key")),
        Seq("__key"))
      .filter(col("__ida") =!= col("__idb"))
      .select(least(col("__ida"), col("__idb")).as("id_a"),
        greatest(col("__ida"), col("__idb")).as("id_b"))
    val lev = levenshtein(col("__sa"), col("__sb"), maxDist)
    gramCands.unionByName(shortCands)
      .dropDuplicates("id_a", "id_b")
      .join(base.select(col("__sid").as("id_a"), col("__s").as("__sa")), "id_a")
      .join(base.select(col("__sid").as("id_b"), col("__s").as("__sb")), "id_b")
      // threshold form: -1 once the DP exceeds maxDist — O(d·len)/pair
      .withColumn("dist", lev)
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
