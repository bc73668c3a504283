package graft

import graft.functions.BloomExpressions
import graft.operators.BloomJoin
import org.apache.spark.sql.functions._

/** Bloom-pruned join: exact inner-join semantics, real pruning, guards. */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val probe = (1L to 5000L).map(i => (i, i % 97)).toDF("k", "v")
  // 1% of the probe key space joins
  private lazy val build = (1L to 5000L by 100).map(i => (i, s"d$i"))
    .toDF("bk", "name")

  test("prunedInnerJoin equals the plain inner join") {
    val pruned = BloomJoin.prunedInnerJoin(probe, build, "k", "bk",
      expectedKeys = 64)
      .select("k", "v", "bk", "name")
    val plain = probe.join(build, probe("k") === build("bk"))
      .select("k", "v", "bk", "name")
    assert(pruned.collect().toSet == plain.collect().toSet)
    assert(pruned.count() == 50)
  }

  test("prune keeps every joinable row and drops most others") {
    val kept = BloomJoin.prune(probe, build, col("k"), "bk",
      expectedKeys = 64, fpp = 0.01)
    val keptKeys = kept.select("k").as[Long].collect().toSet
    val buildKeys = build.select("bk").as[Long].collect().toSet
    assert(buildKeys.subsetOf(keptKeys), "a bloom prune must never drop a match")
    // at fpp=1% over 4950 non-matching keys, ~50 false positives expected;
    // 10x headroom keeps the assertion robust to hash luck
    assert(keptKeys.size < 50 + 500,
      s"prune kept ${keptKeys.size} of 5000 — not selective")
  }

  test("null probe keys: prune and plain join agree (both drop)") {
    val withNull = probe.withColumn("k",
      when(col("k") === 3L, lit(null).cast("long")).otherwise(col("k")))
    val pruned = BloomJoin.prunedInnerJoin(withNull, build, "k", "bk",
      expectedKeys = 64).count()
    val plain = withNull.join(build, withNull("k") === build("bk")).count()
    assert(pruned == plain)
  }

  test("oversized build side skips the prune (plain-join fallback)") {
    val kept = BloomJoin.prune(probe, build, col("k"), "bk", maxKeys = 10)
    assert(kept.count() == probe.count(), "guard must return the probe unpruned")
  }

  test("expression survives codegen and interpreted paths identically") {
    val bloom = build.stat.bloomFilter("bk", 64, 0.01)
    val bytes = BloomExpressions.serialize(bloom)
    val viaFilter = probe
      .filter(BloomExpressions.mightContainLong(col("k"), bytes))
      .count()
    // force interpreted evaluation through a non-codegen context: collect
    // the predicate as a projected column instead of a filter
    val viaProject = probe
      .select(col("k"),
        BloomExpressions.mightContainLong(col("k"), bytes).as("hit"))
      .filter(col("hit")).count()
    assert(viaFilter == viaProject)
  }
}
