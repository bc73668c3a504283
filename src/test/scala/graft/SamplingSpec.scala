package graft

import graft.operators.{Sampling, TextAnalysis}
import org.apache.spark.sql.functions._

/** Deterministic splits/samples and the PII redaction pass. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = (1L to 2000L).toDF("id")

  test("assignSplit is deterministic and near the requested fractions") {
    val a = Sampling.assignSplit(ids, col("id"), "s1")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    val b = Sampling.assignSplit(ids, col("id"), "s1")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(a == b, "same salt must reproduce the assignment")
    assert(a.values.sum == 2000L)
    // 80/10/10 within a loose binomial tolerance at n=2000
    assert(math.abs(a("train") - 1600L) < 100, s"train=${a("train")}")
    assert(math.abs(a("val") - 200L) < 60, s"val=${a("val")}")
    assert(math.abs(a("test") - 200L) < 60, s"test=${a("test")}")
  }

  test("different salts give independent assignments") {
    val a = Sampling.assignSplit(ids, col("id"), "s1")
    val b = Sampling.assignSplit(ids, col("id"), "s2")
      .withColumnRenamed("split", "split2")
    val moved = a.join(b, "id").filter(col("split") =!= col("split2")).count()
    assert(moved > 0, "a new salt must be a fresh assignment")
  }

  test("deterministicSample nests: 1% subset of 10% at the same salt") {
    val one = Sampling.deterministicSample(ids, col("id"), 0.01, "s1")
      .as[Long].collect().toSet
    val ten = Sampling.deterministicSample(ids, col("id"), 0.10, "s1")
      .as[Long].collect().toSet
    assert(one.subsetOf(ten))
    assert(one.size < ten.size && ten.size < 2000)
  }

  test("balanceMixture: smallest group fully kept, big groups shrink") {
    val df = ((1L to 1000L).map(i => (i, "big")) ++
      (2001L to 2100L).map(i => (i, "small"))).toDF("id", "src")
    val kept = Sampling.balanceMixture(df, col("src"), col("id"), "m1")
    val bySrc = kept.groupBy("src").count()
      .as[(String, Long)].collect().toMap
    // smallest group's cutoff is exactly Buckets → every row kept
    assert(bySrc("small") == 100L)
    // big group lands around 100 (binomial, p = 0.1, n = 1000)
    assert(bySrc("big") > 60 && bySrc("big") < 140, s"big=${bySrc("big")}")
    // deterministic: the kept SET reproduces exactly
    val again = Sampling.balanceMixture(df, col("src"), col("id"), "m1")
      .select("id").as[Long].collect().toSet
    assert(again == kept.select("id").as[Long].collect().toSet)
  }

  test("redactPii replaces emails and phones, counts match") {
    val df = Seq(
      (1L, "reach me at jane.doe+x@sub.example.co.uk today"),
      (2L, "call (555) 010-1234 or +1 555-010-9999 now"),
      (3L, "no pii here, just 1234567890 digits and an @ sign"))
      .toDF("id", "text")
    val (e, p) = TextAnalysis.piiCounts(col("text"))
    val out = df.select(col("id"),
      TextAnalysis.redactPii(col("text")).as("red"),
      e.as("ne"), p.as("np"))
      .as[(Long, String, Int, Int)].collect().sortBy(_._1)
    assert(out(0)._2 == "reach me at <EMAIL> today")
    assert(out(0)._3 == 1 && out(0)._4 == 0)
    assert(out(1)._2 == "call <PHONE> or <PHONE> now")
    assert(out(1)._3 == 0 && out(1)._4 == 2)
    assert(out(2)._2 == "no pii here, just 1234567890 digits and an @ sign",
      "text without pii must pass through unchanged (bare digit runs " +
        "and lone @ signs are not matches)")
    assert(out(2)._3 == 0 && out(2)._4 == 0)
  }
}
