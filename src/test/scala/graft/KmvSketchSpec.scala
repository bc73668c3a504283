package graft

import graft.functions.KmvSketch
import org.apache.spark.sql.functions._

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("exact below k, within ~10% above k, deterministic") {
    val df = (1 to 50000).map(i => i % 7919).toDF("v")
      .withColumn("h", xxhash64($"v"))

    // small cardinality (< k): exact
    val smallDf = (1 to 1000).map(i => i % 37).toDF("v")
      .withColumn("h", xxhash64($"v"))
    val small = smallDf.agg(KmvSketch.kmvDistinct(256)($"h")).as[Double].head()
    assert(small == 37.0)

    // large cardinality (7919 distinct, k=256): estimate within 10%
    val est = df.agg(KmvSketch.kmvDistinct(256)($"h")).as[Double].head()
    assert(math.abs(est - 7919) / 7919 < 0.10, s"estimate $est")

    // deterministic across runs
    val est2 = df.agg(KmvSketch.kmvDistinct(256)($"h")).as[Double].head()
    assert(est == est2)
  }

  test("grouped sketches merge map-side") {
    val df = (1 to 20000)
      .map(i => (if (i % 2 == 0) "a" else "b", i % ((i % 2) * 400 + 100)))
      .toDF("g", "v")
      .withColumn("h", xxhash64($"v"))
    val got = df.repartition(8).groupBy("g")
      .agg(KmvSketch.kmvDistinct(512)($"h").as("est"))
      .as[(String, Double)].collect().toMap
    val exactA = df.filter($"g" === "a").select("v").distinct().count()
    val exactB = df.filter($"g" === "b").select("v").distinct().count()
    assert(got("a") == exactA.toDouble) // under k → exact
    assert(got("b") == exactB.toDouble)
  }
}
