package graft

import graft.operators.{Retrieval, Sampling}
import org.apache.spark.sql.functions._

/** Physical-plan shape guards for the round-6 operators: the scale
  * claims in their scaladocs (broadcasts, TakeOrdered, shuffle-free
  * filters) asserted against the actual executed plan, so a future
  * refactor that silently degrades the plan fails a spec, not a
  * production run. */
class PlanShapeSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 200L)
    .map(i => (i, s"tok$i alpha beta gamma delta", Seq("en", "de")((i % 2).toInt)))
    .toDF("doc_id", "text", "lang")

  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // run once so AQE finalizes the plan it actually used
    df.queryExecution.executedPlan.toString
  }

  test("bm25 serving: query terms, df slice, and stats all broadcast") {
    val queries = Seq((1L, "alpha tok7")).toDF("query_id", "query_text")
    val p = plan(Retrieval.bm25TopK(docs, queries, k = 3))
    val broadcasts = "BroadcastExchange".r.findAllIn(p).size
    assert(broadcasts >= 3, s"expected >=3 broadcasts, got $broadcasts:\n$p")
    graft.operators.Dedup.releasePersisted()
  }

  test("epoch-order prefix is distributed TakeOrdered, not a window") {
    val df = docs.select(lit(1).as("epoch"), col("doc_id"),
        Sampling.epochKey(col("doc_id"), 1, "s").as("shuffle_key"))
      .orderBy(col("shuffle_key"), col("doc_id")).limit(5)
    val p = plan(df)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Window"), s"global window crept in:\n$p")
  }

  test("deterministic sampling filters add no shuffle") {
    for (df <- Seq(
      Sampling.weightedSample(docs, col("doc_id"), lit(0.5), "w"),
      Sampling.stratifiedSample(docs, col("lang"), col("doc_id"),
        Map("en" -> 0.5), "st"),
      Sampling.deterministicSample(docs, col("doc_id"), 0.5, "d"))) {
      val p = plan(df)
      assert(!p.contains("Exchange"), s"sampling filter shuffled:\n$p")
    }
  }

  test("percentileGate: cutoffs broadcast back onto a narrow filter") {
    val p = plan(Sampling.percentileGate(docs, col("lang"),
      length(col("text")), 0.5))
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), s"cutoff join shuffled the corpus:\n$p")
  }

  test("budgetMixture keep-filter is shuffle-free; DSIR model broadcasts") {
    val src = docs.withColumn("src",
      concat(lit("s"), pmod(col("doc_id"), lit(2))))
    val kept = Sampling.budgetMixture(src, col("src"), col("doc_id"),
      size(split(col("text"), " ")), Map("s0" -> 1L, "s1" -> 1L),
      budget = 200L, salt = "b")
    val p = plan(kept)
    assert(!p.contains("Exchange"), s"budget keep-filter shuffled:\n$p")

    val model = graft.operators.Classify.trainDsir(
      docs.filter(col("lang") === "en"), docs, col("text"))
    val ps = plan(graft.operators.Classify.dsirScores(
      model, docs, "doc_id", col("text")))
    assert(ps.contains("BroadcastExchange"),
      s"log-ratio model must broadcast:\n$ps")
    assert(!ps.contains("SortMergeJoin"),
      s"bucket join shuffled the corpus:\n$ps")
  }
}
