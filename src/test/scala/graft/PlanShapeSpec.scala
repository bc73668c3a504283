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

  test("keywordTag is a shuffle-free scalar map over the scan") {
    val p = plan(graft.operators.TextAnalysis.keywordTag(
      docs, "doc_id", col("text"),
      Seq("t" -> Seq("alpha", "beta"), "u" -> Seq("gamma"))))
    assert(!p.contains("Exchange"), s"tagging shuffled:\n$p")
  }

  test("bagFingerprint dedup adds exactly the one fingerprint shuffle") {
    // AQE's toString repeats the plan under "== Initial Plan ==" — count
    // exchanges in the FINAL section only
    val df = graft.operators.Dedup.exactDedup(docs,
      graft.operators.TextAnalysis.bagFingerprint(col("text")),
      col("doc_id"))
    val p = plan(df).split("== Initial Plan ==").head
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 1, s"expected exactly 1 hash shuffle, got $shuffles:\n$p")
  }

  test("mergeIndex: tf side is a union of the cached sides, no join above") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Union}
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    val base = Retrieval.buildIndex(docs.filter($"doc_id" <= 100))
    val merged = Retrieval.mergeIndex(base, docs.filter($"doc_id" > 100))
    // the per-side tf BUILD legitimately joins (tf ⋈ dl) inside its cached
    // plan; the MERGE itself must add only a Union above the cache leaves
    def aboveCache(p: LogicalPlan): Seq[LogicalPlan] = p match {
      case _: InMemoryRelation => Nil
      case other => other +: other.children.flatMap(aboveCache)
    }
    val nodes = aboveCache(merged.tf.queryExecution.optimizedPlan)
    assert(nodes.exists(_.isInstanceOf[Union]),
      s"tf merge must be a union:\n${merged.tf.queryExecution.optimizedPlan}")
    assert(!nodes.exists(_.isInstanceOf[Join]),
      s"tf merge joined above the cached sides:\n${merged.tf.queryExecution.optimizedPlan}")
    graft.operators.Dedup.releasePersisted()
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

  test("shardPlan and exactQuantiles use no single-partition exchange or global window") {
    val p1 = plan(Sampling.shardPlan(docs, "doc_id",
      size(split(col("text"), " ")), budget = 40L, numParts = 4))
    assert(!p1.contains("Exchange SinglePartition"),
      s"shardPlan serialized through one partition:\n$p1")
    val p2 = plan(Sampling.exactQuantiles(
      docs.withColumn("v", col("doc_id") % 17), col("v"),
      Seq(0.5, 0.9), numParts = 4))
    assert(!p2.contains("Exchange SinglePartition"),
      s"exactQuantiles serialized through one partition:\n$p2")
    // quantile targets must broadcast onto the cumulative frame
    assert(p2.contains("BroadcastNestedLoopJoin") ||
      p2.contains("BroadcastExchange"),
      s"target ranks should broadcast:\n$p2")
    graft.operators.Dedup.releasePersisted()
  }

  test("pageRank iterations: contributions aggregate with map-side combine, no global window") {
    import graft.operators.GraphOps
    val edges = (1L to 100L).map(i => (i, (i * 7) % 100 + 1))
      .toDF("src", "dst")
    val nodes = (1L to 100L).toDF("id")
    val p = plan(GraphOps.pageRank(edges, nodes, "id", iters = 2))
    assert(!p.contains("Window"), s"global window crept in:\n$p")
    // the only SinglePartition exchanges allowed are 1-row scalar
    // count aggregates (the broadcast node-count stats frame) — never
    // a data-sized serialization
    val singles = "Exchange SinglePartition".r.findAllIn(p).size
    val scalarCounts = "partial_count\\(1\\)".r.findAllIn(p).size
    assert(singles <= scalarCounts,
      s"non-scalar single-partition exchange:\n$p")
    // partial aggregation before the dst shuffle (map-side combine)
    assert(p.contains("partial_sum"),
      s"expected map-side combined contribution sums:\n$p")
    graft.operators.Dedup.releasePersisted()
  }
}
