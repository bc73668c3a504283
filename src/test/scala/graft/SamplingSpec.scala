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

  test("stratifiedSample applies per-key fractions; raising one only adds") {
    val rows = (1L to 3000L).map(i =>
      (i, Seq("a", "b", "c")((i % 3).toInt))).toDF("id", "k")
    val got = Sampling.stratifiedSample(rows, col("k"), col("id"),
      Map("a" -> 0.6, "b" -> 0.2), "st1", defaultFraction = 0.05)
      .groupBy("k").count().as[(String, Long)].collect().toMap
    assert(math.abs(got("a") - 600L) < 80, s"a=${got("a")}")
    assert(math.abs(got("b") - 200L) < 60, s"b=${got("b")}")
    assert(math.abs(got.getOrElse("c", 0L) - 50L) < 40, s"c=$got")
    // nesting per stratum: raising b's fraction keeps every old b row
    val before = Sampling.stratifiedSample(rows, col("k"), col("id"),
      Map("a" -> 0.6, "b" -> 0.2), "st1", 0.05)
      .select("id").as[Long].collect().toSet
    val after = Sampling.stratifiedSample(rows, col("k"), col("id"),
      Map("a" -> 0.6, "b" -> 0.5), "st1", 0.05)
      .select("id").as[Long].collect().toSet
    assert(before.subsetOf(after))
  }

  test("weightedSample: keep rate tracks the weight; monotone in weight") {
    val rows = (1L to 3000L).map(i => (i, if (i <= 1500) 0.2 else 0.8))
      .toDF("id", "w")
    val got = Sampling.weightedSample(rows, col("id"), col("w"), "w1")
    val byW = got.groupBy("w").count().as[(Double, Long)].collect().toMap
    assert(math.abs(byW(0.2) - 300L) < 70, s"low=${byW(0.2)}")
    assert(math.abs(byW(0.8) - 1200L) < 90, s"high=${byW(0.8)}")
    // weights outside [0,1] clamp instead of corrupting the cutoff
    val all = Sampling.weightedSample(rows, col("id"), lit(7.5), "w1").count()
    val none = Sampling.weightedSample(rows, col("id"), lit(-2.0), "w1").count()
    assert(all == 3000L && none == 0L)
    // monotone: every row kept at w survives at w' > w (same salt)
    val lo = Sampling.weightedSample(rows, col("id"), lit(0.3), "w1")
      .select("id").as[Long].collect().toSet
    val hi = Sampling.weightedSample(rows, col("id"), lit(0.7), "w1")
      .select("id").as[Long].collect().toSet
    assert(lo.subsetOf(hi))
  }

  test("percentileGate: per-key cutoffs, not one global threshold") {
    // key "a": scores 1..10 (p60 = 6.4 -> keep 7..10)
    // key "b": scores 101..110 (keep 107..110) — a global cutoff at the
    // corpus p60 would keep ALL of b and almost none of a
    val rows = ((1 to 10).map(i => ("a", i.toLong, i.toDouble)) ++
      (1 to 10).map(i => ("b", 100L + i, 100.0 + i)))
      .toDF("k", "id", "score")
    val got = Sampling.percentileGate(rows, col("k"), col("score"), 0.6)
      .select("id").as[Long].collect().toSet
    assert(got == Set(7L, 8L, 9L, 10L, 107L, 108L, 109L, 110L), s"got $got")
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

  test("budgetMixture: cutoffs track the weighted shares; clamp + water-fill") {
    // source a: 200 docs x 10 tokens = 2000; source b: 50 docs x 4 = 200
    val docs = ((1L to 200L).map(i => (i, "a", "t " * 10)) ++
      (201L to 250L).map(i => (i, "b", "t " * 4)) ++
      (251L to 260L).map(i => (i, "c", "t " * 3)))
      .toDF("id", "src", "text")
    val tok = TextAnalysis.tokenCount(col("text"))
    def keptTokens(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.groupBy("src").agg(sum(tok).cast("long").as("t"))
        .as[(String, Long)].collect().toMap
    // budget 1000 at a:b = 1:1 -> b's share (500) clamps to its 200;
    // without water-fill a keeps ~500, with water-fill a absorbs ~800
    val plain = keptTokens(Sampling.budgetMixture(docs, col("src"),
      col("id"), tok, Map("a" -> 1L, "b" -> 1L), 1000L, "s1"))
    assert(plain("b") === 200L, "saturated source must be fully kept")
    assert(math.abs(plain("a") - 500L) < 150, s"a=${plain("a")}")
    val filled = keptTokens(Sampling.budgetMixture(docs, col("src"),
      col("id"), tok, Map("a" -> 1L, "b" -> 1L), 1000L, "s1",
      waterFill = true))
    assert(filled("b") === 200L)
    assert(math.abs(filled("a") - 800L) < 150, s"a=${filled("a")}")
    assert(filled("a") > plain("a"),
      "water-fill must redistribute the saturated source's unused share")
    // unweighted keys drop; determinism across calls
    assert(!plain.contains("c"))
    val again = keptTokens(Sampling.budgetMixture(docs, col("src"),
      col("id"), tok, Map("a" -> 1L, "b" -> 1L), 1000L, "s1"))
    assert(again === plain)
  }

  test("diversitySelect: quota per cluster, least-prototypical first") {
    val dim = 8
    def vec(axis: Int, noise: Float): Seq[Float] =
      (0 until dim).map { i =>
        if (i == axis) 1.0f
        else if (i == (axis + 1) % dim) noise else 0.0f
      }
    // 4 planted axis clusters of 5 (the ClusteringSpec corpus): ids 0..3
    // seed one cluster each, later members get increasing off-axis noise
    // → strictly decreasing prototypicality within each cluster
    val corpus = (0 until 20).map { id =>
      (id.toLong, vec(id % 4, if (id < 4) 0.0f else 0.05f + 0.01f * (id / 4)))
    }.toDF("vec_id", "embedding")
    val kept = graft.operators.Sampling.diversitySelect(
        corpus, k = 4, iters = 2, quota = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
        r.getInt(3)))
    // quota binds: 3 of each 5-member cluster survive
    assert(kept.length == 12)
    assert(kept.groupBy(_._2).forall(_._2.length == 3))
    // replay the rank from the (separately spec'd) kmeans assignment:
    // kept = the quota lowest (cos, id) per cluster, rk in that order
    val assigned = graft.operators.Clustering.kmeans(corpus, 4, 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val want = assigned.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(t => (t._3, t._1)).take(3).zipWithIndex
        .map { case ((id, cl, cos), i) => (id, cl, cos, i + 1) }
    }.toSet
    assert(kept.toSet == want)
    // rank 1 is the cluster's cosine minimum: no kept row beats it
    kept.groupBy(_._2).foreach { case (_, rows) =>
      val r1 = rows.find(_._4 == 1).get
      assert(rows.forall(t =>
        t._3 > r1._3 || (t._3 == r1._3 && t._1 >= r1._1)))
    }
    // quota above cluster size keeps everything
    assert(graft.operators.Sampling.diversitySelect(
      corpus, k = 4, iters = 2, quota = 100).count() == 20)
  }

  test("splitLeakageAudit: unordered combos, leak flag, counts") {
    val pairs = Seq(
      (1L, 2L),   // train-train
      (3L, 4L),   // train-test  (leak)
      (4L, 3L),   // test-train  — must fold into the SAME combo row
      (5L, 6L),   // val-test    (leak)
      (7L, 8L)).toDF("id_a", "id_b")
    val assign = Seq(
      1L -> "train", 2L -> "train", 3L -> "train", 4L -> "test",
      5L -> "val", 6L -> "test", 7L -> "val", 8L -> "val")
      .toDF("doc_id", "split")
    val got = graft.operators.Sampling.splitLeakageAudit(pairs, assign)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(got == Map(
      ("train", "train") -> ((1L, false)),
      ("test", "train") -> ((2L, true)),   // both orientations folded
      ("test", "val") -> ((1L, true)),
      ("val", "val") -> ((1L, false))))
  }

  test("componentSplit: dup clusters never straddle a split boundary") {
    import graft.operators.Dedup
    // 60 docs, near-dup pairs chaining ids 3k..3k+2 into 20 components
    val nodes = (0L until 60L).toDF("doc_id")
    val pairs = (0L until 60L).filter(_ % 3 != 2)
      .map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs, nodes)
    val split = Sampling.componentSplit(cc, "component", "s1")
    // the leak-free property: one split per component, for every salt
    val perComp = split.groupBy("component")
      .agg(countDistinct("split").as("n")).filter(col("n") > 1).count()
    assert(perComp === 0L)
    // and it is not vacuous: a doc-level split DOES straddle some cluster
    val naive = Sampling.assignSplit(cc, col("doc_id"), "s1")
    val straddled = naive.groupBy("component")
      .agg(countDistinct("split").as("n")).filter(col("n") > 1).count()
    assert(straddled > 0L,
      "test corpus must contain a cluster the naive split breaks")
    // members inherit the component's assignment (spot-check equivalence)
    val viaComp = Sampling.assignSplit(
      cc.select(col("component").as("id")).distinct(), col("id"), "s1")
    val joined = split.join(viaComp, split("component") === viaComp("id"))
      .filter(split("split") =!= viaComp("split")).count()
    assert(joined === 0L)
  }

  test("shardPlan: offsets are the ordered prefix sums; partition-invariant") {
    val docs = (0L until 200L).map(i => (i, "w " * (i % 37 + 1).toInt))
      .toDF("doc_id", "text")
    val tc = graft.operators.TextAnalysis.tokenCount(col("text"))
    val plan = Sampling.shardPlan(docs, "doc_id", tc, budget = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    // reference: single global window over the same (key, id) order
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("__key"), col("doc_id"))
    val ref = docs.select(col("doc_id"), tc.cast("long").as("n"),
        Sampling.epochKey(col("doc_id"), 1, "shard").as("__key"))
      .withColumn("start", sum("n").over(w) - col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3),
        r.getLong(3) / 100L)).sortBy(_._1)
    assert(plan.toSeq == ref.toSeq)
    // invariance to input partitioning
    val plan7 = Sampling.shardPlan(docs.repartition(7), "doc_id", tc,
        budget = 100L, numParts = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    assert(plan7.toSeq == plan.toSeq)
  }

  test("shardManifest: contiguous shards, totals reconcile, budget overflow bounded by one doc") {
    val docs = (0L until 300L).map(i => (i, "tok " * (i % 23 + 1).toInt))
      .toDF("doc_id", "text")
    val tc = graft.operators.TextAnalysis.tokenCount(col("text"))
    val plan = Sampling.shardPlan(docs, "doc_id", tc, budget = 150L)
    val man = Sampling.shardManifest(plan).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1)
    // shard ids dense from 0
    assert(man.map(_._1).toSeq == (0L until man.length.toLong))
    // totals reconcile with the plan
    val total = plan.agg(sum("n_tokens")).head.getLong(0)
    assert(man.map(_._3).sum == total)
    // every shard starts within its budget window and overflows by at
    // most its final document (< max doc tokens = 23)
    man.foreach { case (sid, _, _, first, end) =>
      assert(first >= sid * 150L && first < (sid + 1) * 150L)
      assert(end <= (sid + 1) * 150L + 23L)
    }
    // offset ranges tile with no gaps: end of shard s = first of s+1
    man.sliding(2).foreach {
      case Array((_, _, _, _, e), (_, _, _, f2, _)) => assert(e == f2)
      case _ =>
    }
  }

  test("exactQuantiles: percentile_disc semantics vs sorted reference, with ties") {
    // heavy ties: values 1..10 each repeated i times → 55 rows
    val vals = (1 to 10).flatMap(i => Seq.fill(i)(i.toDouble))
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 1.0)
    val got = Sampling.exactQuantiles(df, col("v"), qs)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    val sorted = vals.sorted
    val want = qs.map { q =>
      val r = math.ceil(q * sorted.length).toLong
      (q, r, sorted(r.toInt - 1))
    }
    assert(got.toSeq == want)
  }

  test("groupQuantiles: per-key percentile_disc vs sorted references") {
    val df = (0L until 300L)
      .map(i => (i, if (i % 3 == 0) "a" else "b", (i * 13 % 47).toDouble))
      .toDF("id", "k", "v")
    val got = Sampling.groupQuantiles(df, col("k"), col("v"),
        Seq(0.5, 0.9))
      .collect().map(r => ((r.getString(0), r.getDouble(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    for (k <- Seq("a", "b"); q <- Seq(0.5, 0.9)) {
      val vals = (0L until 300L)
        .filter(i => (if (i % 3 == 0) "a" else "b") == k)
        .map(i => (i * 13 % 47).toDouble).sorted
      val r = math.ceil(q * vals.length).toLong
      assert(got((k, q)) == ((r, vals(r.toInt - 1))), s"($k, $q)")
    }
  }

  test("temperatureMixture: alpha=1 no-op, alpha=0 balances, smallest kept fully, alpha=0.5 between") {
    val df = ((0L until 800L).map(i => (i, "big")) ++
      (800L until 900L).map(i => (i, "small"))).toDF("id", "lang")
    def counts(alpha: Double) = Sampling
      .temperatureMixture(df, col("lang"), col("id"), alpha, "t1")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val a1 = counts(1.0)
    assert(a1 == Map("big" -> 800L, "small" -> 100L), s"alpha=1: $a1")
    val a0 = counts(0.0)
    assert(a0("small") == 100L)
    // alpha=0: big keeps at rate 100/800 = 12.5% -> ~100 docs
    assert(math.abs(a0("big") - 100L) < 30, s"alpha=0: $a0")
    val ah = counts(0.5)
    assert(ah("small") == 100L)
    // sqrt(1/8) ~ 35.4% of 800 ~ 283
    assert(ah("big") > a0("big") && ah("big") < a1("big"), s"alpha=.5: $ah")
    assert(math.abs(ah("big") - 283L) < 45, s"alpha=.5: $ah")
  }

  test("weightedTopK: exact size, weight-proportional inclusion, deterministic, TakeOrdered plan") {
    // two weight classes: heavy rows 10x the weight of light rows
    val df = (0L until 1000L)
      .map(i => (i, if (i < 200) 100.0 else 10.0)).toDF("id", "w")
    val sel = Sampling.weightedTopK(df, col("id"), col("w"), k = 300,
      salt = "s1")
    val ids = sel.select("id").as[Long].collect().toSet
    assert(ids.size == 300, "exactly k rows")
    // E-S property: inclusion tracks weight — heavy rows (20% of pop,
    // ~69% expected inclusion each at these sizes) dominate
    val heavy = ids.count(_ < 200L)
    assert(heavy > 120 && heavy < 200, s"heavy included: $heavy")
    val lightRate = (300 - heavy) / 800.0
    val heavyRate = heavy / 200.0
    assert(heavyRate > 2 * lightRate,
      s"heavy rate $heavyRate vs light $lightRate")
    // deterministic across runs and partitionings
    val again = Sampling.weightedTopK(df.repartition(7), col("id"),
        col("w"), k = 300, salt = "s1")
      .select("id").as[Long].collect().toSet
    assert(again == ids)
    // distributed TakeOrdered, no global window
    val p = sel.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Window"), p)
  }

  test("exactQuantiles: partition-invariant and null-safe") {
    val df = (0L until 500L)
      .map(i => (i, if (i % 11 == 0) null else java.lang.Double.valueOf((i * 37 % 101).toDouble)))
      .toDF("id", "v")
    val a = Sampling.exactQuantiles(df.repartition(1), col("v"), Seq(0.5, 0.95))
      .collect().map(r => (r.getDouble(0), r.getDouble(2))).sortBy(_._1).toSeq
    val b = Sampling.exactQuantiles(df.repartition(13), col("v"), Seq(0.5, 0.95), numParts = 5)
      .collect().map(r => (r.getDouble(0), r.getDouble(2))).sortBy(_._1).toSeq
    assert(a == b)
    // reference on the non-null values
    val nn = (0L until 500L).filter(_ % 11 != 0).map(i => (i * 37 % 101).toDouble).sorted
    assert(a(0)._2 == nn(math.ceil(0.5 * nn.length).toInt - 1))
    assert(a(1)._2 == nn(math.ceil(0.95 * nn.length).toInt - 1))
  }
}
