package graft

import org.apache.spark.sql.functions._
import graft.operators.Classify

/** Naive Bayes quality classifier: hand-computed weights on a planted
  * corpus, default-weight handling for unseen tokens, score separation,
  * and the broadcast/shuffle scoring paths agreeing. */
class ClassifySpec extends SparkSpec {
  import spark.implicits._

  // planted seed: positives say "good", negatives say "junk"; both share
  // the neutral token "text"
  private lazy val train = Seq(
    (1L, 1, "good good text"),
    (2L, 1, "good text"),
    (3L, 0, "junk text"),
    (4L, 0, "junk junk junk text")
  ).toDF("doc_id", "y", "text")

  private lazy val model =
    Classify.trainTokenNb(train, col("text"), col("y"))

  test("weights match the closed form") {
    // c(good)=(3,0) c(junk)=(0,4) c(text)=(2,2); N1=5 N0=6 V=3
    val w = model.weights.as[(String, Double)].collect().toMap
    def f(c1: Long, c0: Long) =
      math.log((c1 + 1.0) / 8.0) - math.log((c0 + 1.0) / 9.0)
    assert(math.abs(w("good") - f(3, 0)) < 1e-12)
    assert(math.abs(w("junk") - f(0, 4)) < 1e-12)
    assert(math.abs(w("text") - f(2, 2)) < 1e-12)
    assert(math.abs(model.defaultW - math.log(9.0 / 8.0)) < 1e-12)
    assert(model.logPrior === 0.0) // 2 vs 2 docs
  }

  test("scoring separates the planted classes; unseen tokens take the default") {
    val score = Seq(
      (10L, "good good stuff"), // "stuff" unseen -> defaultW
      (11L, "junk junk stuff")
    ).toDF("doc_id", "text")
    val out = Classify.scoreTokenNb(model, score, "doc_id", col("text"))
      .orderBy("doc_id")
      .as[(Long, Long, Double, Int)].collect()
    val Array((_, n10, avg10, pred10), (_, n11, avg11, pred11)) = out
    assert(n10 === 3 && n11 === 3)
    assert(avg10 > 0 && pred10 === 1)
    assert(avg11 < 0 && pred11 === 0)
    // exact: mean of (w_good, w_good, defaultW)
    val w = model.weights.as[(String, Double)].collect().toMap
    val expect10 = (w("good") * 2 + model.defaultW) / 3
    assert(math.abs(avg10 - math.rint(expect10 * 1e4) / 1e4) <= 1e-4)
  }

  test("zero-token docs drop; broadcast and shuffle paths agree") {
    val score = Seq((20L, "   "), (21L, "good")).toDF("doc_id", "text")
    val a = Classify.scoreTokenNb(model, score, "doc_id", col("text"),
      broadcastModel = true)
    val b = Classify.scoreTokenNb(model, score, "doc_id", col("text"),
      broadcastModel = false)
    assert(a.count() === 1 && b.count() === 1)
    assert(a.orderBy("doc_id").collect().toSeq ===
      b.orderBy("doc_id").collect().toSeq)
  }

  test("training requires both classes") {
    intercept[IllegalArgumentException] {
      Classify.trainTokenNb(train.filter(col("y") === 1),
        col("text"), col("y"))
    }
  }

  // ----- DSIR importance weighting -----------------------------------

  test("DSIR log-ratios match the closed form; target-like docs rank higher") {
    val target = Seq((1L, "apple banana")).toDF("doc_id", "text")
    val raw = Seq((10L, "apple banana"), (11L, "cherry durian"))
      .toDF("doc_id", "text")
    val model = Classify.trainDsir(target, raw, col("text"))
    // features per doc: 2 unigrams + 1 bigram; Nt=3 Nr=6 B=10000, and
    // the 6 distinct features land in distinct buckets (verified by the
    // exact-value asserts below — a collision would shift them)
    val b = 10000.0
    def lr(ct: Long, cr: Long) =
      math.log((ct + 1.0) / (3 + b)) - math.log((cr + 1.0) / (6 + b))
    val out = Classify.dsirScores(model, raw, "doc_id", col("text"))
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    val Array((_, n10, s10), (_, n11, s11)) = out
    assert(n10 === 3 && n11 === 3)
    // doc 10's three features all have (ct=1, cr=1); doc 11's all (0, 1)
    assert(math.abs(s10 - lr(1, 1)) <= 1e-4)
    assert(math.abs(s11 - lr(0, 1)) <= 1e-4)
    assert(s10 > s11, "the target-identical doc must outrank the junk doc")
    assert(math.abs(model.defaultLr - math.log((6 + b) / (3 + b))) < 1e-12)
  }

  test("DSIR: unseen features take the default ratio; empty docs drop") {
    val target = Seq((1L, "apple banana")).toDF("doc_id", "text")
    val raw = Seq((10L, "apple banana"), (11L, "cherry durian"))
      .toDF("doc_id", "text")
    val model = Classify.trainDsir(target, raw, col("text"))
    val probe = Seq((20L, "zebra yak"), (21L, "  ")).toDF("doc_id", "text")
    val out = Classify.dsirScores(model, probe, "doc_id", col("text"))
      .as[(Long, Long, Double)].collect()
    assert(out.length === 1, "zero-token doc must drop out")
    val (_, n20, s20) = out.head
    assert(n20 === 3)
    assert(math.abs(s20 - model.defaultLr) <= 1e-4)
  }

  test("dsirSelfScores ≡ trainDsir + dsirScores (one-pass fusion, r20)") {
    val raw = Seq(
      (10L, "en", "apple banana apple"),
      (11L, "de", "cherry durian"),
      (12L, "en", "banana cherry banana split"),
      (13L, "fr", "zebra yak zebra yak zebra"),
      (14L, "en", "  ")).toDF("doc_id", "lang", "text")
    val twoCall = Classify.dsirScores(
      Classify.trainDsir(raw.filter(col("lang") === "en"), raw,
        col("text")),
      raw, "doc_id", col("text"))
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    val fused = Classify.dsirSelfScores(raw, col("lang") === "en",
      "doc_id", col("text"))
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    graft.operators.PersistTracker.releaseAll()
    assert(fused === twoCall,
      "the fused one-pass form must be bit-identical to train+score")
    assert(fused.nonEmpty && fused.map(_._1) === Seq(10L, 11L, 12L, 13L),
      "zero-token doc must drop out of both forms")
  }

  test("knnPropagate: cluster labels propagate; ties break on low label") {
    // two tight clusters on orthogonal axes, labels 1 and 2; ids 100/101
    // are unlabeled members of cluster 1 / cluster 2
    def v(axis: Int, eps: Float): Seq[Float] =
      Seq.tabulate(4)(i => (if (i == axis) 1.0f else 0.0f) +
        (if (i == 3) eps else 0.0f))
    val emb = (Seq(
      (100L, v(0, 0.01f), null.asInstanceOf[Integer]),
      (101L, v(1, 0.01f), null.asInstanceOf[Integer])) ++
      (0 until 6).map(i => (i.toLong, v(i % 2, 0.02f + 0.01f * i),
        Integer.valueOf(1 + i % 2))))
      .toDF("vec_id", "embedding", "label")
    val out = Classify.knnPropagate(emb, "vec_id", "embedding", "label",
        k = 3)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    // k=3 around an axis-0 query: the three axis-0 labeled rows (label 1)
    assert(out(100L) == ((1, 3L)))
    assert(out(101L) == ((2, 3L)))
    assert(out.size == 2, "labeled rows must not be re-predicted")
    // forced tie: k=2 with one neighbor of each label -> smaller label
    val tie = Classify.knnPropagate(emb, "vec_id", "embedding", "label",
        k = 2)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    // nearest two to an axis-0 query are both label-1 members (cosine
    // orders within the cluster first), so no tie at k=2 here; build one
    // explicitly: equidistant pair with labels 5 and 9
    val eq = Seq(
      (200L, Seq(1.0f, 0.0f), null.asInstanceOf[Integer]),
      (201L, Seq(1.0f, 0.1f), Integer.valueOf(9)),
      (202L, Seq(1.0f, -0.1f), Integer.valueOf(5)))
      .toDF("vec_id", "embedding", "label")
    val eqOut = Classify.knnPropagate(eq, "vec_id", "embedding", "label",
        k = 2).collect()
    assert(eqOut.length == 1)
    assert(eqOut(0).getInt(1) == 5, "vote tie must take the smaller label")
    assert(eqOut(0).getLong(2) == 1L)
    assert(tie.keySet == Set(100L, 101L))
  }

  test("logistic probe: one GD step matches the closed-form gradient") {
    // at w=0, b=0 every p is exactly 0.5, so after one step
    //   w = −lr/n · Σ (0.5 − y)·v,  b = −lr/n · Σ (0.5 − y)
    val data = Seq(
      (1L, Seq(1.0f, 2.0f), 1),
      (2L, Seq(-1.0f, 0.5f), 0),
      (3L, Seq(2.0f, -1.0f), 1),
      (4L, Seq(0.0f, 1.0f), 0)).toDF("vec_id", "embedding", "y")
    val m = Classify.trainLogisticEmb(data, col("embedding"), col("y"),
      iters = 1, lr = 0.5)
    val rows = Seq(
      (Seq(1.0, 2.0), 1.0), (Seq(-1.0, 0.5), 0.0),
      (Seq(2.0, -1.0), 1.0), (Seq(0.0, 1.0), 0.0))
    val wantW = (0 until 2).map { i =>
      -0.5 / 4.0 * rows.map { case (v, y) => (0.5 - y) * v(i) }.sum
    }
    val wantB = -0.5 / 4.0 * rows.map { case (_, y) => 0.5 - y }.sum
    m.weights.zip(wantW).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-12, s"got ${m.weights} want $wantW")
    }
    assert(math.abs(m.bias - wantB) < 1e-12)
  }

  test("logistic probe separates planted classes; partition-invariant") {
    // y = 1 iff the first component is positive; margins are dominated
    // by w(0) after a few full-batch steps
    val data = (0 until 64).map { i =>
      val y = i % 2
      val v = Seq((if (y == 1) 1.0f else -1.0f) + (i % 5) * 0.02f,
        ((i * 7) % 11 - 5) * 0.05f, ((i * 3) % 7 - 3) * 0.05f)
      (i.toLong, v, y)
    }.toDF("vec_id", "embedding", "y")
    val m = Classify.trainLogisticEmb(data, col("embedding"), col("y"),
      iters = 5, lr = 1.0)
    val scored = Classify.scoreLogisticEmb(m, data, "vec_id",
      col("embedding"))
      .join(data.select(col("vec_id"), col("y")), "vec_id")
      .collect()
    assert(scored.length == 64)
    scored.foreach { r =>
      assert(r.getInt(2) == r.getInt(3),
        s"vec ${r.getLong(0)}: pred ${r.getInt(2)} label ${r.getInt(3)}")
    }
    // full-batch GD has no partition dependence beyond float-sum order
    val m13 = Classify.trainLogisticEmb(data.repartition(13),
      col("embedding"), col("y"), iters = 5, lr = 1.0)
    m.weights.zip(m13.weights).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9)
    }
    assert(math.abs(m.bias - m13.bias) < 1e-9)
  }

  test("excessLossWeights: hand-computed softmax; hard domain upweighted") {
    // domain A is well-classified (high |logit|, right sign), domain B
    // is misclassified (wrong sign) → higher loss → higher weight
    val scored = Seq(
      ("A", 1, 3.0), ("A", 0, -2.5),
      ("B", 1, -1.0), ("B", 0, 0.5)).toDF("dom", "y", "logit")
    val got = Classify.excessLossWeights(scored, "dom", col("y"),
        col("logit"), eta = 1.0)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    def loss(y: Int, m: Double) =
      math.log(1.0 + math.exp(-(2.0 * y - 1.0) * m))
    val lA = (loss(1, 3.0) + loss(0, -2.5)) / 2
    val lB = (loss(1, -1.0) + loss(0, 0.5)) / 2
    val z = math.exp(lA) + math.exp(lB)
    assert(got("A")._1 == 2L && got("B")._1 == 2L)
    assert(math.abs(got("A")._2 - lA) < 1e-12)
    assert(math.abs(got("B")._2 - lB) < 1e-12)
    assert(math.abs(got("A")._3 - math.exp(lA) / z) < 1e-12)
    assert(math.abs(got("B")._3 - math.exp(lB) / z) < 1e-12)
    // weights are a distribution and the hard domain dominates
    assert(math.abs(got("A")._3 + got("B")._3 - 1.0) < 1e-12)
    assert(got("B")._3 > got("A")._3)
  }
}
