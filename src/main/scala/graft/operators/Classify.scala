package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Model-based quality filtering: a multinomial Naive Bayes token
 * classifier with CLOSED-FORM training — the distributed stand-in for
 * the fastText-style quality classifiers used to filter web corpora
 * (labeled seed sets → a scorer run over every document). Closed-form
 * means training is two aggregations over exact integer counts (no SGD,
 * no iteration order), so the model — and therefore every score — is
 * bit-deterministic and SQL-replayable, which keeps the whole train →
 * score path under the DuckDB hash gate (q87).
 *
 * Model math (Laplace smoothing, natural log):
 *   w(t)     = ln((c1(t)+1)/(N1+V)) − ln((c0(t)+1)/(N0+V))
 *   default  = ln((N0+V)/(N1+V))          (token unseen in training)
 *   logPrior = ln(n1/n0)                  (document-count prior)
 * where cy(t) = occurrences of token t in class-y training docs,
 * Ny = Σ_t cy(t), V = |training vocabulary|, ny = class-y doc count.
 * A document's log-odds is logPrior + Σ w(token); we report the mean
 * token weight (rounded) plus the sign of the full sum as `pred`.
 *
 * Scale shape (100 TB corpus, TB-scale training seed):
 *  - training is one explode + one groupBy(token) with map-side combine
 *    (shuffle = |vocab| rows), plus two single-row total aggregates —
 *    the only driver state is five scalars;
 *  - the model artifact is the vocab-sized `weights` frame — persist it
 *    once (parquet/bucketed table) and reuse across scoring runs;
 *  - scoring is explode → join(weights) → per-doc aggregate. The
 *    weights side broadcasts when it fits (`broadcastModel=true`, the
 *    common case: even a 10M-token vocab is ~200 MB); otherwise a plain
 *    equi-join on token, where AQE's skew handling covers the stopword
 *    hot keys. The corpus is never shuffled except by doc id for the
 *    final per-doc sum.
 *
 * Tokens are lowercased whitespace tokens ([[TextAnalysis.tokens]]) —
 * the same vocabulary device as the bigram LM (q59/q82). Zero-token
 * documents drop out of the scored output (explode of an empty array),
 * mirroring the SQL unnest the oracle replays.
 */
object Classify {

  /** Trained model. `weights` (token → w) is the at-rest artifact; the
    * scalars ride along and are re-derivable from the counts. */
  case class NbModel(weights: DataFrame, defaultW: Double, logPrior: Double)

  private def toks(text: Column): Column =
    TextAnalysis.tokens(lower(text))

  /**
   * Train on labeled documents. `label` must evaluate to 1 (positive /
   * keep-quality) or 0; both classes must be non-empty.
   */
  def trainTokenNb(train: DataFrame, text: Column, label: Column): NbModel = {
    val y = label.cast("int")
    val tok = train.select(y.as("__y"), explode(toks(text)).as("token"))
    // Persisted: the totals action below materializes it, and `weights`
    // (hence every scoring run) reuses it instead of re-exploding the
    // training corpus. Vocab-sized, so MEMORY_AND_DISK is safe.
    val counts = PersistTracker.trackPersist(tok.groupBy("token").agg(
      sum(col("__y")).cast("long").as("__c1"),
      sum(lit(1) - col("__y")).cast("long").as("__c0")))
    // five bounded scalars: class token totals, vocab size, doc counts
    val Array(n1Tok, n0Tok, vocab) = counts
      .agg(sum("__c1"), sum("__c0"), count(lit(1)))
      .head().toSeq.map(v => v.asInstanceOf[Long]).toArray
    val Array(n1Doc, n0Doc) = train
      .agg(sum(y).cast("long"), sum(lit(1) - y).cast("long"))
      .head().toSeq.map(v => v.asInstanceOf[Long]).toArray
    require(n1Doc > 0 && n0Doc > 0,
      s"both classes must be non-empty (pos=$n1Doc neg=$n0Doc)")
    val weights = counts.select(col("token"),
      (log((col("__c1") + 1.0) / lit(n1Tok + vocab).cast("double")) -
        log((col("__c0") + 1.0) / lit(n0Tok + vocab).cast("double"))).as("w"))
    NbModel(weights,
      defaultW = math.log((n0Tok + vocab).toDouble / (n1Tok + vocab)),
      logPrior = math.log(n1Doc.toDouble / n0Doc))
  }

  /**
   * Score documents with a trained model: per doc, the token count, the
   * mean token log-odds (4 dp), and the MAP class
   * `pred = [logPrior + Σ w > 0]` as 0/1.
   */
  def scoreTokenNb(model: NbModel, docs: DataFrame, idCol: String,
      text: Column, broadcastModel: Boolean = true): DataFrame = {
    val w = if (broadcastModel) broadcast(model.weights) else model.weights
    docs.select(col(idCol), explode(toks(text)).as("token"))
      .join(w, Seq("token"), "left")
      .withColumn("__w", coalesce(col("w"), lit(model.defaultW)))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_tokens"),
        round(avg(col("__w")), 4).as("avg_logodds"),
        (sum(col("__w")) + model.logPrior > 0).cast("int").as("pred"))
  }

  // ----- DSIR-style importance weighting (hashed n-gram log-ratios) ----

  /** Trained DSIR model: `logRatios` (bucket → lr) is the at-rest
    * artifact — at most `numBuckets` rows, so it always broadcasts.
    * `defaultLr` covers buckets unseen on BOTH sides (Laplace over the
    * full bucket space gives every bucket a defined probability). */
  case class DsirModel(logRatios: DataFrame, defaultLr: Double,
      numBuckets: Int)

  /** One row per unigram+bigram feature-gram occurrence of `text`
    * (bag-of-features — the DSIR distributions are over feature
    * OCCURRENCES, not distinct features), as column `__g`, keeping
    * `keep`. Tokens are materialized as a column and grams assembled
    * from `element_at` over an exploded index — the engine's lambda-free
    * n-gram pattern. Building grams inside a `transform` lambda instead
    * re-evaluates every expression the lambda captures (including the
    * tokenizer) once PER ELEMENT under interpreted higher-order eval —
    * quadratic per document. */
  private[graft] def gramRows(df: DataFrame, keep: Seq[String],
      text: Column): DataFrame = {
    val m = size(col("__t"))
    df.select(keep.map(col) :+ toks(text).as("__t"): _*)
      // m unigrams then m-1 bigrams: 2m-1 occurrence slots per doc;
      // zero-token docs explode a null sequence and drop out.
      .select(keep.map(col) :+ col("__t") :+
        explode(when(m >= 1, sequence(lit(1), m * 2 - 1))).as("__i"): _*)
      .select(keep.map(col) :+
        when(col("__i") <= m, element_at(col("__t"), col("__i")))
          .otherwise(concat_ws(" ",
            element_at(col("__t"), col("__i") - m),
            element_at(col("__t"), col("__i") - m + 1)))
          .as("__g"): _*)
  }

  /** md5-prefix hash bucket of one gram — the battery's portable device,
    * so any engine replays the bucketing. Applied after explode as a
    * plain per-row projection, inside whole-stage codegen. */
  private[graft] def bucketOf(gram: Column, numBuckets: Int): Column =
    pmod(conv(substring(md5(gram), 1, 15), 16, 10).cast("long"),
      lit(numBuckets.toLong))

  /**
   * Data Selection via Importance Resampling (DSIR, Xie et al. 2023),
   * the closed-form core: estimate hashed-n-gram feature distributions
   * for a TARGET corpus (what you want more of — a high-quality seed)
   * and for the RAW pool, and weight every raw document by how much
   * more likely its features are under the target distribution:
   *
   *   lr(b)  = ln((ct(b)+1)/(Nt+B)) − ln((cr(b)+1)/(Nr+B))
   *   w(doc) = mean over the doc's feature occurrences of lr(bucket)
   *
   * where ct/cr are per-bucket occurrence counts, Nt/Nr the totals, and
   * B = `numBuckets` (Laplace over the full hashed space). The paper
   * resamples with Gumbel noise; this engine keeps selection
   * deterministic — rank or gate on the weight (see
   * [[Sampling.percentileGate]] / the q90 battery form) so re-runs
   * reproduce the same subset.
   *
   * Scale shape: two explode+groupBy(bucket) count passes whose shuffle
   * is ≤ B rows each, two single-row totals, and a ≤B-row model frame.
   * Scoring ([[dsirScores]]) is explode → broadcast join → per-doc
   * aggregate — the raw corpus shuffles only by doc id for the final
   * mean, exactly the [[scoreTokenNb]] plan with a bucket join instead
   * of a token join.
   */
  def trainDsir(target: DataFrame, raw: DataFrame, text: Column,
      numBuckets: Int = 10000): DsirModel = {
    val tf = gramRows(target, Nil, text)
      .select(bucketOf(col("__g"), numBuckets).as("bucket"), lit(1L).as("__t"))
    val rf = gramRows(raw, Nil, text)
      .select(bucketOf(col("__g"), numBuckets).as("bucket"), lit(0L).as("__t"))
    // Persisted (≤B rows): without it the totals action AND the lazy
    // `logRatios` each re-explode + re-md5 both corpora — the dominant
    // cost of the whole train/score chain.
    val counts = PersistTracker.trackPersist(
      tf.unionByName(rf).groupBy("bucket").agg(
        sum(col("__t")).as("__ct"),
        sum(lit(1L) - col("__t")).as("__cr")))
    val Array(nt, nr) = counts.agg(sum("__ct"), sum("__cr"))
      .head().toSeq.map(v => v.asInstanceOf[Long]).toArray
    val b = numBuckets.toLong
    val logRatios = counts.select(col("bucket"),
      (log((col("__ct") + 1.0) / lit(nt + b).cast("double")) -
        log((col("__cr") + 1.0) / lit(nr + b).cast("double"))).as("lr"))
    DsirModel(logRatios,
      defaultLr = math.log((nr + b).toDouble / (nt + b)), numBuckets)
  }

  /** [[trainDsir]] + [[dsirScores]] fused for the self-trained case —
    * the target corpus is a predicate over the raw pool itself (the
    * "more like my seed slice" selection q90 gates): ONE gram/bucket
    * pass over the pool serves both the per-bucket counts and the
    * per-doc scoring, where the separate train-then-score chain grams
    * and md5-buckets the corpus three times (target counts, raw
    * counts, scoring) — the dominant cost of the chain (r20, guide
    * §1.2/§2.3). The arithmetic is [[trainDsir]]'s exactly: per-bucket
    * target count = grams of rows satisfying `targetPred`, raw count =
    * all grams, identical Laplace smoothing — scores are
    * bit-identical to the two-call form (spec-pinned). */
  def dsirSelfScores(docs: DataFrame, targetPred: Column, idCol: String,
      text: Column, numBuckets: Int = 10000): DataFrame = {
    // one persisted (doc, is-target, bucket) gram frame — both
    // aggregations below consume it
    val gb = PersistTracker.trackPersist(
      gramRows(docs.withColumn("__is_t", targetPred.cast("long")),
        Seq(idCol, "__is_t"), text)
        .select(col(idCol), col("__is_t"),
          bucketOf(col("__g"), numBuckets).as("bucket")))
    val counts = gb.groupBy("bucket").agg(
      sum(col("__is_t")).as("__ct"),
      count(lit(1)).as("__cr"))
    val Array(nt, nr) = counts.agg(sum("__ct"), sum("__cr"))
      .head().toSeq.map(v => v.asInstanceOf[Long]).toArray
    val b = numBuckets.toLong
    val logRatios = counts.select(col("bucket"),
      (log((col("__ct") + 1.0) / lit(nt + b).cast("double")) -
        log((col("__cr") + 1.0) / lit(nr + b).cast("double"))).as("lr"))
    val defaultLr = math.log((nr + b).toDouble / (nt + b))
    gb.select(col(idCol), col("bucket"))
      .join(broadcast(logRatios), Seq("bucket"), "left")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_feats"),
        round(avg(coalesce(col("lr"), lit(defaultLr))), 4)
          .as("dsir_logratio"))
  }

  /** Per-document importance weight under a trained DSIR model: the
    * feature-occurrence count and the mean log-ratio (4 dp). Zero-token
    * documents drop out (explode of an empty array), like
    * [[scoreTokenNb]]. */
  def dsirScores(model: DsirModel, docs: DataFrame, idCol: String,
      text: Column): DataFrame =
    gramRows(docs, Seq(idCol), text)
      .select(col(idCol), bucketOf(col("__g"), model.numBuckets).as("bucket"))
      .join(broadcast(model.logRatios), Seq("bucket"), "left")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_feats"),
        round(avg(coalesce(col("lr"), lit(model.defaultLr))), 4)
          .as("dsir_logratio"))

  /**
   * kNN label propagation over an embedding table — the semi-supervised
   * auto-labeler: every row whose `labelCol` is null receives the
   * MAJORITY label of its `k` nearest labeled neighbors by rounded
   * cosine (the standard seed-set → full-corpus annotation step for
   * topic/quality/language tags when only a small labeled set exists).
   * Fully deterministic: neighbor rank ties break on the 4-dp cosine
   * then neighbor id ([[Similarity.bruteForceTopK]]'s contract); vote
   * ties break on (votes desc, label asc).
   *
   * Scale shape: labeled seed sets are small — the unlabeled side is
   * never shuffled (broadcast queries in the scoring pass would invert
   * at corpus scale, so here the UNLABELED rows are the broadcast
   * queries only when they fit; for corpus-scale propagation swap the
   * brute-force stage for an ANN candidate pass —
   * [[Similarity.ivfTopKWithIndex]] / [[Similarity.annSearchRerank]]
   * with depth ≫ k — and vote over the candidate list, exactly the
   * [[Similarity.hardNegatives]] guidance).
   *
   * @return `(idCol, pred_label, votes)` — one row per unlabeled input
   */
  def knnPropagate(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val labeled = emb.filter(col(labelCol).isNotNull)
    val queries = emb.filter(col(labelCol).isNull)
      .select(col(idCol).as("query_id"), col(vecCol))
    val nn = Similarity.bruteForceTopK(
      labeled.select(col(idCol), col(vecCol)), queries, k,
      idCol = idCol, vecCol = vecCol)
    val voted = nn
      .join(labeled.select(col(idCol), col(labelCol)), Seq(idCol))
      .groupBy(col("query_id"), col(labelCol))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("votes").desc, col(labelCol))
    voted.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("query_id").as(idCol), col(labelCol).as("pred_label"),
        col("votes"))
  }

  // ----- Logistic linear probe over frozen embeddings ------------------

  /** Trained probe: `weights` has one entry per embedding dimension.
    * Driver state is dim+1 doubles — bounded by construction. */
  case class LogitModel(weights: Seq[Double], bias: Double,
      iters: Int, lr: Double)

  /**
   * Train a binary logistic-regression probe on an embedding column by
   * FULL-BATCH gradient descent with a fixed iteration count — the
   * linear-probe-over-frozen-embeddings quality/topic filter (the
   * discriminative sibling of [[trainTokenNb]]; same role as the
   * embedding-head classifiers used to score web corpora for training
   * mixes). Full-batch keeps the NB doc's determinism story intact:
   * there is no sample order or shuffle dependence — each iteration is
   * two global aggregations, so the model is reproducible up to
   * float-summation order (guard any cross-engine comparison with the
   * battery's 4-dp rounding, as q68's k-means does).
   *
   * Update rule (standard GD on mean log-loss, public knowledge):
   *   p_d = σ(b + w·v_d)
   *   w  ← w − lr·Σ_d (p_d − y_d)·v_d / n
   *   b  ← b − lr·Σ_d (p_d − y_d) / n
   *
   * Scale shape (100 TB corpus, trainable seed): the train frame is
   * persisted once and each iteration is (1) one narrow codegen pass —
   * margin via the native dot against the BROADCAST weight literal —
   * and (2) one posexplode → groupBy(dim) aggregation whose shuffle is
   * `dim` rows with map-side combine, plus a single-row bias sum.
   * Driver state: dim+1 doubles per iteration, `2·iters+1` jobs total.
   * No per-row UDF, no driver-side data.
   */
  def trainLogisticEmb(train: DataFrame, vecCol: Column, label: Column,
      iters: Int = 3, lr: Double = 0.5): LogitModel = {
    require(iters > 0 && iters <= 64, s"iters in [1,64], got $iters")
    val base = PersistTracker.trackPersist(
      train.select(label.cast("double").as("__y"), vecCol.as("__v")))
    val n = base.count().toDouble
    require(n > 0, "empty training set")
    val dim = base.select(size(col("__v")).as("d")).limit(1)
      .collect().head.getInt(0)
    var w: Seq[Double] = Seq.fill(dim)(0.0)
    var b = 0.0
    var it = 0
    while (it < iters) {
      val p = lit(1.0) / (lit(1.0) +
        exp(-(lit(b) + Similarity.dotFast(col("__v"), typedlit(w)))))
      val withD = base.select(col("__v"), (p - col("__y")).as("__d"))
      val gw = withD
        .select(col("__d"), posexplode(col("__v")).as(Seq("__dim", "__x")))
        .groupBy("__dim")
        .agg(sum(col("__d") * col("__x")).as("__g"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val gb = withD.agg(sum(col("__d"))).collect().head.getDouble(0)
      w = w.zipWithIndex.map { case (wi, i) =>
        wi - lr * gw.getOrElse(i, 0.0) / n
      }
      b = b - lr * gb / n
      it += 1
    }
    LogitModel(w, b, iters, lr)
  }

  /** Score with a trained [[LogitModel]]: one narrow codegen pass, the
    * model rides as a broadcast literal. Returns the raw margin
    * (`logit`, round it before any cross-engine compare) and the sign
    * prediction. */
  def scoreLogisticEmb(model: LogitModel, docs: DataFrame, idCol: String,
      vecCol: Column): DataFrame = {
    val margin = lit(model.bias) +
      Similarity.dotFast(vecCol, typedlit(model.weights))
    docs.select(col(idCol), margin.as("logit"),
      (margin > 0).cast("int").as("pred"))
  }

  /**
   * Domain reweighting from per-group proxy loss — the multiplicative
   * -weights step of DoReMi (Xie et al., "DoReMi: Optimizing Data
   * Mixtures Speeds Up Language Model Pretraining", public knowledge),
   * applied to a FROZEN proxy: domains where the probe's log-loss is
   * high are upweighted,
   *
   *   weight(g) = exp(η·ℓ_g) / Σ_h exp(η·ℓ_h),
   *   ℓ_g = mean over g of ln(1 + exp(−(2y−1)·logit)),
   *
   * i.e. one softmax over per-domain mean excess loss (the full DoReMi
   * loop re-trains the proxy between rounds; with the proxy frozen the
   * multiplicative updates telescope into this closed form — use the
   * resulting weights as [[Sampling]] mixture targets, q92's input).
   *
   * `scored` carries the domain, the binary label and the probe margin
   * ([[scoreLogisticEmb]]'s `logit`). One |domains|-row aggregate plus
   * a broadcast-window softmax — nothing scales with the corpus except
   * the first mean.
   *
   * @return (groupCol, n_docs, mean_loss, weight) — doubles unrounded
   */
  def excessLossWeights(scored: DataFrame, groupCol: String,
      label: Column, logit: Column, eta: Double = 1.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val loss = log(lit(1.0) +
      exp(-(lit(2.0) * label.cast("double") - lit(1.0)) * logit))
    val byG = scored.select(col(groupCol), loss.as("__l"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"), avg("__l").as("mean_loss"))
    val w = Window.partitionBy()
    byG.withColumn("weight",
        exp(lit(eta) * col("mean_loss"))
          / sum(exp(lit(eta) * col("mean_loss"))).over(w))
      .select(col(groupCol), col("n_docs"), col("mean_loss"), col("weight"))
  }
}
