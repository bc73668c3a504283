package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** IVF-Flat ANN: cell assignment + probing semantics on a corpus with
  * known cluster structure, and the nprobe=numCells exactness
  * degeneracy on arbitrary data. (The LSH path is covered by the q28
  * recall probe and DedupSpec; brute force by q26.) */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  /** 4 well-separated clusters along distinct axes; ids 0..3 are one
    * seed vector per cluster (the deterministic centroids), 4..19 are
    * members with small fixed off-axis noise. */
  private def clustered = {
    def vec(axis: Int, noise: Float): Seq[Float] =
      (0 until dim).map { i =>
        if (i == axis * 2) 1.0f
        else if (i == axis * 2 + 1) noise
        else 0.01f * ((i + axis) % 3)
      }
    val seeds = (0 until 4).map(c => (c.toLong, vec(c, 0.0f)))
    val members = (4 until 20).map { id =>
      val c = id % 4
      (id.toLong, vec(c, 0.05f + 0.01f * (id / 4)))
    }
    (seeds ++ members).toDF("vec_id", "embedding")
  }

  test("well-separated clusters: nprobe=1 IVF equals brute force") {
    val corpus = clustered
    val queries = corpus.filter($"vec_id".isin(5L, 6L, 7L))
      .select($"vec_id".as("query_id"), $"embedding")
    val ivf = Similarity.ivfTopK(corpus, queries, k = 3,
      numCells = 4, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // the true top-3 of a cluster member live in its own cluster, so
    // probing one cell loses nothing
    assert(ivf == exact)
    // the query itself is rank 1 at cosine 1.0
    val self = Similarity.ivfTopK(corpus, queries, k = 3,
      numCells = 4, nprobe = 1)
      .filter($"rank" === 1).collect()
    assert(self.forall(r => r.getLong(0) == r.getLong(2)
      && r.getDouble(3) == 1.0))
  }

  test("nprobe = numCells degenerates to exact top-k on any corpus") {
    // adversarial-ish corpus: no cluster structure at all
    val corpus = (0L until 40L).map { id =>
      (id, (0 until dim).map(i =>
        math.sin(id * 7.3 + i * 1.9).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 2)
      .select($"vec_id".as("query_id"), $"embedding")
    val ivf = Similarity.ivfTopK(corpus, queries, k = 5,
      numCells = 8, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(ivf == exact)
  }

  test("ivfRecallSweep: monotone in nprobe, exact at full probe") {
    val corpus = (0L until 40L).map { id =>
      (id, (0 until dim).map(i =>
        math.sin(id * 7.3 + i * 1.9).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding")
    val sweep = Similarity.ivfRecallSweep(corpus, queries, k = 5,
        numCells = 8, nprobes = Seq(1, 2, 8))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(sweep.size == 9)
    // probing every cell IS brute force: recall 1.0 for every query
    (0L until 3L).foreach { q =>
      assert(sweep((8, q)) == ((5L, 1.0)), s"full probe query $q: ${sweep((8, q))}")
    }
    // recall is non-decreasing in nprobe per query
    (0L until 3L).foreach { q =>
      assert(sweep((1, q))._1 <= sweep((2, q))._1 &&
        sweep((2, q))._1 <= sweep((8, q))._1)
    }
    // replay one setting from the (separately spec'd) components
    val ivf1 = Similarity.ivfTopK(corpus, queries, k = 5, numCells = 8,
      nprobe = 1).collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    (0L until 3L).foreach { q =>
      val want = ivf1.filter(_._1 == q).map(_._2)
        .intersect(exact.filter(_._1 == q).map(_._2)).size.toLong
      assert(sweep((1, q))._1 == want)
    }
    graft.operators.PersistTracker.releaseAll()
  }

  test("addToIvfIndex / addToPqIndex ≡ rebuild over the union") {
    val corpus = (0L until 32L).map { id =>
      (id, (0 until dim).map(i =>
        math.cos(id * 3.7 + i * 2.3).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val base = corpus.filter($"vec_id" % 4 =!= 0)
    val batch = corpus.filter($"vec_id" % 4 === 0)
    val queries = corpus.filter($"vec_id" < 2)
      .select($"vec_id".as("query_id"), $"embedding")
    // IVF: freeze centroids from the full corpus, grow incrementally
    val cents = Similarity.buildIvfIndex(corpus, 4).centroids
    val merged = Similarity.addToIvfIndex(
      Similarity.buildIvfIndex(base, 4, centroids = cents), batch)
    val rebuilt = Similarity.buildIvfIndex(corpus, 4, centroids = cents)
    def serveIvf(ix: Similarity.IvfIndex) =
      Similarity.ivfTopKWithIndex(ix, queries, k = 5, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).toSet
    assert(serveIvf(merged) == serveIvf(rebuilt))
    // the assigned frames agree row for row, not just through serving
    assert(merged.assigned.select("vec_id", "__cell").collect().toSet ==
      rebuilt.assigned.select("vec_id", "__cell").collect().toSet)
    // PQ: frozen codebook, appended codes ≡ rebuilt codes
    val cb = Similarity.buildPqIndex(corpus, m = 4, codebookSize = 8).codebook
    val mergedPq = Similarity.addToPqIndex(
      Similarity.buildPqIndex(base, 4, 8, codebook = cb), batch)
    val rebuiltPq = Similarity.buildPqIndex(corpus, 4, 8, codebook = cb)
    assert(mergedPq.codes.collect().toSet == rebuiltPq.codes.collect().toSet)
    graft.operators.PersistTracker.releaseAll()
  }

  test("assignment ties break to the lowest cell id") {
    // two identical centroids (ids 0, 1): every vector ties between
    // them and must land in cell 0
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(1.0f, 0.1f)), (3L, Seq(1.0f, 0.2f)))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" === 2L)
      .select($"vec_id".as("query_id"), $"embedding")
    // nprobe=1 probes cell 0 only; all 4 vectors are in it, so the
    // top-4 covers the whole corpus — proving nothing fell into cell 1
    val got = Similarity.ivfTopK(corpus, queries, k = 4,
      numCells = 2, nprobe = 1)
    assert(got.count() == 4)
  }

  test("IVF index survives a bucketed write; serving equals direct") {
    val corpus = clustered
    val queries = corpus.filter($"vec_id".isin(5L, 6L, 7L))
      .select($"vec_id".as("query_id"), $"embedding")
    val direct = Similarity.ivfTopK(corpus, queries, k = 3,
      numCells = 4, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val idx = Similarity.buildIvfIndex(corpus, numCells = 4)
    // the deployment shape: assigned corpus bucketed on its cell
    graft.sources.BucketedTables.writeBucketed(idx.assigned,
      "ivf_assigned_spec", 2, Seq("__cell"))
    val back = Similarity.IvfIndex(
      spark.table("ivf_assigned_spec"), idx.centroids)
    val served = Similarity.ivfTopKWithIndex(back, queries, k = 3,
      nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(served == direct)
    spark.sql("DROP TABLE IF EXISTS ivf_assigned_spec")
  }

  /** Plain-Scala PQ reference: same codebook policy, rounded-dot argmax
    * assignment (ties → lowest code), ADC sum, (score desc, id) ranking. */
  private def pqReference(vecs: Seq[(Long, Seq[Float])], queryIds: Seq[Long],
      k: Int, m: Int, cbSize: Int): Set[(Long, Int, Long, Double)] = {
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def dot(a: Seq[Float], b: Seq[Float]) =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + x.toDouble * y.toDouble }
    val sd = vecs.head._2.size / m
    val base = vecs.sortBy(_._1).take(cbSize).map(_._2)
    def subOf(v: Seq[Float], j: Int) = v.slice(j * sd, j * sd + sd)
    val cb = (0 until m).map(j => base.map(subOf(_, j)))
    val codes = vecs.map { case (id, v) =>
      id -> (0 until m).map { j =>
        cb(j).zipWithIndex
          .map { case (c, i) => (r4(dot(subOf(v, j), c)), i) }
          .maxBy { case (d, i) => (d, -i) }._2
      }
    }.toMap
    val byId = vecs.toMap
    queryIds.flatMap { qid =>
      val q = byId(qid)
      val scored = vecs.map { case (id, _) =>
        val s = (0 until m).map(j => dot(subOf(q, j), cb(j)(codes(id)(j)))).sum
        (id, r4(s))
      }
      scored.sortBy { case (id, s) => (-s, id) }.take(k).zipWithIndex
        .map { case ((id, s), i) => (qid, i + 1, id, s) }
    }.toSet
  }

  test("pqTopK matches a plain-Scala PQ reference on a seeded corpus") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 40L).map(id =>
      id -> Seq.fill(16)(rnd.nextFloat() * 2 - 1))
    val corpus = vecs.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 2)
      .select($"vec_id".as("query_id"), $"embedding")
    val got = Similarity.pqTopK(corpus, queries, k = 4, m = 4,
      codebookSize = 8)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == pqReference(vecs, Seq(0L, 1L), k = 4, m = 4, cbSize = 8))
    // partitioning invariance of the whole pipeline
    val got7 = Similarity.pqTopK(corpus.repartition(7), queries, k = 4,
      m = 4, codebookSize = 8)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got7 == got)
  }

  test("pqTopK with corpus vectors AS the codebook reproduces exact dots") {
    // 2 subspaces, and the corpus IS the codebook: every subvector snaps
    // to SOME centroid with dot >= its own self-dot; when vectors are
    // orthogonal one-hots scaled differently per subspace, assignment is
    // exact and ADC equals the true dot product.
    val vecs: Seq[(Long, Seq[Float])] = (0L until 4L).map { id =>
      id -> (0 until 8).map(i =>
        if (i == id || i == 4 + id) 1.0f + id * 0.1f else 0.0f).toSeq
    }
    val corpus = vecs.toDF("vec_id", "embedding")
    val queries = corpus.select($"vec_id".as("query_id"), $"embedding")
    val got = Similarity.pqTopK(corpus, queries, k = 1, m = 2,
      codebookSize = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    // every query's top-1 is itself at its exact squared norm
    got.foreach { case (qid, id, s) =>
      assert(id == qid, s"query $qid retrieved $id")
      val v = vecs(qid.toInt)._2
      val want = BigDecimal(v.foldLeft(0.0)((a, x) => a + x.toDouble * x))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(s - want) < 1e-9, s"query $qid score $s want $want")
    }
  }

  test("PQ code index survives a bucketed write; serving equals direct") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 40L).map(id =>
      id -> Seq.fill(16)(rnd.nextFloat() * 2 - 1))
    val corpus = vecs.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 2)
      .select($"vec_id".as("query_id"), $"embedding")
    val direct = Similarity.pqTopK(corpus, queries, k = 4, m = 4,
      codebookSize = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val idx = Similarity.buildPqIndex(corpus, m = 4, codebookSize = 8)
    graft.sources.BucketedTables.writeBucketed(idx.codes,
      "pq_codes_spec", 2, Seq("__j"))
    val back = Similarity.PqIndex(spark.table("pq_codes_spec"), idx.codebook)
    val served = Similarity.pqTopKWithIndex(back, queries, k = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(served == direct)
    spark.sql("DROP TABLE IF EXISTS pq_codes_spec")
  }

  test("PQ encode stays codegen'd at m=16 x cb=64 (no Janino fallback)") {
    // the old single-posexplode encode inlined all m*cb dot products
    // into one Generate-consume method and tripped Janino's 64 KB limit
    // even at (8, 16) — silently interpreted. The per-subspace union
    // bounds generated code by cb alone; fallback=false turns a codegen
    // COMPILE failure into a test failure instead of a silent fallback.
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 80L).map(id =>
      id -> Seq.fill(128)(rnd.nextFloat() * 2 - 1))
    val corpus = vecs.toDF("vec_id", "embedding")
    def codes(): Set[(Long, Int, Int)] =
      Similarity.buildPqIndex(corpus, m = 16, codebookSize = 64)
        .codes.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val viaCodegen = {
      val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
      spark.conf.set("spark.sql.codegen.fallback", "false")
      try codes()
      finally spark.conf.set("spark.sql.codegen.fallback", prev)
    }
    assert(viaCodegen.size == 80 * 16, "one code per (vector, subspace)")
    // and the generated path agrees with the interpreted one
    val interpreted = {
      val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      try codes()
      finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
    }
    assert(viaCodegen == interpreted)
    // the default shape compiles clean too (it didn't before the split)
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val small = (0L until 20L).map(id =>
        id -> Seq.fill(16)(rnd.nextFloat() * 2 - 1))
        .toDF("vec_id", "embedding")
      assert(Similarity.buildPqIndex(small).codes.count() == 20 * 8)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("pqTrainCodebook beats the lowest-id codebook's recall") {
    // 4 groups = product of 2 sub-patterns per subspace. The 2 lowest-id
    // vectors (the default codebook source) both sit near pattern A in
    // BOTH subspaces, so the default sub-codebooks are two nearly
    // parallel centroids: pqTopK's raw-dot argmax sends EVERY sub-vector
    // to the more-tilted one, the subspace carries zero information, and
    // ranking degenerates to id order. Training's cosine assignment
    // splits A from B (normalization breaks the tilt monotonicity), so
    // the trained codebook recovers the group structure.
    def pat(b: Int, d: Float): Seq[Float] =
      if (b == 0) Seq(1.0f, d) else Seq(d, 1.0f)
    val seeds = (0 until 2).map { i =>
      val s = pat(0, 0.1f * (i + 1))
      (i.toLong, s ++ s)
    }
    val groups = for {
      a <- 0 until 2; b <- 0 until 2; j <- 0 until 4
    } yield ((10 + (a * 2 + b) * 4 + j).toLong,
      pat(a, 0.02f * (j + 1)) ++ pat(b, 0.02f * (j + 1)))
    val corpus = (seeds ++ groups).toDF("vec_id", "embedding")
    def groupOf(id: Long) = (id - 10) / 4
    val queryIds = Seq(14L, 18L, 22L) // one each from groups (A,B),(B,A),(B,B)
    val queries = corpus.filter($"vec_id".isin(queryIds: _*))
      .select($"vec_id".as("query_id"), $"embedding")
    def recall(cb: Seq[Seq[Seq[Float]]]): Double = {
      val rows = Similarity.pqTopK(corpus, queries, k = 4, m = 2,
        codebookSize = 2, codebook = cb)
        .collect().map(r => (r.getLong(0), r.getLong(2)))
      rows.count { case (q, id) =>
        id >= 10 && groupOf(id) == groupOf(q)
      }.toDouble / rows.length
    }
    val defaultCb = {
      val base = seeds.map(_._2)
      (0 until 2).map(j => base.map(_.slice(j * 2, j * 2 + 2)).toSeq)
    }
    val trained = Similarity.pqTrainCodebook(corpus, m = 2,
      codebookSize = 2, iters = 3)
    val (rTrained, rDefault) = (recall(trained), recall(defaultCb))
    assert(rTrained > rDefault,
      s"trained recall $rTrained must beat lowest-id recall $rDefault")
    assert(rTrained >= 0.9, s"trained recall $rTrained (default $rDefault)")
  }

  test("hardNegatives: same-label neighbors excluded, null labels drop") {
    val corpus = Seq(
      (1L, Array(1f, 0f), Some(0L)),
      (2L, Array(0.99f, 0.1f), Some(0L)),   // nearest overall — but label 0
      (3L, Array(0.9f, 0.2f), Some(1L)),
      (4L, Array(0f, 1f), Some(1L)),
      (5L, Array(-1f, 0f), Some(1L)),
      (6L, Array(0.95f, 0.05f), None))      // unlabeled: never mined
      .toDF("vec_id", "embedding", "label")
    val q = corpus.filter($"vec_id" === 1L)
      .select($"vec_id".as("query_id"), $"embedding", $"label")
    val got = Similarity.hardNegatives(corpus, q, k = 3)
      .orderBy("rank")
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getLong(4)))
    // label-0 neighbors (self, 2) and the unlabeled 6 are out; the
    // mined list is exactly the label-1 vectors by cosine
    assert(got.toSeq == Seq((1, 3L, 1L), (2, 4L, 1L), (3, 5L, 1L)))
  }

  test("annSearchRerank with full probes and full short list = brute force") {
    val corpus = clustered
    val queries = corpus.filter($"vec_id".isin(5L, 6L, 7L))
      .select($"vec_id".as("query_id"), $"embedding")
    val ivf = Similarity.buildIvfIndex(corpus, numCells = 4)
    val pq = Similarity.buildPqIndex(corpus, m = 4, codebookSize = 8)
    // nothing is cut anywhere -> the exact refine sees every vector and
    // the chain degenerates to brute force
    val out = Similarity.annSearchRerank(ivf, pq, queries,
      k = 3, candidates = 20, nprobe = 4)
      .select("query_id", "rank", "vec_id", "cosine")
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 3)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(out == exact)
  }

  test("annSearchRerank: the refine stage reorders the ADC short list") {
    val corpus = clustered
    val queries = corpus.filter($"vec_id" === 5L)
      .select($"vec_id".as("query_id"), $"embedding")
    val ivf = Similarity.buildIvfIndex(corpus, numCells = 4)
    val pq = Similarity.buildPqIndex(corpus, m = 4, codebookSize = 8)
    // candidates = k pins the id set to the ADC top-k (all cells probed
    // -> ADC side equals pqTopKWithIndex); ranks must follow EXACT
    // cosine, descending
    val out = Similarity.annSearchRerank(ivf, pq, queries,
      k = 4, candidates = 4, nprobe = 4).collect()
    val adcIds = Similarity.pqTopKWithIndex(pq, queries, k = 4)
      .collect().map(_.getLong(2)).toSet
    assert(out.map(_.getLong(2)).toSet == adcIds)
    val cosByRank = out.sortBy(_.getInt(1)).map(_.getDouble(3))
    assert(cosByRank.sameElements(cosByRank.sorted.reverse))
    intercept[IllegalArgumentException] {
      Similarity.annSearchRerank(ivf, pq, queries, k = 5, candidates = 4)
    }
  }

  test("randomProject: manual replay, codegen parity, JL distortion") {
    // sign matrix: deterministic, ±1, rectangular
    val signs = Similarity.jlSigns(dim = 8, outDim = 4, seed = 7L)
    assert(signs.length == 4 && signs.forall(_.length == 8))
    assert(signs.flatten.forall(v => v == 1.0 || v == -1.0))
    assert(signs.flatten.toSeq ==
      Similarity.jlSigns(8, 4, 7L).flatten.toSeq) // stable
    assert(signs.flatten.toSeq !=
      Similarity.jlSigns(8, 4, 8L).flatten.toSeq) // seed-sensitive

    val vecs = clustered
    def proj(codegen: Boolean): Map[Long, Seq[Double]] = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try Similarity.randomProject(vecs, "vec_id", "embedding",
          dim = 8, outDim = 4, seed = 7L)
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      finally spark.conf.set("spark.sql.codegen.wholeStage", true)
    }
    val got = proj(codegen = true)
    // exact manual replay of one row: out[i] = Σ signs(i)(j)·v[j] / √4
    val v5 = vecs.filter($"vec_id" === 5L)
      .collect()(0).getSeq[Float](1).map(_.toDouble)
    val want = signs.map(row =>
      row.zip(v5).map { case (s, x) => s * x }.sum / math.sqrt(4.0))
    assert(got(5L).zip(want).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    assert(got == proj(codegen = false))
    // JL smoke: projected pairwise euclidean distances stay within a
    // loose distortion band of the originals (Rademacher, outDim 4)
    val orig = vecs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    def d(a: Seq[Double], b: Seq[Double]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val ratios = for {
      i <- orig.keys.toSeq.sorted; j <- orig.keys.toSeq.sorted if i < j
      od = d(orig(i), orig(j)) if od > 0.1
    } yield d(got(i), got(j)) / od
    assert(ratios.nonEmpty && ratios.forall(r => r > 0.2 && r < 3.0),
      s"distortion out of band: min=${ratios.min} max=${ratios.max}")
  }

  /** Plain-Scala IVFADC reference (residual-encoded IVF-PQ): cells by
    * rounded cosine, codebook = residuals of the next cbSize vectors by
    * id, codes by rounded `rr − 2rc + cc` squared-L2, ADC per probed
    * cell — the full [[Similarity.ivfPqResidualTopK]] contract. */
  private def ivfPqResidualReference(vecs: Seq[(Long, Seq[Float])],
      queryIds: Seq[Long], k: Int, numCells: Int, nprobe: Int,
      m: Int, cbSize: Int): Set[(Long, Int, Long, Double)] = {
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def dotD(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < math.min(a.size, b.size)) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; nx += x * x; ny += y * y; i += 1
      }
      val den = math.sqrt(nx) * math.sqrt(ny)
      if (den > 0) dot / den else 0.0
    }
    val sd = vecs.head._2.size / m
    val cents = vecs.sortBy(_._1).take(numCells)
    def cellOf(v: Seq[Float]): Long = cents
      .map { case (cid, cv) => (r4(cos(v, cv)), cid) }
      .maxBy { case (c, cid) => (c, -cid) }._2
    val centOf = cents.toMap.map { case (cid, cv) =>
      cid -> cv.map(_.toDouble) }
    def resid(v: Seq[Float]): (Long, Seq[Double]) = {
      val cell = cellOf(v)
      (cell, v.map(_.toDouble).zip(centOf(cell)).map { case (x, c) => x - c })
    }
    def subOf(v: Seq[Double], j: Int) = v.slice(j * sd, j * sd + sd)
    val cbBase = vecs.sortBy(_._1).slice(numCells, numCells + cbSize)
      .map(v => resid(v._2)._2)
    val cb = (0 until m).map(j => cbBase.map(subOf(_, j)))
    def distForm(r: Seq[Double], c: Seq[Double]) =
      dotD(r, r) - 2.0 * dotD(r, c) + dotD(c, c)
    val encoded = vecs.map { case (id, v) =>
      val (cell, r) = resid(v)
      id -> (cell, (0 until m).map { j =>
        cb(j).zipWithIndex
          .map { case (c, i) => (r4(distForm(subOf(r, j), c)), i) }
          .minBy { case (d, i) => (d, i) }._2
      })
    }.toMap
    val byId = vecs.toMap
    queryIds.flatMap { qid =>
      val q = byId(qid)
      val probed = cents
        .map { case (cid, cv) => (r4(cos(q, cv)), cid) }
        .sortBy { case (c, cid) => (-c, cid) }.take(nprobe)
        .map(_._2).toSet
      val qr = probed.map { cell =>
        cell -> q.map(_.toDouble).zip(centOf(cell))
          .map { case (x, c) => x - c }
      }.toMap
      val scored = encoded.toSeq.collect {
        case (id, (cell, codes)) if probed(cell) =>
          val d = (0 until m).map { j =>
            distForm(subOf(qr(cell), j), cb(j)(codes(j)))
          }.sum
          (id, r4(d) + 0.0)
      }
      scored.sortBy { case (id, d) => (d, id) }.take(k).zipWithIndex
        .map { case ((id, d), i) => (qid, i + 1, id, d) }
    }.toSet
  }

  test("ivfPqResidualTopK matches a plain-Scala IVFADC reference") {
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 60L).map(id =>
      id -> Seq.fill(16)(rnd.nextFloat() * 2 - 1))
    val corpus = vecs.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id".isin(3L, 25L, 59L))
      .select($"vec_id".as("query_id"), $"embedding")
    val want = ivfPqResidualReference(vecs, Seq(3L, 25L, 59L), k = 4,
      numCells = 8, nprobe = 3, m = 4, cbSize = 8)
    val got = Similarity.ivfPqResidualTopK(corpus, queries, k = 4,
      numCells = 8, nprobe = 3, m = 4, codebookSize = 8)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == want)
    // partitioning invariance of the whole pipeline
    val got7 = Similarity.ivfPqResidualTopK(corpus.repartition(7), queries,
      k = 4, numCells = 8, nprobe = 3, m = 4, codebookSize = 8)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got7 == got)
  }

  test("ivfPqResidual: one cell + corpus-as-codebook gives exact sq-L2") {
    // numCells=1 puts everything in one cell; the codebook is then the
    // residuals of ALL remaining vectors, so each encodes to ITSELF
    // (distance exactly 0 at its own codeword) and the ADC estimate of
    // any query to any codebook member is the EXACT squared L2 distance
    // between their residuals = between the vectors themselves.
    val vecs: Seq[(Long, Seq[Float])] = (0L until 9L).map { id =>
      id -> (0 until 8).map(i => ((id * 3 + i * 5) % 11 - 5).toFloat / 4f)
    }
    val corpus = vecs.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id".isin(2L, 7L))
      .select($"vec_id".as("query_id"), $"embedding")
    val got = Similarity.ivfPqResidualTopK(corpus, queries, k = 9,
      numCells = 1, nprobe = 1, m = 2, codebookSize = 8)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val byId = vecs.toMap
    for (q <- Seq(2L, 7L); v <- 1L until 9L) {
      val want = r4(byId(q).zip(byId(v))
        .map { case (a, b) => (a.toDouble - b.toDouble) }
        .map(d => d * d).sum)
      val gotD = got((q, v))
      assert(math.abs(gotD - want) < 1e-9,
        s"query $q cand $v: got $gotD want $want")
    }
    // in particular the query itself is at distance 0, rank 1
    assert(got((2L, 2L)) == 0.0 && got((7L, 7L)) == 0.0)
  }

  test("embeddingCovariance matches a driver-computed reference") {
    val rnd = new scala.util.Random(3)
    val dim = 6
    val vecs = (0L until 40L).map(id =>
      id -> Seq.fill(dim)(rnd.nextFloat() * 2 - 1))
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.embeddingCovariance(df, "embedding", dim)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    assert(got.size == dim * (dim + 1) / 2)
    val n = vecs.size.toDouble
    val xs = vecs.map(_._2.map(_.toDouble))
    for (i <- 0 until dim; j <- i until dim) {
      val sxy = xs.map(v => v(i) * v(j)).sum
      val sx = xs.map(_(i)).sum
      val sy = xs.map(_(j)).sum
      val want = (sxy - sx * sy / n) / (n - 1)
      assert(math.abs(got((i, j)) - want) < 1e-9,
        s"cov($i,$j): got ${got((i, j))} want $want")
    }
  }

  test("whitenEmbeddings: whitened corpus has identity covariance") {
    val rnd = new scala.util.Random(9)
    val dim = 6
    // anisotropic by construction: dim 0 scaled 5x, dims correlated
    val vecs = (0L until 60L).map { id =>
      val base = Seq.fill(dim)(rnd.nextFloat() * 2 - 1)
      id -> base.zipWithIndex.map { case (v, i) =>
        if (i == 0) v * 5f else (v + base(0) * 0.5f)
      }
    }
    val df = vecs.toDF("vec_id", "embedding")
    val before = Similarity.embeddingCovariance(df, "embedding", dim)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    assert(math.abs(before((0, 0)) - 1.0) > 0.5, "fixture not anisotropic")
    val white = Similarity.whitenEmbeddings(df, "embedding", dim)
    val after = Similarity.embeddingCovariance(white, "embedding", dim)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    for (i <- 0 until dim; j <- i until dim) {
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(after((i, j)) - want) < 1e-3,
        s"whitened cov($i,$j) = ${after((i, j))}")
    }
  }

  test("mineBitext: planted translations mined, dense-hub pairs rejected") {
    // The margin is a RATIO against both sides' neighborhood averages,
    // so it discriminates by CONTRAST, not absolute cosine: a genuine
    // translation is far above everything else near either vector,
    // while a member of a dense template cluster (the hub failure mode
    // of raw-cosine mining) has a best cosine ≈ its whole neighborhood
    // average on BOTH sides → margin ≈ 1.
    val rnd = new scala.util.Random(5)
    def jitter(v: Seq[Float], eps: Float) =
      v.map(_ + (rnd.nextFloat() * 2 - 1) * eps)
    val a0 = Seq(1f, 0f, 0f, 0f, 1f, 0f, 0f, 0f)
    val a1 = Seq(0f, 1f, 0f, 0f, 0f, 1f, 0f, 0f)
    val hub = Seq(0f, 0f, 1f, 0f, 0f, 0f, 1f, 0f)
    // srcs: 0/1 have planted translations; 2 sits in the hub cluster,
    // as do filler srcs 4..6 (dense on BOTH sides)
    val srcVecs = Seq(0L -> a0, 1L -> a1, 2L -> jitter(hub, 0.03f),
      4L -> jitter(hub, 0.03f), 5L -> jitter(hub, 0.03f),
      6L -> jitter(hub, 0.03f))
    val tgtVecs =
      Seq(100L -> jitter(a0, 0.01f), 101L -> jitter(a1, 0.01f)) ++
        (110L until 116L).map(id => id -> jitter(hub, 0.03f)) ++
        (130L until 140L).map(id =>
          id -> Seq.fill(8)(rnd.nextFloat() * 0.4f - 0.2f))
    val src = srcVecs.toDF("vec_id", "embedding")
    val tgt = tgtVecs.toDF("vec_id", "embedding")
    val got = Similarity.mineBitext(src, tgt, k = 4, threshold = 1.05)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3), r.getInt(4)))
      .toMap
    // one row per src
    assert(got.keySet == Set(0L, 1L, 2L, 4L, 5L, 6L))
    // planted translations are each src's margin-best target, accepted
    assert(got(0L)._1 == 100L && got(0L)._3 == 1, s"src0 got ${got(0L)}")
    assert(got(1L)._1 == 101L && got(1L)._3 == 1, s"src1 got ${got(1L)}")
    // the hub src's best cosine is high, but its margin is ≈1: its
    // neighborhood average matches its best on both sides → rejected,
    // and dominated by both planted margins
    assert(got(2L)._3 == 0, s"hub src accepted: ${got(2L)}")
    assert(got(2L)._2 < got(0L)._2 && got(2L)._2 < got(1L)._2,
      s"hub margin ${got(2L)._2} vs planted ${got(0L)._2}/${got(1L)._2}")
  }

  test("mineBitextWithIndex: full probes/depth ≡ exact mineBitext; gate preserves planted pairs") {
    val rnd = new scala.util.Random(5)
    def jitter(v: Seq[Float], eps: Float) =
      v.map(_ + (rnd.nextFloat() * 2 - 1) * eps)
    val a0 = Seq(1f, 0f, 0f, 0f, 1f, 0f, 0f, 0f)
    val a1 = Seq(0f, 1f, 0f, 0f, 0f, 1f, 0f, 0f)
    val hub = Seq(0f, 0f, 1f, 0f, 0f, 0f, 1f, 0f)
    val srcVecs = Seq(0L -> a0, 1L -> a1, 2L -> jitter(hub, 0.03f),
      4L -> jitter(hub, 0.03f), 5L -> jitter(hub, 0.03f),
      6L -> jitter(hub, 0.03f))
    val tgtVecs =
      Seq(100L -> jitter(a0, 0.01f), 101L -> jitter(a1, 0.01f)) ++
        (110L until 116L).map(id => id -> jitter(hub, 0.03f)) ++
        (130L until 140L).map(id =>
          id -> Seq.fill(8)(rnd.nextFloat() * 0.4f - 0.2f))
    val src = srcVecs.toDF("vec_id", "embedding")
    val tgt = tgtVecs.toDF("vec_id", "embedding")
    def asMap(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), Option(r.get(3)), r.getInt(4)))
      .toMap
    // degeneracy: complete candidate graph (nprobe = numCells, depth ≥
    // both sides) makes the gated form EXACTLY the all-pairs operator —
    // same targets, cosines, margins, flags
    val exact = asMap(
      Similarity.mineBitext(src, tgt, k = 4, threshold = 1.05).collect())
    val full = asMap(Similarity.mineBitextWithIndex(src, tgt, k = 4,
      depth = 40, threshold = 1.05, numCells = 6, nprobe = 6).collect())
    assert(full == exact)
    // the gated run (nprobe < numCells, depth < |tgt|) still mines the
    // planted translations and rejects the dense hub: margins drift
    // with candidate coverage, the discrete decisions must not. nprobe
    // covers the hub's cell spread — a SPARSER probe thins the hub's
    // backward list so much its average collapses and the margin
    // inflates, the documented depth≫k / coverage requirement.
    val gated = asMap(Similarity.mineBitextWithIndex(src, tgt, k = 4,
      depth = 8, threshold = 1.05, numCells = 6, nprobe = 4).collect())
    assert(gated.keySet == Set(0L, 1L, 2L, 4L, 5L, 6L))
    assert(gated(0L)._1 == 100L && gated(0L)._4 == 1, s"src0 ${gated(0L)}")
    assert(gated(1L)._1 == 101L && gated(1L)._4 == 1, s"src1 ${gated(1L)}")
    assert(gated(2L)._4 == 0, s"hub src accepted: ${gated(2L)}")
  }

  test("mineBitextWithIndex numCells=0 auto-scales: ≡ explicit " +
      "scaledCellCount; formula clamps") {
    // the formula itself: ≈32/cell, clamped [16, 4096]
    assert(Similarity.scaledCellCount(10L) === 16)
    assert(Similarity.scaledCellCount(512L) === 16)
    assert(Similarity.scaledCellCount(3200L) === 100)
    assert(Similarity.scaledCellCount(1L << 40) === 4096)
    val rnd = new scala.util.Random(17)
    val src = (0L until 90L)
      .map(i => (i, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val tgt = (100L until 220L)
      .map(i => (i, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    def asRows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        Option(r.get(3)), r.getInt(4))).sortBy(_._1).toSeq
    // auto (default) ≡ spelling the per-side formula out by hand
    val auto = asRows(Similarity.mineBitextWithIndex(src, tgt,
      k = 3, depth = 8))
    val explicitCells = asRows(Similarity.mineBitextWithIndex(src, tgt,
      k = 3, depth = 8,
      numCells = Similarity.scaledCellCount(120L)))
    assert(Similarity.scaledCellCount(120L) === 16 &&
      Similarity.scaledCellCount(90L) === 16,
      "both sides clamp to 16 here — one explicit value replays both")
    assert(auto === explicitCells)
    intercept[IllegalArgumentException] {
      Similarity.mineBitextWithIndex(src, tgt, k = 3, depth = 8,
        numCells = 5000)
    }
  }

  test("ivfKnnJoin probing every cell ≡ brute-force kNN without self") {
    val rnd = new scala.util.Random(11)
    val corpus = (0L until 60L)
      .map(i => (i, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val ann = Similarity.ivfKnnJoin(corpus, k = 3, numCells = 4,
        nprobe = 4)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    // brute force per query, self excluded, same 4dp + id-tie rank
    val exact = Similarity.bruteForceTopK(
        corpus.select(col("vec_id"), col("embedding")),
        corpus.select(col("vec_id").as("query_id"), col("embedding")),
        k = 4)
      .filter(col("query_id") =!= col("vec_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1).toSeq
      .flatMap { case (q, rows) =>
        rows.sortBy(t => (-t._3, t._2)).take(3).zipWithIndex
          .map { case ((_, id, cos), i) => (q, i + 1, id, cos) }
      }.sortBy(t => (t._1, t._2)).toSeq
    assert(ann == exact)
  }

  test("ivfKnnJoin: probe selection is narrow (one Window total, the final top-k)") {
    val rnd = new scala.util.Random(5)
    val corpus = (0L until 40L)
      .map(i => (i, Seq.fill(8)(rnd.nextFloat())))
      .toDF("vec_id", "embedding")
    val df = Similarity.ivfKnnJoin(corpus, k = 2, numCells = 4, nprobe = 2)
    df.collect()
    // AQE prints the initial plan after the final one — only the final
    // section is the plan that ran
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // exactly ONE rank window (the final top-k) — probe-cell selection
    // must stay a narrow sort_array projection, not a per-query window
    assert("Window \\[".r.findAllIn(p).size == 1,
      s"expected exactly one Window node:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("standardizeEmbeddings: zero mean, unit variance per dimension") {
    val rnd = new scala.util.Random(17)
    // anisotropic: dim 0 wide + offset, dim 1 narrow
    val df = (0L until 400L)
      .map(i => (i, Array((rnd.nextGaussian() * 5 + 3).toFloat,
        (rnd.nextGaussian() * 0.2 - 1).toFloat)))
      .toDF("vec_id", "embedding")
    val z = Similarity.standardizeEmbeddings(df, "embedding", dim = 2)
      .select(posexplode(col("embedding"))).collect()
      .map(r => r.getInt(0) -> r.getDouble(1))
    for (d <- 0 to 1) {
      val vs = z.filter(_._1 == d).map(_._2)
      val mean = vs.sum / vs.length
      val varr = vs.map(x => (x - mean) * (x - mean)).sum / (vs.length - 1)
      assert(math.abs(mean) < 1e-9, s"dim $d mean $mean")
      assert(math.abs(varr - 1.0) < 1e-9, s"dim $d var $varr")
    }
  }

  test("ivfKnnJoin hot-cell guard trims overflowed cells to lowest ids") {
    // degenerate corpus: identical vectors → every row lands in ONE cell
    val corpus = (0L until 40L).map(i => (i, Seq(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val capped = Similarity.ivfKnnJoin(corpus, k = 3, numCells = 2,
        nprobe = 1, maxCellSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    // every served neighbour comes from the 10 lowest-id members
    assert(capped.nonEmpty)
    assert(capped.forall(_._2 < 10L),
      s"neighbour outside the trimmed cell: ${capped.toSeq.take(5)}")
    // a cap that nothing exceeds leaves results identical to uncapped
    val a = Similarity.ivfKnnJoin(corpus, k = 3, numCells = 2,
        nprobe = 1, maxCellSize = 1000)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = Similarity.ivfKnnJoin(corpus, k = 3, numCells = 2,
        nprobe = 1, maxCellSize = 0)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a == b)
  }
}
