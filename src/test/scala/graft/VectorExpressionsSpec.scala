package graft

import graft.functions.VectorExpressions
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Native vector expressions ≡ the generic HOF forms (which are the
  * readable spec), on both float and double arrays. */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 2.0f), Array(0.5f, -1.0f, 2.0f)),
    (2L, Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f)),
    (3L, Array(-1.5f, 2.5f, 0.25f), Array(-1.5f, 2.5f, 0.25f)))

  test("cosineSim ≡ HOF cosine on float arrays") {
    val df = vecs.toDF("id", "a", "b")
      .withColumn("fast", VectorExpressions.cosineSim($"a", $"b"))
      .withColumn("slow", {
        val d = Similarity.dot($"a", $"b")
        val n = sqrt(Similarity.dot($"a", $"a")) * sqrt(Similarity.dot($"b", $"b"))
        when(n > 0, d / n).otherwise(lit(0.0))
      })
    df.collect().foreach { r =>
      assert(math.abs(r.getDouble(3) - r.getDouble(4)) < 1e-12,
        s"row ${r.getLong(0)}")
    }
    // zero vector → 0.0, identical vector → 1.0
    val byId = df.collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(byId(2L) == 0.0)
    assert(math.abs(byId(3L) - 1.0) < 1e-12)
  }

  test("dotProduct ≡ HOF dot; double arrays too") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b")
      .withColumn("fast", VectorExpressions.dotProduct($"a", $"b"))
      .withColumn("slow", Similarity.dot($"a", $"b"))
    val r = df.collect().head
    assert(r.getDouble(2) == 32.0 && r.getDouble(3) == 32.0)
  }

  test("lshKeys: one key per table, sign-bit semantics") {
    val tables = Seq(
      Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)),   // planes: x>=0 bit0, y>=0 bit1
      Seq(Seq(-1.0, 0.0), Seq(0.0, -1.0))) // inverted
    val df = Seq(
      (1L, Array(2.0f, 3.0f)),   // t0: both pos → 3; t1: both neg → 0
      (2L, Array(-2.0f, 3.0f)))  // t0: bit1 only → 2; t1: bit0 only → 1
      .toDF("id", "v")
      .withColumn("keys", VectorExpressions.lshKeys($"v", tables))
    val got = df.orderBy("id").collect()
      .map(_.getSeq[Int](2).toSeq)
    assert(got(0) == Seq(3, 0))
    assert(got(1) == Seq(2, 1))
  }

  test("SQL registration: graft_cosine / graft_dot callable from spark.sql") {
    graft.functions.GraftFunctions.register(spark)
    vecs.toDF("id", "a", "b").createOrReplaceTempView("vecs_t")
    val r = spark.sql(
      "SELECT id, graft_cosine(a, b) AS c, graft_dot(a, b) AS d FROM vecs_t " +
        "WHERE id = 3").collect().head
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(r.getDouble(2) > 0)
    // set-intersection and minhash kernels, and the lang-id argmax
    val s = spark.sql(
      "SELECT graft_sorted_intersect(array(1L,3L,5L), array(3L,4L,5L)) i, " +
        "graft_equal_components(array(1L,2L,3L), array(1L,9L,3L)) e, " +
        "graft_lang_guess(array('the','quick','fox','the')) g, " +
        "graft_lang_guess(array('zzz')) u").collect().head
    assert(s.getInt(0) == 2 && s.getInt(1) == 2)
    assert(s.getString(2) == "en" && s.getString(3) == "und")
    // vec diff and the perceptual hash
    val t = spark.sql(
      "SELECT graft_vec_diff(array(3.0D, 1.0D), array(1.0D, 2.0D)) v, " +
        "graft_dhash64(transform(sequence(0, 63), i -> " +
        "cast(i % 7 as int))) h").collect().head
    assert(t.getSeq[Double](0) == Seq(2.0, -1.0))
    assert(t.getLong(1) != 0L)
  }

  test("quantizeInt8: range, zero vector, scale cancellation in cosine") {
    val df = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),      // zero vector
      (3L, Array(2.0f, -4.0f, 1.0f, 0.0f)))     // 4× doc 1: same direction
      .toDF("vec_id", "embedding")
    val q = df.select($"vec_id",
      graft.functions.VectorExpressions.quantizeInt8($"embedding").as("q"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(q(1L) == Seq(64, -127, 32, 0)) // floor(x*127/1 + 0.5)
    assert(q(2L) == Seq(0, 0, 0, 0))
    assert(q(3L) == Seq(64, -127, 32, 0), "scale cancels: same direction " +
      "→ identical quantized vector")
    assert(q.values.flatten.forall(v => v >= -127 && v <= 127))
    // cosine of colinear vectors stays 1.0 after quantization
    val c = df.filter($"vec_id" === 1L).crossJoin(
      df.filter($"vec_id" === 3L).select($"embedding".as("e2")))
      .select(Similarity.cosine(
        graft.functions.VectorExpressions.quantizeInt8($"embedding")
          .cast("array<float>"),
        graft.functions.VectorExpressions.quantizeInt8($"e2")
          .cast("array<float>")).as("c"))
      .as[Double].head()
    assert(math.abs(c - 1.0) < 1e-9)
    // SQL registration
    graft.functions.GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_quantize_int8(array(0.5F, -1.0F, 0.25F, 0.0F)) q")
      .collect().head.getSeq[Int](0)
    assert(viaSql == Seq(64, -127, 32, 0))
  }

  test("expressions survive filters/joins (codegen path)") {
    val emb = (0 until 100)
      .map(i => (i.toLong, Array.tabulate(8)(d => ((i * 7 + d) % 13 - 6).toFloat)))
      .toDF("vec_id", "embedding")
    val queries = emb.filter($"vec_id" < 2)
      .select($"vec_id".as("query_id"), $"embedding")
    val top = Similarity.bruteForceTopK(emb, queries, k = 3, dim = 8)
    val rows = top.collect()
    assert(rows.length == 6)
    // rank 1 must be the query itself at cosine 1.0
    rows.filter(_.getInt(1) == 1).foreach { r =>
      assert(r.getLong(0) == r.getLong(2) && r.getDouble(3) == 1.0)
    }
    val approx = Similarity.lshTopK(emb, queries, k = 3, dim = 8,
      numPlanes = 6, numTables = 4, probeHamming = 2)
    assert(approx.collect().nonEmpty)
  }

  test("vecDiff ≡ zip_with subtraction; mixed types; common prefix") {
    // float - float: widens exactly, matches the HOF form bit-for-bit
    val df = vecs.toDF("id", "a", "b")
      .withColumn("fast", VectorExpressions.vecDiff($"a", $"b"))
      .withColumn("slow",
        zip_with($"a", $"b", (x, y) => x.cast("double") - y.cast("double")))
    df.collect().foreach { r =>
      assert(r.getSeq[Double](3) == r.getSeq[Double](4),
        s"row ${r.getLong(0)}")
    }
    // float - double (the residual shape: float corpus, double centroid)
    val mixed = Seq((Array(1.5f, -2.0f, 0.25f), Array(0.5, 0.5, 0.5)))
      .toDF("a", "b")
      .select(VectorExpressions.vecDiff($"a", $"b").as("d"))
      .collect().head.getSeq[Double](0)
    assert(mixed == Seq(1.0, -2.5, -0.25))
    // unequal lengths: the common prefix, like dotProduct
    val pref = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 1.0)))
      .toDF("a", "b")
      .select(VectorExpressions.vecDiff($"a", $"b").as("d"))
      .collect().head.getSeq[Double](0)
    assert(pref == Seq(0.0, 1.0))
    // null propagates
    val n = Seq((Option.empty[Array[Double]], Option(Array(1.0))))
      .toDF("a", "b")
      .select(VectorExpressions.vecDiff($"a", $"b").as("d"))
      .collect().head
    assert(n.isNullAt(0))
  }

  test("topCells ≡ the literal-tree form it replaced: order, ties, rounding") {
    val rnd = new scala.util.Random(31)
    val cents: Seq[(Long, Seq[Double])] = (0 until 16)
      .map(c => (c * 7L, Seq.fill(8)(rnd.nextGaussian())))
    val vecs = (0L until 100L)
      .map(i => (i, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    // reference: the old explode + per-query rank over rounded cosines
    val scored = explode(array(cents.map { case (cid, cvec) =>
      struct(lit(cid).as("cell"),
        round(VectorExpressions.cosineSim($"embedding", typedlit(cvec)), 4)
          .as("cos"))
    }: _*))
    val wq = org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
      .orderBy($"__cs.cos".desc, $"__cs.cell")
    val ref = vecs.withColumn("__cs", scored)
      .withColumn("rn", row_number().over(wq)).filter($"rn" <= 3)
      .select($"vec_id", $"rn", $"__cs.cell", $"__cs.cos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).sortBy(t => (t._1, t._2)).toSeq
    val got = vecs.select($"vec_id", posexplode(
        VectorExpressions.topCells($"embedding", cents, 3)))
      .select($"vec_id", ($"pos" + 1).as("rn"), $"col.cell", $"col.cos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).sortBy(t => (t._1, t._2)).toSeq
    assert(got == ref)
    // planted tie: two identical centroids with different ids — the
    // lower id must rank first (the array_max (cos, -id) tie rule)
    val tied = Seq((99L, Seq(1.0, 0.0)), (3L, Seq(1.0, 0.0)),
      (50L, Seq(0.0, 1.0)))
    val t = Seq((0L, Array(1.0f, 0.1f))).toDF("vec_id", "embedding")
      .select(VectorExpressions.topCells($"embedding", tied, 2).as("t"))
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(t.map(_.getLong(0)) == Seq(3L, 99L))
  }

  private def javaSize(o: AnyRef): Int = {
    val buf = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(buf)
    oos.writeObject(o); oos.close()
    buf.size()
  }

  test("broadcast-backed TopCells/PqEncode: bit-identical, auto-selected, task-binary bounded") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 50L)
      .map(i => (i, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    // battery size (16 cells × 8 dims, under the threshold): the wrapper
    // must keep the references-array form — zero change to every
    // existing plan
    val small: Seq[(Long, Seq[Double])] = (0 until 16)
      .map(c => (c * 3L, Seq.fill(8)(rnd.nextGaussian())))
    val smallCol = VectorExpressions.topCells($"embedding", small, 3)
    assert(org.apache.spark.sql.graftbridge.ColumnBridge.expr(smallCol).toString.contains("graft_top_cells") &&
      !org.apache.spark.sql.graftbridge.ColumnBridge.expr(smallCol).toString.contains("graft_top_cells_bc"))
    // planted production-scale centroid set: 10⁴ cells × 8 dims crosses
    // the element threshold → broadcast form, results BIT-IDENTICAL to
    // the references-array expression over the same matrix
    val big: Seq[(Long, Seq[Double])] = (0 until 10000)
      .map(c => (c.toLong, Seq.fill(8)(rnd.nextGaussian())))
    val bigCol = VectorExpressions.topCells($"embedding", big, 4)
    assert(org.apache.spark.sql.graftbridge.ColumnBridge.expr(bigCol).toString.contains("graft_top_cells_bc"))
    val inline = org.apache.spark.sql.graftbridge.ColumnBridge.of(
      VectorExpressions.TopCells(
        org.apache.spark.sql.graftbridge.ColumnBridge.expr($"embedding"),
        big.map(_._2.toArray).toArray, big.map(_._1).toArray, 4))
    val a = vecs.select($"vec_id", bigCol.as("t")).collect()
      .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getLong(0), x.getDouble(1))).toSeq).toMap
    val b = vecs.select($"vec_id", inline.as("t")).collect()
      .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getLong(0), x.getDouble(1))).toSeq).toMap
    assert(a == b)
    // the size claim itself: the broadcast form serializes to a handle,
    // the inline form carries the whole matrix into every task binary
    val bcBytes = javaSize(org.apache.spark.sql.graftbridge.ColumnBridge.expr(bigCol))
    val inlineBytes = javaSize(org.apache.spark.sql.graftbridge.ColumnBridge.expr(inline))
    assert(bcBytes < 64 * 1024, s"broadcast expr is $bcBytes B")
    assert(inlineBytes > 10 * bcBytes,
      s"inline $inlineBytes B vs broadcast $bcBytes B")
    // PqEncode: same contract, L2 mode, big codebook (8 × 256 × 64)
    val cb: Seq[Seq[Seq[Double]]] = (0 until 8).map(_ =>
      (0 until 256).map(_ => Seq.fill(64)(rnd.nextGaussian())))
    val cc: Seq[Seq[Double]] = cb.map(_.map(cw => cw.map(x => x * x).sum))
    val wide = (0L until 20L)
      .map(i => (i, Array.fill(512)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val pqBc = VectorExpressions.pqEncode($"embedding", cb, cc)
    assert(org.apache.spark.sql.graftbridge.ColumnBridge.expr(pqBc).toString.contains("graft_pq_encode_bc"))
    val pqInline = org.apache.spark.sql.graftbridge.ColumnBridge.of(
      VectorExpressions.PqEncode(
        org.apache.spark.sql.graftbridge.ColumnBridge.expr($"embedding"),
        cb.map(_.map(_.toArray).toArray).toArray,
        cc.map(_.toArray).toArray, l2 = true))
    val pa = wide.select($"vec_id", pqBc.as("c")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    val pb = wide.select($"vec_id", pqInline.as("c")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(pa == pb)
    assert(javaSize(org.apache.spark.sql.graftbridge.ColumnBridge.expr(pqBc)) < 64 * 1024)
  }

  test("centroid broadcast cache: content-equal matrices share one " +
      "broadcast; clear keeps old plans correct; n fails fast") {
    val rnd = new scala.util.Random(11)
    val big: Seq[(Long, Seq[Double])] = (0 until 10000)
      .map(c => (c.toLong, Seq.fill(8)(rnd.nextGaussian())))
    // equal content, DISTINCT objects — identity caching would miss
    val bigCopy: Seq[(Long, Seq[Double])] =
      big.map { case (id, v) => (id, v.toVector) }
    def bcId(c: org.apache.spark.sql.Column): Long =
      org.apache.spark.sql.graftbridge.ColumnBridge.expr(c) match {
        case VectorExpressions.TopCellsBc(_, bc, _) => bc.id
        case e => fail(s"expected TopCellsBc, got $e")
      }
    VectorExpressions.clearCentroidBroadcasts()
    val c1 = VectorExpressions.topCells($"embedding", big, 3)
    val c2 = VectorExpressions.topCells($"embedding", bigCopy, 4)
    assert(bcId(c1) === bcId(c2),
      "two plans over the same centroid set must share one broadcast")
    val vecs = (0L until 20L)
      .map(i => (i, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    def run(c: org.apache.spark.sql.Column) =
      vecs.select($"vec_id", c.as("t")).collect()
        .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getLong(0), x.getDouble(1))).toSeq).toMap
    val before = run(c1)
    // unpersist, not destroy: a plan still holding the handle re-fetches
    VectorExpressions.clearCentroidBroadcasts()
    assert(run(c1) === before,
      "clearing the cache must leave existing plans correct")
    // a post-clear call mints a fresh broadcast (the cache is empty)
    val c3 = VectorExpressions.topCells($"embedding", big, 3)
    assert(bcId(c3) !== bcId(c1))
    assert(run(c3) === before)
    // n > candidate cells fails fast on the broadcast form too (the
    // references-array form already threw)
    intercept[IllegalArgumentException] {
      VectorExpressions.topCells($"embedding", big, big.size + 1)
    }
    VectorExpressions.clearCentroidBroadcasts()
  }

  test("centroid broadcast cache is LRU-bounded: inserting past the " +
      "bound evicts the oldest, results unchanged") {
    val rnd = new scala.util.Random(13)
    // each matrix crosses BroadcastElemThreshold (2^16 elements):
    // 8300 cells x 8 dims = 66400 doubles
    def mat(seed: Int): Seq[(Long, Seq[Double])] = {
      val r = new scala.util.Random(seed)
      (0 until 8300).map(c => (c.toLong, Seq.fill(8)(r.nextGaussian())))
    }
    VectorExpressions.clearCentroidBroadcasts()
    val bound = VectorExpressions.MaxCentroidBroadcasts
    val first = VectorExpressions.topCells($"embedding", mat(0), 3)
    val vecs = (0L until 10L)
      .map(i => (i, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    def run(c: org.apache.spark.sql.Column) =
      vecs.select($"vec_id", c.as("t")).collect()
        .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getLong(0), x.getDouble(1))).toSeq).toMap
    val firstResult = run(first)
    // flood with `bound` MORE distinct generations: size plateaus at
    // the bound, the first (least recently used) entry is evicted
    (1 to bound).foreach(i =>
      VectorExpressions.topCells($"embedding", mat(i), 3): Unit)
    assert(VectorExpressions.centroidBroadcastCacheSize === bound,
      "cache must plateau at MaxCentroidBroadcasts")
    // the evicted entry was unpersisted, not destroyed: the old plan
    // still evaluates correctly (executors re-fetch lazily)
    assert(run(first) === firstResult,
      "an evicted broadcast's plan must still be correct")
    // re-requesting the evicted matrix mints a fresh broadcast and the
    // cache stays at the bound
    val again = VectorExpressions.topCells($"embedding", mat(0), 3)
    assert(run(again) === firstResult)
    assert(VectorExpressions.centroidBroadcastCacheSize === bound)
    VectorExpressions.clearCentroidBroadcasts()
    assert(VectorExpressions.centroidBroadcastCacheSize === 0)
  }
}
