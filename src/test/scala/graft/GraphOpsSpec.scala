package graft

import graft.operators.GraphOps
import org.apache.spark.sql.functions._

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank on a hand graph matches the fixed-point recurrence") {
    // 3-node graph: 0→1, 0→2, 1→2, 2→0. N=3, S=1e12, d=17/20.
    // pr0 = S div 3 = 333333333333
    // teleport = 3S div 60 = 50000000000
    // iter 1:
    //   node0 ← 2: (333333333333*17) div (20*1) = 283333333333 (floor)
    //   node1 ← 0: (333333333333*17) div (20*2) = 141666666666
    //   node2 ← 0,1: 141666666666 + 283333333333 = 425000000000 — wait
    //     1→2 has outdeg 1: (333333333333*17) div 20 = 283333333333;
    //     0→2 outdeg 2: 141666666666; sum = 424999999999? compute exactly:
    //     333333333333*17 = 5666666666661; div 40 = 141666666666 (r 21)
    //     div 20 = 283333333333 (r 1)
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val nodes = Seq(0L, 1L, 2L).toDF("id")
    val pr1 = GraphOps.pageRank(edges, nodes, "id", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tele = 50000000000L
    assert(pr1(0L) == tele + 283333333333L)
    assert(pr1(1L) == tele + 141666666666L)
    assert(pr1(2L) == tele + 141666666666L + 283333333333L)
  }

  test("pageRank conserves mass up to teleport/floor leakage and converges toward hubs") {
    // star: everyone points at node 0 plus a back-edge so 0 isn't dangling
    val edges = (1L to 9L).map(i => (i, 0L)).toDF("src", "dst")
      .union(Seq((0L, 1L)).toDF("src", "dst"))
    val nodes = (0L to 9L).toDF("id")
    val pr = GraphOps.pageRank(edges, nodes, "id", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the hub dominates every spoke
    assert((1L to 9L).forall(i => pr(0L) > pr(i)))
    // total mass stays within a loose band of S (floor leakage only
    // shrinks it; dangling-free graph keeps it near S)
    val total = pr.values.sum
    assert(total <= GraphOps.PrScale && total > GraphOps.PrScale * 9 / 10)
  }

  test("nodes with no in-edges receive exactly the teleport term") {
    val edges = Seq((0L, 1L)).toDF("src", "dst")
    val nodes = (0L to 2L).toDF("id")
    val pr = GraphOps.pageRank(edges, nodes, "id", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // node 0 and 2 have no in-edges → teleport only: 3S div (20*3)
    val tele = 3L * GraphOps.PrScale / (20L * 3L)
    assert(pr(0L) == tele)
    assert(pr(2L) == tele)
    assert(pr(1L) > tele)
  }

  test("knnEdgesExact: uniform out-degree, no self-edges, cosine ties break by dst") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(1.0f, 0.01f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(-1.0f, 0.0f)),
      (4L, Array(1.0f, -0.01f))).toDF("vec_id", "embedding")
    val edges = GraphOps.knnEdgesExact(emb, "vec_id", "embedding", k = 2)
      .collect()
    assert(edges.length == 10)
    assert(edges.forall(r => r.getLong(0) != r.getLong(1)))
    val outDeg = edges.groupBy(_.getLong(0)).map(_._2.length).toSet
    assert(outDeg == Set(2))
    // node 0's nearest: 1 and 4 are symmetric (cos rounds to 1.0 for
    // both at 4dp); tie breaks by dst asc → rank1=1, rank2=4
    val n0 = edges.filter(_.getLong(0) == 0L).sortBy(_.getInt(3))
    assert(n0.map(_.getLong(1)).toSeq == Seq(1L, 4L))
  }

  test("deep iteration: truncated lineage ≡ unrolled, final plan depth bounded") {
    val edges = (0L until 20L).flatMap(i =>
      Seq((i, (i + 1) % 20), (i, (i * 7 + 3) % 20))).toDF("src", "dst")
    val nodes = (0L until 20L).toDF("id")
    val cut = GraphOps.pageRank(edges, nodes, "id", iters = 12,
      truncateEvery = 3)
    val unrolled = GraphOps.pageRank(edges, nodes, "id", iters = 12,
      truncateEvery = 100)
    val a = cut.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).toSeq
    val b = unrolled.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).toSeq
    // integer arithmetic: materialization cannot perturb a single unit
    assert(a == b)
    // the truncated form's final frame hangs off a checkpointed RDD, not
    // the 12-iteration join tree — analysis cost stays flat in iters
    val planLines = cut.queryExecution.optimizedPlan.treeString.linesIterator.size
    val unrolledLines =
      unrolled.queryExecution.optimizedPlan.treeString.linesIterator.size
    assert(planLines < 10, s"truncated plan has $planLines nodes")
    assert(unrolledLines > 5 * planLines,
      s"unrolled $unrolledLines vs truncated $planLines")
  }

  test("tolE12 stop: a converged state is a fixpoint, early stop ≡ full run") {
    // directed cycle, uniform out-degree 1: the uniform vector is an
    // EXACT integer fixpoint (teleport 3S div 20N + (S div N)·17 div 20
    // = S div N for N | S), so the delta hits 0 at iteration 1 and the
    // tol run must return iteration-1 values no matter how many
    // iterations were requested — fast, and bit-identical
    val edges = (0L until 10L).map(i => (i, (i + 1) % 10)).toDF("src", "dst")
    val nodes = (0L until 10L).toDF("id")
    val full = GraphOps.pageRank(edges, nodes, "id", iters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val tol = GraphOps.pageRank(edges, nodes, "id", iters = 500,
      tolE12 = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(tol == full)
    assert(tol.forall(_._2 == GraphOps.PrScale / 10))
    // a non-fixpoint graph under a LOOSE tol still equals the plain run
    // truncated at the stop point: stopping is exact, never approximate
    val e2 = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val n2 = Seq(0L, 1L, 2L).toDF("id")
    val t2 = GraphOps.pageRank(e2, n2, "id", iters = 50,
      tolE12 = GraphOps.PrScale) // huge tol → stops after iteration 1
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val one = GraphOps.pageRank(e2, n2, "id", iters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(t2 == one)
  }

  test("pageRank is partition-invariant (integer sums are order-free)") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (0L, 2L),
      (1L, 3L), (2L, 0L), (3L, 1L)).toDF("src", "dst")
    val nodes = (0L to 3L).toDF("id")
    val a = GraphOps.pageRank(edges.repartition(1), nodes, "id", iters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = GraphOps.pageRank(edges.repartition(7), nodes, "id", iters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a == b)
  }
}
