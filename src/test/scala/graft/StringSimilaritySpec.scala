package graft

import graft.operators.StringSimilarity
import org.apache.spark.sql.functions._

/** Edit-distance join vs a brute-force quadratic levenshtein — BOTH
  * candidate strategies (deletion neighborhood, two-sided q-gram prefix)
  * must be LOSSLESS at every threshold they claim, and the auto router
  * must agree with both. */
class StringSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def bruteForce(names: Seq[(Long, String)], d: Int) = {
    def lev(a: String, b: String): Int = {
      val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
          m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      m(a.length)(b.length)
    }
    (for {
      (ia, sa) <- names; (ib, sb) <- names if ia < ib
      dist = lev(sa, sb) if dist <= d
    } yield (ia, ib, dist)).toSet
  }

  // identifier-like corpus: shared ubiquitous grams, rare digit cores —
  // plus clusters at distance 1 (substitution / insertion / deletion)
  private val names = Seq(
    1L -> "Customer#000000001", 2L -> "Customer#000000002", // sub, d=1
    3L -> "Customer#00000001",                              // del vs 1, d=1
    4L -> "Customer#0000000013",                            // ins vs ...? far
    5L -> "Customer#000911001",                             // d=2 vs 1
    6L -> "Wholesale#77",        7L -> "Wholesale#78",      // short tail
    8L -> "ab",                  9L -> "ac",                // len < q
    10L -> "b",                 11L -> "",                  // degenerate
    12L -> "Customer#000000001")                            // exact dup of 1

  private val df = names.toDF("id", "name")

  // long strings (> auto-route's 32-char bound): repeated filler makes
  // most grams ubiquitous; edits land early, middle, and late so the
  // positional band and both prefix cutoffs are exercised
  private val longNames = {
    val filler = "lorem ipsum dolor sit amet " * 3 // 81 chars
    Seq(
      21L -> (filler + "alpha"), 22L -> (filler + "alphb"),  // late sub
      23L -> (filler + "alph"),                              // late del
      24L -> ("X" + filler + "alpha"),                       // early ins vs 21
      25L -> (filler.replace("dolor", "dolos") + "alpha"),   // mid sub vs 21
      26L -> (filler + "omega"), 27L -> (filler + "omeg"),
      28L -> filler.trim)
  }
  private val longDf = longNames.toDF("id", "name")

  for (strategy <- Seq("auto", "neighborhood", "qgram")) {
    test(s"d=1 join equals brute force [$strategy]") {
      for (q <- Seq(2, 3, 4)) {
        val got = StringSimilarity.editDistanceJoin(df, "id", "name",
          maxDist = 1, q = q, strategy = strategy)
          .as[(Long, Long, Int)].collect().toSet
        assert(got == bruteForce(names, 1), s"q=$q strategy=$strategy")
      }
    }

    test(s"d=2 join equals brute force [$strategy]") {
      val got = StringSimilarity.editDistanceJoin(df, "id", "name",
        maxDist = 2, q = 2, strategy = strategy)
        .as[(Long, Long, Int)].collect().toSet
      assert(got == bruteForce(names, 2))
    }

    test(s"d=0 finds exactly the byte-identical pair [$strategy]") {
      val got = StringSimilarity.editDistanceJoin(df, "id", "name",
        maxDist = 0, q = 2, strategy = strategy)
        .as[(Long, Long, Int)].collect().toSet
      assert(got == Set((1L, 12L, 0)))
    }
  }

  test("long strings: two-sided prefix path equals brute force (d=1, d=2)") {
    for (d <- Seq(1, 2); q <- Seq(2, 4)) {
      val got = StringSimilarity.editDistanceJoin(longDf, "id", "name",
        maxDist = d, q = q) // auto must route these (len > 32) to qgram
        .as[(Long, Long, Int)].collect().toSet
      assert(got == bruteForce(longNames, d), s"d=$d q=$q")
    }
  }

  test("randomized corpora: both strategies lossless at every (q, d)") {
    // adversarial-by-volume check of the two-sided prefix lemma (the
    // +2d counting argument) and the deletion-neighborhood recall:
    // small alphabet → dense near-matches and heavy gram skew
    val rnd = new scala.util.Random(4242)
    val alpha = "abc"
    def word(max: Int) =
      Seq.fill(rnd.nextInt(max) + 1)(alpha(rnd.nextInt(alpha.size))).mkString
    for (trial <- 0 until 3) {
      val corpus = (1L to 40L).map(i => i -> word(8 + trial * 12))
      val cdf = corpus.toDF("id", "name")
      for (d <- Seq(1, 2); q <- Seq(2, 3)) {
        val want = bruteForce(corpus, d)
        for (strategy <- Seq("neighborhood", "qgram")) {
          val got = StringSimilarity.editDistanceJoin(cdf, "id", "name",
            maxDist = d, q = q, strategy = strategy)
            .as[(Long, Long, Int)].collect().toSet
          assert(got == want,
            s"trial=$trial d=$d q=$q strategy=$strategy: " +
              s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
        }
      }
    }
  }

  test("qgram path stays lossless at d=3 (widest prefix band tested)") {
    // the +2d rank-slack band grows with d; d=3 is beyond the auto
    // router's neighborhood range, so this is the path real callers hit
    val rnd = new scala.util.Random(99)
    val alpha = "ab"
    def word(max: Int) =
      Seq.fill(rnd.nextInt(max) + 1)(alpha(rnd.nextInt(alpha.size))).mkString
    val corpus = (1L to 30L).map(i => i -> word(10))
    val got = StringSimilarity.editDistanceJoin(
      corpus.toDF("id", "name"), "id", "name",
      maxDist = 3, q = 2, strategy = "qgram")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == bruteForce(corpus, 3))
    assert(got.nonEmpty, "degenerate fixture: no pairs at d=3")
  }

  test("exhaustive micro-universe: every string of length <= 4 over {a,b}") {
    // closed-universe check of the prefix lemma and the short-string
    // escape hatch: all 31 strings, all 465 pairs, every (q, d) cell
    val universe = (0 to 4).flatMap(n =>
      (0 until (1 << n)).map(bits =>
        (0 until n).map(i => if ((bits >> i & 1) == 1) 'b' else 'a').mkString))
      .distinct.zipWithIndex.map { case (s, i) => (i + 1).toLong -> s }
    val df = universe.toDF("id", "name")
    for (d <- 0 to 2; q <- Seq(2, 3); strategy <- Seq("neighborhood", "qgram")) {
      val got = StringSimilarity.editDistanceJoin(df, "id", "name",
        maxDist = d, q = q, strategy = strategy)
        .as[(Long, Long, Int)].collect().toSet
      assert(got == bruteForce(universe, d), s"d=$d q=$q strategy=$strategy")
    }
  }

  private def bruteForceBetween(ls: Seq[(Long, String)],
      rs: Seq[(Long, String)], d: Int): Set[(Long, Long, Int)] = {
    def lev(a: String, b: String): Int = {
      val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
          m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      m(a.length)(b.length)
    }
    (for {
      (il, sl) <- ls; (ir, sr) <- rs
      dist = lev(sl, sr) if dist <= d
    } yield (il, ir, dist)).toSet
  }

  test("between-join (R×S) lossless under both strategies") {
    val rnd = new scala.util.Random(77)
    val alpha = "abc"
    def word(max: Int) =
      Seq.fill(rnd.nextInt(max) + 1)(alpha(rnd.nextInt(alpha.size))).mkString
    for (trial <- 0 until 3) {
      val ls = (1L to 25L).map(i => i -> word(6 + trial * 14))
      val rs = (101L to 130L).map(i => i -> word(6 + trial * 14))
      val (ldf, rdf) = (ls.toDF("lid", "lname"), rs.toDF("rid", "rname"))
      for (d <- Seq(0, 1, 2); strategy <- Seq("neighborhood", "qgram")) {
        val got = StringSimilarity.editDistanceJoinBetween(
          ldf, rdf, "lid", "lname", "rid", "rname",
          maxDist = d, q = 2, strategy = strategy)
          .as[(Long, Long, Int)].collect().toSet
        assert(got == bruteForceBetween(ls, rs, d),
          s"trial=$trial d=$d strategy=$strategy")
      }
    }
    // orientation is preserved: id_a always from the left input
    val got = StringSimilarity.editDistanceJoinBetween(
      Seq(1L -> "abc").toDF("lid", "ls"), Seq(9L -> "abd").toDF("rid", "rs"),
      "lid", "ls", "rid", "rs", maxDist = 1)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 9L, 1)))
  }

  test("deletionVariantHashes: codegen and interpreted agree on sizes") {
    val df = Seq("abc", "a", "", "aaa").toDF("s")
    def run(codegen: Boolean): Seq[Int] = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      try df.select(size(graft.functions.EditDistanceExpressions
          .deletionVariantHashes(col("s"), 1)).as("n"))
        .as[Int].collect().toSeq
      finally spark.conf.set("spark.sql.codegen.wholeStage", true)
    }
    // "abc" → {abc, bc, ac, ab}; "a" → {a, ""}; "" → {""};
    // "aaa" → {aaa, aa} (string-dedup, not position-dedup)
    assert(run(codegen = true) == Seq(4, 2, 1, 2))
    assert(run(codegen = true) == run(codegen = false))
  }

  test("neighborhood and qgram agree on a mixed-length corpus") {
    val mixed = (names ++ longNames).toDF("id", "name")
    val nbh = StringSimilarity.editDistanceJoin(mixed, "id", "name",
      maxDist = 1, q = 3, strategy = "neighborhood")
      .as[(Long, Long, Int)].collect().toSet
    val qg = StringSimilarity.editDistanceJoin(mixed, "id", "name",
      maxDist = 1, q = 3, strategy = "qgram")
      .as[(Long, Long, Int)].collect().toSet
    assert(nbh == qg)
    assert(nbh == bruteForce(names ++ longNames, 1))
  }
}
