package graft

import graft.operators.StringSimilarity
import org.apache.spark.sql.functions._

/** q-gram prefix-filtered edit-distance join vs a brute-force quadratic
  * levenshtein — the filter chain (rare-gram prefix, position band,
  * length band) must be LOSSLESS at every threshold it claims. */
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

  test("d=1 join equals brute force (lossless prefix filter)") {
    for (q <- Seq(2, 3, 4)) {
      val got = StringSimilarity.editDistanceJoin(df, "id", "name",
        maxDist = 1, q = q)
        .as[(Long, Long, Int)].collect().toSet
      assert(got == bruteForce(names, 1), s"q=$q")
    }
  }

  test("d=2 join equals brute force") {
    val got = StringSimilarity.editDistanceJoin(df, "id", "name",
      maxDist = 2, q = 2).as[(Long, Long, Int)].collect().toSet
    assert(got == bruteForce(names, 2))
  }

  test("d=0 finds exactly the byte-identical pair") {
    val got = StringSimilarity.editDistanceJoin(df, "id", "name",
      maxDist = 0, q = 2).as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 12L, 0)))
  }
}
