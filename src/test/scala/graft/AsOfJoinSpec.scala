package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(min * 60000L)

  test("backward as-of picks the latest right row at-or-before") {
    val trades = Seq(
      (1L, ts(10), 100.0), (1L, ts(20), 101.0), (1L, ts(5), 99.0),
      (2L, ts(10), 200.0))
      .toDF("sym", "ts", "price")
    val quotes = Seq(
      (1L, ts(4), 98.5), (1L, ts(10), 99.9), (1L, ts(15), 100.5),
      (3L, ts(1), 1.0))
      .toDF("sym", "qts", "quote")

    val got = AsOfJoin.asofJoin(trades, quotes, Seq("sym"), "ts", "qts",
      Seq("quote"))
      .select("sym", "ts", "price", "asof_quote")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 60000,
        r.getDouble(2), Option(r.get(3)).map(_.asInstanceOf[Double])))
      .toSet

    assert(got == Set(
      (1L, 5L, 99.0, Some(98.5)),    // latest quote <= t5 is t4
      (1L, 10L, 100.0, Some(99.9)),  // same-instant quote matches
      (1L, 20L, 101.0, Some(100.5)), // latest quote <= t20 is t15
      (2L, 10L, 200.0, None)))       // no quotes for sym 2 → null
  }

  test("matched right row with NULL payload wins over an older non-null row") {
    val left = Seq((1L, ts(10))).toDF("k", "ts")
    val right = Seq((1L, ts(4), Some(5)), (1L, ts(8), None))
      .toDF("k", "rts", "v")
    val out = AsOfJoin.asofJoin(left, right, Seq("k"), "ts", "rts", Seq("v"))
    // the t8 row is the as-of match; its NULL payload must be returned,
    // not the older t4 value
    assert(out.select("asof_v").collect().head.isNullAt(0))
  }

  test("ties of right rows at one timestamp resolve deterministically") {
    val left = Seq((1L, ts(10))).toDF("k", "ts")
    val right = Seq((1L, ts(10), 7), (1L, ts(10), 3), (1L, ts(10), 9))
      .toDF("k", "rts", "v")
    val out = AsOfJoin.asofJoin(left, right, Seq("k"), "ts", "rts", Seq("v"))
    // struct-greatest right row wins the tie — pinned, not partition-order
    assert(out.select("asof_v").as[Int].head() == 9)
  }

  test("left columns and row count are preserved") {
    val left = Seq((1L, ts(1), "a"), (1L, ts(2), "b"), (2L, ts(3), "c"))
      .toDF("k", "ts", "payload")
    val right = Seq((1L, ts(1), 10)).toDF("k", "rts", "v")
    val out = AsOfJoin.asofJoin(left, right, Seq("k"), "ts", "rts", Seq("v"))
    assert(out.count() == 3)
    assert(out.columns.toSeq == Seq("k", "ts", "payload", "asof_v"))
    assert(out.filter($"payload" === "b").select("asof_v").as[Int].head() == 10)
  }
}
