package graft

import graft.operators.EventSequences
import org.apache.spark.sql.functions._

/** Sessionized next-event pair extraction: session boundaries, prefix
  * truncation, timestamp tie-breaks, and head-of-session exclusion on a
  * hand-traced fixture. */
class EventSequencesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minutes: Int): java.sql.Timestamp =
    new java.sql.Timestamp(1700000000000L + minutes * 60000L)

  test("sessionPairs: boundaries, truncation, tie-break, heads drop") {
    val events = Seq(
      // user 1, session 1: a b; 44-min silence; session 2: c d e f
      (1L, 10L, ts(0), "a"),
      (1L, 11L, ts(1), "b"),
      (1L, 12L, ts(45), "c"),
      (1L, 13L, ts(46), "d"),
      (1L, 14L, ts(47), "e"),
      (1L, 15L, ts(48), "f"),
      // user 2: two simultaneous events — id breaks the tie
      (2L, 21L, ts(0), "x"),
      (2L, 20L, ts(0), "y"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = EventSequences.sessionPairs(events, "user_id", "event_id",
        "ts", "event_type", gapMinutes = 30, maxPrefix = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (r.getString(3), r.getString(4))).toMap
    assert(got == Map(
      (1L, 1L, 1L) -> (("a", "b")),
      (1L, 2L, 1L) -> (("c", "d")),
      (1L, 2L, 2L) -> (("c d", "e")),
      (1L, 2L, 3L) -> (("d e", "f")), // prefix truncated to maxPrefix=2
      (2L, 1L, 1L) -> (("y", "x"))))  // lower id first at equal ts
    // every session head (step 0) is excluded: 8 events, 3 heads
    assert(got.size == 5)
  }

  test("funnel: greedy-earliest chains, strict ordering, stalls keep prefix") {
    val events = Seq(
      // user 1 completes, with a decoy click BEFORE the view (must not
      // count) and the earliest valid click chosen over a later one
      (1L, ts(0), "click"), (1L, ts(1), "view"), (1L, ts(2), "click"),
      (1L, ts(5), "click"), (1L, ts(6), "purchase"),
      // user 2 stalls after view (click only at the SAME instant —
      // strict increase rejects it)
      (2L, ts(3), "view"), (2L, ts(3), "click"),
      // user 3 never views (purchase alone) → absent from the funnel
      (3L, ts(1), "purchase"),
      // user 4 views then purchases with no click → stage 1 only
      (4L, ts(0), "view"), (4L, ts(2), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val got = EventSequences.funnel(events, "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          r.getInt(4)))).toMap
    def us(minutes: Int): Long = 1700000000000000L + minutes * 60000000L
    assert(got.keySet == Set(1L, 2L, 4L))
    assert(got(1L) == ((Some(us(1)), Some(us(2)), Some(us(6)), 3)))
    assert(got(2L) == ((Some(us(3)), None, None, 1)))
    assert(got(4L) == ((Some(us(0)), None, None, 1)))
  }
}
