package graft

import java.sql.Timestamp

import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Structured Streaming operators fed by MemoryStream, checked against
  * their batch twins (the oracle-verified shapes of q18/q19). */
class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(min * 60000L)

  private val rows = Seq(
    // (ts, user, type, value): two users, a gap > 30 min for user 1
    (ts(0), 1L, "click", 1.0),
    (ts(10), 1L, "click", 2.0),
    (ts(70), 1L, "view", 3.0),   // new session for user 1 (60 min gap)
    (ts(5), 2L, "view", 4.0),
    (ts(65), 2L, "click", 5.0))  // new session for user 2

  private def feed[T <: org.apache.spark.sql.DataFrame](
      f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      name: String,
      mode: org.apache.spark.sql.streaming.OutputMode =
        org.apache.spark.sql.streaming.OutputMode.Update())
      : org.apache.spark.sql.DataFrame = {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String, Double)]
    input.addData(rows.map(r => (r._1, r._2, r._3, r._4)))
    val df = input.toDF().toDF("ts", "user_id", "event_type", "value")
    EventStreams.runToMemory(f(df), name, mode)
    spark.table(name)
  }

  test("sessionPairStream matches the batch operator across micro-batches") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[EventStreams.SessionEvent]
    // batch 1 ends mid-session for user 1; batch 2 continues it (the
    // prefix must cross the micro-batch boundary) and opens a new
    // session for user 2 (65-min gap)
    val b1 = Seq(
      EventStreams.SessionEvent(1L, 1L, ts(0), "a"),
      EventStreams.SessionEvent(1L, 2L, ts(5), "b"),
      EventStreams.SessionEvent(2L, 3L, ts(0), "x"))
    val b2 = Seq(
      EventStreams.SessionEvent(1L, 4L, ts(10), "c"),
      EventStreams.SessionEvent(1L, 5L, ts(80), "d"),  // new session u1
      EventStreams.SessionEvent(2L, 6L, ts(65), "y"),  // new session u2
      EventStreams.SessionEvent(2L, 7L, ts(70), "z"))
    // ONE query, two processed micro-batches: user 1's session state
    // must genuinely cross the batch boundary inside the query
    val q = EventStreams.sessionPairStream(input.toDS(),
        gapMinutes = 30, maxPrefix = 2)
      .toDF().writeStream.format("memory").queryName("t_sess_pairs")
      .outputMode("append").start()
    try {
      input.addData(b1)
      q.processAllAvailable()
      input.addData(b2)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("t_sess_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4))).toSet
    val want = graft.operators.EventSequences.sessionPairs(
      (b1 ++ b2).map(e => (e.user_id, e.event_id, e.ts, e.event_type))
        .toDF("user_id", "event_id", "ts", "event_type"),
      "user_id", "event_id", "ts", "event_type",
      gapMinutes = 30, maxPrefix = 2)
      .as[(Long, Long, Long, String, String)].collect().toSet
    assert(got === want)
    // the boundary-crossing pair is present: user 1's event "c" at
    // step 2 with the prefix ("a b") truncated to the last 2 types
    assert(got.contains((1L, 1L, 2L, "a b", "c")))
    // and gap-opened sessions restart with empty prefixes at step 1
    assert(want.exists(p => p._1 == 2L && p._2 == 2L && p._3 == 1L))
  }

  test("sessionPairStream drops cross-batch-late events observably") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[EventStreams.SessionEvent]
    val late = spark.sparkContext.longAccumulator("late_dropped")
    val q = EventStreams.sessionPairStream(input.toDS(),
        gapMinutes = 30, maxPrefix = 2, lateDropped = Some(late))
      .toDF().writeStream.format("memory").queryName("t_sess_late")
      .outputMode("append").start()
    try {
      input.addData(Seq(
        EventStreams.SessionEvent(1L, 1L, ts(0), "a"),
        EventStreams.SessionEvent(1L, 2L, ts(5), "b")))
      q.processAllAvailable()
      // batch 2 delivers an event OLDER than user 1's last processed
      // timestamp (cross-batch disorder): it must be dropped + counted,
      // not folded into the session out of order
      input.addData(Seq(
        EventStreams.SessionEvent(1L, 3L, ts(2), "STALE"),
        EventStreams.SessionEvent(1L, 4L, ts(10), "c")))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("t_sess_late").collect()
      .map(r => (r.getLong(2), r.getString(3), r.getString(4))).toSet
    assert(late.value === 1L, "the stale event must be counted")
    assert(!got.exists(p => p._2.contains("STALE") || p._3 == "STALE"),
      "the stale event must not appear in any pair or prefix")
    // the in-order continuation still extends the session normally
    assert(got.contains((2L, "a b", "c")))
  }

  test("sessionPairStreamBuffered folds cross-batch disorder IN ORDER " +
      "— ≡ batch, including the event the drop-late variant loses") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[EventStreams.SessionEvent]
    val q = EventStreams.sessionPairStreamBuffered(input.toDS(),
        gapMinutes = 30, maxPrefix = 2, watermarkDelay = "10 minutes")
      .toDF().writeStream.format("memory").queryName("t_sess_buf")
      .outputMode("append").start()
    // minute offsets sit WELL past epoch 0: an event exactly AT the
    // current watermark is dropped by Spark's pre-state late filter,
    // and the initial watermark is 0 — ts(0) would silently vanish
    val b1 = Seq(
      EventStreams.SessionEvent(1L, 1L, ts(60), "a"),
      EventStreams.SessionEvent(1L, 2L, ts(68), "c"))
    // the disordered arrival: BETWEEN b1's events, delivered a batch
    // later but inside the 10-minute horizon — sessionPairStream would
    // drop it; the buffer must fold it at its true position
    val b2 = Seq(
      EventStreams.SessionEvent(1L, 3L, ts(64), "b"),
      EventStreams.SessionEvent(9L, 4L, ts(90), "w"))
    // watermark advancers (single-event users emit no pairs): push the
    // watermark past every user-1 event so the buffered tail flushes
    // via its event-time timeout, with NO further user-1 data
    val b3 = Seq(EventStreams.SessionEvent(8L, 5L, ts(120), "w"))
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      input.addData(b3); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("t_sess_buf").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4))).toSet
    val want = graft.operators.EventSequences.sessionPairs(
      (b1 ++ b2 ++ b3).map(e => (e.user_id, e.event_id, e.ts, e.event_type))
        .toDF("user_id", "event_id", "ts", "event_type"),
      "user_id", "event_id", "ts", "event_type",
      gapMinutes = 30, maxPrefix = 2)
      .as[(Long, Long, Long, String, String)].collect().toSet
    assert(got === want)
    // the disordered event participates at its TRUE position: both as
    // a next-event target and inside the following pair's prefix
    assert(got.contains((1L, 1L, 1L, "a", "b")))
    assert(got.contains((1L, 1L, 2L, "a b", "c")))
  }

  test("tumbling window counts match the batch twin") {
    val got = feed(EventStreams.tumblingCounts(_, "1 hour", "2 hours"),
      "t_tumbling")
      .select("window_start", "event_type", "n", "sum_value")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    val want = rows.toDF("ts", "user_id", "event_type", "value")
      .groupBy(date_trunc("hour", col("ts")).as("ws"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("s"))
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("sliding windows place each event in width/slide windows") {
    val got = feed(EventStreams.slidingCounts(_, "1 hour", "30 minutes",
      "2 hours"), "t_sliding")
    // 5 events × 2 windows each = 10 (window, type) memberships
    assert(got.agg(sum("n")).as[Long].head() == 10L)
  }

  test("session windows merge events within the gap") {
    // session-window aggregation rejects Update mode; Complete works on
    // the memory sink
    val got = feed(EventStreams.sessionCounts(_, "30 minutes", "2 hours"),
      "t_session", org.apache.spark.sql.streaming.OutputMode.Complete())
      .select("user_id", "n_events")
      .as[(Long, Long)].collect().toSeq.sorted
    // user 1: sessions {2 events}, {1}; user 2: {1}, {1}
    assert(got == Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 1L)))
  }

  test("mapGroupsWithState keeps running totals across micro-batches") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[EventStreams.UserEvent]
    val q = EventStreams.runningUserTotals(input.toDS())
      .writeStream.format("memory").queryName("t_state")
      .outputMode("update")
      .start()
    try {
      input.addData(EventStreams.UserEvent(1L, 1.0),
        EventStreams.UserEvent(1L, 2.0), EventStreams.UserEvent(2L, 5.0))
      q.processAllAvailable()
      val first = spark.table("t_state")
        .as[EventStreams.UserTotal].collect().map(t => t.user_id -> t).toMap
      assert(first(1L).n == 2 && first(1L).total == 3.0)
      assert(first(2L).n == 1 && first(2L).total == 5.0)

      // a later micro-batch accumulates onto the keyed state
      input.addData(EventStreams.UserEvent(1L, 10.0))
      q.processAllAvailable()
      val latest = spark.table("t_state")
        .as[EventStreams.UserTotal].collect()
        .filter(_.user_id == 1L).maxBy(_.n)
      assert(latest.n == 3 && latest.total == 13.0)
    } finally q.stop()
  }

  test("dedupedDocStream drops cross-batch duplicates within the watermark") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val q = EventStreams.dedupedDocStream(
      input.toDF().toDF("ts", "doc_id", "text"))
      .writeStream.format("memory").queryName("t_docdedup")
      .outputMode("append").start()
    try {
      input.addData(
        (ts(0), 1L, "alpha beta gamma"),
        (ts(1), 2L, "  ALPHA   beta GAMMA "), // same normalized content
        (ts(2), 3L, "something else"))
      q.processAllAvailable()
      // a later micro-batch re-delivers doc 1's content within the
      // watermark: still deduplicated, new content passes
      input.addData(
        (ts(3), 4L, "alpha beta gamma"),
        (ts(4), 5L, "fresh content here"))
      q.processAllAvailable()
      val ids = spark.table("t_docdedup")
        .select("doc_id").as[Long].collect().toSet
      // WITHIN a micro-batch the kept representative of duplicate
      // content is arbitrary (docs 1/2 — streaming offers no intra-batch
      // order); ACROSS batches state wins: doc 4's re-delivery is
      // dropped, fresh content passes
      assert(ids.intersect(Set(1L, 2L)).size == 1, s"one of docs 1/2: $ids")
      assert(!ids.contains(4L), s"cross-batch duplicate must drop: $ids")
      assert(ids.contains(3L) && ids.contains(5L))
      assert(ids.size == 3)
    } finally q.stop()
  }

  test("tokenBudgetStream admits per-source up to the cap across batches") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[EventStreams.DocArrival]
    val q = EventStreams.tokenBudgetStream(input.toDS(), maxTokens = 100)
      .writeStream.format("memory").queryName("t_budget")
      .outputMode("append").start()
    try {
      // batch 1 (s1 folds in doc_id order regardless of arrival order):
      // 1(40)→40, 2(50)→90, 3(20) overflows and drops; s2 independent
      input.addData(
        EventStreams.DocArrival("s1", 3L, 20L),
        EventStreams.DocArrival("s1", 1L, 40L),
        EventStreams.DocArrival("s1", 2L, 50L),
        EventStreams.DocArrival("s2", 7L, 99L))
      q.processAllAvailable()
      // batch 2: state carries fill=90 → 4(10) fits exactly, 5(1) drops
      input.addData(
        EventStreams.DocArrival("s1", 4L, 10L),
        EventStreams.DocArrival("s1", 5L, 1L),
        EventStreams.DocArrival("s2", 8L, 2L))
      q.processAllAvailable()
      val got = spark.table("t_budget")
        .as[EventStreams.AdmittedDoc].collect()
        .map(a => (a.source, a.doc_id) -> ((a.n_tokens, a.fill))).toMap
      assert(got == Map(
        ("s1", 1L) -> ((40L, 40L)), ("s1", 2L) -> ((50L, 90L)),
        ("s1", 4L) -> ((10L, 100L)),
        ("s2", 7L) -> ((99L, 99L))),
        s"admissions: $got")
    } finally q.stop()
  }

  test("deterministic sampling filters run unchanged on a stream") {
    // stratifiedSample / weightedSample are stateless narrow filters, so
    // the SAME operator code admits streaming input — the admitted set
    // must equal the batch filter on identical data (the determinism
    // contract extended to streams: a doc's fate never depends on which
    // micro-batch carried it)
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val batch = (1L to 400L).map(i => (i, Seq("en", "de", "zh", "fr")((i % 4).toInt)))
    input.addData(batch.take(200))
    input.addData(batch.drop(200))
    val stream = input.toDF().toDF("doc_id", "lang")
    val sampled = graft.operators.Sampling.stratifiedSample(
      graft.operators.Sampling.weightedSample(
        stream, col("doc_id"), lit(0.9), "sw1"),
      col("lang"), col("doc_id"), Map("en" -> 0.5, "de" -> 0.25), "st9",
      defaultFraction = 0.1)
    EventStreams.runToMemory(sampled, "t_sampled",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val got = spark.table("t_sampled")
      .as[(Long, String)].collect().toSet
    val want = graft.operators.Sampling.stratifiedSample(
      graft.operators.Sampling.weightedSample(
        batch.toDF("doc_id", "lang"), col("doc_id"), lit(0.9), "sw1"),
      col("lang"), col("doc_id"), Map("en" -> 0.5, "de" -> 0.25), "st9",
      defaultFraction = 0.1)
      .as[(Long, String)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("funnelStream: final state ≡ the batch funnel across micro-batches") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[EventStreams.FunnelEvent]
    val stages = Seq("view", "click", "purchase")
    val b1 = Seq(
      EventStreams.FunnelEvent(1L, ts(0), "click"), // pre-view decoy
      EventStreams.FunnelEvent(1L, ts(1), "view"),
      EventStreams.FunnelEvent(2L, ts(3), "view"))
    val b2 = Seq(
      EventStreams.FunnelEvent(1L, ts(2), "click"),
      EventStreams.FunnelEvent(1L, ts(6), "purchase"),
      EventStreams.FunnelEvent(2L, ts(3), "click")) // same instant: strict reject
    val q = EventStreams.funnelStream(input.toDS(), stages)
      .toDF().writeStream.format("memory").queryName("t_funnel")
      .outputMode("append").start()
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
    } finally q.stop()
    // the LAST emitted row per user is the final funnel state
    val got = spark.table("t_funnel").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2).toSeq))
      .groupBy(_._1).map { case (u, rs) => u -> rs.maxBy(_._2) }
    val want = graft.operators.EventSequences.funnel(
      (b1 ++ b2).map(e => (e.user_id, e.ts, e.event_type))
        .toDF("user_id", "ts", "event_type"),
      "user_id", "ts", "event_type", stages)
      .collect().map(r => r.getLong(0) -> ((
        r.getInt(4),
        (1 to 3).flatMap(i => if (r.isNullAt(i)) None
          else Some(r.getLong(i)))))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (u, (_, stage, tss)) =>
      assert((stage, tss) == want(u), s"user $u")
    }
    // the cross-boundary completion really happened
    assert(got(1L)._2 == 3)
    assert(got(2L)._2 == 1, "same-instant click must not advance")
  }

  test("funnelStreamBuffered: a stage event delivered late-but-in-" +
      "horizon advances the funnel at its true position") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[EventStreams.FunnelEvent]
    val stages = Seq("view", "click", "purchase")
    val q = EventStreams.funnelStreamBuffered(input.toDS(), stages,
        watermarkDelay = "10 minutes")
      .toDF().writeStream.format("memory").queryName("t_funnel_buf")
      .outputMode("append").start()
    try {
      // purchase precedes the click in ARRIVAL order — the drop-late
      // variant would discard the click and strand the funnel at
      // stage 1 (fixture past epoch 0: see the session-buffer test)
      input.addData(Seq(
        EventStreams.FunnelEvent(1L, ts(60), "view"),
        EventStreams.FunnelEvent(1L, ts(68), "purchase")))
      q.processAllAvailable()
      input.addData(Seq(
        EventStreams.FunnelEvent(1L, ts(64), "click"),
        EventStreams.FunnelEvent(9L, ts(90), "view")))
      q.processAllAvailable()
      input.addData(Seq(EventStreams.FunnelEvent(8L, ts(120), "view")))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("t_funnel_buf")
      .filter($"user_id" === 1L).collect()
      .map(r => (r.getInt(1), r.getSeq[Long](2).toSeq))
    assert(rows.nonEmpty, "the buffered funnel must flush by timeout")
    // full funnel, every stage at its TRUE event time — ≡ the batch
    // operator over the time-ordered log
    assert(rows.maxBy(_._1) ===
      ((3, Seq(3600000000L, 3840000000L, 4080000000L))))
  }

  test("attributionPairsStream ≡ the batch interval join across micro-batches") {
    implicit val sql = spark.sqlContext
    // (user, event_id, ts): touches and conversions on separate streams
    val touches = MemoryStream[(Long, Long, Timestamp)]
    val convs = MemoryStream[(Long, Long, Timestamp)]
    val touchRows = Seq(
      (1L, 10L, ts(1)), (1L, 11L, ts(25)),   // both within 30min of conv 100
      (1L, 13L, ts(0)),                       // EXACTLY 30min — open interval excludes
      (1L, 12L, ts(60)),                      // after conv 100 — excluded
      (2L, 20L, ts(0)))                       // 40min before conv 200 — out
    val convRows = Seq((1L, 100L, ts(30)), (2L, 200L, ts(40)))
    // split across two micro-batches: late touch 11 arrives after conv 100
    touches.addData(touchRows.take(1)); convs.addData(convRows.take(1))
    val joined = graft.streaming.EventStreams.attributionPairsStream(
      touches.toDF().toDF("user_id", "event_id", "ts"),
      convs.toDF().toDF("user_id", "event_id", "ts"),
      "user_id", "event_id", "ts", windowMinutes = 30)
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    touches.addData(touchRows.drop(1)); convs.addData(convRows.drop(1))
    val q2 = joined.writeStream.format("memory").queryName("attrib2")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val got = (spark.table("attrib").collect() ++
      spark.table("attrib2").collect())
      .map(r => (r.getLong(0), r.getLong(3))).toSet
    // batch reference: same join over the union
    val tB = touchRows.toDF("user_id", "event_id", "ts")
    val cB = convRows.toDF("user_id", "event_id", "ts")
    val want = cB.alias("c").join(tB.alias("t"),
        expr("t.user_id = c.user_id AND t.ts <= c.ts" +
          " AND t.ts > c.ts - INTERVAL 30 MINUTES"))
      .select(col("c.event_id"), col("t.event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, s"stream $got vs batch $want")
    assert(want == Set((100L, 10L), (100L, 11L)),
      "fixture must exercise in-window, after-conv, and out-of-window")
  }
}
