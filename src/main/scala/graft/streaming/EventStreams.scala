package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured Streaming surface of the engine (the reference is pure batch
 * — SURVEY.md §2.9 — so this is part of the extended, 100 TB-pipeline
 * surface). Every transform here is written against an unbounded
 * DataFrame and works identically on a bounded one: the battery's q18/q19
 * are the batch twins used for oracle checks.
 *
 * Watermarks bound state: an aggregation over event-time windows keeps
 * state only until `watermark` past the window end, so executors hold
 * O(active windows), not O(stream length).
 */
object EventStreams {

  /** Tumbling event-time windows: `(window_start, window_end, event_type,
    * n, sum_value)`. */
  def tumblingCounts(events: DataFrame, width: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding windows (width, slide): each event lands in width/slide
    * windows. */
  def slidingCounts(events: DataFrame, width: String = "1 hour",
      slide: String = "30 minutes", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"), col("sum_value"))

  /** Session windows per user (gap-merged, built-in session_window):
    * `(user_id, session_start, session_end, n_events, sum_value)`. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))

  /**
   * Streaming exact document dedup: drop any document whose normalized
   * content fingerprint was already seen, across micro-batches, keeping
   * state only `watermark` past each document's event time
   * (`dropDuplicatesWithinWatermark` — a duplicate arriving later than
   * the watermark lag is the documented trade-off of BOUNDED state; at
   * 100 TB/day an unbounded seen-set is not an option, and late
   * re-crawls are caught by the batch dedup the corpus runs anyway).
   * The fingerprint is the same md5-of-normalized-text the batch
   * pipeline uses ([[graft.operators.CorpusPipeline]]), so stream and
   * batch agree on what "identical" means. Unlike the batch
   * [[graft.operators.Dedup.exactDedup]] (keep-lowest-id), the kept
   * representative WITHIN a micro-batch is arbitrary — a stream has no
   * intra-batch order; across batches, earlier state always wins.
   */
  def dedupedDocStream(docs: DataFrame, tsCol: String = "ts",
      textCol: String = "text",
      watermark: String = "1 hour"): DataFrame = {
    val norm = regexp_replace(trim(lower(col(textCol))), "\\s+", " ")
    docs.withColumn("__fp", md5(norm))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")
  }

  final case class SessionEvent(user_id: Long, event_id: Long,
    ts: java.sql.Timestamp, event_type: String)
  final case class SessionPairState(sessionIdx: Long, step: Long,
    lastTsMicros: Long, prefixNewestFirst: List[String])
  final case class SessionPair(user_id: Long, session_idx: Long,
    step: Long, prefix_text: String, next_type: String)

  /**
   * Streaming twin of the oracled batch operator
   * [[graft.operators.EventSequences.sessionPairs]] (q116): gaps-and-
   * islands sessionization folded into (≤ maxPrefix-event prefix →
   * next event) training pairs, INCREMENTALLY across micro-batches via
   * `flatMapGroupsWithState` — the pretraining-pair extractor as a
   * continuous query, so behavioral training data is ready the moment
   * the events land instead of waiting for a batch job.
   *
   * State per user is O(maxPrefix) and independent of history length:
   * the bounded prefix, the session index/step counters, and the last
   * event time. A session spanning micro-batches continues seamlessly
   * (the prefix crosses the batch boundary); a gap > `gapMinutes`
   * starts a new session exactly as the batch window does.
   *
   * Contract: per-user event-time order ACROSS batches (the stream
   * analog of the batch operator's window sort; within a micro-batch
   * the group's rows are sorted here by (ts, event_id)). Cross-batch
   * disorder is DETECTED, not silently folded: an event strictly older
   * than the user's last processed timestamp is dropped (folding it in
   * would sessionize it against the wrong predecessor and corrupt the
   * prefix order), counted in `lateDropped` when provided, and visible
   * to monitoring — the alternative to a watermark-buffered reorder
   * stage in front, the documented trade of emitting pairs eagerly.
   * Equal-timestamp arrivals across batches are kept (ties are
   * legitimate; only regression is disorder). Batch ≡ stream on
   * ordered feeds is spec-pinned.
   *
   * @param lateDropped optional accumulator incremented per dropped
   *                    cross-batch-late event (register with
   *                    `spark.sparkContext.longAccumulator`)
   */
  def sessionPairStream(events: Dataset[SessionEvent],
      gapMinutes: Int = 30, maxPrefix: Int = 20,
      lateDropped: Option[org.apache.spark.util.LongAccumulator] = None)
      : Dataset[SessionPair] = {
    require(gapMinutes > 0 && maxPrefix > 0,
      s"need positive gap/maxPrefix, got ($gapMinutes, $maxPrefix)")
    import events.sparkSession.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionPairState, SessionPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[SessionEvent],
            state: GroupState[SessionPairState]) =>
          val st0 = state.getOption
            .getOrElse(SessionPairState(0L, 0L, Long.MinValue, Nil))
          val sorted = rows.toSeq
            .map(e => (tsMicrosOf(e.ts), e.event_id, e.event_type))
            .sortBy(p => (p._1, p._2))
          // the in-batch sort is ascending, so only events older than
          // the CARRIED lastTs can be late — arrived in a later batch
          // than events they precede; observable drop, never a silent
          // mis-sessionization
          val (kept, late) = sorted.partition(_._1 >= st0.lastTsMicros)
          lateDropped.foreach(_.add(late.size.toLong))
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionPair]
          val st = foldSessionEvents(userId, st0,
            kept.map(p => (p._1, p._3)), gapMicros, maxPrefix, out)
          state.update(st)
          out.iterator
      }
  }

  /** floorDiv, not /: truncation-toward-zero misplaces pre-epoch
    * timestamps by up to a second, diverging from unix_micros' floor
    * semantics in the batch twin. */
  private def tsMicrosOf(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** One user's ORDERED fold: apply `evs` — ascending `(tsMicros,
    * event_type)` — to the session state, appending emitted pairs;
    * shared by [[sessionPairStream]] (drop-late) and
    * [[sessionPairStreamBuffered]] (watermark reorder). */
  private def foldSessionEvents(userId: Long, st0: SessionPairState,
      evs: Seq[(Long, String)], gapMicros: Long, maxPrefix: Int,
      out: scala.collection.mutable.ArrayBuffer[SessionPair])
      : SessionPairState = {
    var st = st0
    evs.foreach { case (tsMicros, etype) =>
      if (st.lastTsMicros == Long.MinValue ||
          tsMicros - st.lastTsMicros > gapMicros)
        st = SessionPairState(st.sessionIdx + 1, 0L, tsMicros, Nil)
      if (st.step >= 1)
        out += SessionPair(userId, st.sessionIdx, st.step,
          st.prefixNewestFirst.reverse.mkString(" "), etype)
      st = SessionPairState(st.sessionIdx, st.step + 1, tsMicros,
        (etype :: st.prefixNewestFirst).take(maxPrefix))
    }
    st
  }

  final case class SessionBufState(
    pending: List[(Long, Long, String)], fold: SessionPairState)

  /**
   * [[sessionPairStream]] with a WATERMARK-BUFFERED REORDER stage in
   * front — the other side of its documented trade: cross-batch
   * disorder within the watermark horizon is FOLDED IN ORDER instead
   * of dropped, at the price of emission delayed by the horizon. Each
   * user's arrivals buffer in state `(tsMicros, event_id, type)`; on
   * every invocation — new data OR an event-time timeout — the prefix
   * at or below the CURRENT watermark folds through the same per-event
   * session algebra, and the remainder re-arms a timeout at its
   * earliest pending timestamp, so the tail flushes as the watermark
   * passes it even with no further data for the user. Per-user state
   * is O(events inside the horizon) — bounded by arrival rate ×
   * `watermarkDelay`, the standard watermark trade. Events later than
   * the watermark AT ARRIVAL are dropped by Spark's own pre-state
   * late-row filter (the watermark contract); everything admitted is
   * folded exactly once, in `(ts, event_id)` order, so the emitted
   * pair set over a disordered feed equals the batch operator's over
   * the same events — spec-pinned, including an event the drop-late
   * variant would have discarded.
   */
  def sessionPairStreamBuffered(events: Dataset[SessionEvent],
      gapMinutes: Int = 30, maxPrefix: Int = 20,
      watermarkDelay: String = "10 minutes"): Dataset[SessionPair] = {
    require(gapMinutes > 0 && maxPrefix > 0,
      s"need positive gap/maxPrefix, got ($gapMinutes, $maxPrefix)")
    import events.sparkSession.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionBufState, SessionPair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[SessionEvent],
            state: GroupState[SessionBufState]) =>
          val st0 = state.getOption.getOrElse(SessionBufState(Nil,
            SessionPairState(0L, 0L, Long.MinValue, Nil)))
          val pend = (st0.pending ++ rows
              .map(e => (tsMicrosOf(e.ts), e.event_id, e.event_type)))
            .sortBy(p => (p._1, p._2))
          val wmMs = state.getCurrentWatermarkMs()
          val (ready, rest) = pend.span(_._1 <= wmMs * 1000L)
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionPair]
          val fold = foldSessionEvents(userId, st0.fold,
            ready.map(p => (p._1, p._3)), gapMicros, maxPrefix, out)
          state.update(SessionBufState(rest, fold))
          // re-arm at the earliest pending event (strictly past the
          // watermark by construction; the max guards the same-ms edge)
          rest.headOption.foreach { r =>
            state.setTimeoutTimestamp(math.max(r._1 / 1000L, wmMs + 1L))
          }
          out.iterator
      }
  }

  final case class FunnelEvent(user_id: Long, ts: java.sql.Timestamp,
      event_type: String)
  /** Per-user funnel progress: micros of each reached stage (parallel
    * to the configured stage list), plus the order guard. */
  final case class FunnelState(reached: Seq[Long], lastTsMicros: Long)
  final case class FunnelRow(user_id: Long, stage_reached: Int,
      ts_us: Seq[Long])

  /**
   * STREAMED funnel — [[graft.operators.EventSequences.funnel]]'s
   * incremental twin, and an exact one: greedy-earliest is an ONLINE
   * algorithm (taking the first feasible occurrence of the next stage
   * as events arrive in time order IS the batch chain), so per-user
   * state is just the reached-stage timestamps — O(|stages|) longs per
   * user, no event retention. Emits a user's row whenever their funnel
   * ADVANCES (update-style; the final rows ≡ the batch operator on the
   * same log, spec-pinned across micro-batch boundaries).
   *
   * Same ordering contract as [[sessionPairStream]]: within a batch
   * the group sorts by event time; a cross-batch regression (event
   * older than the user's last processed timestamp) is dropped and
   * counted, never folded in out of order.
   */
  def funnelStream(events: Dataset[FunnelEvent], stages: Seq[String],
      lateDropped: Option[org.apache.spark.util.LongAccumulator] = None)
      : Dataset[FunnelRow] = {
    require(stages.nonEmpty && stages.size <= 8,
      s"1..8 funnel stages, got ${stages.size}")
    import events.sparkSession.implicits._
    val stageIdx = stages.zipWithIndex.toMap
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[FunnelEvent],
            state: GroupState[FunnelState]) =>
          val st0 = state.getOption
            .getOrElse(FunnelState(Nil, Long.MinValue))
          val sorted = rows.toSeq
            .map(e => (tsMicrosOf(e.ts), e.event_type))
            .sortBy(_._1)
          // ascending sort ⇒ only events older than the CARRIED lastTs
          // can regress (the sessionPairStream argument)
          val (kept, late) = sorted.partition(_._1 >= st0.lastTsMicros)
          lateDropped.foreach(_.add(late.size.toLong))
          val (st, advanced) =
            foldFunnelEvents(st0, kept, stages.size, stageIdx)
          state.update(st)
          if (advanced)
            Iterator(FunnelRow(userId, st.reached.size, st.reached))
          else Iterator.empty
      }
  }

  /** One user's ORDERED funnel fold (ascending `(tsMicros, type)`):
    * strict increase across stages, as the batch operator — stage 0
    * needs no predecessor; later stages need ts > the previous stage's
    * chosen ts. Shared by [[funnelStream]] (drop-late) and
    * [[funnelStreamBuffered]] (watermark reorder). */
  private def foldFunnelEvents(st0: FunnelState,
      evs: Seq[(Long, String)], numStages: Int,
      stageIdx: Map[String, Int]): (FunnelState, Boolean) = {
    var st = st0
    var advanced = false
    evs.foreach { case (tsU, etype) =>
      val next = st.reached.size
      if (next < numStages && stageIdx.get(etype).contains(next) &&
          (next == 0 || tsU > st.reached.last)) {
        st = FunnelState(st.reached :+ tsU, tsU max st.lastTsMicros)
        advanced = true
      } else st = st.copy(lastTsMicros = tsU max st.lastTsMicros)
    }
    (st, advanced)
  }

  final case class FunnelBufState(
    pending: List[(Long, String)], fold: FunnelState)

  /** [[funnelStream]] behind the [[sessionPairStreamBuffered]] reorder
    * device: cross-batch disorder inside the watermark horizon folds
    * in order (a stage event delivered a batch late still advances the
    * funnel at its true position) instead of being dropped; emission
    * delayed by the horizon, per-user state O(events in the horizon),
    * tail flushed by event-time timeout. */
  def funnelStreamBuffered(events: Dataset[FunnelEvent],
      stages: Seq[String], watermarkDelay: String = "10 minutes")
      : Dataset[FunnelRow] = {
    require(stages.nonEmpty && stages.size <= 8,
      s"1..8 funnel stages, got ${stages.size}")
    import events.sparkSession.implicits._
    val stageIdx = stages.zipWithIndex.toMap
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelBufState, FunnelRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[FunnelEvent],
            state: GroupState[FunnelBufState]) =>
          val st0 = state.getOption.getOrElse(
            FunnelBufState(Nil, FunnelState(Nil, Long.MinValue)))
          val pend = (st0.pending ++ rows
              .map(e => (tsMicrosOf(e.ts), e.event_type)))
            .sortBy(identity)
          val wmMs = state.getCurrentWatermarkMs()
          val (ready, rest) = pend.span(_._1 <= wmMs * 1000L)
          val (fold, advanced) =
            foldFunnelEvents(st0.fold, ready, stages.size, stageIdx)
          state.update(FunnelBufState(rest, fold))
          rest.headOption.foreach { r =>
            state.setTimeoutTimestamp(math.max(r._1 / 1000L, wmMs + 1L))
          }
          if (advanced)
            Iterator(FunnelRow(userId, fold.reached.size, fold.reached))
          else Iterator.empty
      }
  }

  final case class UserEvent(user_id: Long, value: Double)
  final case class UserTotal(user_id: Long, n: Long, total: Double)

  /**
   * Custom keyed state via mapGroupsWithState: running per-user totals
   * across micro-batches — the shape for logic session_window can't
   * express. Pass `idleTimeout` to evict idle users' state (production);
   * the default NoTimeout keeps micro-batches data-driven (a
   * processing-time timeout schedules continuous empty batches, which
   * also means `processAllAvailable` never settles in tests).
   */
  def runningUserTotals(events: Dataset[UserEvent],
      idleTimeout: Option[String] = None): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    val timeoutConf = idleTimeout match {
      case Some(_) => GroupStateTimeout.ProcessingTimeTimeout
      case None    => GroupStateTimeout.NoTimeout
    }
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserTotal, UserTotal](timeoutConf) {
        (userId: Long, rows: Iterator[UserEvent], state: GroupState[UserTotal]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            last
          } else {
            val prev = state.getOption.getOrElse(UserTotal(userId, 0L, 0.0))
            val (n, total) = rows.foldLeft((prev.n, prev.total)) {
              case ((c, s), e) => (c + 1, s + e.value)
            }
            val next = UserTotal(userId, n, total)
            state.update(next)
            idleTimeout.foreach(state.setTimeoutDuration)
            next
          }
      }
  }

  final case class DocArrival(source: String, doc_id: Long, n_tokens: Long)
  final case class AdmittedDoc(source: String, doc_id: Long, n_tokens: Long,
      fill: Long)

  /**
   * Streaming per-source token-budget admission via
   * flatMapGroupsWithState: each source may contribute at most
   * `maxTokens` tokens to the mixture; documents past the budget are
   * dropped ON ARRIVAL — the streaming form of a mixture cap, applied
   * while the corpus is still being crawled instead of in a batch pass
   * afterwards.
   *
   * State per source is ONE long (tokens admitted so far) — bounded by
   * the number of sources, not the stream. Within a micro-batch the
   * group iterator is unordered, so arrivals are folded in (doc_id) order
   * to make admission deterministic; across batches state carries the
   * fill, so a document is admitted iff it fits when its batch is
   * processed. Emits admitted docs with the post-admission fill
   * (append-friendly: each doc is emitted at most once, in the batch it
   * arrives).
   */
  def tokenBudgetStream(docs: Dataset[DocArrival],
      maxTokens: Long): Dataset[AdmittedDoc] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.source)
      .flatMapGroupsWithState[Long, AdmittedDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (source: String, rows: Iterator[DocArrival], state: GroupState[Long]) =>
          var fill = state.getOption.getOrElse(0L)
          val admitted = rows.toSeq.sortBy(_.doc_id).flatMap { d =>
            if (d.n_tokens > 0 && fill + d.n_tokens <= maxTokens) {
              fill += d.n_tokens
              Some(AdmittedDoc(source, d.doc_id, d.n_tokens, fill))
            } else None
          }
          state.update(fill)
          admitted.iterator
      }
  }

  /**
   * STREAM-STREAM interval join — the attribution pair feed: every
   * conversion event joins all same-user touch events whose timestamp
   * lies in `(conv.ts − windowMinutes, conv.ts]`. Both sides carry
   * watermarks, so Spark bounds each side's join state to the interval
   * + watermark horizon and can emit in append mode — the canonical
   * Structured Streaming two-stream join shape.
   *
   * The LAST-touch pick (a per-conversion argmax) deliberately stays
   * OUT of the stream: stacking an aggregation on a stream-stream join
   * would hold every conversion's state open until the watermark
   * closes it; the pair feed is what a downstream batch/stateful
   * consumer reduces (the batch twin
   * [[graft.operators.EventSequences.lastTouchAttribution]] does
   * exactly that, and the spec pins this stream's pairs ≡ the batch
   * join's pairs across a micro-batch boundary).
   *
   * @param touches     streaming frame `(userCol, idCol, tsCol)` —
   *                    pre-filtered to touch events
   * @param conversions streaming frame, same shape, conversion events
   * @return `(conv_id, user_id, conv_ts, touch_id, touch_ts)` pairs
   */
  def attributionPairsStream(touches: DataFrame, conversions: DataFrame,
      userCol: String, idCol: String, tsCol: String,
      windowMinutes: Int, watermark: String = "1 hour"): DataFrame = {
    require(windowMinutes > 0, "windowMinutes > 0")
    val t = touches
      .select(col(userCol).as("t_user"), col(idCol).as("touch_id"),
        col(tsCol).as("touch_ts"))
      .withWatermark("touch_ts", watermark)
    val c = conversions
      .select(col(userCol).as("user_id"), col(idCol).as("conv_id"),
        col(tsCol).as("conv_ts"))
      .withWatermark("conv_ts", watermark)
    c.join(t,
      col("t_user") === col("user_id") &&
        col("touch_ts") <= col("conv_ts") &&
        col("touch_ts") > col("conv_ts")
          - expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("conv_id"), col("user_id"), col("conv_ts"),
        col("touch_id"), col("touch_ts"))
  }

  /** Convenience: run a streaming transform to a named in-memory sink and
    * block until the available data is processed (testing/demo). */
  def runToMemory(df: DataFrame, queryName: String,
      outputMode: OutputMode = OutputMode.Update()): Unit = {
    val q = df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
