package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Training-example extraction from event logs: the behavioral-sequence
 * complement of the text pipeline's ICT/next-token surfaces. Clickstream
 * and telemetry corpora become "next-action prediction" training data by
 * sessionizing per user and emitting (prefix → next event) pairs — the
 * same shape recommendation/user-model pretraining consumes.
 *
 * Reference anchor: the reference pipeline has no event surface; this
 * extends the engine's streaming/events family (battery q18/q19/q30) to
 * the training-data story the way ictPairs extends documents.
 */
object EventSequences {

  /**
   * Sessionized next-event prediction pairs:
   *
   *  1. gaps-and-islands sessionization per `userCol` — a new session
   *     starts after `gapMinutes` of silence (the q19 lag/cumsum device,
   *     exactly replayable in SQL);
   *  2. within each (user, session), events order by (`tsCol`, `idCol`)
   *     — the id tie-break pins simultaneous events;
   *  3. every non-initial event yields one training pair: the space-
   *     joined types of up to `maxPrefix` PRECEDING same-session events,
   *     and its own type as the label.
   *
   * Scale shape: two user-keyed window passes (sessionize, then rank +
   * prefix) — the corpus shuffles once on user id; the prefix frame is
   * ROWS-bounded by `maxPrefix`, so cost is O(events · maxPrefix) and
   * per-row state never grows with session length. No driver state, no
   * explode: one output row per input event (minus session heads).
   *
   * @return `(userCol, session_idx, step, prefix_text, next_type)`
   */
  def sessionPairs(events: DataFrame, userCol: String, idCol: String,
      tsCol: String, typeCol: String, gapMinutes: Int = 30,
      maxPrefix: Int = 20): DataFrame = {
    require(gapMinutes > 0 && maxPrefix > 0,
      s"need positive gap/maxPrefix, got ($gapMinutes, $maxPrefix)")
    val wOrd = Window.partitionBy(userCol).orderBy(tsCol, idCol)
    val sess = events
      .withColumn("__prev", lag(col(tsCol), 1).over(wOrd))
      .withColumn("__new", when(col("__prev").isNull ||
        unix_micros(col(tsCol)) - unix_micros(col("__prev")) >
          gapMinutes * 60L * 1000000L, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("__new")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, 0)))
    val wSess = Window.partitionBy(col(userCol), col("session_idx"))
      .orderBy(col(tsCol), col(idCol))
    sess
      .withColumn("step", (row_number().over(wSess) - 1).cast("long"))
      .withColumn("prefix_text", concat_ws(" ",
        collect_list(col(typeCol)).over(
          wSess.rowsBetween(-maxPrefix, -1))))
      .filter(col("step") >= 1)
      .select(col(userCol), col("session_idx"), col("step"),
        col("prefix_text"), col(typeCol).as("next_type"))
  }

  /**
   * Ordered funnel analysis — the classic event-analytics progression
   * query ("who did view → click → purchase, in that order?"): for
   * every user, the EARLIEST strictly-increasing timestamp chain
   * through `stages`, greedily (stage i's timestamp is the minimum
   * occurrence after stage i−1's chosen one — the standard funnel
   * semantics, and greedy-earliest is optimal: taking the earliest
   * feasible occurrence at every step dominates any other feasible
   * chain). Users who stall keep the prefix they reached.
   *
   * Shape: one filtered min-aggregate per stage (map-side combinable)
   * chained by left joins on the user key — |stages| bounded shuffles
   * of |users|-row frames, no windows, no per-user event materialization
   * (a heavy user costs nothing beyond their scan). Ties at equal
   * timestamps resolve by requiring STRICT ts increase across stages —
   * same-instant repeats of the next stage do not advance the funnel
   * (replayable; an id tie-break inside equal timestamps would also
   * need the id to travel, which no funnel consumer wants).
   *
   * @return `(userCol, t1_us..tm_us micros BIGINT — null once stalled,
   *         stage_reached int)`
   */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty && stages.size <= 8,
      s"1..8 funnel stages, got ${stages.size}")
    val s1 = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol))
      .agg(min(unix_micros(col(tsCol))).as("t1_us"))
    val chained = stages.zipWithIndex.drop(1)
      .foldLeft(s1) { case (acc, (stage, i)) =>
        val prev = s"t${i}_us"
        val cur = s"t${i + 1}_us"
        val ev = events.filter(col(typeCol) === stage)
          .select(col(userCol).as("__fu"),
            unix_micros(col(tsCol)).as("__fts"))
        acc.join(ev,
            acc(userCol) === col("__fu") && col("__fts") > col(prev),
            "left")
          .groupBy((acc.columns.map(acc(_))): _*)
          .agg(min(col("__fts")).as(cur))
      }
    chained.withColumn("stage_reached",
      (1 to stages.size)
        .map(i => when(col(s"t${i}_us").isNotNull, 1).otherwise(0))
        .reduce(_ + _))
  }

  /**
   * Last-touch attribution: every conversion event pairs with the
   * LATEST same-user touch event in the `windowMinutes` before it
   * (inclusive of the conversion instant; ties at equal timestamps to
   * the lowest touch id), or null if none — the classic marketing/
   * funnel-credit assignment, and the batch twin of
   * [[graft.streaming.EventStreams.attributionPairsStream]]'s
   * stream-stream interval join.
   *
   * Shape: one interval join on the user key (both sides filtered to
   * their type at the scan) + a per-conversion argmax window (bounded
   * by touches-in-window per conversion). Timestamps surface as unix
   * micros.
   *
   * @return `(conv_id, userCol, conv_us, touch_id nullable,
   *         touch_us nullable, gap_us nullable)`
   */
  def lastTouchAttribution(events: DataFrame, userCol: String,
      idCol: String, tsCol: String, typeCol: String,
      touchType: String, convType: String,
      windowMinutes: Int): DataFrame = {
    require(windowMinutes > 0, "windowMinutes > 0")
    val conv = events.filter(col(typeCol) === convType)
      .select(col(idCol).as("conv_id"), col(userCol),
        unix_micros(col(tsCol)).as("conv_us"))
    val touch = events.filter(col(typeCol) === touchType)
      .select(col(userCol).as("__au"), col(idCol).as("touch_id"),
        unix_micros(col(tsCol)).as("touch_us"))
    val winUs = windowMinutes * 60000000L
    val joined = conv.join(touch,
      col(userCol) === col("__au") &&
        col("touch_us") <= col("conv_us") &&
        col("touch_us") > col("conv_us") - lit(winUs), "left")
    val w = Window.partitionBy("conv_id")
      .orderBy(col("touch_us").desc_nulls_last, col("touch_id"))
    joined.withColumn("__r", row_number().over(w))
      .filter(col("__r") === 1)
      .select(col("conv_id"), col(userCol), col("conv_us"),
        col("touch_id"), col("touch_us"),
        (col("conv_us") - col("touch_us")).as("gap_us"))
  }
}
