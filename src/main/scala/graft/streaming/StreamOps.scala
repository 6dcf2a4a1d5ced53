package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics operators (SURVEY §2 d2, d3).
  *
  * d2 is the watermark-windowed aggregate (batch twin: b10); d3 is
  * stateful sessionization via flatMapGroupsWithState (batch twin: c13).
  * Both are verified by MemoryStream specs; the batch twins carry the
  * DuckDB oracle for the same logic.
  */
/** One input event for sessionization (top-level: state-store encoders
  * codegen against these classes). */
case class SessionEvent(user_id: Long, ts_us: Long)

/** One closed session. */
case class Session(user_id: Long, n_events: Long, start_us: Long, end_us: Long)

/** Open-session state carried between micro-batches. */
case class SessionState(start_us: Long, end_us: Long, n: Long)

object StreamOps {

  /** d2: tumbling event-time window with late-data watermark. In append
    * mode a window only emits once the watermark passes its end — late
    * rows beyond the watermark are dropped, bounding state forever growth
    * at any scale. */
  def windowedCounts(events: DataFrame, tsCol: String = "ts",
                     watermark: String = "10 minutes",
                     windowLen: String = "1 hour"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen).as("win"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("win.start").as("window_start"), col("event_type"), col("n_events"))

  /** d4 (extension): watermarked stream-stream inner join — match each
    * event with events of a second stream for the same user within
    * `within` after it. Both sides carry watermarks plus a range condition,
    * so state for either side is bounded by watermark + interval (the only
    * stream-stream join shape that is safe at unbounded scale). */
  def streamJoin(left: DataFrame, right: DataFrame,
                 watermark: String = "10 minutes",
                 within: String = "30 minutes",
                 leftKey: String = "user_id", leftTs: String = "ts",
                 rightKey: String = "r_user_id", rightTs: String = "rts"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $within"))
  }

  /** d3: streaming sessionization — per-user state carries the open
    * session; a >gap silence (enforced by event-time timeout against the
    * watermark) closes and emits it. State is O(open sessions), the
    * streaming twin of c13's window+groupBy. */
  def sessionize(events: Dataset[SessionEvent], gapMicros: Long,
                 watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", watermarkDelay)
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(user, s.n, s.start_us, s.end_us))
          } else {
            val sorted = rows.map(_._2).toSeq.sorted
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { us =>
              cur match {
                // merge when within gap of EITHER session edge — a late
                // (within-watermark) out-of-order event can precede the
                // open session's start and must extend it downward, or
                // batch c13 and streaming d3 would disagree
                case Some(s) if us >= s.start_us - gapMicros && us <= s.end_us + gapMicros =>
                  cur = Some(SessionState(math.min(s.start_us, us),
                    math.max(s.end_us, us), s.n + 1))
                case Some(s) if us > s.end_us + gapMicros =>
                  closed += Session(user, s.n, s.start_us, s.end_us)
                  cur = Some(SessionState(us, us, 1))
                case Some(_) => // older than start-gap: its own closed session
                  closed += Session(user, 1, us, us)
                case None =>
                  cur = Some(SessionState(us, us, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end_us / 1000 + gapMicros / 1000)
            }
            closed.result().iterator
          }
      }
  }
}
