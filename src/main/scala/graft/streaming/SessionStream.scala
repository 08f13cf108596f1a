package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization — the stateful-stream form of the batch
  * t12 gate (30-minute-gap sessions): `flatMapGroupsWithState` keyed by
  * user with an EVENT-TIME timeout, the custom-state extension point
  * SURVEY §2.9 calls for beyond windowed aggregation.
  *
  * Semantics match the batch lag+running-sum form: events within `gap`
  * of the previous event extend the session; a larger gap closes it.
  * In-batch gaps close sessions immediately; the tail session stays in
  * state and is emitted when the WATERMARK passes its last event + gap
  * (event-time timeout) — so state is O(open sessions), bounded by the
  * watermark, never O(stream). */
object SessionStream {

  final case class SessionAcc(startMs: Long, lastMs: Long, n: Long)
  final case class UserSession(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long)

  /** `events` must carry `user_id` (integral) and `ts` (timestamp);
    * may be a streaming or batch frame (batch emits only in-batch
    * closures — no watermark to close tails). */
  def sessionize(
      events: DataFrame, gapMs: Long,
      watermark: String = "1 hour"): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"), col("ts"))
      .withWatermark("ts", watermark)
      .as[(Long, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionAcc, UserSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[(Long, Timestamp)], state: GroupState[SessionAcc]) =>
          if (state.hasTimedOut) {
            // watermark passed lastMs + gap: the open session is final
            val s = state.get
            state.remove()
            Iterator.single(
              UserSession(user, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n))
          } else {
            val times = it.map(_._2.getTime).toArray.sorted
            val closed = scala.collection.mutable.ArrayBuffer.empty[UserSession]
            var acc = state.getOption
            times.foreach { t =>
              acc match {
                // within gap of the open session's span (a LATE event
                // from an earlier batch may sit before startMs — it
                // extends the span backward, never regresses lastMs)
                case Some(a) if t >= a.startMs - gapMs && t <= a.lastMs + gapMs =>
                  acc = Some(SessionAcc(
                    math.min(a.startMs, t), math.max(a.lastMs, t), a.n + 1))
                // far in the past: a late fragment of an already-closed
                // session — emit standalone rather than corrupting the
                // open one (the batch form would have merged it; a
                // stream cannot reopen emitted output)
                case Some(a) if t < a.startMs - gapMs =>
                  closed += UserSession(user, new Timestamp(t), new Timestamp(t), 1)
                case Some(a) =>
                  closed += UserSession(user,
                    new Timestamp(a.startMs), new Timestamp(a.lastMs), a.n)
                  acc = Some(SessionAcc(t, t, 1))
                case None => acc = Some(SessionAcc(t, t, 1))
              }
            }
            acc.foreach { a =>
              state.update(a)
              // the timeout must sit strictly above the current
              // watermark or Spark rejects it (late-but-kept events)
              val wm = state.getCurrentWatermarkMs()
              state.setTimeoutTimestamp(math.max(a.lastMs + gapMs, wm + 1))
            }
            closed.iterator
          }
      }
  }
}
