package graft.streaming

import java.time.Instant

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
  * watermark, never O(stream).
  *
  * Times are carried as MICROSECOND longs (`Instant` at the Dataset
  * boundary — the encoder round-trips TimestampType losslessly); the
  * first cut used `java.sql.Timestamp.getTime`, which silently floors
  * to millis and made the streaming gate diverge from its
  * micro-precision DuckDB replay (s03). Only the TIMEOUT registration
  * floors to millis — that is Spark's own watermark clock resolution,
  * not a session-boundary input. */
object SessionStream {

  final case class SessionAcc(startUs: Long, lastUs: Long, n: Long)
  final case class UserSession(
      user_id: Long, session_start: Instant, session_end: Instant,
      n_events: Long)

  private def toUs(i: Instant): Long =
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  private def toInstant(us: Long): Instant =
    Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
      Math.floorMod(us, 1000000L) * 1000L)

  /** `events` must carry `user_id` (integral) and `ts` (timestamp) and
    * must be a STREAMING frame: batch plans eliminate the watermark
    * node, which this state machine needs for both its timeout and its
    * timeout-timestamp floor — batch sessionization is the
    * lag+running-sum form (the t12 gate). */
  def sessionize(
      events: DataFrame, gapMs: Long,
      watermark: String = "1 hour"): Dataset[UserSession] = {
    require(events.isStreaming,
      "sessionize needs a streaming frame; use the batch window form for batch data")
    val gapUs = gapMs * 1000L
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp").as("ts")) // NTZ-safe: watermark needs TIMESTAMP
      .withWatermark("ts", watermark)
      .as[(Long, Instant)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionAcc, UserSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[(Long, Instant)], state: GroupState[SessionAcc]) =>
          if (state.hasTimedOut) {
            // watermark passed lastUs + gap: the open session is final
            val s = state.get
            state.remove()
            Iterator.single(
              UserSession(user, toInstant(s.startUs), toInstant(s.lastUs), s.n))
          } else {
            // 1) gap-split this batch's sorted times into fragments, so
            //    several late events within gap of EACH OTHER form one
            //    session, not singletons; 2) order-merge the open state
            //    interval in (a late event near the open span extends
            //    it, never regresses lastUs); 3) everything before the
            //    latest interval is final. Late fragments of sessions
            //    already emitted re-emit as separate rows — an append
            //    stream cannot retract, the documented trade.
            val times = it.map(t => toUs(t._2)).toArray.sorted
            val frags = scala.collection.mutable.ArrayBuffer.empty[SessionAcc]
            times.foreach { t =>
              if (frags.nonEmpty && t - frags.last.lastUs <= gapUs)
                frags(frags.size - 1) =
                  frags.last.copy(lastUs = t, n = frags.last.n + 1)
              else frags += SessionAcc(t, t, 1)
            }
            val merged = scala.collection.mutable.ArrayBuffer.empty[SessionAcc]
            (state.getOption.toSeq ++ frags).sortBy(_.startUs).foreach { f =>
              if (merged.nonEmpty && f.startUs - merged.last.lastUs <= gapUs)
                merged(merged.size - 1) = SessionAcc(
                  merged.last.startUs,
                  math.max(merged.last.lastUs, f.lastUs),
                  merged.last.n + f.n)
              else merged += f
            }
            if (merged.isEmpty) Iterator.empty
            else {
              val open = merged.last
              state.update(open)
              // the timeout must sit strictly above the current
              // watermark or Spark rejects it (late-but-kept events);
              // ceil-to-millis so a timeout never fires BEFORE the
              // micro-precision deadline it represents
              val wm = state.getCurrentWatermarkMs()
              val deadlineMs = Math.floorDiv(open.lastUs + gapUs + 999L, 1000L)
              state.setTimeoutTimestamp(math.max(deadlineMs, wm + 1))
              merged.init.iterator.map(a =>
                UserSession(user, toInstant(a.startUs), toInstant(a.lastUs), a.n))
            }
          }
      }
  }
}
