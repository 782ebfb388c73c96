package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Timer + TTL halves of the Spark 4 `transformWithState` Processor API
  * (the Kafka Streams `punctuate` / windowed-store-retention analogues):
  *
  *  - [[SessionCountProcessor]]: per-key event counting with an
  *    EVENT-TIME TIMER — emits the final count only when the watermark
  *    passes last-event-time + gap (Processor API `schedule(...,
  *    PunctuationType.STREAM_TIME)` + suppress-until-close).
  *  - [[TtlCountProcessor]]: a running per-key counter whose state
  *    carries a PROCESSING-TIME TTL — an idle key's state silently
  *    expires, so the count restarts (windowed-store retention /
  *    changelog topic cleanup.policy time-based deletion).
  */
case class SessionAgg(n: Long, max_ts_ms: Long)
case class SessionFinal(user_id: Long, n: Long)
case class CountOut(user_id: Long, n: Long)

/** Counts rows per key; a timer at max(ts)+gap emits the count as a
  * final, suppressed-until-closed result and clears the state. */
class SessionCountProcessor(gapMs: Long)
    extends StatefulProcessor[Long, (Long, Timestamp), SessionFinal] {

  @transient private var agg: ValueState[SessionAgg] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    agg = getHandle.getValueState[SessionAgg](
      "agg", Encoders.product[SessionAgg], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Timestamp)],
      timers: TimerValues): Iterator[SessionFinal] = {
    var cur = if (agg.exists()) agg.get() else SessionAgg(0L, Long.MinValue)
    rows.foreach { case (_, ts) =>
      cur = SessionAgg(cur.n + 1, math.max(cur.max_ts_ms, ts.getTime))
    }
    agg.update(cur)
    // one timer per observed max: earlier ones expire harmlessly (the
    // expiry guard below ignores them while newer input keeps arriving)
    getHandle.registerTimer(cur.max_ts_ms + gapMs)
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionFinal] = {
    if (!agg.exists()) return Iterator.empty
    val a = agg.get()
    // stale timer from a superseded max(ts): the live timer is later
    if (expiredTimerInfo.getExpiryTimeInMs() < a.max_ts_ms + gapMs)
      return Iterator.empty
    agg.clear()
    Iterator.single(SessionFinal(key, a.n))
  }
}

/** Running count per key where the state itself has a processing-time
  * TTL: state not refreshed within `ttlMs` reads as absent, restarting
  * the count — the retention/cleanup half of the state-store contract. */
class TtlCountProcessor(ttlMs: Long)
    extends StatefulProcessor[Long, (Long, Timestamp), CountOut] {

  @transient private var cnt: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    cnt = getHandle.getValueState[Long](
      "cnt", Encoders.scalaLong, TTLConfig(java.time.Duration.ofMillis(ttlMs)))

  override def handleInputRows(key: Long, rows: Iterator[(Long, Timestamp)],
      timers: TimerValues): Iterator[CountOut] = {
    val base = if (cnt.exists()) cnt.get() else 0L
    val n = base + rows.size
    cnt.update(n)
    Iterator.single(CountOut(key, n))
  }
}
