package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessorWithInitialState, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-user running (count, exact-cents sum) — a KTable aggregate with
  * the WARM-START path: the Kafka Streams changelog-restore /
  * reprocessing-avoidance pattern. A new deployment does not replay the
  * topic from offset 0; it loads an offline snapshot (the compacted
  * changelog: per-user totals over the already-processed prefix) into
  * state via `handleInitialState`, then folds only the increments.
  *
  * The aggregate is deliberately ADDITIVE (unlike latest-by-key, where
  * later events win regardless of restored state): every key's final
  * value depends on BOTH the snapshot and the increments, so a dropped
  * snapshot row, a double-initialized key, or an increment applied to
  * empty state all corrupt the count/sum — the restore is load-bearing
  * for the hash on every key, not just quiet ones.
  *
  * Cents arrive pre-converted by the Spark expression
  * `CAST(round(value*100, 0) AS BIGINT)` (the s31 discipline: the
  * double→cents rounding happens in each ENGINE's round, never in JVM
  * arithmetic, so Spark and DuckDB agree bit-for-bit). */
case class UserDelta(user_id: Long, cents: Long)
case class UserCounts(user_id: Long, n_events: Long, cents: Long)

class CountBootstrapProcessor
    extends StatefulProcessorWithInitialState[
      Long, UserDelta, UserCounts, UserCounts] {

  @transient private var totals: ValueState[UserCounts] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[UserCounts](
      "totals", Encoders.product[UserCounts], TTLConfig.NONE)

  /** Batch-0 snapshot load: one state write per snapshot key, no
    * emission — the changelog restore is not itself an update. */
  override def handleInitialState(key: Long, initialState: UserCounts,
      timers: TimerValues): Unit =
    totals.update(initialState)

  override def handleInputRows(key: Long, rows: Iterator[UserDelta],
      timers: TimerValues): Iterator[UserCounts] = {
    var cur =
      if (totals.exists()) totals.get() else UserCounts(key, 0L, 0L)
    rows.foreach(r =>
      cur = UserCounts(key, cur.n_events + 1L, cur.cents + r.cents))
    totals.update(cur)
    Iterator.single(cur)
  }
}

/** s44's VERSION 1 — the processor a deployment ran before the upgrade:
  * plain per-user (count, cents) totals, cold start. */
class CountV1Processor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, UserDelta, UserCounts] {

  @transient private var totals: ValueState[UserCounts] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[UserCounts](
      "totals", Encoders.product[UserCounts], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[UserDelta],
      timers: TimerValues): Iterator[UserCounts] = {
    var cur =
      if (totals.exists()) totals.get() else UserCounts(key, 0L, 0L)
    rows.foreach(r =>
      cur = UserCounts(key, cur.n_events + 1L, cur.cents + r.cents))
    totals.update(cur)
    Iterator.single(cur)
  }
}

/** s44's VERSION 2 state: the upgrade adds `cents_new` — revenue since
  * the upgrade — as an Option so pre-upgrade rows read back as None
  * (Avro schema evolution: the added field must be nullable/defaulted).
  */
case class UserCountsV2(user_id: Long, n_events: Long, cents: Long,
    cents_new: Option[Long])

/** s44's VERSION 2 — the SAME state store, one more field: a rolling
  * upgrade restarts from the v1 checkpoint, v1 rows surface with
  * cents_new = None, and the fold starts the new metric from zero
  * while counts/cents continue uninterrupted. */
class CountV2Processor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, UserDelta, UserCountsV2] {

  @transient private var totals: ValueState[UserCountsV2] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[UserCountsV2](
      "totals", Encoders.product[UserCountsV2], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[UserDelta],
      timers: TimerValues): Iterator[UserCountsV2] = {
    var cur = if (totals.exists()) totals.get()
      else UserCountsV2(key, 0L, 0L, None)
    rows.foreach { r =>
      cur = UserCountsV2(key, cur.n_events + 1L, cur.cents + r.cents,
        Some(cur.cents_new.getOrElse(0L) + r.cents))
    }
    totals.update(cur)
    Iterator.single(cur)
  }
}
