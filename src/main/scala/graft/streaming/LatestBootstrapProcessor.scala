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
