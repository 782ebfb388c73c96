package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** KTable materialization on Spark 4's `transformWithState` API — the
  * successor to `flatMapGroupsWithState` with named state variables and
  * a per-state TTL. Keeps the latest event per user in a `ValueState`
  * (compared on (ts, event_id), the same total order as the batch
  * `latestByKey`) and emits the new latest on every update — exactly a
  * Kafka Streams changelog topic.
  *
  * Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass` →
  * `...state.RocksDBStateStoreProvider`), which is also what you'd run
  * on a real cluster for 100 TB-scale keyed state. */
case class LatestEvent(user_id: Long, event_id: Long, ts_us: Long,
    event_type: String, value: Double)

class LatestEventProcessor
    extends StatefulProcessor[Long, EventRow, LatestEvent] {

  @transient private var latest: ValueState[LatestEvent] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    latest = getHandle.getValueState[LatestEvent](
      "latest", Encoders.product[LatestEvent], TTLConfig.NONE)

  private def micros(r: EventRow): Long =
    r.ts.getTime * 1000L + (r.ts.getNanos % 1000000) / 1000L

  override def handleInputRows(key: Long, rows: Iterator[EventRow],
      timers: TimerValues): Iterator[LatestEvent] = {
    var cur = if (latest.exists()) latest.get() else null
    rows.foreach { r =>
      val tsUs = micros(r)
      if (cur == null || tsUs > cur.ts_us ||
          (tsUs == cur.ts_us && r.event_id > cur.event_id))
        cur = LatestEvent(key, r.event_id, tsUs, r.event_type, r.value)
    }
    if (cur == null) Iterator.empty
    else {
      latest.update(cur)
      Iterator.single(cur)
    }
  }
}
