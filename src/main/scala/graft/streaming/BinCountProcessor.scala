package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** s46's state: the per-event-type $1-bin histogram of value cents —
  * e54's bin table as MERGEABLE MONOID STATE, held in a native
  * [[MapState]] (bin → count) so each arriving row touches ONE map
  * entry instead of rewriting a whole table value (the state-store
  * write amplification a ValueState-of-map would pay; MapType is also
  * not an encodable ValueState type). Counts are commutative +
  * associative, so batch boundaries can't change the result — exactly
  * why e54's binned shape is the streaming-compatible substitute for
  * exact per-group medians (e53's rank-sorts can't stream). The store
  * is the product (s42's Interactive-Queries discipline): the serving
  * layer reads it out-of-band and applies e54's cumsum read-off over
  * BINS, never events — so the processor emits nothing. */
case class BinDelta(event_type: String, bin: Long)

class BinCountProcessor
    extends StatefulProcessor[String, BinDelta, BinDelta] {

  @transient private var bins: MapState[Long, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    bins = getHandle.getMapState[Long, Long](
      "bins", Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[BinDelta],
      timers: TimerValues): Iterator[BinDelta] = {
    rows.foreach { r =>
      val cur = if (bins.containsKey(r.bin)) bins.getValue(r.bin) else 0L
      bins.updateValue(r.bin, cur + 1L)
    }
    Iterator.empty
  }
}
