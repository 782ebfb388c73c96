package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Streaming AS-OF join — the temporal-table lookup a Kafka Streams app
  * gets from a versioned KTable, and a financial pipeline calls
  * trade-against-quote: each probe-side record joins the latest
  * reference record for its key with ts ≤ the probe's ts.
  *
  * Keyed by user. Reference rows ("Q") append (ts, event_id, value) to
  * per-key ListState — RocksDB list appends are O(1) amortized and the
  * key's history never rewrites. Probe rows ("T") scan the key's list
  * for the maximum (ts, event_id) ≤ (probe ts, ∞) — linear in the
  * key's reference history here; a production deployment keyed by a
  * hot instrument would hold the history in a MapState with a
  * range-scannable timestamp key instead, turning the probe into a
  * seek. Probes with no covering reference emit a null quote (the
  * left-outer as-of contract).
  *
  * Ordering contract: reference rows arrive in an earlier micro-batch
  * than probes (the versioned-table snapshot discipline, same as s14/
  * s15's table batches); interleaved late references would need
  * event-time buffering — watermark + timer — which [[graft.streaming
  * .StreamOps]] exercises separately in its windowed joins. */
case class AsOfEvent(
    user_id: Long,    // grouping key
    side: String,     // "Q" = reference (quote), "T" = probe (trade)
    ts_us: Long,      // event-time micros
    event_id: Long,
    value: Double)

case class AsOfJoined(trade_id: Long, user_id: Long, trade_ts_us: Long,
    quote_ts_us: java.lang.Long, quote_value: java.lang.Double)

class AsOfJoinProcessor
    extends StatefulProcessor[Long, AsOfEvent, AsOfJoined] {

  @transient private var quotes: ListState[AsOfEvent] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    quotes = getHandle.getListState[AsOfEvent](
      "quotes", Encoders.product[AsOfEvent], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[AsOfEvent],
      timers: TimerValues): Iterator[AsOfJoined] = {
    val out = scala.collection.mutable.ArrayBuffer[AsOfJoined]()
    rows.foreach { e =>
      if (e.side == "Q") {
        quotes.appendValue(e)
      } else {
        // latest (ts, event_id) at or before the probe's timestamp
        var best: AsOfEvent = null
        quotes.get().foreach { q =>
          if (q.ts_us <= e.ts_us &&
              (best == null || q.ts_us > best.ts_us ||
                (q.ts_us == best.ts_us && q.event_id > best.event_id)))
            best = q
        }
        out += (if (best == null)
          AsOfJoined(e.event_id, key, e.ts_us, null, null)
        else
          AsOfJoined(e.event_id, key, e.ts_us, best.ts_us, best.value))
      }
    }
    out.iterator
  }
}
