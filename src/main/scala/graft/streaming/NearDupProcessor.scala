package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Incremental MinHash/LSH near-duplicate detection — the streaming face
  * of the d06 batch pipeline: an existing corpus's LSH band buckets live
  * in state, and each INCOMING document probes its own band buckets
  * against them. This is how a production ingest pipeline dedups new
  * crawl data against 100 TB already ingested: nothing ever rescans the
  * corpus; the corpus is present only as band-bucket state.
  *
  * Keyed by bucket (band index + band hash). Per bucket the state is one
  * Long — the minimum corpus doc_id seen — so state size is bounded by
  * the number of OCCUPIED buckets (≤ 4 rows per corpus doc), not by
  * stream length. Corpus rows ("O") fold into that min and emit nothing;
  * incoming rows ("N") emit (new_doc, min corpus doc in bucket) when the
  * bucket is occupied. Downstream, min over a doc's emitted matches is
  * the GLOBAL minimum corpus doc sharing any band (min of per-bucket
  * minima = min of the union), which is what the declared query returns.
  */
case class BandEvent(
    bucket: String,   // grouping key: band index ':' band hash
    side: String,     // "O" = existing corpus, "N" = incoming
    doc_id: Long)

case class BandMatch(new_doc: Long, dup_of: Long)

class NearDupProcessor
    extends StatefulProcessor[String, BandEvent, BandMatch] {

  @transient private var minOld: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    minOld = getHandle.getValueState[Long](
      "minOld", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[BandEvent],
      timers: TimerValues): Iterator[BandMatch] = {
    val out = scala.collection.mutable.ArrayBuffer[BandMatch]()
    rows.foreach { e =>
      if (e.side == "O") {
        if (!minOld.exists() || e.doc_id < minOld.get())
          minOld.update(e.doc_id)
      } else if (minOld.exists()) {
        out += BandMatch(e.doc_id, minOld.get())
      }
    }
    out.iterator
  }
}
