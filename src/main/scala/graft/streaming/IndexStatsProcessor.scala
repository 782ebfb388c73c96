package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Incremental inverted-index statistics — the streaming face of the
  * d37 batch build: per-term document frequency and total term
  * frequency live in state, and each arriving document batch folds its
  * (term, doc, tf) rows in and re-emits the updated stats for every
  * term it touched. This is how a production retrieval pipeline keeps
  * its index fresh against an append-only ingest: per batch, only the
  * TOUCHED terms pay any work — the index is never rebuilt, and the
  * stored state is two Longs per distinct term.
  *
  * Keyed by term. Input rows are one per (term, doc) — each therefore
  * adds exactly 1 to df — carrying that document's term frequency.
  * Emits one row per (touched term, batch) with the post-batch totals,
  * so the LATEST emission per term (df is monotone — max struct) is
  * the current index row, which is what the declared query snapshots. */
case class TermDocTf(term: String, doc_id: Long, tf: Long)

case class TermStats(term: String, df: Long, tf_total: Long)

class IndexStatsProcessor
    extends StatefulProcessor[String, TermDocTf, TermStats] {

  @transient private var stats: ValueState[TermStats] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    stats = getHandle.getValueState[TermStats](
      "stats", Encoders.product[TermStats], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[TermDocTf],
      timers: TimerValues): Iterator[TermStats] = {
    var df = 0L
    var tf = 0L
    rows.foreach { r => df += 1L; tf += r.tf }
    val prev =
      if (stats.exists()) stats.get() else TermStats(key, 0L, 0L)
    val next = TermStats(key, prev.df + df, prev.tf_total + tf)
    stats.update(next)
    Iterator.single(next)
  }
}
