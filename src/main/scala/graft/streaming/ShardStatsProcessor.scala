package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** s51's state: the per-shard manifest counters (docs, tokens, bytes)
  * of the training-output sharding step — d57's manifest cells as
  * MERGEABLE MONOID STATE. Keyed BY SHARD, so the fold is
  * shard-parallel (the writer's natural layout: each shard's counters
  * live with the task that owns the shard) and state is exactly
  * |occupied shards| cells regardless of corpus volume — the
  * hardest-capped state bound in the ingest family. Sums are
  * commutative + associative, so batch boundaries can't change the
  * result. The store is the product (the s42/s46 Interactive-Queries
  * discipline): the serving layer reads it out-of-band and applies
  * d57's balance read-off over CELLS, never documents — so the
  * processor emits nothing. */
case class ShardDelta(shard: Long, toks: Long, bytes: Long)

case class ShardCell(n_docs: Long, n_tokens: Long, n_bytes: Long)

class ShardStatsProcessor
    extends StatefulProcessor[Long, ShardDelta, ShardDelta] {

  @transient private var cell: ValueState[ShardCell] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    cell = getHandle.getValueState[ShardCell](
      "cell", Encoders.product[ShardCell], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[ShardDelta],
      timers: TimerValues): Iterator[ShardDelta] = {
    var acc = if (cell.exists()) cell.get() else ShardCell(0L, 0L, 0L)
    rows.foreach { r =>
      acc = ShardCell(acc.n_docs + 1L, acc.n_tokens + r.toks,
        acc.n_bytes + r.bytes)
    }
    cell.update(acc)
    Iterator.empty
  }
}
