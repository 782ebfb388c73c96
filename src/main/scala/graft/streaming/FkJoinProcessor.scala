package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** KTable ⋈ KTable foreign-key join with CHANGELOG semantics — the piece
  * a plain batch equi-join can't express: when the RIGHT side (the
  * referenced table) updates, every already-joined left row with that
  * foreign key re-emits with the new right value.
  *
  * Kafka Streams implements this with an internal subscription topic
  * re-keyed by the foreign key; the Spark-native shape is the same idea:
  * both changelogs are merged into ONE stream keyed by the foreign key
  * (left rows by their fk column, right rows by their primary key), and
  * a `transformWithState` processor keeps, per fk:
  *   - the current right value (`ValueState`)
  *   - the live left rows referencing it (`MapState` keyed by left pk —
  *     a left upsert is one O(1) point write, NOT a rewrite of the
  *     whole referencing set; on RocksDB each map entry is its own
  *     key-value pair, so a hot fk with a million referencing rows
  *     costs one put per update and streams entry-by-entry on fan-out)
  * A left upsert emits its joined row immediately (if the right side
  * exists); a right upsert emits the full set of joined rows for that
  * fk — the changelog fan-out. State is partitioned by fk, so the
  * fan-out shuffle is the same re-key a Kafka Streams FK join pays.
  *
  * NULL foreign keys: Kafka Streams drops records with a null FK from
  * the join (no subscription can be registered); [[graft.streaming
  * .StreamOps.tableTableFkJoin]] mirrors that by filtering null keys
  * before the encoder (FkEvent.fk is a primitive Long).
  *
  * Scale: state per fk is (1 right value + referencing left rows) — the
  * same footprint as Kafka Streams' subscription store; RocksDB-backed
  * and bounded by the live key space, not the stream length. */
case class FkEvent(
    fk: Long,               // grouping key: left.fk == right.primary key
    side: String,           // "L" or "R"
    left_key: Long,         // left primary key (side=L)
    left_val: String,       // left payload  (side=L)
    right_val: String)      // right payload (side=R)

case class FkJoined(left_key: Long, fk: Long, left_val: String,
    right_val: String)

class FkJoinProcessor
    extends StatefulProcessor[Long, FkEvent, FkJoined] {

  @transient private var right: ValueState[String] = _
  @transient private var lefts: MapState[Long, String] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    right = getHandle.getValueState[String](
      "right", Encoders.STRING, TTLConfig.NONE)
    lefts = getHandle.getMapState[Long, String](
      "lefts", Encoders.scalaLong, Encoders.STRING, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[FkEvent],
      timers: TimerValues): Iterator[FkJoined] = {
    val out = scala.collection.mutable.ArrayBuffer[FkJoined]()
    rows.foreach { e =>
      if (e.side == "L") {
        // upsert the left row: one point write, O(1) per update
        lefts.updateValue(e.left_key, e.left_val)
        if (right.exists())
          out += FkJoined(e.left_key, key, e.left_val, right.get())
      } else {
        right.update(e.right_val)
        // changelog fan-out: re-emit every referencing left row
        lefts.iterator().foreach { case (lk, lv) =>
          out += FkJoined(lk, key, lv, e.right_val)
        }
      }
    }
    out.iterator
  }
}
