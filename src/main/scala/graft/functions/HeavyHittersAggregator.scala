package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

case class HeavyHitter(id: Long, min_count: Long)

/** Misra–Gries heavy-hitters sketch as a typed [[Aggregator]] — the
  * canonical bounded-state top-k of high-load stream processing (Kafka
  * Streams apps hand-roll exactly this in a transformer state store).
  *
  * Guarantees (independent of partition/merge order): every key with
  * true frequency > n/(k+1) survives in the summary, and each surviving
  * key's counter underestimates its true count by at most n/(k+1).
  * The counter VALUES (and the non-heavy survivors) depend on merge
  * order, so the declared query takes the rows-only check; the
  * order-independent guarantee itself is pinned in SketchBoundsSpec.
  *
  * Scale: state is ≤ k counters per partial aggregate regardless of
  * input size — that is the whole point; merge is the standard MG
  * summary-merge (add counts, subtract the (k+1)-th largest, drop
  * non-positives).
  */
class HeavyHittersAggregator(k: Int)
    extends Aggregator[Long, Map[Long, Long], Seq[HeavyHitter]] {

  override def zero: Map[Long, Long] = Map.empty

  override def reduce(buf: Map[Long, Long], x: Long): Map[Long, Long] =
    buf.get(x) match {
      case Some(c) => buf.updated(x, c + 1)
      case None if buf.size < k => buf.updated(x, 1L)
      case None => // decrement-all step: drop keys reaching zero
        buf.view.mapValues(_ - 1).filter(_._2 > 0).toMap
    }

  override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] = {
    val sum = (a.keySet ++ b.keySet).iterator
      .map(key => key -> (a.getOrElse(key, 0L) + b.getOrElse(key, 0L))).toMap
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest count, keep strictly positive
      val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
      sum.view.mapValues(_ - cut).filter(_._2 > 0).toMap
    }
  }

  override def finish(buf: Map[Long, Long]): Seq[HeavyHitter] =
    buf.toSeq.map { case (id, c) => HeavyHitter(id, c) }
      .sortBy(h => (-h.min_count, h.id))

  override def bufferEncoder: Encoder[Map[Long, Long]] =
    ExpressionEncoder[Map[Long, Long]]()

  override def outputEncoder: Encoder[Seq[HeavyHitter]] =
    ExpressionEncoder[Seq[HeavyHitter]]()
}
