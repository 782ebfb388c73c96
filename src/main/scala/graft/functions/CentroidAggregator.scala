package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` computing a mean vector — the
  * Kafka-Streams `aggregate(initializer, adder)` analogue on the typed
  * Dataset API, and the scale path for per-label centroids: partial
  * buffers merge associatively map-side, so a 100 TB embedding table
  * shuffles only one (sum, count) buffer per label per partition
  * instead of exploding to (label, pos) rows.
  *
  * Usage: `ds.groupByKey(_.label).mapValues(_.embedding)
  *           .agg(CentroidAggregator.toColumn)`.
  */
object CentroidAggregator
    extends Aggregator[Array[Float], CentroidBuf, CentroidOut] {

  override def zero: CentroidBuf = CentroidBuf(Array.empty[Double], 0L)

  override def reduce(b: CentroidBuf, v: Array[Float]): CentroidBuf = {
    val sum = if (b.sum.isEmpty) new Array[Double](v.length) else b.sum
    var i = 0
    while (i < v.length && i < sum.length) { sum(i) += v(i); i += 1 }
    CentroidBuf(sum, b.n + 1)
  }

  override def merge(a: CentroidBuf, b: CentroidBuf): CentroidBuf = {
    if (a.sum.isEmpty) b
    else if (b.sum.isEmpty) a
    else {
      val out = new Array[Double](a.sum.length)
      var i = 0
      while (i < out.length) { out(i) = a.sum(i) + b.sum(i); i += 1 }
      CentroidBuf(out, a.n + b.n)
    }
  }

  override def finish(b: CentroidBuf): CentroidOut =
    CentroidOut(b.sum.map(_ / b.n), b.n)

  override def bufferEncoder: Encoder[CentroidBuf] = Encoders.product[CentroidBuf]
  override def outputEncoder: Encoder[CentroidOut] = Encoders.product[CentroidOut]
}

case class CentroidBuf(sum: Array[Double], n: Long)
case class CentroidOut(centroid: Array[Double], n: Long)
