package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` computing the integer Gram matrix (Σ mᵀm), the
  * per-dimension sums, and the row count of a quantized embedding table
  * in ONE distributed pass — the scale path for covariance/PCA: partial
  * (d² + d + 1)-sized buffers merge associatively map-side, so a 100 TB
  * embedding table shuffles one buffer per partition instead of
  * exploding to (vec, j, k) pair rows (the join formulation is d²·n
  * intermediate rows — 4×10¹² at n = 10⁹).
  *
  * Inputs are pre-quantized integer (milli-unit) vectors, so every sum
  * is exact and order-independent — the aggregation commutes, which is
  * what makes the result reproducible across partitionings and engines.
  * Long-overflow envelope: |Σ m·m| ≤ n · (10³·max|x|)² — safe beyond
  * 10¹¹ rows for unit-scale embeddings. */
object GramAggregator
    extends Aggregator[Array[Long], GramBuf, GramBuf] {

  override def zero: GramBuf =
    GramBuf(Array.empty[Long], Array.empty[Long], 0L)

  override def reduce(b: GramBuf, m: Array[Long]): GramBuf = {
    val d = m.length
    // Ragged input must fail fast: indexing the buffer with THIS row's d
    // would silently scatter products into wrong Gram cells (shorter row)
    // or throw AIOOBE (longer row); a post-hoc dimension check on the
    // aggregate cannot see rows that happened to match the first one.
    require(b.sums.isEmpty || d == b.sums.length,
      s"GramAggregator: ragged vector length $d, expected ${b.sums.length}")
    val sums = if (b.sums.isEmpty) new Array[Long](d) else b.sums
    val gram = if (b.gram.isEmpty) new Array[Long](d * d) else b.gram
    var j = 0
    while (j < d) {
      sums(j) += m(j)
      val mj = m(j); val base = j * d
      var k = 0
      while (k < d) { gram(base + k) += mj * m(k); k += 1 }
      j += 1
    }
    GramBuf(sums, gram, b.n + 1)
  }

  override def merge(a: GramBuf, b: GramBuf): GramBuf = {
    if (a.sums.isEmpty) b
    else if (b.sums.isEmpty) a
    else {
      require(a.sums.length == b.sums.length,
        s"GramAggregator: merging buffers of dims ${a.sums.length} and " +
          s"${b.sums.length} — input vectors are ragged")
      var i = 0
      while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
      i = 0
      while (i < a.gram.length) { a.gram(i) += b.gram(i); i += 1 }
      GramBuf(a.sums, a.gram, a.n + b.n)
    }
  }

  override def finish(b: GramBuf): GramBuf = b

  override def bufferEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
  override def outputEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
}

/** Partial second moments: per-dim sums, row-major d×d Gram, count. */
case class GramBuf(sums: Array[Long], gram: Array[Long], n: Long)
