package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.functions.HeavyHittersAggregator

/** ScalaCheck properties for the Misra–Gries aggregator: the sketch
  * guarantees must hold for ARBITRARY input streams AND arbitrary
  * partition splits / merge orders — exactly what Spark's partial
  * aggregation does to it at scale. Pure JVM (no Spark job): reduce()
  * and merge() are exercised directly, which is both faster and a
  * stricter shuffle-order simulation than a local[4] plan. */
object SketchProps extends Properties("HeavyHittersAggregator") {

  private val k = 4

  private val streamGen: Gen[List[Long]] =
    Gen.nonEmptyListOf(Gen.chooseNum(0L, 12L)).map(_.take(300))

  // split the stream into 1..6 partitions, reduce each, merge left-fold
  private val partitionedGen: Gen[(List[Long], List[List[Long]])] = for {
    xs <- streamGen
    n <- Gen.chooseNum(1, 6)
    cuts <- Gen.listOfN(n - 1, Gen.chooseNum(0, xs.size))
  } yield {
    val bounds = (0 +: cuts.sorted :+ xs.size).distinct.sorted
    val parts = bounds.zip(bounds.tail)
      .map { case (a, b) => xs.slice(a, b) }
    (xs, parts)
  }

  private def sketch(parts: List[List[Long]]): Map[Long, Long] = {
    val agg = new HeavyHittersAggregator(k)
    parts.map(_.foldLeft(agg.zero)(agg.reduce))
      .foldLeft(agg.zero)(agg.merge)
  }

  property("keys with freq > n/(k+1) always survive") = Prop.forAll(partitionedGen) {
    case (xs, parts) =>
      val buf = sketch(parts)
      val trueCounts = xs.groupBy(identity).view.mapValues(_.size.toLong)
      val thresh = xs.size.toDouble / (k + 1)
      trueCounts.forall { case (x, c) => c <= thresh || buf.contains(x) }
  }

  property("counters never overcount, undercount bounded by n/(k+1)") =
    Prop.forAll(partitionedGen) { case (xs, parts) =>
      val buf = sketch(parts)
      val trueCounts = xs.groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      val bound = math.ceil(xs.size.toDouble / (k + 1)).toLong
      buf.forall { case (x, est) =>
        val c = trueCounts.getOrElse(x, 0L)
        est <= c && c - est <= bound
      }
    }

  property("summary size never exceeds k") = Prop.forAll(partitionedGen) {
    case (_, parts) => sketch(parts).size <= k
  }
}
