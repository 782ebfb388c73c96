package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.functions.{ScoredNeighbor, TopKAggregator}

/** ScalaCheck properties for the bounded top-k buffer (v11's
  * per-partition top-k): against arbitrary inputs and arbitrary
  * partition splits, reduce+merge must equal a plain sort-take-k —
  * the map-side-combine guarantee that lets the shuffle carry ≤ k
  * rows per (group, partition). */
object TopKProps extends Properties("TopKAggregator") {

  private val neighborGen: Gen[ScoredNeighbor] = for {
    // cos pre-rounded to the 1e-6 grain the operator uses, so ties are
    // real and the vec_id tiebreak is exercised
    cos <- Gen.chooseNum(-1000000L, 1000000L).map(_ / 1e6)
    id <- Gen.chooseNum(0L, 50L)
    label <- Gen.chooseNum(0, 9)
  } yield ScoredNeighbor(cos, id, label)

  private def expected(xs: List[ScoredNeighbor], k: Int) =
    xs.sortBy(n => (-n.cos, n.vec_id, n.label)).take(k)

  property("single-buffer reduce equals sort-take-k") =
    Prop.forAll(Gen.listOf(neighborGen), Gen.chooseNum(1, 7)) { (xs, k) =>
      val agg = new TopKAggregator(k)
      xs.foldLeft(agg.zero)(agg.reduce(_, _)) == expected(xs, k)
    }

  property("merge over any split equals sort-take-k, both merge orders") =
    Prop.forAll(Gen.listOf(neighborGen), Gen.chooseNum(1, 7),
      Gen.chooseNum(0.0, 1.0)) { (xs, k, frac) =>
      val agg = new TopKAggregator(k)
      val (a, b) = xs.splitAt((xs.length * frac).toInt)
      val bufA = a.foldLeft(agg.zero)(agg.reduce(_, _))
      val bufB = b.foldLeft(agg.zero)(agg.reduce(_, _))
      agg.merge(bufA, bufB) == expected(xs, k) &&
        agg.merge(bufB, bufA) == expected(xs, k)
    }

  property("buffers never exceed k") =
    Prop.forAll(Gen.listOf(neighborGen), Gen.chooseNum(1, 7)) { (xs, k) =>
      val agg = new TopKAggregator(k)
      val buf = xs.foldLeft(agg.zero)(agg.reduce(_, _))
      buf.lengthCompare(k) <= 0
    }

  // ---- streaming TopNProcessor fold (s18) --------------------------------

  private val pairGen: Gen[(Long, Double)] = for {
    id <- Gen.chooseNum(0L, 50L)
    // coarse value grid so ties are real and the id tiebreak fires
    v <- Gen.chooseNum(-5L, 5L).map(_ / 2.0)
  } yield (id, v)

  private def expectedTop(xs: List[(Long, Double)], n: Int) =
    xs.sortBy(p => (-p._2, p._1)).take(n)

  property("s18 fold over any batch split/order equals sort-take-n") =
    Prop.forAll(Gen.listOf(pairGen), Gen.chooseNum(1, 7),
      Gen.chooseNum(0.0, 1.0)) { (xs, n, frac) =>
      import graft.streaming.TopNProcessor.fold
      val (a, b) = xs.splitAt((xs.length * frac).toInt)
      fold(fold(Nil, a, n), b, n) == expectedTop(xs, n) &&
        fold(fold(Nil, b.reverse, n), a.reverse, n) == expectedTop(xs, n)
    }
}
