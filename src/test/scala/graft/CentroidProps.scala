package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.functions.{CentroidAggregator, CentroidBuf}

/** ScalaCheck properties for the distributed-merge contract: Spark may
  * split rows across partitions arbitrarily and merge partial buffers in
  * any tree order, so `merge` must be associative/commutative with
  * `reduce` up to floating-point tolerance. */
object CentroidProps extends Properties("CentroidAggregator") {

  private val dim = 4
  private val vecGen: Gen[Array[Float]] =
    Gen.listOfN(dim, Gen.chooseNum(-10.0f, 10.0f)).map(_.toArray)
  private val vecsGen: Gen[List[Array[Float]]] =
    Gen.nonEmptyListOf(vecGen)

  private def reduceAll(vs: Seq[Array[Float]]): CentroidBuf =
    vs.foldLeft(CentroidAggregator.zero)(CentroidAggregator.reduce)

  private def close(a: Array[Double], b: Array[Double]): Boolean =
    a.length == b.length &&
      a.zip(b).forall { case (x, y) => math.abs(x - y) < 1e-4 }

  property("split-and-merge equals sequential reduce") =
    Prop.forAll(vecsGen, Gen.chooseNum(0, 100)) { (vs, cut) =>
      val k = if (vs.isEmpty) 0 else cut % vs.length
      val (l, r) = vs.splitAt(k)
      val merged = CentroidAggregator.merge(reduceAll(l), reduceAll(r))
      val direct = reduceAll(vs)
      merged.n == direct.n && close(
        CentroidAggregator.finish(merged).centroid,
        CentroidAggregator.finish(direct).centroid)
    }

  property("merge is commutative") =
    Prop.forAll(vecsGen, vecsGen) { (a, b) =>
      val ab = CentroidAggregator.merge(reduceAll(a), reduceAll(b))
      val ba = CentroidAggregator.merge(reduceAll(b), reduceAll(a))
      ab.n == ba.n && close(
        CentroidAggregator.finish(ab).centroid,
        CentroidAggregator.finish(ba).centroid)
    }

  property("zero is a merge identity") =
    Prop.forAll(vecsGen) { vs =>
      val buf = reduceAll(vs)
      val m = CentroidAggregator.merge(buf, CentroidAggregator.zero)
      m.n == buf.n && close(
        CentroidAggregator.finish(m).centroid,
        CentroidAggregator.finish(buf).centroid)
    }
}
