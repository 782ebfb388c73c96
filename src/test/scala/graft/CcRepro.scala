package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression pin for a one-off GraphProps falsification observed in a
  * full parallel-suite run (2026-08-14): both the original and the
  * shrunk counterexample lists verify CORRECT deterministically in
  * isolation (10× each) and under targeted concurrent streaming load —
  * the flake never reproduced. These exact graphs stay pinned here so
  * any genuine regression on their shapes (duplicate edges, self
  * loops, 0-ids, negative ids from ScalaCheck shrinking) fails loudly
  * and reproducibly. */
class CcRepro extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def check(edges: List[(Long, Long)],
      expected: Map[Long, Long]): Unit = {
    import spark.implicits._
    val got = graft.operators.Graph
      .connectedComponents(edges.toDF("d1", "d2"))
      .as[(Long, Long)].collect().toMap
    assert(got == expected, s"edges=$edges")
  }

  test("pinned: the original falsified arg list (dups, self-loops, id 0)") {
    check(
      List((30L, 0L), (15L, 0L), (19L, 17L), (30L, 0L), (21L, 19L),
        (6L, 10L), (0L, 0L), (29L, 27L), (7L, 7L)),
      Map(0L -> 0L, 30L -> 0L, 15L -> 0L, 17L -> 17L, 19L -> 17L,
        21L -> 17L, 6L -> 6L, 10L -> 6L, 27L -> 27L, 29L -> 27L,
        7L -> 7L))
  }

  test("pinned: the shrunk falsified arg list (negative ids)") {
    check(
      List((-1L, 0L), (1L, 2L), (-2L, 4L), (3L, 5L), (-3L, 27L),
        (7L, 7L)),
      Map(-1L -> -1L, 0L -> -1L, 1L -> 1L, 2L -> 1L, -2L -> -2L,
        4L -> -2L, 3L -> 3L, 5L -> 3L, -3L -> -3L, 27L -> -3L,
        7L -> 7L))
  }
}
