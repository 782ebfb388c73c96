package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins v30's stage composition beyond what the oracle hash can see:
  * the near-dup suppression stage must be LOAD-BEARING (at least one
  * candidate suppressed on the fixture — a τ that never fires would
  * leave stage 4 dead code the hash can't distinguish from correct),
  * asserted DIRECTLY on v30's own suppression set (an output-diff
  * proxy would be confounded by the en pre-filter), and every returned
  * id must satisfy the upstream stage contracts. */
class RetrievalPipelineSpec extends AnyFunSuite {
  import graft.operators.VectorOps
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  test("v30 suppression fires on the fixture and suppressed ids stay out") {
    import spark.implicits._
    val (ranked, sup) = VectorOps.retrievalStages(spark, sf)
    val supIds = sup.select($"vec_id").as[Long].collect().toSet
    assert(supIds.nonEmpty,
      "v30's suppression set is empty on the fixture — stage 4 is dead " +
        "code (ServeTau too high to be load-bearing)")
    // every suppressed id was a real ranked candidate (the stage prunes
    // genuine contenders, not rows some earlier stage already dropped)
    val rankedIds = ranked.select($"vec_id").as[Long].collect().toSet
    assert(supIds.subsetOf(rankedIds),
      s"suppressed ids not among ranked candidates: ${supIds -- rankedIds}")
    val out = VectorOps.retrievalPipeline(spark, sf).collect()
    assert(out.length == 5, s"top-5 underfilled: ${out.length}")
    val outIds = out.map(_.getAs[Long]("vec_id")).toSet
    assert(outIds.intersect(supIds).isEmpty,
      s"suppressed ids leaked into the top-5: ${outIds.intersect(supIds)}")
    // en pre-filter contract (v25's): only en docs can be returned
    val enIds = Tables.documents(spark, sf).filter($"lang" === "en")
      .select($"doc_id").as[Long].collect().toSet
    assert(outIds.subsetOf(enIds), "a non-en doc leaked through v30")
  }
}
