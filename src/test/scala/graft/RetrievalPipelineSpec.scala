package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins v30's stage composition beyond what the oracle hash can see:
  * the near-dup suppression stage must be LOAD-BEARING (at least one
  * candidate suppressed on the fixture — a τ that never fires would
  * leave stage 4 dead code the hash can't distinguish from correct),
  * and every returned id must satisfy the upstream stage contracts. */
class RetrievalPipelineSpec extends AnyFunSuite {
  import graft.operators.VectorOps
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  test("v30 suppression fires on the fixture and suppressed ids stay out") {
    import spark.implicits._
    val out = VectorOps.retrievalPipeline(spark, sf).collect()
    assert(out.length == 5, s"top-5 underfilled: ${out.length}")
    val outIds = out.map(_.getAs[Long]("vec_id")).toSet
    // recompute the capped ranking WITHOUT suppression: v28's shape
    // with v30's constants — the ids the pipeline ranked before stage 4
    val unsuppressed = VectorOps.diversifiedTopK(spark, sf).collect()
      .map(_.getAs[Long]("vec_id"))
    // same probe/cap constants ⇒ the unsuppressed top-5 is v28's head;
    // if suppression did anything, the two differ
    assert(outIds != unsuppressed.take(5).toSet,
      "v30 top-5 == unsuppressed top-5 — the suppression stage did " +
        "nothing on the fixture (ServeTau too high to be load-bearing)")
    // en pre-filter contract (v25's): only en docs can be returned
    val enIds = Tables.documents(spark, sf).filter($"lang" === "en")
      .select($"doc_id").as[Long].collect().toSet
    assert(outIds.subsetOf(enIds), "a non-en doc leaked through v30")
  }
}
