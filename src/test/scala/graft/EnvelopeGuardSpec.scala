package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 guard-by-construction closures (r10 verdict items 4/5 +
  * ADVICE): the two envelopes that were documented-not-guarded now
  * RAISE instead of silently wrapping / silently single-task-sorting.
  *
  *   - e56's Gini numerator rides [[graft.functions.Det.r4]] whose
  *     precondition (|num| < 2⁶³/20000) is breached at ~3·10⁵ users at
  *     $100 average spend — the tightest envelope in the suite. The
  *     a-priori bound 3·N²·max(cents) is computed in DOUBLE so the
  *     check itself cannot wrap.
  *   - e53's exact per-group median is the declared sampled-slice
  *     verification harness; its per-group single-task sort envelope
  *     ([[graft.operators.Events.E53MaxGroupRows]]) is welded into the
  *     output expression (plus a plan-time Catalyst-stats ceiling in
  *     the public entry, exercised by the 100× probe, not here).
  */
class EnvelopeGuardSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = TestSession.sf

  private def raisesWith(frag: String)(body: => Unit): Unit = {
    val e = intercept[Throwable](body)
    val found = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).take(8)
      .exists(t => Option(t.getMessage).exists(_.contains(frag)))
    assert(found, s"expected a cause mentioning '$frag', got: $e")
  }

  test("e56 gini guard raises on a synthetic int64-envelope breach") {
    import spark.implicits._
    // one user at 2·10¹⁴ cents: the gini bound 3·1²·2e14 = 6e14 ≥
    // r4NumBound → raise, while every OTHER column's r4 stays in range
    // (dcents·20000 = 4e18 < 2⁶³) — a larger breach value would ALSO
    // overflow the share column's multiply, and then whichever
    // exception surfaces first (ANSI overflow vs the guard's raise) is
    // evaluation-order-dependent and the assertion flakes
    val per = Seq((1L, 200000000000000L)).toDF("user_id", "cents")
    raisesWith("e56_gini") {
      graft.operators.Events.spendConcentrationOf(per).collect()
    }
  }

  test("e56 gini guard passes within the envelope (fixture path)") {
    // the declared query on the fixture must be untouched by the guard
    val rows = graft.operators.Events.spendConcentration(spark, sf).collect()
    assert(rows.length == 10)
    val gini = rows.head.getAs[Double]("gini")
    assert(gini >= 0.0 && gini <= 1.0, s"gini=$gini out of [0,1]")
  }

  test("e53 runtime group-size guard raises beyond E53MaxGroupRows") {
    import spark.implicits._
    val over = graft.operators.Events.E53MaxGroupRows + 1
    val j = spark.range(over).select(lit("g").as("event_type"),
      (col("id") % 1000L).as("c"))
    raisesWith("e54_binned_mad_outliers") {
      graft.operators.Events.valueMadOutliersOf(j).collect()
    }
  }

  test("e53 passes within the envelope on the fixture") {
    val rows = graft.operators.Events.valueMadOutliers(spark, sf).collect()
    assert(rows.length == 5)
  }
}
