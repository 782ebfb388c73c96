package graft

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the exact-rational rounding helper that
  * most oracle-compared ratios ride on: `Det.r4(num, den)` must equal
  * HALF_UP 4-dp decimal rounding of num/den for every non-negative
  * int64 pair the operators can produce — including exact .00005
  * boundaries, where a float path would tie-break unpredictably. */
object DetProps extends Properties("Det.r4") {

  private lazy val spark = TestSession.spark

  private val fracGen: Gen[(Long, Long)] = for {
    den <- Gen.chooseNum(1L, 2000000L)
    num <- Gen.chooseNum(0L, den * 3)
  } yield (num, den)

  property("equals BigDecimal HALF_UP rounding of num/den") =
    Prop.forAll(Gen.listOfN(20, fracGen)) { pairs =>
      import spark.implicits._
      val got = pairs.toDF("num", "den")
        .select(graft.functions.Det.r4($"num", $"den").as("r"))
        .collect().map(_.getDouble(0)).toSeq
      val want = pairs.map { case (n, d) =>
        BigDecimal(n).setScale(10)./(BigDecimal(d))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      got == want
    }

  // DuckDB's bare `//` TRUNCATES toward zero on negatives; oracles
  // that can see a negative numerator mirror this floor explicitly
  // via Det.sql.fdiv (pmod-subtract), exercised end-to-end by the
  // d33 zipf slope's negative numerator
  property("fdiv equals Math.floorDiv for any sign") =
    Prop.forAll(Gen.listOfN(20, for {
      b <- Gen.chooseNum(1L, 1000000L)
      a <- Gen.chooseNum(-3000000000L, 3000000000L)
    } yield (a, b))) { pairs =>
      import spark.implicits._
      val got = pairs.toDF("a", "b")
        .select(graft.functions.Det.fdiv($"a", $"b").as("r"))
        .collect().map(_.getLong(0)).toSeq
      got == pairs.map { case (a, b) => Math.floorDiv(a, b) }
    }

  // negative numerators (e.g. a TWAP over negative values, d33's zipf
  // slope): r4 floors — ties round toward +∞ instead of away from
  // zero — and the oracle mirrors that floor via Det.sql.r4's
  // pmod-subtract (NOT bare `//`, which truncates)
  property("negative numerators floor identically to the oracle") =
    Prop.forAll(Gen.listOfN(20, for {
      den <- Gen.chooseNum(1L, 2000000L)
      num <- Gen.chooseNum(-den * 3, 0L)
    } yield (num, den))) { pairs =>
      import spark.implicits._
      val got = pairs.toDF("num", "den")
        .select(graft.functions.Det.r4($"num", $"den").as("r"))
        .collect().map(_.getDouble(0)).toSeq
      got == pairs.map { case (n, d) =>
        Math.floorDiv(n * 20000L + d, d * 2L) / 10000.0 }
    }

  // the e41/e43 envelope guard: values whose a-priori bound is under
  // the r4 precondition pass through untouched; a bound at/over it
  // raises instead of silently wrapping (the failure mode ADVICE r7
  // flagged — DuckDB widens to HUGEINT, int64 Spark would diverge)
  property("guarded passes under the bound and raises at it") =
    Prop.forAll(Gen.chooseNum(0L, 1000000L)) { v =>
      import spark.implicits._
      import org.apache.spark.sql.functions.lit
      val under = Seq(v).toDF("v")
        .select(graft.functions.Det.guarded($"v", lit(v.toDouble),
          graft.functions.Det.r4NumBound, "test").as("g"))
        .collect().head.getLong(0)
      val over =
        try {
          Seq(v).toDF("v")
            .select(graft.functions.Det.guarded($"v",
              lit(graft.functions.Det.r4NumBound), // bound == limit → raise
              graft.functions.Det.r4NumBound, "test").as("g"))
            .collect(); false
        } catch { case e: Throwable =>
          // Spark wraps the codegen'd raise_error in a SparkRuntimeException
          Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
            .take(5).exists(_.getMessage.contains("int64 envelope exceeded"))
        }
      Prop(under == v && over) :| s"under=$under over=$over"
    }

  // r4Dec must agree with r4 everywhere r4 is exact (the int64-safe
  // overlap) — the cross-face equality both decimal branches lean on
  property("r4Dec equals r4 on the int64-safe overlap") =
    Prop.forAll(Gen.listOfN(20, fracGen)) { pairs =>
      import spark.implicits._
      val both = pairs.toDF("num", "den")
        .select(graft.functions.Det.r4($"num", $"den").as("a"),
          graft.functions.Det.r4Dec($"num", $"den").as("b"))
        .collect().map(r => (r.getDouble(0), r.getDouble(1)))
      both.forall { case (a, b) => a == b }
    }

  // the r13 ADVICE regression: past the long-quotient edge (num/den ≥
  // ~9.2e14) the builtin-div r4 wraps through Decimal.toLong; r4Dec
  // must return the exact BigInt rational at any 38-digit magnitude
  property("r4Dec equals BigInt truth past the long-quotient edge") =
    Prop.forAll(Gen.listOfN(10, for {
      den <- Gen.chooseNum(1L, 1000000L)
      // num = hi·10¹⁸ + lo up to ~4.9e33 (inside Det.r4DecBound, so
      // num·20000 stays within 38 digits), quotient up to ~4.9e33/den
      // — far beyond 2⁶³ for any den in range
      hi <- Gen.chooseNum(1L, 4900000000000000L) // ≤ 4.9e15
      lo <- Gen.chooseNum(0L, 999999999999999999L) // 18 digits
    } yield (BigInt(hi) * BigInt("1000000000000000000") + lo, den))) {
      pairs =>
        import spark.implicits._
        val got = pairs.map { case (n, d) => (n.toString, d) }
          .toDF("num", "den")
          .select(graft.functions.Det.r4Dec(
            $"num".cast("decimal(38,0)"), $"den").as("r"))
          .collect().map(_.getDouble(0)).toSeq
        val want = pairs.map { case (n, d) =>
          val dd = BigInt(d)
          val a = n * 20000 + dd
          val b = dd * 2
          BigDecimal((a - a.mod(b)) / b).toDouble / 10000.0
        }
        Prop(got == want) :| s"got=$got want=$want"
    }

  // the boundary the grain exists for: x.00005 exactly — HALF_UP must
  // round UP deterministically in both engines
  property("exact .5-at-grain boundaries round up") = {
    import spark.implicits._
    // 1/20000 = 0.00005 → 0.0001; 3/20000 = 0.00015 → 0.0002
    val got = Seq((1L, 20000L), (3L, 20000L), (5L, 20000L))
      .toDF("num", "den")
      .select(graft.functions.Det.r4($"num", $"den").as("r"))
      .collect().map(_.getDouble(0)).toSeq
    Prop(got == Seq(0.0001, 0.0002, 0.0003)) :| s"got $got"
  }
}
