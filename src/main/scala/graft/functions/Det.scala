package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers for oracle-compared aggregates.
  *
  * Floating-point `sum()` is order-dependent: at cluster scale the partial
  * aggregation order differs run-to-run (and engine-to-engine), so a raw
  * double sum can differ from the DuckDB oracle in the last few ulps — and
  * occasionally across a `round()` boundary. Casting to DECIMAL first makes
  * the aggregation exact and order-independent in BOTH engines; the final
  * cast back to double is then a single deterministic conversion.
  *
  * The same pattern is what you'd use on a 1000-executor cluster to make
  * money aggregates reproducible across reruns with different partitioning.
  */
object Det {
  /** Exact 4-decimal fixed-point view of a double column. */
  def dec4(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Order-independent sum of a money-ish double column → double, 2 dp. */
  def dsum(c: Column): Column = round(sum(dec4(c)).cast("double"), 2)

  /** Order-independent sum, custom rounding. */
  def dsum(c: Column, scale: Int): Column =
    round(sum(dec4(c)).cast("double"), scale)

  /** Order-independent average (exact decimal sum / long count) → 4 dp. */
  def davg(c: Column): Column =
    round(sum(dec4(c)).cast("double") / count(lit(1)), 4)

  /** Floor division of integer columns, REQUIRES b > 0: subtracting the
    * positive modulus makes the numerator exactly divisible, so the
    * truncating `div` IS the floor. NOTE: DuckDB's `//` also truncates
    * toward zero on negative numerators (-7 // 2 = -3, measured on the
    * sandbox's duckdb 1.0), so an oracle whose numerator can go
    * negative must mirror the floor EXPLICITLY via [[sql.fdiv]] /
    * [[sql.r4]] — bare `//` only agrees on non-negatives. */
  def fdiv(a: Column, b: Column): Column =
    call_function("div", a - pmod(a, b), b)

  /** Exact half-up rounding of the rational num/den to 4 decimals, in
    * integer arithmetic: round(10⁴·num/den) = (2·10⁴·num + den) fdiv
    * (2·den). Bit-identical in Spark and DuckDB by construction — the
    * double-divide-then-round alternative puts ties at the 5th decimal
    * at the mercy of each engine's last ulp. REQUIRES den > 0 and
    * |num| < 2⁶³/20000; negative num floors like DuckDB `//`, i.e.
    * ties round toward +∞ (HALF_UP proper on non-negatives). The
    * floor-tie semantics are LOAD-BEARING: d47's classifierScore
    * passes a signed Σw numerator, and both engines agree only
    * because fdiv is true floor on each.
    *
    * DECIMAL input caveat: `div` on decimals computes the integral
    * quotient exactly but narrows it through `Decimal.toLong`, which
    * wraps SILENTLY past 2⁶³ — so decimal rationals whose 10⁴-scaled
    * quotient can leave the long range (e57's cusum_max: num/den is
    * the unbounded per-key mean) MUST use [[r4Dec]]; this face is
    * only decimal-safe when the quotient is a-priori bounded (shares
    * ≤ 1, Gini ≤ ~3 — quotient ≤ ~3·10⁴). */
  def r4(num: Column, den: Column): Column =
    fdiv(num * 20000L + den, den * 2L) / 10000.0

  /** |num| < 2⁶³/20000 ≈ 4.61e14 — the [[r4]] precondition (num·20000
    * must stay a Long). Guards compare an a-priori BOUND against a
    * margin below this, not the computed value itself: a wrapped
    * intermediate can land back in range, so only the envelope check
    * is sound. */
  val r4NumBound: Double = 4.0e14

  /** [[r4]]'s DECIMAL(38,0) counterpart for the decimal guard branches
    * (e57/e58): the same exact half-up 4-dp rational, but the floored
    * quotient stays in DECIMAL(38,0) via [[DecimalFloorDiv]] instead of
    * the builtin `div`, whose `Decimal.toLong` narrowing WRAPS silently
    * once the quotient exceeds 2⁶³ — i.e. whenever num/den ≥ ~9.2·10¹⁴,
    * far inside the 5·10³³ numerator envelope (the r13 ADVICE finding:
    * [[r4]] on decimal input returned garbage across most of the
    * magnitude range the decimal branch was built to remediate). The
    * final division by 10⁴ is the single double conversion, mirroring
    * the DuckDB oracle's HUGEINT quotient → double exactly. REQUIRES
    * den > 0 and |num| < 10³⁸/20000 ([[r4DecBound]]) so num·20000
    * stays within 38 digits. */
  def r4Dec(num: Column, den: Column): Column = {
    val d38 = DecimalType(38, 0)
    DecimalFloorDiv(num.cast(d38) * lit(20000L).cast(d38) + den.cast(d38),
      den.cast(d38) * lit(2L).cast(d38)).cast("double") / 10000.0
  }

  /** The DECIMAL(38,0) analogue of [[r4NumBound]]: [[r4Dec]]'s
    * num·20000 must stay within 38 digits, so |num| < 10³⁸/20000 =
    * 5·10³³ — the envelope of the e57/e58 decimal branches (20 orders
    * of magnitude of headroom over the int64 edge; a per-key history
    * breaching THIS needs ~10¹⁴ events at cent magnitude 10⁴, i.e.
    * repartition the problem, don't widen the type again). */
  val r4DecBound: Double = 5.0e33

  /** Fail-fast integer-envelope guard: returns `v` when `bound` (an
    * a-priori per-key bound on the intermediate magnitudes, computed in
    * DOUBLE so the check itself cannot wrap) is below `limit`, else
    * raises with `tag`. The CASE/raise_error pattern stays inside
    * whole-stage codegen — per-output-row cost, not per-input-row.
    * `label` names the arithmetic envelope in the message; `hint` is
    * the operator's remediation text — it should name a branch that
    * RUNS (the r12 verdict: a raise pointing at code that doesn't
    * exist is a dead end at 100 TB). */
  def guarded(v: Column, bound: Column, limit: Double, tag: String,
      label: String = "int64",
      hint: String = "rerun with DECIMAL(38) arithmetic"): Column =
    when(bound < limit, v).otherwise(raise_error(concat(
      lit(s"$tag: $label envelope exceeded (bound "), bound.cast("string"),
      lit(s" >= $limit) — $hint"))))

  /** SQL fragments for the DuckDB oracle, mirroring the above exactly. */
  object sql {
    def dec4(e: String): String = s"CAST($e AS DECIMAL(18,4))"
    def dsum(e: String, alias: String, scale: Int = 2): String =
      s"round(CAST(sum(${dec4(e)}) AS DOUBLE), $scale) AS $alias"
    def davg(e: String, alias: String): String =
      s"round(CAST(sum(${dec4(e)}) AS DOUBLE) / count(*), 4) AS $alias"

    /** True floor division in DuckDB, any-sign numerator (b > 0):
      * DuckDB's `%` keeps the dividend's sign, so the positive modulus
      * is `((a % b) + b) % b`; subtracting it makes the numerator
      * exactly divisible and `//`'s truncation moot — the literal
      * mirror of [[Det.fdiv]]. Bare `//` truncates toward zero and
      * would disagree with fdiv for a < 0. */
    def fdiv(a: String, b: String): String =
      s"((($a) - (((($a) % ($b)) + ($b)) % ($b))) // ($b))"

    /** The [[Det.r4]] rational half-up 4-dp rounding, floor-exact for
      * negative numerators too. */
    def r4(num: String, den: String): String =
      s"${fdiv(s"($num) * 20000 + ($den)", s"($den) * 2")} / 10000.0"
  }
}
