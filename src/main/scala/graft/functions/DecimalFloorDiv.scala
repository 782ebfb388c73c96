package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType}

/** Exact 128-bit floor division over DECIMAL(38,0) integers — the
  * piece Spark's builtins are missing for the decimal guard branches
  * (e57/e58): the builtin `div` (IntegralDivide) computes the integral
  * quotient of DECIMAL operands exactly but then narrows it through
  * `Decimal.toLong`, which WRAPS silently once the quotient exceeds
  * 2⁶³ (verified on Spark 4.1.2: `CAST(1e30 AS DECIMAL(38,0)) div 3` =
  * 1692314756768421205, no error under ANSI defaults). [[Det.r4]]
  * therefore returns garbage for any decimal rational whose 10⁴-scaled
  * quotient leaves the long range — far inside the 5·10³³ numerator
  * envelope the decimal faces were built for. This expression keeps
  * the quotient in DECIMAL(38,0): `java.math.BigInteger` floor
  * division (truncating quotient, minus one when the remainder is
  * non-zero and the signs differ — true floor, matching [[Det.fdiv]]
  * and the DuckDB oracle's explicit-floor `//` mirror).
  *
  * Codegen: a static-call `defineCodeGen`, so the projection stays
  * inside whole-stage codegen. The call itself allocates BigIntegers —
  * acceptable because every use site is a per-OUTPUT-row readout (one
  * row per key after aggregation), never a per-input-row path.
  */
case class DecimalFloorDiv(left: Expression, right: Expression)
    extends BinaryExpression {
  // input typing is enforced by the Column face below (both sides cast
  // to DECIMAL(38,0)); ExpectsInputTypes is private[sql] in Spark 4
  override def dataType: DataType = DecimalType(38, 0)
  override def prettyName: String = "decimal_floor_div"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DecimalFloorDiv.compute(a.asInstanceOf[Decimal], b.asInstanceOf[Decimal])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DecimalFloorDiv.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object DecimalFloorDiv {
  /** floor(a / b) for scale-0 decimals, exact at any 38-digit
    * magnitude. b must be non-zero (callers divide by key counts /
    * positive totals; a zero denominator is a query bug, surfaced as
    * the ArithmeticException it is). */
  def compute(a: Decimal, b: Decimal): Decimal = {
    val x = a.toJavaBigDecimal.toBigIntegerExact
    val y = b.toJavaBigDecimal.toBigIntegerExact
    val qr = x.divideAndRemainder(y)
    val q =
      if (qr(1).signum != 0 && qr(1).signum != y.signum)
        qr(0).subtract(java.math.BigInteger.ONE)
      else qr(0)
    Decimal(new java.math.BigDecimal(q), 38, 0)
  }

  /** Column face: both sides cast to DECIMAL(38,0) first, so callers
    * can pass mixed decimal/long expressions. */
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(new DecimalFloorDiv(
      GraftColumnBridge.expression(a.cast(DecimalType(38, 0))),
      GraftColumnBridge.expression(b.cast(DecimalType(38, 0)))))
}
