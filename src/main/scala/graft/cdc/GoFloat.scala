package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{lit, when}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Go `encoding/json` float64 rendering, for byte parity with the reference.
  *
  * The reference decodes FLOAT/DOUBLE/DECIMAL row values to Go float64
  * (go-mysql row parsing without UseDecimal; `util.go:136-139` passes them
  * through) and serializes with `json.Marshal`, whose float encoder differs
  * from Java's `Double.toString` in notation, not digits:
  *
  *  - plain decimal ('f') for 1e-6 ≤ |v| < 1e21, with NO forced ".0" on
  *    integral values: Go `123`, Java `123.0`; Go `12345678.9`, Java
  *    `1.23456789E7` (Java switches to scientific at 1e7, Go at 1e21);
  *  - scientific ('e') outside that range, lowercase `e`, explicit sign,
  *    two-digit positive exponents (`1e+21`), unpadded negative ones after
  *    json's own leading-zero cleanup (`1e-7`);
  *  - `-0.0` marshals as `-0`.
  *
  * Digits are computed as the SHORTEST round-tripping decimal directly (a
  * precision search with a parse-back check) rather than from
  * `Double.toString`: pre-19 JDKs' algorithm occasionally emits one digit
  * more than minimal (JDK-4511638 — observed on 1.25e22 → "1.2499…9E22"
  * under Java 17), which would diverge from Go's true-shortest output.
  */
object GoFloat {

  /** Go-`json.Marshal` rendering of a double. */
  def format(d: Double): String = {
    if (d == 0.0) return if (1 / d < 0) "-0" else "0"
    val (sign, digits, exp) = digitsExp(d)
    val abs = math.abs(d)
    if (abs < 1e-6 || abs >= 1e21) { // Go 'e' notation
      val mant = if (digits.length == 1) digits
        else digits.substring(0, 1) + "." + digits.substring(1)
      val ePart =
        if (exp < 0) "e-" + (-exp) // json strips the leading zero of e-0X
        else "e+" + (if (exp < 10) "0" + exp else exp.toString)
      sign + mant + ePart
    } else if (exp >= digits.length - 1) { // integral: pad zeros
      sign + digits + "0" * (exp - (digits.length - 1))
    } else if (exp < 0) { // pure fraction: 0.00ddd
      sign + "0." + "0" * (-exp - 1) + digits
    } else { // interior point
      sign + digits.substring(0, exp + 1) + "." + digits.substring(exp + 1)
    }
  }

  /** Shortest round-tripping digits of |d| (no dot, no trailing zeros) and
    * the base-10 exponent of the first digit: the first precision where SOME
    * p-digit decimal parses back to the same double. The loop exits at the
    * value's true digit count (a 4-digit price costs 4 iterations), 17
    * worst-case.
    *
    * At each precision both roundings of the exact binary expansion are
    * tried: HALF_UP and HALF_DOWN agree except when the expansion is an
    * EXACT halfway at digit p+1 — there, if both candidates round-trip,
    * Go's shortest-digit conversion (Ryu) is equidistant and ties the last
    * digit to EVEN, so that candidate is chosen. (If any p-digit decimal
    * round-trips, the nearest one does too, so checking these two is a
    * complete search.) A plain `%.Ne` is always HALF_UP, which diverges
    * from Go's bytes on those ties. */
  private def digitsExp(d: Double): (String, String, Int) = {
    val abs = math.abs(d)
    val sign = if (d < 0) "-" else ""
    val exact = new java.math.BigDecimal(abs) // exact binary expansion
    var p = 1
    while (p <= 17) {
      val up = exact.round(new java.math.MathContext(p, java.math.RoundingMode.HALF_UP))
      val down = exact.round(new java.math.MathContext(p, java.math.RoundingMode.HALF_DOWN))
      val upOk = up.doubleValue == abs
      val downOk = down.doubleValue == abs
      if (upOk || downOk) {
        val pick =
          if (upOk && downOk && up.compareTo(down) != 0) {
            // exact halfway: equidistant candidates — ties to even, like Ryu
            if (lastDigitAt(down, p) % 2 == 0) down else up
          } else if (upOk) up
          else down
        // unscaled digits + the base-10 exponent of the FIRST digit:
        // pick = unscaled * 10^-scale, so first-digit exp = (len-1) - scale
        val digits0 = pick.unscaledValue.abs.toString
        val exp = (digits0.length - 1) - pick.scale
        val digits = digits0.reverse.dropWhile(_ == '0').reverse
        return (sign, if (digits.isEmpty) "0" else digits, exp)
      }
      p += 1
    }
    // unreachable: 17 significant digits always round-trip a double
    (sign, java.lang.Double.toString(abs), 0)
  }

  /** The p-th significant digit of a value rounded to precision p (trailing
    * zeros restored: rounding 1.95 up at p=2 yields "2" with precision 1,
    * whose 2nd significant digit is the implied 0). */
  private def lastDigitAt(v: java.math.BigDecimal, p: Int): Int = {
    val ds = v.unscaledValue.abs.toString
    if (ds.length >= p) ds.charAt(p - 1) - '0' else 0
  }

  /** JSON number fragment Column with Go rendering; SQL-NULL → `null`. */
  def num(c: Column): Column = {
    val d = c.cast("double")
    when(d.isNull, lit("null"))
      .otherwise(Bridge.column(GoJsonNumber(Bridge.expression(d))))
  }
}

/** Codegen wrapper: a direct static call into [[GoFloat.format]] (standalone
  * Scala objects compile with static forwarders, so generated Java can call
  * `graft.cdc.GoFloat.format(double)`). */
case class GoJsonNumber(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(GoFloat.format(input.asInstanceOf[Double]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(graft.cdc.GoFloat.format($c))")
  override protected def withNewChildInternal(newChild: Expression): GoJsonNumber =
    copy(child = newChild)
}
