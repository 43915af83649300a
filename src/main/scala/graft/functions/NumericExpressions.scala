package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expressions for gcd/lcm (DuckDB surface; Spark has no
  * builtin). Both stay inside whole-stage codegen: a binary Euclid loop
  * over two longs, no allocation, NULL-propagating via nullSafeCodeGen —
  * custom-Expression preference order (b) from the builder prompt, same
  * shape as [[DotProduct]].
  *
  * DuckDB semantics matched: results are non-negative (gcd(-4, 6) = 2,
  * lcm(-4, 6) = 12), gcd(0, 0) = 0, lcm(x, 0) = 0.
  */
trait EuclidExpression extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two bigint arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  override def dataType: DataType = LongType

  protected final def euclid(a: Long, b: Long): Long = {
    var x = math.abs(a); var y = math.abs(b)
    while (y != 0) { val t = x % y; x = y; y = t }
    x
  }
  /** Codegen fragment computing euclid(|a|,|b|) into fresh var `g`. */
  protected final def genEuclid(ctx: CodegenContext, a: String, b: String,
      g: String): String = {
    val y = ctx.freshName("y")
    val t = ctx.freshName("t")
    s"""
       |long $g = java.lang.Math.abs($a);
       |long $y = java.lang.Math.abs($b);
       |while ($y != 0L) { long $t = $g % $y; $g = $y; $y = $t; }
     """.stripMargin
  }
}

case class Gcd(left: Expression, right: Expression) extends EuclidExpression {
  override def prettyName: String = "graft_gcd"
  override def nullSafeEval(a: Any, b: Any): Any =
    euclid(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val g = ctx.freshName("g")
      s"""
         |${genEuclid(ctx, a, b, g)}
         |${ev.value} = $g;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Gcd =
    copy(left = newLeft, right = newRight)
}

case class Lcm(left: Expression, right: Expression) extends EuclidExpression {
  override def prettyName: String = "graft_lcm"
  // DuckDB raises on overflow rather than wrapping: the product runs
  // through Math.multiplyExact (interpreted AND codegen), and the one
  // exact-arithmetic value abs() can't represent (Long.MinValue) errors
  // too. ArithmeticException surfaces as the query's error.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long]; val y = b.asInstanceOf[Long]
    val g = euclid(x, y)
    if (g == 0L) 0L
    else {
      val p = Math.multiplyExact(x / g, y)
      if (p == Long.MinValue)
        throw new ArithmeticException("lcm overflows BIGINT")
      math.abs(p)
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val g = ctx.freshName("g")
      val p = ctx.freshName("p")
      s"""
         |${genEuclid(ctx, a, b, g)}
         |if ($g == 0L) { ${ev.value} = 0L; } else {
         |  long $p = java.lang.Math.multiplyExact($a / $g, $b);
         |  if ($p == Long.MIN_VALUE)
         |    throw new ArithmeticException("lcm overflows BIGINT");
         |  ${ev.value} = java.lang.Math.abs($p);
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Lcm =
    copy(left = newLeft, right = newRight)
}

/** Gamma / log-gamma via the Lanczos approximation (g = 7, 9 terms —
  * ~15 significant digits, comfortably inside the 6-decimal rounding the
  * gates apply; the reflection formula covers x < 0.5). The JDK has no
  * Math.gamma, so the helper is shared by interpreted eval and codegen.
  */
object MathAlgos {
  private val G = 7.0
  private val Coef = Array(
    0.99999999999980993, 676.5203681218851, -1259.1392167224028,
    771.32342877765313, -176.61502916214059, 12.507343278686905,
    -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)

  def lgamma(x0: Double): Double =
    if (x0 < 0.5)
      math.log(math.Pi / math.abs(math.sin(math.Pi * x0))) - lgamma(1.0 - x0)
    else {
      val x = x0 - 1.0
      var a = Coef(0)
      val t = x + G + 0.5
      var i = 1
      while (i < 9) { a += Coef(i) / (x + i); i += 1 }
      0.5 * math.log(2 * math.Pi) + (x + 0.5) * math.log(t) - t + math.log(a)
    }

  def gamma(x: Double): Double =
    if (x < 0.5) math.Pi / (math.sin(math.Pi * x) * gamma(1.0 - x))
    else {
      val xx = x - 1.0
      var a = Coef(0)
      val t = xx + G + 0.5
      var i = 1
      while (i < 9) { a += Coef(i) / (xx + i); i += 1 }
      math.sqrt(2 * math.Pi) * math.pow(t, xx + 0.5) * math.exp(-t) * a
    }
}

abstract class DoubleUnaryExpression
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double argument, got ${child.dataType.sql}")
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  protected def helper: String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MathAlgos.$helper($a);")
}

case class GammaFn(child: Expression) extends DoubleUnaryExpression {
  override def prettyName: String = "graft_gamma"
  protected def helper: String = "gamma"
  override def nullSafeEval(a: Any): Any =
    MathAlgos.gamma(a.asInstanceOf[Double])
  override protected def withNewChildInternal(nc: Expression): GammaFn =
    copy(child = nc)
}

case class LgammaFn(child: Expression) extends DoubleUnaryExpression {
  override def prettyName: String = "graft_lgamma"
  protected def helper: String = "lgamma"
  override def nullSafeEval(a: Any): Any =
    MathAlgos.lgamma(a.asInstanceOf[Double])
  override protected def withNewChildInternal(nc: Expression): LgammaFn =
    copy(child = nc)
}

/** IEEE-754 nextafter(x, y) — the next representable double after x in
  * the direction of y (DuckDB surface; Spark has no builtin). Codegen'd
  * straight onto java.lang.Math.nextAfter, NULL-propagating.
  */
case class NextAfter(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "graft_nextafter"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == org.apache.spark.sql.types.DoubleType &&
        right.dataType == org.apache.spark.sql.types.DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two double arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    Math.nextAfter(a.asInstanceOf[Double], b.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = java.lang.Math.nextAfter($a, $b);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NextAfter =
    copy(left = newLeft, right = newRight)
}

object NumericFunctions {
  def gcd(a: Column, b: Column): Column =
    Bridge.column(Gcd(Bridge.expression(a), Bridge.expression(b)))
  def nextafter(a: Column, b: Column): Column =
    Bridge.column(NextAfter(Bridge.expression(a), Bridge.expression(b)))
  def lcm(a: Column, b: Column): Column =
    Bridge.column(Lcm(Bridge.expression(a), Bridge.expression(b)))
  def gamma(a: Column): Column =
    Bridge.column(GammaFn(Bridge.expression(a)))
  def lgamma(a: Column): Column =
    Bridge.column(LgammaFn(Bridge.expression(a)))
}
