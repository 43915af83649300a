package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** String-similarity helpers shared by interpreted eval and the codegen
  * path (whole-stage codegen emits a static call — the loop itself stays
  * out of the generated source but the call is fused into the stage like
  * Spark's own levenshtein).
  */
object StringSimilarity {
  /** Count of differing character positions; equal lengths required
    * (DuckDB's hamming errors the same way).
    */
  def hamming(a: String, b: String): Long = {
    if (a.length != b.length)
      throw new IllegalArgumentException(
        s"hamming requires equal-length strings (got ${a.length} and ${b.length})")
    var d = 0L
    var i = 0
    while (i < a.length) { if (a.charAt(i) != b.charAt(i)) d += 1; i += 1 }
    d
  }

  /** Jaccard similarity of the two strings' character SETS (DuckDB's
    * jaccard); two empty strings read 1.0 (identical empty sets).
    */
  def jaccard(a: String, b: String): Double = {
    val sa = new java.util.HashSet[Char]()
    val sb = new java.util.HashSet[Char]()
    var i = 0
    while (i < a.length) { sa.add(a.charAt(i)); i += 1 }
    i = 0
    while (i < b.length) { sb.add(b.charAt(i)); i += 1 }
    if (sa.isEmpty && sb.isEmpty) return 1.0
    var inter = 0
    val it = sa.iterator()
    while (it.hasNext) { if (sb.contains(it.next())) inter += 1 }
    inter.toDouble / (sa.size + sb.size - inter).toDouble
  }
}

abstract class StringPairExpression extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  protected def helper: String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StringSimilarity.$helper(" +
        s"$a.toString(), $b.toString());")
}

case class Hamming(left: Expression, right: Expression)
    extends StringPairExpression {
  override def prettyName: String = "graft_hamming"
  override def dataType: DataType = LongType
  protected def helper: String = "hamming"
  override def nullSafeEval(a: Any, b: Any): Any =
    StringSimilarity.hamming(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Hamming =
    copy(left = newLeft, right = newRight)
}

case class JaccardSim(left: Expression, right: Expression)
    extends StringPairExpression {
  override def prettyName: String = "graft_jaccard"
  override def dataType: DataType = DoubleType
  protected def helper: String = "jaccard"
  override def nullSafeEval(a: Any, b: Any): Any =
    StringSimilarity.jaccard(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSim =
    copy(left = newLeft, right = newRight)
}

object StringFunctions {
  def hamming(a: Column, b: Column): Column =
    Bridge.column(Hamming(Bridge.expression(a), Bridge.expression(b)))
  def jaccard(a: Column, b: Column): Column =
    Bridge.column(JaccardSim(Bridge.expression(a), Bridge.expression(b)))
}
