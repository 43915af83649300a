package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
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

/** DuckDB-semantics regexp_replace runtime: first-match-only by default
  * ('g' makes it global), replacement backrefs written `\1`..`\9` (RE2
  * style) with `$` literal — translated here onto Java's Matcher syntax.
  * Patterns and translated replacements are cached (the distinct set in
  * any workload is the small set of query literals; a size guard keeps a
  * pathological dynamic-pattern workload from growing unboundedly).
  */
object RegexpDuck {
  private val patterns =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()
  private val reps =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def compiled(p: String): java.util.regex.Pattern = {
    if (patterns.size > 1024) patterns.clear()
    patterns.computeIfAbsent(p, s => java.util.regex.Pattern.compile(s))
  }

  /** DuckDB/RE2 rewrite string → Java Matcher replacement: `\1`..`\9`
    * become `$1`..`$9`, `\\` a literal backslash, `$` is literal (Java
    * treats it as a group ref, so it escapes); any other lone backslash
    * stays a literal backslash.
    */
  private def javaRep(r: String): String = {
    if (reps.size > 1024) reps.clear()
    reps.computeIfAbsent(r, { s =>
      val sb = new java.lang.StringBuilder(s.length + 8)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length && s.charAt(i + 1).isDigit) {
          sb.append('$').append(s.charAt(i + 1)); i += 2
        } else if (c == '\\' && i + 1 < s.length && s.charAt(i + 1) == '\\') {
          sb.append("\\\\"); i += 2
        } else if (c == '\\') { sb.append("\\\\"); i += 1 }
        else if (c == '$') { sb.append("\\$"); i += 1 }
        else { sb.append(c); i += 1 }
      }
      sb.toString
    })
  }

  def replace(s: UTF8String, p: UTF8String, r: UTF8String,
      global: Boolean): UTF8String = {
    val m = compiled(p.toString).matcher(s.toString)
    val rep = javaRep(r.toString)
    UTF8String.fromString(if (global) m.replaceAll(rep) else m.replaceFirst(rep))
  }
}

/** regexp_replace with DuckDB semantics (reference-dialect parity; see
  * RegexpDuck). Codegen'd like Hamming — the static call fuses into the
  * whole-stage loop.
  */
case class RegexpReplaceDuck(first: Expression, second: Expression,
    third: Expression, global: Boolean) extends TernaryExpression {
  override def prettyName: String =
    if (global) "graft_regexp_replace_g" else "graft_regexp_replace"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == StringType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires three string arguments")
  override def nullSafeEval(s: Any, p: Any, r: Any): Any =
    RegexpDuck.replace(s.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String],
      r.asInstanceOf[UTF8String], global)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, p, r) =>
      s"${ev.value} = graft.functions.RegexpDuck.replace($s, $p, $r, $global);")
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): RegexpReplaceDuck =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object StringFunctions {
  def hamming(a: Column, b: Column): Column =
    Bridge.column(Hamming(Bridge.expression(a), Bridge.expression(b)))
  def jaccard(a: Column, b: Column): Column =
    Bridge.column(JaccardSim(Bridge.expression(a), Bridge.expression(b)))
  def regexpReplaceDuck(s: Column, p: Column, r: Column,
      global: Boolean): Column =
    Bridge.column(RegexpReplaceDuck(Bridge.expression(s),
      Bridge.expression(p), Bridge.expression(r), global))
}
