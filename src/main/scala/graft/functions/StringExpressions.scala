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

  /** Full Damerau-Levenshtein distance (with the alphabet table, so
    * transpositions compose across edits — DuckDB probed:
    * damerau('CA','ABC') = 2, which the restricted OSA variant gets
    * wrong at 3). O(|a|·|b|) like Spark's own levenshtein.
    */
  def damerau(a: String, b: String): Long = {
    val la = a.length
    val lb = b.length
    if (la == 0) return lb.toLong
    if (lb == 0) return la.toLong
    val inf = la + lb
    val da = new java.util.HashMap[Char, Integer]()
    val d = Array.ofDim[Int](la + 2, lb + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= la) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= lb) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val i1: Int = { val v = da.get(b.charAt(j - 1)); if (v == null) 0 else v }
        val j1 = db
        var cost = 1
        if (a.charAt(i - 1) == b.charAt(j - 1)) { cost = 0; db = j }
        var best = d(i)(j) + cost                       // substitute / match
        if (d(i + 1)(j) + 1 < best) best = d(i + 1)(j) + 1 // insert
        if (d(i)(j + 1) + 1 < best) best = d(i)(j + 1) + 1 // delete
        val tr = d(i1)(j1) + (i - i1 - 1) + 1 + (j - j1 - 1) // transpose
        if (tr < best) best = tr
        d(i + 1)(j + 1) = best
        j += 1
      }
      da.put(a.charAt(i - 1), i)
      i += 1
    }
    d(la + 1)(lb + 1).toLong
  }

  /** Classic Jaro similarity (match window ⌊max/2⌋−1, transposition
    * half-count); identical strings (incl. both empty) read 1.0, one
    * empty side reads 0.0 (DuckDB probed).
    */
  def jaro(a: String, b: String): Double = {
    if (a == b) return 1.0
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val am = new Array[Boolean](la)
    val bm = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(i + window, lb - 1)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bm(j) && a.charAt(i) == b.charAt(j)) {
          am(i) = true; bm(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (am(i)) {
        while (!bm(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    (m.toDouble / la + m.toDouble / lb + (m - t / 2.0) / m) / 3.0
  }

  /** Jaro-Winkler: Jaro boosted by the shared prefix (cap 4, p = 0.1) —
    * unconditionally, like DuckDB (no 0.7 boost threshold; probed
    * 'abcdefgh'/'abcdefgx' → 0.95).
    */
  def jaroWinkler(a: String, b: String): Double = {
    val j = jaro(a, b)
    var l = 0
    val cap = math.min(4, math.min(a.length, b.length))
    while (l < cap && a.charAt(l) == b.charAt(l)) l += 1
    j + l * 0.1 * (1.0 - j)
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

/** Unicode normalizers (DuckDB strip_accents / nfc_normalize): NFD
  * decomposition with combining marks removed, and plain NFC. Characters
  * with no decomposition (ø, ß, …) pass through strip_accents unchanged —
  * matching DuckDB (probed: 'ÀéÎøü ñ' → 'AeIøu n').
  */
object StringNormalize {
  /** Unicode codepoint → string (DuckDB chr; Spark's own char() is
    * mod-256 ASCII, which silently mangles any codepoint > 255).
    */
  def chr(cp: Long): UTF8String =
    UTF8String.fromString(new String(Character.toChars(cp.toInt)))

  def stripAccents(s: String): UTF8String = {
    val d = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < d.length) {
      val c = d.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
  def nfc(s: String): UTF8String = UTF8String.fromString(
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))

  /** md5 digest bytes, LITTLE-endian signed 128-bit, rendered decimal.
    * BigInteger(byte[]) reads big-endian two's complement, so the
    * digest reverses first.
    */
  def md5Number(s: String): UTF8String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    var i = 0
    while (i < 8) {
      val t = d(i); d(i) = d(15 - i); d(15 - i) = t
      i += 1
    }
    UTF8String.fromString(new java.math.BigInteger(d).toString)
  }
}

/** Extended-grapheme-cluster string functions (DuckDB's *_grapheme
  * family). Java's regex `\X` matches extended grapheme clusters
  * (UTS #29 — ZWJ emoji sequences, combining marks, flags), the same
  * segmentation DuckDB's utf8proc applies; verified on ZWJ emoji.
  * Negative counts drop from the opposite end (DuckDB left/right
  * semantics); substring follows the substr window rule (a negative
  * start counts from the end, position 0 consumes window room).
  */
object Graphemes {
  private val X = java.util.regex.Pattern.compile("\\X")

  private def clusters(s: String): java.util.ArrayList[String] = {
    val out = new java.util.ArrayList[String]()
    val m = X.matcher(s)
    while (m.find()) out.add(m.group())
    out
  }

  def count(s: String): Long = {
    val m = X.matcher(s)
    var n = 0L
    while (m.find()) n += 1
    n
  }

  def left(s: String, n0: Long): UTF8String = {
    val cs = clusters(s)
    val n = if (n0 >= 0) math.min(n0, cs.size.toLong).toInt
            else math.max(cs.size + n0, 0L).toInt
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) { sb.append(cs.get(i)); i += 1 }
    UTF8String.fromString(sb.toString)
  }

  def right(s: String, n0: Long): UTF8String = {
    val cs = clusters(s)
    val n = if (n0 >= 0) math.min(n0, cs.size.toLong).toInt
            else math.max(cs.size + n0, 0L).toInt
    val sb = new java.lang.StringBuilder
    var i = cs.size - n
    while (i < cs.size) { sb.append(cs.get(i)); i += 1 }
    UTF8String.fromString(sb.toString)
  }

  def substring(s: String, start0: Long, len: Long): UTF8String = {
    val cs = clusters(s)
    val start = if (start0 < 0) cs.size + start0 + 1 else start0
    val lo = math.max(start, 1L)
    // a NEGATIVE start that underflows the string clamps to position 1
    // but keeps the FULL length (DuckDB probed: ('abcdef',-7,3) = 'abc',
    // ('abcdef',-8,3) = 'abc') — unlike start 0, where the window rule
    // consumes part of the length
    val hi = if (start0 < 0 && start < 1)
      math.min(math.max(len, 0L), cs.size.toLong)
    else math.min(start + math.max(len, 0L) - 1, cs.size.toLong)
    val sb = new java.lang.StringBuilder
    var i = lo
    while (i <= hi) { sb.append(cs.get((i - 1).toInt)); i += 1 }
    UTF8String.fromString(sb.toString)
  }
}

case class LengthGrapheme(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "graft_length_grapheme"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any =
    Graphemes.count(a.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Graphemes.count($a.toString());")
  override protected def withNewChildInternal(nc: Expression): LengthGrapheme =
    copy(child = nc)
}

abstract class GraphemeTakeExpression extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, bigint) arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  override def dataType: DataType = StringType
  protected def helper: String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Graphemes.$helper($a.toString(), $b);")
}

case class LeftGrapheme(left: Expression, right: Expression)
    extends GraphemeTakeExpression {
  override def prettyName: String = "graft_left_grapheme"
  protected def helper: String = "left"
  override def nullSafeEval(a: Any, b: Any): Any =
    Graphemes.left(a.asInstanceOf[UTF8String].toString, b.asInstanceOf[Long])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LeftGrapheme =
    copy(left = newLeft, right = newRight)
}

case class RightGrapheme(left: Expression, right: Expression)
    extends GraphemeTakeExpression {
  override def prettyName: String = "graft_right_grapheme"
  protected def helper: String = "right"
  override def nullSafeEval(a: Any, b: Any): Any =
    Graphemes.right(a.asInstanceOf[UTF8String].toString, b.asInstanceOf[Long])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RightGrapheme =
    copy(left = newLeft, right = newRight)
}

case class SubstringGrapheme(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def prettyName: String = "graft_substring_grapheme"
  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType && second.dataType == LongType &&
        third.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, bigint, bigint) arguments")
  override def dataType: DataType = StringType
  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    Graphemes.substring(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[Long], c.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"${ev.value} = graft.functions.Graphemes.substring($a.toString(), $b, $c);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SubstringGrapheme =
    copy(first = f, second = s, third = t)
}

abstract class StringUnaryExpression
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")
  override def dataType: DataType = StringType
  protected def helper: String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.StringNormalize.$helper($a.toString());")
}

/** DuckDB chr(): any unicode codepoint, not Spark's mod-256 char(). */
case class ChrCodepoint(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def prettyName: String = "graft_chr"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an integer argument, got ${t.sql}")
    }
  override def nullSafeEval(a: Any): Any = a match {
    case l: Long => StringNormalize.chr(l)
    case i: Int  => StringNormalize.chr(i.toLong)
    case s: Short => StringNormalize.chr(s.toLong)
    case b: Byte => StringNormalize.chr(b.toLong)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.StringNormalize.chr((long) $a);")
  override protected def withNewChildInternal(nc: Expression): ChrCodepoint =
    copy(child = nc)
}

case class StripAccents(child: Expression) extends StringUnaryExpression {
  override def prettyName: String = "graft_strip_accents"
  protected def helper: String = "stripAccents"
  override def nullSafeEval(a: Any): Any =
    StringNormalize.stripAccents(a.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(nc: Expression): StripAccents =
    copy(child = nc)
}

case class NfcNormalize(child: Expression) extends StringUnaryExpression {
  override def prettyName: String = "graft_nfc_normalize"
  protected def helper: String = "nfc"
  override def nullSafeEval(a: Any): Any =
    StringNormalize.nfc(a.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(nc: Expression): NfcNormalize =
    copy(child = nc)
}

/** DuckDB md5_number(s): the 16 digest bytes read LITTLE-endian as a
  * SIGNED 128-bit integer (probed: md5_number('x') is negative).
  * HUGEINT has no Spark carrier — DECIMAL(38,0) cannot hold 2^128 — so
  * the value renders as its full decimal TEXT via BigInteger; users
  * needing arithmetic have md5_number_lower/upper (DECIMAL(20,0)).
  */
case class Md5Number(child: Expression) extends StringUnaryExpression {
  override def prettyName: String = "graft_md5_number"
  protected def helper: String = "md5Number"
  override def nullSafeEval(a: Any): Any =
    StringNormalize.md5Number(a.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(nc: Expression): Md5Number =
    copy(child = nc)
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

case class DamerauLevenshtein(left: Expression, right: Expression)
    extends StringPairExpression {
  override def prettyName: String = "graft_damerau"
  override def dataType: DataType = LongType
  protected def helper: String = "damerau"
  override def nullSafeEval(a: Any, b: Any): Any =
    StringSimilarity.damerau(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

case class JaroSim(left: Expression, right: Expression)
    extends StringPairExpression {
  override def prettyName: String = "graft_jaro"
  override def dataType: DataType = DoubleType
  protected def helper: String = "jaro"
  override def nullSafeEval(a: Any, b: Any): Any =
    StringSimilarity.jaro(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroSim =
    copy(left = newLeft, right = newRight)
}

case class JaroWinklerSim(left: Expression, right: Expression)
    extends StringPairExpression {
  override def prettyName: String = "graft_jaro_winkler"
  override def dataType: DataType = DoubleType
  protected def helper: String = "jaroWinkler"
  override def nullSafeEval(a: Any, b: Any): Any =
    StringSimilarity.jaroWinkler(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
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
  def damerau(a: Column, b: Column): Column =
    Bridge.column(DamerauLevenshtein(Bridge.expression(a), Bridge.expression(b)))
  def jaro(a: Column, b: Column): Column =
    Bridge.column(JaroSim(Bridge.expression(a), Bridge.expression(b)))
  def jaroWinkler(a: Column, b: Column): Column =
    Bridge.column(JaroWinklerSim(Bridge.expression(a), Bridge.expression(b)))
  def stripAccents(a: Column): Column =
    Bridge.column(StripAccents(Bridge.expression(a)))
  def chrCodepoint(a: Column): Column =
    Bridge.column(ChrCodepoint(Bridge.expression(a)))
  def nfcNormalize(a: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(a)))
  def md5Number(a: Column): Column =
    Bridge.column(Md5Number(Bridge.expression(a)))
  def regexpReplaceDuck(s: Column, p: Column, r: Column,
      global: Boolean): Column =
    Bridge.column(RegexpReplaceDuck(Bridge.expression(s),
      Bridge.expression(p), Bridge.expression(r), global))
  def lengthGrapheme(a: Column): Column =
    Bridge.column(LengthGrapheme(Bridge.expression(a)))
  def leftGrapheme(a: Column, n: Column): Column =
    Bridge.column(LeftGrapheme(Bridge.expression(a), Bridge.expression(n)))
  def rightGrapheme(a: Column, n: Column): Column =
    Bridge.column(RightGrapheme(Bridge.expression(a), Bridge.expression(n)))
  def substringGrapheme(a: Column, s: Column, l: Column): Column =
    Bridge.column(SubstringGrapheme(Bridge.expression(a),
      Bridge.expression(s), Bridge.expression(l)))
}
