package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{JsonNodeType, ObjectNode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JSON document algebra the variant route can't express (DuckDB's
  * json_merge_patch / json_structure / json_contains): tree walks over
  * Jackson nodes (already on Spark's classpath). Eval-only expressions
  * (CodegenFallback) — these are schema-exploration helpers, not
  * hot-path scan predicates.
  *
  * All semantics probed on DuckDB 1.0:
  * - merge_patch is RFC 7386 (recursive; null patch keys delete; a
  *   non-object patch replaces wholesale; doubles re-serialize
  *   canonically, 1.50 → 1.5).
  * - structure maps scalars onto DuckDB's class names (non-negative
  *   integers UBIGINT, negative BIGINT, other numerics DOUBLE) and
  *   unifies array elements — numeric ranks widen, NULL unifies with
  *   anything, incompatible reads "JSON"; [] reads ["NULL"].
  * - contains(hay, needle) is true when the needle structurally
  *   matches ANY node of the haystack tree: objects need a key-subset
  *   with matching values, array needles match order-free with
  *   per-element containment, scalars compare strictly (1.0 ≠ 1).
  */
object JsonAlgebra {
  private val mapper = new ObjectMapper()

  private def parse(s: String): JsonNode = mapper.readTree(s)

  def mergePatch(target: String, patch: String): UTF8String = {
    val p = parse(patch)
    val t = parse(target)
    UTF8String.fromString(mapper.writeValueAsString(applyPatch(t, p)))
  }

  private def applyPatch(target: JsonNode, patch: JsonNode): JsonNode =
    if (!patch.isObject) patch
    else {
      val base: ObjectNode =
        if (target != null && target.isObject)
          target.asInstanceOf[ObjectNode]
        else mapper.createObjectNode()
      val it = patch.fields()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue.isNull) base.remove(e.getKey)
        else base.set[JsonNode](e.getKey,
          applyPatch(base.get(e.getKey), e.getValue))
      }
      base
    }

  def structure(doc: String): UTF8String =
    UTF8String.fromString(mapper.writeValueAsString(structOf(parse(doc))))

  /** DuckDB's scalar class names, as string nodes. */
  private def scalarName(n: JsonNode): String = n.getNodeType match {
    case JsonNodeType.NULL    => "NULL"
    case JsonNodeType.BOOLEAN => "BOOLEAN"
    case JsonNodeType.STRING  => "VARCHAR"
    case JsonNodeType.NUMBER  =>
      if (!n.isIntegralNumber) "DOUBLE"
      else if (n.asText().startsWith("-")) "BIGINT"
      else "UBIGINT"
    case other => other.toString
  }

  private def structOf(n: JsonNode): JsonNode = n.getNodeType match {
    case JsonNodeType.OBJECT =>
      val out = mapper.createObjectNode()
      val it = n.fields()
      while (it.hasNext) {
        val e = it.next()
        out.set[JsonNode](e.getKey, structOf(e.getValue))
      }
      out
    case JsonNodeType.ARRAY =>
      val arr = mapper.createArrayNode()
      var acc: JsonNode = null
      val it = n.elements()
      while (it.hasNext) {
        val s = structOf(it.next())
        acc = if (acc == null) s else unify(acc, s)
      }
      arr.add(if (acc == null) mapper.getNodeFactory.textNode("NULL") else acc)
      arr
    case _ => mapper.getNodeFactory.textNode(scalarName(n))
  }

  private val numericRank = Map("UBIGINT" -> 0, "BIGINT" -> 1, "DOUBLE" -> 2)
  private def jsonText = mapper.getNodeFactory.textNode("JSON")

  private def unify(a: JsonNode, b: JsonNode): JsonNode =
    if (a == b) a
    else if (a.isTextual && a.asText() == "NULL") b
    else if (b.isTextual && b.asText() == "NULL") a
    else if (a.isTextual && b.isTextual &&
        numericRank.contains(a.asText()) && numericRank.contains(b.asText()))
      mapper.getNodeFactory.textNode(
        if (numericRank(a.asText()) >= numericRank(b.asText())) a.asText()
        else b.asText())
    else if (a.isObject && b.isObject) {
      val out = mapper.createObjectNode()
      val it = a.fields()
      while (it.hasNext) {
        val e = it.next()
        out.set[JsonNode](e.getKey,
          if (b.has(e.getKey)) unify(e.getValue, b.get(e.getKey))
          else e.getValue)
      }
      val it2 = b.fields()
      while (it2.hasNext) {
        val e = it2.next()
        if (!out.has(e.getKey)) out.set[JsonNode](e.getKey, e.getValue)
      }
      out
    }
    else if (a.isArray && b.isArray) {
      val arr = mapper.createArrayNode()
      arr.add(unify(a.get(0), b.get(0)))
      arr
    }
    else jsonText

  def contains(hay: String, needle: String): Boolean =
    anyNode(parse(hay), parse(needle))

  /** True when the needle matches the node itself OR any descendant. */
  private def anyNode(h: JsonNode, n: JsonNode): Boolean =
    matches(h, n) || {
      val it = h.elements() // object values AND array elements
      var found = false
      while (!found && it.hasNext) found = anyNode(it.next(), n)
      found
    }

  /** Structural containment at ONE node (MySQL-style). */
  private def matches(h: JsonNode, n: JsonNode): Boolean =
    if (n.isObject)
      h.isObject && {
        val it = n.fields()
        var ok = true
        while (ok && it.hasNext) {
          val e = it.next()
          ok = h.has(e.getKey) && matches(h.get(e.getKey), e.getValue)
        }
        ok
      }
    else if (n.isArray) {
      h.isArray && {
        val it = n.elements()
        var ok = true
        while (ok && it.hasNext) {
          val ne = it.next()
          val hit = h.elements()
          var found = false
          while (!found && hit.hasNext) {
            val he = hit.next()
            found = matches(he, ne) ||
              (he.isArray && { // a nested hay array can still hold it
                val inner = he.elements()
                var f2 = false
                while (!f2 && inner.hasNext) f2 = matches(inner.next(), ne)
                f2
              })
          }
          ok = found
        }
        ok
      }
    }
    else if (h.isArray) { // array haystack contains a scalar needle
      val it = h.elements()
      var found = false
      while (!found && it.hasNext) found = matches(it.next(), n)
      found
    }
    else h == n // scalars: strict (type-sensitive) equality
}

case class JsonMergePatch(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "graft_json_merge_patch"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two JSON strings")
  override def dataType: DataType = StringType
  override def nullSafeEval(a: Any, b: Any): Any =
    JsonAlgebra.mergePatch(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JsonMergePatch =
    copy(left = newLeft, right = newRight)
}

case class JsonStructure(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "graft_json_structure"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a JSON string")
  override def dataType: DataType = StringType
  override def nullSafeEval(a: Any): Any =
    JsonAlgebra.structure(a.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(nc: Expression): JsonStructure =
    copy(child = nc)
}

case class JsonContains(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "graft_json_contains"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two JSON strings")
  override def dataType: DataType = BooleanType
  override def nullSafeEval(a: Any, b: Any): Any =
    JsonAlgebra.contains(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JsonContains =
    copy(left = newLeft, right = newRight)
}

object JsonFunctions {
  def mergePatch(a: Column, b: Column): Column =
    Bridge.column(JsonMergePatch(Bridge.expression(a), Bridge.expression(b)))
  def structure(a: Column): Column =
    Bridge.column(JsonStructure(Bridge.expression(a)))
  def jsonContains(a: Column, b: Column): Column =
    Bridge.column(JsonContains(Bridge.expression(a), Bridge.expression(b)))
}
