package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{StringTrim, StringTrimLeft, StringTrimRight}
import org.apache.spark.sql.graftbridge.Bridge

/** TRIM([BOTH|LEADING|TRAILING] chars FROM x) with a NON-literal chars
  * argument. The `org.apache.spark.sql.functions` trim/ltrim/rtrim
  * overloads only accept a literal `String` trim set, but the underlying
  * Catalyst StringTrim* expressions take any expression — build them
  * directly through the bridge (still whole-stage-codegen'd; the trim
  * set is evaluated per row).
  */
object TrimExprs {
  def trimCol(src: Column, chars: Column, mode: String): Column = {
    val s = Bridge.expression(src)
    val c = Some(Bridge.expression(chars))
    Bridge.column(mode match {
      case "leading"  => StringTrimLeft(s, c)
      case "trailing" => StringTrimRight(s, c)
      case _          => StringTrim(s, c)
    })
  }
}
