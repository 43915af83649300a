package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Postgres/DuckDB `age(a, b)` field algebra as ONE compact native
  * expression returning struct<months, days, micros, neg>.
  *
  * The previous Column-DSL lowering re-inlined the borrow-chain algebra
  * at every reference (each of `us`/`d`/`m` is used several times per
  * call, and q_dialect_age makes six calls), which blew the Catalyst
  * tree into seconds of driver-side analysis/codegen per query — the #1
  * line of the round-11 bench. One small struct-valued node per (a, b)
  * pair keeps the tree constant-size; whole-stage codegen's
  * subexpression elimination then evaluates identical pairs once per
  * row. Semantics replicate Postgres' timestamp_age borrowing (time
  * borrows a day, days borrow the EARLIER side's month length — a Feb
  * borrow can leave a residue and Postgres re-adds the SAME month
  * length, replicated here), probed against DuckDB.
  */
object AgeParts {
  private final val DayUs = 86400000000L

  /** Sessions pin UTC, so epoch-micro day boundaries are multiples of
    * DayUs and calendar fields read through java.time at UTC.
    */
  def compute(aUs: Long, bUs: Long): InternalRow = {
    val neg = aUs < bUs
    val hiUs = if (neg) bUs else aUs
    val loUs = if (neg) aUs else bUs
    val hi = java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(hiUs, 1000000L),
      (Math.floorMod(hiUs, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
    val lo = java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(loUs, 1000000L),
      (Math.floorMod(loUs, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
    val todDiff = Math.floorMod(hiUs, DayUs) - Math.floorMod(loUs, DayUs)
    val borrowT = todDiff < 0
    val us = if (borrowT) todDiff + DayUs else todDiff
    val mday0 = hi.getDayOfMonth - lo.getDayOfMonth - (if (borrowT) 1 else 0)
    val dim = lo.toLocalDate.lengthOfMonth
    val borrow1 = mday0 < 0
    val mday1 = if (borrow1) mday0 + dim else mday0
    val borrow2 = mday1 < 0
    val d = if (borrow2) mday1 + dim else mday1
    val mon0 = hi.getMonthValue - lo.getMonthValue -
      (if (borrow1) 1 else 0) - (if (borrow2) 1 else 0)
    val borrowY = mon0 < 0
    val monF = if (borrowY) mon0 + 12 else mon0
    val yrF = hi.getYear - lo.getYear - (if (borrowY) 1 else 0)
    val m = yrF.toLong * 12L + monF
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](m, d.toLong, us, neg))
  }

  val schema: StructType = StructType(Seq(
    StructField("months", LongType, nullable = false),
    StructField("days", LongType, nullable = false),
    StructField("micros", LongType, nullable = false),
    StructField("neg", BooleanType, nullable = false)))
}

case class AgeParts(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "graft_age_parts"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == TimestampType && right.dataType == TimestampType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two timestamp arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  override def dataType: DataType = AgeParts.schema

  override def nullSafeEval(a: Any, b: Any): Any =
    AgeParts.compute(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.AgeParts.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AgeParts =
    copy(left = newLeft, right = newRight)
}
