package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single right row with the greatest
  * right-time ≤ left-time within the same key group (time-series
  * point-in-time lookup; the canonical "operator Spark lacks").
  *
  * Implementation is the custom-operator preference (a) from the builder
  * prompt — composition of built-ins: tag both sides, union, and take a
  * per-key running `last(payload ignoring nulls)` over (time, side) order.
  * That is ONE shuffle + sort over |L|+|R| rows — no range cross-join, no
  * per-row probe — so it scales exactly like a sort-merge join at 100 TB.
  * Ties at equal time resolve to the right row (inclusive ≤), matching
  * DuckDB's ASOF semantics, which oracles q_asof_join.
  */
object AsOf {

  /** @param left      left (probe) side
    * @param right     right (reference) side
    * @param by        equality key column name (both sides)
    * @param leftTime  left event-time column name
    * @param rightTime right event-time column name
    * @param payload   right-side columns to surface (nulls when no match)
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      by: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String]): DataFrame = {

    val leftCols = left.columns.toSeq
    val payloadStruct = struct(payload.map(right(_)): _*)

    val taggedLeft = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val taggedRight = right
      .select(col(by), col(rightTime).as("__t"), lit(0).as("__side"),
        payloadStruct.as("__p"))

    // unionByName fills __p with null on the left side and the left's
    // columns with null on the right side
    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)

    // per-key running last right-payload; right rows sort before left rows
    // at equal time (inclusive ≤)
    val w = Window.partitionBy(by).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val out = leftCols.map(col) ++
      payload.map(p => col(s"__match.$p").as(p))
    matched.select(out: _*)
  }
}
