package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. `ExpressionUtils` is private[sql] in Spark 4,
  * so custom native Expressions (graft.functions.DotProduct) get their
  * Column wrapper through this package-located shim — the standard pattern
  * for Spark extension libraries that ship Catalyst expressions.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Rebuild a checkpointed DataFrame's LogicalRDD leaf WITHOUT the origin
    * plan's estimated statistics (keeping the materialized RDD,
    * partitioning and ordering — zero recompute, zero row conversion).
    *
    * Why: `Dataset.(local)checkpoint` copies the origin plan's ESTIMATED
    * stats into the new leaf, and Catalyst's size-only join estimate is
    * the PRODUCT of child sizes — so a fixpoint loop (connected
    * components, recursive CTEs) compounds sizeInBytes multiplicatively
    * per round. The estimate is a BigInt: its digit count grows
    * geometrically, and by round ~9 the OPTIMIZER itself is the
    * bottleneck (measured: 77 s inside BigInteger.multiply on a
    * 1,100-row label frame). Dropping originStats resets each round's
    * leaf to the unknown-size default, which keeps every round's
    * estimation constant-cost. Estimates only ever OVER-estimated here
    * (products of sizes), so the replacement default changes no join
    * strategy the compounded stats would have allowed.
    */
  def dropOriginStats(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    ds.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        org.apache.spark.sql.classic.Dataset.ofRows(ds.sparkSession,
          new org.apache.spark.sql.execution.LogicalRDD(
            l.output, l.rdd, l.outputPartitioning, l.outputOrdering,
            l.isStreaming, l.stream)(ds.sparkSession, None, None))
      case _ => df
    }
  }
}
