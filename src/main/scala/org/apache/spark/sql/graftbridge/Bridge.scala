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

  /** Cap a checkpointed DataFrame's inherited size/rowCount estimates at
    * Long.MaxValue — the identity for every sane estimate, a bound for the
    * multiplicative garbage above. Join estimates are PRODUCTS of child
    * sizes, so an iterative fixpoint whose leaves inherit origin stats
    * (see dropOriginStats) compounds the BigInt geometrically; capping at
    * the leaf keeps every round's estimation constant-cost while real,
    * small statistics (and the broadcast decisions they enable) pass
    * through untouched. Constraints are preserved.
    */
  def capStats(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    ds.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        val cap = BigInt(Long.MaxValue)
        val s = l.computeStats()
        if (s.sizeInBytes <= cap && s.rowCount.forall(_ <= cap)) df
        else {
          val capped = org.apache.spark.sql.catalyst.plans.logical.Statistics(
            sizeInBytes = s.sizeInBytes.min(cap),
            rowCount = s.rowCount.map(_.min(cap)),
            attributeStats = s.attributeStats,
            isRuntime = s.isRuntime)
          org.apache.spark.sql.classic.Dataset.ofRows(ds.sparkSession,
            new org.apache.spark.sql.execution.LogicalRDD(
              l.output, l.rdd, l.outputPartitioning, l.outputOrdering,
              l.isStreaming, l.stream)(
              ds.sparkSession, Some(capped), Some(l.constraints)))
        }
      case _ => df
    }
  }
}
