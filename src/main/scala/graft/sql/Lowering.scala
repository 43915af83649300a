package graft.sql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Analyzer._

/** Lowers a bound query to a declarative DataFrame program. This is the
  * whole "planner + optimizer + execution engine" of the reference
  * (planner/bottomup.rs, optimizer/optimizer.rs, volcano_style.rs) —
  * collapsed into plan construction, because Catalyst supplies predicate
  * pushdown, column pruning, join detection/reordering and physical
  * operator selection (SURVEY.md §4.1).
  *
  * Join strategy: tables are combined with crossJoin and the full WHERE
  * applied on top. Catalyst's PushPredicateThroughJoin + ReorderJoin turn
  * Filter(CrossJoin(...)) into equi hash joins with pushed single-table
  * selections — exactly the rewrite the reference does by hand in
  * planner/bottomup.rs:74-99 + DPccp. The lowering stays declarative; the
  * optimizer owns the plan shape (verified in DialectSpec by asserting no
  * CartesianProduct survives in the physical plan).
  */
object Lowering {

  /** NULL comparison semantics: standard SQL 3VL, NOT the reference's
    * `NULL = NULL → TRUE` quirk (reference volcano_style.rs:76-84;
    * divergence documented in SURVEY.md §1.4).
    */
  def lowerSelect(spark: SparkSession, q: BoundSelect,
      source: BoundTable => DataFrame): DataFrame = {
    val base = q.tables.map(bt => source(bt).alias(bt.binding))
    val joined = base.reduceLeft(_.crossJoin(_))
    val filtered = q.predicate.fold(joined)(p => joined.filter(lowerExpr(p)))
    // Output naming: bare attribute name when unique across the projection,
    // binding_attr otherwise (the reference prints qualified headers,
    // bottomup.rs:34-44; parquet column names cannot contain '.').
    val counts = q.projection.groupBy(_.attr.name.toLowerCase).view.mapValues(_.size)
    val cols = q.projection.map { bc =>
      val out =
        if (counts(bc.attr.name.toLowerCase) > 1) s"${bc.binding}_${bc.attr.name}"
        else bc.attr.name
      col(s"${bc.binding}.${bc.attr.name}").as(out)
    }
    filtered.select(cols: _*)
  }

  def lowerExpr(e: BoundExpr): Column = e match {
    case BoundExpr.BAnd(l, r) => lowerExpr(l) && lowerExpr(r)
    case BoundExpr.BOr(l, r)  => lowerExpr(l) || lowerExpr(r)
    case BoundExpr.BCmp(op, l, r) =>
      val (lc, rc) = (lowerOperand(l), lowerOperand(r))
      op match {
        case Ast.CmpOp.Eq  => lc === rc
        case Ast.CmpOp.Neq => lc =!= rc
        case Ast.CmpOp.Lt  => lc < rc
        case Ast.CmpOp.Gt  => lc > rc
        case Ast.CmpOp.Le  => lc <= rc
        case Ast.CmpOp.Ge  => lc >= rc
      }
  }

  private def lowerOperand(o: BoundOperand): Column = o match {
    case BoundOperand.BCol(c) => col(s"${c.binding}.${c.attr.name}")
    case BoundOperand.BLit(Lit.LitLong(v))   => lit(v)
    case BoundOperand.BLit(Lit.LitString(s)) => lit(s)
    case BoundOperand.BLit(Lit.LitNull)      => lit(null)
  }
}
