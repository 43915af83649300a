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
  * Join strategy: when GraftDatabase supplies a stats-chosen join order
  * (JoinOrder — DPccp parity with the reference's optimizer), the tree is
  * built explicitly with equi-join conditions attached per join, and
  * Catalyst preserves that order while still pushing the residual
  * selections down. Without a plan (single table / oversized FROM list),
  * tables combine as crossJoin + full WHERE on top and Catalyst's
  * PushPredicateThroughJoin + ReorderJoin recover the hash joins —
  * exactly the rewrite the reference does by hand in
  * planner/bottomup.rs:74-99 + DPccp. Either way no CartesianProduct
  * survives in the physical plan (asserted in DialectSpec).
  */
object Lowering {

  /** NULL comparison semantics: standard SQL 3VL, NOT the reference's
    * `NULL = NULL → TRUE` quirk (reference volcano_style.rs:76-84;
    * divergence documented in SURVEY.md §1.4).
    */
  def lowerSelect(spark: SparkSession, q: BoundSelect,
      source: BoundTable => DataFrame,
      broadcastBindings: Set[String] = Set.empty,
      joinPlan: Option[JoinOrder.Tree] = None): DataFrame = {
    val filtered0 = combine(spark, q, source, broadcastBindings, joinPlan)

    // Output naming: the user's AS alias wins; otherwise bare attribute
    // name when unique across the projection, binding_attr when duplicated
    // (the reference prints qualified headers, bottomup.rs:34-44; parquet
    // column names cannot contain '.').
    val colItems = q.projection.collect { case BoundItem.BICol(c, None) => c }
    val counts = colItems.groupBy(_.attr.name.toLowerCase).view.mapValues(_.size)
    def outName(bc: BoundCol, alias: Option[String] = None): String = alias.getOrElse {
      if (counts.getOrElse(bc.attr.name.toLowerCase, 0) > 1) s"${bc.binding}_${bc.attr.name}"
      else bc.attr.name
    }
    def qcol(bc: BoundCol): Column = col(s"${bc.binding}.${bc.attr.name}")

    if (!q.isAggregate) {
      val namedCols = q.projection.collect { case BoundItem.BICol(bc, a) => (bc, a) }
      // scalar subquery items attach their value to the relational core
      // BEFORE projection: uncorrelated = one-row broadcast left join on
      // TRUE (an empty subquery yields SQL NULL, never zero rows);
      // correlated = the decorrelated per-key aggregate left-joined on
      // its keys, with the COUNT-over-empty-set coalesce
      val subScalars: Map[Int, Column] = Map.empty
      val (base0m, scalarCol) = q.projection.zipWithIndex.foldLeft(
          (filtered0, subScalars)) {
        case ((df, m), (BoundItem.BISub(sub, _, _, pairs, Some(iq)), i)) =>
          // inequality-correlated scalar aggregate → union-merge running
          // window (one sort shuffle, no candidate fan-out)
          val (joined, c) = correlatedRunningAgg(spark, df, sub, pairs, iq,
            source, s"__ps_$i", qcol)
          (joined, m + (i -> c))
        case ((df, m), (BoundItem.BISub(sub, _, guard, pairs, None), i)) =>
          val name = s"__ps_$i"
          if (pairs.isEmpty) {
            val subDf0 = lowerSelect(spark, sub, source)
            if (guard)
              // one-row contract checked AND value captured in one bounded
              // job — no join, no re-execution in the main plan
              (df, m + (i -> guardedScalarLit(subDf0)))
            else
              (df.join(broadcast(subDf0.toDF(name)), lit(true), "left_outer"),
                m + (i -> col(name)))
          } else {
            val (subAgg, keyCond, scalar) =
              correlatedScalarAgg(spark, sub, pairs, source, name, s"__ps${i}_c")
            (df.join(subAgg, keyCond(qcol), "left_outer"), m + (i -> scalar))
          }
        case ((df, m), _) => (df, m)
      }
      // CASE conditions inside computed projections may carry subqueries
      // (EXISTS / IN / scalar comparisons): their marker frames join the
      // core BEFORE projection and the final select projects them away
      val projMs: Option[MarkerScope] =
        if (!q.projection.exists {
          case BoundItem.BIExpr(op, _) => BoundOperand.operandHasSub(op)
          case _ => false
        }) None
        else {
          val ms = new MarkerScope(spark, source, "p", qcol, lowerOperandWith(_, qcol))
          q.projection.foreach {
            case BoundItem.BIExpr(op, _) => ms.registerOp(op)
            case _ => ()
          }
          Some(ms)
        }
      val base1 = projMs.fold(base0m)(_.joins.foldLeft(base0m) {
        case (d, (f, on)) => d.join(f, on, "left_outer") })
      // QUALIFY: attach every window column (SELECT-list items AND the
      // hidden inline-OVER items) at its alias, filter, and let the final
      // projection read the precomputed columns (and drop hidden ones).
      // Windows evaluate over the post-WHERE row set — SQL clause order.
      // DISTINCT ON ordered by a window alias (DISTINCT ON (k) … ORDER BY
      // k, rn): the window must compute BEFORE the first-row filter, so
      // it rides the same pre-attach as QUALIFY
      val donNeedsWins = q.distinctOn.nonEmpty && q.orderBy.exists {
        case (BoundOrderKey.OKOutput(n), _) => q.projection.exists {
          case BoundItem.BIWin(_, _, _, _, a, _) => a.equalsIgnoreCase(n)
          case _                                 => false
        }
        case _ => false
      }
      // GROUPS frames need their dense_rank pre-attached — force the
      // pre-attach path (projection-time Columns can't reference it)
      val hasGroupsFrames = q.projection.exists {
        case BoundItem.BIWin(_, _, _, _, _, fr) => fr.exists(_.groups)
        case _                                  => false
      }
      // DISTINCT window aggregates over prefix frames need their
      // first-occurrence mask pre-attached too (same reason as GROUPS)
      val hasDistinctRunning = q.projection.exists {
        case BoundItem.BIWin(f, args, _, _, _, fr) =>
          distinctWinEligible(f, args, fr)
        case _ => false
      }
      // unpartitioned unordered aggregate windows take the broadcast
      // rewrite in the pre-attach path (outputCols-time Columns can't
      // inject the join)
      val hasGlobalAggWin = (q.projection ++ q.qualifyWins).exists {
        case BoundItem.BIWin(f, args, parts, ord, _, frame) =>
          isGlobalAggWin(f, args, parts, ord, frame)
        case _ => false
      }
      // unpartitioned ORDERED windows pre-attach as distributed prefix
      // scans (the outputCols-time Column API can't rewrite the frame)
      val hasGlobalOrdWin = (q.projection ++ q.qualifyWins).exists {
        case BoundItem.BIWin(f, args, parts, ord, _, frame) =>
          isGlobalOrderedWin(f, args, parts, ord, frame) ||
            isGlobalDistinctWin(f, args, parts, ord, frame) ||
            isGlobalShiftWin(f, args, parts, ord) ||
            isGlobalBoundedRowsWin(f, args, parts, ord, frame) ||
            isGlobalIgnoreNullsShiftWin(f, args, parts, ord) ||
            isGlobalWholeExWin(f, args, parts, ord, frame) ||
            isGlobalBigShiftWin(f, args, parts, ord) ||
            isGlobalDistinctAheadWin(f, args, parts, ord, frame) ||
            isGlobalBigInShiftWin(f, args, parts, ord)
        case _ => false
      }
      val winsPre = q.qualify.isDefined || donNeedsWins ||
        hasGroupsFrames || hasDistinctRunning || q.qualifyWins.nonEmpty ||
        hasGlobalAggWin || hasGlobalOrdWin
      val baseQ =
        if (!winsPre) base1
        else {
          val winItems = (q.projection ++ q.qualifyWins).collect {
            case w: BoundItem.BIWin => w
          }
          val (globalWins, rest0) = winItems.partition {
            case BoundItem.BIWin(f, args, parts, ord, _, frame) =>
              isGlobalAggWin(f, args, parts, ord, frame)
            case _ => false
          }
          val (gowWins, rest1) = rest0.partition {
            case BoundItem.BIWin(f, args, parts, ord, _, frame) =>
              isGlobalOrderedWin(f, args, parts, ord, frame) ||
                isGlobalDistinctWin(f, args, parts, ord, frame)
            case _ => false
          }
          val (shiftWins, rest2) = rest1.partition {
            case BoundItem.BIWin(f, args, parts, ord, _, frame) =>
              isGlobalShiftWin(f, args, parts, ord) ||
                isGlobalBoundedRowsWin(f, args, parts, ord, frame)
            case _ => false
          }
          val (ginWins, rest3) = rest2.partition {
            case BoundItem.BIWin(f, args, parts, ord, _, _) =>
              isGlobalIgnoreNullsShiftWin(f, args, parts, ord)
            case _ => false
          }
          val (wexWins, rest4) = rest3.partition {
            case BoundItem.BIWin(f, args, parts, ord, _, frame) =>
              isGlobalWholeExWin(f, args, parts, ord, frame)
            case _ => false
          }
          val (gbsWins, rest5) = rest4.partition {
            case BoundItem.BIWin(f, args, parts, ord, _, _) =>
              isGlobalBigShiftWin(f, args, parts, ord)
            case _ => false
          }
          val (gmaWins, rest6) = rest5.partition {
            case BoundItem.BIWin(f, args, parts, ord, _, frame) =>
              isGlobalDistinctAheadWin(f, args, parts, ord, frame)
            case _ => false
          }
          val (gbiWins, windowWins) = rest6.partition {
            case BoundItem.BIWin(f, args, parts, ord, _, _) =>
              isGlobalBigInShiftWin(f, args, parts, ord)
            case _ => false
          }
          // ALL global-machinery classes go through the shared-bucketing
          // coordinator: one range bucketing per distinct ORDER spec,
          // items of the same spec share it ACROSS classes. DISTINCT
          // items pre-attach their first-occurrence mask (value-
          // partitioned window — distributed at any NDV) and become an
          // ordinary running aggregate over the mask.
          val opL: BoundOperand => Column = lowerOperandWith(_, qcol)
          def ordColsOf(w: BoundItem.BIWin): Seq[(Column, Ast.SortDir)] =
            w.orderBy.map { case (o, dir) => (opL(o), dir) }
          val gowReqs = gowWins.collect { case w: BoundItem.BIWin =>
            if (isGlobalDistinctWin(w.func, w.args, w.partitionBy,
                w.orderBy, w.frame))
              GowReq(w.alias, if (w.func == "mean") "avg" else w.func,
                None, w.orderBy, ordColsOf(w), w.frame,
                Some(distinctMaskColumn(w.args, Nil, w.orderBy, opL, qcol)))
            else
              GowReq(w.alias, w.func, w.args.headOption.map(opL),
                w.orderBy, ordColsOf(w), w.frame)
          }
          val gswReqs = shiftWins.collect { case w: BoundItem.BIWin =>
            GswReq(ghostWinOf(w.alias, w.func, w.args, w.frame, opL),
              w.orderBy, ordColsOf(w))
          }
          val ginReqs = ginWins.collect { case w: BoundItem.BIWin =>
            val argsR = w.args.dropRight(1) // strip the sentinel
            GinReq(w.alias, w.func, opL(argsR.head),
              shiftOffset(argsR), shiftDefaultAny(argsR),
              w.orderBy, ordColsOf(w))
          }
          val gwxReqs = wexWins.collect { case w: BoundItem.BIWin =>
            GwxReq(w.alias, w.func, w.args.headOption.map(opL),
              w.frame.get, w.orderBy, ordColsOf(w))
          }
          val gbsReqs = gbsWins.collect { case w: BoundItem.BIWin =>
            GbsReq(w.alias, w.func, opL(w.args.head),
              shiftOffset(w.args), shiftDefaultAny(w.args),
              w.orderBy, ordColsOf(w))
          }
          val gmaReqs = gmaWins.collect { case w: BoundItem.BIWin =>
            GmaReq(w.alias, if (w.func == "mean") "avg" else w.func,
              distinctMaskColumn(w.args, Nil, w.orderBy, opL, qcol),
              w.frame.get.hi.toInt, w.orderBy, ordColsOf(w))
          }
          val gbiReqs = gbiWins.collect { case w: BoundItem.BIWin =>
            val argsR = w.args.dropRight(1) // strip the sentinel
            GbiReq(w.alias, w.func, opL(argsR.head),
              shiftOffset(argsR), shiftDefaultAny(argsR),
              w.orderBy, ordColsOf(w))
          }
          val baseGbi = attachGlobalWinGroups(spark, base1,
            gowReqs, gswReqs, ginReqs, gwxReqs, gbsReqs, gmaReqs, gbiReqs)
          val withWins0 = windowWins.foldLeft(baseGbi) {
            case (d, BoundItem.BIWin(f, args, parts, ord, a, frame)) =>
              val rk = if (frame.exists(_.groups)) Some(s"__grk_$a") else None
              val mk = if (distinctWinEligible(f, args, frame))
                Some(s"__dmk_$a") else None
              val d1 = rk.fold(d)(n => d.withColumn(n, groupsRankColumn(
                parts, ord, lowerOperandWith(_, qcol), qcol)))
              val d2 = mk.fold(d1)(n => d1.withColumn(n, distinctMaskColumn(
                args, parts, ord, lowerOperandWith(_, qcol), qcol)))
              d2.withColumn(a, windowColumn(f, args, parts, ord, frame,
                  lowerOperandWith(_, qcol), qcol, rk.map(col), mk.map(col)))
                .drop(rk.toSeq ++ mk.toSeq: _*)
          }
          // global-agg windows: ONE 1-row aggregate over the pre-window
          // frame (identical row set), broadcast cross-joined back
          val withWins =
            if (globalWins.isEmpty) withWins0
            else {
              val aggs = globalWins.map {
                case BoundItem.BIWin(f, args, _, _, a, _) =>
                  globalAggCol(f, args, lowerOperandWith(_, qcol)).as(a)
                case _ => sys.error("unreachable: BIWin partition")
              }
              withWins0.crossJoin(broadcast(
                base1.agg(aggs.head, aggs.tail: _*)))
            }
          q.qualify.fold(withWins) { qe =>
            if (!BoundExpr.containsSub(qe))
              withWins.filter(lowerExprWith(qe, lowerOperandWith(_, qcol)))
            else {
              // subqueries in QUALIFY: the WHERE mixed-conjunct marker
              // machinery applied to the WINDOWED frame — marker frames
              // left-join in, the predicate filters once, markers drop
              val ms = new MarkerScope(spark, source, "ql", qcol,
                lowerOperandWith(_, qcol))
              ms.register(qe)
              val joined = ms.joins.foldLeft(withWins) { case (d, (f, on)) =>
                d.join(f, on, "left_outer") }
              joined.filter(ms.pred(qe)).drop(ms.drops.toSeq: _*)
            }
          }
        }
      // DISTINCT ON: first row per key tuple under the query ORDER BY —
      // a row_number window partitioned on the ON keys (one shuffle;
      // Catalyst plans the rn=1 filter as WindowGroupLimit, so per-key
      // state is one row, never a per-key sort buffer)
      val base = if (q.distinctOn.isEmpty) baseQ else {
        def okCol(k: BoundOrderKey): Column = k match {
          case BoundOrderKey.OKOperand(op) => lowerOperandWith(op, qcol)
          case BoundOrderKey.OKOutput(n) => q.projection.collectFirst {
            case BoundItem.BICol(bc, Some(a)) if a.equalsIgnoreCase(n) => qcol(bc)
            case BoundItem.BIExpr(op, a) if a.equalsIgnoreCase(n) =>
              lowerOperandWith(op, qcol)
            // window alias: the column is pre-attached (donNeedsWins)
            case BoundItem.BIWin(_, _, _, _, a, _) if a.equalsIgnoreCase(n) =>
              col(a)
          }.getOrElse(sys.error(s"unreachable DISTINCT ON order alias $n"))
        }
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(q.distinctOn.map(lowerOperandWith(_, qcol)): _*)
          .orderBy(q.orderBy.map { case (k, dir) => sortCol(okCol(k), dir) }: _*)
        baseQ.withColumn("__don", row_number().over(w))
          .filter(col("__don") === 1).drop("__don")
      }
      def projOperand(op: BoundOperand): Column =
        projMs.fold(lowerOperandWith(op, qcol))(_.operand(op))
      def outputCols: Seq[Column] = q.projection.zipWithIndex.map {
        case (BoundItem.BISub(_, a, _, _, _), i) => scalarCol(i).as(a)
        case (BoundItem.BICol(bc, a), _)  => qcol(bc).as(outName(bc, a))
        case (BoundItem.BIExpr(op, a), _) => projOperand(op).as(a)
        case (_: BoundItem.BIAgg, _) =>
          sys.error("unreachable: aggregate items take the aggregate branch")
        case (BoundItem.BIWin(f, args, parts, ord, a, frame), _) =>
          if (winsPre) col(a).as(a)
          else windowColumn(f, args, parts, ord, frame,
            lowerOperandWith(_, qcol), qcol).as(a)
      }
      if (q.distinct && q.distinctOn.isEmpty) {
        // DISTINCT applies to the PROJECTED rows, so evaluation reorders:
        // project → distinct → sort on output names (the analyzer already
        // required sort keys to be projected or output aliases) → limit
        // (DISTINCT ON took the pre-projection first-row filter instead
        // and falls through to the plain ordered path)
        val projected = base.select(outputCols: _*).distinct()
        val ordered = if (q.orderBy.isEmpty) projected else projected.orderBy(
          q.orderBy.map {
            case (BoundOrderKey.OKOutput(n), dir) => sortCol(col(n), dir)
            case (BoundOrderKey.OKOperand(BoundOperand.BCol(bc)), dir) =>
              val name = namedCols.collectFirst {
                case (pc, a) if pc.binding == bc.binding &&
                  pc.attr.name.equalsIgnoreCase(bc.attr.name) => outName(pc, a)
              }.getOrElse(outName(bc))
              sortCol(col(name), dir)
            case (k, _) => sys.error(s"unreachable DISTINCT sort key $k")
          }: _*)
        applyOffsetLimit(ordered, q.offset, q.limit)
      } else if (q.orderBy.isEmpty) {
        // window items must evaluate over the FULL row set, so the
        // projection computes before LIMIT/OFFSET cut it; plain
        // projections keep limit-first (Catalyst's CollectLimit stops
        // the scan early, and the select commutes with it)
        if (q.projection.exists(_.isInstanceOf[BoundItem.BIWin]))
          applyOffsetLimit(base.select(outputCols: _*), q.offset, q.limit)
        else
          applyOffsetLimit(base, q.offset, q.limit).select(outputCols: _*)
      } else {
        // project output + hidden sort columns, sort, limit, drop hidden:
        // output-alias keys sort the projected column; operand keys may
        // reference unprojected table columns, so they ride as hidden
        // columns through the sort (with LIMIT Catalyst still plans
        // TakeOrderedAndProject over the projection)
        val hidden = q.orderBy.zipWithIndex.collect {
          case ((BoundOrderKey.OKOperand(op), _), i) =>
            s"__sort_$i" -> lowerOperandWith(op, qcol)
        }
        val projected = base.select(
          outputCols ++ hidden.map { case (n, c) => c.as(n) }: _*)
        val sortCols = q.orderBy.zipWithIndex.map { case ((k, dir), i) =>
          val c = k match {
            case BoundOrderKey.OKOutput(n)  => col(n)
            case BoundOrderKey.OKOperand(_) => col(s"__sort_$i")
          }
          sortCol(c, dir)
        }
        val ordered = projected.orderBy(sortCols: _*)
        applyOffsetLimit(ordered, q.offset, q.limit).drop(hidden.map(_._1): _*)
      }
    } else {
      // GROUP BY + aggregates: group keys keep their (possibly qualified)
      // output names — an alias key keeps its alias; aggregate output
      // names are func_col / count_star, uniquified on collision.
      val groupColKeys = q.groupBy.collect { case BoundGroupKey.GKCol(c) => c }
      val groupExprAliases =
        q.groupBy.collect { case BoundGroupKey.GKExpr(_, a) => a.toLowerCase }.toSet
      def groupOut(bc: BoundCol): String =
        if (groupColKeys.count(_.attr.name.equalsIgnoreCase(bc.attr.name)) > 1)
          s"${bc.binding}_${bc.attr.name}"
        else bc.attr.name
      val aggItems = q.projection.zipWithIndex.collect {
        case (BoundItem.BIAgg(f, arg, a, dist), i) => (f, arg, dist, a, i)
      }
      val usedNames = scala.collection.mutable.Set.empty[String]
      val aggName: Map[Int, String] = aggItems.map { case (f, arg, _, alias, i) =>
        val base = alias.getOrElse(arg match {
          case None                         => "count_star"
          case Some(BoundOperand.BCol(c))   => s"${f}_${c.attr.name}"
          case Some(_)                      => s"${f}_expr"
        })
        val name = if (usedNames.add(base)) base else {
          var k = 2
          while (!usedNames.add(s"${base}_$k")) k += 1
          s"${base}_$k"
        }
        i -> name
      }.toMap
      // aggregate over a full expression: sum(a * (1 - b)) lowers the
      // argument with qualified (pre-aggregation) column resolution;
      // DISTINCT forms map to the engine's distinct aggregates (min/max
      // over a distinct set are the plain min/max)
      def aggCol(f: String, arg: Option[BoundOperand], dist: Boolean): Column =
        (f, arg) match {
          case ("count", None)            => count(lit(1))
          case ("count", Some(a)) if dist => count_distinct(lowerOperandWith(a, qcol))
          case ("count", Some(a))         => count(lowerOperandWith(a, qcol))
          case ("sum", Some(a)) if dist   => sum_distinct(lowerOperandWith(a, qcol))
          case ("sum", Some(a))           => sum(lowerOperandWith(a, qcol))
          case ("min", Some(a))           => min(lowerOperandWith(a, qcol))
          case ("max", Some(a))           => max(lowerOperandWith(a, qcol))
          // avg(DISTINCT) composed from the native distinct aggregates
          // (one distinct-aggregate state, exactly SQL semantics)
          case ("avg", Some(a)) if dist =>
            sum_distinct(lowerOperandWith(a, qcol)) /
              count_distinct(lowerOperandWith(a, qcol))
          case ("avg", Some(a))           => avg(lowerOperandWith(a, qcol))
          case ("stddev", Some(a))        => stddev(lowerOperandWith(a, qcol))
          case ("variance", Some(a))      => variance(lowerOperandWith(a, qcol))
          case ("median", Some(a))        => median(lowerOperandWith(a, qcol))
          case ("mode", Some(a))          => mode(lowerOperandWith(a, qcol))
          case ("bool_and", Some(a))      => bool_and(lowerOperandWith(a, qcol))
          case ("bool_or", Some(a))       => bool_or(lowerOperandWith(a, qcol))
          case ("bit_and", Some(a))       => bit_and(lowerOperandWith(a, qcol))
          case ("bit_or", Some(a))        => bit_or(lowerOperandWith(a, qcol))
          case ("bit_xor", Some(a))       => bit_xor(lowerOperandWith(a, qcol))
          // int on both engines (Spark's native grouping() is a tinyint)
          case ("grouping", Some(a))      => grouping(lowerOperandWith(a, qcol)).cast("int")
          // DuckDB's skewness/kurtosis are the SAMPLE-corrected G1/G2
          // where Spark's natives are population g1/g2 — compose the
          // correction from count(x) (probed: G1 = g1·√(n(n-1))/(n-2),
          // G2 = ((n+1)·g2+6)(n-1)/((n-2)(n-3)); n too small or a
          // constant input reads NULL on both engines — try_divide for
          // the n cutoffs, isnan→NULL for zero variance)
          // entropy counts equality classes — the string cast is
          // equality-preserving within a column's type; mad runs over
          // doubles (DuckDB's integer mad is DOUBLE too)
          // any_value: the first non-NULL (DuckDB reads scan order;
          // Spark's is plan-order nondeterministic — identical when the
          // group's values agree, which is the only gate-checkable form)
          case ("any_value", Some(a)) =>
            org.apache.spark.sql.functions.any_value(
              lowerOperandWith(a, qcol), lit(true))
          // fsum/favg: DuckDB's compensated-sum spellings — plain
          // sum/avg here (probed on a cancellation fixture: DuckDB 1.0's
          // fsum matched its own sum bit-for-bit, so aliasing is
          // value-exact against the oracle)
          case ("fsum", Some(a)) =>
            sum(lowerOperandWith(a, qcol).cast("double"))
          case ("favg", Some(a)) =>
            avg(lowerOperandWith(a, qcol).cast("double"))
          // sem: standard error of the mean — DuckDB's is the
          // POPULATION form stddev_pop/√n (probed against both
          // stddev variants on grouped fixtures)
          case ("sem", Some(a)) =>
            val c = lowerOperandWith(a, qcol)
            stddev_pop(c) / sqrt(count(c).cast("double"))
          // population/sample variance family: Spark natives share
          // DuckDB's formulas exactly
          case ("stddev_pop", Some(a))  => stddev_pop(lowerOperandWith(a, qcol))
          case ("stddev_samp", Some(a)) => stddev_samp(lowerOperandWith(a, qcol))
          case ("var_pop", Some(a))     => var_pop(lowerOperandWith(a, qcol))
          case ("var_samp", Some(a))    => var_samp(lowerOperandWith(a, qcol))
          // kurtosis_pop is the POPULATION g2 — Spark's native kurtosis
          // directly (the dialect's plain kurtosis applies the sample
          // correction on top)
          case ("kurtosis_pop", Some(a)) =>
            val g = kurtosis(lowerOperandWith(a, qcol))
            when(isnan(g), lit(null)).otherwise(g)
          // approx_count_distinct: Spark's HLL++ — estimates are
          // sketch-specific (no DuckDB oracle; spec-bounded ±5% like
          // the stats NDV gate)
          case ("approx_count_distinct", Some(a)) =>
            approx_count_distinct(lowerOperandWith(a, qcol))
          case ("entropy", Some(a)) =>
            graft.functions.StatAggregates.entropy(
              lowerOperandWith(a, qcol).cast("string"))
          case ("mad", Some(a)) =>
            graft.functions.StatAggregates.mad(
              lowerOperandWith(a, qcol).cast("double"))
          case ("product", Some(a)) =>
            graft.functions.StatAggregates.product(
              lowerOperandWith(a, qcol).cast("double"))
          // histogram: value→count map with keys sorted ascending
          // (DuckDB probed; NULLs skipped, all-NULL group reads NULL).
          // One collect_list of aggregate state; the count-per-distinct
          // fold is a codegen'd expression over it — same O(group)
          // memory DuckDB's hash-based histogram pays.
          case ("histogram", Some(a)) =>
            val lst = collect_list(lowerOperandWith(a, qcol))
            when(size(lst) === 0, lit(null)).otherwise(
              map_from_entries(transform(array_sort(array_distinct(lst)),
                k => struct(k.as("key"),
                  size(filter(lst, v => v === k)).cast("long").as("value")))))
          case ("skewness", Some(a)) =>
            val c = lowerOperandWith(a, qcol)
            val n = count(c).cast("double")
            val g = skewness(c) * try_divide(sqrt(n * (n - 1)), n - 2)
            when(isnan(g), lit(null)).otherwise(g)
          case ("kurtosis", Some(a)) =>
            val c = lowerOperandWith(a, qcol)
            val n = count(c).cast("double")
            val g = try_divide(((n + 1) * kurtosis(c) + 6) * (n - 1),
              (n - 2) * (n - 3))
            when(isnan(g), lit(null)).otherwise(g)
          case other                      => sys.error(s"unreachable aggregate $other")
        }
      val aggExprs = aggItems.map { case (f, arg, dist, _, i) =>
        aggCol(f, arg, dist).as(aggName(i)) }
      // HAVING / ORDER BY / computed-projection aggregates compute as
      // hidden columns next to the projected ones; the final projection
      // drops them
      val havingAggs =
        scala.collection.mutable.ArrayBuffer.empty[(BoundOperand, String)]
      // uncorrelated scalar-subquery operands in aggregate scope
      // (sum(x) / (SELECT sum(x) FROM t)): each a broadcast 1-row frame
      // joined AFTER aggregation (the expression evaluates over the
      // grouped frame), or a guarded-literal bounded job
      val subValJoins = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      val subValCols = new java.util.IdentityHashMap[BoundOperand, Column]()
      // post-aggregation window column names: projection window items
      // attach as __w_<i>, hidden inline-OVER windows (projection
      // expressions + QUALIFY) at their generated aliases — BOut output
      // references in expressions lowered over the windowed frame
      // resolve through this map
      val qualifyWinAliasCol: Map[String, String] =
        (q.projection.zipWithIndex.collect {
          case (BoundItem.BIWin(_, _, _, _, a, _), i) =>
            a.toLowerCase -> s"__w_$i"
        } ++ q.qualifyWins.collect {
          case BoundItem.BIWin(_, _, _, _, a, _) => a.toLowerCase -> a.toLowerCase
        }).toMap
      def havingOperand(o: BoundOperand): Column = o match {
        case v @ BoundOperand.BSubVal(sub, guard, _, None) =>
          // correlated forms are analyzer-rejected in aggregate scope
          Option(subValCols.get(v)).getOrElse {
            val c =
              if (guard) guardedScalarLit(lowerSelect(spark, sub, source))
              else {
                val name = s"__es_${subValJoins.length}"
                subValJoins += broadcast(
                  lowerSelect(spark, sub, source).toDF(name))
                col(name)
              }
            subValCols.put(v, c)
            c
          }
        case BoundOperand.BCol(c) => col(groupOut(c))
        case BoundOperand.BLit(l) => lowerLit(l)
        case BoundOperand.BInterval(n, u) => intervalCol(n, u)
        case BoundOperand.BArith(op, l, r) => arith(op, havingOperand(l), havingOperand(r))
        case BoundOperand.BFunc(f, args)   => lowerFunc(f, args, havingOperand)
        case BoundOperand.BCase(bs, els)   => caseCol(bs, els, havingOperand)
        case BoundOperand.BCast(x, t)      => havingOperand(x).cast(t.spark)
        case BoundOperand.BTryCast(x, t)   => havingOperand(x).try_cast(t.spark)
        case a @ BoundOperand.BAgg(_, _, _) =>
          val name = s"__h_${havingAggs.length}"
          havingAggs += ((a, name))
          col(name)
        case a @ BoundOperand.BOrderedAgg(_, _, _, _) =>
          val name = s"__h_${havingAggs.length}"
          havingAggs += ((a, name))
          col(name)
        case BoundOperand.BOut(n, _) =>
          // a hidden-window output reference: the window column attaches
          // between aggregation and the final projection (withWins), so
          // every consumer — projection expressions, ORDER BY, QUALIFY —
          // evaluates over the windowed frame (HAVING cannot contain
          // windows; analyzer scope)
          col(qualifyWinAliasCol(n.toLowerCase))
      }
      def havingCol(e: BoundExpr): Column = e match {
        case BoundExpr.BAnd(l, r) => havingCol(l) && havingCol(r)
        case BoundExpr.BOr(l, r)  => havingCol(l) || havingCol(r)
        case BoundExpr.BNot(x)    => !havingCol(x)
        case BoundExpr.BIsNull(o, neg) =>
          val c = havingOperand(o)
          if (neg) c.isNotNull else c.isNull
        case BoundExpr.BLike(o, pat, neg, ci, esc) =>
          val c = likeCol(havingOperand(o), pat, ci, esc)
          if (neg) !c else c
        case BoundExpr.BInSub(_, _, _, _) | BoundExpr.BExists(_, _, _, _) =>
          sys.error("unreachable: analyzer rejects IN/EXISTS in HAVING")
        case BoundExpr.BCmpSub(_, _, _, _, _) |
             BoundExpr.BQuantSub(_, _, _, _, _) =>
          sys.error("unreachable: subquery HAVING conjuncts lower as joins")
        case BoundExpr.BCmp(op, l, r) =>
          cmpCols(op, havingOperand(l), havingOperand(r))
      }
      // HAVING splits into plain conjuncts (a post-aggregation filter) and
      // scalar-subquery conjuncts (each a broadcast join of its 1-row
      // frame after aggregation). The subquery operands register their
      // hidden aggregate columns NOW — before agg() assembles.
      val havingConjs = q.having.map(conjuncts).getOrElse(Nil)
      val (havingWithSub, havingPlainConjs) =
        havingConjs.partition(BoundExpr.containsSub)
      // pure top-level subquery conjuncts take the semi/anti path; mixed
      // ones (subqueries under OR) get boolean-marker joins
      val (havingSubConjs, havingMixedConjs) = havingWithSub.partition {
        case _: BoundExpr.BInSub | _: BoundExpr.BExists | _: BoundExpr.BCmpSub => true
        case _ => false
      }
      val havingCond = havingPlainConjs.map(havingCol).reduceOption(_ && _)
      // probe operands lower NOW (registering hidden aggregate columns
      // before the agg assembles); the joins themselves fold in after
      // aggregation + plain-HAVING filtering
      sealed trait HSub
      case class HCmp(op: Ast.CmpOp, lc: Column, sub: BoundSelect,
        guard: Boolean, pairs: Seq[(BoundCol, BoundCol)]) extends HSub
      case class HIn(lc: Column, sub: BoundSelect,
        pairs: Seq[(BoundCol, BoundCol)], negated: Boolean) extends HSub
      case class HExists(sub: BoundSelect,
        pairs: Seq[(BoundCol, BoundCol)], negated: Boolean) extends HSub
      val havingSubParts: Seq[HSub] = havingSubConjs.map {
        case BoundExpr.BCmpSub(op, o, ssub, guard, pairs) =>
          HCmp(op, havingOperand(o), ssub, guard, pairs)
        case BoundExpr.BInSub(o, ssub, pairs, neg) =>
          HIn(havingOperand(o), ssub, pairs, neg)
        // residual is analyzer-rejected in HAVING scope (Seq() pin)
        case BoundExpr.BExists(ssub, pairs, neg, Seq()) =>
          HExists(ssub, pairs, neg)
        case _ => sys.error(
          "unreachable: analyzer allows only subquery conjuncts here")
      }
      def qcolSub(bc: BoundCol): Column = col(s"${bc.binding}.${bc.attr.name}")
      // mixed HAVING conjuncts (subqueries under OR or NOT): probes and
      // plain parts lower NOW — their hidden aggregate columns must
      // register before the agg assembles — while each subquery's marker
      // frames + join conditions (on the GROUP BY keys' output columns)
      // are captured for application after aggregation
      val havingMixedPlans = havingMixedConjs.zipWithIndex.map { case (c0, t) =>
        val ms = new MarkerScope(spark, source, s"h$t",
          bc => col(groupOut(bc)), havingOperand)
        ms.register(c0)
        (ms.joins.toSeq, ms.pred(c0), ms.drops.toSeq)
      }
      // computed projections in aggregate scope (count(*) * 2 AS n2):
      // their aggregate calls become hidden agg columns — registered into
      // the same buffer BEFORE the agg() is assembled — and the expression
      // evaluates over them (and grouped names) at the final projection
      // a computed item whose alias IS a group key projects the grouped
      // column (recomputing would reference pre-aggregation inputs)
      //
      // predicate-form subqueries inside the expression (CASE WHEN k IN
      // (SELECT …) THEN count(*) …) get their own post-aggregation
      // MarkerScope keyed on the GROUP BY output columns — registered
      // NOW so probe aggregates become hidden agg columns, frames
      // left-joined after the HAVING machinery, markers dying at the
      // final explicit projection (analyzer guarantees every outer
      // reference is a GROUP BY key)
      // inequality-correlated scalar-subquery ITEMS (rewritten onto
      // BSubVal by the analyzer) take the union-merge running-aggregate
      // lowering over the GROUPED frame — handled after aggregation, not
      // through the marker machinery; their scalar columns register here
      val ineqItems: Seq[(Int, BoundSelect, Seq[(BoundCol, BoundCol)],
          Analyzer.CorrIneq, String)] =
        q.projection.zipWithIndex.collect {
          case (BoundItem.BIExpr(
              BoundOperand.BSubVal(sub, _, ps, Some(iq)), a), i) =>
            (i, sub, ps, iq, a)
        }
      val ineqIdx = ineqItems.map(_._1).toSet
      val ineqScalarOf = scala.collection.mutable.Map.empty[Int, Column]
      val projMarkers: Map[Int, MarkerScope] =
        q.projection.zipWithIndex.collect {
          case (BoundItem.BIExpr(op, a), i)
              if !groupExprAliases(a.toLowerCase) && !ineqIdx(i) &&
                BoundOperand.operandHasSub(op) =>
            val ms = new MarkerScope(spark, source, s"px$i",
              bc => col(groupOut(bc)), havingOperand)
            ms.registerOp(op)
            i -> ms
        }.toMap
      val exprCols: Map[Int, Column] = q.projection.zipWithIndex.collect {
        case (BoundItem.BIExpr(op, a), i) if !ineqIdx(i) =>
          i -> (if (groupExprAliases(a.toLowerCase)) col(a).as(a)
                else projMarkers.get(i).map(_.operand(op).as(a))
                  .getOrElse(havingOperand(op).as(a)))
      }.toMap
      // ORDER BY keys in aggregate scope lower NOW so their aggregate
      // calls register hidden columns before the agg() assembles: output
      // aliases resolve to post-aggregation column names, operands go
      // through havingOperand (group keys by grouped name, aggregates as
      // hidden agg columns)
      // an operand that IS a group expression resolves to the grouped key
      // column (recomputing would reference pre-agg inputs); everything
      // else goes through havingOperand
      def aggScopeOperand(op: BoundOperand): Column =
        q.groupBy.collectFirst {
          case BoundGroupKey.GKExpr(gop, a) if gop == op => col(a)
        }.getOrElse(havingOperand(op))
      val orderCols: Seq[(Column, Ast.SortDir)] = q.orderBy.map { case (k, desc) =>
        val c = k match {
          case BoundOrderKey.OKOutput(n) =>
            q.projection.zipWithIndex.collectFirst {
              case (BoundItem.BIAgg(_, _, Some(a), _), i) if a.equalsIgnoreCase(n) =>
                col(aggName(i))
              case (BoundItem.BIExpr(op, a), _) if a.equalsIgnoreCase(n) =>
                if (groupExprAliases(a.toLowerCase)) col(a) else havingOperand(op)
              case (BoundItem.BICol(bc, Some(a)), _) if a.equalsIgnoreCase(n) =>
                col(groupOut(bc))
              case (BoundItem.BIWin(_, _, _, _, a, _), i) if a.equalsIgnoreCase(n) =>
                col(s"__w_$i")
            }.getOrElse(sys.error(s"unreachable: unresolved output alias $n"))
          case BoundOrderKey.OKOperand(op) => aggScopeOperand(op)
        }
        (c, desc)
      }
      // DISTINCT ON over the aggregated frame: the ON keys lower NOW
      // (aggregate keys must register their hidden agg columns before
      // the agg assembles); the first-row-per-key filter applies after
      // windows/QUALIFY attach, right before the final ORDER BY
      val donCols: Seq[Column] = q.distinctOn.map(aggScopeOperand)
      // window items over the AGGREGATED frame (rank() OVER (ORDER BY
      // count(*) DESC) after GROUP BY): operands resolve post-aggregation
      // — group keys by grouped name, aggregate calls as hidden agg
      // columns (registered NOW, before the agg assembles); the columns
      // compute in a select between aggregation and the final ORDER BY
      // GROUPS frames over the aggregated frame: the dense_rank columns
      // pre-attach in a select ahead of the window select, then drop
      val winRanks = scala.collection.mutable.ArrayBuffer.empty[(String, Column)]
      def withRank(frame: Option[Ast.WinFrame], parts: Seq[BoundOperand],
          ord: Seq[(BoundOperand, Ast.SortDir)], tag: String): Option[Column] =
        if (!frame.exists(_.groups)) None
        else {
          val n = s"__grk_$tag"
          winRanks += n -> groupsRankColumn(parts, ord, aggScopeOperand,
            bc => col(groupOut(bc)))
          Some(col(n))
        }
      // DISTINCT prefix-frame aggregates pre-attach their mask through
      // the same select (winRanks names all drop after the window select)
      def withMask(f: String, args: Seq[BoundOperand],
          frame: Option[Ast.WinFrame], parts: Seq[BoundOperand],
          ord: Seq[(BoundOperand, Ast.SortDir)], tag: String): Option[Column] =
        if (!distinctWinEligible(f, args, frame)) None
        else {
          val n = s"__dmk_$tag"
          winRanks += n -> distinctMaskColumn(args, parts, ord,
            aggScopeOperand, bc => col(groupOut(bc)))
          Some(col(n))
        }
      // unpartitioned unordered aggregate windows (sum(count(*)) OVER ())
      // split off to the broadcast rewrite; unpartitioned ORDERED ones
      // to the distributed prefix scan (operands lower ONCE in all
      // three cases: aggScopeOperand registers hidden aggregates as a
      // side effect, BEFORE the agg assembles)
      // Gow/Gsw/Gin/Gwx/Gbs/Gma/Gbi request structs are file-level —
      // shared with the plain-projection lowering path and executed by
      // attachGlobalWinGroups over one bucketing per ORDER spec
      sealed trait WinL
      final case class WinLBroadcast(c: Column) extends WinL
      final case class WinLGow(g: GowReq) extends WinL
      final case class WinLGsw(g: GswReq) extends WinL
      final case class WinLGin(g: GinReq) extends WinL
      final case class WinLGwx(g: GwxReq) extends WinL
      final case class WinLGbs(g: GbsReq) extends WinL
      final case class WinLGma(g: GmaReq) extends WinL
      final case class WinLGbi(g: GbiReq) extends WinL
      final case class WinLCol(c: Column) extends WinL
      def lowerWin(name: String, f: String, args: Seq[BoundOperand],
          parts: Seq[BoundOperand], ord: Seq[(BoundOperand, Ast.SortDir)],
          frame: Option[Ast.WinFrame], tag: String): WinL =
        if (isGlobalAggWin(f, args, parts, ord, frame))
          WinLBroadcast(globalAggCol(f, args, aggScopeOperand))
        else if (isGlobalOrderedWin(f, args, parts, ord, frame))
          WinLGow(GowReq(name, f, args.headOption.map(aggScopeOperand),
            ord, ord.map { case (o, d) => (aggScopeOperand(o), d) }, frame))
        else if (isGlobalDistinctWin(f, args, parts, ord, frame))
          WinLGow(GowReq(name, if (f == "mean") "avg" else f, None,
            ord, ord.map { case (o, d) => (aggScopeOperand(o), d) }, frame,
            Some(distinctMaskColumn(args, Nil, ord, aggScopeOperand,
              bc => col(groupOut(bc))))))
        else if (isGlobalShiftWin(f, args, parts, ord) ||
            isGlobalBoundedRowsWin(f, args, parts, ord, frame))
          WinLGsw(GswReq(ghostWinOf(name, f, args, frame, aggScopeOperand),
            ord, ord.map { case (o, d) => (aggScopeOperand(o), d) }))
        else if (isGlobalIgnoreNullsShiftWin(f, args, parts, ord)) {
          val argsR = args.dropRight(1) // strip the sentinel
          WinLGin(GinReq(name, f, aggScopeOperand(argsR.head),
            shiftOffset(argsR), shiftDefaultAny(argsR),
            ord, ord.map { case (o, d) => (aggScopeOperand(o), d) }))
        }
        else if (isGlobalWholeExWin(f, args, parts, ord, frame))
          WinLGwx(GwxReq(name, f, args.headOption.map(aggScopeOperand),
            frame.get, ord, ord.map { case (o, d) => (aggScopeOperand(o), d) }))
        else if (isGlobalBigShiftWin(f, args, parts, ord))
          WinLGbs(GbsReq(name, f, aggScopeOperand(args.head),
            shiftOffset(args), shiftDefaultAny(args),
            ord, ord.map { case (o, d) => (aggScopeOperand(o), d) }))
        else if (isGlobalDistinctAheadWin(f, args, parts, ord, frame))
          WinLGma(GmaReq(name, if (f == "mean") "avg" else f,
            distinctMaskColumn(args, Nil, ord, aggScopeOperand,
              bc => col(groupOut(bc))),
            frame.get.hi.toInt,
            ord, ord.map { case (o, d) => (aggScopeOperand(o), d) }))
        else if (isGlobalBigInShiftWin(f, args, parts, ord)) {
          val argsR = args.dropRight(1) // strip the sentinel
          WinLGbi(GbiReq(name, f, aggScopeOperand(argsR.head),
            shiftOffset(argsR), shiftDefaultAny(argsR),
            ord, ord.map { case (o, d) => (aggScopeOperand(o), d) }))
        }
        else WinLCol(windowColumn(f, args, parts, ord, frame,
          aggScopeOperand, bc => col(groupOut(bc)),
          withRank(frame, parts, ord, tag),
          withMask(f, args, frame, parts, ord, tag)))
      val winLowered: Seq[(String, WinL)] =
        q.projection.zipWithIndex.collect {
          case (BoundItem.BIWin(f, args, parts, ord, _, frame), i) =>
            s"__w_$i" -> lowerWin(s"__w_$i", f, args, parts, ord, frame,
              i.toString)
        }
      val winItems: Seq[(String, Column)] =
        winLowered.collect { case (n, WinLCol(c)) => n -> c }
      val winGlobals: Seq[(String, Column)] =
        winLowered.collect { case (n, WinLBroadcast(c)) => n -> c }
      val winGows: Seq[GowReq] =
        winLowered.collect { case (_, WinLGow(g)) => g }
      val winGsws: Seq[GswReq] =
        winLowered.collect { case (_, WinLGsw(g)) => g }
      val winGins: Seq[GinReq] =
        winLowered.collect { case (_, WinLGin(g)) => g }
      val winGwxs: Seq[GwxReq] =
        winLowered.collect { case (_, WinLGwx(g)) => g }
      val winGbss: Seq[GbsReq] =
        winLowered.collect { case (_, WinLGbs(g)) => g }
      val winGmas: Seq[GmaReq] =
        winLowered.collect { case (_, WinLGma(g)) => g }
      val winGbis: Seq[GbiReq] =
        winLowered.collect { case (_, WinLGbi(g)) => g }
      // QUALIFY in aggregate scope: hidden inline-OVER window items
      // compute like projection windows (args register hidden aggregates
      // NOW) and attach under their generated aliases; the predicate
      // lowers NOW too — window aliases read the attached columns,
      // everything else resolves post-aggregation
      val qwinLowered: Seq[(String, WinL)] =
        q.qualifyWins.collect {
          case BoundItem.BIWin(f, args, parts, ord, a, frame) =>
            a.toLowerCase -> lowerWin(a.toLowerCase, f, args, parts, ord,
              frame, s"q_$a")
        }
      val qwinItems: Seq[(String, Column)] =
        qwinLowered.collect { case (n, WinLCol(c)) => n -> c }
      val qwinGlobals: Seq[(String, Column)] =
        qwinLowered.collect { case (n, WinLBroadcast(c)) => n -> c }
      val qwinGows: Seq[GowReq] =
        qwinLowered.collect { case (_, WinLGow(g)) => g }
      val qwinGsws: Seq[GswReq] =
        qwinLowered.collect { case (_, WinLGsw(g)) => g }
      val qwinGins: Seq[GinReq] =
        qwinLowered.collect { case (_, WinLGin(g)) => g }
      val qwinGwxs: Seq[GwxReq] =
        qwinLowered.collect { case (_, WinLGwx(g)) => g }
      val qwinGbss: Seq[GbsReq] =
        qwinLowered.collect { case (_, WinLGbs(g)) => g }
      val qwinGmas: Seq[GmaReq] =
        qwinLowered.collect { case (_, WinLGma(g)) => g }
      val qwinGbis: Seq[GbiReq] =
        qwinLowered.collect { case (_, WinLGbi(g)) => g }
      def qualifyOp(o: BoundOperand): Column = o match {
        case BoundOperand.BOut(n, _) => col(qualifyWinAliasCol(n.toLowerCase))
        case BoundOperand.BArith(ch, l, r) =>
          arith(ch, qualifyOp(l), qualifyOp(r))
        case BoundOperand.BCast(x, t)    => qualifyOp(x).cast(t.spark)
        case BoundOperand.BTryCast(x, t) => qualifyOp(x).try_cast(t.spark)
        case other                       => aggScopeOperand(other)
      }
      // subquery-bearing QUALIFY over an aggregated query: the
      // post-aggregation marker machinery, registered NOW (probe
      // aggregates become hidden agg columns before the agg assembles),
      // frames joined onto the WINDOWED frame below
      // the predicate lowers EAGERLY too — probe aggregates reached only
      // through plain conjuncts (sum(v) * 2 > (SELECT …)) must register
      // their hidden agg columns before the agg assembles, exactly like
      // the HAVING mixed-conjunct plans
      val qualifyMarkers: Option[(MarkerScope, Column)] = q.qualify.collect {
        case qe if BoundExpr.containsSub(qe) =>
          val ms = new MarkerScope(spark, source, "qla",
            bc => col(groupOut(bc)), qualifyOp)
          ms.register(qe)
          (ms, ms.pred(qe))
      }
      val qualifyFilter: Option[Column] = q.qualify.collect {
        case qe if !BoundExpr.containsSub(qe) => lowerExprWith(qe, qualifyOp)
      }
      // ordered aggregate (string_agg ORDER BY): collect (keys, value)
      // pairs — NULL values skipped like SQL — sort the group's array
      // once (struct comparison = lexicographic by key position), then
      // join. The group buffers exactly once, the same cost any engine
      // pays for an ordered string aggregate.
      def orderedAggCol(arg: BoundOperand, sep: String,
          ord: Seq[(BoundOperand, Boolean)]): Column = {
        val v = lowerOperandWith(arg, qcol)
        if (ord.isEmpty) string_agg(v, lit(sep))
        else {
          val pair = struct(ord.zipWithIndex.map { case ((k, _), i) =>
            lowerOperandWith(k, qcol).as(s"k$i") } :+ v.as("v"): _*)
          val sorted = array_sort(collect_list(when(v.isNotNull, pair)))
          val dir = if (ord.head._2) reverse(sorted) else sorted
          array_join(transform(dir, x => x.getField("v")), sep)
        }
      }
      def aggNodeCol(node: BoundOperand): Column = node match {
        case BoundOperand.BAgg(f, arg, dist) => aggCol(f, arg, dist)
        // the value at the key's extremum: Spark's min_by/max_by — one
        // (value, key) pair of aggregate state per group
        // DuckDB's arg_min/arg_max SKIP rows whose VALUE is NULL
        // (probed); Spark's min_by/max_by would return the NULL — a
        // NULLed key takes such rows out of the extremum competition.
        // The _null variants keep them (plain min_by/max_by).
        case BoundOperand.BOrderedAgg("arg_min", arg, _, Seq((k, _))) =>
          val v = lowerOperandWith(arg, qcol)
          min_by(v, when(v.isNotNull, lowerOperandWith(k, qcol)))
        case BoundOperand.BOrderedAgg("arg_max", arg, _, Seq((k, _))) =>
          val v = lowerOperandWith(arg, qcol)
          max_by(v, when(v.isNotNull, lowerOperandWith(k, qcol)))
        case BoundOperand.BOrderedAgg("arg_min_null", arg, _, Seq((k, _))) =>
          min_by(lowerOperandWith(arg, qcol), lowerOperandWith(k, qcol))
        case BoundOperand.BOrderedAgg("arg_max_null", arg, _, Seq((k, _))) =>
          max_by(lowerOperandWith(arg, qcol), lowerOperandWith(k, qcol))
        // top-n list variants (DuckDB ≥1.1's min/max(x, n) and
        // arg_min/arg_max(x, v, n)): a LIST of the n extreme values /
        // the values at the n extreme keys, NULL inputs skipped. One
        // collect_list of aggregate state + a codegen'd sort/slice —
        // the same O(group) state class as the exact mad/median/
        // histogram aggregates (n is a small literal; a bounded-heap
        // Aggregator would cap state at O(n) per partial, the upgrade
        // path if top-n ever runs over very large groups).
        case BoundOperand.BOrderedAgg("min_topn", arg, sep, _) =>
          slice(array_sort(collect_list(lowerOperandWith(arg, qcol))),
            1, sep.toInt)
        case BoundOperand.BOrderedAgg("max_topn", arg, sep, _) =>
          slice(reverse(array_sort(collect_list(lowerOperandWith(arg, qcol)))),
            1, sep.toInt)
        case BoundOperand.BOrderedAgg("arg_min_topn", arg, sep, Seq((k, _))) =>
          val kc = lowerOperandWith(k, qcol)
          val pairs = collect_list(when(kc.isNotNull,
            struct(kc.as("k"), lowerOperandWith(arg, qcol).as("v"))))
          slice(transform(array_sort(pairs), x => x.getField("v")),
            1, sep.toInt)
        case BoundOperand.BOrderedAgg("arg_max_topn", arg, sep, Seq((k, _))) =>
          val kc = lowerOperandWith(k, qcol)
          val pairs = collect_list(when(kc.isNotNull,
            struct(kc.as("k"), lowerOperandWith(arg, qcol).as("v"))))
          slice(transform(reverse(array_sort(pairs)), x => x.getField("v")),
            1, sep.toInt)
        // bitstring_agg(x, lo, hi): a '0'/'1' string of length hi−lo+1
        // with bit (x − lo) set per group member, leftmost = lo (DuckDB
        // probed: (1,3,8) in [1,8] → '10100001'). One collect_set of
        // aggregate state + a codegen'd membership fold.
        case BoundOperand.BOrderedAgg("bitstring_agg", arg, sep, _) =>
          val Array(lo, hi) = sep.split(",").map(_.toLong)
          val got = collect_set(lowerOperandWith(arg, qcol).cast("long"))
          array_join(transform(sequence(lit(lo), lit(hi)), i =>
            when(array_contains(got, i), lit("1")).otherwise(lit("0"))), "")
        // count(DISTINCT a, b, …): Spark's native multi-column distinct
        // count — one distinct-aggregate over the tuple, rows with ANY
        // null component skipped (SQL semantics on both engines)
        case BoundOperand.BOrderedAgg("count_distinct", arg, _, ord) =>
          count_distinct(lowerOperandWith(arg, qcol),
            ord.map { case (k, _) => lowerOperandWith(k, qcol) }: _*)
        // approx_quantile/reservoir_quantile: Spark's approx_percentile
        // sketch (estimates are sketch-specific — no cross-engine
        // oracle; spec-bounded like the HLL gate); the literal fraction
        // rides the sep slot
        case BoundOperand.BOrderedAgg("approx_quantile", arg, q, Nil) =>
          approx_percentile(lowerOperandWith(arg, qcol),
            lit(q.toDouble), lit(10000))
        // two-argument statistical aggregates (value + key on the
        // OrderedAgg carrier); one pass of Spark's native agg state
        case BoundOperand.BOrderedAgg("corr", arg, _, Seq((k, _))) =>
          corr(lowerOperandWith(arg, qcol), lowerOperandWith(k, qcol))
        case BoundOperand.BOrderedAgg("covar_pop", arg, _, Seq((k, _))) =>
          covar_pop(lowerOperandWith(arg, qcol), lowerOperandWith(k, qcol))
        case BoundOperand.BOrderedAgg("covar_samp", arg, _, Seq((k, _))) =>
          covar_samp(lowerOperandWith(arg, qcol), lowerOperandWith(k, qcol))
        // linear-regression family: Spark's natives match DuckDB's
        // standard definitions exactly (probed all nine on shared data)
        case BoundOperand.BOrderedAgg(rf, arg, _, Seq((k, _)))
            if rf.startsWith("regr_") =>
          val (y, x) = (lowerOperandWith(arg, qcol), lowerOperandWith(k, qcol))
          rf match {
            case "regr_slope"     => regr_slope(y, x)
            case "regr_intercept" => regr_intercept(y, x)
            case "regr_r2"        => regr_r2(y, x)
            case "regr_count"     => regr_count(y, x)
            case "regr_avgx"      => regr_avgx(y, x)
            case "regr_avgy"      => regr_avgy(y, x)
            case "regr_sxx"       => regr_sxx(y, x)
            case "regr_sxy"       => regr_sxy(y, x)
            case _                => regr_syy(y, x)
          }
        // exact interpolated percentile (Spark's percentile == the
        // standard's percentile_cont; DESC was folded to 1-p at parse)
        case BoundOperand.BOrderedAgg("percentile_cont", arg, pstr, Seq()) =>
          call_function("percentile",
            lowerOperandWith(arg, qcol), lit(pstr.toDouble))
        // exact DISCRETE percentile — the smallest input value whose
        // cume_dist ≥ p (DuckDB's quantile_disc) — Catalyst's native
        // PercentileDisc aggregate through the bridge (Spark exposes it
        // as parser-only WITHIN GROUP syntax, no function wrapper); the
        // analyzer casts the double result back to the argument's type
        case BoundOperand.BOrderedAgg("percentile_disc", arg, pstr, Seq()) =>
          val (p, rev) = pstr.split('|') match {
            case Array(v, _) => (v.toDouble, true)
            case Array(v)    => (v.toDouble, false)
          }
          import org.apache.spark.sql.graftbridge.Bridge
          Bridge.column(
            org.apache.spark.sql.catalyst.expressions.aggregate
              .PercentileDisc(
                Bridge.expression(lowerOperandWith(arg, qcol)),
                org.apache.spark.sql.catalyst.expressions.Literal(p),
                reverse = rev)
              .toAggregateExpression())
        // array_agg(v ORDER BY k…): the string_agg collect-sort shape
        // minus the join — NULL values KEPT (DuckDB keeps them; only
        // string_agg skips), one group buffer, sorted once. NULL *keys*
        // sort first ascending (Spark struct ordering) — DuckDB puts
        // them last; avoid null ordering keys where parity matters.
        case BoundOperand.BOrderedAgg("array_agg", arg, _, ord) =>
          val v = lowerOperandWith(arg, qcol)
          val pair = struct(ord.zipWithIndex.map { case ((k, _), i) =>
            lowerOperandWith(k, qcol).as(s"k$i") } :+ v.as("v"): _*)
          val sorted = array_sort(collect_list(pair))
          val dir = if (ord.head._2) reverse(sorted) else sorted
          transform(dir, x => x.getField("v"))
        // DISTINCT forms: dedup the collected group before the one sort
        // (the analyzer pinned ORDER BY to the value, so dedup-then-sort
        // is well-defined); struct wrapper keeps NULL values collectable
        case BoundOperand.BOrderedAgg("array_agg_distinct", arg, _, ord) =>
          val v = lowerOperandWith(arg, qcol)
          val sorted = array_sort(array_distinct(
            collect_list(struct(v.as("v")))))
          val dir = if (ord.head._2) reverse(sorted) else sorted
          transform(dir, x => x.getField("v"))
        case BoundOperand.BOrderedAgg("string_agg_distinct", arg, sep, ord) =>
          val v = lowerOperandWith(arg, qcol)
          val sorted = array_sort(array_distinct(
            collect_list(when(v.isNotNull, struct(v.as("v"))))))
          val dir = if (ord.head._2) reverse(sorted) else sorted
          array_join(transform(dir, x => x.getField("v")), sep)
        // LIST-of-fractions percentiles: one sort state, a list result.
        // cont: Spark's exact percentile takes an array of percentages
        // natively; disc: one native PercentileDisc per fraction over
        // the same column, assembled with array() — Spark fuses the
        // aggregate states into one pass
        case BoundOperand.BOrderedAgg("percentile_cont_list", arg, ps, Seq()) =>
          call_function("percentile", lowerOperandWith(arg, qcol),
            array(ps.split(',').toSeq.map(s => lit(s.toDouble)): _*))
        case BoundOperand.BOrderedAgg("percentile_disc_list", arg, ps, Seq()) =>
          import org.apache.spark.sql.graftbridge.Bridge
          val c = lowerOperandWith(arg, qcol)
          array(ps.split(',').toSeq.map { s =>
            Bridge.column(
              org.apache.spark.sql.catalyst.expressions.aggregate
                .PercentileDisc(Bridge.expression(c),
                  org.apache.spark.sql.catalyst.expressions.Literal(s.toDouble),
                  reverse = false)
                .toAggregateExpression())
          }: _*)
        case BoundOperand.BOrderedAgg(_, arg, sep, ord) =>
          orderedAggCol(arg, sep, ord)
        case other => sys.error(s"unreachable hidden aggregate $other")
      }
      val hiddenExprs = havingAggs.map { case (node, name) =>
        aggNodeCol(node).as(name) }
      val allAggs = aggExprs ++ hiddenExprs
      val keyCols = q.groupBy.map {
        case BoundGroupKey.GKCol(bc)     => qcol(bc).as(groupOut(bc))
        case BoundGroupKey.GKExpr(op, a) => lowerOperandWith(op, qcol).as(a)
      }
      val grouped0 = q.groupSpec match {
        case None =>
          if (allAggs.isEmpty) filtered0.select(keyCols: _*).distinct()
          else filtered0.groupBy(keyCols: _*).agg(allAggs.head, allAggs.tail: _*)
        // multi-dimensional grouping: one pass with Expand — subtotal rows
        // null their non-member keys, exactly SQL's semantics (the
        // analyzer guarantees at least one aggregate exists). The keys
        // group UNALIASED (an Alias inside Expand's projections breaks
        // the grouping-column match and nulls every key) and the output
        // renames positionally: agg output order is keys then aggregates.
        case Some(spec) =>
          val rawKeys = q.groupBy.map {
            case BoundGroupKey.GKCol(bc)     => qcol(bc)
            case BoundGroupKey.GKExpr(op, _) => lowerOperandWith(op, qcol)
          }
          val keyNames = q.groupBy.map {
            case BoundGroupKey.GKCol(bc)     => groupOut(bc)
            case BoundGroupKey.GKExpr(_, a)  => a
          }
          val aggNames = aggItems.map { case (_, _, _, _, i) => aggName(i) } ++
            havingAggs.map(_._2)
          val g = spec match {
            case Ast.GroupingSpec.Rollup => filtered0.rollup(rawKeys: _*)
            case Ast.GroupingSpec.Cube   => filtered0.cube(rawKeys: _*)
            case Ast.GroupingSpec.Sets(sets) =>
              filtered0.groupingSets(sets.map(_.map(rawKeys)), rawKeys: _*)
          }
          val expanded = g.agg(allAggs.head, allAggs.tail: _*)
            .toDF(keyNames ++ aggNames: _*)
          // SQL's () grouping set is a GLOBAL aggregate: one row even
          // over EMPTY input (count family 0, grouping markers 1, other
          // aggregates NULL — DuckDB probed; round-13 fuzz caught the
          // gap). Spark's Expand emits no rows at all from an empty
          // input, so a literal grand-total row anti-joins in — it
          // survives only when the expanded result is empty. Aggregates
          // without a statically known empty-input value keep Spark's
          // behavior (none exist in the gate surface today).
          val hasEmptySet = spec match {
            case Ast.GroupingSpec.Rollup | Ast.GroupingSpec.Cube => true
            case Ast.GroupingSpec.Sets(sets) => sets.exists(_.isEmpty)
          }
          // The grand-total row's value per aggregate on EMPTY input.
          // Probed against DuckDB (round 14): EVERY aggregate yields
          // NULL over an empty set except the count family (0), the
          // synthesized grouping marker (1) and entropy (0.0) — so NULL
          // is the default and the exceptions are explicit. This covers
          // the ordered aggregates too (string_agg, quantile family,
          // histogram, arg_min/max: all NULL).
          def emptyColOf(f: String,
              dt: org.apache.spark.sql.types.DataType): Option[Column] =
            f match {
              case "count" | "count_distinct" | "approx_count_distinct" =>
                Some(lit(0L).cast(dt))
              case "grouping" => Some(lit(1).cast(dt))
              case "entropy"  => Some(lit(0.0).cast(dt))
              // NULL only for aggregates PROBED against DuckDB (r14);
              // an unprobed aggregate returns None → the patch row is
              // skipped entirely (fail-safe: Spark's empty-Expand
              // behavior, never a silently-wrong grand total — ADVICE
              // r14 flagged the unguarded NULL default)
              case "sum" | "avg" | "mean" | "min" | "max" | "stddev" |
                   "stddev_samp" | "stddev_pop" | "variance" | "var_samp" |
                   "var_pop" | "median" | "mode" | "string_agg" |
                   "group_concat" | "listagg" | "array_agg" | "list" |
                   "first" | "last" | "any_value" | "arg_min" | "arg_max" |
                   "min_by" | "max_by" | "bit_and" | "bit_or" | "bit_xor" |
                   "bool_and" | "bool_or" | "product" | "corr" |
                   "covar_pop" | "covar_samp" | "skewness" | "kurtosis" |
                   "mad" | "histogram" | "quantile" | "quantile_cont" |
                   "quantile_disc" | "approx_quantile" |
                   "reservoir_quantile" | "percentile_cont" |
                   "percentile_disc" | "percentile_cont_list" |
                   "percentile_disc_list" | "bitstring_agg" | "favg" |
                   "fsum" | "sumkahan" | "kahan_sum" | "geomean" |
                   "geometric_mean" =>
                Some(lit(null).cast(dt))
              case _ => None
            }
          val emptyFs: Seq[(String, String)] =
            aggItems.map { case (f, _, _, _, i) => aggName(i) -> f } ++
              havingAggs.map { case (node, n) => n -> (node match {
                case BoundOperand.BAgg(f, _, _)           => f
                case BoundOperand.BOrderedAgg(f, _, _, _) => f
                case _                                    => "?"
              }) }
          val patchable = emptyFs.map { case (n, f) =>
            emptyColOf(f, expanded.schema(n).dataType).map(n -> _) }
          if (!hasEmptySet || patchable.exists(_.isEmpty)) expanded
          else {
            val patchVals = patchable.flatten.toMap
            val patchRow = spark.range(1).select(
              keyNames.map(n =>
                lit(null).cast(expanded.schema(n).dataType).as(n)) ++
                aggNames.map(n => patchVals(n).as(n)): _*)
            expanded.unionByName(patchRow.join(
              expanded.limit(1).select(lit(1).as("__gx")),
              lit(true), "left_anti"))
          }
      }
      val grouped1 = havingCond.fold(grouped0)(grouped0.filter)
      val grouped2 = havingSubParts.zipWithIndex.foldLeft(grouped1) {
        case (acc, (HCmp(op, lc, ssub, guard, Seq()), i)) =>
          val subDf0 = lowerSelect(spark, ssub, source)
          if (guard) acc.filter(cmpCols(op, lc, guardedScalarLit(subDf0)))
          else {
            val name = s"__hs_$i"
            val subDf = subDf0.toDF(name)
            acc.join(broadcast(subDf), cmpCols(op, lc, col(name)), "inner").drop(name)
          }
        case (acc, (HCmp(op, lc, ssub, _, pairs), i)) =>
          // correlated: the per-key aggregate left-joins on the GROUP BY
          // keys' post-aggregation columns (analyzer guarantees every
          // decorrelation key is a group key); left join + the count
          // coalesce preserve groups whose correlated set is empty
          val name = s"__hs_$i"
          val (subAgg, keyCond, scalar) =
            correlatedScalarAgg(spark, ssub, pairs, source, name, s"__hs${i}_c")
          acc.join(subAgg, keyCond(bc => col(groupOut(bc))), "left_outer")
            .filter(cmpCols(op, lc, scalar))
            .drop(name +: pairs.indices.map(k => s"__hs${i}_c$k"): _*)
        case (acc, (HExists(ssub, pairs, neg), i)) =>
          val joinType = if (neg) "left_anti" else "left_semi"
          if (pairs.isEmpty) {
            // emptiness of the whole subquery decides for every group
            val subDf = lowerSelect(spark, ssub, source).limit(1)
            acc.join(broadcast(subDf), lit(true), joinType)
          } else {
            // correlated on group keys: semi/anti join the subquery's
            // key columns against the grouped output columns
            val core = combine(spark, ssub, source, Set.empty, None)
            val subDf = core.select(pairs.zipWithIndex.map {
              case ((_, ic), k) => qcolSub(ic).as(s"__he${i}_$k") }: _*)
            val cond = pairs.zipWithIndex.map { case ((oc, _), k) =>
              col(groupOut(oc)) === subDf(s"__he${i}_$k") }.reduce(_ && _)
            acc.join(subDf, cond, joinType)
          }
        case (acc, (HIn(lc, ssub, pairs, neg), i)) =>
          val joinType = if (neg) "left_anti" else "left_semi"
          if (pairs.isEmpty) {
            val subDf = lowerSelect(spark, ssub, source)
            val vcol = subDf.columns.head
            if (neg) {
              // null-aware NOT IN after aggregation — same 1-row facts +
              // hash anti join as the WHERE-scope lowering
              val facts = subDf.agg(count(lit(1)).as("__hnin_n"),
                count(col(vcol)).as("__hnin_nonnull"))
              acc.join(broadcast(facts), lit(true), "inner")
                .filter(col("__hnin_n") === 0 ||
                  (lc.isNotNull && col("__hnin_n") === col("__hnin_nonnull")))
                .drop("__hnin_n", "__hnin_nonnull")
                .join(subDf, lc === subDf(vcol), "left_anti")
            } else acc.join(subDf, lc === subDf(vcol), joinType)
          } else {
            val core = combine(spark, ssub, source, Set.empty, None)
            val inVal = ssub.projection.head match {
              case BoundItem.BICol(c, _)    => qcolSub(c)
              case BoundItem.BIExpr(op2, _) => lowerOperandWith(op2, qcolSub)
              case _ => sys.error(
                "unreachable: a correlated subquery must not aggregate or window")
            }
            val subDf = core.select(inVal.as(s"__hin${i}_v") +:
              pairs.zipWithIndex.map { case ((_, ic), k) =>
                qcolSub(ic).as(s"__hin${i}_$k") }: _*)
            val pairConds = pairs.zipWithIndex.map { case ((oc, _), k) =>
              col(groupOut(oc)) === subDf(s"__hin${i}_$k") }
            val valCond =
              if (neg) lc === subDf(s"__hin${i}_v") ||
                lc.isNull || subDf(s"__hin${i}_v").isNull
              else lc === subDf(s"__hin${i}_v")
            acc.join(subDf, (valCond +: pairConds).reduce(_ && _), joinType)
          }
      }
      // mixed HAVING conjuncts apply after the pure subquery joins: each
      // marker frame left-joins, the disjunction filters, markers drop
      val groupedM = havingMixedPlans.foldLeft(grouped2) {
        case (acc, (joins, pred, drops)) =>
          joins.foldLeft(acc) { case (df, (f, on)) => df.join(f, on, "left_outer") }
            .filter(pred).drop(drops: _*)
      }
      // projection marker frames left-join the aggregated (and HAVING-
      // filtered) frame — 1:1 by construction, marker columns die at the
      // final explicit projection
      val groupedPm = projMarkers.values.foldLeft(groupedM) { (acc, ms) =>
        ms.joins.foldLeft(acc) { case (df, (f, on)) =>
          df.join(f, on, "left_outer") }
      }
      // scalar-subquery operand frames join the aggregated result (their
      // columns die at the final explicit projection)
      val groupedSv = subValJoins.foldLeft(groupedPm)(
        (df, f) => df.join(f, lit(true), "left_outer"))
      // inequality-correlated scalar items: the union-merge running
      // aggregate runs against the GROUPED frame — the tag side is one
      // row per distinct (group keys, outer operand) value, so the sort
      // shuffle is group-cardinality-bounded, never a candidate fan-out
      val grouped = ineqItems.foldLeft(groupedSv) {
        case (acc, (i, sub, ps, iq, _)) =>
          val (joined, scalar) = correlatedRunningAgg(spark, acc, sub, ps,
            iq, source, s"__piq_$i", bc => col(groupOut(bc)))
          ineqScalarOf(i) = scalar
          joined
      }
      // window columns compute over the aggregated (and HAVING-filtered)
      // frame, BEFORE the final ORDER BY — the window's own exchange
      // must not disturb the result ordering
      val withWins = {
        // unpartitioned global-machinery windows over the grouped frame:
        // the shared-bucketing coordinator attaches their columns (ONE
        // range bucketing per distinct ORDER spec, shared across every
        // machinery class); operand Columns were lowered at collect
        // time, so hidden aggregates registered before the agg assembled
        val groupedG = attachGlobalWinGroups(spark, grouped,
          winGows ++ qwinGows, winGsws ++ qwinGsws, winGins ++ qwinGins,
          winGwxs ++ qwinGwxs, winGbss ++ qwinGbss, winGmas ++ qwinGmas,
          winGbis ++ qwinGbis)
        val windowed =
          if (winItems.isEmpty && qwinItems.isEmpty) groupedG
          else {
            val preRanked =
              if (winRanks.isEmpty) groupedG
              else groupedG.select(col("*") +: winRanks.toSeq.map {
                case (n, c) => c.as(n) }: _*)
            preRanked.select(col("*") +: (winItems ++ qwinItems).map {
              case (n, c) => c.as(n) }: _*)
              .drop(winRanks.toSeq.map(_._1): _*)
          }
        // global-agg windows: one 1-row aggregate over the grouped frame
        // (the same rows the windows see), broadcast cross-joined back —
        // no single-partition window exchange
        val globals = winGlobals ++ qwinGlobals
        if (globals.isEmpty) windowed
        else windowed.crossJoin(broadcast(grouped.agg(
          globals.head._2.as(globals.head._1),
          globals.tail.map { case (n, c) => c.as(n) }: _*)))
      }
      // QUALIFY filters the windowed aggregate result before
      // DISTINCT/ORDER BY (clause order); hidden window columns die at
      // the final projection. Subquery predicates left-join their marker
      // frames onto the windowed frame first (1:1), filter, then drop.
      val qualified = qualifyMarkers match {
        case Some((ms, predCol)) =>
          val joined = ms.joins.foldLeft(withWins) { case (d, (f, on)) =>
            d.join(f, on, "left_outer") }
          joined.filter(predCol).drop(ms.drops.toSeq: _*)
        case _ => qualifyFilter.fold(withWins)(withWins.filter)
      }
      // DISTINCT ON first-row selection: a row_number window on the ON
      // keys ordered by the (ON-key-led) query ORDER BY — Catalyst
      // plans the rn=1 filter as WindowGroupLimit, one row of state per
      // key (same shape as the row-scope path)
      val donned =
        if (q.distinctOn.isEmpty) qualified
        else {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(donCols: _*)
            .orderBy(orderCols.map { case (c, dir) => sortCol(c, dir) }: _*)
          qualified.withColumn("__don", row_number().over(w))
            .filter(col("__don") === 1).drop("__don")
        }
      // ORDER BY runs on the post-aggregation names BEFORE the final
      // projection, so an unprojected group key or aggregate can still
      // order the result
      val ordered = if (orderCols.isEmpty) donned else donned.orderBy(
        orderCols.map { case (c, dir) => sortCol(c, dir) }: _*)
      val projected = ordered.select(q.projection.zipWithIndex.map {
        case (BoundItem.BICol(bc, a), _) => col(groupOut(bc)).as(outName(bc, a))
        case (BoundItem.BIExpr(_, a), i) if ineqIdx(i) =>
          ineqScalarOf(i).as(a)
        case (_: BoundItem.BIExpr, i)    => exprCols(i)
        case (BoundItem.BIAgg(_, _, _, _), i) => col(aggName(i))
        case (BoundItem.BIWin(_, _, _, _, a, _), i) => col(s"__w_$i").as(a)
      }: _*)
      // SELECT DISTINCT over an aggregate result: a no-op unless the
      // projection drops group keys; apply it for correctness either way
      val deduped = if (q.distinct) projected.distinct() else projected
      applyOffsetLimit(deduped, q.offset, q.limit)
    }
  }

  /** One window item as a Column, under the caller's operand/column
    * resolution (qualified pre-aggregation names in the row-level branch,
    * grouped output names + hidden aggregate columns post-aggregation).
    * One shuffle on the partition keys; ordered windows keep Spark's
    * default running frame (SQL's RANGE UNBOUNDED PRECEDING), unordered
    * ones span the whole partition; an explicit ROWS/RANGE frame
    * overrides.
    */
  /** The synthetic order key a GROUPS frame ranges over: dense_rank of
    * the window's own order keys. Attached as a column BEFORE the
    * framed aggregate (a window spec cannot nest a window expression),
    * dropped right after; same partition keys → no extra exchange.
    */
  private def groupsRankColumn(parts: Seq[BoundOperand],
      ord: Seq[(BoundOperand, Ast.SortDir)],
      opLower: BoundOperand => Column, colOf: BoundCol => Column): Column =
    dense_rank().over(org.apache.spark.sql.expressions.Window
      .partitionBy(parts.map(opLower): _*)
      .orderBy(ord.map { case (op, dir) => sortCol(opLower(op), dir) }: _*))

  /** Is this an unpartitioned ORDERED window the distributed prefix
    * scan can compute — global ranks (`rank() OVER (ORDER BY …)`) and
    * running aggregates over a total order? Without the rewrite Spark
    * plans these as Exchange SinglePartition: every row through one
    * task. Eligible: ranking functions (row_number/rank/dense_rank/
    * percent_rank/cume_dist — frameless by analysis) and the
    * decomposable aggregates over PREFIX frames (default RANGE
    * UNBOUNDED PRECEDING..CURRENT ROW, or explicit UNBOUNDED..CURRENT),
    * with no DISTINCT / IGNORE NULLS sentinel, no GROUPS/EXCLUDE/
    * temporal frame (those keep their dedicated lowerings).
    */
  private def isGlobalOrderedWin(f: String, args: Seq[BoundOperand],
      parts: Seq[BoundOperand], ord: Seq[(BoundOperand, Ast.SortDir)],
      frame: Option[Ast.WinFrame]): Boolean =
    parts.isEmpty && ord.nonEmpty &&
      (Set("row_number", "rank", "dense_rank", "percent_rank",
        "cume_dist")(f) ||
        // ntile needs only the global row_number + grand total the scan
        // already computes (literal positive tile count — the dedicated
        // lowering requires the same shape)
        (f == "ntile" && (args.headOption match {
          case Some(BoundOperand.BLit(Lit.LitLong(n))) => n > 0
          case _                                       => false
        })) ||
        (Set("count", "sum", "avg", "min", "max")(f) &&
          frame.forall(fr => !fr.groups && fr.exclude == "none" &&
            !fr.temporal && fr.lo == Long.MinValue && fr.hi == 0L))) &&
      !args.exists {
        case BoundOperand.BLit(Lit.LitString(s)) => s.startsWith("__")
        case _ => false
      }

  /** Attach one ORDER-spec group of unpartitioned ordered windows as a
    * DISTRIBUTED PREFIX SCAN: range-partition by the order, evaluate
    * each window INSIDE its bucket (all buckets parallel), aggregate
    * one totals row per bucket, take the exclusive prefix of the totals
    * over bucket ids (≤ shuffle-partition-count rows — the only
    * single-partition step, and it is scale-free), broadcast the
    * offsets back and combine: ranks add the preceding-bucket row
    * count (dense_rank its distinct-key count — exact because the
    * range partitioner keeps equal keys in ONE bucket), count/sum
    * offsets add, min/max combine via null-skipping least/greatest,
    * avg decomposes into sum/count, percent_rank/cume_dist divide by
    * the broadcast grand total. Items: (output name, function, lowered
    * argument, frame).
    */
  private val gowTag = new java.util.concurrent.atomic.AtomicInteger

  /** Sub-plans recorded at materialization boundaries, for the
    * plan-audit sweep: a (local)checkpoint replaces its upstream plan
    * with a Scan ExistingRDD leaf, so everything above the boundary
    * would be invisible to PlanAudit's walk of the final executedPlan.
    * Enabled only by graft.tools.PlanAudit.
    */
  private[graft] object MaterializeAudit {
    @volatile var enabled = false
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[
      org.apache.spark.sql.execution.SparkPlan]
  }

  /** Materialize a frame exactly ONCE — the range bucketing that feeds
    * two consumers (in-bucket windows + per-bucket totals/edges, where
    * RangePartitioner's RDD-id-seeded boundary sampling must not run
    * twice) and the fixpoint accumulators whose lineage must truncate.
    *
    * Default: executor-local unreplicated blocks (localCheckpoint — the
    * single-box gate/bench shape; an executor loss fails the job).
    * With session conf `graft.reliableCheckpoint=true` the blocks go to
    * the fault-tolerant checkpoint directory instead (auto-created
    * under java.io.tmpdir if the context has none set — production
    * clusters point sparkContext.setCheckpointDir at HDFS/S3), so a
    * 1000-executor job survives executor loss by re-reading replicated
    * storage rather than failing the query. Identical values either
    * way — spec-pinned (LoweringSpec "reliable checkpoint").
    */
  private[sql] def materializeOnce(df: DataFrame,
      eager: Boolean = false): DataFrame = {
    if (MaterializeAudit.enabled)
      MaterializeAudit.plans.add(df.queryExecution.executedPlan)
    val spark = df.sparkSession
    // capStats: checkpoint leaves inherit the origin plan's ESTIMATED
    // stats; join estimates are products of child sizes, so fixpoint
    // loops (recursive CTEs) that chain materializations compound the
    // BigInt geometrically until the OPTIMIZER is the bottleneck
    // (measured in the CC operator: 77 s inside BigInteger.multiply).
    // The cap is the identity for every real statistic — broadcast
    // decisions from genuinely small frames are untouched.
    org.apache.spark.sql.graftbridge.Bridge.capStats(
      if (spark.conf.get("graft.reliableCheckpoint", "false").toBoolean) {
        if (spark.sparkContext.getCheckpointDir.isEmpty)
          spark.sparkContext.setCheckpointDir(java.nio.file.Files
            .createTempDirectory("graft-ckpt").toString)
        df.checkpoint(eager)
      } else df.localCheckpoint(eager))
  }

  /** Per-class requests for the global-window machinery — one ORDER
    * spec key (`ordKey`, the bound AST — groupable) plus the lowered
    * order columns and the class-specific payload. Built by both
    * lowering paths (plain projection and aggregate scope) and executed
    * together by attachGlobalWinGroups so every class of one ORDER spec
    * shares a single range bucketing.
    */
  private final case class GowReq(name: String, func: String,
      arg: Option[Column], ordKey: Seq[(BoundOperand, Ast.SortDir)],
      ordCols: Seq[(Column, Ast.SortDir)], frame: Option[Ast.WinFrame],
      /** DISTINCT running items: the first-occurrence mask to
        * pre-attach; the scan then aggregates the mask column.
        */
      mask: Option[Column] = None)
  private final case class GswReq(ghost: GhostWin,
      ordKey: Seq[(BoundOperand, Ast.SortDir)],
      ordCols: Seq[(Column, Ast.SortDir)])
  private final case class GinReq(name: String, func: String, x: Column,
      k: Int, dflt: Any, ordKey: Seq[(BoundOperand, Ast.SortDir)],
      ordCols: Seq[(Column, Ast.SortDir)])
  private final case class GwxReq(name: String, func: String,
      arg: Option[Column], frame: Ast.WinFrame,
      ordKey: Seq[(BoundOperand, Ast.SortDir)],
      ordCols: Seq[(Column, Ast.SortDir)])
  private final case class GbsReq(name: String, func: String, x: Column,
      k: Int, dflt: Any, ordKey: Seq[(BoundOperand, Ast.SortDir)],
      ordCols: Seq[(Column, Ast.SortDir)])
  private final case class GmaReq(name: String, func: String, mask: Column,
      h: Int, ordKey: Seq[(BoundOperand, Ast.SortDir)],
      ordCols: Seq[(Column, Ast.SortDir)])
  private final case class GbiReq(name: String, func: String, x: Column,
      k: Int, dflt: Any, ordKey: Seq[(BoundOperand, Ast.SortDir)],
      ordCols: Seq[(Column, Ast.SortDir)])

  /** Attach EVERY global-window machinery class over ONE shared range
    * bucketing per distinct ORDER spec (guide §2.4 — operations keyed
    * the same way share one exchange). Before round 16 each class
    * re-bucketed the frame separately — range-boundary sampling pass +
    * full range shuffle + checkpoint per class; q_dialect_win_global_rest
    * paid 4 bucketings of the same input, i.e. 3 redundant full-data
    * range shuffles at 100 TB. The coordinator attaches the order keys
    * and the DISTINCT first-occurrence masks (value-partitioned windows
    * — they must precede the range shuffle so the shuffle carries one
    * bit, not the recomputation), buckets ONCE, hands every class the
    * same materialized bucketing, and drops the shared scratch at the
    * end. Reversed consumers (big IGNORE-NULLS leads) read the same
    * bucketing backwards instead of re-bucketing by the reversed spec.
    */
  private def attachGlobalWinGroups(spark: SparkSession, df0: DataFrame,
      gows: Seq[GowReq], gsws: Seq[GswReq], gins: Seq[GinReq],
      gwxs: Seq[GwxReq], gbss: Seq[GbsReq], gmas: Seq[GmaReq],
      gbis: Seq[GbiReq]): DataFrame = {
    val keys: Seq[Seq[(BoundOperand, Ast.SortDir)]] =
      (gows.map(_.ordKey) ++ gsws.map(_.ordKey) ++ gins.map(_.ordKey) ++
        gwxs.map(_.ordKey) ++ gbss.map(_.ordKey) ++ gmas.map(_.ordKey) ++
        gbis.map(_.ordKey)).distinct
    keys.foldLeft(df0) { (d0, key) =>
      val ko = gows.filter(_.ordKey == key)
      val ks = gsws.filter(_.ordKey == key)
      val ki = gins.filter(_.ordKey == key)
      val kx = gwxs.filter(_.ordKey == key)
      val kb = gbss.filter(_.ordKey == key)
      val km = gmas.filter(_.ordKey == key)
      val kj = gbis.filter(_.ordKey == key)
      val ordCols: Seq[(Column, Ast.SortDir)] =
        (ko.map(_.ordCols) ++ ks.map(_.ordCols) ++ ki.map(_.ordCols) ++
          kx.map(_.ordCols) ++ kb.map(_.ordCols) ++ km.map(_.ordCols) ++
          kj.map(_.ordCols)).head
      val tag = s"__gsh${gowTag.incrementAndGet()}"
      val pidN = s"${tag}_pid"
      val ordNames = ordCols.indices.map(i => s"${tag}_o$i")
      val gowMasks: Seq[(String, Column)] = ko.flatMap(g =>
        g.mask.map(m => s"__gdm_${g.name}" -> m))
      val gmaMasks: Seq[(String, Column)] = km.zipWithIndex.map {
        case (g, i) => s"${tag}_gm$i" -> g.mask }
      // big-shift / big-IGNORE-NULLS argument columns ride the shared
      // bucketing too (their self-joins read them from the shared
      // materialized frame)
      val gbsX = kb.indices.map(i => s"${tag}_bx$i")
      val gbiX = kj.indices.map(i => s"${tag}_ix$i")
      val gbiC = kj.indices.map(i => s"${tag}_ic$i")
      val rnN = s"${tag}_rn"
      val withOrd = d0.select(col("*") +:
        (ordCols.zipWithIndex.map { case ((c, _), i) =>
          c.as(ordNames(i)) } ++
          (gowMasks ++ gmaMasks).map { case (n, c) => c.as(n) } ++
          kb.zipWithIndex.map { case (g, i) => g.x.as(gbsX(i)) } ++
          kj.zipWithIndex.map { case (g, i) => g.x.as(gbiX(i)) }): _*)
      val ordE = ordCols.zipWithIndex.map { case ((_, dir), i) =>
        sortCol(col(ordNames(i)), dir) }
      val nParts = spark.sessionState.conf.numShufflePartitions
      // ONE materialization per ORDER spec: every class's in-bucket
      // windows, per-bucket totals, ghost/candidate extraction and
      // self-joins must see the SAME bucketing (RangePartitioner seeds
      // its boundary sampling by RDD id, so two independent evaluations
      // can place boundaries differently)
      val bucketed = materializeOnce(withOrd
        .repartitionByRange(nParts, ordE: _*)
        .withColumn(pidN, spark_partition_id()))
      val bk = BucketCols(pidN, ordNames, ordCols.map(_._2))
      var f = bucketed
      // ONE forward prefix-scan invocation: the user's ordered windows,
      // the big shifts' global row number and the big-IGNORE-NULLS
      // lags' non-null ranks all share its per-bucket totals and
      // broadcast offsets; lead ranks ride ONE reversed invocation over
      // the same bucketing
      val rowsPrefix = Ast.WinFrame(range = false,
        lo = Long.MinValue, hi = 0L)
      val kjIdx = kj.zipWithIndex
      val kjLag = kjIdx.filter(_._1.func == "lag")
      val kjLead = kjIdx.filter(_._1.func == "lead")
      val fwdItems: Seq[(String, String, Option[Column],
          Option[Ast.WinFrame])] =
        ko.map { g =>
          (g.name, g.func,
            g.mask.map(_ => col(s"__gdm_${g.name}")).orElse(g.arg),
            g.frame)
        } ++
          (if (kb.nonEmpty)
            Seq((rnN, "row_number", None: Option[Column],
              None: Option[Ast.WinFrame])) else Nil) ++
          kjLag.map { case (_, i) =>
            (gbiC(i), "count", Some(col(gbiX(i))): Option[Column],
              Some(rowsPrefix): Option[Ast.WinFrame]) }
      if (fwdItems.nonEmpty)
        f = attachGlobalOrderedWins(spark, f, bk, fwdItems)
      if (kjLead.nonEmpty)
        f = attachGlobalOrderedWins(spark, f, bk,
          kjLead.map { case (_, i) =>
            (gbiC(i), "count", Some(col(gbiX(i))): Option[Column],
              Some(rowsPrefix): Option[Ast.WinFrame]) }, reversed = true)
      if (kb.nonEmpty || kj.nonEmpty) {
        // ONE materialization serves every self-join: ranks/row numbers
        // must read identically on both join sides (in-bucket ties)
        val mat = materializeOnce(f)
        f = mat
        if (kb.nonEmpty)
          f = bigShiftJoins(mat, f, rnN, gbsX,
            kb.map(g => (g.name, g.func, g.x, g.k, g.dflt)))
        if (kj.nonEmpty)
          f = bigInShiftJoins(mat, f, gbiX, gbiC,
            kj.map(g => (g.name, g.func, g.x, g.k, g.dflt)))
      }
      if (ks.nonEmpty)
        f = attachGlobalShiftWins(spark, f, bk, ks.map(_.ghost))
      if (ki.nonEmpty)
        f = attachGlobalIgnoreNullsShifts(spark, f, bk,
          ki.map(g => (g.name, g.func, g.x, g.k, g.dflt)))
      if (kx.nonEmpty)
        f = attachGlobalWholeExWins(spark, f, bk,
          kx.map(g => (g.name, g.func, g.arg, g.frame)))
      if (km.nonEmpty)
        f = attachGlobalMaskAheadWins(spark, f, bk,
          km.zipWithIndex.map { case (g, i) =>
            (g.name, g.func, col(s"${tag}_gm$i"), g.h) })
      f.drop((pidN +: ordNames) ++
        gowMasks.map(_._1) ++ gmaMasks.map(_._1) ++
        gbsX ++ gbiX ++ gbiC ++ (if (kb.nonEmpty) Seq(rnN) else Nil): _*)
    }
  }

  /** The SHARED range bucketing's column handles: one bucketing per
    * distinct ORDER spec, reused by every global-window machinery class
    * of that spec (guide §2.4 — operations keyed the same way share one
    * exchange). The frame a class receives already carries the bucket
    * id (`pidN` — spark_partition_id materialized at checkpoint time,
    * so the row→bucket mapping is frozen no matter how later operators
    * move rows physically) and the named order-key columns.
    */
  private final case class BucketCols(pidN: String, ordNames: Seq[String],
      dirs: Seq[Ast.SortDir]) {
    def ordE: Seq[Column] = ordNames.zip(dirs).map { case (n, d) =>
      sortCol(col(n), d) }
    /** Exact complement of the bucketing order: flips direction AND
      * null placement (sortCol places None-nulls LAST in both
      * directions, so the complement needs an explicit NULLS FIRST).
      * Reversed consumers (big IGNORE-NULLS leads) read the SAME
      * bucketing backwards — reversed in-bucket order + descending
      * bucket-id offsets — instead of re-bucketing by the reversed
      * spec.
      */
    def ordRevExact: Seq[Column] = ordNames.zip(dirs).map { case (n, d) =>
      sortCol(col(n),
        Ast.SortDir(!d.desc, Some(!d.nullsFirst.getOrElse(false)))) }
  }

  private def attachGlobalOrderedWins(spark: SparkSession, df0: DataFrame,
      bk: BucketCols,
      items: Seq[(String, String, Option[Column], Option[Ast.WinFrame])],
      reversed: Boolean = false)
      : DataFrame = {
    val tag = s"__gow${gowTag.incrementAndGet()}"
    val pidN = bk.pidN
    val ordNames = bk.ordNames
    val bucketed = df0
    val ordE = if (reversed) bk.ordRevExact else bk.ordE
    // default window frame over an ordered spec IS the RANGE prefix
    // (peers included) — identical to the unpartitioned default
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col(pidN)).orderBy(ordE: _*)
    val wRows = wIn.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0L)
    // exclusive prefix over the per-bucket totals: bucket ids ascend in
    // the bucketing's own order, so a REVERSED consumer takes them
    // descending
    val wPre = org.apache.spark.sql.expressions.Window
      .orderBy(if (reversed) col(pidN).desc else col(pidN).asc)
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, -1L)
    val wAll = org.apache.spark.sql.expressions.Window
      .orderBy(col(pidN).asc)
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val needCnt = items.exists(it => Set("row_number", "rank",
      "percent_rank", "cume_dist", "ntile")(it._2))
    val needDk = items.exists(_._2 == "dense_rank")
    val needN = items.exists(it => Set("percent_rank", "cume_dist",
      "ntile")(it._2))
    def rowsFrame(fr: Option[Ast.WinFrame]) = fr.exists(f => !f.range)
    // (in-bucket cols, per-bucket totals, prefix offsets, final combiner)
    val parts4: Seq[(Seq[Column], Seq[Column], Seq[Column], Column)] =
      items.zipWithIndex.map { case ((_, f, arg, frame), j) =>
        def inN(c: String) = s"${tag}_in${j}_$c"
        def totN(c: String) = s"${tag}_t${j}_$c"
        def offN(c: String) = s"${tag}_f${j}_$c"
        val offCnt = coalesce(col(s"${tag}_offcnt"), lit(0L))
        lazy val nTot = col(s"${tag}_ntot")
        f match {
          case "row_number" | "rank" =>
            val rk = if (f == "rank") rank() else row_number()
            (Seq(rk.over(wIn).cast("long").as(inN("r"))), Nil, Nil,
              col(inN("r")) + offCnt)
          case "dense_rank" =>
            (Seq(dense_rank().over(wIn).cast("long").as(inN("r"))), Nil, Nil,
              col(inN("r")) + coalesce(col(s"${tag}_offdk"), lit(0L)))
          case "percent_rank" =>
            (Seq(rank().over(wIn).cast("long").as(inN("r"))), Nil, Nil,
              when(nTot === 1L, lit(0.0)).otherwise(
                (col(inN("r")) + offCnt - 1L).cast("double") / (nTot - 1L)))
          case "cume_dist" =>
            (Seq(count(lit(1)).over(wIn).cast("long").as(inN("c"))), Nil, Nil,
              (col(inN("c")) + offCnt).cast("double") / nTot)
          case "ntile" =>
            // tile count n, grand total N: r = N % n oversized tiles of
            // q+1 rows (q = N div n), then n-r tiles of q rows — Spark's
            // NTile semantics from the broadcast N and the global
            // row_number alone. Integral floor-division goes through
            // decimal so it stays exact past 2^53 rows; the q=0 branch
            // (N < n → every row in an oversized tile) never reaches the
            // otherwise-divisor, which is guarded anyway (ANSI mode).
            val n = arg.get.cast("long")
            def ldiv(a: Column, b: Column): Column =
              ((a - a % b).cast("decimal(38,0)") / b).cast("long")
            (Seq(row_number().over(wIn).cast("long").as(inN("r"))), Nil, Nil, {
              val rn = col(inN("r")) + offCnt
              val r = nTot % n
              val q = ldiv(nTot, n)
              val cut = r * (q + 1L)
              when(rn <= cut, ldiv(rn - 1L, q + 1L) + 1L)
                .otherwise(r + ldiv(rn - cut - 1L,
                  greatest(q, lit(1L))) + 1L)
                .cast("int")
            })
          case "count" =>
            val a = arg.getOrElse(lit(1))
            val w = if (rowsFrame(frame)) wRows else wIn
            (Seq(count(a).over(w).as(inN("c"))),
              Seq(count(a).as(totN("c"))),
              Seq(sum(col(totN("c"))).over(wPre).as(offN("c"))),
              coalesce(col(offN("c")), lit(0L)) + col(inN("c")))
          case "sum" =>
            val w = if (rowsFrame(frame)) wRows else wIn
            (Seq(sum(arg.get).over(w).as(inN("s"))),
              Seq(sum(arg.get).as(totN("s"))),
              Seq(sum(col(totN("s"))).over(wPre).as(offN("s"))),
              coalesce(col(offN("s")) + col(inN("s")),
                col(offN("s")), col(inN("s"))))
          case "min" =>
            val w = if (rowsFrame(frame)) wRows else wIn
            (Seq(min(arg.get).over(w).as(inN("m"))),
              Seq(min(arg.get).as(totN("m"))),
              Seq(min(col(totN("m"))).over(wPre).as(offN("m"))),
              least(col(offN("m")), col(inN("m"))))
          case "max" =>
            val w = if (rowsFrame(frame)) wRows else wIn
            (Seq(max(arg.get).over(w).as(inN("m"))),
              Seq(max(arg.get).as(totN("m"))),
              Seq(max(col(totN("m"))).over(wPre).as(offN("m"))),
              greatest(col(offN("m")), col(inN("m"))))
          case "avg" =>
            val w = if (rowsFrame(frame)) wRows else wIn
            (Seq(sum(arg.get).over(w).as(inN("s")),
              count(arg.get).over(w).as(inN("c"))),
              Seq(sum(arg.get).as(totN("s")), count(arg.get).as(totN("c"))),
              Seq(sum(col(totN("s"))).over(wPre).as(offN("s")),
                sum(col(totN("c"))).over(wPre).as(offN("c"))),
              {
                val cnt = coalesce(col(offN("c")), lit(0L)) + col(inN("c"))
                val sm = coalesce(col(offN("s")) + col(inN("s")),
                  col(offN("s")), col(inN("s")))
                when(cnt === 0L, lit(null)).otherwise(sm.cast("double") / cnt)
              })
          case other => sys.error(s"unreachable global ordered window $other")
        }
      }
    val withIn = bucketed.select(col("*") +: parts4.flatMap(_._1): _*)
    // every item class contributes at least one total (ranks need cnt,
    // dense_rank dk, aggregates their own), so totAggs is never empty
    val totAggs =
      (if (needCnt || needN) Seq(count(lit(1)).as(s"${tag}_cnt")) else Nil) ++
        (if (needDk) Seq(count_distinct(
          struct(ordNames.map(col): _*)).as(s"${tag}_dk")) else Nil) ++
        parts4.flatMap(_._2)
    val totals = bucketed.groupBy(col(pidN))
      .agg(totAggs.head, totAggs.tail: _*)
    val offCols =
      (if (needCnt || needN)
        Seq(sum(col(s"${tag}_cnt")).over(wPre).as(s"${tag}_offcnt")) else Nil) ++
        (if (needN)
          Seq(sum(col(s"${tag}_cnt")).over(wAll).as(s"${tag}_ntot")) else Nil) ++
        (if (needDk)
          Seq(sum(col(s"${tag}_dk")).over(wPre).as(s"${tag}_offdk")) else Nil) ++
        parts4.flatMap(_._3)
    val offsets = totals.select(col(pidN) +: offCols: _*)
    val joined = withIn.join(broadcast(offsets), Seq(pidN), "left_outer")
    val finals = items.zipWithIndex.map { case ((alias, _, _, _), j) =>
      parts4(j)._4.as(alias) }
    // the shared pid / order-key columns stay — the NEXT machinery
    // class of this ORDER spec reads the same bucketing; the
    // coordinator drops them once, at the end
    val dropNames =
      items.indices.flatMap(j => Seq("r", "c", "s", "m").map(c =>
        s"${tag}_in${j}_$c")) ++
      Seq(s"${tag}_offcnt", s"${tag}_ntot", s"${tag}_offdk") ++
      items.indices.flatMap(j => Seq("c", "s", "m").map(c =>
        s"${tag}_f${j}_$c"))
    joined.select(col("*") +: finals: _*).drop(dropNames: _*)
  }

  /** Is this an unpartitioned lag/lead the ghost-row prefix scan can
    * compute? Plain non-negative literal offsets only — IGNORE NULLS
    * needs unbounded lookback and takes the carry-array lowering
    * (attachGlobalIgnoreNullsShifts).
    */
  private def isGlobalShiftWin(f: String, args: Seq[BoundOperand],
      parts: Seq[BoundOperand], ord: Seq[(BoundOperand, Ast.SortDir)]): Boolean =
    parts.isEmpty && ord.nonEmpty && (f == "lag" || f == "lead") &&
      !args.exists {
        case BoundOperand.BLit(Lit.LitString(s)) => s.startsWith("__")
        case _ => false
      } &&
      (args.lift(1) match {
        case None => true
        case Some(BoundOperand.BLit(Lit.LitLong(n))) => n >= 0 && n <= 1000
        case _ => false
      })

  /** Is this an unpartitioned decomposable aggregate — or a value
    * function (first_value/last_value/nth_value) — over a BOUNDED ROWS
    * frame (`sum(x) OVER (ORDER BY … ROWS BETWEEN 5 PRECEDING AND
    * CURRENT ROW)`)? The frame only reaches max(-lo, hi) rows away, so
    * the same ghost-row replication that serves lag/lead makes the
    * in-bucket frame exact: every global row within the halo of a real
    * row is a real-or-ghost row of its bucket, in global order. Halo
    * capped like lag's offset; RANGE value-distance frames have an
    * unbounded row halo and keep the dedicated lowering. Value functions
    * may carry IGNORE NULLS (it only ever reads rows INSIDE the bounded
    * frame, so the halo still covers the lookback — unlike lag/lead
    * IGNORE NULLS, whose lookback a NULL run makes unbounded); EXCLUDE
    * keeps the dedicated lowering for them (no prefix/suffix
    * decomposition exists for positional picks).
    */
  private def isGlobalBoundedRowsWin(f: String, args: Seq[BoundOperand],
      parts: Seq[BoundOperand], ord: Seq[(BoundOperand, Ast.SortDir)],
      frame: Option[Ast.WinFrame]): Boolean = {
    val ign = args.lastOption.contains(
      BoundOperand.BLit(Lit.LitString(Ast.IgnoreNullsSentinel)))
    val argsR = if (ign) args.dropRight(1) else args
    def noSentinel = !argsR.exists {
      case BoundOperand.BLit(Lit.LitString(s)) => s.startsWith("__")
      case _ => false
    }
    val dist = args.lastOption.contains(
      BoundOperand.BLit(Lit.LitString(Ast.DistinctSentinel)))
    parts.isEmpty && ord.nonEmpty &&
      frame.exists(fr => !fr.range && !fr.groups && !fr.temporal &&
        fr.lo != Long.MinValue && fr.hi != Long.MaxValue &&
        fr.lo >= -1000L && fr.hi <= 1000L && fr.lo <= fr.hi) &&
      ((Set("count", "sum", "avg", "min", "max")(f) && !ign && noSentinel) ||
        // DISTINCT aggregates: the dedicated per-frame collect_set fold
        // is frame-bounded state, so it rides the same ghosts (the set
        // only ever collects rows INSIDE the bounded frame)
        (dist && Set("count", "sum", "avg", "mean")(f) &&
          frame.exists(_.exclude == "none")) ||
        (Set("first_value", "last_value")(f) && noSentinel &&
          argsR.length == 1 && frame.exists(_.exclude == "none")) ||
        (f == "nth_value" && noSentinel && frame.exists(_.exclude == "none") &&
          (argsR.lift(1) match {
            case Some(BoundOperand.BLit(Lit.LitLong(n))) => n > 0
            case _                                       => false
          })))
  }

  /** lag/lead offset: optional second literal argument, default 1.
    * The ONE extraction shared by the ghost-row and dedicated window
    * lowerings (ADVICE r14 — two copies risked drifting apart).
    */
  private def shiftOffset(args: Seq[BoundOperand]): Int = args.lift(1) match {
    case Some(BoundOperand.BLit(Lit.LitLong(n))) => n.toInt
    case _ => 1
  }

  /** lag/lead default: optional third literal argument as a RAW value —
    * Spark's Lag/Lead coerce it to the input's type, so the output type
    * matches on both lowering paths. Every literal shape keeps its value
    * (date/timestamp/boolean included — Spark's Literal(Any) accepts the
    * java.sql carriers); only a non-literal default falls to NULL, and
    * the analyzer rejects those forms before lowering.
    */
  private def shiftDefaultAny(args: Seq[BoundOperand]): Any =
    args.lift(2) match {
      case Some(BoundOperand.BLit(l)) => l match {
        case Lit.LitLong(v)        => v
        case Lit.LitDouble(v)      => v
        case Lit.LitString(v)      => v
        case Lit.LitBool(v)        => v
        case Lit.LitDate(s)        => java.sql.Date.valueOf(s)
        case Lit.LitTimestamp(s)   => java.sql.Timestamp.valueOf(s)
        case Lit.LitTimestampTz(s) => java.sql.Timestamp.valueOf(s)
        case Lit.LitTime(s)        => java.time.LocalTime.parse(s)
        case Lit.LitNull           => null
      }
      case _ => null
    }

  /** One ghost-window item: the column builder receives the in-bucket
    * window spec (partitioned by bucket id, ordered by the global
    * order) and the in-bucket peer-partition keys (bucket id ++ order
    * key columns — for EXCLUDE's peer-group windows); kLag/kLead say
    * how many rows backward/forward its expression can reach — the halo
    * the ghost replication must cover.
    */
  private final case class GhostWin(alias: String, kLag: Int, kLead: Int,
      build: (org.apache.spark.sql.expressions.WindowSpec,
        Seq[Column]) => Column)

  /** Unpartitioned ROW-bounded windows over a total order — lag/lead
    * and aggregates over bounded ROWS frames — without the
    * single-partition window: range-bucket by the order, then give each
    * bucket GHOST ROWS — the last k rows of every EARLIER bucket (for
    * backward reach; the first k of every LATER bucket for forward), a
    * ≤ P·k-row frame replicated with a tiny theta join. Ghosts sort
    * ahead of (behind) every real row of their target bucket, so the
    * in-bucket expression lands on true global neighbors: the global
    * last-k of any prefix is always contained in the per-bucket last-k
    * union, and when the whole prefix is shorter than k the in-bucket
    * frame runs off the sequence start — exactly the global semantics
    * (shift defaults apply there; bounded frames truncate there). Ghost
    * rows are dropped after the windows evaluate.
    */
  /** GhostWin for one eligible item: lag/lead (isGlobalShiftWin) or an
    * aggregate over a bounded ROWS frame (isGlobalBoundedRowsWin).
    * Operands lower NOW through opLower (in aggregate scope that
    * registers hidden aggregates as a side effect — before the agg
    * assembles).
    */
  private def ghostWinOf(alias: String, f: String, args: Seq[BoundOperand],
      frame: Option[Ast.WinFrame],
      opLower: BoundOperand => Column): GhostWin =
    if (f == "lag" || f == "lead") {
      val x = opLower(args.head)
      val k = shiftOffset(args)
      val dflt = shiftDefaultAny(args)
      if (f == "lag") GhostWin(alias, k, 0, (w, _) => lag(x, k, dflt).over(w))
      else GhostWin(alias, 0, k, (w, _) => lead(x, k, dflt).over(w))
    } else if (args.lastOption.contains(
        BoundOperand.BLit(Lit.LitString(Ast.DistinctSentinel)))) {
      // DISTINCT aggregate over a bounded ROWS frame: the per-frame
      // collect_set fold of the dedicated lowering, run over the
      // ghosted in-bucket frame — identical column construction
      // (LONG/decimal/double fold seed by operand type), frame-bounded
      // set state
      val fr = frame.getOrElse(
        sys.error("unreachable: bounded ghost window without a frame"))
      val argsR = args.dropRight(1)
      val x = opLower(argsR.head)
      val zero = inputSqlType(argsR.head) match {
        case Some(SqlType.SqlBigInt | SqlType.SqlInt |
                  SqlType.SqlSmallInt) => lit(0L)
        case Some(SqlType.SqlDecimal(_, s)) => lit(0L).cast(s"decimal(38,$s)")
        case _ => lit(0d)
      }
      GhostWin(alias, math.max(0L, -fr.lo).toInt, math.max(0L, fr.hi).toInt,
        (w, _) => {
          val cs = collect_set(x).over(w.rowsBetween(fr.lo, fr.hi))
          f match {
            case "count" => size(cs).cast("long")
            case _ =>
              val s = org.apache.spark.sql.functions.aggregate(
                cs, zero, (a, v) => a + v)
              if (f == "sum") when(size(cs) > 0, s)
              else when(size(cs) > 0, s / size(cs))
          }
        })
    } else if (Set("first_value", "last_value", "nth_value")(f)) {
      // positional picks over a bounded ROWS frame: IGNORE NULLS only
      // ever reads rows INSIDE the frame, so the bounded halo covers it
      val ign = args.lastOption.contains(
        BoundOperand.BLit(Lit.LitString(Ast.IgnoreNullsSentinel)))
      val argsR = if (ign) args.dropRight(1) else args
      val fr = frame.getOrElse(
        sys.error("unreachable: bounded ghost window without a frame"))
      val x = opLower(argsR.head)
      val pick = f match {
        case "first_value" => first(x, ign)
        case "last_value"  => last(x, ign)
        case _ =>
          val n = argsR(1) match {
            case BoundOperand.BLit(Lit.LitLong(v)) => v.toInt
            case other => sys.error(s"unreachable nth_value offset $other")
          }
          nth_value(x, n, ign)
      }
      GhostWin(alias, math.max(0L, -fr.lo).toInt, math.max(0L, fr.hi).toInt,
        (w, _) => pick.over(w.rowsBetween(fr.lo, fr.hi)))
    } else {
      val fr = frame.getOrElse(
        sys.error("unreachable: bounded ghost window without a frame"))
      val cOpt = args.headOption.map(opLower)
      val agg = (f, cOpt) match {
        case ("count", None)    => count(lit(1))
        case ("count", Some(c)) => count(c)
        case ("sum", Some(c))   => sum(c)
        case ("avg", Some(c))   => avg(c)
        case ("min", Some(c))   => min(c)
        case ("max", Some(c))   => max(c)
        case other => sys.error(s"unreachable ghost aggregate $other")
      }
      val exclMode =
        if (fr.lo <= 0L && fr.hi >= 0L) fr.exclude else "none"
      GhostWin(alias, math.max(0L, -fr.lo).toInt, math.max(0L, fr.hi).toInt,
        (w1, peerKeys) =>
          if (exclMode == "none") agg.over(w1.rowsBetween(fr.lo, fr.hi))
          // EXCLUDE over the ghosted frame: peer groups partition by
          // (bucket id, order keys) — exact in-bucket, because equal
          // order keys land in ONE range bucket and ghosts never share
          // a key with their target bucket's real rows
          else exclusionCol(f, cOpt, fr, w1.rowsBetween(fr.lo, fr.hi),
            w1, peerKeys, exclMode))
    }

  private def attachGlobalShiftWins(spark: SparkSession, df0: DataFrame,
      bk: BucketCols,
      items: Seq[GhostWin]): DataFrame = {
    val tag = s"__gsw${gowTag.incrementAndGet()}"
    val pidN = bk.pidN
    val ghostN = s"${tag}_ghost"
    val ordNames = bk.ordNames
    val ordE = bk.ordE
    // the SHARED bucketing is already materialized — candidate
    // extraction and the shift windows read the same frozen buckets;
    // only the ghost marker is new (row-local, rides the lazy plan)
    val bucketed = df0.withColumn(ghostN, lit(false))
    val maxLag = items.map(_.kLag).foldLeft(0)(math.max)
    val maxLead = items.map(_.kLead).foldLeft(0)(math.max)
    val pids = bucketed.select(col(pidN).as(s"${tag}_tp")).distinct()
    // last-k per bucket (lag candidates): in-bucket row_number over the
    // REVERSED order; first-k per bucket (lead candidates): the order
    // itself. Reversal = flipping each key's direction AND null order.
    def revSort(c: Column, d: Ast.SortDir): Column = {
      val desc = !d.desc
      val nf = d.nullsFirst.map(!_)
      sortCol(c, Ast.SortDir(desc, nf))
    }
    val ordRev = bk.dirs.zipWithIndex.map { case (d, i) =>
      revSort(col(ordNames(i)), d) }
    val edgeN = s"${tag}_edge"
    def edgeRows(k: Int, tail: Boolean): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(pidN)).orderBy((if (tail) ordRev else ordE): _*)
      bucketed.withColumn(edgeN, row_number().over(w))
        .filter(col(edgeN) <= k).drop(edgeN)
    }
    // replicate candidates to every LATER (lag) / EARLIER (lead) bucket
    def replicated(k: Int, tail: Boolean): Option[DataFrame] =
      if (k == 0) None
      else Some(edgeRows(k, tail)
        // broadcast the ≤P-row bucket-id frame explicitly: its stats
        // descend from the materialized RDD scan (size unknown), so
        // without the hint the theta join can plan as CartesianProduct
        .join(broadcast(pids), if (tail) col(pidN) < col(s"${tag}_tp")
                               else col(pidN) > col(s"${tag}_tp"))
        .withColumn(pidN, col(s"${tag}_tp")).drop(s"${tag}_tp")
        .withColumn(ghostN, lit(true)))
    val unioned = Seq(replicated(maxLag, tail = true),
      replicated(maxLead, tail = false)).flatten
      .foldLeft(bucketed)(_ unionByName _)
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col(pidN)).orderBy(ordE: _*)
    // ghosts cover every cross-bucket neighbor, so the in-bucket
    // expression runs off the sequence EXACTLY at the global boundary —
    // shift defaults (coerced by Spark to the input's type) apply there
    // and only there; bounded frames truncate there; a neighbor whose
    // VALUE is NULL keeps NULL
    val shifted = unioned.select(col("*") +: items.map { it =>
      it.build(wIn, col(pidN) +: ordNames.map(col)).as(it.alias)
    }: _*)
    // pid / order keys stay for the next class of this ORDER spec
    shifted.filter(!col(ghostN)).drop(ghostN)
  }

  /** Is this an unpartitioned aggregate over a WHOLE-INPUT frame
    * (`ORDER BY … ROWS/RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED
    * FOLLOWING`) WITH frame exclusion? Without exclusion the order is
    * immaterial and isGlobalAggWin's broadcast rewrite applies; with
    * EXCLUDE the result varies per row but still decomposes into
    * scale-free pieces: global totals (broadcast) minus the row/peer
    * contribution for count/sum/avg, and for the non-subtractable
    * min/max a before-peers/after-peers split — in-bucket windows plus
    * exclusive prefix AND suffix offsets over the ≤P-row per-bucket
    * totals (the same machinery as the distributed prefix scan, run in
    * both directions). The analyzer has already restricted the surface:
    * EXCLUDE only on the five decomposable aggregates, GROUP/TIES only
    * on RANGE frames with ORDER BY, min/max EXCLUDE over RANGE only on
    * a single integral key (which the in-bucket rangeBetween windows
    * need too).
    */
  private def isGlobalWholeExWin(f: String, args: Seq[BoundOperand],
      parts: Seq[BoundOperand], ord: Seq[(BoundOperand, Ast.SortDir)],
      frame: Option[Ast.WinFrame]): Boolean =
    parts.isEmpty && ord.nonEmpty &&
      Set("count", "sum", "avg", "min", "max")(f) &&
      !args.exists {
        case BoundOperand.BLit(Lit.LitString(s)) => s.startsWith("__")
        case _ => false
      } &&
      frame.exists(fr => !fr.groups && !fr.temporal &&
        fr.lo == Long.MinValue && fr.hi == Long.MaxValue &&
        fr.exclude != "none") &&
      (!(Set("min", "max")(f) && frame.exists(_.range)) || ord.length == 1)

  /** Attach one ORDER-spec group of unpartitioned whole-input EXCLUDE
    * windows, distributed. Per item over the shared range bucketing:
    *
    *  - count/sum/avg: the global aggregate assembles from per-bucket
    *    totals (exclusive prefix + own + exclusive suffix — two ≤P-row
    *    windows over the totals frame), then the excluded contribution
    *    subtracts columnar exactly like exclusionCol: CURRENT ROW
    *    subtracts the row, GROUP the peer-group aggregate (an in-bucket
    *    window over bucket id + order keys — exact because equal keys
    *    land in one range bucket), TIES the peers minus the row; an
    *    all-excluded frame yields SQL NULL via the count guard.
    *  - min/max don't subtract — they split into before/after parts:
    *    in-bucket prefix/suffix windows (ROWS for row exclusion, RANGE
    *    for peer exclusion on the single integral key) combined with
    *    the earlier/later buckets' totals via null-skipping
    *    least/greatest; RANGE + EXCLUDE CURRENT ROW adds the
    *    peer-group-minus-self combine (in-bucket, ordered by the value
    *    — any total order covers all-but-self), TIES adds the row's own
    *    value back.
    *
    * Items: (output name, function, lowered argument, frame).
    */
  private def attachGlobalWholeExWins(spark: SparkSession, df0: DataFrame,
      bk: BucketCols,
      items: Seq[(String, String, Option[Column], Ast.WinFrame)])
      : DataFrame = {
    val tag = s"__gwx${gowTag.incrementAndGet()}"
    val pidN = bk.pidN
    val ordNames = bk.ordNames
    val ordE = bk.ordE
    val giN = s"${tag}_gi"
    val idxN = s"${tag}_ix"
    val wIn0 = org.apache.spark.sql.expressions.Window
      .partitionBy(col(pidN)).orderBy(ordE: _*)
    // min/max split into before/after parts, and BOTH directions must
    // be EXPANDING frames: Spark's (bounded-start, UnboundedFollowing)
    // frame recomputes the aggregate from scratch every time the lower
    // bound moves — O(bucket²); the scale probe measured the suffix
    // windows super-linear (α≈1.1, 65 s at sf1). So the bucketing
    // materializes an in-bucket PEER-GROUP index (dense_rank — for
    // RANGE peer exclusion; never NULL, unlike the value key, whose
    // NULL rows Spark's range frame collapses to the null peer group
    // even under an UNBOUNDED bound — fuzz probe caught the
    // divergence) and a unique ROW index (row_number — for ROWS row
    // exclusion), and the after-part runs as a PREFIX frame over the
    // REVERSED index: an exact complement (the index is unique/peer
    // -consistent, so ties cannot reshuffle between the two sorts),
    // incremental in both directions.
    val needGi = items.exists { case (_, f, _, fr) =>
      Set("min", "max")(f) && fr.range }
    val needIdx = items.exists { case (_, f, _, _) => Set("min", "max")(f) }
    // the shared bucketing is already materialized; the peer-group and
    // row indexes are deterministic in-bucket windows over the frozen
    // buckets, consumed only by the withIn subtree below — they ride
    // its lazy plan (per-bucket totals read df0 directly)
    val preGi =
      if (needGi) df0.withColumn(giN, dense_rank().over(wIn0))
      else df0
    val bucketed =
      if (needIdx) preGi.withColumn(idxN, row_number().over(wIn0))
      else preGi
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col(pidN)).orderBy(col(idxN).asc)
    val wInRev = org.apache.spark.sql.expressions.Window
      .partitionBy(col(pidN)).orderBy(col(idxN).desc)
    val wGi = org.apache.spark.sql.expressions.Window
      .partitionBy(col(pidN)).orderBy(col(giN).asc)
    val wGiRev = org.apache.spark.sql.expressions.Window
      .partitionBy(col(pidN)).orderBy(col(giN).desc)
    val peerKeys = col(pidN) +: ordNames.map(col)
    val wPeer = org.apache.spark.sql.expressions.Window
      .partitionBy(peerKeys: _*)
    val unb = org.apache.spark.sql.expressions.Window.unboundedPreceding
    val unf = org.apache.spark.sql.expressions.Window.unboundedFollowing
    val wPre = org.apache.spark.sql.expressions.Window
      .orderBy(col(pidN).asc).rowsBetween(unb, -1L)
    val wSuf = org.apache.spark.sql.expressions.Window
      .orderBy(col(pidN).asc).rowsBetween(1L, unf)
    def nz2(a: Column, b: Column): Column = coalesce(a + b, a, b)
    // (in-bucket cols, per-bucket totals, pre+suf offsets over totals,
    // final combiner)
    val parts4: Seq[(Seq[Column], Seq[Column], Seq[Column], Column)] =
      items.zipWithIndex.map { case ((_, f, cOpt, fr), j) =>
        def inN(c: String) = s"${tag}_in${j}_$c"
        def totN(c: String) = s"${tag}_t${j}_$c"
        def offN(c: String) = s"${tag}_f${j}_$c"
        val mode = fr.exclude
        val needPeerAgg = mode == "group" || mode == "ties"
        lazy val selfCnt = cOpt.fold(lit(1L))(_.isNotNull.cast("long"))
        def gCnt = coalesce(col(offN("pc")), lit(0L)) + col(totN("c")) +
          coalesce(col(offN("sc")), lit(0L))
        def gSum = nz2(nz2(col(offN("ps")), col(totN("s"))), col(offN("ss")))
        def cntTot = cOpt.fold(count(lit(1)))(count(_))
        def cntSub = mode match {
          case "current" => selfCnt
          case "group"   => col(inN("gc"))
          case _         => col(inN("gc")) - selfCnt // ties
        }
        def sumSub(x: Column) = mode match {
          case "current" => coalesce(x, lit(0))
          case "group"   => coalesce(col(inN("gs")), lit(0))
          case _         => coalesce(col(inN("gs")), lit(0)) -
            coalesce(x, lit(0)) // ties
        }
        f match {
          case "count" =>
            (if (needPeerAgg) Seq(cntTot.over(wPeer).as(inN("gc"))) else Nil,
              Seq(cntTot.as(totN("c"))),
              Seq(sum(col(totN("c"))).over(wPre).as(offN("pc")),
                sum(col(totN("c"))).over(wSuf).as(offN("sc"))),
              gCnt - cntSub)
          case "sum" | "avg" =>
            val x = cOpt.get
            val in = if (needPeerAgg)
              Seq(sum(x).over(wPeer).as(inN("gs")),
                count(x).over(wPeer).as(inN("gc"))) else Nil
            val excl = when(gCnt - cntSub === 0L, lit(null))
            ((in,
              Seq(sum(x).as(totN("s")), count(x).as(totN("c"))),
              Seq(sum(col(totN("s"))).over(wPre).as(offN("ps")),
                sum(col(totN("s"))).over(wSuf).as(offN("ss")),
                sum(col(totN("c"))).over(wPre).as(offN("pc")),
                sum(col(totN("c"))).over(wSuf).as(offN("sc"))),
              if (f == "sum") excl.otherwise(gSum - sumSub(x))
              else excl.otherwise((gSum - sumSub(x)) / (gCnt - cntSub))))
          case _ => // min | max
            val x = cOpt.get
            val isMin = f == "min"
            def agg(c: Column) = if (isMin) min(c) else max(c)
            def cmb(cs: Seq[Column]) =
              if (isMin) least(cs: _*) else greatest(cs: _*)
            val (wp, ws) =
              if (fr.range) (wGi.rangeBetween(unb, -1L),
                wGiRev.rangeBetween(unb, -1L))
              else (wIn.rowsBetween(unb, -1L), wInRev.rowsBetween(unb, -1L))
            // all-but-self within the peer group: prefix frames over
            // the unique row index in BOTH directions (any total order
            // covers all-but-self; the expanding shape keeps a
            // pathological giant peer group incremental too)
            val pes = if (fr.range && mode == "current") {
              val pwA = org.apache.spark.sql.expressions.Window
                .partitionBy(peerKeys: _*).orderBy(col(idxN).asc)
              val pwD = org.apache.spark.sql.expressions.Window
                .partitionBy(peerKeys: _*).orderBy(col(idxN).desc)
              Seq(cmb(Seq(agg(x).over(pwA.rowsBetween(unb, -1L)),
                agg(x).over(pwD.rowsBetween(unb, -1L)))).as(inN("e")))
            } else Nil
            val base = Seq(col(offN("p")), col(inN("p")),
              col(inN("s")), col(offN("s")))
            (Seq(agg(x).over(wp).as(inN("p")),
              agg(x).over(ws).as(inN("s"))) ++ pes,
              Seq(agg(x).as(totN("m"))),
              Seq(agg(col(totN("m"))).over(wPre).as(offN("p")),
                agg(col(totN("m"))).over(wSuf).as(offN("s"))),
              mode match {
                case "current" if fr.range => cmb(base :+ col(inN("e")))
                case "current" | "group"   => cmb(base)
                case _                     => cmb(base :+ x) // ties
              })
        }
      }
    val withIn = bucketed.select(col("*") +: parts4.flatMap(_._1): _*)
    val totAggs = parts4.flatMap(_._2)
    val totals = df0.groupBy(col(pidN)).agg(totAggs.head, totAggs.tail: _*)
    // offsets AND the own-bucket totals ride the same broadcast join
    val offsets = totals.select(
      col(pidN) +: (parts4.flatMap(_._3) ++
        totals.columns.filter(_ != pidN).map(col)): _*)
    val joined = withIn.join(broadcast(offsets), Seq(pidN), "left_outer")
    val finals = items.zipWithIndex.map { case ((alias, _, _, _), j) =>
      parts4(j)._4.as(alias) }
    val dropNames = Seq(giN, idxN) ++
      items.indices.flatMap(j =>
        Seq("gc", "gs", "p", "s", "e").map(c => s"${tag}_in${j}_$c") ++
          Seq("c", "s", "m").map(c => s"${tag}_t${j}_$c") ++
          Seq("pc", "sc", "ps", "ss", "p", "s").map(c => s"${tag}_f${j}_$c"))
    joined.select(col("*") +: finals: _*).drop(dropNames: _*)
  }

  /** Is this an unpartitioned lag/lead with a LARGE literal offset
    * (> 1000 — past the ghost-replication halo cap, where replicating
    * P·k edge rows stops being "tiny")? Computable at ANY offset as a
    * distributed equi-join: attach the global row number (the prefix
    * scan), then join each row with the row numbered rn∓k — a hash
    * join on a unique key, no replication, no single partition.
    * Plain shifts only (IGNORE NULLS needs the k-th non-null, not the
    * k-th row — its > 1000 offsets keep the dedicated lowering,
    * documented in SCALE.md).
    */
  private def isGlobalBigShiftWin(f: String, args: Seq[BoundOperand],
      parts: Seq[BoundOperand], ord: Seq[(BoundOperand, Ast.SortDir)]): Boolean =
    parts.isEmpty && ord.nonEmpty && (f == "lag" || f == "lead") &&
      !args.exists {
        case BoundOperand.BLit(Lit.LitString(s)) => s.startsWith("__")
        case _ => false
      } &&
      (args.lift(1) match {
        case Some(BoundOperand.BLit(Lit.LitLong(n))) => n > 1000
        case _ => false
      })

  /** Attach one ORDER-spec group of large-offset unpartitioned shifts:
    * global row number (distributed prefix scan, materialized once so
    * both join sides read the same bucketing-derived numbering), then
    * one compact equi-join per distinct (direction, offset) carrying
    * the shifted values plus a hit marker — a join miss is the true
    * global boundary where the default applies; a null VALUE at a hit
    * row stays null. Items: (name, lag|lead, lowered arg, offset,
    * default).
    */
  /** The self-join half of the large-offset shift lowering: `mat` is
    * the SHARED materialized frame carrying the global row number
    * (`rnN`) and the item argument columns (`xNames`) — one compact
    * equi-join per distinct (direction, offset), right side read from
    * `mat`, left side chained from `d` (which may already carry other
    * classes' outputs). rnN / xNames stay for the coordinator to drop.
    */
  private def bigShiftJoins(mat: DataFrame, d0: DataFrame, rnN: String,
      xNames: Seq[String],
      items: Seq[(String, String, Column, Int, Any)]): DataFrame = {
    val tag = s"__gbs${gowTag.incrementAndGet()}"
    val byShift = items.zipWithIndex.groupBy { case ((_, f, _, k, _), _) =>
      (f, k) }.toSeq.sortBy { case ((f, k), _) => (f, k) }
    val joined = byShift.foldLeft(d0) { case (d, ((f, k), its)) =>
      val jk = s"${tag}_jk_${f}_$k"
      val hit = s"${tag}_h_${f}_$k"
      val delta = if (f == "lag") k.toLong else -k.toLong
      val right = mat.select(
        (col(rnN) + delta).as(jk) +: lit(true).as(hit) +:
          its.map { case (_, i) => col(xNames(i)).as(s"${tag}_v$i") }: _*)
      d.join(right, col(rnN) === col(jk), "left_outer").drop(jk)
    }
    val finals = items.zipWithIndex.map { case ((alias, f, _, k, dflt), i) =>
      val vt = joined.schema(s"${tag}_v$i").dataType
      when(col(s"${tag}_h_${f}_$k").isNotNull, col(s"${tag}_v$i"))
        .otherwise(lit(dflt).cast(vt)).as(alias)
    }
    val dropNames = items.indices.map(i => s"${tag}_v$i") ++
      byShift.map { case ((f, k), _) => s"${tag}_h_${f}_$k" }
    joined.select(col("*") +: finals: _*).drop(dropNames: _*)
  }

  /** Is this an unpartitioned lag/lead IGNORE NULLS with a LARGE
    * literal offset (> 1000 — past the carry-array cap)? The k-th
    * non-null is a JOIN, not a window: the inclusive running count of
    * non-nulls (distributed prefix scan over an explicit ROWS frame)
    * ranks every non-null row uniquely, and row cur wants the non-null
    * ranked cPrev − k + 1, where cPrev is cur's inclusive count minus
    * its own non-null flag. Lead mirrors through the TRUE-reversed
    * order (direction and null placement both flip). A join miss is
    * the global boundary where the default applies.
    */
  private def isGlobalBigInShiftWin(f: String, args: Seq[BoundOperand],
      parts: Seq[BoundOperand], ord: Seq[(BoundOperand, Ast.SortDir)]): Boolean =
    parts.isEmpty && ord.nonEmpty && (f == "lag" || f == "lead") &&
      args.lastOption.contains(
        BoundOperand.BLit(Lit.LitString(Ast.IgnoreNullsSentinel))) &&
      (args.dropRight(1).lift(1) match {
        case Some(BoundOperand.BLit(Lit.LitLong(n))) => n > 1000
        case _ => false
      })

  /** Attach large-offset IGNORE NULLS shifts (see
    * isGlobalBigInShiftWin). Items: (name, lag|lead, lowered arg,
    * offset, default). One rank column per item over the shared
    * bucketing (forward order for lags, true-reversed for leads),
    * materialized once; one compact equi-join per item against its own
    * non-null rows keyed by their rank.
    */
  /** The self-join half of the large-offset IGNORE NULLS shift
    * lowering: `mat` is the SHARED materialized frame carrying each
    * item's argument column (`xNames`) and its non-null rank column
    * (`cNames` — forward running count for lags, reversed for leads,
    * both computed by the shared prefix-scan invocations). One compact
    * equi-join per item against its own non-null rows keyed by their
    * rank. xNames / cNames stay for the coordinator to drop.
    */
  private def bigInShiftJoins(mat: DataFrame, d0: DataFrame,
      xNames: Seq[String], cNames: Seq[String],
      items: Seq[(String, String, Column, Int, Any)]): DataFrame = {
    val tag = s"__gbi${gowTag.incrementAndGet()}"
    val joined = items.zipWithIndex.foldLeft(d0) {
      case (d, ((_, _, _, k, _), i)) =>
        val jk = s"${tag}_jk$i"
        val hit = s"${tag}_h$i"
        val cPrev = col(cNames(i)) - col(xNames(i)).isNotNull.cast("long")
        val right = mat.filter(col(xNames(i)).isNotNull)
          .select(col(cNames(i)).as(jk), lit(true).as(hit),
            col(xNames(i)).as(s"${tag}_v$i"))
        d.join(right, cPrev - (k - 1).toLong === col(jk), "left_outer")
          .drop(jk)
    }
    val finals = items.zipWithIndex.map { case ((alias, _, _, _, dflt), i) =>
      val vt = joined.schema(s"${tag}_v$i").dataType
      when(col(s"${tag}_h$i").isNotNull, col(s"${tag}_v$i"))
        .otherwise(lit(dflt).cast(vt)).as(alias)
    }
    val dropNames = items.indices.flatMap(i =>
      Seq(s"${tag}_v$i", s"${tag}_h$i"))
    joined.select(col("*") +: finals: _*).drop(dropNames: _*)
  }

  /** Is this an unpartitioned DISTINCT running aggregate whose prefix
    * frame LOOKS AHEAD (`f(DISTINCT x) OVER (ORDER BY … ROWS BETWEEN
    * UNBOUNDED PRECEDING AND h FOLLOWING)`)? Every value in such a
    * frame still has its first global occurrence INSIDE the frame, so
    * the pre-attached first-occurrence mask turns it into an ordinary
    * count/sum/avg over [start, cur+h] — which decomposes like the
    * prefix scan WITH a bounded lookahead: earlier buckets contribute
    * through exclusive-prefix totals, the in-bucket window runs
    * [bucket start, cur+h] where the rows past the bucket edge are
    * lead ghosts. Halo capped like the other ghost paths; RANGE
    * lookahead (value distance) keeps the dedicated lowering.
    */
  private def isGlobalDistinctAheadWin(f: String, args: Seq[BoundOperand],
      parts: Seq[BoundOperand], ord: Seq[(BoundOperand, Ast.SortDir)],
      frame: Option[Ast.WinFrame]): Boolean =
    parts.isEmpty && ord.nonEmpty &&
      args.lastOption.contains(
        BoundOperand.BLit(Lit.LitString(Ast.DistinctSentinel))) &&
      Set("count", "sum", "avg", "mean")(f) &&
      frame.exists(fr => !fr.range && !fr.groups && !fr.temporal &&
        fr.exclude == "none" && fr.lo == Long.MinValue &&
        fr.hi > 0L && fr.hi != Long.MaxValue && fr.hi <= 1000L)

  /** Attach one ORDER-spec group of DISTINCT look-ahead runnings (see
    * isGlobalDistinctAheadWin). Items: (name, count|sum|avg, mask
    * column, h). The in-bucket [bucket start, cur+h] windows evaluate
    * over the ghost-extended union (first-maxH rows of every later
    * bucket, ≤ P·h replicated rows — sorted strictly after the target
    * bucket's real rows, so the prefix part never sees them); the
    * per-bucket totals aggregate REAL rows only; the frame truncates
    * at the global end exactly where the ghosts run out.
    */
  private def attachGlobalMaskAheadWins(spark: SparkSession, df0: DataFrame,
      bk: BucketCols,
      items: Seq[(String, String, Column, Int)]): DataFrame = {
    val tag = s"__gmaw${gowTag.incrementAndGet()}"
    val pidN = bk.pidN
    val ghostN = s"${tag}_ghost"
    val ordE = bk.ordE
    // the first-occurrence masks were attached BEFORE the shared range
    // shuffle by the coordinator (they're value-partitioned windows);
    // items carry their column refs, so only the ghost marker is new
    val bucketed = df0.withColumn(ghostN, lit(false))
    val maxLead = items.map(_._4).max
    val unb = org.apache.spark.sql.expressions.Window.unboundedPreceding
    val pids = bucketed.select(col(pidN).as(s"${tag}_tp")).distinct()
    val edgeN = s"${tag}_edge"
    val wHead = org.apache.spark.sql.expressions.Window
      .partitionBy(col(pidN)).orderBy(ordE: _*)
    val heads = bucketed.withColumn(edgeN, row_number().over(wHead))
      .filter(col(edgeN) <= maxLead).drop(edgeN)
      .join(broadcast(pids), col(pidN) > col(s"${tag}_tp"))
      .withColumn(pidN, col(s"${tag}_tp")).drop(s"${tag}_tp")
      .withColumn(ghostN, lit(true))
    val unioned = bucketed.unionByName(heads)
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col(pidN)).orderBy(ordE: _*)
    val inCols = items.zipWithIndex.flatMap { case ((_, f, m, h), i) =>
      val w = wIn.rowsBetween(unb, h.toLong)
      (if (f != "count") Seq(sum(m).over(w).as(s"${tag}_is$i")) else Nil) ++
        (if (f != "sum") Seq(count(m).over(w).as(s"${tag}_ic$i")) else Nil)
    }
    val withIn = unioned.select(col("*") +: inCols: _*).filter(!col(ghostN))
    val totAggs = items.zipWithIndex.flatMap { case ((_, f, m, _), i) =>
      (if (f != "count")
        Seq(sum(m).as(s"${tag}_ts$i")) else Nil) ++
        (if (f != "sum")
          Seq(count(m).as(s"${tag}_tc$i")) else Nil)
    }
    val totals = df0.groupBy(col(pidN)).agg(totAggs.head, totAggs.tail: _*)
    val wPre = org.apache.spark.sql.expressions.Window
      .orderBy(col(pidN).asc).rowsBetween(unb, -1L)
    val offCols = items.zipWithIndex.flatMap { case ((_, f, _, _), i) =>
      (if (f != "count") Seq(sum(col(s"${tag}_ts$i")).over(wPre)
        .as(s"${tag}_fs$i")) else Nil) ++
        (if (f != "sum") Seq(sum(col(s"${tag}_tc$i")).over(wPre)
          .as(s"${tag}_fc$i")) else Nil)
    }
    val offsets = totals.select(col(pidN) +: offCols: _*)
    val joined = withIn.join(broadcast(offsets), Seq(pidN), "left_outer")
    val finals = items.zipWithIndex.map { case ((alias, f, _, _), i) =>
      lazy val sm = coalesce(col(s"${tag}_fs$i") + col(s"${tag}_is$i"),
        col(s"${tag}_fs$i"), col(s"${tag}_is$i"))
      lazy val cnt = coalesce(col(s"${tag}_fc$i"), lit(0L)) +
        col(s"${tag}_ic$i")
      (f match {
        case "count" => cnt
        case "sum"   => sm
        // the distributed DISTINCT avg divides the exact sum by the
        // exact count in DOUBLE, like the prefix-scan avg — gates cast
        case _ => when(cnt === 0L, lit(null))
          .otherwise(sm.cast("double") / cnt)
      }).as(alias)
    }
    val dropNames = Seq(ghostN) ++
      items.indices.flatMap(i => Seq(s"${tag}_is$i", s"${tag}_ic$i",
        s"${tag}_fs$i", s"${tag}_fc$i"))
    joined.select(col("*") +: finals: _*).drop(dropNames: _*)
  }

  /** Is this an unpartitioned lag/lead IGNORE NULLS the carry-array
    * prefix scan can compute? Literal offsets 1..1000 (offset 0 and
    * non-literal shapes keep the dedicated lowering). The lookback is
    * UNBOUNDED — a run of NULLs can span any number of buckets — so the
    * ghost halo can't cover it; attachGlobalIgnoreNullsShifts bounds it
    * with per-bucket last-k-non-null summaries instead.
    */
  private def isGlobalIgnoreNullsShiftWin(f: String, args: Seq[BoundOperand],
      parts: Seq[BoundOperand], ord: Seq[(BoundOperand, Ast.SortDir)]): Boolean =
    parts.isEmpty && ord.nonEmpty && (f == "lag" || f == "lead") &&
      args.lastOption.contains(
        BoundOperand.BLit(Lit.LitString(Ast.IgnoreNullsSentinel))) &&
      !args.dropRight(1).exists {
        case BoundOperand.BLit(Lit.LitString(s)) => s.startsWith("__")
        case _ => false
      } &&
      (args.dropRight(1).lift(1) match {
        case None => true
        case Some(BoundOperand.BLit(Lit.LitLong(n))) => n >= 1 && n <= 1000
        case _ => false
      })

  /** Unpartitioned lag/lead IGNORE NULLS over a total order, without the
    * single-partition window. Any run of NULLs can span buckets, so the
    * lookback is unbounded and ghost rows can't cover it. Instead: each
    * bucket aggregates its last-k (first-k for lead) NON-NULL values per
    * item as a sorted (index, value) array; the ≤P-row totals frame
    * prefix-concatenates earlier buckets' arrays (suffix for lead) and
    * keeps the k nearest — the per-bucket CARRY, broadcast back. Each
    * row then combines: if its own bucket holds ≥k non-nulls before it,
    * the in-bucket IGNORE NULLS shift answers; otherwise the shortfall
    * indexes the carry from its near end, and where the carry is short
    * too the row is within k non-nulls of the true global boundary — the
    * default applies. Exact because the k nearest preceding non-nulls of
    * any prefix are contained in (per-bucket last-k union), the same
    * containment that drives the ghost rows.
    */
  private def attachGlobalIgnoreNullsShifts(spark: SparkSession,
      df0: DataFrame, bk: BucketCols,
      items: Seq[(String, String, Column, Int, Any)]): DataFrame = {
    val tag = s"__gin${gowTag.incrementAndGet()}"
    val pidN = bk.pidN
    val gidxN = s"${tag}_gidx"
    val ordNames = bk.ordNames
    val xN = items.indices.map(j => s"${tag}_x$j")
    val cntN = items.indices.map(j => s"${tag}_c$j")
    val arrN = items.indices.map(j => s"${tag}_a$j")
    val carN = items.indices.map(j => s"${tag}_k$j")
    // the shared bucketing is already materialized; the item argument
    // columns are row-local expressions that ride its lazy plan
    val bucketed = df0.select(col("*") +: items.zipWithIndex.map {
      case ((_, _, x, _, _), j) => x.as(xN(j)) }: _*)
    val ordE = bk.ordE
    val ordRev = bk.dirs.zipWithIndex.map { case (d, i) =>
      sortCol(col(ordNames(i)), Ast.SortDir(!d.desc, d.nullsFirst.map(!_))) }
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col(pidN)).orderBy(ordE: _*)
    val wInRev = org.apache.spark.sql.expressions.Window
      .partitionBy(col(pidN)).orderBy(ordRev: _*)
    val ub = org.apache.spark.sql.expressions.Window.unboundedPreceding
    val uf = org.apache.spark.sql.expressions.Window.unboundedFollowing
    // in-bucket index (orders the collected candidates globally within
    // their bucket) + per-item non-null counts: before the row for lag,
    // after it for lead — both also select the last-k/first-k candidates
    // the after-count computes as whole-bucket total minus inclusive
    // prefix — Spark's (1, UnboundedFollowing) frame re-aggregates per
    // row (O(bucket²); the WinScaleProbe sweep measured that frame
    // shape super-linear in the whole-input EXCLUDE lowering)
    val wPart = org.apache.spark.sql.expressions.Window
      .partitionBy(col(pidN))
    val withIdx = bucketed.select(col("*") +:
      (row_number().over(wIn).as(gidxN) +:
        items.zipWithIndex.map { case ((_, f, _, _, _), j) =>
          val x = col(xN(j))
          if (f == "lag")
            count(x).over(wIn.rowsBetween(ub, -1L)).as(cntN(j))
          else
            (count(x).over(wPart) -
              count(x).over(wIn.rowsBetween(ub, 0L))).as(cntN(j))
        }): _*)
    // candidate flag rides a REVERSED-order running count for lag (the
    // bucket's last k non-nulls) / the forward count for lead (first k);
    // the when() keeps only candidates, collect_list drops the rest
    val withCand = withIdx.select(col("*") +:
      items.zipWithIndex.map { case ((_, f, _, k, _), j) =>
        val x = col(xN(j))
        val tailCnt =
          if (f == "lag") count(x).over(wInRev.rowsBetween(ub, 0L))
          else count(x).over(wIn.rowsBetween(ub, 0L))
        when(x.isNotNull && tailCnt <= k,
          struct(col(gidxN).as("i"), x.as("v"))).as(s"${tag}_s$j")
      }: _*)
    val totals = withCand.groupBy(col(pidN)).agg(
      sort_array(collect_list(col(s"${tag}_s0"))).as(arrN(0)),
      items.indices.drop(1).map(j =>
        sort_array(collect_list(col(s"${tag}_s$j"))).as(arrN(j))): _*)
    val wPre = org.apache.spark.sql.expressions.Window
      .orderBy(col(pidN).asc).rowsBetween(ub, -1L)
    val wSuf = org.apache.spark.sql.expressions.Window
      .orderBy(col(pidN).asc).rowsBetween(1L, uf)
    // carry: earlier (later) buckets' candidate arrays concatenated in
    // bucket order — flatten preserves it — then the k nearest kept;
    // ≤ P arrays of ≤ k elements each through the single-partition
    // totals window, scale-free
    val offsets = totals.select(col(pidN) +:
      items.zipWithIndex.map { case ((_, f, _, k, _), j) =>
        // collect_list over an empty frame yields an empty array (never
        // NULL), so bucket 0 / the last bucket flatten to an empty carry
        val fl =
          if (f == "lag") flatten(collect_list(col(arrN(j))).over(wPre))
          else flatten(collect_list(col(arrN(j))).over(wSuf))
        val kept =
          if (f == "lag")
            slice(fl, greatest(lit(1), size(fl) - k + 1), lit(k))
          else slice(fl, lit(1), lit(k))
        kept.as(carN(j))
      }: _*)
    val joined = withIdx.join(broadcast(offsets), Seq(pidN), "left_outer")
    val finals = items.zipWithIndex.map { case ((alias, f, _, k, dflt), j) =>
      val x = col(xN(j))
      val xType = bucketed.schema(xN(j)).dataType
      val dfltC = lit(dflt).cast(xType)
      val carry = col(carN(j))
      val need = (lit(k) - col(cntN(j))).cast("int")
      val inShift =
        (if (f == "lag") lag(x, k, null, ignoreNulls = true)
         else lead(x, k, null, ignoreNulls = true)).over(wIn)
      val fromCarry =
        if (f == "lag")
          element_at(carry, (size(carry) - need + 1)).getField("v")
        else element_at(carry, need).getField("v")
      when(col(cntN(j)) >= k, inShift)
        .otherwise(when(size(carry) >= need, fromCarry).otherwise(dfltC))
        .as(alias)
    }
    joined.select(col("*") +: finals: _*)
      .drop((Seq(gidxN) ++ xN ++ cntN ++ carN): _*)
  }

  /** Is `f(x) OVER ()` — no PARTITION BY, no ORDER BY, no frame — a
    * decomposable plain aggregate? Such a window computes ONE value over
    * the whole input but forces every row through a single partition
    * (Spark warns "No Partition Defined"); the attach step rewrites it
    * to a 1-row global aggregate broadcast-joined back: identical value
    * on every row, no single-partition exchange — the percent-of-total
    * idiom stays scalable at any input cardinality.
    *
    * An ORDERED window whose explicit frame is WHOLE-INPUT (`ORDER BY …
    * ROWS/RANGE/GROUPS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED
    * FOLLOWING`, no EXCLUDE) computes the same single value — the order
    * is immaterial to an unbounded frame — so it takes the same rewrite
    * instead of Spark's single-partition ordered window.
    */
  private def isGlobalAggWin(f: String, args: Seq[BoundOperand],
      parts: Seq[BoundOperand], ord: Seq[(BoundOperand, Ast.SortDir)],
      frame: Option[Ast.WinFrame]): Boolean = {
    // DISTINCT makes no difference to the rewrite's shape — the 1-row
    // global aggregate just uses the distinct aggregate forms (min/max
    // DISTINCT are no-ops); IGNORE NULLS keeps its dedicated lowering
    val dist = args.lastOption.contains(
      BoundOperand.BLit(Lit.LitString(Ast.DistinctSentinel)))
    val argsR = if (dist) args.dropRight(1) else args
    parts.isEmpty &&
      ((ord.isEmpty && frame.isEmpty) ||
        frame.exists(fr => !fr.temporal && fr.lo == Long.MinValue &&
          fr.hi == Long.MaxValue && fr.exclude == "none")) &&
      (Set("count", "sum", "avg", "min", "max")(f) ||
        (dist && f == "mean")) &&
      (if (dist) argsR.lengthCompare(1) == 0 else argsR.lengthCompare(1) <= 0) &&
      !argsR.exists {
        case BoundOperand.BLit(Lit.LitString(s)) => s.startsWith("__")
        case _ => false
      }
  }

  private def globalAggCol(f: String, args: Seq[BoundOperand],
      opLower: BoundOperand => Column): Column = {
    val dist = args.lastOption.contains(
      BoundOperand.BLit(Lit.LitString(Ast.DistinctSentinel)))
    val argsR = if (dist) args.dropRight(1) else args
    lazy val x = opLower(argsR.head)
    (f, dist) match {
      case ("count", false) =>
        if (argsR.isEmpty) count(lit(1)) else count(x)
      case ("count", true)        => count_distinct(x)
      case ("sum", false)         => sum(x)
      case ("sum", true)          => sum_distinct(x)
      case ("avg" | "mean", true) =>
        // all-NULL input → 0 distinct values → NULL, never a divide
        val c = count_distinct(x)
        when(c === 0L, lit(null)).otherwise(sum_distinct(x) / c)
      case ("avg", false)         => avg(x)
      case ("min", _)             => min(x)
      case _                      => max(x)
    }
  }

  /** Is `f(DISTINCT x) OVER w` rewritable to the scalable masked-running
    * form? Requires a PREFIX frame — no explicit frame (default running
    * / whole-partition), or lo = UNBOUNDED PRECEDING: every value in
    * such a frame has its first partition-order occurrence inside the
    * frame, so a pre-attached first-occurrence mask plus an ordinary
    * running aggregate is exact, with O(1) window state at any NDV.
    * Bounded-lo frames keep the collect_set fallback — their set size
    * is FRAME-bounded, not partition-bounded, so they are not the
    * 100×-scale hazard the prefix frames were.
    */
  private def distinctWinEligible(f: String, args: Seq[BoundOperand],
      frame: Option[Ast.WinFrame]): Boolean =
    args.lastOption.contains(
      BoundOperand.BLit(Lit.LitString(Ast.DistinctSentinel))) &&
      Set("count", "sum", "avg", "mean")(f) &&
      frame.forall(_.lo == Long.MinValue)

  /** Is `f(DISTINCT x) OVER (ORDER BY …)` — unpartitioned — computable
    * by composing the first-occurrence mask with the distributed prefix
    * scan? The mask's own window partitions by the VALUE (distributed at
    * any NDV), and a value's first global occurrence lies inside every
    * prefix frame that contains the value, so the scan's ordinary
    * running count/sum/avg over the mask IS the DISTINCT aggregate —
    * with no Exchange SinglePartition anywhere. Prefix-to-current frames
    * only (the scan's aggregate shape); hi > 0 keeps the dedicated
    * masked lowering.
    */
  private def isGlobalDistinctWin(f: String, args: Seq[BoundOperand],
      parts: Seq[BoundOperand], ord: Seq[(BoundOperand, Ast.SortDir)],
      frame: Option[Ast.WinFrame]): Boolean =
    parts.isEmpty && ord.nonEmpty &&
      distinctWinEligible(f, args, frame) &&
      frame.forall(fr => !fr.groups && fr.exclude == "none" &&
        !fr.temporal && fr.lo == Long.MinValue && fr.hi == 0L)

  /** The first-occurrence mask: x where this row is the first occurrence
    * of value x within its window partition (in window order), NULL
    * otherwise. count/sum/avg of the mask over a prefix frame ≡ the
    * DISTINCT aggregate, in the aggregate's native result type (no
    * DOUBLE detour). NULL x never flags (DISTINCT aggregation skips
    * NULLs). Unordered windows flag one arbitrary-but-deterministic
    * member — all carry the same x, so any one is correct. Must be
    * ATTACHED as a column before the main window evaluates (Spark
    * rejects nested window expressions).
    */
  private def distinctMaskColumn(args: Seq[BoundOperand],
      parts: Seq[BoundOperand], ord: Seq[(BoundOperand, Ast.SortDir)],
      opLower: BoundOperand => Column, colOf: BoundCol => Column): Column = {
    val x = opLower(args.head)
    val wf0 = org.apache.spark.sql.expressions.Window
      .partitionBy(parts.map(opLower) :+ x: _*)
    val wf =
      if (ord.isEmpty) wf0.orderBy(lit(0))
      else wf0.orderBy(ord.map { case (op, dir) =>
        sortCol(opLower(op), dir) }: _*)
    when(x.isNotNull && row_number().over(wf) === 1, x)
  }

  /** Best-effort static type of a window-aggregate input, for choosing
    * the DISTINCT-fallback fold accumulator. Conservative: None (→
    * DOUBLE fold, the pre-existing behavior) whenever the operand's
    * type isn't locally decidable.
    */
  private def inputSqlType(o: BoundOperand): Option[SqlType] = {
    def integral(t: SqlType): Boolean = t match {
      case SqlType.SqlBigInt | SqlType.SqlInt | SqlType.SqlSmallInt => true
      case _ => false
    }
    o match {
      case BoundOperand.BCol(c)        => Some(c.attr.sqlType)
      case BoundOperand.BCast(_, t)    => Some(t)
      case BoundOperand.BTryCast(_, t) => Some(t)
      case BoundOperand.BLit(Lit.LitLong(_))   => Some(SqlType.SqlBigInt)
      case BoundOperand.BLit(Lit.LitDouble(_)) => Some(SqlType.SqlDouble)
      // integer +,-,*,% stay integral; / divides float-style (DuckDB)
      case BoundOperand.BArith(op, l, r) if op != '/' =>
        (inputSqlType(l), inputSqlType(r)) match {
          case (Some(a), Some(b)) if integral(a) && integral(b) =>
            Some(SqlType.SqlBigInt)
          case _ => None
        }
      case _ => None
    }
  }

  private def windowColumn(f: String, args: Seq[BoundOperand],
      parts: Seq[BoundOperand], ord: Seq[(BoundOperand, Ast.SortDir)],
      frame: Option[Ast.WinFrame],
      opLower: BoundOperand => Column, colOf: BoundCol => Column,
      /** GROUPS frames: the pre-attached dense_rank of the order keys
        * (see groupsRankColumn) — the frame becomes a RANGE frame over
        * it, which is exact: rank distance IS peer-group distance.
        */
      groupsRank: Option[Column] = None,
      /** DISTINCT aggregates over prefix frames: the pre-attached
        * first-occurrence mask (see distinctMaskColumn).
        */
      distinctMask: Option[Column] = None): Column = {
    val w0 = org.apache.spark.sql.expressions.Window
      .partitionBy(parts.map(opLower): _*)
    // INTERVAL RANGE bounds: order by the temporal key's epoch seconds
    // so the value-distance frame is time-windowed (bounds were
    // normalized to seconds at parse; session timezone is UTC)
    val temporalRange = frame.exists(fr => fr.range && fr.temporal)
    val w1 =
      if (frame.exists(_.groups))
        w0.orderBy(groupsRank.getOrElse(
          sys.error("unreachable: GROUPS frame without a rank column")).asc)
      else if (ord.isEmpty) w0
      else if (temporalRange) {
        // epoch MICROS, not seconds — the fixtures carry microsecond
        // timestamps and a truncated ordering key would diverge from
        // the oracle's exact interval comparison at sub-second edges
        val c = unix_micros(opLower(ord.head._1).cast("timestamp"))
        w0.orderBy(sortCol(c, ord.head._2))
      }
      // NULLS LAST in both directions — DuckDB's default_null_order
      // (see sortCol; round-13 fuzz caught the bare-.asc divergence);
      // explicit NULLS FIRST/LAST passes through natively, so RANGE
      // frames keep their single ORDER key under either null order
      else w0.orderBy(ord.map { case (op, dir) =>
        sortCol(opLower(op), dir)
      }: _*)
    val w = frame.fold(w1) { fr =>
      // temporal bounds parsed as seconds scale to the micros ordering
      // (unbounded sentinels pass through)
      def tb(b: Long): Long =
        if (!fr.temporal || b == Long.MinValue || b == Long.MaxValue) b
        else b * 1000000L
      if (fr.groups || fr.range) w1.rangeBetween(tb(fr.lo), tb(fr.hi))
      else w1.rowsBetween(fr.lo, fr.hi)
    }
    // DISTINCT arrives as a sentinel trailing argument. Prefix frames
    // (the scale-relevant shape) take the masked-running path: an
    // ordinary count/sum/avg over the pre-attached first-occurrence
    // mask — exact at any cardinality, O(1) per-row window state, and
    // the aggregate's native result type. Bounded-lo frames fall back
    // to a per-frame collect_set (set size is frame-bounded); its
    // sum/avg fold seeds with x*0L so integrals accumulate in LONG
    // (exact past 2^53) and decimals keep their scale — only floating
    // inputs fold floating. min/max fall through (DISTINCT is a no-op
    // at the extremes).
    val distinctAgg = args.lastOption.contains(
      BoundOperand.BLit(Lit.LitString(Ast.DistinctSentinel)))
    val args1 = if (distinctAgg) args.dropRight(1) else args
    if (distinctAgg && Set("count", "sum", "avg", "mean")(f)) {
      distinctMask match {
        case Some(m) =>
          f match {
            case "count" => return count(m).over(w).cast("long")
            case "sum"   => return sum(m).over(w)
            case _       => return avg(m).over(w)
          }
        case None =>
          val cs = collect_set(opLower(args1.head)).over(w)
          f match {
            case "count" => return size(cs).cast("long")
            case _ =>
              // the fold accumulator must keep a FIXED type across merges
              // (Spark rejects a merge result wider than the seed), so the
              // seed is the family's widest: LONG for integrals (exact past
              // 2^53), decimal(38, s) for decimals (precision already
              // capped — adds stop widening), DOUBLE for floating/unknown
              val zero = inputSqlType(args1.head) match {
                case Some(SqlType.SqlBigInt | SqlType.SqlInt |
                          SqlType.SqlSmallInt) => lit(0L)
                case Some(SqlType.SqlDecimal(_, s)) =>
                  lit(0L).cast(s"decimal(38,$s)")
                case _ => lit(0d)
              }
              val s = org.apache.spark.sql.functions.aggregate(
                cs, zero, (a, x) => a + x)
              return if (f == "sum") when(size(cs) > 0, s)
                     else when(size(cs) > 0, s / size(cs))
          }
      }
    }
    // IGNORE NULLS arrives as a sentinel trailing argument (DuckDB's
    // fn(args IGNORE NULLS) form) — strip it and thread the flag into
    // Spark's native ignoreNulls variants
    val ignoreNulls = args1.lastOption.contains(
      BoundOperand.BLit(Lit.LitString(Ast.IgnoreNullsSentinel)))
    val argsR = if (ignoreNulls) args1.dropRight(1) else args1
    def shiftN: Int = shiftOffset(argsR)
    def shiftDefault: Any = shiftDefaultAny(argsR)
    // windowed ordered aggregates: a running collect over the frame —
    // within-frame order IS the window's sort order (Spark evaluates
    // ordered-window rows in sort sequence). The struct wrap keeps NULL
    // values collectable for array_agg (DuckDB keeps them; string_agg
    // skips, so its wrap filters first).
    if (f == "string_agg" || f == "array_agg") {
      val v = opLower(argsR.head)
      val sep = argsR.lift(1) match {
        case Some(BoundOperand.BLit(Lit.LitString(x))) => x
        case _                                         => ""
      }
      val wrapped =
        if (f == "string_agg") collect_list(when(v.isNotNull, struct(v.as("v"))))
        else collect_list(struct(v.as("v")))
      val vals = transform(wrapped.over(w), x => x.getField("v"))
      return if (f == "string_agg") array_join(vals, sep) else vals
    }
    val fn = (f, argsR) match {
      case ("row_number", _)     => row_number()
      case ("rank", _)           => rank()
      case ("dense_rank", _)     => dense_rank()
      case ("percent_rank", _)   => percent_rank()
      case ("cume_dist", _)      => cume_dist()
      case ("ntile", Seq(BoundOperand.BLit(Lit.LitLong(n)))) => ntile(n.toInt)
      case ("lag", x +: _)       => lag(opLower(x), shiftN, shiftDefault, ignoreNulls)
      case ("lead", x +: _)      => lead(opLower(x), shiftN, shiftDefault, ignoreNulls)
      case ("first_value", Seq(x)) => first(opLower(x), ignoreNulls)
      case ("last_value", Seq(x))  => last(opLower(x), ignoreNulls)
      case ("nth_value", Seq(x, BoundOperand.BLit(Lit.LitLong(n)))) =>
        nth_value(opLower(x), n.toInt, ignoreNulls)
      case ("count", Seq())      => count(lit(1))
      case ("count", Seq(x))     => count(opLower(x))
      case ("sum", Seq(x))       => sum(opLower(x))
      case ("min", Seq(x))       => min(opLower(x))
      case ("max", Seq(x))       => max(opLower(x))
      case ("avg", Seq(x))       => avg(opLower(x))
      case ("stddev", Seq(x))    => stddev(opLower(x))
      case ("variance", Seq(x))  => variance(opLower(x))
      case ("median", Seq(x))    => median(opLower(x))
      case other                 => sys.error(s"unreachable window function $other")
    }
    // Frame exclusion: when the frame statically contains the current
    // row (lo ≤ 0 ≤ hi — for RANGE that also means it contains the
    // whole peer group), the excluded contribution subtracts columnar
    // (sum/count/avg — analyzer-enforced); an all-excluded frame yields
    // SQL NULL. CURRENT ROW subtracts the row itself; GROUP subtracts
    // the peer-group aggregate (one extra window over partition + order
    // keys — same shuffle, peers are sort-adjacent); TIES subtracts the
    // peers but adds the current row back.
    val exclMode = frame.filter(fr => fr.lo <= 0L && fr.hi >= 0L)
      .map(_.exclude).getOrElse("none")
    if (exclMode == "none") fn.over(w)
    else {
      // the TRUE-reversed order spec (direction AND null placement
      // flip) for tie-safe RANGE whole-tail suffixes — see exclusionCol
      val wRev =
        if (ord.nonEmpty && !frame.exists(_.groups) && !temporalRange)
          Some(w0.orderBy(ord.map { case (op, dir) =>
            sortCol(opLower(op), Ast.SortDir(!dir.desc,
              Some(!dir.nullsFirst.getOrElse(false)))) }: _*))
        else None
      exclusionCol(f, argsR.headOption.map(opLower), frame.get, w, w1,
        parts.map(opLower) ++ ord.map(o => opLower(o._1)), exclMode, wRev)
    }
  }

  /** Frame-exclusion lowering, shared by the dedicated window path and
    * the ghost-row global path. The excluded contribution subtracts
    * columnar (sum/count/avg — analyzer-enforced); an all-excluded
    * frame yields SQL NULL. CURRENT ROW subtracts the row itself;
    * GROUP subtracts the peer-group aggregate (one extra window over
    * the peer keys — same shuffle, peers are sort-adjacent); TIES
    * subtracts the peers but adds the current row back.
    *
    * @param cOpt   lowered aggregate argument (None = count(*))
    * @param w      the FRAMED window the main aggregate runs over
    * @param w1     the frameless partition+order spec (min/max
    *               sub-frames rebuild their bounds on it)
    * @param pwKeys peer-group partition keys — partition keys ++
    *               order-key expressions (the ghost path adds the
    *               bucket id, making peer groups in-bucket; exact
    *               because equal order keys land in ONE range bucket
    *               and ghosts never share a key with their target
    *               bucket's real rows)
    */
  private def exclusionCol(f: String, cOpt: Option[Column],
      fr: Ast.WinFrame, w: org.apache.spark.sql.expressions.WindowSpec,
      w1: org.apache.spark.sql.expressions.WindowSpec,
      pwKeys: Seq[Column], exclMode: String,
      /** The frameless partition + TRUE-REVERSED-order spec, when the
        * caller can build one: a RANGE suffix sub-frame reaching the
        * partition end (`[1, UNBOUNDED FOLLOWING]`) evaluates as a
        * PREFIX frame over it — value-based, so ties cannot reshuffle
        * between the two sorts — because Spark's (bounded-start,
        * UnboundedFollowing) frame re-aggregates per row, O(partition²)
        * (the WinScaleProbe sweep measured that shape super-linear).
        * ROWS suffixes keep the direct frame: a reversed ROW split is
        * only exact when tie positions complement, which two
        * independent sorts do not guarantee.
        */
      revOrd: Option[org.apache.spark.sql.expressions.WindowSpec] = None)
      : Column = {
    lazy val pw = org.apache.spark.sql.expressions.Window
      .partitionBy(pwKeys: _*)
    def cntSub(c: Option[Column]): Column = {
      val self = c.fold(lit(1L))(_.isNotNull.cast("long"))
      val grp = c.fold(count(lit(1)))(count(_)).over(pw)
      exclMode match {
        case "current" => self
        case "group"   => grp
        case _         => grp - self // ties
      }
    }
    def sumSub(c: Column): Column = {
      val self = coalesce(c, lit(0))
      val grp = coalesce(sum(c).over(pw), lit(0))
      exclMode match {
        case "current" => self
        case "group"   => grp
        case _         => grp - self // ties
      }
    }
    (f, cOpt) match {
      case ("count", None)    => count(lit(1)).over(w) - cntSub(None)
      case ("count", Some(c)) => count(c).over(w) - cntSub(Some(c))
      case ("sum", Some(c)) =>
        val cnt = count(c).over(w) - cntSub(Some(c))
        when(cnt === 0, lit(null)).otherwise(sum(c).over(w) - sumSub(c))
      case ("avg", Some(c)) =>
        val cnt = count(c).over(w) - cntSub(Some(c))
        when(cnt === 0, lit(null))
          .otherwise((sum(c).over(w) - sumSub(c)) / cnt)
      // min/max are not subtractable — decompose the frame into the
      // prefix sub-frame [lo, -1] and suffix sub-frame [1, hi] (exact
      // for ROWS frames by row position; for RANGE frames the analyzer
      // restricts to an integral order key so the ±1 value boundary is
      // exact). EXCLUDE GROUP = least/greatest of the two; TIES adds
      // the current row's value back; CURRENT ROW additionally needs
      // the peer group minus the row itself, which is the same
      // row-position split applied WITHIN the peer group (ordered by
      // the value — any total order covers all-but-self). All windows
      // share the partition-key shuffle.
      case ("min" | "max", Some(c)) =>
        val isMin = f == "min"
        def agg(cc: Column): Column = if (isMin) min(cc) else max(cc)
        def comb(cs: Seq[Column]): Column = cs match {
          case Seq()  => when(c.isNull && c.isNotNull, c) // typed NULL
          case Seq(a) => a
          case many   => if (isMin) least(many: _*) else greatest(many: _*)
        }
        def subFrame(loB: Long, hiB: Long): Option[Column] =
          if (loB > hiB) None
          else revOrd match {
            case Some(rev) if fr.range && loB == 1L && hiB == Long.MaxValue =>
              Some(agg(c).over(rev.rangeBetween(Long.MinValue, -1L)))
            case _ => Some(agg(c).over(
              if (fr.range) w1.rangeBetween(loB, hiB)
              else w1.rowsBetween(loB, hiB)))
          }
        val prefix = subFrame(fr.lo, -1L)
        val suffix = subFrame(1L, fr.hi)
        lazy val pw2 = org.apache.spark.sql.expressions.Window
          .partitionBy(pwKeys: _*).orderBy(c)
        lazy val peersExclSelf = comb(Seq(
          agg(c).over(pw2.rowsBetween(Long.MinValue, -1L)),
          agg(c).over(pw2.rowsBetween(1L, Long.MaxValue))))
        exclMode match {
          case "current" if fr.range =>
            comb(prefix.toSeq ++ suffix.toSeq :+ peersExclSelf)
          case "current" => comb(prefix.toSeq ++ suffix.toSeq)
          case "group"   => comb(prefix.toSeq ++ suffix.toSeq)
          case _ /* ties */ =>
            comb(prefix.toSeq ++ suffix.toSeq :+ c)
        }
      case other => sys.error(s"unreachable frame exclusion over $other")
    }
  }

  /** One aggregate call as a Column under the caller's operand
    * resolution (shared by aggregate LATERAL frames; the grouped SELECT
    * lowering additionally handles grouping()).
    */
  private def aggCallCol(f: String, arg: Option[BoundOperand], dist: Boolean,
      opLower: BoundOperand => Column): Column = (f, arg) match {
    case ("count", None)            => count(lit(1))
    case ("count", Some(a)) if dist => count_distinct(opLower(a))
    case ("count", Some(a))         => count(opLower(a))
    case ("sum", Some(a)) if dist   => sum_distinct(opLower(a))
    case ("sum", Some(a))           => sum(opLower(a))
    case ("min", Some(a))           => min(opLower(a))
    case ("max", Some(a))           => max(opLower(a))
    case ("avg", Some(a))           => avg(opLower(a))
    case ("stddev", Some(a))        => stddev(opLower(a))
    case ("variance", Some(a))      => variance(opLower(a))
    case ("median", Some(a))        => median(opLower(a))
    case other                      => sys.error(s"unreachable aggregate $other")
  }

  /** Fuse a correlated aggregate LATERAL into the enclosing join group:
    * per-key aggregate over the body's core, COMPLETED over the distinct
    * outer keys observed in the enclosing frame (left join + the
    * count-over-empty-group coalesce), then joined back null-safely so
    * NULL outer keys keep their row too. The COMPLETION join is plain
    * equality: a NULL outer key must take the EMPTY group (count 0,
    * NULL max — `fc.k = NULL` is UNKNOWN for every inner row), not the
    * NULL-key group's aggregates (round-14 fuzz found exactly that
    * divergence vs DuckDB); only the structural join-back uses `<=>`,
    * to link each outer row to its own completed-key row. Three
    * key-bounded shuffles (outer-key distinct, per-key aggregate, final
    * join) — never a per-outer-row re-execution of the body.
    */
  private def joinAggLateral(spark: SparkSession, df: DataFrame,
      bt: BoundTable, l: Analyzer.BoundLateral,
      source: BoundTable => DataFrame): DataFrame = {
    def qcolOf(bc: BoundCol): Column = col(s"${bc.binding}.${bc.attr.name}")
    val core = combine(spark, l.sub, source, Set.empty, None)
    val aggExprs = l.sub.projection.zipWithIndex.map {
      case (BoundItem.BIAgg(f, arg, _, dist), i) =>
        aggCallCol(f, arg, dist, lowerOperandWith(_, qcolOf)).as(s"__pa$i")
      case other => sys.error(s"unreachable aggregate LATERAL item $other")
    }
    val keyCols = l.pairs.zipWithIndex.map { case ((_, ic), i) =>
      qcolOf(ic).as(s"__pk$i") }
    val perKey = core.groupBy(keyCols: _*).agg(aggExprs.head, aggExprs.tail: _*)
    val outKeys = df.select(l.pairs.zipWithIndex.map { case ((oc, _), i) =>
      qcolOf(oc).as(s"__ok$i") }: _*).distinct()
    val completed = outKeys.join(perKey,
      l.pairs.indices.map(i => col(s"__ok$i") === perKey(s"__pk$i")).reduce(_ && _),
      "left_outer")
    val outCols = l.sub.projection.zipWithIndex.map {
      case (BoundItem.BIAgg(f, _, Some(a), _), i) =>
        val c = perKey(s"__pa$i")
        (if (f == "count") coalesce(c, lit(0L)) else c).as(a)
      case other => sys.error(s"unreachable aggregate LATERAL item $other")
    } ++ l.hiddenKeys.zipWithIndex.map { case (hk, i) => col(s"__ok$i").as(hk) }
    val frame = completed.select(outCols: _*).alias(bt.binding)
    val on = l.pairs.zipWithIndex.map { case ((oc, _), i) =>
      qcolOf(oc) <=> col(s"${bt.binding}.${l.hiddenKeys(i)}") }.reduce(_ && _)
    df.join(frame, on)
  }

  /** Union-merge ASOF lowering — the 100 TB path (the same shape as the
    * API-level operators/AsOf.asofJoin): instead of materializing every
    * inequality-satisfying candidate and pruning with a per-left-row
    * window (O(matches) fan-out inside dense key groups), tag the
    * DISTINCT outer (key, time) combinations and the step rows, union
    * them, and take one per-key running `last(payload ignoring nulls)`
    * over (time, side) order — ONE sort shuffle over |distinct outer
    * key+times| + |step| rows. The matched frame (one row per distinct
    * outer key+time) hash-joins back 1:1. A strict bound orders the
    * outer tag BEFORE equal-time step rows so equal values don't match;
    * an inclusive bound after. Step rows with a NULL key or NULL time
    * can never equi-match and are filtered; outer rows with a NULL time
    * mask to no-match (their tag can sort after step rows under the
    * reversed direction).
    */
  /** Stats hook for the ASOF lowering choice: (step base-table name, key
    * column, optional bare filter predicate) → (filtered row estimate,
    * key ndv). Passed per-query by GraftDatabase through
    * [[withQueryScope]] from its StatsManager — the same stats that
    * drive broadcast/build-side choice, lazily rebuilt for external
    * tables the way estimateBindings already does. Scope-carried (not a
    * global) so two databases lowering concurrently can't read each
    * other's stats. None (the default) = no stats, which keeps the
    * union-merge (the safe-at-scale choice).
    */
  type AsofStatsHook = (String, String, Option[Column]) => Option[(Long, Long)]
  val noAsofStats: AsofStatsHook = (_, _, _) => None
  /** Last ASOF lowering chosen ("union_merge" | "candidate") — tests. */
  @volatile var lastAsofChoice: Option[String] = None
  /** Avg step rows per key group at or below which the candidate join
    * wins: its per-left-row fan-out is bounded by the group size, and it
    * skips the union-merge's distinct + window + join-back (builder
    * measurement: the candidate join was ~0.14 s faster at sf0.1 on the
    * ~30-rows-per-user clicks fixture; truly dense groups — thousands of
    * step rows per key, where the fan-out explodes at scale — stay on
    * the union-merge).
    */
  private val AsofSparseThreshold = 64.0

  /** True when stats say the step side's key groups are SPARSE (avg rows
    * per group ≤ threshold) — then the candidate join's O(group) fan-out
    * is cheap and the union-merge's extra passes are not worth paying.
    * The step side may be a base table or a simple filtered projection
    * of one (the common `(SELECT * FROM t WHERE …) b` shape — its filter
    * feeds the sample-based cardinality estimate); anything richer, a
    * non-column key, or missing stats reads dense → union-merge, the
    * choice that stays safe at scale.
    */
  private def asofSparseGroups(q: BoundSelect,
      js: Analyzer.BoundJoinStep, p: Analyzer.AsofParts): Boolean = {
    val resolved: Option[(String, Option[Column])] =
      q.derived.get(js.table.binding) match {
        case None => Some((js.table.desc.name, None))
        case Some(sub: BoundSelect)
            if sub.tables.length == 1 && sub.joinSteps.isEmpty &&
              sub.groupBy.isEmpty && !sub.isAggregate && !sub.distinct &&
              sub.distinctOn.isEmpty && sub.having.isEmpty &&
              sub.qualify.isEmpty && sub.limit.isEmpty &&
              sub.offset.isEmpty && sub.derived.isEmpty &&
              !sub.predicate.exists(BoundExpr.containsSub) &&
              sub.projection.forall {
                case BoundItem.BICol(c, a) =>
                  a.forall(_.equalsIgnoreCase(c.attr.name))
                case _ => false
              } =>
          Some((sub.tables.head.desc.name, sub.predicate.map(lowerExprBare)))
        case _ => None
      }
    resolved.exists { case (tname, pred) =>
      val keyCols = p.eqPairs.map(_._2).collect {
        case BoundOperand.BCol(c) => c.attr.name
      }
      keyCols.length == p.eqPairs.length && {
        val hook =
          Option(scopeTL.get()).map(_.statsHook).getOrElse(noAsofStats)
        val stats = keyCols.flatMap(hook(tname, _, pred))
        stats.length == keyCols.length && {
          val rows = stats.head._1.toDouble
          // multi-key groups: ndvs multiply (capped by the row count)
          val ndv = math.min(stats.map(_._2.toDouble).product,
            math.max(rows, 1.0))
          rows / math.max(ndv, 1.0) <= AsofSparseThreshold
        }
      }
    }
  }

  private def asofUnionMerge(df: DataFrame, right: DataFrame,
      js: Analyzer.BoundJoinStep, p: Analyzer.AsofParts): DataFrame = {
    val b = js.table.binding
    val n = p.eqPairs.length
    val kL = (0 until n).map(i => s"__asof_lk$i")
    val rk = (0 until n).map(i => s"__asof_rk$i")
    val tL = "__asof_lt"
    val dfK = p.eqPairs.zipWithIndex.foldLeft(df) { case (d, ((lo, _), i)) =>
      d.withColumn(kL(i), lowerOperand(lo)) }
      .withColumn(tL, lowerOperand(p.ineq.outerOp))
    val leftKeys = dfK.select((kL :+ tL).map(col): _*).distinct()
    val right1 = p.stepOnly.foldLeft(right)((d, c) => d.filter(lowerExpr(c)))
      .filter((p.eqPairs.map(pr => lowerOperand(pr._2).isNotNull) :+
        lowerOperand(p.ineq.stepOp).isNotNull).reduce(_ && _))
    val rightCols = right.columns.toSeq
    val payload = struct(lit(1).as("__asof_pres") +: rightCols.map(right(_)): _*)
    // outer tag 0 sorts before equal-time step rows (tag 1) under a
    // strict bound, tag 2 after under an inclusive one — in BOTH scan
    // directions the running last then sees exactly the step rows the
    // bound admits
    val leftTag = if (p.ineq.strict) 0 else 2
    val taggedL = leftKeys.withColumn("__asof_side", lit(leftTag))
    val taggedR = right1.select(
      p.eqPairs.zipWithIndex.map { case ((_, ro), i) =>
        lowerOperand(ro).as(kL(i)) } ++
      Seq(lowerOperand(p.ineq.stepOp).as(tL), lit(1).as("__asof_side"),
        payload.as("__asof_p")): _*)
    val unioned = taggedL.unionByName(taggedR, allowMissingColumns = true)
    val ord =
      if (p.ineq.pickLargest) Seq(col(tL).asc, col("__asof_side").asc)
      else Seq(col(tL).desc, col("__asof_side").asc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(kL.map(col): _*).orderBy(ord: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val matchedRows = unioned
      .withColumn("__asof_m", last(col("__asof_p"), ignoreNulls = true).over(w))
      .filter(col("__asof_side") === leftTag)
    val stepFrame = matchedRows.select(
      kL.zipWithIndex.map { case (kn, i) => col(kn).as(rk(i)) } ++
      Seq(col(tL).as("__asof_rt"),
        when(col(tL).isNotNull, col("__asof_m")).as("__asof_m")): _*)
    val unpacked = stepFrame.select(
      rk.map(col) ++ Seq(col("__asof_rt"),
        col("__asof_m.__asof_pres").as("__asof_pres")) ++
      rightCols.map(c => col(s"__asof_m.$c").as(c)): _*)
    val stepAliased = unpacked.alias(b)
    val cond = ((0 until n).map(i => col(kL(i)) <=> col(s"$b.${rk(i)}")) :+
      (col(tL) <=> col(s"$b.__asof_rt"))).reduce(_ && _)
    val joined = dfK.join(stepAliased, cond, "inner")
    val res = if (js.kind == "asof")
      joined.filter(col(s"$b.__asof_pres").isNotNull)
    else joined
    res.drop((kL ++ Seq(tL) ++ rk ++ Seq("__asof_rt", "__asof_pres")): _*)
  }

  /** Fuse a correlated set-operation LATERAL into the enclosing join
    * group: each branch becomes a frame of (first-branch visible columns
    * + the hidden correlation keys). A correlated branch carries its own
    * inner key values (rows with a NULL key component can never equi-
    * match an outer key, so they are filtered); an uncorrelated branch
    * is COMPLETED over the distinct outer keys observed in the enclosing
    * frame — its rows appear for every key, including the NULL key
    * group. The set operations then fold over the (row, key) tuples,
    * which IS per-key set semantics (set ops compare NULLs equal, so the
    * NULL key group behaves like any other key), and one null-safe equi
    * join attaches the result. Key-bounded shuffles only — never a
    * per-outer-row re-execution of any branch.
    */
  private def joinSetLateral(spark: SparkSession, df: DataFrame,
      bt: BoundTable, ls: Analyzer.BoundLateralSet,
      source: BoundTable => DataFrame): DataFrame = {
    def qcolOf(bc: BoundCol): Column = col(s"${bc.binding}.${bc.attr.name}")
    val visNames = bt.desc.attributes.map(_.name)
      .dropRight(ls.hiddenKeys.length)
    val allNames = visNames ++ ls.hiddenKeys
    lazy val outKeys = df.select(ls.keyOuter.zipWithIndex.map { case (oc, i) =>
      qcolOf(oc).as(ls.hiddenKeys(i)) }: _*).distinct()
    def frame(core: BoundSelect, innerKeys: Seq[BoundCol]): DataFrame =
      if (innerKeys.isEmpty)
        lowerSelect(spark, core, source).crossJoin(outKeys).toDF(allNames: _*)
      else {
        val c = combine(spark, core, source, Set.empty, None)
        val visible = core.projection.map {
          case BoundItem.BICol(bc, a)  => qcolOf(bc).as(a.getOrElse(bc.attr.name))
          case BoundItem.BIExpr(op, a) => lowerOperandWith(op, qcolOf).as(a)
          case other => sys.error(s"unreachable set-LATERAL projection item $other")
        }
        val keys = innerKeys.zipWithIndex.map { case (ic, i) =>
          qcolOf(ic).as(ls.hiddenKeys(i)) }
        c.filter(innerKeys.map(ic => qcolOf(ic).isNotNull).reduce(_ && _))
          .select(visible ++ keys: _*).toDF(allNames: _*)
      }
    val folded = lowerUnion(
      frame(ls.branches.head._2, ls.branches.head._3),
      ls.branches.tail.map { case (conn, core, ks) => (conn, frame(core, ks)) },
      Nil, None, None)
    val frame2 = folded.alias(bt.binding)
    val on = ls.keyOuter.zipWithIndex.map { case (oc, i) =>
      qcolOf(oc) <=> col(s"${bt.binding}.${ls.hiddenKeys(i)}") }.reduce(_ && _)
    df.join(frame2, on)
  }

  /** Correlated scalar aggregate: GROUP BY the decorrelated keys — one row
    * per key by construction. Callers LEFT-join the frame, not inner:
    * for an outer row with no matching key the scalar is SQL-NULL —
    * EXCEPT count(), whose value over an empty correlated set is 0, which
    * only an outer join with a coalesce can reproduce (the classic COUNT
    * decorrelation trap). Returns (per-key frame, join condition builder
    * over the caller's outer-column resolver, the scalar value column).
    */
  private def correlatedScalarAgg(spark: SparkSession, sub: BoundSelect,
      pairs: Seq[(BoundCol, BoundCol)], source: BoundTable => DataFrame,
      scalarName: String, keyPrefix: String)
      : (DataFrame, (BoundCol => Column) => Column, Column) = {
    def qcolOf(bc: BoundCol): Column = col(s"${bc.binding}.${bc.attr.name}")
    val core = combine(spark, sub, source, Set.empty, None)
    val keyCols = pairs.zipWithIndex.map { case ((_, ic), k) =>
      qcolOf(ic).as(s"$keyPrefix$k") }
    // count() over an empty correlated set is 0, not NULL — the classic
    // COUNT decorrelation trap. The coalesce wraps the POST-left-join
    // column reference, so unmatched outer keys read 0 too.
    val (subAgg, scalar) = sub.projection.head match {
      case BoundItem.BIAgg(f, arg, _, dist) =>
        val g = core.groupBy(keyCols: _*).agg(
          aggCallCol(f, arg, dist, lowerOperandWith(_, qcolOf)).as(scalarName))
        (g, if (f == "count") coalesce(g(scalarName), lit(0L)) else g(scalarName))
      case BoundItem.BIExpr(op, _) =>
        // an expression OVER aggregate calls (0.2 * avg(x), the TPC-H
        // Q17 shape): each distinct aggregate node computes as a hidden
        // per-key column, the expression projects over them post-join
        val nodes = Analyzer.BoundOperand.aggNodes(op).distinct
        val hidden = nodes.zipWithIndex.map {
          case (BoundOperand.BAgg(f, arg, dist), i) =>
            aggCallCol(f, arg, dist, lowerOperandWith(_, qcolOf))
              .as(s"${scalarName}_a$i")
          case other => sys.error(s"unreachable aggregate node $other")
        }
        val g = core.groupBy(keyCols: _*).agg(hidden.head, hidden.tail: _*)
        val nodeCol: Map[BoundOperand, Column] = nodes.zipWithIndex.map {
          case (n, i) =>
            val c = g(s"${scalarName}_a$i")
            n -> (n match {
              case BoundOperand.BAgg("count", _, _) => coalesce(c, lit(0L))
              case _                                => c
            })
        }.toMap
        def low(o: BoundOperand): Column = nodeCol.getOrElse(o, o match {
          case BoundOperand.BArith(ch, l, r) => arith(ch, low(l), low(r))
          case BoundOperand.BFunc(f2, args)  => lowerFunc(f2, args, low)
          case BoundOperand.BCase(bs, els)   => caseCol(bs, els, low)
          case BoundOperand.BCast(x, t)      => low(x).cast(t.spark)
          case BoundOperand.BTryCast(x, t)   => low(x).try_cast(t.spark)
          case BoundOperand.BLit(l2)         => lowerLit(l2)
          case BoundOperand.BInterval(n2, u) => intervalCol(n2, u)
          case other => sys.error(
            s"unreachable operand in correlated scalar expression: $other")
        })
        (g, low(op))
      case _ => sys.error("unreachable: analyzer requires a single aggregate call")
    }
    val keyCond = (outer: BoundCol => Column) => pairs.zipWithIndex
      .map { case ((oc, _), k) => outer(oc) === subAgg(s"$keyPrefix$k") }
      .reduce(_ && _)
    (subAgg, keyCond, scalar)
  }

  /** Inequality-correlated scalar aggregate (running-total bodies:
    * `(SELECT sum(x) FROM t2 WHERE t2.k = t.k AND t2.ts <= t.ts)`) —
    * the union-merge lowering, same single-sort shape as the ASOF path.
    * The DISTINCT outer (keys, bound) tuples and the inner rows union;
    * ONE running window aggregate per agg node over (key partition,
    * bound order, tag tiebreak) computes every per-tuple prefix (or
    * suffix, for >/>=) aggregate at the tag rows; the one-row-per-tuple
    * tag frame then left-joins back 1:1 null-safely. No O(matches)
    * candidate fan-out: wall-clock is one sort shuffle over |distinct
    * outer tuples| + |inner rows| (the Neumann-style unnesting the
    * reference cites as its long-term goal, execution/plan.rs:41-46).
    *
    * Inclusive bounds (<=, >=) sort equal-valued inner rows BEFORE the
    * tag; strict bounds after. Inner rows with a NULL key or NULL bound
    * can never satisfy the correlation and are filtered; outer tuples
    * with a NULL bound sort first (nulls_first both directions), so
    * their prefix is empty — sum/avg/min/max read NULL, count reads 0,
    * exactly the SQL aggregate-over-empty-set semantics.
    */
  private def correlatedRunningAgg(spark: SparkSession, df: DataFrame,
      sub: BoundSelect, pairs: Seq[(BoundCol, BoundCol)],
      iq: Analyzer.CorrIneq, source: BoundTable => DataFrame,
      name: String, qcolOuter: BoundCol => Column): (DataFrame, Column) = {
    def qcolSub(bc: BoundCol): Column = col(s"${bc.binding}.${bc.attr.name}")
    val core = combine(spark, sub, source, Set.empty, None)
    val kN = pairs.indices.map(j => s"${name}_k$j")
    val tN = s"${name}_t"
    val tagN = s"${name}_tag"
    val nodes: Seq[(String, Option[BoundOperand])] = sub.projection.head match {
      case BoundItem.BIAgg(f, arg, _, _) => Seq((f, arg))
      case BoundItem.BIExpr(op, _) =>
        Analyzer.BoundOperand.aggNodes(op).distinct.map {
          case BoundOperand.BAgg(f, arg, _) => (f, arg)
          case other => sys.error(s"unreachable aggregate node $other")
        }
      case _ => sys.error("unreachable: analyzer requires a single aggregate call")
    }
    val inner0 = core.select(
      pairs.zipWithIndex.map { case ((_, ic), j) => qcolSub(ic).as(kN(j)) } ++
        Seq(lowerOperandWith(iq.innerOp, qcolSub).as(tN)) ++
        nodes.zipWithIndex.map { case ((_, arg), j) =>
          // count(*) rides an indicator column (counts rows, not values)
          arg.map(lowerOperandWith(_, qcolSub)).getOrElse(lit(1L))
            .as(s"${name}_a$j") }: _*)
      .filter((kN.map(col) :+ col(tN)).map(_.isNotNull).reduce(_ && _))
      .withColumn(tagN, lit(false))
    val tags = df.select(
      pairs.zipWithIndex.map { case ((oc, _), j) =>
        qcolOuter(oc).as(kN(j)) } :+
        lowerOperandWith(iq.outerOp, qcolOuter).as(tN): _*)
      .distinct()
      .withColumn(tagN, lit(true))
    // the tag side has no aggregate-arg columns — unionByName fills them
    // with typed NULLs, which every running aggregate skips
    val unioned = inner0.unionByName(tags, allowMissingColumns = true)
    val asc = iq.op == Ast.CmpOp.Lt || iq.op == Ast.CmpOp.Le
    val inclusive = iq.op == Ast.CmpOp.Le || iq.op == Ast.CmpOp.Ge
    val tie = when(col(tagN), lit(if (inclusive) 1 else 0))
      .otherwise(lit(if (inclusive) 0 else 1))
    val ordExprs = Seq(
      (if (asc) col(tN).asc_nulls_first else col(tN).desc_nulls_first),
      tie.asc)
    val ran =
      if (kN.nonEmpty) {
        // equality keys partition the running window — scales on its own
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(kN.map(col): _*)
          .orderBy(ordExprs: _*)
          .rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0L)
        val resCols = nodes.zipWithIndex.map { case ((f, _), j) =>
          val a = col(s"${name}_a$j")
          (f match {
            case "count" => count(a)
            case "sum"   => sum(a)
            case "avg"   => avg(a)
            case "min"   => min(a)
            case "max"   => max(a)
            case other   => sys.error(s"unreachable running aggregate $other")
          }).over(w).as(s"${name}_r$j")
        }
        unioned.select(col("*") +: resCols: _*)
          .filter(col(tagN))
          .select(kN.map(col) ++ Seq(col(tN)) ++
            nodes.indices.map(j => col(s"${name}_r$j")): _*)
      } else {
        // NO equality keys: an unpartitioned running window would plan
        // as Exchange SinglePartition — every inner row through one
        // task, the classic 100×-scale killer. Instead, a DISTRIBUTED
        // PREFIX SCAN: range-partition by the running order, run the
        // prefix window INSIDE each bucket (parallel), aggregate one
        // total row per bucket (tiny), take the EXCLUSIVE prefix of
        // those totals over bucket ids (P rows on one task — trivial),
        // broadcast the offsets back and combine. avg decomposes into
        // sum/count (offsets aren't averageable); min/max combine with
        // null-skipping least/greatest; count offsets coalesce to 0.
        val pidN = s"${name}_pid"
        val nParts = spark.sessionState.conf.numShufflePartitions
        // lazy local checkpoint: the bucketing feeds both the in-bucket
        // windows and the per-bucket totals — RangePartitioner's
        // RDD-id-seeded boundary sampling must not run twice (see
        // attachGlobalOrderedWins)
        val bucketed = materializeOnce(unioned
          .repartitionByRange(nParts, ordExprs: _*)
          .withColumn(pidN, spark_partition_id()))
        val wB = org.apache.spark.sql.expressions.Window
          .partitionBy(col(pidN)).orderBy(ordExprs: _*)
          .rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0L)
        val wP = org.apache.spark.sql.expressions.Window
          .orderBy(col(pidN).asc)
          .rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, -1L)
        // per node: (running columns in-bucket, per-bucket totals,
        // exclusive-prefix offsets, final combiner over run+off columns)
        def runN(j: Int, c: String) = s"${name}_run${j}_$c"
        def totN(j: Int, c: String) = s"${name}_tot${j}_$c"
        def offN(j: Int, c: String) = s"${name}_off${j}_$c"
        val parts: Seq[(Seq[Column], Seq[Column], Seq[Column], Column)] =
          nodes.zipWithIndex.map { case ((f, _), j) =>
            val a = col(s"${name}_a$j")
            f match {
              case "count" => (
                Seq(count(a).over(wB).as(runN(j, "c"))),
                Seq(count(a).as(totN(j, "c"))),
                Seq(sum(col(totN(j, "c"))).over(wP).as(offN(j, "c"))),
                coalesce(col(offN(j, "c")), lit(0L)) + col(runN(j, "c")))
              case "sum" => (
                Seq(sum(a).over(wB).as(runN(j, "s"))),
                Seq(sum(a).as(totN(j, "s"))),
                Seq(sum(col(totN(j, "s"))).over(wP).as(offN(j, "s"))),
                coalesce(col(offN(j, "s")) + col(runN(j, "s")),
                  col(offN(j, "s")), col(runN(j, "s"))))
              case "min" => (
                Seq(min(a).over(wB).as(runN(j, "m"))),
                Seq(min(a).as(totN(j, "m"))),
                Seq(min(col(totN(j, "m"))).over(wP).as(offN(j, "m"))),
                least(col(offN(j, "m")), col(runN(j, "m"))))
              case "max" => (
                Seq(max(a).over(wB).as(runN(j, "m"))),
                Seq(max(a).as(totN(j, "m"))),
                Seq(max(col(totN(j, "m"))).over(wP).as(offN(j, "m"))),
                greatest(col(offN(j, "m")), col(runN(j, "m"))))
              case "avg" => (
                Seq(sum(a).over(wB).as(runN(j, "s")),
                  count(a).over(wB).as(runN(j, "c"))),
                Seq(sum(a).as(totN(j, "s")), count(a).as(totN(j, "c"))),
                Seq(sum(col(totN(j, "s"))).over(wP).as(offN(j, "s")),
                  sum(col(totN(j, "c"))).over(wP).as(offN(j, "c"))),
                {
                  val cnt = coalesce(col(offN(j, "c")), lit(0L)) +
                    col(runN(j, "c"))
                  val sm = coalesce(col(offN(j, "s")) + col(runN(j, "s")),
                    col(offN(j, "s")), col(runN(j, "s")))
                  when(cnt === 0L, lit(null)).otherwise(
                    sm.cast("double") / cnt)
                })
              case other => sys.error(s"unreachable running aggregate $other")
            }
          }
        val withRun = bucketed.select(col("*") +: parts.flatMap(_._1): _*)
        val totAggs = parts.flatMap(_._2)
        val totals = bucketed.groupBy(col(pidN))
          .agg(totAggs.head, totAggs.tail: _*)
        val offsets = totals.select(col(pidN) +: parts.flatMap(_._3): _*)
        withRun.join(broadcast(offsets), Seq(pidN), "left_outer")
          .select(col("*") +: parts.zipWithIndex.map { case (p, j) =>
            p._4.as(s"${name}_r$j") }: _*)
          .filter(col(tagN))
          .select(Seq(col(tN)) ++
            nodes.indices.map(j => col(s"${name}_r$j")): _*)
      }
    val cond = (pairs.zipWithIndex.map { case ((oc, _), j) =>
      qcolOuter(oc) <=> ran(kN(j)) } :+
      (lowerOperandWith(iq.outerOp, qcolOuter) <=> ran(tN))).reduce(_ && _)
    val joined = df.join(ran, cond, "left_outer")
    val scalar = sub.projection.head match {
      case BoundItem.BIAgg(_, _, _, _) => ran(s"${name}_r0")
      case BoundItem.BIExpr(op, _) =>
        val nodeCol: Map[BoundOperand, Column] =
          Analyzer.BoundOperand.aggNodes(op).distinct.zipWithIndex.map {
            case (n2, j) => (n2: BoundOperand) -> ran(s"${name}_r$j")
          }.toMap
        def low(o: BoundOperand): Column = nodeCol.getOrElse(o, o match {
          case BoundOperand.BArith(ch, l, r) => arith(ch, low(l), low(r))
          case BoundOperand.BFunc(f2, args)  => lowerFunc(f2, args, low)
          case BoundOperand.BCase(bs, els)   => caseCol(bs, els, low)
          case BoundOperand.BCast(x, t)      => low(x).cast(t.spark)
          case BoundOperand.BTryCast(x, t)   => low(x).try_cast(t.spark)
          case BoundOperand.BLit(l2)         => lowerLit(l2)
          case BoundOperand.BInterval(n2, u) => intervalCol(n2, u)
          case other => sys.error(
            s"unreachable operand in running scalar expression: $other")
        })
        low(op)
      case _ => sys.error("unreachable: analyzer requires a single aggregate call")
    }
    (joined, scalar)
  }

  /** The relational core of a SELECT: inner-join group (stats-ordered when
    * a plan is given), WHERE conjuncts, outer-join steps, then subquery
    * conjuncts as semi/anti/broadcast joins. Everything before
    * projection/aggregation/ordering — reused directly as the candidate
    * frame of a correlated subquery (whose projection semantics the
    * enclosing join supplies).
    */
  private def combine(spark: SparkSession, q: BoundSelect,
      source: BoundTable => DataFrame,
      broadcastBindings: Set[String],
      joinPlan: Option[JoinOrder.Tree]): DataFrame = {
    // aggregate LATERAL frames need the enclosing frame first (their
    // completion keys come from it) — they join after the plain phase
    val aggLats: Seq[(BoundTable, Analyzer.BoundQuery)] = q.tables.flatMap(bt =>
      q.derived.get(bt.binding) match {
        case Some(l: Analyzer.BoundLateral) if l.agg      => Some((bt, l))
        case Some(ls: Analyzer.BoundLateralSet)           => Some((bt, ls))
        case _ => None
      })
    val aggLatB = aggLats.map(_._1.binding).toSet
    val plainTables = q.tables.filterNot(bt => aggLatB(bt.binding))
    val base0 = plainTables.map { bt =>
      // a derived table lowers its subquery in place of a scan
      val df0 = q.derived.get(bt.binding) match {
        case Some(sub) => lowerDerived(spark, sub, source)
        case None      => source(bt)
      }
      val df = df0.alias(bt.binding)
      // stats-driven build-side choice (the reference swaps hash-join build
      // sides from estimates the same way, optimizer/optimizer.rs:177-180)
      if (broadcastBindings(bt.binding)) broadcast(df) else df
    }
    // SELECT without FROM evaluates over one synthetic row — in ONE
    // partition: the no-arg spark.range defaults to defaultParallelism
    // slices, so a K-row VALUES (a union of K such selects) built a
    // 32·K-partition frame whose near-empty partitions every downstream
    // job re-paid as tasks (measured: 96-task broadcast builds on a
    // 3-row VALUES at parallelism 32)
    val base =
      if (base0.nonEmpty) base0
      else Seq(spark.range(0L, 1L, 1L, 1).toDF().drop("id"))
    val allConj: Seq[BoundExpr] = q.predicate.map(conjuncts).getOrElse(Nil)
    // subquery conjuncts — IN/EXISTS/scalar comparisons — lower as joins
    // AFTER the plain filter/join phase. A PURE top-level subquery
    // conjunct takes the efficient semi/anti-join path; a MIXED conjunct
    // (subqueries under OR) lowers each subquery to a boolean-marker
    // left join and filters the disjunction afterwards.
    val (subConjs, restConj) = allConj.partition {
      case _: BoundExpr.BInSub | _: BoundExpr.BExists | _: BoundExpr.BCmpSub |
           _: BoundExpr.BRowInSub => true
      case _ => false
    }
    val (mixedSubConjs, conj0) = restConj.partition(BoundExpr.containsSub)
    // a conjunct that references an outer-joined table must evaluate AFTER
    // that join (it would be unresolvable — and wrong — before it). And
    // once any RIGHT/FULL step can null-extend the INNER group's side,
    // even inner-group-only conjuncts must wait: filtering before the
    // join changes which step rows null-extend (a row eliminated early
    // would, in SQL, still join and then be dropped by WHERE — its step
    // matches must NOT null-extend in its place)
    val innerB = q.tables.map(_.binding).toSet
    val leftNullExtending =
      q.joinSteps.exists(js => js.kind == "right" || js.kind == "full")
    val (conj1, postOuterConj) =
      if (leftNullExtending) (Nil, conj0)
      else conj0.partition(c =>
        Analyzer.exprCols(c).map(_.binding).toSet.subsetOf(innerB))
    // LATERAL key equalities are JOIN conditions of the leading FROM
    // group: they always apply here — deferring them past a RIGHT/FULL
    // step would filter that step's null-extended rows away
    val conj2 = conj1 ++ q.lateralConjs
    // conjuncts reading an aggregate-lateral column wait for its join
    val (aggLatConj, conj) = conj2.partition(c =>
      Analyzer.exprCols(c).exists(x => aggLatB(x.binding)))
    // equi-conjunct across two bindings → usable as an explicit join cond
    def equiSides(c: BoundExpr): Option[(String, String)] = c match {
      case BoundExpr.BCmp(Ast.CmpOp.Eq, BoundOperand.BCol(a), BoundOperand.BCol(b))
          if a.binding != b.binding => Some((a.binding, b.binding))
      case _ => None
    }
    val plainFiltered = joinPlan match {
      case Some(tree) =>
        // stats-chosen join ORDER (GraftDatabase.planJoinOrder → DPccp
        // parity): build the tree explicitly, attaching each equi-conjunct
        // at the first join where both its sides are available; everything
        // else stays a residual filter on top (Catalyst pushes it down).
        val conjIdx = conj.zipWithIndex
        val used = scala.collection.mutable.Set.empty[Int]
        def build(t: JoinOrder.Tree): (DataFrame, Set[String]) = t match {
          case JoinOrder.Leaf(i) => (base(i), Set(plainTables(i).binding))
          case JoinOrder.Node(l, r, _) =>
            val (ld, ls) = build(l)
            val (rd, rs) = build(r)
            val conds = conjIdx.filter { case (c, i) =>
              !used(i) && equiSides(c).exists { case (x, y) =>
                (ls(x) && rs(y)) || (ls(y) && rs(x))
              }
            }
            conds.foreach { case (_, i) => used += i }
            val df =
              if (conds.isEmpty) ld.crossJoin(rd)
              else ld.join(rd, conds.map(c => lowerExpr(c._1)).reduce(_ && _))
            (df, ls ++ rs)
        }
        val (joined, _) = build(tree)
        val residual = conjIdx.collect { case (c, i) if !used(i) => c }
        if (residual.isEmpty) joined
        else joined.filter(residual.map(lowerExpr).reduce(_ && _))
      case None =>
        val joined = base.reduceLeft(_.crossJoin(_))
        if (conj.isEmpty) joined
        else joined.filter(conj.map(lowerExpr).reduce(_ && _))
    }
    // aggregate LATERAL frames fuse in (their completion keys read the
    // frame built so far), then conjuncts over their columns filter
    val withAggLats = aggLats.foldLeft(plainFiltered) {
      case (df, (bt, l: Analyzer.BoundLateral)) =>
        joinAggLateral(spark, df, bt, l, source)
      case (df, (bt, ls: Analyzer.BoundLateralSet)) =>
        joinSetLateral(spark, df, bt, ls, source)
      case (_, (_, other)) => sys.error(s"unreachable fused lateral $other")
    }
    val aggLatFiltered =
      if (aggLatConj.isEmpty) withAggLats
      else withAggLats.filter(aggLatConj.map(lowerExpr).reduce(_ && _))
    // join steps (outer, or inner-after-outer) fold in declaration order
    // with their ON attached; WHERE conjuncts touching these tables
    // filter afterwards (SQL order)
    val withOuter = q.joinSteps.foldLeft(aggLatFiltered) { (df, js) =>
      // a derived step side lowers its subquery in place of a scan
      val right0 = q.derived.get(js.table.binding) match {
        case Some(sub) => lowerDerived(spark, sub, source)
        case None      => source(js.table)
      }
      val right = right0.alias(js.table.binding)
      js.kind match {
        case "asof" | "asof_left" =>
          Analyzer.asofDecompose(js.on, js.table.binding) match {
            case Some(p) if p.eqPairs.nonEmpty && !p.fallback &&
                !asofSparseGroups(q, js, p) =>
              lastAsofChoice = Some("union_merge")
              asofUnionMerge(df, right, js, p)
            case d =>
              if (d.exists(p => p.eqPairs.nonEmpty && !p.fallback))
                lastAsofChoice = Some("candidate")
              // Candidate-join fallback (no equality keys, or residual
              // conjuncts reading the outer side): join on the full ON,
              // then keep per left row only the nearest match via a
              // row_number window over a synthetic left-row id. Fan-out
              // before the prune is O(matches) inside a key group.
              val (tsOp, pickLargest) = Analyzer.asofParts(js.on, js.table.binding)
                .fold(m => sys.error(s"unreachable: analyzer passed a bad ASOF ON: $m"),
                  identity)
              val lid = "__asof_lid"; val mk = "__asof_m"; val rn = "__asof_rn"
              val l1 = df.withColumn(lid, monotonically_increasing_id())
              val r1 = right.withColumn(mk, lit(1))
              val joined = l1.join(r1, lowerExpr(js.on), "left_outer")
              val ord = if (pickLargest) lowerOperand(tsOp).desc_nulls_last
                        else lowerOperand(tsOp).asc_nulls_last
              val w = org.apache.spark.sql.expressions.Window
                .partitionBy(col(lid)).orderBy(ord)
              val picked = joined.withColumn(rn, row_number().over(w))
                .filter(col(rn) === 1)
              val res = if (js.kind == "asof") picked.filter(col(mk).isNotNull)
                        else picked
              res.drop(lid).drop(rn).drop(mk)
          }
        case _ =>
          val sparkType = js.kind match {
            case "left"  => "left_outer"
            case "right" => "right_outer"
            case "full"  => "full_outer"
            case "semi"  => "left_semi"
            case "anti"  => "left_anti"
            case _       => "inner"
          }
          df.join(right, lowerExpr(js.on), sparkType)
      }
    }
    val postFiltered =
      if (postOuterConj.isEmpty) withOuter
      else withOuter.filter(postOuterConj.map(lowerExpr).reduce(_ && _))
    // each subquery lowers independently (its own scope); membership joins
    // left-semi/left-anti on the single output column (plus decorrelated
    // equality pairs), EXISTS the same without a value column, and a
    // scalar comparison broadcast-joins the one-row frame and filters
    def qcolOf(bc: BoundCol): Column = col(s"${bc.binding}.${bc.attr.name}")
    val afterSubs = subConjs.zipWithIndex.foldLeft(postFiltered) {
      case (df, (BoundExpr.BInSub(o, sub, pairs, neg), _)) =>
        val joinType = if (neg) "left_anti" else "left_semi"
        if (pairs.isEmpty) {
          val subDf = lowerSelect(spark, sub, source)
          if (neg) {
            // Null-aware NOT IN (SQL 3VL): the whole predicate is TRUE only
            // when the subquery is empty, or the probe is non-NULL, the
            // subquery has no NULLs, and no value matches. The NULL/empty
            // facts are one broadcast 1-row aggregate (count vs non-null
            // count); the no-match part stays a plain hash anti join — no
            // nested-loop NAAJ plan at any scale.
            val vcol = subDf.columns.head
            val facts = subDf.agg(count(lit(1)).as("__nin_n"),
              count(col(vcol)).as("__nin_nonnull"))
            df.join(broadcast(facts), lit(true), "inner")
              .filter(col("__nin_n") === 0 ||
                (lowerOperand(o).isNotNull && col("__nin_n") === col("__nin_nonnull")))
              .drop("__nin_n", "__nin_nonnull")
              .join(subDf, lowerOperand(o) === subDf(vcol), "left_anti")
          } else
            df.join(subDf, lowerOperand(o) === subDf(subDf.columns.head), joinType)
        } else {
          // correlated: the subquery's core + its IN value + the inner
          // side of each decorrelated pair, joined semi/anti on all of them
          val core = combine(spark, sub, source, Set.empty, None)
          val inVal = sub.projection.head match {
            case BoundItem.BICol(c, _)    => qcolOf(c)
            case BoundItem.BIExpr(op2, _) => lowerOperandWith(op2, qcolOf)
            case _: BoundItem.BIAgg | _: BoundItem.BIWin =>
              sys.error("unreachable: a correlated subquery must not aggregate or window")
          }
          val subDf = core.select(inVal.as("__in_v") +:
            pairs.zipWithIndex.map { case ((_, ic), k) => qcolOf(ic).as(s"__c$k") }: _*)
          val pairConds =
            pairs.zipWithIndex.map { case ((oc, _), k) => qcolOf(oc) === subDf(s"__c$k") }
          // null-aware for NOT IN: a per-key set member that is NULL (or a
          // NULL probe against a non-empty key set) poisons the predicate
          // to non-TRUE, so the anti join must also match on those. The
          // pair equalities stay equi keys — Spark hash-partitions on them
          // and evaluates the disjunction as the join's extra condition.
          val valCond =
            if (neg) lowerOperand(o) === subDf("__in_v") ||
              lowerOperand(o).isNull || subDf("__in_v").isNull
            else lowerOperand(o) === subDf("__in_v")
          df.join(subDf, (valCond +: pairConds).reduce(_ && _), joinType)
        }
      case (df, (BoundExpr.BRowInSub(os, sub, pairs, true), _)) =>
        // Null-aware row-value NOT IN, exact SQL 3VL: a row is KEPT iff
        // NO subquery row is "compatible" with the probe (compatible =
        // every component equal or null on either side — the rows whose
        // comparison is TRUE or UNKNOWN). Decomposition that never needs
        // a nested-loop join: for every PROPER subset U of components,
        // one HASH anti join keyed on the components outside U (plus the
        // decorrelated pair equalities), with the U components'
        // either-side-null test riding as the join's residual condition;
        // the U = all-components case has no component key left and
        // reduces to per-null-mask emptiness FACTS — one bounded
        // aggregate, broadcast when uncorrelated, left-joined per pair
        // key when correlated (an absent key = empty per-key set = kept).
        // 2^k - 1 key-bounded anti joins + one facts frame; the analyzer
        // caps k at 3, so the fan-out is at most 7 joins.
        {
          val k = os.length
          val subDf =
            if (pairs.isEmpty) {
              val subDf0 = lowerSelect(spark, sub, source)
              subDf0.toDF(subDf0.columns.indices.map(i => s"__rv$i"): _*)
            } else {
              val core = combine(spark, sub, source, Set.empty, None)
              val vals = sub.projection.map {
                case BoundItem.BICol(c, _)    => qcolOf(c)
                case BoundItem.BIExpr(op2, _) => lowerOperandWith(op2, qcolOf)
                case _: BoundItem.BIAgg | _: BoundItem.BIWin | _: BoundItem.BISub =>
                  sys.error("unreachable: a correlated subquery must not aggregate or window")
              }
              core.select(
                vals.zipWithIndex.map { case (v, i) => v.as(s"__rv$i") } ++
                pairs.zipWithIndex.map { case ((_, ic), j) => qcolOf(ic).as(s"__c$j") }: _*)
            }
          val probes = os.map(lowerOperand)
          val all = (1 << k) - 1
          // facts: for mask m, does S contain a row NULL on every
          // component in m? (m = 0 reads "is the [per-key] set non-empty")
          val factsAggs = (0 to all).map { m =>
            val cond = (0 until k).filter(i => (m & (1 << i)) != 0)
              .map(i => col(s"__rv$i").isNull)
              .foldLeft(lit(true))(_ && _)
            coalesce(max(when(cond, 1).otherwise(0)), lit(0)).as(s"__nf$m")
          }
          var cur =
            if (pairs.isEmpty)
              df.join(broadcast(subDf.agg(factsAggs.head, factsAggs.tail: _*)),
                lit(true), "inner")
            else {
              val facts = subDf
                .groupBy(pairs.indices.map(j => col(s"__c$j").as(s"__nfk$j")): _*)
                .agg(factsAggs.head, factsAggs.tail: _*)
              df.join(facts,
                pairs.zipWithIndex.map { case ((oc, _), j) =>
                  qcolOf(oc) === facts(s"__nfk$j") }.reduce(_ && _),
                "left_outer")
                .drop(pairs.indices.map(j => s"__nfk$j"): _*)
            }
          for (u <- 0 until all) {
            val conds = (0 until k).map { i =>
              if ((u & (1 << i)) != 0)
                probes(i).isNull || subDf(s"__rv$i").isNull
              else probes(i) === subDf(s"__rv$i")
            } ++ pairs.zipWithIndex.map { case ((oc, _), j) =>
              qcolOf(oc) === subDf(s"__c$j") }
            cur = cur.join(subDf, conds.reduce(_ && _), "left_anti")
          }
          // U = all components: a probe with null-mask m is killed iff
          // its [per-key] set has a row null on every component the
          // probe has NON-null (flags coalesce to 0 where the left join
          // found no key — an empty set keeps the row)
          val fullKill = (0 to all).map { m =>
            val probeMask = (0 until k).map { i =>
              if ((m & (1 << i)) != 0) probes(i).isNull else probes(i).isNotNull
            }.reduce(_ && _)
            probeMask && coalesce(col(s"__nf${all & ~m}"), lit(0)) === 1
          }.reduce(_ || _)
          cur.filter(!fullKill).drop((0 to all).map(m => s"__nf$m"): _*)
        }
      case (df, (BoundExpr.BRowInSub(os, sub, pairs, false), _)) =>
        // row-value membership: ONE left-semi join on every component
        // equality (+ the decorrelated pairs). NULL components never
        // match — SQL's UNKNOWN filtering false in a positive conjunct.
        // One shuffle keyed on the full component tuple; broadcast when
        // the subquery side is small (stats-driven like every join here).
        if (pairs.isEmpty) {
          val subDf0 = lowerSelect(spark, sub, source)
          val subDf = subDf0.toDF(subDf0.columns.indices.map(k => s"__rv$k"): _*)
          val conds = os.zipWithIndex.map { case (o, k) =>
            lowerOperand(o) === subDf(s"__rv$k") }
          df.join(subDf, conds.reduce(_ && _), "left_semi")
        } else {
          val core = combine(spark, sub, source, Set.empty, None)
          val vals = sub.projection.map {
            case BoundItem.BICol(c, _)    => qcolOf(c)
            case BoundItem.BIExpr(op2, _) => lowerOperandWith(op2, qcolOf)
            case _: BoundItem.BIAgg | _: BoundItem.BIWin | _: BoundItem.BISub =>
              sys.error("unreachable: a correlated subquery must not aggregate or window")
          }
          val subDf = core.select(
            vals.zipWithIndex.map { case (v, k) => v.as(s"__rv$k") } ++
            pairs.zipWithIndex.map { case ((_, ic), k) => qcolOf(ic).as(s"__c$k") }: _*)
          val conds = os.zipWithIndex.map { case (o, k) =>
            lowerOperand(o) === subDf(s"__rv$k") } ++
            pairs.zipWithIndex.map { case ((oc, _), k) => qcolOf(oc) === subDf(s"__c$k") }
          df.join(subDf, conds.reduce(_ && _), "left_semi")
        }
      case (df, (BoundExpr.BExists(sub, pairs, neg, residual), _)) =>
        val joinType = if (neg) "left_anti" else "left_semi"
        if (pairs.isEmpty && residual.isEmpty) {
          // uncorrelated EXISTS: emptiness of the whole subquery decides
          // for every outer row — a one-row broadcast semi join
          val subDf = lowerSelect(spark, sub, source).limit(1)
          df.join(broadcast(subDf), lit(true), joinType)
        } else {
          val core = combine(spark, sub, source, Set.empty, None)
          // residual (non-equality) correlated conjuncts ride the join
          // condition: their inner columns project into the build side,
          // their outer columns resolve against the probe side. The pair
          // equalities stay the equi keys — Spark hash-partitions on
          // them and evaluates the residual as the join's extra
          // condition (the TPC-H Q21 shape).
          val innerB = (sub.tables ++ sub.joinSteps.map(_.table))
            .map(_.binding).toSet
          val rcols = residual.flatMap(Analyzer.exprCols)
            .filter(c => innerB(c.binding)).distinct
          val subDf = core.select(
            pairs.zipWithIndex.map { case ((_, ic), k) =>
              qcolOf(ic).as(s"__c$k") } ++
            rcols.zipWithIndex.map { case (c, k) =>
              qcolOf(c).as(s"__r$k") }: _*)
          val rres: BoundCol => Column = {
            val m = rcols.zipWithIndex
              .map { case (c, k) => c -> subDf(s"__r$k") }.toMap
            bc => m.getOrElse(bc, qcolOf(bc))
          }
          val cond = (pairs.zipWithIndex
            .map { case ((oc, _), k) => qcolOf(oc) === subDf(s"__c$k") } ++
            residual.map(e =>
              lowerExprWith(e, op => lowerOperandWith(op, rres))))
            .reduce(_ && _)
          df.join(subDf, cond, joinType)
        }
      case (df, (BoundExpr.BCmpSub(op, o, sub, guard, pairs), i)) =>
        val scalarName = s"__scalar_$i"
        def cmpCond(lc: Column, sc: Column): Column = cmpCols(op, lc, sc)
        if (pairs.isEmpty) {
          val subDf0 = lowerSelect(spark, sub, source)
          if (guard)
            // runtime one-row contract, failing like the reference's error
            // surface (database.rs:38-45 style) — one bounded LIMIT-2 job
            // that also captures the value, so the subquery runs ONCE
            df.filter(cmpCond(lowerOperand(o), guardedScalarLit(subDf0)))
          else {
            val subDf = subDf0.toDF(scalarName)
            df.join(broadcast(subDf), cmpCond(lowerOperand(o), col(scalarName)), "inner")
              .drop(scalarName)
          }
        } else {
          val (subAgg, keyCond, scalar) =
            correlatedScalarAgg(spark, sub, pairs, source, scalarName, "__c")
          df.join(subAgg, keyCond(qcolOf), "left_outer")
            .filter(cmpCond(lowerOperand(o), scalar))
            .drop(scalarName +: pairs.indices.map(k => s"__c$k"): _*)
        }
      case (df, _) => df
    }
    mixedSubConjs.zipWithIndex.foldLeft(afterSubs) { case (df, (c, t)) =>
      applyMixedSubConjunct(spark, df, c, source, t)
    }
  }

  /** Execute an uncorrelated guarded scalar subquery ONCE: enforce the
    * one-row contract and return its value as a typed literal Column
    * (empty result → SQL NULL). One bounded job (LIMIT 2, one column)
    * replaces the former probe-then-rejoin shape that executed the
    * subquery twice; the subquery itself still computes distributed.
    */
  private def guardedScalarLit(subDf: DataFrame): Column = {
    val rows = subDf.limit(2).collect()
    if (rows.length > 1) throw new IllegalStateException(
      "scalar subquery returned more than one row")
    val dt = subDf.schema.fields.head.dataType
    rows.headOption.map(_.get(0)) match {
      case Some(v) if v != null => lit(v).cast(dt)
      case _                    => lit(null).cast(dt)
    }
  }

  /** Marker-join scope: subqueries appearing inside a general boolean /
    * operand expression (under OR, under NOT, or in CASE conditions) each
    * LEFT-join a marker frame onto the enclosing relational frame, and
    * the expression then evaluates columnar over the markers — never a
    * per-outer-row re-execution (the reference's own stated long-term
    * unnesting goal, execution/plan.rs:41-46).
    *
    * IN markers are THREE-VALUED exactly where SQL's NULL and FALSE are
    * distinguishable (a negated IN, or any IN under an enclosing NOT):
    * alongside the distinct-value match frame, a per-key facts frame
    * (row count + non-null count — one bounded aggregate, broadcast when
    * uncorrelated) joins too, and the predicate reads TRUE on match,
    * FALSE on an empty set, NULL on a NULL probe or a NULL-bearing set,
    * FALSE otherwise. Positive IN in a plain disjunction skips the facts
    * join (TRUE vs non-TRUE is all a filter consumes). EXISTS is
    * two-valued by definition; scalar-comparison markers are exact via
    * Spark's NULL-propagating comparisons over the left-joined scalar.
    *
    * Registration is eager (HAVING probes must register their hidden
    * aggregate columns before the agg assembles); the caller applies
    * `joins` (left_outer each) whenever its frame is ready and then
    * filters/projects with `pred`/`operand`.
    */
  private final class MarkerScope(spark: SparkSession,
      source: BoundTable => DataFrame, tag: String,
      outerKey: BoundCol => Column, opResolve: BoundOperand => Column) {
    val joins = scala.collection.mutable.ArrayBuffer.empty[(DataFrame, Column)]
    val drops = scala.collection.mutable.ArrayBuffer.empty[String]
    private val predOf = new java.util.IdentityHashMap[BoundExpr, Column]()
    private val opValOf = new java.util.IdentityHashMap[BoundOperand, Column]()
    private var k = 0
    private def fresh(): String = { val m = s"__mx${tag}_$k"; k += 1; m }
    private def qcolSub(bc: BoundCol): Column = col(s"${bc.binding}.${bc.attr.name}")

    /** TRUE on match / FALSE on empty set / NULL on NULL probe or
      * NULL-bearing set / FALSE otherwise — `x IN (set)` under full 3VL.
      */
    private def threeValuedIn(m: String, probe: Column): Column =
      when(coalesce(col(m), lit(false)), lit(true))
        .when(coalesce(col(s"${m}_n"), lit(0L)) === lit(0L), lit(false))
        .when(probe.isNull || col(s"${m}_nn") < col(s"${m}_n"),
          lit(null).cast("boolean"))
        .otherwise(lit(false))

    /** Register every subquery under `e` as marker joins. `obs` = an
      * enclosing NOT makes NULL-vs-FALSE observable, forcing 3VL markers.
      */
    def register(e: BoundExpr, obs: Boolean = false): Unit = e match {
      case BoundExpr.BAnd(l, r) => register(l, obs); register(r, obs)
      case BoundExpr.BOr(l, r)  => register(l, obs); register(r, obs)
      case BoundExpr.BNot(x)    => register(x, obs = true)
      case BoundExpr.BIsNull(o, _)        => registerOp(o)
      case BoundExpr.BLike(o, _, _, _, _) => registerOp(o)
      case BoundExpr.BCmp(_, l, r)        => registerOp(l); registerOp(r)
      case s @ BoundExpr.BExists(sub, pairs, neg, residual) =>
        require(residual.isEmpty, "unreachable: analyzer restricts " +
          "residual EXISTS to top-level WHERE conjuncts")
        val m = fresh()
        if (pairs.isEmpty)
          joins += ((broadcast(lowerSelect(spark, sub, source).limit(1)
            .select(lit(true).as(m))), lit(true)))
        else {
          val core = combine(spark, sub, source, Set.empty, None)
          val keyed = core.select(pairs.zipWithIndex.map { case ((_, ic), i) =>
            qcolSub(ic).as(s"${m}_$i") }: _*).distinct().withColumn(m, lit(true))
          joins += ((keyed, pairs.zipWithIndex.map { case ((oc, _), i) =>
            outerKey(oc) === keyed(s"${m}_$i") }.reduce(_ && _)))
          drops ++= pairs.indices.map(i => s"${m}_$i")
        }
        drops += m
        val p = coalesce(col(m), lit(false))
        predOf.put(s, if (neg) !p else p)
      case s @ BoundExpr.BInSub(o, sub, pairs, neg) =>
        val m = fresh()
        registerOp(o)
        val probe = operand(o)
        // NULL-vs-FALSE is observable for NOT IN (the negation flips
        // FALSE to TRUE but keeps NULL) and under any enclosing NOT
        val three = neg || obs
        if (pairs.isEmpty) {
          val subDf = lowerSelect(spark, sub, source)
          val vcol = subDf.columns.head
          val keyed = subDf.toDF(s"${m}_v").distinct().withColumn(m, lit(true))
          joins += ((keyed, probe === keyed(s"${m}_v")))
          drops ++= Seq(m, s"${m}_v")
          val p =
            if (!three) coalesce(col(m), lit(false))
            else {
              val facts = broadcast(subDf.agg(count(lit(1)).as(s"${m}_n"),
                count(col(vcol)).as(s"${m}_nn")))
              joins += ((facts, lit(true)))
              drops ++= Seq(s"${m}_n", s"${m}_nn")
              threeValuedIn(m, probe)
            }
          predOf.put(s, if (neg) !p else p)
        } else {
          val core = combine(spark, sub, source, Set.empty, None)
          val inVal = sub.projection.head match {
            case BoundItem.BICol(c, _)    => qcolSub(c)
            case BoundItem.BIExpr(op2, _) => lowerOperandWith(op2, qcolSub)
            case _ => sys.error(
              "unreachable: a correlated subquery must not aggregate or window")
          }
          val keyed = core.select(inVal.as(s"${m}_v") +:
            pairs.zipWithIndex.map { case ((_, ic), i) =>
              qcolSub(ic).as(s"${m}_$i") }: _*).distinct().withColumn(m, lit(true))
          joins += ((keyed, ((probe === keyed(s"${m}_v")) +:
            pairs.zipWithIndex.map { case ((oc, _), i) =>
              outerKey(oc) === keyed(s"${m}_$i") }).reduce(_ && _)))
          drops ++= Seq(m, s"${m}_v") ++ pairs.indices.map(i => s"${m}_$i")
          val p =
            if (!three) coalesce(col(m), lit(false))
            else {
              // per-correlation-key facts: one hash aggregate on the same
              // equi keys the marker joins on — shuffle-bounded at scale
              val facts = core.select(inVal.as(s"${m}_fv") +:
                pairs.zipWithIndex.map { case ((_, ic), i) =>
                  qcolSub(ic).as(s"${m}_f$i") }: _*)
                .groupBy(pairs.indices.map(i => col(s"${m}_f$i")): _*)
                .agg(count(lit(1)).as(s"${m}_n"), count(col(s"${m}_fv")).as(s"${m}_nn"))
              joins += ((facts, pairs.zipWithIndex.map { case ((oc, _), i) =>
                outerKey(oc) === facts(s"${m}_f$i") }.reduce(_ && _)))
              drops ++= Seq(s"${m}_n", s"${m}_nn") ++ pairs.indices.map(i => s"${m}_f$i")
              threeValuedIn(m, probe)
            }
          predOf.put(s, if (neg) !p else p)
        }
      case s @ BoundExpr.BRowInSub(os, sub, pairs, neg) =>
        // (a, b, …) IN (SELECT …) as a marker — exact SQL 3VL with NO
        // nested-loop join. TRUE = an exact-match marker (one equi join
        // on all components of the DISTINCT set). FALSE vs NULL =
        // per-null-mask compatibility markers: for every nonempty mask U
        // of components, one frame GROUPED BY the outside-U components
        // (equi keys) carrying ∃-flags per null-pattern subset of U —
        // grouping (not distinct rows) keeps the left join 1:1, so
        // markers never duplicate outer rows. The probe's own null
        // pattern selects the flag columnar-ly. k ≤ 3
        // (analyzer-enforced), so ≤ 7 keyed joins + 1 facts frame.
        // CORRELATED probes ride the same frames with the decorrelated
        // inner keys as EXTRA grouping/join columns — the per-outer-key
        // set semantics fall out of the grouping, still 1:1 left joins.
        os.foreach(registerOp)
        val probes = os.map(operand)
        val k = os.length
        val kp = pairs.length
        val m = fresh()
        // core columns normalized: components ${m}_v*, then the
        // correlation keys ${m}_p* (a correlated body lowers its
        // decorrelated core with the inner keys alongside)
        val vns = (0 until k).map(i => s"${m}_v$i")
        val pns = (0 until kp).map(j => s"${m}_p$j")
        val core =
          if (pairs.isEmpty) lowerSelect(spark, sub, source).toDF(vns: _*)
          else {
            val c = combine(spark, sub, source, Set.empty, None)
            val items = sub.projection.map {
              case BoundItem.BICol(cc, _)   => qcolSub(cc)
              case BoundItem.BIExpr(op2, _) => lowerOperandWith(op2, qcolSub)
              case other => sys.error(s"unreachable correlated row-IN item $other")
            }
            c.select(items.zipWithIndex.map { case (cc, i) => cc.as(vns(i)) } ++
              pairs.zipWithIndex.map { case ((_, ic), j) =>
                qcolSub(ic).as(pns(j)) }: _*)
          }
        def keyConds(f: DataFrame, names: Int => String): Seq[Column] =
          pairs.zipWithIndex.map { case ((oc, _), j) =>
            outerKey(oc) === f(names(j)) }
        // exact-match marker: distinct set rows, all-components (+ keys)
        // equi join
        val exact = core.distinct()
          .toDF((0 until k).map(i => s"${m}_e$i") ++
            (0 until kp).map(j => s"${m}_ep$j"): _*)
          .withColumn(m, lit(true))
        joins += ((exact,
          ((0 until k).map(i => probes(i) === exact(s"${m}_e$i")) ++
            keyConds(exact, j => s"${m}_ep$j")).reduce(_ && _)))
        drops ++= (0 until k).map(i => s"${m}_e$i") ++
          (0 until kp).map(j => s"${m}_ep$j") :+ m
        // set-emptiness facts: one broadcast row, or per-key counts (an
        // absent key reads count 0 through the left join + coalesce)
        val facts =
          if (pairs.isEmpty) broadcast(core.agg(count(lit(1)).as(s"${m}_n")))
          else core.groupBy(pns.map(col): _*).agg(count(lit(1)).as(s"${m}_n"))
            .toDF((0 until kp).map(j => s"${m}_fp$j") :+ s"${m}_n": _*)
        joins += ((facts,
          (lit(true) +: keyConds(facts, j => s"${m}_fp$j")).reduce(_ && _)))
        drops ++= (0 until kp).map(j => s"${m}_fp$j") :+ s"${m}_n"
        // compatibility markers: mask U = the components where equality
        // holds via a NULL on either side; outside U compares strictly
        val maskCols = for (mask <- 1 until (1 << k)) yield {
          val mm = s"${m}_u$mask"
          val inU  = (0 until k).filter(i => (mask & (1 << i)) != 0)
          val outU = (0 until k).filterNot(i => (mask & (1 << i)) != 0)
          // ∃-flags per subset S of U: a set row in this key group that
          // is NULL on every component of S
          val subsets = (0 until (1 << inU.length)).map(b =>
            inU.zipWithIndex.collect { case (c, j) if (b & (1 << j)) != 0 => c })
          val flags = subsets.map { s2 =>
            val zAll =
              if (s2.isEmpty) lit(true)
              else s2.map(i => col(vns(i)).isNull).reduce(_ && _)
            max(when(zAll, lit(true)).otherwise(lit(false)))
              .as(s"${mm}_s${s2.map(i => 1 << i).sum}")
          }
          val gcols = outU.map(i => col(vns(i))) ++ pns.map(col)
          val grouped =
            if (gcols.isEmpty) core.agg(flags.head, flags.tail: _*)
            else core.groupBy(gcols: _*)
              .agg(flags.head, flags.tail: _*)
              .toDF(outU.map(i => s"${mm}_k$i") ++
                (0 until kp).map(j => s"${mm}_p$j") ++
                subsets.map(s2 => s"${mm}_s${s2.map(i => 1 << i).sum}"): _*)
          val keyed =
            if (gcols.isEmpty) broadcast(grouped)
            else grouped
          val cond =
            if (gcols.isEmpty) lit(true)
            else (outU.map(i => probes(i) === keyed(s"${mm}_k$i")) ++
              keyConds(keyed, j => s"${mm}_p$j")).reduce(_ && _)
          joins += ((keyed, cond))
          drops ++= outU.map(i => s"${mm}_k$i") ++
            (0 until kp).map(j => s"${mm}_p$j") ++
            subsets.map(s2 => s"${mm}_s${s2.map(i => 1 << i).sum}")
          // the probe's null pattern picks which ∃-flag applies: S = the
          // U-components where the probe is NON-null (those need the set
          // row's NULL to be compatible)
          val pick = subsets.foldLeft(lit(false)) { (acc, s2) =>
            val sBits = s2.map(i => 1 << i).sum
            val patternMatches = inU.map(i =>
              if (s2.contains(i)) probes(i).isNotNull else probes(i).isNull)
              .reduce(_ && _)
            when(patternMatches,
              coalesce(col(s"${mm}_s$sBits"), lit(false))).otherwise(acc)
          }
          pick
        }
        val compat = maskCols.reduce(_ || _)
        val p = when(coalesce(col(m), lit(false)), lit(true))
          .when(coalesce(col(s"${m}_n"), lit(0L)) === lit(0L), lit(false))
          .when(compat, lit(null).cast("boolean"))
          .otherwise(lit(false))
        predOf.put(s, if (neg) !p else p)
      case s @ BoundExpr.BCmpSub(op, o, sub, guard, pairs) =>
        registerOp(o)
        val probe = operand(o)
        if (pairs.isEmpty) {
          val subDf0 = lowerSelect(spark, sub, source)
          if (guard) predOf.put(s, cmpCols(op, probe, guardedScalarLit(subDf0)))
          else {
            val m = fresh()
            joins += ((broadcast(subDf0.toDF(m)), lit(true)))
            drops += m
            predOf.put(s, cmpCols(op, probe, col(m)))
          }
        } else {
          val m = fresh()
          val (subAgg, keyCond, scalar) =
            correlatedScalarAgg(spark, sub, pairs, source, m, s"${m}_c")
          joins += ((subAgg, keyCond(outerKey)))
          drops += m
          drops ++= pairs.indices.map(i => s"${m}_c$i")
          predOf.put(s, cmpCols(op, probe, scalar))
        }
      case s @ BoundExpr.BQuantSub(op, o, sub, all, pairs) =>
        registerOp(o)
        val probe = operand(o)
        val m = fresh()
        val factsCols = Seq(s"${m}_n", s"${m}_nn", s"${m}_mn", s"${m}_mx")
        if (pairs.isEmpty) {
          // uncorrelated: ONE bounded aggregate over the subquery —
          // count / non-null count / min / max — broadcast to every row
          val subDf = lowerSelect(spark, sub, source)
          val v = col(subDf.columns.head)
          val facts = broadcast(subDf.agg(count(lit(1)).as(s"${m}_n"),
            count(v).as(s"${m}_nn"), min(v).as(s"${m}_mn"),
            max(v).as(s"${m}_mx")))
          joins += ((facts, lit(true)))
        } else {
          // correlated: per-key facts — one hash aggregate on the same
          // equi keys the predicate joins on, shuffle-bounded at scale
          val core = combine(spark, sub, source, Set.empty, None)
          val inVal = sub.projection.head match {
            case BoundItem.BICol(c, _)    => qcolSub(c)
            case BoundItem.BIExpr(op2, _) => lowerOperandWith(op2, qcolSub)
            case _ => sys.error(
              "unreachable: a correlated subquery must not aggregate or window")
          }
          val facts = core.select(inVal.as(s"${m}_fv") +:
            pairs.zipWithIndex.map { case ((_, ic), i) =>
              qcolSub(ic).as(s"${m}_f$i") }: _*)
            .groupBy(pairs.indices.map(i => col(s"${m}_f$i")): _*)
            .agg(count(lit(1)).as(s"${m}_n"), count(col(s"${m}_fv")).as(s"${m}_nn"),
              min(col(s"${m}_fv")).as(s"${m}_mn"), max(col(s"${m}_fv")).as(s"${m}_mx"))
          joins += ((facts, pairs.zipWithIndex.map { case ((oc, _), i) =>
            outerKey(oc) === facts(s"${m}_f$i") }.reduce(_ && _)))
          drops ++= pairs.indices.map(i => s"${m}_f$i")
        }
        drops ++= factsCols
        predOf.put(s, quantPred(op, all, probe, m))
    }

    /** Register subqueries inside an operand tree (CASE conditions). A
      * WHEN condition consumes TRUE-vs-non-TRUE like a filter, so `obs`
      * resets — a nested NOT inside the condition sets it again.
      */
    def registerOp(o: BoundOperand): Unit = o match {
      case BoundOperand.BCase(bs, els) =>
        bs.foreach { case (c, v) => register(c); registerOp(v) }
        els.foreach(registerOp)
      case BoundOperand.BArith(_, l, r) => registerOp(l); registerOp(r)
      case BoundOperand.BFunc(_, args)  => args.foreach(registerOp)
      case BoundOperand.BCast(x, _)     => registerOp(x)
      case BoundOperand.BTryCast(x, _)  => registerOp(x)
      // a scalar subquery as a VALUE: correlated = one per-key aggregate
      // frame left-joined on the decorrelated equalities; uncorrelated =
      // a guarded literal (one bounded job, no join) or one broadcast
      // 1-row left join
      case v @ BoundOperand.BSubVal(sub, guard, pairs, None) =>
        if (!opValOf.containsKey(v)) {
          if (pairs.nonEmpty) {
            val m = fresh()
            val (subAgg, keyCond, scalar) =
              correlatedScalarAgg(spark, sub, pairs, source, m, s"${m}_c")
            joins += ((subAgg, keyCond(outerKey)))
            drops += m
            drops ++= pairs.indices.map(i => s"${m}_c$i")
            opValOf.put(v, scalar)
          } else if (guard)
            opValOf.put(v, guardedScalarLit(lowerSelect(spark, sub, source)))
          else {
            val m = fresh()
            joins += ((broadcast(lowerSelect(spark, sub, source).toDF(m)),
              lit(true)))
            drops += m
            opValOf.put(v, col(m))
          }
        }
      case _ => ()
    }

    /** Lower a predicate with the registered markers substituted. */
    def pred(e: BoundExpr): Column =
      Option(predOf.get(e)).getOrElse(e match {
        case BoundExpr.BAnd(l, r) => pred(l) && pred(r)
        case BoundExpr.BOr(l, r)  => pred(l) || pred(r)
        case BoundExpr.BNot(x)    => !pred(x)
        case other                => lowerExprWith(other, operand)
      })

    /** Lower an operand with marker-aware CASE conditions. */
    def operand(o: BoundOperand): Column = o match {
      case BoundOperand.BCase(bs, els) =>
        val first = when(pred(bs.head._1), operand(bs.head._2))
        val chained = bs.tail.foldLeft(first) { case (acc, (c, v)) =>
          acc.when(pred(c), operand(v))
        }
        els.fold(chained)(x => chained.otherwise(operand(x)))
      case BoundOperand.BArith(ch, l, r) => arith(ch, operand(l), operand(r))
      case BoundOperand.BFunc(f, args)   => lowerFunc(f, args, operand)
      case BoundOperand.BCast(x, t)      => operand(x).cast(t.spark)
      case BoundOperand.BTryCast(x, t)   => operand(x).try_cast(t.spark)
      case v: BoundOperand.BSubVal =>
        Option(opValOf.get(v)).getOrElse(
          sys.error("unreachable: scalar-subquery operand was not registered"))
      case other                         => opResolve(other)
    }
  }

  /** A WHERE conjunct with subqueries in general position (under OR,
    * NOT, or CASE conditions): marker joins + one columnar filter.
    */
  private def applyMixedSubConjunct(spark: SparkSession, df0: DataFrame,
      cond: BoundExpr, source: BoundTable => DataFrame, tag: Int): DataFrame = {
    def qcolOf(bc: BoundCol): Column = col(s"${bc.binding}.${bc.attr.name}")
    val ms = new MarkerScope(spark, source, tag.toString, qcolOf, lowerOperand)
    ms.register(cond)
    val joined = ms.joins.foldLeft(df0) { case (d, (f, on)) =>
      d.join(f, on, "left_outer") }
    joined.filter(ms.pred(cond)).drop(ms.drops.toSeq: _*)
  }

  /** Per-top-level-query lowering scope: reference counts of
    * structurally-equal derived-table bodies (CTE reuse) plus the
    * memoized frames. A body referenced twice lowers ONCE — multiply
    * referenced plain bodies additionally localCheckpoint so the two
    * consumers share one materialization instead of relying on Catalyst
    * subplan reuse, and a recursive CTE referenced twice runs its
    * fixpoint once. Bypassed inside a fixpoint's per-round step lowering
    * (the frontier source rebinds every round, so the value-keyed memo
    * would freeze round one).
    */
  private final class QueryScope(val rootSource: BoundTable => DataFrame,
      val statsHook: AsofStatsHook) {
    val refCount = scala.collection.mutable.Map.empty[Analyzer.BoundQuery, Int]
    val memo = scala.collection.mutable.Map.empty[Analyzer.BoundQuery, DataFrame]
  }
  private val scopeTL = new ThreadLocal[QueryScope]()

  /** Recursive-CTE fixpoint executions (observable for tests). */
  @volatile var fixpointRuns: Long = 0L

  def withQueryScope[T](q: Analyzer.BoundQuery,
      source: BoundTable => DataFrame,
      statsHook: AsofStatsHook = noAsofStats)(f: => T): T = {
    val sc = new QueryScope(source, statsHook)
    countDerivedRefs(q, sc.refCount)
    val prev = scopeTL.get()
    scopeTL.set(sc)
    try f finally scopeTL.set(prev)
  }

  private def countDerivedRefs(q: Analyzer.BoundQuery,
      acc: scala.collection.mutable.Map[Analyzer.BoundQuery, Int]): Unit = q match {
    case s: BoundSelect =>
      s.derived.values.foreach { d =>
        acc(d) = acc.getOrElse(d, 0) + 1
        countDerivedRefs(d, acc)
      }
      Analyzer.exprSubqueriesOf(s).foreach(countDerivedRefs(_, acc))
    case u: Analyzer.BoundUnion =>
      (u.first +: u.rest.map(_._2)).foreach(countDerivedRefs(_, acc))
    case r: Analyzer.BoundRecursive =>
      countDerivedRefs(r.base, acc); countDerivedRefs(r.step, acc)
    case l: Analyzer.BoundLateral => countDerivedRefs(l.sub, acc)
    case ls: Analyzer.BoundLateralSet =>
      ls.branches.foreach(b => countDerivedRefs(b._2, acc))
    case _ => ()
  }

  /** A derived table's body: memoized per structurally-equal body within
    * the enclosing top-level query (see QueryScope).
    */
  private def lowerDerived(spark: SparkSession, q: Analyzer.BoundQuery,
      source: BoundTable => DataFrame): DataFrame = {
    val sc = scopeTL.get()
    if (sc == null || (sc.rootSource ne source))
      lowerDerivedRaw(spark, q, source)
    else sc.memo.getOrElseUpdate(q, {
      val df = lowerDerivedRaw(spark, q, source)
      q match {
        case _: Analyzer.BoundRecursive => df // fixpoint acc is checkpointed
        case _ if sc.refCount.getOrElse(q, 1) >= 2 =>
          materializeOnce(df, eager = true)
        case _ => df
      }
    })
  }

  private def lowerDerivedRaw(spark: SparkSession, q: Analyzer.BoundQuery,
      source: BoundTable => DataFrame): DataFrame = q match {
    case s: BoundSelect => lowerSelect(spark, s, source)
    case u: Analyzer.BoundUnion =>
      lowerUnion(lowerSelect(spark, u.first, source),
        u.rest.map { case (conn, b) => (conn, lowerSelect(spark, b, source)) },
        u.orderBy, u.limit, u.offset)
    case r: Analyzer.BoundRecursive => lowerRecursive(spark, r, source)
    case rg: Analyzer.BoundRange =>
      if (rg.temporal)
        spark.range(rg.start, rg.stopExcl, rg.step)
          .select(timestamp_micros(col("id")).as(rg.colName))
      else spark.range(rg.start, rg.stopExcl, rg.step).toDF(rg.colName)
    case fs: Analyzer.BoundFileScan =>
      // parquet scans natively (footer schema, pushdown, pruning);
      // csv/json read UNDER the analysis-pinned schema — inference ran
      // once at analysis, so plan schema and data schema always agree
      fs.format match {
        case "parquet" => spark.read.parquet(fs.path)
        case "csv" => spark.read.schema(fs.desc.sparkSchema)
          .option("header", "true").csv(fs.path)
        case "json" => spark.read.schema(fs.desc.sparkSchema).json(fs.path)
        case other => sys.error(s"unreachable file format $other")
      }
    case l: Analyzer.BoundLateral   =>
      if (l.agg) sys.error("unreachable: aggregate laterals join fused in combine")
      lowerLateral(spark, l, source)
    case _: Analyzer.BoundLateralSet =>
      sys.error("unreachable: set-operation laterals join fused in combine")
    case other => sys.error(s"not a derivable query: $other")
  }

  /** A correlated LATERAL frame: the body's core plus the synthetic
    * hidden-key columns the enclosing WHERE joins on; ORDER BY + LIMIT
    * become a per-key row_number window (top-N per key), never a global
    * cut. Inner-join semantics downstream match SQL's CROSS JOIN LATERAL
    * (an outer row with an empty lateral set drops).
    */
  private def lowerLateral(spark: SparkSession, l: Analyzer.BoundLateral,
      source: BoundTable => DataFrame): DataFrame = {
    def qc(bc: BoundCol): Column = col(s"${bc.binding}.${bc.attr.name}")
    val core = combine(spark, l.sub, source, Set.empty, None)
    val topped = l.sub.limit match {
      case Some(n) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(l.pairs.map { case (_, ic) => qc(ic) }: _*)
          .orderBy(l.sub.orderBy.map {
            case (Analyzer.BoundOrderKey.OKOperand(op), dir) =>
              sortCol(lowerOperandWith(op, qc), dir)
            case (k, _) => sys.error(s"unreachable LATERAL sort key $k")
          }: _*)
        core.withColumn("__lrn", row_number().over(w))
          .filter(col("__lrn") <= n).drop("__lrn")
      case None => core
    }
    // visible projection (plain columns/expressions, analyzer-enforced)
    // in derived-attribute order, then the hidden key columns
    val visible = l.sub.projection.map {
      case BoundItem.BICol(bc, a)  => qc(bc).as(a.getOrElse(bc.attr.name))
      case BoundItem.BIExpr(op, a) => lowerOperandWith(op, qc).as(a)
      case other => sys.error(s"unreachable LATERAL projection item $other")
    }
    val keys = l.pairs.zipWithIndex.map { case ((_, ic), i) =>
      qc(ic).as(l.hiddenKeys(i)) }
    topped.select(visible ++ keys: _*)
  }

  /** WITH RECURSIVE fixpoint: materialize the base, then repeatedly run
    * the step with the CTE name bound to the previous iteration's
    * FRONTIER (semi-naive evaluation); UNION keeps only never-seen rows
    * per round — guaranteeing termination on cyclic data — while
    * UNION ALL appends whatever the step yields until it is empty.
    * localCheckpoint truncates the growing lineage each round (the same
    * pattern as the connected-components operator — without it Catalyst
    * re-optimizes an exponentially deepening plan), and the only
    * driver-side traffic is one emptiness probe per round.
    */
  private def lowerRecursive(spark: SparkSession, r: Analyzer.BoundRecursive,
      source: BoundTable => DataFrame): DataFrame = {
    fixpointRuns += 1
    val names = r.desc.attributes.map(_.name)
    val maxIter = 1000
    // K rounds unroll LAZILY between materializations: the K deltas
    // union under a __rstep tag and ONE lazy-localCheckpoint +
    // count-by-tag job pair replaces K per-round (checkpoint + count)
    // jobs — the fixpoint's wall clock is job-scheduling-dominated on
    // small frontiers, so this cuts it ~K×. Exact SEQUENTIAL semantics
    // reconstruct from the per-tag counts: recursion ends at the FIRST
    // empty step, and later tags — which a non-monotone step (e.g. a
    // NOT EXISTS over the frontier) could repopulate past the empty
    // round — are discarded, exactly as the one-round-at-a-time loop
    // would never have run them. The accumulator stays a union view
    // over checkpoint-backed frames, re-collapsed every CkptEvery
    // blocks to keep the dedup-mode except-join plan bounded.
    // Unrolling only pays for UNION ALL recursions: their per-round
    // plan is narrow, so K lazy rounds per job trade pure scheduling
    // overhead. UNION (dedup) rounds each carry a distinct+except
    // SHUFFLE — chaining K of them lazily recomputes earlier deltas
    // inside later ones (K²/2 shuffle work for K× fewer jobs, a net
    // loss, measured) — so dedup keeps one materialized round per job.
    val Unroll = if (r.unionAll) 4 else 1
    val CkptEvery = 4 // blocks between acc re-checkpoints
    var acc = {
      val b = lowerSelect(spark, r.base, source).toDF(names: _*)
      materializeOnce(if (r.unionAll) b else b.distinct(), eager = true)
    }
    var frontier = acc
    var it = 0
    var blocks = 0
    var done = frontier.isEmpty
    // The per-block loop runs with adaptive execution OFF (saved/restored):
    // with AQE on every exchange in a block's step plan is a separately
    // scheduled query-stage job with its own re-optimization round-trip,
    // and at moderate frontier sizes the fixpoint is job-count-dominated
    // (measured: 58 scheduled jobs moving 6 KiB of shuffle data for the
    // dedup-mode gate). Rounds re-plan the same bounded step shape over
    // materialized leaves each time, so runtime re-planning discovers
    // nothing a statically planned round doesn't. The BASE materialization
    // above and the caller's final read of `acc` keep AQE — those are the
    // one-shot, potentially large plans where it earns its stage jobs.
    // Conf mutation assumes the SINGLE-THREADED driver of the gate /
    // bench shape: a query planned concurrently on this session during
    // the loop would silently see AQE off / a clamped width, and two
    // interleaved fixpoints could restore each other's values. Callers
    // that plan queries from multiple threads must isolate the loop in
    // a cloned session (spark.newSession() shares state, isolates conf).
    val aqeKey = "spark.sql.adaptive.enabled"
    val partsKey = "spark.sql.shuffle.partitions"
    val aqeBefore = spark.conf.get(aqeKey, "true")
    val partsBefore = spark.conf.get(partsKey)
    // Static stand-in for AQE's partition coalescing inside the loop: the
    // shuffle width derives from the MEASURED row counts flowing through
    // the fixpoint (base rows as the step-input proxy, refreshed with each
    // block's delta count; ~2M rows per partition), capped at the session
    // parallelism — scale-adaptive, never a local constant. A recursion
    // over a 1B-row base keeps the cluster-default width; the gate's
    // hundreds-of-rows frontier gets 1 instead of 32 near-empty tasks per
    // exchange (measured: 2,595 tasks for 36 KiB of shuffle without this).
    def loopWidth(rows: Long): Int = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong, rows / 2000000L + 1L)).toInt
    // every conf set sits INSIDE the try — the count() action below can
    // fail (task failure, cancellation), and the finally must always see
    // a session it can restore (ADVICE r15)
    try {
    spark.conf.set(aqeKey, "false")
    val baseRows = acc.count()
    spark.conf.set(partsKey, loopWidth(baseRows).toString)
    while (!done) {
      it += Unroll
      if (it > maxIter) throw new IllegalStateException(
        s"recursive CTE '${r.desc.name}' exceeded $maxIter iterations")
      // K lazy deltas, each chained off the previous one; dedup mode
      // (K = 1) excepts against the materialized acc
      var deltas = Vector.empty[DataFrame]
      var accLazy = acc
      var front = frontier
      for (_ <- 0 until Unroll) {
        val stepSource: BoundTable => DataFrame = bt =>
          if (bt.desc.name.equalsIgnoreCase(r.desc.name)) front
          else source(bt)
        var next = lowerSelect(spark, r.step, stepSource).toDF(names: _*)
        if (!r.unionAll) next = next.distinct().except(accLazy)
        deltas :+= next
        accLazy = accLazy.union(next)
        front = next
      }
      if (Unroll == 1) {
        // dedup mode: one materialized round per job, the count IS the
        // emptiness probe (no tag shuffle)
        val next = materializeOnce(deltas.head)
        val n = next.count()
        if (n == 0L) done = true
        else {
          acc = acc.union(next)
          frontier = next
          blocks += 1
          if (blocks % CkptEvery == 0) acc = materializeOnce(acc, eager = true)
          spark.conf.set(partsKey, loopWidth(math.max(baseRows, n)).toString)
        }
      } else {
        // coalesce BEFORE the checkpoint: a union of K deltas carries
        // the SUM of their partitions, and the next block chains off
        // this one — unbounded, that compounds K× per block (4^blocks
        // tasks). Bounding every block at the session's parallelism
        // keeps the whole fixpoint at O(blocks × cores) tasks.
        val block = materializeOnce(deltas.zipWithIndex.map { case (d, i) =>
          d.withColumn("__rstep", lit(i)) }.reduce(_.union(_))
          .coalesce(spark.sparkContext.defaultParallelism))
        val counts = block.groupBy(col("__rstep")).count().collect()
          .map(row => row.getInt(0) -> row.getLong(1)).toMap
        val keep = (0 until Unroll).find(i => counts.getOrElse(i, 0L) == 0L)
          .getOrElse(Unroll)
        if (keep == 0) done = true
        else {
          acc = acc.union(block.filter(col("__rstep") < keep).drop("__rstep"))
          frontier = block.filter(col("__rstep") === keep - 1).drop("__rstep")
          blocks += 1
          if (blocks % CkptEvery == 0)
            // eager is fine: children are checkpoint-backed, this
            // collapses a bounded union, nothing deeper
            acc = materializeOnce(acc, eager = true)
          if (keep < Unroll) done = true // an empty step ended the chain
          spark.conf.set(partsKey,
            loopWidth(math.max(baseRows, counts.values.sum)).toString)
        }
      }
    }
    } finally {
      spark.conf.set(aqeKey, aqeBefore)
      spark.conf.set(partsKey, partsBefore)
    }
    acc
  }

  /** Set-op chain assembly: branches are pre-lowered DataFrames;
    * by-position combination keeps the first branch's column names.
    * INTERSECT binds tighter than UNION/EXCEPT (its groups are contiguous
    * in the flat chain, so they fold first); UNION/EXCEPT then associate
    * left, each UNION step deduping at its own position. The trailing
    * ORDER BY binds against the first branch's output names.
    */
  def lowerUnion(first: DataFrame, rest: Seq[(String, DataFrame)],
      orderBy: Seq[(String, Ast.SortDir)], limit: Option[Long],
      offset: Option[Long] = None): DataFrame = {
    // fold contiguous INTERSECT [ALL] runs into single group frames
    val groups = scala.collection.mutable.ArrayBuffer.empty[(String, DataFrame)]
    var cur = first
    var curConn = "" // connector joining `cur` to the PREVIOUS group
    for ((conn, df) <- rest) {
      if (conn == "intersect") cur = cur.intersect(df)
      else if (conn == "intersect_all") cur = cur.intersectAll(df)
      else { groups += ((curConn, cur)); cur = df; curConn = conn }
    }
    groups += ((curConn, cur))
    val unioned = groups.drop(1).foldLeft(groups.head._2) {
      case (acc, ("union", g))      => acc.union(g).distinct()
      case (acc, ("union_all", g))  => acc.union(g)
      case (acc, ("union_byname", g))     => acc.unionByName(g).distinct()
      case (acc, ("union_all_byname", g)) => acc.unionByName(g)
      case (acc, ("except", g))     => acc.except(g)
      case (acc, ("except_all", g)) => acc.exceptAll(g)
      case (_, (c, _))              => sys.error(s"unreachable set-op connector '$c'")
    }
    val ordered =
      if (orderBy.isEmpty) unioned
      else {
        orderBy.find { case (n, _) => !unioned.columns.exists(_.equalsIgnoreCase(n)) }
          .foreach { case (n, _) => sys.error(
            s"UNION ORDER BY key '$n' is not an output column of the first branch") }
        unioned.orderBy(orderBy.map { case (n, dir) => sortCol(col(n), dir) }: _*)
      }
    applyOffsetLimit(ordered, offset, limit)
  }

  /** OFFSET skips rows of the (ordered) result before LIMIT takes its
    * prefix — SQL's LIMIT n OFFSET m.
    */
  private def applyOffsetLimit(df: DataFrame, offset: Option[Long],
      limit: Option[Long]): DataFrame = {
    val off = offset.fold(df)(m => df.offset(math.min(m, Int.MaxValue.toLong).toInt))
    limit.fold(off)(n => off.limit(math.min(n, Int.MaxValue.toLong).toInt))
  }

  def lowerExpr(e: BoundExpr): Column = lowerExprWith(e, lowerOperand)

  /** Expression lowering parameterized by the operand lowerer, so the
    * same predicate tree evaluates under qualified (scan/join), grouped
    * (HAVING/ORDER BY) or bare (DML/sample) column resolution — CASE
    * conditions inherit whichever scope their operand sits in.
    */
  def lowerExprWith(e: BoundExpr, opLower: BoundOperand => Column): Column = e match {
    case BoundExpr.BAnd(l, r) => lowerExprWith(l, opLower) && lowerExprWith(r, opLower)
    case BoundExpr.BOr(l, r)  => lowerExprWith(l, opLower) || lowerExprWith(r, opLower)
    case BoundExpr.BNot(x)    => !lowerExprWith(x, opLower) // SQL 3VL: NOT NULL → NULL
    case BoundExpr.BIsNull(o, neg) =>
      val c = opLower(o)
      if (neg) c.isNotNull else c.isNull
    case BoundExpr.BLike(o, pat, neg, ci, esc) =>
      val c = likeCol(opLower(o), pat, ci, esc)
      if (neg) !c else c
    case BoundExpr.BInSub(_, _, _, _) | BoundExpr.BExists(_, _, _, _) |
        BoundExpr.BCmpSub(_, _, _, _, _) | BoundExpr.BQuantSub(_, _, _, _, _) |
        BoundExpr.BRowInSub(_, _, _, _) =>
      sys.error("subquery conjuncts lower as joins, not Column expressions")
    case BoundExpr.BCmp(op, l, r) =>
      cmpCols(op, opLower(l), opLower(r))
  }

  /** CASE chain: when/when/…/otherwise under the caller's resolution. */
  private def caseCol(bs: Seq[(BoundExpr, BoundOperand)], els: Option[BoundOperand],
      rec: BoundOperand => Column): Column = {
    val first = when(lowerExprWith(bs.head._1, rec), rec(bs.head._2))
    val chained = bs.tail.foldLeft(first) { case (acc, (c, v)) =>
      acc.when(lowerExprWith(c, rec), rec(v))
    }
    els.fold(chained)(e => chained.otherwise(rec(e)))
  }

  /** Apply an ORDER BY direction — ASC/DESC with optional explicit NULLS
    * FIRST/LAST (None keeps Spark's default: NULLS FIRST for ASC, LAST
    * for DESC).
    */
  /** DuckDB's default null order is NULLS LAST in BOTH directions
    * (default_null_order = 'nulls_last'; probed — round-13 fuzz found
    * the divergence: Spark's bare .asc is nulls-FIRST). Explicit NULLS
    * FIRST/LAST overrides pass through.
    */
  private[sql] def sortCol(c: Column, s: Ast.SortDir): Column =
    (s.desc, s.nullsFirst) match {
      case (false, None)        => c.asc_nulls_last
      case (true, None)         => c.desc_nulls_last
      case (false, Some(true))  => c.asc_nulls_first
      case (false, Some(false)) => c.asc_nulls_last
      case (true, Some(true))   => c.desc_nulls_first
      case (true, Some(false))  => c.desc_nulls_last
    }

  /** [I]LIKE with an optional ESCAPE character. */
  private def likeCol(c: Column, pat: String, ci: Boolean,
      esc: Option[Char]): Column = (ci, esc) match {
    case (false, None)    => c.like(pat)
    case (true, None)     => c.ilike(pat)
    case (false, Some(e)) => like(c, lit(pat), lit(e.toString))
    case (true, Some(e))  => ilike(c, lit(pat), lit(e.toString))
  }

  /** Calls whose result IS JSON text — their values embed raw inside
    * json_object/json_array (the JSON type propagates, DuckDB parity).
    */
  private val JsonProducing = Set("json_object", "json_array",
    "json_merge_patch", "json_extract", "json_extract_path", "json_quote")

  /** One scalar as JSON text: to_json(array(x)) with the brackets
    * stripped — exact JSON escaping, and a NULL element stays 'null'
    * (array elements survive where to_json drops NULL struct fields).
    */
  private def jsonScalarText(c: Column): Column = {
    val j = to_json(array(c))
    j.substr(lit(2), length(j) - 2)
  }

  private def jsonValueText(o: BoundOperand,
      rec: BoundOperand => Column): Column = o match {
    case BoundOperand.BFunc(jf, _) if JsonProducing(jf) => rec(o)
    case _ => jsonScalarText(rec(o))
  }

  private[sql] def cmpCols(op: Ast.CmpOp, lc: Column, rc: Column): Column = op match {
    case Ast.CmpOp.Eq  => lc === rc
    case Ast.CmpOp.Neq => lc =!= rc
    case Ast.CmpOp.Lt  => lc < rc
    case Ast.CmpOp.Gt  => lc > rc
    case Ast.CmpOp.Le  => lc <= rc
    case Ast.CmpOp.Ge  => lc >= rc
    // null-safe: <=> never yields NULL, and its negation stays two-valued
    case Ast.CmpOp.IsDist  => !(lc <=> rc)
    case Ast.CmpOp.NotDist => lc <=> rc
  }

  /** The decisive comparison of a quantified predicate against the
    * subquery's non-null extrema: `x < ANY(s)` ⟺ `x < max(s)`,
    * `x < ALL(s)` ⟺ `x < min(s)` (and symmetrically for >, <=, >=);
    * `x <> ANY` and `x = ALL` read off min = max = x. NULL when the
    * non-null set is empty (min/max are NULL) — the caller's CASE
    * degrades that to the three-valued answer.
    */
  private def quantCmp(op: Ast.CmpOp, all: Boolean, probe: Column,
      mn: Column, mx: Column): Column = (op, all) match {
    case (Ast.CmpOp.Lt, false)  => probe < mx
    case (Ast.CmpOp.Le, false)  => probe <= mx
    case (Ast.CmpOp.Gt, false)  => probe > mn
    case (Ast.CmpOp.Ge, false)  => probe >= mn
    case (Ast.CmpOp.Neq, false) => (mn =!= probe) || (mx =!= probe)
    case (Ast.CmpOp.Lt, true)   => probe < mn
    case (Ast.CmpOp.Le, true)   => probe <= mn
    case (Ast.CmpOp.Gt, true)   => probe > mx
    case (Ast.CmpOp.Ge, true)   => probe >= mx
    case (Ast.CmpOp.Eq, true)   => (mn === probe) && (mx === probe)
    case (Ast.CmpOp.Eq, false) | (Ast.CmpOp.Neq, true) =>
      sys.error("unreachable: = ANY / <> ALL desugar to IN / NOT IN")
    case (Ast.CmpOp.IsDist, _) | (Ast.CmpOp.NotDist, _) =>
      sys.error("unreachable: IS [NOT] DISTINCT FROM has no quantified form")
  }

  /** Full 3VL for `probe <op> ANY/ALL (sub)` over the joined facts
    * columns `<m>_n` (row count), `<m>_nn` (non-null count), `<m>_mn` /
    * `<m>_mx` (non-null extrema): empty set → FALSE for ANY / TRUE for
    * ALL; NULL probe → NULL; then the extremum comparison decides, with
    * the undecided cases degrading to NULL when the set bears NULLs.
    */
  private def quantPred(op: Ast.CmpOp, all: Boolean, probe: Column,
      m: String): Column = {
    val n   = coalesce(col(s"${m}_n"), lit(0L))
    val cmp = quantCmp(op, all, probe, col(s"${m}_mn"), col(s"${m}_mx"))
    val unk = lit(null).cast("boolean")
    if (!all)
      when(n === 0L, lit(false))
        .when(probe.isNull, unk)
        .when(cmp, lit(true))
        .when(col(s"${m}_nn") < col(s"${m}_n"), unk)
        .otherwise(lit(false))
    else
      when(n === 0L, lit(true))
        .when(probe.isNull, unk)
        .when(cmp <=> lit(false), lit(false))
        .when(col(s"${m}_nn") < col(s"${m}_n"), unk)
        .otherwise(lit(true))
  }

  /** Scalar function lowering (arity pre-checked by the analyzer). The
    * recursion callback keeps the caller's column resolution (qualified /
    * grouped / bare). concat lowers as concat_ws("") — NULL arguments act
    * as empty strings, matching SQL/DuckDB concat, where Spark's concat
    * would NULL the whole result.
    */
  /** Lower a lambda body: parameters resolve through `env`, everything
    * else recurses with the env threaded (so nested higher-order calls
    * extend it) and bottoms out in the caller's operand lowerer.
    */
  private def lowerLambdaBody(o: BoundOperand, env: Map[String, Column],
      outer: BoundOperand => Column): Column = {
    def low(x: BoundOperand): Column = x match {
      case BoundOperand.BLambdaVar(n, _) => env.getOrElse(n,
        sys.error(s"unreachable: unbound lambda parameter $n"))
      case BoundOperand.BArith(ch, l, r) => arith(ch, low(l), low(r))
      case BoundOperand.BFunc(f, as)     => lowerFunc(f, as, low)
      case BoundOperand.BCast(y, t)      => low(y).cast(t.spark)
      case BoundOperand.BTryCast(y, t)   => low(y).try_cast(t.spark)
      case BoundOperand.BCase(bs, els) =>
        val first = when(lowerExprWith(bs.head._1, low), low(bs.head._2))
        val chained = bs.tail.foldLeft(first) { case (acc, (c, v)) =>
          acc.when(lowerExprWith(c, low), low(v)) }
        els.fold(chained)(e => chained.otherwise(low(e)))
      case other => outer(other)
    }
    low(o)
  }

  private def lowerFunc(name: String, args: Seq[BoundOperand],
      rec: BoundOperand => Column): Column = (name, args) match {
    case ("upper", Seq(a))  => upper(rec(a))
    case ("lower", Seq(a))  => lower(rec(a))
    case ("trim", Seq(a))   => trim(rec(a))
    case ("length", Seq(a)) => length(rec(a))
    case ("abs", Seq(a))    => abs(rec(a))
    case ("year", Seq(a))   => year(rec(a))
    case ("month", Seq(a))  => month(rec(a))
    case ("day", Seq(a))    => dayofmonth(rec(a))
    case ("round", Seq(a))  => round(rec(a), 0)
    case ("round", Seq(a, BoundOperand.BLit(Lit.LitLong(n)))) => round(rec(a), n.toInt)
    case ("substr", Seq(a, p)) =>
      // to-end form: the remaining length is bounded by the full length
      val c = rec(a)
      c.substr(rec(p), length(c))
    case ("substr", Seq(a, p, l)) => rec(a).substr(rec(p), rec(l))
    case ("coalesce", as) => coalesce(as.map(rec): _*)
    case ("concat", as)   => concat_ws("", as.map(rec): _*)
    // the || operator: NULL-propagating, unlike the concat() function
    case ("||", as)       => concat(as.map(rec): _*)
    case ("replace", Seq(a, b, c)) => replace(rec(a), rec(b), rec(c))
    // math batch 5: trig/rounding parity with the reference dialect —
    // libm last-ulp differences across engines are absorbed by the
    // query-side round() contract (FIXTURES.md)
    case ("sin", Seq(a))     => sin(rec(a))
    case ("cos", Seq(a))     => cos(rec(a))
    case ("tan", Seq(a))     => tan(rec(a))
    case ("asin", Seq(a))    => asin(rec(a))
    case ("acos", Seq(a))    => acos(rec(a))
    case ("atan", Seq(a))    => atan(rec(a))
    case ("atan2", Seq(a, b)) => atan2(rec(a), rec(b))
    case ("cot", Seq(a))     => lit(1.0) / tan(rec(a))
    case ("degrees", Seq(a)) => degrees(rec(a))
    case ("radians", Seq(a)) => radians(rec(a))
    case ("pi", Seq())       => lit(math.Pi)
    case ("cbrt", Seq(a))    => cbrt(rec(a))
    case ("factorial", Seq(a)) => factorial(rec(a).cast("int"))
    case ("isnan", Seq(a))   =>
      // NULL-propagating like DuckDB's (Spark's isnan reads NULL→false)
      val c = rec(a); when(c.isNull, lit(null).cast("boolean")).otherwise(isnan(c))
    case ("isinf", Seq(a))   =>
      val c = rec(a)
      c === lit(Double.PositiveInfinity) || c === lit(Double.NegativeInfinity)
    case ("isfinite", Seq(a)) =>
      val c = rec(a)
      when(c.isNull, lit(null).cast("boolean")).otherwise(
        !isnan(c) && c =!= lit(Double.PositiveInfinity) &&
          c =!= lit(Double.NegativeInfinity))
    case ("log", Seq(a))     => log10(rec(a)) // DuckDB: log(x) is log10
    case ("log", Seq(BoundOperand.BLit(b), x)) =>
      val base = b match {
        case Lit.LitLong(n)   => n.toDouble
        case Lit.LitDouble(v) => v
        case other => sys.error(s"unreachable log base $other")
      }
      log(base, rec(x))
    case ("starts_with", Seq(a, b)) => rec(a).startsWith(rec(b))
    case ("ends_with", Seq(a, b))   => rec(a).endsWith(rec(b))
    case ("contains", Seq(a, b))    => rec(a).contains(rec(b))
    case ("printf", BoundOperand.BLit(Lit.LitString(fmt)) +: rest) =>
      format_string(fmt, rest.map(rec): _*)
    case ("strftime", Seq(a, BoundOperand.BLit(Lit.LitString(fmt)))) =>
      val javaFmt = Analyzer.StrftimeTokens.replaceAllIn(fmt,
        m => Analyzer.StrftimeMap(m.matched))
      date_format(rec(a), javaFmt)
    case ("strptime", Seq(a, BoundOperand.BLit(Lit.LitString(fmt)))) =>
      val javaFmt = Analyzer.StrftimeTokens.replaceAllIn(fmt,
        m => Analyzer.StrftimeMap(m.matched))
      to_timestamp(rec(a), javaFmt)
    // try_strptime: NULL on an unparseable input instead of raising
    case ("try_strptime", Seq(a, BoundOperand.BLit(Lit.LitString(fmt)))) =>
      val javaFmt = Analyzer.StrftimeTokens.replaceAllIn(fmt,
        m => Analyzer.StrftimeMap(m.matched))
      try_to_timestamp(rec(a), lit(javaFmt))
    case ("to_timestamp", Seq(a))     => timestamp_seconds(rec(a))
    case ("regexp_matches", Seq(a, b)) => regexp_like(rec(a), rec(b))
    case ("list_min" | "array_min", Seq(a)) => array_min(rec(a))
    case ("list_max" | "array_max", Seq(a)) => array_max(rec(a))
    case ("list_sum", Seq(a)) =>
      // NULL elements skip; an empty (or all-NULL) list reads NULL —
      // the head-seeded fold makes both fall out (null seed over [])
      val c = filter(rec(a), x => x.isNotNull)
      aggregate(slice(c, lit(2), greatest(size(c) - 1, lit(0))),
        try_element_at(c, lit(1)), (acc, x) => acc + x)
    case ("bit_count", Seq(a)) => bit_count(rec(a))
    // list_aggregate sugar targets (sum/min/max route to the dedicated
    // cases above; these two are rebind-only forms)
    case ("list_avg", Seq(a)) =>
      // NULL elements skip; empty / all-NULL reads NULL (0/0 → NULL
      // via try_divide — DuckDB parity)
      val nn = filter(rec(a), x => x.isNotNull)
      try_divide(
        aggregate(slice(nn, lit(2), greatest(size(nn) - 1, lit(0))),
          try_element_at(nn, lit(1)).cast("double"), (acc, x) => acc + x),
        size(nn))
    case ("list_count", Seq(a)) =>
      size(filter(rec(a), x => x.isNotNull)).cast("long")
    case ("concat_ws", BoundOperand.BLit(Lit.LitString(sep)) +: rest) =>
      concat_ws(sep, rest.map(rec): _*)
    case ("gcd", Seq(a, b)) =>
      graft.functions.NumericFunctions.gcd(rec(a).cast("long"), rec(b).cast("long"))
    case ("lcm", Seq(a, b)) =>
      graft.functions.NumericFunctions.lcm(rec(a).cast("long"), rec(b).cast("long"))
    // list batch: DuckDB surface onto Spark's codegen'd array natives.
    // list_unique counts DISTINCT NON-NULL elements (DuckDB semantics);
    // list_prepend takes (elem, list) — note the DuckDB argument order.
    // DuckDB 1.0's list_zip: zip to the LONGEST list, short lists pad
    // NULL — Spark's arrays_zip has identical pad semantics. Elements
    // are DuckDB-unnamed tuples addressed POSITIONALLY via 1-based
    // struct_extract, so Spark's internal field naming is irrelevant
    // (GetStructField below is ordinal-based).
    case ("list_zip", as) if as.length >= 2 =>
      arrays_zip(as.map(rec): _*)
    case ("struct_extract", Seq(a, BoundOperand.BLit(Lit.LitLong(i)))) =>
      org.apache.spark.sql.graftbridge.Bridge.column(
        org.apache.spark.sql.catalyst.expressions.GetStructField(
          org.apache.spark.sql.graftbridge.Bridge.expression(rec(a)),
          i.toInt - 1))
    // by-name field access (named structs; the analyzer canonicalized
    // the key against the struct's field list)
    case ("struct_extract", Seq(a, BoundOperand.BLit(Lit.LitString(k)))) =>
      rec(a).getField(k)
    // container JSON serialization (struct/list — probed byte-identical
    // with DuckDB for null-free nested containers; null struct fields
    // diverge and are analyzer-documented)
    case ("to_json", Seq(a)) => to_json(rec(a))
    // map surface: literal, constructor, and DuckDB's list-returning
    // subscript ([] when the key is absent — a NULL value still reads
    // [null], which is why element_at alone wouldn't do)
    case ("__map_lit", as) =>
      if (as.isEmpty) map_from_arrays(array(), array())
      else org.apache.spark.sql.functions.map(as.map(rec): _*)
    case ("map", Seq(k, v)) => map_from_arrays(rec(k), rec(v))
    case ("map_extract", Seq(m, k)) =>
      val mc = rec(m)
      val kc = rec(k)
      when(map_contains_key(mc, kc), array(element_at(mc, kc)))
        .otherwise(slice(array(element_at(mc, kc)), 1, 0))
    case ("map_keys", Seq(m))   => map_keys(rec(m))
    case ("map_values", Seq(m)) => map_values(rec(m))
    case ("cardinality", Seq(m)) => size(rec(m)).cast("long")
    // element_at(map, k) is DuckDB's map-subscript alias: a LIST of the
    // value, [] when the key is absent — identical to map_extract
    case ("element_at", Seq(m, k)) =>
      val mc = rec(m)
      val kc = rec(k)
      when(map_contains_key(mc, kc), array(element_at(mc, kc)))
        .otherwise(slice(array(element_at(mc, kc)), 1, 0))
    // map_entries: Spark's native emits the same {key, value} structs
    case ("map_entries", Seq(m)) => map_entries(rec(m))
    // map_concat (DuckDB probed: LAST map wins on duplicate keys, key
    // order is first appearance) — composed deterministically instead
    // of relying on Spark's mapKeyDedupPolicy session flag: fold maps
    // pairwise, keys = first-appearance distinct union, value = right
    // map's when it has the key
    case ("map_concat", ms) if ms.length >= 2 =>
      ms.map(rec).reduceLeft { (a, b) =>
        val keys = array_distinct(concat(map_keys(a), map_keys(b)))
        map_from_arrays(keys, transform(keys, k =>
          when(map_contains_key(b, k), element_at(b, k))
            .otherwise(element_at(a, k))))
      }
    // named struct literal: keys interleave as string literals —
    // Spark's named struct columns carry the field names exactly
    case ("struct_pack", as) if as.length % 2 == 0 =>
      struct(as.grouped(2).map {
        case Seq(BoundOperand.BLit(Lit.LitString(k)), v) => rec(v).as(k)
        case other => sys.error(s"unreachable struct_pack shape $other")
      }.toSeq: _*)
    case ("list_reverse", Seq(a)) => reverse(rec(a))
    case ("flatten", Seq(a))      => flatten(rec(a))
    case ("list_unique", Seq(a)) =>
      size(array_distinct(filter(rec(a), x => x.isNotNull))).cast("long")
    case ("list_append", Seq(a, b))  => array_append(rec(a), rec(b))
    case ("list_prepend", Seq(a, b)) => array_prepend(rec(b), rec(a))
    case ("list_intersect", Seq(a, b)) =>
      // DuckDB's output order is unspecified — sort for determinism
      array_sort(array_intersect(rec(a), rec(b)))
    case ("list_has_any", Seq(a, b)) => arrays_overlap(rec(a), rec(b))
    case ("list_has_all", Seq(a, b)) =>
      // every NON-NULL element of b appears in a (DuckDB skips NULLs)
      forall(filter(rec(b), x => x.isNotNull),
        x => array_contains(rec(a), x))
    case ("regexp_extract_all", a +: BoundOperand.BLit(Lit.LitString(pat)) +: rest) =>
      // DuckDB defaults to group 0 (the whole match) — Spark's own
      // default is 1, so the index is always passed explicitly
      val grp = rest match {
        case Seq(BoundOperand.BLit(Lit.LitLong(g))) => g.toInt
        case _                                      => 0
      }
      regexp_extract_all(rec(a), lit(pat), lit(grp))
    case ("octet_length", Seq(a)) => octet_length(rec(a))
    case ("bit_length", Seq(a))   => bit_length(rec(a))
    case ("sha256", Seq(a))       => sha2(rec(a), 256)
    case ("to_base", Seq(a, BoundOperand.BLit(Lit.LitLong(b)))) =>
      conv(rec(a).cast("long"), 10, b.toInt)
    // DuckDB's json_extract_string onto Spark's get_json_object — the
    // same $.path subset, string result, NULL on a miss on both engines
    case ("json_extract_string", Seq(a, BoundOperand.BLit(Lit.LitString(pth)))) =>
      get_json_object(rec(a), pth)
    // DuckDB's time_bucket: epoch-aligned fixed-width buckets — exact
    // micros arithmetic (floor-aligned for pre-origin instants too).
    // EVERY non-month width aligns to the TimescaleDB origin Monday
    // 2000-01-03 (empirically probed: 7-hour buckets at
    // 2000-01-01 10:00 → 06:00, which only the -03 origin produces;
    // widths dividing 48 h can't tell the origins apart)
    case ("time_bucket", Seq(BoundOperand.BInterval(n, u), a)) =>
      val widthMicros = n * (u.toLowerCase match {
        case "second" => 1L
        case "minute" => 60L
        case "hour"   => 3600L
        case "day"    => 86400L
        case _ /* week */ => 604800L
      }) * 1000000L
      val origin = 946857600000000L
      val um = unix_micros(rec(a).cast("timestamp"))
      val off = ((um - origin) % widthMicros + widthMicros) % widthMicros
      timestamp_micros(um - off)
    case ("unicode", Seq(a)) =>
      // DuckDB: codepoint of the first character, -1 for the empty string
      val c = rec(a)
      when(length(c) === 0, lit(-1)).otherwise(ascii(c))
    case ("ifnull", Seq(a, b)) => coalesce(rec(a), rec(b))
    case ("hamming" | "mismatches", Seq(a, b)) =>
      graft.functions.StringFunctions.hamming(rec(a), rec(b))
    case ("jaccard", Seq(a, b)) =>
      graft.functions.StringFunctions.jaccard(rec(a), rec(b))
    // string-similarity family (codegen'd expressions like hamming):
    // full Damerau-Levenshtein with the alphabet table, classic Jaro,
    // Jaro-Winkler with the unconditional prefix boost (DuckDB probed)
    case ("damerau_levenshtein", Seq(a, b)) =>
      graft.functions.StringFunctions.damerau(rec(a), rec(b))
    case ("jaro_similarity", Seq(a, b)) =>
      graft.functions.StringFunctions.jaro(rec(a), rec(b))
    case ("jaro_winkler_similarity", Seq(a, b)) =>
      graft.functions.StringFunctions.jaroWinkler(rec(a), rec(b))
    // continued in lowerFunc2 — the single (name, args) match outgrew
    // the JVM 64KB method bytecode limit (round-12 verdict #4); the
    // split is POSITIONAL at case boundaries, so case order (and thus
    // dispatch semantics) is exactly the pre-split order.
    case _ => lowerFunc2(name, args, rec)
  }

  /** Continuation of lowerFunc (method-size split, part 2 of 3). */
  private def lowerFunc2(name: String, args: Seq[BoundOperand],
      rec: BoundOperand => Column): Column = (name, args) match {
    case ("strip_accents", Seq(a)) =>
      graft.functions.StringFunctions.stripAccents(rec(a))
    case ("nfc_normalize", Seq(a)) =>
      graft.functions.StringFunctions.nfcNormalize(rec(a))
    // ord is DuckDB's unicode() alias (probed: ord('') = -1 like unicode,
    // where ascii('') = 0)
    case ("ord", Seq(a)) =>
      val c = rec(a)
      when(length(c) === 0, lit(-1)).otherwise(ascii(c))
    // format_bytes: binary units, value TRUNCATED (not rounded) to one
    // decimal — in TWO stages (DuckDB probed: 17406450 bytes is 16.6000
    // MiB by direct division but prints '16.5 MiB': the byte count is
    // first integer-divided down to the previous unit — 16998 KiB — and
    // only that integer feeds the final one-decimal truncating division
    // by 1024). 1945 → '1.8 KiB'; < 1024 prints 'N bytes'
    case ("format_bytes", Seq(a)) =>
      val x = rec(a).cast("double")
      def scaled(k: Int): Column = {
        val inter = signum(x) * floor(abs(x) / math.pow(1024.0, k - 1))
        val t = signum(x) * floor(abs(inter) * 10 / 1024.0) / 10
        format_string("%.1f", t)
      }
      val units = Seq("KiB", "MiB", "GiB", "TiB", "PiB")
      val kib = lit(1024.0)
      units.zipWithIndex.foldRight(
        concat(rec(a).cast("string"),
          when(abs(x) === 1.0, lit(" byte")).otherwise(lit(" bytes")))) {
        case ((u, i), els) =>
          val k = i + 1
          val upper = pow(kib, k + 1)
          if (u == "PiB")
            when(abs(x) >= pow(kib, k), concat(scaled(k), lit(s" $u")))
              .otherwise(els)
          else
            when(abs(x) >= pow(kib, k) && abs(x) < upper,
              concat(scaled(k), lit(s" $u"))).otherwise(els)
      }
    // ---- wave 9: environment / misc scalars ----
    // encode/decode: VARCHAR ⇄ its UTF-8 bytes. decode of invalid UTF-8
    // substitutes U+FFFD here where DuckDB errors (documented posture —
    // a cast can't raise mid-codegen without losing the fast path)
    case ("encode", Seq(a)) => rec(a).cast("binary")
    case ("decode", Seq(a)) => rec(a).cast("string")
    case ("epoch_ns", Seq(a)) =>
      unix_micros(rec(a).cast("timestamp")) * lit(1000L)
    case ("nextafter", Seq(a, b)) =>
      graft.functions.NumericFunctions.nextafter(
        rec(a).cast("double"), rec(b).cast("double"))
    case ("map_from_entries", Seq(a)) => map_from_entries(rec(a))
    case ("struct_insert", as) =>
      as.tail.grouped(2).foldLeft(rec(as.head)) {
        case (c, Seq(BoundOperand.BLit(Lit.LitString(k)), v)) =>
          c.withField(k, rec(v))
        case other => sys.error(s"unreachable struct_insert shape $other")
      }
    // error('msg') raises with the user's message (DuckDB wraps it as
    // "Invalid Input Error: msg"; the wrapper text is engine-specific)
    case ("error", Seq(a)) => raise_error(rec(a).cast("string")).cast("string")
    // json_quote: serialize ONE value — ride to_json of a 1-element
    // array and strip the brackets (escaping comes out exactly JSON's)
    case ("json_quote", Seq(a)) => jsonScalarText(rec(a))
    // DuckDB's escape makes ANY following char literal; Spark's LIKE
    // rejects an escape before anything but % _ or itself. For literal
    // patterns, strip the no-op escapes (the char is literal in LIKE
    // anyway) so both engines accept the same pattern.
    case (lef @ ("like_escape" | "ilike_escape" | "not_like_escape" |
                 "not_ilike_escape"),
          Seq(a, b, BoundOperand.BLit(Lit.LitString(e)))) =>
      val pat = b match {
        case BoundOperand.BLit(Lit.LitString(p)) if e.nonEmpty =>
          val ec = e.head
          val sb = new StringBuilder
          var i = 0
          while (i < p.length) {
            if (p(i) == ec && i + 1 < p.length) {
              val c = p(i + 1)
              if (c == '%' || c == '_' || c == ec) { sb.append(ec); () }
              sb.append(c)
              i += 2
            } else { sb.append(p(i)); i += 1 }
          }
          lit(sb.toString)
        case _ => rec(b)
      }
      lef match {
        case "like_escape"      => like(rec(a), pat, lit(e))
        case "ilike_escape"     => ilike(rec(a), pat, lit(e))
        case "not_like_escape"  => !like(rec(a), pat, lit(e))
        case _                  => !ilike(rec(a), pat, lit(e))
      }
    case ("current_date", Seq())   => current_date()
    case ("now", Seq())            => current_timestamp()
    // environment introspection: the in-memory defaults — DuckDB's own
    // answers for an unnamed session; version is honest (engine-specific)
    case ("current_database", Seq()) => lit("memory")
    case ("current_schema", Seq())   => lit("main")
    case ("version", Seq())          => lit("v1.0.0-graft")
    case ("uuid", Seq())             => expr("uuid()")
    case ("random", Seq())           => rand()
    // md5_number_lower/upper: the digest's last/first 8 bytes read as a
    // LITTLE-ENDIAN unsigned 64-bit number (DuckDB probed against
    // hashlib) — reverse the hex byte pairs, conv(…,16,10) is unsigned,
    // DECIMAL(20,0) carries the full range
    // md5_number: the FULL 128-bit signed little-endian value — no Spark
    // integer carrier fits (DECIMAL(38,0) < 2^128), so it renders as the
    // HUGEINT's decimal text via a codegen'd BigInteger expression
    case ("md5_number", Seq(a)) =>
      graft.functions.StringFunctions.md5Number(rec(a).cast("string"))
    case (fn9 @ ("md5_number_lower" | "md5_number_upper"), Seq(a)) =>
      val h = md5(rec(a).cast("string"))
      val positions =
        if (fn9 == "md5_number_lower") Seq(31, 29, 27, 25, 23, 21, 19, 17)
        else Seq(15, 13, 11, 9, 7, 5, 3, 1)
      val beHex = concat(positions.map(i => h.substr(lit(i), lit(2))): _*)
      conv(beHex, 16, 10).cast("decimal(20,0)")
    // formatReadableDecimalSize: format_bytes' base-1000 sibling
    // (KB/MB/…; same truncate-to-one-decimal rule)
    case ("formatreadabledecimalsize", Seq(a)) =>
      val x = rec(a).cast("double")
      def scaled(k: Int): Column = {
        val v = x / math.pow(1000.0, k)
        val t = signum(v) * floor(abs(v) * 10) / 10
        format_string("%.1f", t)
      }
      val units = Seq("kB", "MB", "GB", "TB", "PB") // DuckDB's lowercase k
      val kb = lit(1000.0)
      units.zipWithIndex.foldRight(
        concat(rec(a).cast("string"),
          when(abs(x) === 1.0, lit(" byte")).otherwise(lit(" bytes")))) {
        case ((u, i), els) =>
          val k = i + 1
          if (u == "PB")
            when(abs(x) >= pow(kb, k), concat(scaled(k), lit(s" $u")))
              .otherwise(els)
          else
            when(abs(x) >= pow(kb, k) && abs(x) < pow(kb, k + 1),
              concat(scaled(k), lit(s" $u"))).otherwise(els)
      }
    // bar(x, min, max [, width=80]): full blocks + one floor'd eighth
    // block, NEGATIVE fractions render EMPTY but fractions above 1 CLAMP
    // to a full-width bar (DuckDB 1.0 probed: bar(15,0,10,10) = 10 full
    // blocks), and the space padding counts BYTES (each block char is
    // 3 UTF-8 bytes)
    case ("bar", as) if as.length == 3 || as.length == 4 =>
      val x = rec(as(0)).cast("double")
      val w = as.lift(3).map(rec(_).cast("double")).getOrElse(lit(80.0))
      val frac = (x - rec(as(1)).cast("double")) /
        (rec(as(2)).cast("double") - rec(as(1)).cast("double"))
      val blocksExact = when(frac < 0, lit(0.0))
        .when(frac > 1, w).otherwise(frac * w)
      val full = floor(blocksExact).cast("int")
      val eighth = floor((blocksExact - full) * 8).cast("int")
      val eighthChar = element_at(
        array(Seq("", "▏", "▎", "▍", "▌", "▋",
          "▊", "▉").map(lit): _*), eighth + 1)
      val body = concat(
        call_function("repeat", lit("█"), full), eighthChar)
      val byteLen = (full + when(eighth > 0, 1).otherwise(0)) * 3
      concat(body, call_function("repeat", lit(" "),
        greatest(w.cast("int") - byteLen, lit(0))))
    // to_days(n)-family INTERVAL constructors (column-capable where the
    // literal syntax is parse-time-fixed); placement enforced by the
    // analyzer, so these only ever feed temporal + / −
    case (ivf, Seq(n0)) if Analyzer.IntervalFuncs(ivf) =>
      val n = rec(n0)
      val z = lit(0)
      ivf match {
        case "to_years"    => make_interval(n.cast("int"))
        case "to_decades"  => make_interval((n * 10).cast("int"))
        case "to_centuries" => make_interval((n * 100).cast("int"))
        case "to_millennia" => make_interval((n * 1000).cast("int"))
        case "to_quarters" => make_interval(z, (n * 3).cast("int"))
        case "to_months"   => make_interval(z, n.cast("int"))
        case "to_weeks"    => make_interval(z, z, n.cast("int"))
        case "to_days"     => make_interval(z, z, z, n.cast("int"))
        case "to_hours"    => make_interval(z, z, z, z, n.cast("int"))
        case "to_minutes"  => make_interval(z, z, z, z, z, n.cast("int"))
        case "to_seconds"  =>
          make_interval(z, z, z, z, z, z, n.cast("decimal(18,6)"))
        case "to_milliseconds" =>
          make_interval(z, z, z, z, z, z,
            (n.cast("decimal(18,3)") / 1000).cast("decimal(18,6)"))
        case "to_microseconds" =>
          make_interval(z, z, z, z, z, z,
            (n.cast("decimal(18,0)") / 1000000).cast("decimal(18,6)"))
        case other => sys.error(s"unreachable interval constructor $other")
      }
    // age(a, b): Postgres/DuckDB symbolic interval — full months by
    // field subtraction with a day/time borrow (NOT months_between,
    // whose month-end fractions diverge at clamped anchors), then the
    // day count and time-of-day remainder against the month-shifted
    // anchor. age lowers to DuckDB's RENDERED text (the value CAST TO
    // VARCHAR reads — typeof remains a documented divergence);
    // date_part(unit, age(…)) fuses into __age_part and never
    // materializes the interval.
    case ("age" | "__age_part", _) =>
      val (unitOpt, a, b) = (name, args) match {
        case ("age", Seq(x, y)) => (None, x, y)
        case ("__age_part",
            Seq(BoundOperand.BLit(Lit.LitString(u)), x, y)) =>
          (Some(u.toLowerCase), x, y)
        case other => sys.error(s"unreachable age shape $other")
      }
      val x0 = rec(a).cast("timestamp")
      val y0 = rec(b).cast("timestamp")
      val neg = x0 < y0
      // Postgres timestamp_age borrow algebra lives in ONE compact
      // native expression (graft.functions.AgeParts) — the Column-DSL
      // version re-inlined the whole chain at every one of the ~20
      // references below, and six age() calls per SELECT turned that
      // into seconds of Catalyst analysis time (round-11 verdict #2).
      val parts = {
        import org.apache.spark.sql.graftbridge.Bridge
        Bridge.column(graft.functions.AgeParts(
          Bridge.expression(x0), Bridge.expression(y0)))
      }
      val us = parts.getField("micros")
      val d = parts.getField("days")
      val m = parts.getField("months")
      unitOpt match {
        case Some(u) =>
          // Column './' is fractional — the parts are non-negative
          // pre-sign, so floor-divide is exact integer division
          def idiv(c: Column, k: Long): Column = floor(c / k).cast("long")
          val mag = u match {
            case "year"   => idiv(m, 12L)
            case "month"  => m % 12L
            case "day"    => d
            case "hour"   => idiv(us, 3600000000L)
            case "minute" => idiv(us % 3600000000L, 60000000L)
            case _        => idiv(us % 60000000L, 1000000L)
          }
          when(x0.isNull || y0.isNull, lit(null).cast("long"))
            .otherwise(when(neg, -mag).otherwise(mag))
        case None =>
          val sign = when(neg, lit("-")).otherwise(lit(""))
          def seg(n: Column, word: String): Column =
            when(n =!= 0, concat(sign, n.cast("string"), lit(s" $word"),
              when(n =!= 1, lit("s")).otherwise(lit("")))).otherwise(lit(""))
          def idiv(c: Column, k: Long): Column = floor(c / k).cast("long")
          val h = idiv(us, 3600000000L)
          val mi = idiv(us % 3600000000L, 60000000L)
          val sec = idiv(us % 60000000L, 1000000L)
          val frac = us % 1000000L
          val timeStr = concat(sign,
            format_string("%02d:%02d:%02d", h.cast("int"), mi.cast("int"),
              sec.cast("int")),
            when(frac =!= 0,
              concat(lit("."), rtrim(format_string("%06d", frac.cast("int")),
                "0"))).otherwise(lit("")))
          val parts = array(
            seg(idiv(m, 12L), "year"), seg(m % 12L, "month"), seg(d, "day"),
            when(us =!= 0, timeStr).otherwise(lit("")))
          val joined = array_join(array_remove(parts, ""), " ")
          when(x0.isNull || y0.isNull, lit(null).cast("string"))
            .otherwise(when(joined === "", lit("00:00:00")).otherwise(joined))
      }
    // array_cross_product: 3-element vectors only (raises like DuckDB)
    case ("array_cross_product", Seq(a, b)) =>
      val (ac, bc) = (rec(a).cast("array<double>"), rec(b).cast("array<double>"))
      when(size(ac) =!= 3 || size(bc) =!= 3,
        raise_error(lit("array_cross_product requires two 3-element vectors")))
        .otherwise(array(
          element_at(ac, 2) * element_at(bc, 3) - element_at(ac, 3) * element_at(bc, 2),
          element_at(ac, 3) * element_at(bc, 1) - element_at(ac, 1) * element_at(bc, 3),
          element_at(ac, 1) * element_at(bc, 2) - element_at(ac, 2) * element_at(bc, 1)))
    // timezone parts of a naive TIMESTAMP read 0 (DuckDB probed — the
    // engine's timestamps are session-naive like the fixtures')
    // TIME / TIMESTAMPTZ family — its own method: lowerFunc is at the
    // JVM 64KB method-size limit
    case (ftz, as) if Lowering.TimeTzFuncs(ftz) => lowerTimeTz(ftz, as, rec)
    // ENUM plumbing — same split
    case (fe, as) if Lowering.EnumFuncs(fe) => lowerEnum(fe, as, rec)
    // half-to-even double rounding (DuckDB's DOUBLE -> integer cast)
    case ("__rint", Seq(a)) => call_function("rint", rec(a))
    // UNION (tagged sum) carrier plumbing — same split
    case (fu, as) if Lowering.UnionFuncs(fu) => lowerUnion(fu, as, rec)
    case ("timezone" | "timezone_hour" | "timezone_minute", Seq(a)) =>
      when(rec(a).cast("timestamp").isNull, lit(null).cast("int"))
        .otherwise(lit(0))
    // hash: 64-bit value hash — ENGINE-SPECIFIC values (Spark's
    // xxhash64 here vs DuckDB's own); spec-only surface
    case ("hash", Seq(a)) => xxhash64(rec(a))
    // setseed: VOID no-op — a distributed engine has no global RNG to
    // reseed; rand() seeds per-partition
    case ("setseed", Seq(a)) => lit(null).cast("string")
    // fdiv/fmod: floor division / floor modulo as DOUBLE (DuckDB
    // probed: fdiv(-7,2) = -4, fmod(-7,3) = 2; x/0 and x%0 read NULL)
    case ("fdiv", Seq(a, b)) =>
      floor(try_divide(rec(a).cast("double"), rec(b).cast("double")))
        .cast("double")
    case ("fmod", Seq(a, b)) =>
      val (xd, yd) = (rec(a).cast("double"), rec(b).cast("double"))
      xd - yd * floor(try_divide(xd, yd))
    // BIT functions over '0'/'1' bitstrings (the BIT type is carried as
    // VARCHAR — DuckDB renders BIT as the bitstring text, so values
    // hash-identically); get_bit/set_bit index 0-based from the LEFT,
    // out-of-range raises like DuckDB
    case ("get_bit", Seq(b0, i0)) =>
      val b = rec(b0); val i = rec(i0).cast("int")
      when(i < 0 || i >= length(b), raise_error(concat(
        lit("bit index "), i.cast("string"),
        lit(" out of valid range (0.."), (length(b) - 1).cast("string"),
        lit(")")))).otherwise(b.substr(i + 1, lit(1)).cast("int"))
    case ("set_bit", Seq(b0, i0, v0)) =>
      val b = rec(b0); val i = rec(i0).cast("int")
      val v = rec(v0).cast("int")
      when(i < 0 || i >= length(b), raise_error(concat(
        lit("bit index "), i.cast("string"),
        lit(" out of valid range (0.."), (length(b) - 1).cast("string"),
        lit(")"))))
        .when(v =!= 0 && v =!= 1,
          raise_error(lit("set_bit value must be 0 or 1")))
        .otherwise(concat(b.substr(lit(1), i), v.cast("string"),
          b.substr(i + 2, length(b))))
    // bit_position(search, source): 1-based leftmost match, 0 absent
    case ("bit_position", Seq(n0, h0)) =>
      instr(rec(h0), rec(n0)).cast("int")
    // bitstring(s, len): left-pad with '0' to len; len below the input
    // length raises like DuckDB
    case ("bitstring", Seq(b0, l0)) =>
      val b = rec(b0); val l = rec(l0).cast("int")
      when(l < length(b), raise_error(
        lit("bitstring: length must be equal or larger than input string")))
        .otherwise(call_function("lpad", b, l, lit("0")))
    // from_json / json_transform: JSON text → TYPED values under a
    // structure literal. Spark's from_json is type-strict where DuckDB
    // casts eagerly ("1" → BIGINT 1, 1.9 → INTEGER 2), so the parse
    // runs with STRING leaves and each leaf then casts with DuckDB's
    // JSON semantics: integers take the exact-long route when the text
    // is integral, the double+half-away-round route otherwise; lax
    // forms read NULL on a failed cast, strict forms raise.
    case (fj @ ("from_json" | "from_json_strict"),
        Seq(j, BoundOperand.BLit(Lit.LitString(st)))) =>
      val tpe = Analyzer.parseJsonStructure(st)
        .fold(e => sys.error(s"unreachable from_json structure: $e"), identity)
      def stringLeaves(t: SqlType): org.apache.spark.sql.types.DataType = t match {
        case SqlType.SqlStruct(fs) => org.apache.spark.sql.types.StructType(
          fs.map { case (n, ft) =>
            org.apache.spark.sql.types.StructField(n, stringLeaves(ft)) })
        case SqlType.SqlArray(e) =>
          org.apache.spark.sql.types.ArrayType(stringLeaves(e))
        case _ => org.apache.spark.sql.types.StringType
      }
      val strict = fj == "from_json_strict"
      def castLeaf(c: Column, t: SqlType): Column = {
        val lax = t match {
          case SqlType.SqlBigInt | SqlType.SqlInt | SqlType.SqlSmallInt =>
            // the double route rounds HALF-TO-EVEN like DuckDB's JSON
            // casts (probed: 2.5→2, 1.5→2, 0.5→0, -2.5→-2) — rint, not
            // the half-away rule decimal casts use
            val viaDouble = c.try_cast(org.apache.spark.sql.types.DoubleType)
            val rounded = call_function("rint", viaDouble)
            coalesce(c.try_cast(org.apache.spark.sql.types.LongType),
              rounded.try_cast(org.apache.spark.sql.types.LongType)).cast(t.spark)
          case SqlType.SqlBool =>
            // JSON booleans arrive as 'true'/'false' text
            when(lower(c) === "true", lit(true))
              .when(lower(c) === "false", lit(false))
              .otherwise(lit(null).cast("boolean"))
          case other => c.try_cast(other.spark)
        }
        if (!strict) lax
        else when(c.isNotNull && lax.isNull, raise_error(concat(
          lit(s"from_json_strict: failed to cast value to ${t.render}: "),
          c)).cast(t.spark)).otherwise(lax)
      }
      def typed(c: Column, t: SqlType): Column = t match {
        case SqlType.SqlStruct(fs) =>
          when(c.isNull, lit(null).cast(t.spark)).otherwise(
            struct(fs.map { case (n, ft) =>
              typed(c.getField(n), ft).as(n) }: _*))
        case SqlType.SqlArray(e) =>
          transform(c, x => typed(x, e))
        case scalar => castLeaf(c, scalar)
      }
      typed(from_json(rec(j), stringLeaves(tpe)), tpe)
    // JSON document algebra (Jackson tree walks; DuckDB 1.0 probed)
    case ("json_merge_patch", Seq(a, b)) =>
      graft.functions.JsonFunctions.mergePatch(
        rec(a).cast("string"), rec(b).cast("string"))
    case ("json_structure", Seq(a)) =>
      graft.functions.JsonFunctions.structure(rec(a).cast("string"))
    case ("json_contains", Seq(a, b)) =>
      graft.functions.JsonFunctions.jsonContains(
        rec(a).cast("string"), rec(b).cast("string"))
    // grapheme-cluster string functions (UTS #29 segmentation — Java's
    // \X regex matches DuckDB's utf8proc clusters; ZWJ-emoji verified)
    case ("length_grapheme", Seq(a)) =>
      graft.functions.StringFunctions.lengthGrapheme(rec(a))
    case ("left_grapheme", Seq(a, n)) =>
      graft.functions.StringFunctions.leftGrapheme(rec(a), rec(n).cast("long"))
    case ("right_grapheme", Seq(a, n)) =>
      graft.functions.StringFunctions.rightGrapheme(rec(a), rec(n).cast("long"))
    case ("substring_grapheme", Seq(a, st, ln)) =>
      graft.functions.StringFunctions.substringGrapheme(
        rec(a), rec(st).cast("long"), rec(ln).cast("long"))
    // fused-loop vector expressions (the ANN operators' DotProduct /
    // L2Distance); unequal dimensions raise like DuckDB
    case ("list_dot_product" | "list_inner_product", Seq(a, b)) =>
      val (ac, bc) = (rec(a).cast("array<double>"), rec(b).cast("array<double>"))
      when(size(ac) =!= size(bc),
        raise_error(lit("list dimensions must be equal")))
        .otherwise(graft.functions.VectorFunctions.dot(ac, bc))
    case ("list_distance", Seq(a, b)) =>
      val (ac, bc) = (rec(a).cast("array<double>"), rec(b).cast("array<double>"))
      when(size(ac) =!= size(bc),
        raise_error(lit("list dimensions must be equal")))
        .otherwise(graft.functions.VectorFunctions.l2dist(ac, bc))
    case ("list_cosine_similarity", Seq(a, b)) =>
      val (ac, bc) = (rec(a).cast("array<double>"), rec(b).cast("array<double>"))
      when(size(ac) =!= size(bc),
        raise_error(lit("list dimensions must be equal")))
        .otherwise(graft.functions.VectorFunctions.cosine(ac, bc))
    // list utility family (DuckDB probed semantics):
    //   list_select: 1-based positions; 0 and out-of-range read NULL
    //   list_where: mask filter; a NULL mask entry raises like DuckDB
    //   list_resize: truncate or NULL-pad to n
    //   list_grade_up: 1-based indexes that would sort ascending,
    //     stable, NULLs last
    //   list_reverse_sort: descending, NULLs last (Spark's sort_array
    //     desc places NULLs last too)
    //   list_any_value: first non-NULL element
    case ("list_select", Seq(a, idx)) =>
      val arr = rec(a)
      transform(rec(idx), i =>
        org.apache.spark.sql.functions.get(arr, i.cast("int") - 1))
    case ("list_where", Seq(a, m)) =>
      val mask = rec(m)
      when(exists(mask, _.isNull), raise_error(lit(
        "list_where: NULLs are not allowed as mask elements")))
        .otherwise(transform(
          filter(zip_with(rec(a), mask, (x, keep) =>
            struct(x.as("v"), keep.as("k"))), s => s.getField("k")),
          s => s.getField("v")))
    case ("list_resize", Seq(a, n)) =>
      val arr = rec(a)
      val nn = rec(n).cast("int")
      when(size(arr) >= nn, slice(arr, lit(1), greatest(nn, lit(0))))
        .otherwise(concat(arr,
          transform(sequence(lit(1), nn - size(arr)), _ =>
            org.apache.spark.sql.functions.get(arr, lit(-1)))))
    case ("list_grade_up", Seq(a)) =>
      val arr = rec(a)
      val zipped = zip_with(arr,
        sequence(lit(1L), size(arr).cast("long")),
        (v, i) => struct(v.as("v"), i.as("i")))
      val nn = array_sort(filter(zipped, s => s.getField("v").isNotNull))
      val nulls = filter(zipped, s => s.getField("v").isNull)
      transform(concat(nn, nulls), s => s.getField("i"))
    case ("list_reverse_sort", Seq(a)) => sort_array(rec(a), asc = false)
    case ("list_any_value", Seq(a)) =>
      org.apache.spark.sql.functions.get(
        filter(rec(a), x => x.isNotNull), lit(0))
    // date_diff('part', a, b): DuckDB counts PART-boundary crossings —
    // exact integer arithmetic on both engines (day: date difference;
    // month/year: calendar component differences; hour/minute/second:
    // epoch-quotient differences, positive-epoch contract)
    case ("date_diff", Seq(BoundOperand.BLit(Lit.LitString(u)), a, b)) =>
      val (s0, e0) = (rec(a), rec(b))
      (u.toLowerCase match {
        case "day"   => datediff(e0, s0)
        case "month" =>
          (year(e0) * 12 + month(e0)) - (year(s0) * 12 + month(s0))
        case "year"  => year(e0) - year(s0)
        case "hour"   => (e0.cast("long") / 3600).cast("long") -
          (s0.cast("long") / 3600).cast("long")
        case "minute" => (e0.cast("long") / 60).cast("long") -
          (s0.cast("long") / 60).cast("long")
        case _ /* second */ => e0.cast("long") - s0.cast("long")
      }).cast("long")
    // `a // b` with two INTEGER legs (the analyzer reroutes float legs
    // to plain division — DuckDB probed): truncating-toward-zero
    // division; x // 0 reads NULL, the engine's established division
    // posture (DuckDB raises there — documented divergence, same class
    // as x / 0)
    case ("__intdiv", Seq(a, b)) =>
      try_divide(rec(a).cast("long"), rec(b).cast("long")).cast("long")
    // ---- JSON family (DuckDB 1.0 probed) ----
    // json_extract returns JSON TEXT — strings stay quoted ("x"), so
    // Spark's get_json_object (which unquotes) can't express it; the
    // variant route can: to_json(variant_get(parse_json(j), path)).
    // Paths accept '$.a[1]', '/a/b' JSON-pointer, and bare-key forms
    // (all probed), normalized to the $ form at lowering.
    case ("json_extract" | "json_extract_path",
        Seq(a, BoundOperand.BLit(Lit.LitString(p)))) =>
      to_json(variant_get(parse_json(rec(a)), jsonDollarPath(p), "variant"))
    case ("json_array_length", Seq(a)) =>
      json_array_length(rec(a)).cast("long")
    case ("json_array_length", Seq(a, BoundOperand.BLit(Lit.LitString(p)))) =>
      json_array_length(get_json_object(rec(a), jsonDollarPath(p))).cast("long")
    case ("json_keys", Seq(a)) => json_object_keys(rec(a))
    case ("json_valid", Seq(a)) => try_parse_json(rec(a)).isNotNull
    // json_type name mapping (probed): OBJECT/ARRAY/VARCHAR/BOOLEAN/
    // NULL, integers read UBIGINT when non-negative, all other numerics
    // DOUBLE. schema_of_variant supplies the Spark-side class; a
    // scale-0 DECIMAL is an integer that overflowed BIGINT.
    case ("json_type", Seq(a)) =>
      val v = parse_json(rec(a))
      val sch = schema_of_variant(v)
      val num = variant_get(v, "$", "double")
      when(sch.startsWith("OBJECT"), lit("OBJECT"))
        .when(sch.startsWith("ARRAY"), lit("ARRAY"))
        .when(sch === "STRING", lit("VARCHAR"))
        .when(sch === "BOOLEAN", lit("BOOLEAN"))
        .when(sch === "VOID", lit("NULL"))
        .when(sch === "BIGINT" || sch.rlike("^DECIMAL\\([0-9]+,0\\)$"),
          when(num >= 0, lit("UBIGINT")).otherwise(lit("BIGINT")))
        .otherwise(lit("DOUBLE"))
    // json_object / json_array: built by concat so the JSON TYPE
    // PROPAGATES — a nested json_array/json_object/json_extract value
    // embeds raw where the old to_json(named_struct) route quoted it
    // as a string ('{"a":[0,2]}', not '{"a":"[0,2]"}'); NULL values
    // read null (DuckDB probed — Spark's to_json would omit the field).
    // Scalar serialization rides to_json(array(x)) with the brackets
    // stripped (exact JSON escaping, arrays keep null elements).
    case ("json_object", as) if as.length % 2 == 0 =>
      val parts = as.grouped(2).map { pair =>
        val Seq(BoundOperand.BLit(Lit.LitString(key)), v) = pair: @unchecked
        concat(jsonScalarText(lit(key)), lit(":"), jsonValueText(v, rec))
      }.toSeq
      if (parts.isEmpty) lit("{}")
      else concat(lit("{") +: parts.flatMap(p => Seq(lit(","), p)).tail :+ lit("}"): _*)
    case ("json_array", as) =>
      if (as.isEmpty) lit("[]")
      else concat(lit("[") +:
        as.map(v => jsonValueText(v, rec)).flatMap(p => Seq(lit(","), p)).tail :+
        lit("]"): _*)
    // wave-8 scalar batch (all DuckDB 1.0 probed)
    // bin: binary text of an integer (Spark's native bin matches;
    // DuckDB's string-input form — per-byte expansion — is not taken,
    // the analyzer admits numerics only via the cast below)
    case ("bin", Seq(a)) => bin(rec(a).cast("long"))
    // unbin: '0101…' → packed BLOB, left-padded to whole bytes
    // (hex(unbin('101')) = '05'); composed: bits → long → hex →
    // left-pad to 2·⌈len/8⌉ digits → unhex
    case ("unbin", Seq(a)) =>
      val s = rec(a)
      val digits = ceil(length(s).cast("double") / 8).cast("int") * 2
      unhex(lpad(hex(conv(s, 2, 10).cast("long")), digits, lit("0")))
    case ("to_base64", Seq(a)) => base64(rec(a).cast("binary"))
    case ("from_base64", Seq(a)) => unbase64(rec(a))
    case ("xor", Seq(a, b)) =>
      rec(a).cast("long").bitwiseXOR(rec(b).cast("long"))
    // regexp_escape: every char outside [A-Za-z0-9_] gets a backslash
    // (RE2 QuoteMeta, probed: space/comma/slash all escaped)
    case ("regexp_escape", Seq(a)) =>
      regexp_replace(rec(a), lit("([^A-Za-z0-9_])"), lit("\\\\$1"))
    // millisecond/microsecond INCLUDE the seconds component (DuckDB
    // probed: 10:30:45.123456 → ms 45123, µs 45123456); epoch minutes
    // are 60-aligned so a positive-epoch modulus is exact
    case ("microsecond", Seq(a)) =>
      (unix_micros(rec(a).cast("timestamp")) % 60000000L).cast("int")
    case ("millisecond", Seq(a)) =>
      ((unix_micros(rec(a).cast("timestamp")) % 60000000L) / 1000L).cast("int")
    case ("decade", Seq(a)) => floor(year(rec(a)).cast("double") / 10).cast("int")
    case ("millennium", Seq(a)) =>
      ceil(year(rec(a)).cast("double") / 1000).cast("int")
    // weekday: Sunday = 0 … Saturday = 6 (Spark's dayofweek is Sun = 1)
    case ("weekday", Seq(a)) => (dayofweek(rec(a)) - 1).cast("int")
    // yearweek: ISO year · 100 + ISO week (202403 for 2024-01-15)
    case ("yearweek", Seq(a)) =>
      val d = rec(a)
      val iso = (dayofweek(d) + 5) % 7 + 1
      (year(date_add(d.cast("date"), (lit(4) - iso).cast("int"))) * 100 +
        weekofyear(d)).cast("int")
    // julian day number as a double (julian(2000-01-01) = 2451545.0)
    case ("julian", Seq(a)) =>
      (datediff(rec(a).cast("date"), lit(java.sql.Date.valueOf("2000-01-01")))
        + lit(2451545)).cast("double")
    case ("era", Seq(a)) =>
      when(year(rec(a)) > 0, lit(1)).otherwise(lit(0))
    // wave-7 scalar batch (all DuckDB 1.0 probed)
    case ("dayname", Seq(a))   => date_format(rec(a), "EEEE")
    case ("monthname", Seq(a)) => date_format(rec(a), "MMMM")
    // even: round away from zero to the next EVEN integer
    // (2.5 → 4, -2.5 → -4, 3 → 4, 2 → 2)
    case ("even", Seq(a)) =>
      val x = rec(a).cast("double")
      signum(x) * ceil(abs(x) / 2) * 2
    // signbit: negative reads true; DuckDB 1.0 reads FALSE for -0.0
    // (probed), so a plain < 0 matches
    case ("signbit", Seq(a)) => rec(a) < lit(0)
    case ("gamma", Seq(a)) =>
      graft.functions.NumericFunctions.gamma(rec(a).cast("double"))
    case ("lgamma", Seq(a)) =>
      graft.functions.NumericFunctions.lgamma(rec(a).cast("double"))
    // trunc: toward zero (2.7 → 2, -2.7 → -2)
    case ("trunc", Seq(a)) =>
      val x = rec(a).cast("double")
      signum(x) * floor(abs(x))
    // round_even = banker's rounding — Spark's bround is exactly that
    case ("round_even", Seq(a)) => bround(rec(a).cast("double"), 0)
    case _ => lowerFunc3(name, args, rec)
  }

  /** Continuation of lowerFunc (method-size split, part 3 of 3). */
  private def lowerFunc3(name: String, args: Seq[BoundOperand],
      rec: BoundOperand => Column): Column = (name, args) match {
    case ("round_even", Seq(a, BoundOperand.BLit(Lit.LitLong(n)))) =>
      bround(rec(a).cast("double"), n.toInt)
    case ("century", Seq(a)) => ceil(year(rec(a)).cast("double") / 100).cast("int")
    // isodow: Monday = 1 … Sunday = 7 (Spark's dayofweek is Sunday = 1)
    case ("isodow", Seq(a)) =>
      ((dayofweek(rec(a)) + 5) % 7 + 1).cast("int")
    case ("week" | "weekofyear", Seq(a)) => weekofyear(rec(a))
    case ("dayofmonth", Seq(a)) => dayofmonth(rec(a))
    // isoyear: the year of the ISO week = the year of that week's
    // Thursday (date + (4 − isodow) days)
    case ("isoyear", Seq(a)) =>
      val d = rec(a)
      val iso = (dayofweek(d) + 5) % 7 + 1
      year(date_add(d.cast("date"), (lit(4) - iso).cast("int")))
    case ("prefix", Seq(a, b)) => rec(a).startsWith(rec(b))
    case ("suffix", Seq(a, b)) => rec(a).endsWith(rec(b))
    // regexp_full_match: the anchored form of regexp_matches
    case ("regexp_full_match", Seq(a, b)) =>
      regexp_like(rec(a), concat(lit("^(?:"), rec(b), lit(")$")))
    case ("floor", Seq(a))    => floor(rec(a))
    case ("ceil", Seq(a))     => ceil(rec(a))
    case ("sqrt", Seq(a))     => sqrt(rec(a))
    case ("power", Seq(a, b)) => pow(rec(a), rec(b))
    case ("instr", Seq(a, b)) => instr(rec(a), rec(b))
    case ("mod", Seq(a, b))   => try_mod(rec(a), rec(b)) // mod(x,0) NULL
    // days from b to a (Spark argument order: end, start)
    case ("datediff", Seq(a, b)) => datediff(rec(a), rec(b))
    // date ± integer days (analyzer rebinds of DATE arithmetic)
    case ("date_add_days", Seq(a, b)) => date_add(rec(a), rec(b).cast("int"))
    case ("date_sub_days", Seq(a, b)) => date_sub(rec(a), rec(b).cast("int"))
    case ("date_trunc", Seq(BoundOperand.BLit(Lit.LitString(u)), b)) =>
      date_trunc(u.toLowerCase, rec(b))
    case ("ltrim", Seq(a))   => ltrim(rec(a))
    case ("rtrim", Seq(a))   => rtrim(rec(a))
    // DuckDB/Postgres-parity prefix/suffix take: a NEGATIVE n drops |n|
    // characters from the opposite end (Spark's own left/right return ''
    // there, so these lower as substr algebra instead)
    case ("left", Seq(a, n0)) =>
      val c = rec(a); val n = rec(n0).cast("int")
      c.substr(lit(1), when(n >= 0, n).otherwise(greatest(length(c) + n, lit(0))))
    case ("right", Seq(a, n0)) =>
      val c = rec(a); val n = rec(n0).cast("int")
      val start = when(n >= 0, greatest(length(c) - n + 1, lit(1))).otherwise(-n + 1)
      c.substr(start, length(c))
    case ("translate", Seq(a, BoundOperand.BLit(Lit.LitString(from)),
        BoundOperand.BLit(Lit.LitString(to)))) => translate(rec(a), from, to)
    case ("date_part", Seq(BoundOperand.BLit(Lit.LitString(u)), b)) =>
      u.toLowerCase match {
        case "year" => year(rec(b)).cast("int")
        case "quarter" => quarter(rec(b)).cast("int")
        case "month" => month(rec(b)).cast("int")
        case "day" => dayofmonth(rec(b)).cast("int")
        case "hour" => hour(rec(b)).cast("int")
        case "minute" => minute(rec(b)).cast("int")
        case "week" => weekofyear(rec(b)).cast("int") // ISO week, both engines
        // DuckDB dow: Sunday=0; Spark dayofweek: Sunday=1
        case "dow" | "dayofweek" => (dayofweek(rec(b)) - 1).cast("int")
        case "doy" | "dayofyear" => dayofyear(rec(b)).cast("int")
        // seconds since epoch with fraction (DuckDB epoch is DOUBLE);
        // cast(timestamp as double) IS fractional epoch seconds in Spark
        case "epoch" => rec(b).cast("timestamp").cast("double")
        case _ => second(rec(b)).cast("int")
      }
    case ("make_date", Seq(y, m, d)) => make_date(rec(y), rec(m), rec(d))
    // trim-characters forms. A literal chars argument uses the functions
    // API; a non-literal one (a column / expression) builds the same
    // Catalyst StringTrim* node through the bridge — both codegen'd.
    case ("trim", Seq(a, BoundOperand.BLit(Lit.LitString(ch))))  => trim(rec(a), ch)
    case ("ltrim", Seq(a, BoundOperand.BLit(Lit.LitString(ch)))) => ltrim(rec(a), ch)
    case ("rtrim", Seq(a, BoundOperand.BLit(Lit.LitString(ch)))) => rtrim(rec(a), ch)
    // ---- list/array functions (DuckDB surface onto Spark natives) ----
    case ("list_value", as) => array(as.map(rec): _*)
    case ("len" | "array_length", Seq(a)) => size(rec(a))
    // 1-based; 0 → NULL, negative indexes from the end, OOB → NULL
    // (DuckDB list_extract semantics; try_element_at gives the OOB NULL,
    // the CASE guards index 0 — evaluated lazily, so 0 never reaches it)
    case ("list_extract" | "list_element", Seq(a, i)) =>
      when(rec(i) === 0, lit(null))
        .otherwise(try_element_at(rec(a), rec(i).cast("int")))
    case ("list_contains" | "array_contains", Seq(a, e)) =>
      array_contains(rec(a), rec(e))
    // DuckDB's list_distinct drops NULLs and has no order guarantee;
    // compact-then-distinct preserves first occurrence (sort explicitly
    // when order matters)
    case ("list_distinct" | "array_distinct", Seq(a)) =>
      array_distinct(array_compact(rec(a)))
    // ascending, NULLs LAST (DuckDB's default == Spark array_sort's)
    case ("list_sort" | "array_sort", Seq(a)) => array_sort(rec(a))
    // directional sort: DESC via sort-ascending + reverse (NULLs land
    // FIRST on DESC — DuckDB's default NULLS LAST for DESC differs only
    // when NULL elements are present; avoid NULL elements where parity
    // matters, same caveat as list_distinct ordering)
    case ("list_sort" | "array_sort",
        Seq(a, BoundOperand.BLit(Lit.LitString(dr)))) =>
      if (dr.equalsIgnoreCase("desc")) reverse(array_sort(rec(a)))
      else array_sort(rec(a))
    // list higher-order functions: Spark's codegen'd transform/filter/
    // aggregate with the lambda body lowered under a parameter
    // environment (captured columns resolve through `rec`, so the
    // lambda works in scan, join and post-aggregation scopes alike)
    case ("list_transform", Seq(a, BoundOperand.BLambda(ps, body))) =>
      transform(rec(a), x => lowerLambdaBody(body, Map(ps.head -> x), rec))
    case ("list_filter", Seq(a, BoundOperand.BLambda(ps, body))) =>
      filter(rec(a), x => lowerLambdaBody(body, Map(ps.head -> x), rec)
        .cast("boolean"))
    case ("list_reduce", Seq(a, BoundOperand.BLambda(ps, body))) =>
      // DuckDB folds the list with its FIRST element as the seed (an
      // empty list errors there; here it reads NULL — documented)
      val c = rec(a)
      aggregate(
        slice(c, lit(2), greatest(size(c) - 1, lit(0))),
        try_element_at(c, lit(1)),
        (acc, x) => lowerLambdaBody(body,
          Map(ps.head -> acc, ps(1) -> x), rec))
    case ("array_to_string", Seq(a, BoundOperand.BLit(Lit.LitString(sep)))) =>
      array_join(rec(a), sep)
    // literal separator, split LITERALLY (DuckDB string_split is not a
    // regex) — quote it against Spark's regex split
    case ("string_split" | "string_to_array" | "split",
        Seq(a, BoundOperand.BLit(Lit.LitString(sep)))) =>
      split(rec(a), java.util.regex.Pattern.quote(sep))
    // the REGEX split (literal pattern, passed through un-quoted)
    case ("regexp_split_to_array",
        Seq(a, BoundOperand.BLit(Lit.LitString(pat)))) =>
      split(rec(a), pat)
    // 1-based position, 0 when absent (both engines)
    case ("list_position" | "array_position", Seq(a, e)) =>
      array_position(rec(a), rec(e))
    case ("list_concat" | "array_concat", Seq(a, b)) => concat(rec(a), rec(b))
    // l[a:b] — 1-based, both ends inclusive (DuckDB bracket slice)
    case ("list_slice", Seq(a, i, j)) =>
      slice(rec(a), rec(i), rec(j) - rec(i) + lit(1))
    // s[i] / s[a:b] — DuckDB's STRING subscript/slice (1-based,
    // inclusive; index 0 reads the empty string, negatives count from
    // the end via substr's own semantics)
    case ("str_extract", Seq(a, i)) =>
      val ic = rec(i).cast("int")
      when(ic === 0, lit("")).otherwise(rec(a).substr(ic, lit(1)))
    // s[a:b]: DuckDB normalizes a NEGATIVE bound n to len + n + 1
    // (so -1 is the last char, inclusive), then clamps lo to 1 and hi
    // to len; hi < lo reads '' (probed: 'hello'[2:-1]='ello',
    // [-3:-1]='llo', [-100:2]='he', [2:0]='')
    case ("str_slice", Seq(a, i, j)) =>
      val s = rec(a)
      val len = length(s)
      val i0 = rec(i).cast("int"); val j0 = rec(j).cast("int")
      val lo = greatest(when(i0 < 0, len + i0 + 1).otherwise(i0), lit(1))
      val hi = least(when(j0 < 0, len + j0 + 1).otherwise(j0), len)
      when(hi < lo, lit("")).otherwise(s.substr(lo, hi - lo + lit(1)))
    // explode: Spark's Generate — valid only as a top-level projection
    // item (analyzer-enforced); drops empty/NULL rows like DuckDB
    case ("unnest", Seq(a)) => explode(rec(a))
    case ("trim", Seq(a, ch)) =>
      graft.functions.TrimExprs.trimCol(rec(a), rec(ch), "both")
    case ("ltrim", Seq(a, ch)) =>
      graft.functions.TrimExprs.trimCol(rec(a), rec(ch), "leading")
    case ("rtrim", Seq(a, ch)) =>
      graft.functions.TrimExprs.trimCol(rec(a), rec(ch), "trailing")
    case ("reverse", Seq(a)) => reverse(rec(a))
    case ("md5", Seq(a))     => md5(rec(a).cast("binary"))
    case ("levenshtein", Seq(a, b)) => levenshtein(rec(a), rec(b))
    // DuckDB chr() takes any unicode CODEPOINT; Spark's char() is
    // mod-256 ASCII (chr(769) would silently read '')
    case ("chr", Seq(a)) =>
      graft.functions.StringFunctions.chrCodepoint(rec(a).cast("bigint"))
    case ("ascii", Seq(a))    => ascii(rec(a))
    case ("to_hex", Seq(a))   => hex(rec(a))
    // hex/unhex/from_hex: Spark's natives are parity-exact with DuckDB
    // (probed: uppercase digits, string→byte hex, two's-complement
    // 64-bit for negative integers)
    case ("hex", Seq(a))      => hex(rec(a))
    case ("unhex" | "from_hex", Seq(a)) => unhex(rec(a))
    // format('{} and {}', a, b) — fmt-style with sequential {} and
    // positional {n} placeholders, {{ }} escapes (the analyzer rejects
    // {:spec} forms). Desugars into one codegen'd concat: concat is
    // NULL-propagating, which IS DuckDB's rule (format with any NULL
    // argument reads NULL, probed).
    case ("format", BoundOperand.BLit(Lit.LitString(fmt)) +: rest) =>
      val pieces = scala.collection.mutable.ArrayBuffer.empty[Column]
      val sb = new StringBuilder
      var next = 0
      var i = 0
      while (i < fmt.length) {
        val c = fmt.charAt(i)
        if (c == '{' && i + 1 < fmt.length && fmt.charAt(i + 1) == '{') {
          sb.append('{'); i += 2
        } else if (c == '}' && i + 1 < fmt.length && fmt.charAt(i + 1) == '}') {
          sb.append('}'); i += 2
        } else if (c == '{') {
          val close = fmt.indexOf('}', i)
          val inner = fmt.substring(i + 1, close)
          val idx = if (inner.isEmpty) { next += 1; next - 1 } else inner.toInt
          if (sb.nonEmpty) { pieces += lit(sb.toString); sb.clear() }
          pieces += rec(rest(idx)).cast("string")
          i = close + 1
        } else { sb.append(c); i += 1 }
      }
      if (sb.nonEmpty) pieces += lit(sb.toString)
      if (pieces.isEmpty) lit("") else concat(pieces.toSeq: _*)
    // path helpers (DuckDB probed: parse_path('/a/b/c.txt') =
    // ['/', 'a', 'b', 'c.txt']; parse_dirname = first component,
    // parse_filename = last (optionally extension-trimmed),
    // parse_dirpath = the path minus the final component)
    case ("parse_path", Seq(a)) =>
      val p = rec(a)
      val parts = filter(split(p, "/"), x => x =!= "")
      when(p.startsWith("/"), concat(array(lit("/")), parts))
        .otherwise(parts)
    case ("parse_dirname", Seq(a)) =>
      val p = rec(a)
      val parts = filter(split(p, "/"), x => x =!= "")
      when(p.startsWith("/"), lit("/"))
        .otherwise(coalesce(
          org.apache.spark.sql.functions.get(parts, lit(0)), lit("")))
    case ("parse_filename", as) if as.nonEmpty =>
      val p = rec(as.head)
      val base = element_at(filter(split(p, "/"), x => x =!= ""), -1)
      val trimExt = as.lift(1) match {
        case Some(BoundOperand.BLit(Lit.LitBool(b))) => b
        case _                                       => false
      }
      if (trimExt) regexp_replace(base, "\\.[^.]*$", "") else base
    case ("parse_dirpath", Seq(a)) =>
      regexp_replace(rec(a), "/+[^/]*/*$", "")
    case ("epoch_ms", Seq(a)) => unix_millis(rec(a).cast("timestamp"))
    // epoch family: DuckDB's epoch() is fractional SECONDS as DOUBLE
    // (a timestamp→double cast in Spark is exactly that); epoch_us is
    // exact integer micros
    case ("epoch", Seq(a))    => rec(a).cast("timestamp").cast("double")
    case ("epoch_us", Seq(a)) => unix_micros(rec(a).cast("timestamp"))
    case ("make_timestamp", as) if as.length == 6 =>
      make_timestamp(rec(as(0)), rec(as(1)), rec(as(2)), rec(as(3)),
        rec(as(4)), rec(as(5)).cast("decimal(16,6)"))
    // DuckDB's sign returns an integer -1/0/1; Spark's signum a double
    case ("sign", Seq(a))    => signum(rec(a)).cast("int")
    case ("exp", Seq(a))     => exp(rec(a))
    case ("ln", Seq(a))      => log(rec(a))
    case ("log10", Seq(a))   => log10(rec(a))
    case ("log2", Seq(a))    => log2(rec(a))
    case ("last_day", Seq(a)) => last_day(rec(a))
    case ("quarter", Seq(a)) => quarter(rec(a))
    case ("hour", Seq(a))    => hour(rec(a))
    case ("minute", Seq(a))  => minute(rec(a))
    case ("second", Seq(a))  => second(rec(a))
    case ("nullif", Seq(a, b)) =>
      val c = rec(a)
      when(c === rec(b), lit(null)).otherwise(c)
    case ("repeat", Seq(a, BoundOperand.BLit(Lit.LitLong(n)))) =>
      repeat(rec(a), n.toInt)
    case ("lpad", Seq(a, BoundOperand.BLit(Lit.LitLong(n)),
        BoundOperand.BLit(Lit.LitString(p)))) => lpad(rec(a), n.toInt, p)
    case ("rpad", Seq(a, BoundOperand.BLit(Lit.LitLong(n)),
        BoundOperand.BLit(Lit.LitString(p)))) => rpad(rec(a), n.toInt, p)
    // Spark's split takes a REGEX: quote the literal separator; an
    // out-of-range index — and even a NULL input — reads '' (DuckDB
    // split_part semantics, which never returns NULL). Negative indexes
    // count from the end (probed DuckDB 1.0: -1 is the last part,
    // out-of-range and 0 read ''): element 0-based size+n, and get()
    // already yields NULL for any out-of-range position.
    case ("split_part", Seq(a, BoundOperand.BLit(Lit.LitString(sep)),
        BoundOperand.BLit(Lit.LitLong(n)))) =>
      val arr = split(rec(a), java.util.regex.Pattern.quote(sep))
      val idx =
        if (n >= 1) lit(n.toInt - 1)
        else org.apache.spark.sql.functions.size(arr) + lit(n.toInt)
      coalesce(org.apache.spark.sql.functions.get(arr, idx), lit(""))
    // DuckDB semantics: FIRST match only unless the 'g' flag; 'i'
    // prepends (?i) to the pattern (works for dynamic patterns via
    // concat); replacement backrefs are \1-style, translated in the
    // codegen'd RegexpReplaceDuck expression
    case ("regexp_replace", Seq(a, b, c)) =>
      graft.functions.StringFunctions.regexpReplaceDuck(
        rec(a), rec(b), rec(c), global = false)
    case ("regexp_replace", Seq(a, b, c,
        BoundOperand.BLit(Lit.LitString(flags)))) =>
      val pat = if (flags.contains('i')) concat(lit("(?i)"), rec(b)) else rec(b)
      graft.functions.StringFunctions.regexpReplaceDuck(
        rec(a), pat, rec(c), global = flags.contains('g'))
    case ("regexp_extract", Seq(a, BoundOperand.BLit(Lit.LitString(pat)))) =>
      regexp_extract(rec(a), pat, 0)
    case ("regexp_extract", Seq(a, BoundOperand.BLit(Lit.LitString(pat)),
        BoundOperand.BLit(Lit.LitLong(g)))) =>
      regexp_extract(rec(a), pat, g.toInt)
    case ("greatest", as) => greatest(as.map(rec): _*)
    case ("least", as)    => least(as.map(rec): _*)
    case other => sys.error(s"unreachable function ${other._1}/${other._2.length}")
  }

  /** Normalize DuckDB's three JSON path spellings onto the $-form the
    * Spark functions take: '$.a[1]' stays, '/a/1' JSON-pointer becomes
    * '$.a[1]' (numeric segments index arrays), a bare key prefixes '$.'.
    */
  private def jsonDollarPath(p: String): String =
    if (p.startsWith("$")) p
    else if (p.startsWith("/"))
      "$" + p.split("/").drop(1).map(seg =>
        if (seg.nonEmpty && seg.forall(_.isDigit)) s"[$seg]"
        else s".$seg").mkString
    else s"$$.$p"

  private[sql] def arith(op: Char, lc: Column, rc: Column): Column = op match {
    case '+' => lc + rc
    case '-' => lc - rc
    case '*' => lc * rc
    // DuckDB: x/0 and x%0 read NULL (probed across int/decimal/double);
    // Spark 4's ANSI default would raise — try_divide/try_mod give the
    // NULL semantics while keeping the same codegen'd double division
    // ('/' on integers divides as double on both engines)
    case '/' => try_divide(lc, rc)
    case '%' => try_mod(lc, rc)
    case o   => sys.error(s"unreachable arithmetic op $o")
  }

  /** Lower an operand with a caller-chosen column resolution (qualified
    * for scans/joins, grouped-output names post-aggregation, bare for
    * single-table DML).
    */
  private[sql] def lowerOperandWith(o: BoundOperand, colOf: BoundCol => Column): Column =
    o match {
      case BoundOperand.BCol(c) => colOf(c)
      case BoundOperand.BArith(op, l, r) =>
        arith(op, lowerOperandWith(l, colOf), lowerOperandWith(r, colOf))
      case BoundOperand.BFunc(f, args) =>
        lowerFunc(f, args, lowerOperandWith(_, colOf))
      case BoundOperand.BCase(bs, els) =>
        caseCol(bs, els, lowerOperandWith(_, colOf))
      case BoundOperand.BCast(x, t) => lowerOperandWith(x, colOf).cast(t.spark)
      case BoundOperand.BTryCast(x, t) => lowerOperandWith(x, colOf).try_cast(t.spark)
      // an output-column reference (QUALIFY): the window column is
      // already attached at this name, bare resolution
      case BoundOperand.BOut(n, _) => col(n)
      case other => lowerOperand(other)
    }

  private[sql] def lowerLit(l: Lit): Column = l match {
    case Lit.LitLong(v)      => lit(v)
    case Lit.LitDouble(v)    => lit(v)
    case Lit.LitString(s)    => lit(s)
    case Lit.LitDate(s)      => lit(java.sql.Date.valueOf(s))
    case Lit.LitTimestamp(s) => lit(java.sql.Timestamp.valueOf(s))
    // LocalTime lowers through Spark's TIME literal encoder
    case Lit.LitTime(s)      => lit(java.time.LocalTime.parse(s))
    // the UTC-normalized wall text IS the instant under the pinned UTC
    // session zone (carrier: TimestampType)
    case Lit.LitTimestampTz(s) => lit(java.sql.Timestamp.valueOf(s))
    case Lit.LitBool(v)      => lit(v)
    case Lit.LitNull         => lit(null)
  }

  /** A calendar-interval Column (unit-positional make_interval args:
    * years, months, weeks, days, hours, mins, secs). Column arithmetic
    * then adds/subtracts it from a date/timestamp directly.
    */
  /** TIME / TIMESTAMPTZ function family, split out of lowerFunc (which
    * sits at the JVM 64KB method-size limit).
    */
  private[sql] val TimeTzFuncs: Set[String] = Set("make_time",
    "__time_plus", "__time_minus", "__tz_to_tz", "__tz_to_naive",
    "__tstz_text", "__ts_to_time")

  private def lowerTimeTz(f: String, as: Seq[BoundOperand],
      rec: BoundOperand => Column): Column = (f, as) match {
    // make_time(h, m, s): seconds take a fraction (DECIMAL micros)
    case ("make_time", Seq(h, m, sec)) =>
      call_function("make_time", rec(h).cast("int"), rec(m).cast("int"),
        rec(sec).cast("decimal(16,6)"))
    // TIME +/- sub-day interval: Spark's TIME takes DayTimeInterval
    // operands (make_dt_interval), not the calendar make_interval the
    // generic interval lowering builds
    case (tpm @ ("__time_plus" | "__time_minus"), Seq(t, iv)) =>
      val z = lit(0)
      val dt = iv match {
        case BoundOperand.BFunc("to_hours", Seq(n)) =>
          make_dt_interval(z, rec(n).cast("int"))
        case BoundOperand.BFunc("to_minutes", Seq(n)) =>
          make_dt_interval(z, z, rec(n).cast("int"))
        case BoundOperand.BFunc("to_seconds", Seq(n)) =>
          make_dt_interval(z, z, z, rec(n).cast("decimal(16,6)"))
        case BoundOperand.BFunc("to_milliseconds", Seq(n)) =>
          make_dt_interval(z, z, z,
            (rec(n).cast("decimal(16,3)") / 1000).cast("decimal(16,6)"))
        case BoundOperand.BFunc("to_microseconds", Seq(n)) =>
          make_dt_interval(z, z, z,
            (rec(n).cast("decimal(16,0)") / 1000000).cast("decimal(16,6)"))
        case BoundOperand.BInterval(n, "hour")   => make_dt_interval(z, lit(n))
        case BoundOperand.BInterval(n, "minute") => make_dt_interval(z, z, lit(n))
        case BoundOperand.BInterval(n, "second") =>
          make_dt_interval(z, z, z, lit(java.math.BigDecimal.valueOf(n)))
        case other => sys.error(s"unreachable TIME interval shape $other")
      }
      if (tpm == "__time_plus") rec(t) + dt else rec(t) - dt
    // timezone(tz, naive)/naive AT TIME ZONE tz: interpret the naive
    // wall time IN tz -> instant (TIMESTAMPTZ); Spark's to_utc_timestamp
    // is exactly this under the pinned UTC session zone
    case ("__tz_to_tz", Seq(tz, x)) =>
      to_utc_timestamp(rec(x).cast("timestamp"), rec(tz).cast("string"))
    // timezone(tz, tstz)/tstz AT TIME ZONE tz: the tz wall time of the
    // instant, as a NAIVE timestamp
    case ("__tz_to_naive", Seq(tz, x)) =>
      from_utc_timestamp(rec(x), rec(tz).cast("string"))
    // TIMESTAMPTZ::VARCHAR appends the session (+00) offset like DuckDB
    case ("__tstz_text", Seq(a)) =>
      concat(rec(a).cast("string"), lit("+00"))
    // TIMESTAMP::TIME — time-of-day via the rendered micros (Spark has
    // no native timestamp->time cast yet)
    case ("__ts_to_time", Seq(a)) =>
      date_format(rec(a), "HH:mm:ss.SSSSSS")
        .cast(graft.sql.SqlType.SqlTime.spark)
    case other => sys.error(s"unreachable time/tz function $other")
  }

  /** ENUM plumbing (positional ordering / validated casts), split out
    * of lowerFunc like the time/tz family.
    */
  private[sql] val EnumFuncs: Set[String] =
    Set("__enum_pos", "__enum_cast", "__enum_try_cast", "__enum_from_pos")

  private def lowerEnum(f: String, as: Seq[BoundOperand],
      rec: BoundOperand => Column): Column = {
    def vals(b: BoundOperand): Seq[String] = b match {
      case BoundOperand.BLit(Lit.LitString(vs)) => vs.split('\u0001').toSeq
      case other => sys.error(s"unreachable enum value list $other")
    }
    (f, as) match {
      // 1-based definition position (the enum's sort key); a non-member
      // reads NULL here — the validated cast is the raising surface
      case ("__enum_pos", Seq(x, vl)) =>
        val arr = array(vals(vl).map(lit): _*)
        val p = array_position(arr, rec(x))
        when(p > 0, p.cast("int")).otherwise(lit(null).cast("int"))
      // text -> ENUM with DuckDB's conversion-error surface
      case ("__enum_cast", Seq(x, vl)) =>
        val vs = vals(vl)
        val c = rec(x)
        when(c.isNull || c.isin(vs: _*), c)
          .otherwise(raise_error(concat(
            lit("Conversion Error: Could not convert string '"), c,
            lit(s"' to ENUM(${vs.map(v => s"'$v'").mkString(", ")})")))
            .cast("string"))
      // try_cast's NULL-on-miss variant of the validated ENUM cast
      case ("__enum_try_cast", Seq(x, vl)) =>
        val c = rec(x)
        when(c.isin(vals(vl): _*), c).otherwise(lit(null).cast("string"))
      // position -> value (min/max over enum aggregate the position)
      case ("__enum_from_pos", Seq(p, vl)) =>
        element_at(array(vals(vl).map(lit): _*), rec(p).cast("int"))
      case other => sys.error(s"unreachable enum function $other")
    }
  }

  /** UNION carrier plumbing: struct(tag, member…) where only the
    * active member is non-NULL.
    */
  private[sql] val UnionFuncs: Set[String] =
    Set("union_value", "union_tag", "union_extract", "__union_make")

  private def lowerUnion(f: String, as: Seq[BoundOperand],
      rec: BoundOperand => Column): Column = (f, as) match {
    case ("union_value", Seq(BoundOperand.BLit(Lit.LitString(k)), v)) =>
      struct(lit(k).as("tag"), rec(v).as(k))
    case ("union_tag", Seq(u)) => rec(u).getField("tag")
    case ("union_extract", Seq(u, BoundOperand.BLit(Lit.LitString(k)))) =>
      rec(u).getField(k)
    case ("__union_make",
          BoundOperand.BLit(Lit.LitString(spec)) +: tag +: vs) =>
      val names = spec.split('\u0001').toSeq
      struct((rec(tag).as("tag") +: names.zip(vs).map {
        case (n, v) => rec(v).as(n) }): _*)
    case other => sys.error(s"unreachable union function $other")
  }

  private def intervalCol(n: Long, unit: String): Column = {
    val z = lit(0)
    unit match {
      case "year"   => make_interval(lit(n))
      case "month"  => make_interval(z, lit(n))
      case "week"   => make_interval(z, z, lit(n))
      case "day"    => make_interval(z, z, z, lit(n))
      case "hour"   => make_interval(z, z, z, z, lit(n))
      case "minute" => make_interval(z, z, z, z, z, lit(n))
      case "second" => make_interval(z, z, z, z, z, z, lit(n.toDouble))
      case other    => sys.error(s"unreachable interval unit $other")
    }
  }

  private def lowerOperand(o: BoundOperand): Column = o match {
    case BoundOperand.BCol(c) => col(s"${c.binding}.${c.attr.name}")
    case BoundOperand.BInterval(n, u) => intervalCol(n, u)
    case BoundOperand.BLit(l) => lowerLit(l)
    case BoundOperand.BArith(op, l, r) => arith(op, lowerOperand(l), lowerOperand(r))
    case BoundOperand.BFunc(f, args)   => lowerFunc(f, args, lowerOperand)
    case BoundOperand.BCase(bs, els)   => caseCol(bs, els, lowerOperand)
    case BoundOperand.BCast(x, t)      => lowerOperand(x).cast(t.spark)
    case BoundOperand.BTryCast(x, t)   => lowerOperand(x).try_cast(t.spark)
    case BoundOperand.BOut(n, _)       => col(n)
    case BoundOperand.BAgg(f, _, _) =>
      sys.error(s"aggregate $f(...) outside aggregate scope")
    case BoundOperand.BOrderedAgg(f, _, _, _) =>
      sys.error(s"$f(...) is only supported in the SELECT list / HAVING " +
        "of an aggregated query")
  }

  // ---- predicate decomposition for statistics (reference
  //      analyzer/mod.rs:98-186 splits WHERE into per-table selections) ----

  /** Flatten the AND-tree into conjuncts (OR subtrees stay whole). */
  def conjuncts(e: BoundExpr): Seq[BoundExpr] = e match {
    case BoundExpr.BAnd(l, r) => conjuncts(l) ++ conjuncts(r)
    case other                => Seq(other)
  }

  /** The single table binding a conjunct touches, if exactly one. A
    * subquery conjunct is never single-table (it cannot run against a
    * sample, so the estimator must skip it).
    */
  def singleBinding(e: BoundExpr): Option[String] = {
    var hasSub = false
    def opCols(o: BoundOperand): Seq[String] = o match {
      case BoundOperand.BCol(c)         => Seq(c.binding)
      case BoundOperand.BArith(_, l, r) => opCols(l) ++ opCols(r)
      case BoundOperand.BFunc(_, args)  => args.flatMap(opCols)
      case BoundOperand.BCast(x, _)     => opCols(x)
      case BoundOperand.BTryCast(x, _)  => opCols(x)
      case BoundOperand.BCase(bs, els) =>
        bs.flatMap { case (c, v) => cols(c) ++ opCols(v) } ++ els.toSeq.flatMap(opCols)
      case _                            => Nil
    }
    def cols(x: BoundExpr): Seq[String] = x match {
      case BoundExpr.BAnd(l, r) => cols(l) ++ cols(r)
      case BoundExpr.BOr(l, r)  => cols(l) ++ cols(r)
      case BoundExpr.BNot(y)    => cols(y)
      case BoundExpr.BIsNull(o, _)  => opCols(o)
      case BoundExpr.BLike(o, _, _, _, _) => opCols(o)
      case BoundExpr.BCmp(_, l, r)  => opCols(l) ++ opCols(r)
      case BoundExpr.BInSub(_, _, _, _)  => hasSub = true; Nil
      case BoundExpr.BRowInSub(_, _, _, _)  => hasSub = true; Nil
      case BoundExpr.BExists(_, _, _, _) => hasSub = true; Nil
      case BoundExpr.BCmpSub(_, _, _, _, _) => hasSub = true; Nil
      case BoundExpr.BQuantSub(_, _, _, _, _) => hasSub = true; Nil
    }
    val found = cols(e).distinct
    if (hasSub) None
    else found match {
      case Seq(one) => Some(one)
      case _        => None
    }
  }

  /** Lower a single-table conjunct with UNQUALIFIED column names, for
    * evaluation against that table's sample or a DML image (reference
    * executes selections against its reservoir sample the same way,
    * planner/bottomup.rs:111-168).
    */
  def lowerExprBare(e: BoundExpr): Column = lowerExprWith(e, bareOperand)

  /** A single operand with unqualified columns (UPDATE SET values). */
  def lowerOperandBare(o: BoundOperand): Column = bareOperand(o)

  private def bareOperand(o: BoundOperand): Column = o match {
    case BoundOperand.BCol(c)          => col(c.attr.name)
    case BoundOperand.BArith(op, l, r) => arith(op, bareOperand(l), bareOperand(r))
    case BoundOperand.BFunc(f, args)   => lowerFunc(f, args, bareOperand)
    case BoundOperand.BCase(bs, els)   => caseCol(bs, els, bareOperand)
    case BoundOperand.BCast(x, t)      => bareOperand(x).cast(t.spark)
    case BoundOperand.BTryCast(x, t)   => bareOperand(x).try_cast(t.spark)
    case other                         => lowerOperand(other)
  }
}
