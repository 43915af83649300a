package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables.{t, events}

/** The reference's complete relational algebra (SURVEY.md §2.1: Tablescan,
  * Selection, Projection, HashJoin, InlineTable — reference
  * execution/plan.rs:28-68) re-expressed as declarative DataFrame programs,
  * plus the standard SQL surface the reference lists as absent/TODO
  * (SURVEY.md §2.4: aggregation, sort/limit, windows, set ops, outer/semi/
  * anti/cross joins, subqueries, scalar functions) — all Spark built-ins.
  *
  * Scale notes are on each query: dimension tables are broadcast so the only
  * shuffles left at 100 TB are the unavoidable fact-table aggregations.
  */
object Relational {

  // Broadcast-sized dimensions (region=5 rows, nation=25 rows at any SF —
  // they are fixed-cardinality in TPC-H-style data; supplier/customer scale
  // linearly but stay far below lineitem).
  private def region(s: SparkSession, d: String)  = broadcast(t(s, d, "region"))
  private def nation(s: SparkSession, d: String)  = broadcast(t(s, d, "nation"))

  def defs: Map[String, QueryDef] = QueryDef.gate(

    // ---- reference §2.1 surface -------------------------------------------

    // #1 Tablescan + #3 Projection (column pruning reaches the parquet scan).
    "q_scan_project" -> QueryDef(
      (s, d) => t(s, d, "part")
        .select("p_partkey", "p_name", "p_brand")
        .orderBy("p_partkey"),
      Some("SELECT p_partkey, p_name, p_brand FROM part ORDER BY p_partkey")),

    // #2 Selection: the reference predicate algebra is AND-conjunctions of
    // {attr cmp literal} with cmp ∈ {=, <, <=} (+ swapped >, >=)
    // (reference execution/plan.rs:120-129). All pushed to parquet.
    "q_filter" -> QueryDef(
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_quantity") < 10 && col("l_returnflag") === "R" && col("l_discount") <= 0.05)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
             |WHERE l_quantity < 10 AND l_returnflag = 'R' AND l_discount <= 0.05
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // Beyond the reference: OR / <> / NOT, which its analyzer rejects
    // (reference analyzer/mod.rs:146,183).
    "q_filter_or_neq" -> QueryDef(
      (s, d) => t(s, d, "orders")
        .filter((col("o_orderpriority") === "1-URGENT" || col("o_totalprice") > 490000.0)
          && col("o_orderstatus") =!= "P")
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
             |WHERE (o_orderpriority = '1-URGENT' OR o_totalprice > 490000.0)
             |  AND o_orderstatus <> 'P'
             |ORDER BY o_orderkey""".stripMargin)),

    // #6 InlineTable (VALUES) — reference execution/plan.rs:58-60; Catalyst
    // LocalRelation. Data mirrors the reference REPL demo (database.rs:47-91).
    "q_values" -> QueryDef(
      (s, d) => {
        import s.implicits._
        Seq((1, "Tesla Model 3", 1), (2, "DeLorean DMC-12", 2))
          .toDF("id", "model", "owner_id").orderBy("id")
      },
      Some("""SELECT * FROM (VALUES (1, 'Tesla Model 3', 1), (2, 'DeLorean DMC-12', 2))
             |AS t(id, model, owner_id) ORDER BY id""".stripMargin)),

    // #4 HashJoin (inner equi): fact ⋈ broadcast dims. At 100 TB nation and
    // region are broadcast — zero shuffle for the join itself.
    "q_join" -> QueryDef(
      (s, d) => t(s, d, "customer")
        .join(nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .join(region(s, d), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .select("c_custkey", "c_name", "n_name")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name, n_name
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |              JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA' ORDER BY c_custkey""".stripMargin)),

    // Multi-way join — the workload the reference's DPccp join-order
    // optimizer targets (reference optimizer/optimizer.rs:60-104). Here CBO/
    // AQE own join order; selective filters are pushed below the joins.
    "q_join_multiway" -> QueryDef(
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_quantity") >= 45)
        .join(t(s, d, "orders").filter(col("o_totalprice") > 400000.0),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .select("l_orderkey", "l_linenumber", "c_custkey", "n_name")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, c_custkey, n_name
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |              JOIN customer ON o_custkey = c_custkey
             |              JOIN nation ON c_nationkey = n_nationkey
             |WHERE l_quantity >= 45 AND o_totalprice > 400000.0
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ---- aggregation (absent in reference, README.md:51) ------------------

    // TPC-H Q1 shape: partial (map-side) aggregation then a single shuffle on
    // the tiny group-key domain — the canonical 100 TB-safe aggregate.
    "q_agg" -> QueryDef(
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("2000-12-01")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
          round(avg("l_quantity"), 2).as("avg_qty"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  round(sum(l_extendedprice), 2) AS sum_base_price,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
             |  round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
             |  round(avg(l_quantity), 2) AS avg_qty,
             |  round(avg(l_discount), 4) AS avg_disc,
             |  cast(count(*) AS bigint) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    "q_agg_distinct" -> QueryDef(
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct("l_partkey").as("n_parts"),
          countDistinct("l_suppkey").as("n_supps"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  cast(count(DISTINCT l_partkey) AS bigint) AS n_parts,
             |  cast(count(DISTINCT l_suppkey) AS bigint) AS n_supps,
             |  cast(count(*) AS bigint) AS cnt
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    "q_having" -> QueryDef(
      (s, d) => t(s, d, "customer")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_customers"),
          round(avg("c_acctbal"), 2).as("avg_bal"))
        .filter(col("n_customers") >= 60)
        .orderBy("c_nationkey"),
      Some("""SELECT c_nationkey, cast(count(*) AS bigint) AS n_customers,
             |  round(avg(c_acctbal), 2) AS avg_bal
             |FROM customer GROUP BY c_nationkey
             |HAVING count(*) >= 60 ORDER BY c_nationkey""".stripMargin)),

    // ROLLUP / CUBE (grouping sets). NULL group fillers are coalesced so the
    // sort keys are non-null on both engines.
    "q_rollup" -> QueryDef(
      (s, d) => t(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), round(sum("l_quantity"), 2).as("qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("cnt"), col("qty"))
        .orderBy("rf", "ls"),
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
             |  cast(count(*) AS bigint) AS cnt, round(sum(l_quantity), 2) AS qty
             |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
             |ORDER BY rf, ls""".stripMargin)),

    "q_cube" -> QueryDef(
      (s, d) => t(s, d, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
          col("cnt"))
        .orderBy("st", "prio"),
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS st, coalesce(o_orderpriority, 'ALL') AS prio,
             |  cast(count(*) AS bigint) AS cnt
             |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
             |ORDER BY st, prio""".stripMargin)),

    // ---- sort / limit (absent in reference) -------------------------------

    // Top-k: Spark plans TakeOrderedAndProject — per-partition heap + tiny
    // driver merge, no full sort at scale.
    "q_sort_limit" -> QueryDef(
      (s, d) => t(s, d, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    // ---- window functions (absent in reference) ---------------------------

    "q_window_rank" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy("c_nationkey")
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        t(s, d, "customer")
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select("c_nationkey", "rk", "c_custkey", "c_acctbal")
          .orderBy("c_nationkey", "rk")
      },
      Some("""SELECT c_nationkey, rk, c_custkey, c_acctbal FROM (
             |  SELECT c_nationkey, c_custkey, c_acctbal,
             |    row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rk
             |  FROM customer) x
             |WHERE rk <= 3 ORDER BY c_nationkey, rk""".stripMargin)),

    "q_window_running" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, d, "orders")
          .filter(col("o_custkey") <= 50)
          .withColumn("run_spend",
            round(sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2))
          .withColumn("prev_price", coalesce(lag("o_totalprice", 1).over(w), lit(-1.0)))
          .select("o_custkey", "o_orderkey", "run_spend", "prev_price")
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_spend,
             |  coalesce(lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), -1.0) AS prev_price
             |FROM orders WHERE o_custkey <= 50
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // ---- set operations (absent in reference) -----------------------------

    "q_union" -> QueryDef(
      (s, d) => t(s, d, "customer").select(col("c_nationkey").as("nk"))
        .union(t(s, d, "supplier").select(col("s_nationkey").as("nk")))
        .distinct().orderBy("nk"),
      Some("""SELECT c_nationkey AS nk FROM customer UNION SELECT s_nationkey FROM supplier
             |ORDER BY nk""".stripMargin)),

    "q_intersect" -> QueryDef(
      (s, d) => t(s, d, "customer").select(col("c_nationkey").as("nk"))
        .intersect(t(s, d, "supplier").select(col("s_nationkey").as("nk")))
        .orderBy("nk"),
      Some("""SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey FROM supplier
             |ORDER BY nk""".stripMargin)),

    "q_except" -> QueryDef(
      (s, d) => t(s, d, "customer").select(col("c_nationkey").as("nk"))
        .except(t(s, d, "supplier").select(col("s_nationkey").as("nk")))
        .orderBy("nk"),
      Some("""SELECT c_nationkey AS nk FROM customer EXCEPT SELECT s_nationkey FROM supplier
             |ORDER BY nk""".stripMargin)),

    // ---- outer / semi / anti / cross joins (absent in reference) ----------

    "q_left_outer" -> QueryDef(
      (s, d) => nation(s, d)
        .join(t(s, d, "customer").filter(col("c_acctbal") > 9900.0),
          col("n_nationkey") === col("c_nationkey"), "left")
        .select(col("n_nationkey"), col("n_name"),
          coalesce(col("c_custkey"), lit(-1L)).as("custkey"))
        .orderBy("n_nationkey", "custkey"),
      Some("""SELECT n_nationkey, n_name, coalesce(c_custkey, -1) AS custkey
             |FROM nation LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 9900.0) c
             |  ON n_nationkey = c_nationkey
             |ORDER BY n_nationkey, custkey""".stripMargin)),

    "q_full_outer" -> QueryDef(
      (s, d) => {
        val hi = t(s, d, "customer").filter(col("c_acctbal") > 9950.0)
          .groupBy(col("c_nationkey").as("cnk")).agg(count(lit(1)).as("n_rich"))
        val lo = t(s, d, "supplier").filter(col("s_acctbal") < 0.0)
          .groupBy(col("s_nationkey").as("snk")).agg(count(lit(1)).as("n_poor"))
        hi.join(lo, col("cnk") === col("snk"), "full")
          .select(coalesce(col("cnk"), col("snk")).as("nationkey"),
            coalesce(col("n_rich"), lit(0L)).as("n_rich"),
            coalesce(col("n_poor"), lit(0L)).as("n_poor"))
          .orderBy("nationkey")
      },
      Some("""SELECT coalesce(cnk, snk) AS nationkey,
             |  coalesce(n_rich, 0) AS n_rich, coalesce(n_poor, 0) AS n_poor
             |FROM (SELECT c_nationkey AS cnk, cast(count(*) AS bigint) AS n_rich FROM customer
             |      WHERE c_acctbal > 9950.0 GROUP BY c_nationkey) h
             |FULL JOIN (SELECT s_nationkey AS snk, cast(count(*) AS bigint) AS n_poor FROM supplier
             |      WHERE s_acctbal < 0.0 GROUP BY s_nationkey) l
             |  ON cnk = snk
             |ORDER BY nationkey""".stripMargin)),

    // Semi/anti: Spark left_semi/left_anti avoid materializing the right side
    // per match — the scalable form of EXISTS / NOT EXISTS.
    "q_semi_join" -> QueryDef(
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_totalprice") > 450000.0),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
             |ORDER BY c_custkey""".stripMargin)),

    "q_anti_join" -> QueryDef(
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_totalprice") > 450000.0),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_nationkey")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_nationkey FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
             |ORDER BY c_custkey""".stripMargin)),

    // Cross product — the reference panics on these (README.md:42).
    "q_cross_join" -> QueryDef(
      (s, d) => region(s, d).select(col("r_name").as("a_name"))
        .crossJoin(region(s, d).select(col("r_name").as("b_name")))
        .orderBy("a_name", "b_name"),
      Some("""SELECT a.r_name AS a_name, b.r_name AS b_name
             |FROM region a CROSS JOIN region b ORDER BY a_name, b_name""".stripMargin)),

    // ---- subqueries (absent in reference) ---------------------------------

    "q_subquery_scalar" -> QueryDef(
      (s, d) => {
        val c = t(s, d, "customer")
        val threshold = c.agg(avg("c_acctbal").as("a"))
        c.crossJoin(broadcast(threshold))
          .filter(col("c_acctbal") > col("a") * 1.9)
          .select("c_custkey", "c_acctbal")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_acctbal FROM customer
             |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer) * 1.9
             |ORDER BY c_custkey""".stripMargin)),

    "q_subquery_in" -> QueryDef(
      (s, d) => t(s, d, "orders")
        .filter(col("o_totalprice") > 480000.0)
        .join(t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
          .select("c_custkey"),
          col("o_custkey") === col("c_custkey"), "left_semi")
        .select("o_orderkey", "o_custkey")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_custkey FROM orders
             |WHERE o_totalprice > 480000.0
             |  AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
             |ORDER BY o_orderkey""".stripMargin)),

    // ---- scalar expressions (reference has Column/Literal only,
    //      execution/plan.rs:131-136) -----------------------------------------

    "q_case_arith" -> QueryDef(
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_quantity") <= 2)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          when(col("l_discount") > 0.05, "HIGH")
            .when(col("l_discount") > 0.02, "MID")
            .otherwise("LOW").as("disc_band"),
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 2).as("charge"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
             |  CASE WHEN l_discount > 0.05 THEN 'HIGH'
             |       WHEN l_discount > 0.02 THEN 'MID' ELSE 'LOW' END AS disc_band,
             |  round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax), 2) AS charge
             |FROM lineitem WHERE l_quantity <= 2
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    "q_string_funcs" -> QueryDef(
      (s, d) => t(s, d, "part")
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          substring(col("p_name"), 1, 10).as("name10"),
          length(col("p_name")).as("name_len"),
          concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
          replace(col("p_type"), lit(" "), lit("_")).as("type_us"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, upper(p_brand) AS brand_u, substring(p_name, 1, 10) AS name10,
             |  cast(length(p_name) AS int) AS name_len,
             |  p_brand || '#' || p_type AS brand_type,
             |  replace(p_type, ' ', '_') AS type_us
             |FROM part ORDER BY p_partkey""".stripMargin)),

    "q_date_funcs" -> QueryDef(
      (s, d) => t(s, d, "orders")
        .filter(col("o_orderkey") <= 2000)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          quarter(col("o_orderdate")).as("q"),
          col("o_orderdate").cast("date").as("od"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, cast(year(o_orderdate) AS int) AS y,
             |  cast(month(o_orderdate) AS int) AS m,
             |  cast(day(o_orderdate) AS int) AS dom,
             |  cast(quarter(o_orderdate) AS int) AS q,
             |  cast(o_orderdate AS date) AS od
             |FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""".stripMargin)),

    // LIKE / IN / BETWEEN / NULLIF-COALESCE — the predicate vocabulary the
    // reference's grammar lacks entirely (SURVEY.md §2.2).
    "q_misc_predicates" -> QueryDef(
      (s, d) => t(s, d, "part")
        .filter(col("p_name").like("%gear%")
          && col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
          && col("p_size").between(10, 40))
        .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_size"),
          coalesce(nullif(col("p_type"), lit("ECONOMY")), lit("none")).as("type_or_none"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_name, p_brand, p_size,
             |  coalesce(nullif(p_type, 'ECONOMY'), 'none') AS type_or_none
             |FROM part
             |WHERE p_name LIKE '%gear%'
             |  AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
             |  AND p_size BETWEEN 10 AND 40
             |ORDER BY p_partkey""".stripMargin)),

    // Pivot (long → wide): Spark's .pivot vs the portable CASE-sum form in
    // the oracle — same contract, so results must agree cell-for-cell.
    "q_pivot" -> QueryDef(
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum("l_quantity"), 2))
        .withColumnRenamed("F", "qty_f").withColumnRenamed("O", "qty_o")
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_f,
             |  round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_o
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Unpivot (wide → long) via stack(), mirrored with UNION ALL.
    "q_unpivot" -> QueryDef(
      (s, d) => t(s, d, "customer")
        .filter(col("c_custkey") <= 100)
        .select(col("c_custkey"),
          expr("stack(2, 'acctbal', c_acctbal, 'nationkey', cast(c_nationkey AS double))")
            .as(Seq("measure", "value")))
        .orderBy("c_custkey", "measure"),
      Some("""SELECT c_custkey, measure, "value" FROM (
             |  SELECT c_custkey, 'acctbal' AS measure, c_acctbal AS "value" FROM customer WHERE c_custkey <= 100
             |  UNION ALL
             |  SELECT c_custkey, 'nationkey', cast(c_nationkey AS double) FROM customer WHERE c_custkey <= 100) x
             |ORDER BY c_custkey, measure""".stripMargin)),

    // ---- TPC-H-style analytical queries -----------------------------------

    "q_tpch_q3" -> QueryDef(
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_shipdate") > to_timestamp(lit("1998-06-01")))
        .join(t(s, d, "orders").filter(col("o_orderdate") < to_timestamp(lit("1998-06-01"))),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          col("o_orderdate").cast("date").as("odate"), col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10),
      Some("""SELECT l_orderkey,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
             |  cast(o_orderdate AS date) AS odate, o_orderpriority
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |              JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
             |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
             |GROUP BY l_orderkey, o_orderdate, o_orderpriority
             |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)),

    "q_tpch_q5" -> QueryDef(
      (s, d) => t(s, d, "lineitem")
        .join(t(s, d, "orders")
          .filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01"))
            && col("o_orderdate") < to_timestamp(lit("1998-01-01"))),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "supplier")),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(nation(s, d), col("s_nationkey") === col("n_nationkey"))
        .join(region(s, d), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name")),
      Some("""SELECT n_name,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |              JOIN customer ON o_custkey = c_custkey
             |              JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |              JOIN nation ON s_nationkey = n_nationkey
             |              JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
             |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
             |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin)),

    // ---- events table ------------------------------------------------------

    "q_events_agg" -> QueryDef(
      (s, d) => events(s, d)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          countDistinct("user_id").as("n_users"),
          // decimal sums: exact and order-independent (double summation can
          // flip round() at the boundary between runs); avg derives from the
          // exact sum so it shares the determinism
          round(sum(col("value").cast("decimal(18,6)")), 2).cast("double").as("total_value"),
          round(sum(col("value").cast("decimal(18,6)")).cast("double") / count(lit(1)), 4)
            .as("avg_value"))
        .orderBy("event_type"),
      Some("""SELECT event_type, cast(count(*) AS bigint) AS n,
             |  cast(count(DISTINCT user_id) AS bigint) AS n_users,
             |  cast(round(sum(cast("value" AS DECIMAL(18,6))), 2) AS double) AS total_value,
             |  round(cast(sum(cast("value" AS DECIMAL(18,6))) AS double) / count(*), 4) AS avg_value
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Semi-structured extraction: events.props is a JSON-ish string; the
    // value is pulled with the same regex on both engines (DuckDB's json
    // extension may be unavailable offline — regexp is dependency-free).
    "q_events_props" -> QueryDef(
      (s, d) => events(s, d)
        .select(col("event_id"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int").as("k"))
        .filter(col("k") >= 90)
        .orderBy("event_id"),
      Some("""SELECT event_id, cast(regexp_extract(props, '"k": (\d+)', 1) AS int) AS k
             |FROM events
             |WHERE cast(regexp_extract(props, '"k": (\d+)', 1) AS int) >= 90
             |ORDER BY event_id""".stripMargin)),

    "q_events_hourly" -> QueryDef(
      (s, d) => events(s, d)
        .select(col("event_type"),
          col("ts").cast("date").as("day"),
          hour(col("ts")).as("h"),
          col("value"))
        .groupBy("event_type", "day", "h")
        .agg(count(lit(1)).as("n"),
          // decimal sum: order-independent, no rounding-boundary flap
          round(sum(col("value").cast("decimal(18,6)")), 2).cast("double").as("v"))
        .orderBy("event_type", "day", "h"),
      Some("""SELECT event_type, cast(ts AS date) AS day, cast(hour(ts) AS int) AS h,
             |  cast(count(*) AS bigint) AS n,
             |  cast(round(sum(cast("value" AS DECIMAL(18,6))), 2) AS double) AS v
             |FROM events GROUP BY event_type, cast(ts AS date), hour(ts)
             |ORDER BY event_type, day, h""".stripMargin))
  )
}
