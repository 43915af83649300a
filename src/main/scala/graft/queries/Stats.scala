package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.stats.CountingHll

/** Statistics parity (SURVEY.md §4.3): the reference maintains per-column
  * NDV sketches + table cardinality for its cost-based optimizer; here the
  * same summary is one aggregate query (ANALYZE-style), and the custom
  * counting-HLL sketch is exercised as a rows-only query (its estimates
  * are sketch-specific, so no cross-engine oracle exists by construction).
  */
object Stats {

  def defs: Map[String, QueryDef] = QueryDef.gate(

    // ANALYZE-style exact column statistics — what feeds a CBO. Exact,
    // so fully oracle-checkable.
    "q_stats_summary" -> QueryDef(
      (s, d) => t(s, d, "customer")
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct("c_custkey").as("ndv_custkey"),
          countDistinct("c_nationkey").as("ndv_nationkey"),
          countDistinct("c_mktsegment").as("ndv_mktsegment"),
          min("c_acctbal").as("min_acctbal"),
          max("c_acctbal").as("max_acctbal"),
          count("c_name").as("nonnull_name")),
      Some("""SELECT cast(count(*) AS bigint) AS n_rows,
             |  cast(count(DISTINCT c_custkey) AS bigint) AS ndv_custkey,
             |  cast(count(DISTINCT c_nationkey) AS bigint) AS ndv_nationkey,
             |  cast(count(DISTINCT c_mktsegment) AS bigint) AS ndv_mktsegment,
             |  min(c_acctbal) AS min_acctbal, max(c_acctbal) AS max_acctbal,
             |  cast(count(c_name) AS bigint) AS nonnull_name
             |FROM customer""".stripMargin)),

    // The counting-HLL sketch in the distributed path (map-side sketches,
    // merge on reduce). The raw estimate has no DuckDB analogue, so the
    // gate asserts the CHECKED RELATIONSHIP instead: alongside the exact
    // per-group NDV (hash-compared against DuckDB's count(DISTINCT)),
    // each row carries `est_in_bounds` = |est − exact| / exact within the
    // sketch's documented envelope (64 buckets ≈ 13% standard error;
    // 2.3σ ≈ 30%, the same bound CountingHllSpec asserts — a 5% bound
    // would overclaim this sketch size). The oracle emits TRUE, so a
    // sketch regression past the envelope fails the hash compare.
    "q_stats_hll_ndv" -> QueryDef(
      (s, d) => t(s, d, "orders")
        .groupBy("o_orderpriority")
        .agg(countDistinct(col("o_custkey")).as("ndv_custkey"),
          CountingHll.approx_ndv(col("o_custkey")).as("est"),
          count(lit(1)).as("n"))
        .select(col("o_orderpriority"), col("ndv_custkey"), col("n"),
          (abs(col("est") - col("ndv_custkey")) <=
            col("ndv_custkey") * 0.30).as("est_in_bounds"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |  cast(count(DISTINCT o_custkey) AS bigint) AS ndv_custkey,
             |  cast(count(*) AS bigint) AS n, TRUE AS est_in_bounds
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin))
  )
}
