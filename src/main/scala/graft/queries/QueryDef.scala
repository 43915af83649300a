package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a DataFrame program plus (when SQL-expressible) the
  * equivalent ANSI SQL the driver runs in DuckDB as the correctness oracle.
  *
  * Contract notes (see builder prompt):
  *  - column names must match between the Spark result and the oracle SQL
  *    (the driver sorts columns by name before hashing);
  *  - every query ends in a total ORDER BY so row order is deterministic;
  *  - floating-point aggregates are rounded on BOTH sides so that
  *    summation-order differences between Spark and DuckDB cannot flip a hash.
  */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])
