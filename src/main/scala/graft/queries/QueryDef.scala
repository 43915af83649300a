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

object QueryDef {
  /** Builds a gate map from pairs, failing LOUDLY on duplicate keys. A
    * bare Map literal silently keeps the LATER entry, shadowing the
    * earlier definition from every driver/bench run (round-10 verdict:
    * two full query batches were dead code this way). Every module's
    * `defs` — and Registry's cross-module union — must build through
    * here so a key collision can never be silent again.
    */
  def gate(pairs: (String, QueryDef)*): Map[String, QueryDef] = {
    val names = pairs.map(_._1)
    val dups = names.diff(names.distinct).distinct
    require(dups.isEmpty, s"duplicate gate keys: ${dups.mkString(", ")}")
    pairs.toMap
  }
}
