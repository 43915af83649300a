package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.QueryDef

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the training-data
  * pipeline surface) is declared here as a named query; where the semantics
  * are SQL-expressible the matching DuckDB oracle SQL is declared too.
  */
object SparkEntry {

  def all: Map[String, QueryDef] =
    graft.queries.Registry.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all("q_agg").build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, v) => k -> v.build }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (k, v) if v.oracle.isDefined => k -> v.oracle.get }
}
