package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided parquet fixtures (TESTDATA.md).
  *
  * The reference engine's only source operator is a heap-file Tablescan
  * (reference execution/plan.rs:30-32); here the scan is Spark's vectorized
  * parquet reader, which gives column pruning + predicate pushdown for free
  * (the reference only has projection pushdown at the storage layer,
  * access/tuple.rs:43-121).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts arrives in whatever precision/annotation the fixture was
    * generated with: timestamp[ns] surfaces as LongType (nanos) under
    * `spark.sql.legacy.parquet.nanosAsLong`, and timestamp[us] without
    * isAdjustedToUTC surfaces as TIMESTAMP_NTZ. Normalize every variant to a
    * proper TIMESTAMP column so downstream ops are uniform. The session
    * timezone is pinned to UTC, so the NTZ→LTZ cast is value-preserving.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = t(spark, dir, "events")
    raw.schema("ts").dataType match {
      // `div` is exact integral division; `/` on a long is DOUBLE division in
      // Spark, and ns-scale epochs (~1.7e18) exceed a double's 53-bit mantissa,
      // so the truncated micros could be off by ±1 µs vs exact floor division.
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Register every fixture table as a temp view (used by tests / REPL). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
