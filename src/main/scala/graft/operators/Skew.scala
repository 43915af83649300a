package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives for hot keys — the manual counterpart to AQE's
  * runtime skew-join splitting, for when a key's volume is known-skewed up
  * front (a dup cluster, a null-heavy foreign key, a bot user_id).
  *
  * Salting is deterministic here (hash of the row image, not rand()):
  * results are reproducible and retries/speculative tasks see the same
  * salt for the same row.
  */
object Skew {

  /** Two-stage salted aggregation: stage 1 aggregates on (keys, salt) so a
    * hot key spreads over `salts` reducers; stage 2 merges the partials
    * per key. Works for any algebraic aggregate given its merge form —
    * provided here for sum/count, the common hot-key cases.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
      salts: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col): _*), lit(salts)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(valueCol).as("__partial_sum"), count(lit(1)).as("__partial_cnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum("__partial_sum").as(s"sum_$valueCol"),
        sum("__partial_cnt").as("cnt"))
  }

  /** Salted equi-join for a skewed LEFT side: the left side gets a
    * deterministic salt in [0, salts); the right side is replicated
    * `salts` times; the join runs on (key, salt). A hot left key now
    * lands on `salts` reducers instead of one. Right-side replication
    * costs |R|×salts — use for dimension-sized right sides (where
    * broadcast is unavailable, e.g. the dimension is just over the
    * broadcast threshold).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(salts)))
    val saltedRight = right
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }
}
