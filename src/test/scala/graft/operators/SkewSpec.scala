package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

class SkewSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 90% of rows share one hot key
  private lazy val skewed = spark.range(10000)
    .select(
      when(col("id") % 10 < 9, lit("hot")).otherwise(concat(lit("k"), col("id") % 7)).as("k"),
      (col("id") % 100).cast("double").as("v"))

  test("salted sum equals direct sum on skewed keys") {
    val direct = skewed.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("cnt"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val salted = Skew.saltedSum(skewed, Seq("k"), "v")
      .orderBy("k").collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(direct.toSeq == salted.toSeq)
  }

  test("salted join equals plain join") {
    val dim = Seq(("hot", "H"), ("k0", "A"), ("k3", "B")).toDF("k", "label")
    val plain = skewed.join(dim, Seq("k")).groupBy("k", "label")
      .agg(count(lit(1)).as("n")).orderBy("k")
      .collect().map(_.toString).toSeq
    val salted = Skew.saltedJoin(skewed, dim, "k").groupBy("k", "label")
      .agg(count(lit(1)).as("n")).orderBy("k")
      .collect().map(_.toString).toSeq
    assert(plain == salted)
  }

  test("salting actually spreads the hot key across reducers") {
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(skewed.columns.map(col): _*), lit(16)))
    val spread = salted.filter(col("k") === "hot")
      .groupBy("__salt").count().count()
    assert(spread >= 12, s"hot key only reached $spread of 16 salt buckets")
  }
}
