package graft.sql

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Source-format breadth: csv/json external tables join parquet tables
  * through the dialect engine; results must agree with the parquet
  * original regardless of source format.
  */
class SourcesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("csv and json external tables answer the same queries as parquet") {
    val tmp = Files.createTempDirectory("graft-src").toString
    val nation = spark.read.parquet(s"${SparkTestSession.sf0001}/nation.parquet")
    nation.write.option("header", "true").csv(s"$tmp/nation_csv")
    nation.write.json(s"$tmp/nation_json")

    val db = new GraftDatabase(spark, Files.createTempDirectory("graft-src-wh").toString)
    db.registerParquet("nation_pq", s"${SparkTestSession.sf0001}/nation.parquet")
    db.registerCsv("nation_csv", s"$tmp/nation_csv")
    db.registerJson("nation_json", s"$tmp/nation_json")

    // json infers integers as bigint — compare through Number
    def result(table: String): Seq[(Int, String)] =
      db.select(s"SELECT n_nationkey, n_name FROM $table WHERE n_regionkey = 2")
        .toOption.get.orderBy("n_nationkey").collect()
        .map(r => (r.getAs[Number](0).intValue, r.getString(1))).toSeq

    val pq = result("nation_pq")
    assert(pq.nonEmpty)
    assert(result("nation_csv") == pq)
    assert(result("nation_json") == pq)
  }

  test("csv external table joins against warehouse tables") {
    val tmp = Files.createTempDirectory("graft-src").toString
    spark.read.parquet(s"${SparkTestSession.sf0001}/region.parquet")
      .write.option("header", "true").csv(s"$tmp/region_csv")
    val db = new GraftDatabase(spark, Files.createTempDirectory("graft-src-wh").toString)
    db.registerCsv("region", s"$tmp/region_csv")
    db.query("CREATE TABLE fav (rk INT, score INT)")
    db.query("INSERT INTO fav VALUES (0, 10), (2, 20)")
    val got = db.select(
      "SELECT r_name, score FROM region r, fav f WHERE r.r_regionkey = f.rk")
      .toOption.get.orderBy("score").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(got == Seq(("AFRICA", 10), ("ASIA", 20)))
  }
}
