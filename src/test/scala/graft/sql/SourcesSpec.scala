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

  test("COPY FROM loads parquet by name and csv under the table schema") {
    val tmp = Files.createTempDirectory("graft-copyfrom").toString
    val db = new GraftDatabase(spark,
      Files.createTempDirectory("graft-copyfrom-wh").toString)
    db.query("CREATE TABLE ct (id INT, name VARCHAR(10), v DOUBLE)").toOption.get
    db.query("INSERT INTO ct VALUES (1, 'a', 1.5), (2, 'b', 2.5)").toOption.get
    // parquet round trip, name-wise (write has the same names)
    db.query(s"COPY ct TO '$tmp/pq' (FORMAT parquet)").toOption.get
    db.query("CREATE TABLE ct2 (id INT, name VARCHAR(10), v DOUBLE)").toOption.get
    val r1 = db.query(s"COPY ct2 FROM '$tmp/pq'").toOption.get
    assert(r1 match { case db.Done(m) => m.contains("2 row(s)"); case _ => false })
    // appending again doubles; loaded rows answer queries
    db.query(s"COPY ct2 FROM '$tmp/pq' (FORMAT parquet)").toOption.get
    assert(db.select("SELECT count(*) AS n FROM ct2").toOption.get
      .collect().head.getLong(0) == 4L)
    // parquet with a column subset NULL-fills the missing target column
    db.query(s"COPY (SELECT id, name FROM ct) TO '$tmp/pq2' (FORMAT parquet)")
      .toOption.get
    db.query("CREATE TABLE ct4 (id INT, name VARCHAR(10), v DOUBLE)").toOption.get
    db.query(s"COPY ct4 FROM '$tmp/pq2'").toOption.get
    assert(db.select("SELECT count(*) AS n FROM ct4 WHERE v IS NULL")
      .toOption.get.collect().head.getLong(0) == 2L)
    // csv round trip under the table schema (positional, header skipped)
    db.query(s"COPY ct TO '$tmp/csv' (FORMAT csv)").toOption.get
    db.query("CREATE TABLE ct3 (id INT, name VARCHAR(10), v DOUBLE)").toOption.get
    db.query(s"COPY ct3 FROM '$tmp/csv' (FORMAT csv, HEADER true)").toOption.get
    assert(db.select("SELECT id, name, v FROM ct3 ORDER BY id").toOption.get
      .collect().map(_.toSeq.toSeq).toSeq ==
      Seq(Seq(1, "a", 1.5), Seq(2, "b", 2.5)))
    // rejections: unknown table; query source for FROM
    assert(db.query(s"COPY nosuch FROM '$tmp/pq'").isLeft)
    assert(db.query(s"COPY (SELECT 1 AS x) FROM '$tmp/pq'").isLeft)
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
