package graft.sql

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Statistics maintenance specs, mirroring the reference's planner and
  * statistics tests (reference planner/bottomup.rs:523-606 — "10 rows
  * id=1..10, WHERE id < 5 must estimate 4"; statistics updated on the
  * insert path, access/heap.rs:245-292).
  */
class StatsManagerSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def freshDb(): GraftDatabase =
    new GraftDatabase(spark, Files.createTempDirectory("graft-stats-wh").toString)

  test("insert maintains rowcount and per-column NDV sketches") {
    val db = freshDb()
    db.query("CREATE TABLE t (id INT, tag VARCHAR(10))")
    val values = (1 to 200).map(i => s"($i, 'tag${i % 10}')").mkString(", ")
    db.query(s"INSERT INTO t VALUES $values")
    val st = db.statistics.get("t").get
    assert(st.rowCount == 200)
    val idNdv = st.ndv("id").get
    assert(idNdv > 150 && idNdv < 260, s"id ndv=$idNdv")
    val tagNdv = st.ndv("tag").get
    assert(tagNdv >= 8 && tagNdv <= 13, s"tag ndv=$tagNdv")
  }

  test("the reference's cardinality fixture: 10 rows, id < 5 estimates 4") {
    val db = freshDb()
    db.query("CREATE TABLE ten (id INT)")
    db.query("INSERT INTO ten VALUES " + (1 to 10).map(i => s"($i)").mkString(", "))
    // sample holds all 10 rows, so the sample fraction is exact
    val desc = db.statistics.get("ten")
    assert(desc.get.rowCount == 10)
    val est = db.statistics.estimateCard(
      Analyzer.TableDesc("ten", Seq(Analyzer.AttributeDesc("id", SqlType.SqlInt))),
      Some(org.apache.spark.sql.functions.col("id") < 5))
    assert(est == 4, s"estimate=$est")
  }

  test("sample is capped, deterministic, and survives reopen") {
    val wh = Files.createTempDirectory("graft-stats-wh").toString
    val db = new GraftDatabase(spark, wh)
    db.query("CREATE TABLE big (id INT)")
    db.query("INSERT INTO big VALUES " + (1 to 1500).map(i => s"($i)").mkString(", "))
    val desc = db.statistics.get("big")
    assert(desc.get.rowCount == 1500)
    val sampleDesc = Analyzer.TableDesc("big", Seq(Analyzer.AttributeDesc("id", SqlType.SqlInt)))
    val s1 = db.statistics.sample(sampleDesc).collect().map(_.getInt(0)).sorted
    assert(s1.length == db.statistics.SampleSize)
    val db2 = new GraftDatabase(spark, wh)
    assert(db2.statistics.get("big").get.rowCount == 1500)
    val s2 = db2.statistics.sample(sampleDesc).collect().map(_.getInt(0)).sorted
    assert(s1.toSeq == s2.toSeq)
  }

  test("estimates drive broadcast-side choice in joins (build-side parity)") {
    val db = freshDb()
    db.query("CREATE TABLE dim (id INT, name VARCHAR(20))")
    db.query("CREATE TABLE fact (fid INT, did INT)")
    db.query("INSERT INTO dim VALUES " + (1 to 20).map(i => s"($i, 'd$i')").mkString(", "))
    db.query("INSERT INTO fact VALUES " +
      (1 to 1000).map(i => s"($i, ${i % 20 + 1})").mkString(", "))
    val df = db.select("SELECT name FROM fact f, dim d WHERE f.did = d.id").toOption.get
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(df.count() == 1000)
  }
}
