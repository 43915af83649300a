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

  test("bucket-local statistics: per-bucket rowcounts + NDV sharpen point estimates") {
    val wh = Files.createTempDirectory("graft-stats-wh").toString
    val db = new GraftDatabase(spark, wh)
    db.query("CREATE TABLE bt (k BIGINT, v BIGINT) CLUSTERED BY (k) INTO 4 BUCKETS")
    // key 7 is hot: 300 copies; keys 1..60 appear once each
    db.query("INSERT INTO bt VALUES " +
      ((1 to 300).map(_ => "(7, 0)") ++ (1 to 60).map(i => s"($i, $i)")).mkString(", "))
    val desc = db.statistics // bucket stats maintained on the insert path
    val bs = desc.bucketStats("bt").get
    assert(bs.rows.values.sum == 360, s"bucket rows ${bs.rows}")
    assert(bs.rows.keys.forall(b => b >= 0 && b < 4))
    val btDesc = Analyzer.TableDesc("bt",
      Seq(Analyzer.AttributeDesc("k", SqlType.SqlBigInt),
        Analyzer.AttributeDesc("v", SqlType.SqlBigInt)),
      bucket = Some(("k", 4)))
    // the hot key's bucket holds ~300 + a few singletons with a tiny NDV,
    // so rows/ndv lands near the true 300 — the global sample's zero-hit
    // floor could never see this
    val hot = desc.estimateBucketPoint(btDesc, 7L).get
    assert(hot >= 15 && hot <= 330, s"hot estimate $hot")
    val cold = desc.estimateBucketPoint(btDesc, 42L).get
    assert(cold <= 30, s"cold estimate $cold")
    assert(hot > cold, s"hot=$hot cold=$cold")
    // bucket stats survive a warehouse reopen
    val db2 = new GraftDatabase(spark, wh)
    assert(db2.statistics.bucketStats("bt").get.rows == bs.rows)
    // …and a copy-on-write rewrite rebuilds them distributedly
    // (k=7 also occurs once in the 1..60 range: 301 rows go)
    db.query("DELETE FROM bt WHERE k = 7")
    val after = db.statistics.bucketStats("bt").get
    assert(after.rows.values.sum == 59, s"after delete ${after.rows}")
  }

  test("bucket pruning: equality on the bucket column scans one bucket") {
    val db = freshDb()
    db.query("CREATE TABLE bp (k BIGINT, v BIGINT) CLUSTERED BY (k) INTO 8 BUCKETS")
    db.query("INSERT INTO bp VALUES " + (1 to 64).map(i => s"($i, ${i * 10})").mkString(", "))
    // Spark's autoBucketedScan heuristic falls back to a plain parallel
    // scan when nothing downstream needs the bucket distribution; disable
    // it to pin the pruning capability itself (1 of 8 bucket files read)
    val conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(conf)
    try {
      spark.conf.set(conf, "false")
      val df = db.select("SELECT v FROM bp WHERE k = 7").toOption.get
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"), plan)
      assert(df.collect().map(_.getLong(0)).toSeq == Seq(70L))
    } finally spark.conf.set(conf, prev)
  }

  test("q_stats_hll_ndv gate: exact NDV oracled, sketch verdict in bounds") {
    // round-13 shape: the gate now carries the exact per-group NDV
    // (hash-compared against DuckDB's count(DISTINCT) by the driver)
    // plus an est_in_bounds verdict asserting the sketch's documented
    // 64-bucket envelope (2.3σ ≈ 30%). Re-derive the exact side here
    // and require every verdict TRUE — a sketch regression fails both
    // this spec and the driver's hash compare.
    import org.apache.spark.sql.functions.{col, count_distinct}
    val df = graft.queries.Stats.defs("q_stats_hll_ndv")
      .build(spark, SparkTestSession.sf001)
    val exact = graft.Tables.t(spark, SparkTestSession.sf001, "orders")
      .groupBy("o_orderpriority")
      .agg(count_distinct(col("o_custkey")).as("ndv_exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = df.collect()
    assert(rows.length == exact.size, s"expected ${exact.size} groups")
    rows.foreach { r =>
      val prio = r.getString(0)
      assert(r.getLong(1) == exact(prio),
        s"$prio: gate ndv_custkey ${r.getLong(1)} != exact ${exact(prio)}")
      assert(r.getBoolean(3),
        s"$prio: sketch estimate outside the 30% envelope")
    }
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
