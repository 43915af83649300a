package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row

import graft.SparkTestSession

class AsOfSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("picks the latest right row at or before each left time, per key") {
    val left = Seq((1L, ts(100), "p1"), (1L, ts(200), "p2"), (2L, ts(150), "p3"))
      .toDF("k", "t", "name")
    val right = Seq((1L, ts(90), 9.0), (1L, ts(150), 15.0), (2L, ts(151), 99.0))
      .toDF("k", "t", "v")
    val got = AsOf.asofJoin(left, right, "k", "t", "t", Seq("v"))
      .select("name", "v").orderBy("name").collect()
    assert(got.toSeq == Seq(
      Row("p1", 9.0),   // only ts90 ≤ 100
      Row("p2", 15.0),  // ts150 beats ts90
      Row("p3", null))) // right row is AFTER the left time → no match
  }

  test("equal timestamps match inclusively (DuckDB ASOF semantics)") {
    val left = Seq((1L, ts(100), "p")).toDF("k", "t", "name")
    val right = Seq((1L, ts(100), 7.0)).toDF("k", "t", "v")
    val got = AsOf.asofJoin(left, right, "k", "t", "t", Seq("v")).select("v").head
    assert(got.getDouble(0) == 7.0)
  }

  test("left rows with keys absent from the right side survive with nulls") {
    val left = Seq((5L, ts(100), "lonely")).toDF("k", "t", "name")
    val right = Seq((1L, ts(90), 1.0)).toDF("k", "t", "v")
    val got = AsOf.asofJoin(left, right, "k", "t", "t", Seq("v")).collect()
    assert(got.length == 1 && got.head.isNullAt(got.head.fieldIndex("v")))
  }

  test("plan is one shuffle + window, no range cross join") {
    val left = Seq((1L, ts(100), "p")).toDF("k", "t", "name")
    val right = Seq((1L, ts(90), 1.0)).toDF("k", "t", "v")
    val plan = AsOf.asofJoin(left, right, "k", "t", "t", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
    assert(plan.contains("Window"), plan)
  }
}
