package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.{GraftExtensions, SparkTestSession}
import graft.functions.VectorFunctions.{dot, l2norm}

class VectorExpressionsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val df = Seq(
    (1L, Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
    (2L, Array(0.0, 0.0, 0.0), Array(1.0, 1.0, 1.0)),
    (3L, Array(-1.0, 1.0, 0.5), Array(2.0, -2.0, 4.0))
  ).toDF("id", "a", "b")

  test("DotProduct computes the fused dot product") {
    val got = df.select(col("id"), dot(col("a"), col("b")).as("d"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == Seq((1L, 32.0), (2L, 0.0), (3L, -2.0)))
  }

  test("DotProduct matches the compositional zip_with/aggregate form") {
    val composed = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0), (acc, v) => acc + v))
      .collect().map(_.getDouble(0))
    val native = df.select(dot(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(composed.toSeq == native.toSeq)
  }

  test("null arrays produce null, not a crash") {
    val withNull = Seq((1L, Array(1.0), null.asInstanceOf[Array[Double]]))
      .toDF("id", "a", "b")
    val r = withNull.select(dot(col("a"), col("b"))).collect()
    assert(r.head.isNullAt(0))
  }

  test("l2norm") {
    val r = df.filter(col("id") === 1).select(l2norm(col("a"))).head.getDouble(0)
    assert(math.abs(r - math.sqrt(14.0)) < 1e-12)
  }

  test("graft_dot is callable from SQL after registration") {
    GraftExtensions.register(spark)
    df.createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT id, graft_dot(a, b) AS d FROM vecs ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(r.toSeq == Seq((1L, 32.0), (2L, 0.0), (3L, -2.0)))
  }

  test("DotProduct participates in whole-stage codegen") {
    // a local Seq-df folds into LocalTableScan at plan time; use a real
    // parquet scan so the projection actually plans
    val emb = spark.read.parquet(s"${SparkTestSession.sf0001}/embeddings.parquet")
      .select(col("embedding").cast("array<double>").as("e"))
    val plan = emb.select(dot(col("e"), col("e"))).queryExecution.executedPlan
    val inCodegen = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(inCodegen.nonEmpty && plan.toString.contains("*(1) Project [graft_dot"),
      plan.toString)
  }
}
