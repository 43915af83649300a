package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTestSession

class KMeansSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private lazy val emb = spark.read
    .parquet(s"${SparkTestSession.sf0001}/embeddings.parquet")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    .cache()

  test("lloyd iterations monotonically improve the objective") {
    val m0 = KMeans.train(emb, "vec_id", "e", k = 8, iters = 0)
    val m2 = KMeans.train(emb, "vec_id", "e", k = 8, iters = 2)
    val m5 = KMeans.train(emb, "vec_id", "e", k = 8, iters = 5)
    val (c0, c2, c5) = (KMeans.cost(emb, "vec_id", "e", m0),
      KMeans.cost(emb, "vec_id", "e", m2), KMeans.cost(emb, "vec_id", "e", m5))
    assert(c2 < c0, s"c0=$c0 c2=$c2")
    assert(c5 <= c2 + 1e-9, s"c2=$c2 c5=$c5")
  }

  test("training is deterministic") {
    val a = KMeans.train(emb, "vec_id", "e", k = 4, iters = 2)
    val b = KMeans.train(emb, "vec_id", "e", k = 4, iters = 2)
    assert(a.centroids.map(_._2.toSeq).toSeq == b.centroids.map(_._2.toSeq).toSeq)
  }

  test("assignments cover multiple clusters and every vector gets one") {
    val m = KMeans.train(emb, "vec_id", "e", k = 8, iters = 2)
    val assigned = m.assign(emb, "vec_id", "e")
    assert(assigned.count() == emb.count())
    val used = assigned.select("cid").distinct().count()
    assert(used >= 4, s"only $used of 8 clusters used")
  }
}
