package graft.stats

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import CountingHll._

/** Mirrors the reference's seeded-deterministic HLL tests
  * (reference statistics/counting_hyperloglog.rs:183+ — "seed every
  * randomized component"): here every probabilistic decision is derived
  * from the value hash, so runs are bit-reproducible by construction.
  */
class CountingHllSpec extends AnyFunSuite {

  test("estimate accuracy within sketch error bounds across magnitudes") {
    // 64 buckets (the reference's size, counting_hyperloglog.rs:9-10) has
    // a ~13% standard error; allow ~2.3 sigma.
    for (n <- Seq(10, 100, 1000, 50000)) {
      val s = emptySketch
      (0 until n).foreach(i => add(s, s"value-$i"))
      val est = estimate(s)
      val err = math.abs(est - n).toDouble / n
      assert(err < 0.30, s"n=$n est=$est err=$err")
    }
  }

  test("duplicates do not inflate the estimate") {
    val s = emptySketch
    (0 until 10000).foreach(i => add(s, s"v-${i % 100}"))
    val est = estimate(s)
    assert(est >= 85 && est <= 115, s"est=$est for 100 distinct")
  }

  test("delete reverses add (the counting property approx_count_distinct lacks)") {
    val s = emptySketch
    (0 until 2000).foreach(i => add(s, s"keep-$i"))
    (0 until 2000).foreach(i => add(s, s"drop-$i"))
    (0 until 2000).foreach(i => delete(s, s"drop-$i"))
    val est = estimate(s)
    val err = math.abs(est - 2000).toDouble / 2000
    assert(err < 0.2, s"after delete est=$est")
  }

  test("merge of disjoint sketches estimates the union") {
    val a = emptySketch
    val b = emptySketch
    (0 until 1000).foreach(i => add(a, s"a-$i"))
    (0 until 1000).foreach(i => add(b, s"b-$i"))
    val est = estimate(merge(a, b))
    val err = math.abs(est - 2000).toDouble / 2000
    assert(err < 0.15, s"merged est=$est")
  }

  test("deterministic across runs") {
    def build(): Long = {
      val s = emptySketch
      (0 until 5000).foreach(i => add(s, s"x-$i"))
      estimate(s)
    }
    assert(build() == build())
  }

  test("distributed aggregator matches local sketch on real data") {
    val spark = SparkTestSession.spark
    val df = spark.read.parquet(s"${SparkTestSession.sf0001}/orders.parquet")
    val est = df.agg(CountingHll.approx_ndv(
      org.apache.spark.sql.functions.col("o_orderpriority"))).head.getLong(0)
    // exact NDV is 5; sketch must be in a sane band
    assert(est >= 4 && est <= 7, s"est=$est")
  }
}
